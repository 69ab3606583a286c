"""Window-function surface.

The reference's only positional-series op is ``lagplot``'s shift
(plotter.py:1059-1090: ``np.hstack([x[t:], x[:t]])``); Spark windows are
the general extension surface (SURVEY.md §2.6). Helpers here keep the
partition/order discipline explicit so callers never window over an
unpartitioned global sort by accident at scale.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..cache import track


def global_row_id(df: DataFrame, keys: Sequence[str], name: str = "row_id") -> DataFrame:
    """Dense 0-based row ids in ascending ``keys`` order WITHOUT a
    single-partition stage (deterministic when the key is unique).

    A global ``Window.orderBy`` funnels every row through one task
    (Exchange SinglePartition) — the classic scale-killer. Instead:
    range-repartition on the keys + sort within partitions (ascending
    key ranges land on ascending partition indices, so global order =
    (partition, local position)), read the local position out of
    ``monotonically_increasing_id`` (= pid << 33 | local index on the
    sorted stream), then one tiny per-partition count job feeds a
    cumulative-offset literal map. The rdd.zipWithIndex two-job
    pattern, kept in Catalyst; the sorted frame is persisted between
    the two jobs so both see identical partitioning."""
    srt = track(
        df.repartitionByRange(*[F.col(c) for c in keys])
        .sortWithinPartitions(*keys)
        .withColumn("__mono", F.monotonically_increasing_id())
    )
    pid = F.expr("shiftright(__mono, 33)")
    local = F.expr(f"__mono & {(1 << 33) - 1}")
    counts = sorted(
        (r[0], r[1])
        for r in srt.groupBy(pid.alias("pid")).agg(F.count(F.lit(1)).alias("n")).collect()
    )
    if not counts:
        return df.withColumn(name, F.lit(0).cast("long"))
    offsets, acc = {}, 0
    for p, n_rows in counts:
        offsets[p] = acc
        acc += n_rows
    # one F.expr parse with the offsets inlined (a per-entry
    # F.create_map builds 2P Columns = 2P py4j round-trips)
    omap = "map(" + ",".join(f"{p},{o}L" for p, o in offsets.items()) + ")"
    return srt.withColumn(
        name, F.expr(f"element_at({omap}, int(shiftright(__mono, 33)))") + local
    ).drop("__mono")


def lag_column(
    df: DataFrame, value: str, order_by: str, t: int = 1, partition_by: str | None = None,
    name: str | None = None,
) -> DataFrame:
    """x[t] series (lagplot analog, plotter.py:1059-1090). With
    partition_by: a plain partitioned lag window. Without: the global
    series case — implemented as partition-offset row ids (see
    global_row_id) + a left self-equi-join on ``row_id - t``, so the
    plan is parallel shuffles end-to-end instead of an Exchange
    SinglePartition global sort. Type-generic (the lagged value rides
    the join, no literal maps)."""
    out = name or f"{value}_lag{t}"
    if partition_by is not None:
        w = Window.partitionBy(partition_by).orderBy(order_by)
        return df.withColumn(out, F.lag(value, t).over(w))
    ids = global_row_id(df, [order_by], "__rid")
    shifted = ids.select((F.col("__rid") + t).alias("__rid"), F.col(value).alias(out))
    return ids.join(shifted, "__rid", "left").drop("__rid")


def moving_average(
    df: DataFrame, value: str, order_by: str, window_rows: int, partition_by: str,
    name: str | None = None,
) -> DataFrame:
    w = (
        Window.partitionBy(partition_by)
        .orderBy(order_by)
        .rowsBetween(-(window_rows - 1), 0)
    )
    return df.withColumn(name or f"{value}_mavg{window_rows}", F.avg(value).over(w))


def top_per_group(
    df: DataFrame, partition_by: list[str], order_by: list[Column], k: int = 1,
    rank_name: str = "rn",
) -> DataFrame:
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(rank_name, F.row_number().over(w)).filter(F.col(rank_name) <= k)


def sessionize(
    df: DataFrame,
    ts: str,
    user: str,
    gap_seconds: float = 1800,
    name: str = "session_id",
    tiebreak: str | Sequence[str] | None = None,
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time since
    the previous event (per user) exceeds ``gap_seconds``. Classic
    lag + conditional cumulative sum — two window passes over the same
    (user, ts) partitioning, one shuffle total.

    Gap arithmetic is exact integer microseconds (``unix_micros``), not a
    truncated seconds cast, so sub-second timestamps sessionize
    deterministically. ``tiebreak`` adds ordering columns after ``ts`` so
    equal-timestamp events get a stable cumulative-sum order (otherwise
    the session split within a tie group is partition-order dependent)."""
    tb = [tiebreak] if isinstance(tiebreak, str) else list(tiebreak or [])
    w = Window.partitionBy(user).orderBy(ts, *tb)
    # defensive cast: unix_micros requires TIMESTAMP; TIMESTAMP_NTZ input
    # (e.g. parquet MICROS isAdjustedToUTC=0) reinterprets losslessly
    # under the pinned-UTC session TZ. Cast-to-same-type is a Catalyst
    # no-op, so TIMESTAMP input pays nothing.
    us = F.unix_micros(F.col(ts).cast("timestamp"))
    prev = F.lag(us).over(w)
    new_sess = F.when(
        prev.isNull() | (us - prev > int(round(gap_seconds * 1_000_000))), 1
    ).otherwise(0)
    return df.withColumn(name, F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0)))


def funnel(
    df: DataFrame,
    user: str,
    ts: str,
    step_col: str,
    steps: Sequence[str],
    within_seconds: float | None = None,
) -> DataFrame:
    """Ordered conversion funnel: a user reaches step k at the earliest
    event of type ``steps[k]`` strictly AFTER their step k-1 time (and
    within ``within_seconds`` of it when set). Returns one row per step:
    (step_index, step, users).

    Scale shape: each stage is one equi-join on the user key against the
    (shrinking) reached-users frame plus a min aggregate — no window
    over the full event stream, no cross-stage state. Timestamps compare
    in exact integer microseconds."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    us = F.unix_micros(F.col(ts).cast("timestamp"))
    reached = (
        df.where(F.col(step_col) == steps[0]).groupBy(user).agg(F.min(us).alias("_t"))
    )
    stages = [
        reached.select(
            F.lit(1).alias("step_index"), F.lit(steps[0]).alias("step"), F.col(user)
        )
    ]
    for i, s in enumerate(steps[1:], start=2):
        ev = df.where(F.col(step_col) == s).select(F.col(user), us.alias("_e"))
        cond = F.col("_e") > F.col("_t")
        if within_seconds is not None:
            cond = cond & (
                F.col("_e") - F.col("_t") <= int(round(within_seconds * 1_000_000))
            )
        reached = ev.join(reached, user).where(cond).groupBy(user).agg(
            F.min("_e").alias("_t")
        )
        stages.append(
            reached.select(
                F.lit(i).alias("step_index"), F.lit(s).alias("step"), F.col(user)
            )
        )
    out = stages[0]
    for st in stages[1:]:
        out = out.unionByName(st)
    return out.groupBy("step_index", "step").agg(F.count(F.lit(1)).alias("users"))


def transition_matrix(
    df: DataFrame,
    user: str,
    ts: str,
    state_col: str,
    tiebreak: str | Sequence[str] | None = None,
) -> DataFrame:
    """First-order Markov transition matrix of per-user state
    sequences: for each observed (state, next_state) pair, the count
    and the row-normalized probability P(next | state). The terminal
    event of each user has no successor and drops out (standard
    clickstream transition semantics).

    Scale shape: ONE window pass (lead over the per-user timeline --
    the same single shuffle sessionize uses) followed by a hash
    aggregate on the (state, next_state) pair; normalization runs on
    the aggregated matrix (|S|^2 rows) via its row marginals, never on
    raw events. ``tiebreak`` stabilizes equal-timestamp ordering."""
    tb = [tiebreak] if isinstance(tiebreak, str) else list(tiebreak or [])
    w = Window.partitionBy(user).orderBy(ts, *tb)
    nxt = F.lead(F.col(state_col)).over(w)
    pairs = (
        df.select(F.col(state_col).alias("state"), nxt.alias("next_state"))
        .where(F.col("next_state").isNotNull())
        .groupBy("state", "next_state")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    marg = pairs.groupBy("state").agg(F.sum("n").alias("_row_n"))
    return (
        pairs.join(F.broadcast(marg), "state")
        .select(
            "state",
            "next_state",
            "n",
            F.round(F.col("n") / F.col("_row_n"), 6).alias("p"),
        )
    )


def cohort_retention(
    df: DataFrame,
    user: str,
    ts: str,
) -> DataFrame:
    """Cohort retention matrix — the product-analytics staple: users
    are cohorted by their first-activity month, and each (cohort,
    months_since) cell counts how many of them were active that month,
    with retention as the share of the cohort size.

    Scale shape (three shuffles, nothing quadratic): one distinct
    (user, month) projection, a per-user window MIN for the cohort
    month (partitioned on user — bounded by that user's distinct
    months, no join back), then a plain (cohort, months_since) COUNT.
    The count needs no DISTINCT: the input is already distinct on
    (user, month) and months_since is injective in the month for a
    fixed user (both are month-truncated, so months_between is an
    exact integer), so each user contributes exactly one row per cell
    — dropping the count-distinct's partial-aggregate expansion and
    the cohort equi-join of the naive four-shuffle form (r11 A/B:
    ~10% faster at sf0.1 in idle JVMs, one less shuffle of the
    activity frame). Cohort sizes come from the months_since=0 cells
    of the same aggregate (broadcast join)."""
    month = F.date_trunc("month", F.col(ts))
    act = df.select(F.col(user).alias("u"), month.alias("m")).distinct()
    w = Window.partitionBy("u")
    cohort = F.min("m").over(w)
    j = act.select(
        cohort.alias("cohort"),
        F.months_between("m", cohort).cast("bigint").alias("months_since"),
    )
    counts = j.groupBy("cohort", "months_since").agg(
        F.count(F.lit(1)).alias("active")
    )
    sizes = counts.where(F.col("months_since") == 0).select(
        "cohort", F.col("active").alias("cohort_size")
    )
    return counts.join(F.broadcast(sizes), "cohort").select(
        "cohort",
        "months_since",
        "active",
        "cohort_size",
        F.round(F.col("active") / F.col("cohort_size"), 6).alias("retention"),
    )


def global_cumsum(
    df: DataFrame,
    value_col: "str | Sequence[str]",
    order_keys: Sequence,
    name: "str | Sequence[str]" = "cum",
    total_name: "str | Sequence[str] | None" = None,
) -> DataFrame:
    """Cumulative sum of ``value_col`` in global ``order_keys`` order
    WITHOUT a single-partition window — the distributed prefix-sum:
    range-repartition on the keys (ascending partition index == global
    order), one partition-LOCAL running-sum window keyed on the
    partition id, then per-partition totals (a bounded P-row collect,
    same contract as global_row_id) fold in as a literal offset map.

    ``value_col``/``name`` may be lists: several prefix-sums sharing
    one ordering run over ONE range exchange, ONE persisted frame, ONE
    per-partition-totals job and ONE window pass (r14: evaluate.py::
    average_precision needs cumP and cumT over the same descending
    score order — the fused form halves its exchanges and actions).
    Each column's arithmetic is identical to its standalone call.

    ``total_name`` (r14): attach each value column's GRAND TOTAL as a
    literal column. The per-partition-sums collect already folds every
    partition's sum into the final running offset, so the total is a
    free by-product — callers that need "share of total" (q131 Pareto)
    otherwise pay a second full scan + aggregate of ``df`` for one
    scalar (guide §2.4: two results derivable from one pass must not
    run two passes). Exact-decimal accumulation, identical to
    ``df.agg(sum(col))`` for exact value types.

    Use an exact type (decimal / integer) for ``value_col`` when
    cross-engine determinism matters: the offsets associate additions
    differently than a sequential scan, which is invisible in exact
    arithmetic and a last-ulp lottery in floats."""
    cols = [value_col] if isinstance(value_col, str) else list(value_col)
    names = [name] if isinstance(name, str) else list(name)
    if len(cols) != len(names):
        raise ValueError(
            f"global_cumsum: {len(cols)} value columns but {len(names)} names"
        )
    tnames = (
        [total_name] if isinstance(total_name, str) else list(total_name or [])
    )
    if tnames and len(tnames) != len(cols):
        raise ValueError(
            f"global_cumsum: {len(cols)} value columns but {len(tnames)} total names"
        )
    srt = track(
        df.repartitionByRange(*order_keys)
        .sortWithinPartitions(*order_keys)
        .withColumn("__mono", F.monotonically_increasing_id())
    )
    pid = F.expr("shiftright(__mono, 33)")
    w = (
        Window.partitionBy(pid)
        .orderBy("__mono")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # An all-NULL partition sums to NULL: coalesce to 0 so the offset
    # chain never sees None (Decimal('None') raises) and downstream
    # partitions still get the right prefix.
    parts = sorted(
        (r[0], tuple(r[i + 1] for i in range(len(cols))))
        for r in srt.groupBy(pid.alias("pid"))
        .agg(*[
            F.coalesce(F.sum(c), F.lit(0)).alias(f"s{i}")
            for i, c in enumerate(cols)
        ])
        .collect()
    )
    from decimal import Decimal

    offsets = {}  # pid -> tuple of per-column running offsets
    accs = [Decimal(0)] * len(cols)
    for p, sums in parts:
        offsets[p] = tuple(accs)
        accs = [a + Decimal(str(s)) for a, s in zip(accs, sums)]
    # Offset/total literals carry the VALUE COLUMN's own numeric family:
    # doubles as doubles (a DECIMAL(38,6) cast would silently quantize
    # each partition boundary at 1e-6 — worse than the documented
    # last-ulp association caveat), integers as bigint, decimals in
    # decimal so exact arithmetic stays exact.
    from pyspark.sql import types as T

    def _lit_fn(dt):
        if isinstance(dt, (T.DoubleType, T.FloatType)):
            return lambda o: f"CAST('{float(o)!r}' AS DOUBLE)"
        if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
            return lambda o: f"CAST({int(o)} AS BIGINT)"
        if isinstance(dt, T.DecimalType):
            # the literal carries the column's OWN scale (widened to
            # Spark's sum result precision, min(38, p+10)) so a value
            # column with scale > 6 is never quantized — a hard-coded
            # DECIMAL(38,6) broke the "identical to df.agg(sum(col))"
            # claim for such columns (r15, advice item)
            p, s = min(38, dt.precision + 10), dt.scale
            return lambda o: f"CAST('{o}' AS DECIMAL({p},{s}))"
        return lambda o: f"CAST('{o}' AS DECIMAL(38,6))"

    if not offsets:
        out = df
        for c, nm in zip(cols, names):
            out = out.withColumn(nm, F.col(c))
        for i, tn in enumerate(tnames):
            out = out.withColumn(tn, F.expr(_lit_fn(df.schema[cols[i]].dataType)(0)))
        return out
    out = srt
    for i, (c, nm) in enumerate(zip(cols, names)):
        lit = _lit_fn(srt.schema[c].dataType)
        omap = "map(" + ",".join(f"{p},{lit(o[i])}" for p, o in offsets.items()) + ")"
        out = out.withColumn(
            nm,
            F.expr(f"element_at({omap}, int(shiftright(__mono, 33)))")
            + F.sum(F.col(c)).over(w),
        )
    for i, tn in enumerate(tnames):
        # the final running offset IS the grand total (every partition's
        # sum has been folded in) — no second pass over the data
        out = out.withColumn(tn, F.expr(_lit_fn(srt.schema[cols[i]].dataType)(accs[i])))
    return out.drop("__mono")
