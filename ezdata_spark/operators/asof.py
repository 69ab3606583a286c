"""As-of (point-in-time) and range/interval joins.

Extension operators Spark lacks natively (SURVEY.md §2.4 — the
reference has only equi-joins). Both are expressed as compositions of
built-in DataFrame ops, never nested-loop joins:

- ``asof_join``: the union-and-window construction — tag both sides,
  union, one window over (keys, ts) carries the most recent right
  payload forward onto each left row. ONE shuffle on the join keys,
  state O(1) per row; no range-condition join, no per-row probe. This
  is the scalable shape for "attach the latest quote to every trade"
  at any data size, and what engines with native ASOF JOIN (DuckDB,
  QuestDB) do internally.
- ``range_join``: interval containment via bucketize-and-equi-join —
  each right interval explodes into the fixed-width buckets it covers,
  the left value hashes into exactly one bucket, and the equi-join on
  bucket id + exact refine replaces the O(n*m) theta join (the same
  zone-bucket discipline as the cone cross-match, astro.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | list[str],
    right_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance: float | None = None,
    how: str = "inner",
    suffix: str = "_r",
    right_tiebreak: list[str] | None = None,
) -> DataFrame:
    """For every left row, attach the nearest right row per ``by`` key:
    the latest right with ``right.on <= left.on`` (backward, default)
    or the earliest with ``right.on >= left.on`` (forward). Equal
    timestamps match. ``tolerance`` bounds the allowed gap (seconds for
    timestamp event time, same units as ``on`` for numeric); ``how`` is
    'inner' (drop unmatched, DuckDB ASOF JOIN semantics) or 'left'.

    The matched right columns come back as ``<col><suffix>`` plus
    ``<on><suffix>`` (the matched event time). When several right rows
    share the same (key, ``on``), pass ``right_tiebreak`` columns —
    the row with the greatest tiebreak value wins deterministically
    (otherwise the winner is partition-order dependent).
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    keys = [by] if isinstance(by, str) else list(by)
    right_cols = right_cols or [
        c for c in right.columns if c not in keys and c != on
    ]

    # tiebreak columns ride in the payload even when not requested as
    # output columns (the window needs them to order equal-ts rights)
    payload_cols = list(dict.fromkeys(right_cols + (right_tiebreak or [])))
    payload = F.struct(F.col(on).alias(on), *[F.col(c).alias(c) for c in payload_cols])
    # SQL join-equality semantics: a NULL key or NULL event time never
    # matches (DuckDB ASOF JOIN, which q102's oracle pins).
    # Window.partitionBy would group NULL keys together, and a NULL-ts
    # right row would ride the window order into some frame, so drop
    # both from the right side; null-key left rows then naturally find
    # no match, and null-ts left rows are masked below.
    null_key_free = right.filter(F.col(on).isNotNull())
    for kcol in keys:
        null_key_free = null_key_free.filter(F.col(kcol).isNotNull())
    r = null_key_free.select(
        *keys, F.col(on), F.lit(0).alias("__side"), payload.alias("__p")
    )
    l_cols = left.columns
    l = left.select(
        *l_cols, F.lit(1).alias("__side"), F.lit(None).cast(r.schema["__p"].dataType).alias("__p")
    ).select(*keys, on, "__side", "__p", *[c for c in l_cols if c not in keys and c != on])
    unioned = l.unionByName(r.select(*r.columns), allowMissingColumns=True)

    # right rows (side 0) sort before left rows at equal ts, so an
    # equal-timestamp right row is visible to the left row's frame.
    # Tiebreak columns (null on left rows) order equal-(ts, side) right
    # rows so last() picks the greatest deterministically.
    tb = [F.col(f"__p.{c}").asc_nulls_first() for c in (right_tiebreak or [])]
    if direction == "backward":
        w = Window.partitionBy(*keys).orderBy(F.col(on).asc(), F.col("__side").asc(), *tb)
    else:
        w = Window.partitionBy(*keys).orderBy(F.col(on).desc(), F.col("__side").asc(), *tb)
    carried = F.last("__p", ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    out = (
        unioned.withColumn("__m", carried)
        .filter(F.col("__side") == 1)
        .drop("__side", "__p")
    )
    # a NULL left event time compares UNKNOWN to every right ts, so it
    # never matches — but window null ordering (asc_nulls_first /
    # desc_nulls_last) would hand it a frame; mask the carry instead
    out = out.withColumn("__m", F.when(F.col(on).isNotNull(), F.col("__m")))
    matched_on = F.col(f"__m.{on}")
    if tolerance is not None:
        # timestamp event time: tolerance is SECONDS (exact integer
        # microsecond arithmetic); numeric event time: same units as `on`
        if dict(out.dtypes).get(on) in ("timestamp", "timestamp_ntz"):
            lhs = F.unix_micros(F.col(on).cast("timestamp"))
            rhs = F.unix_micros(matched_on.cast("timestamp"))
            tol = int(round(tolerance * 1_000_000))
        else:
            lhs, rhs, tol = F.col(on), matched_on, tolerance
        gap = (lhs - rhs) if direction == "backward" else (rhs - lhs)
        out = out.withColumn("__m", F.when(gap <= tol, F.col("__m")))
    sel = [F.col(c) for c in l_cols] + [
        F.col(f"__m.{on}").alias(f"{on}{suffix}")
    ] + [F.col(f"__m.{c}").alias(f"{c}{suffix}") for c in right_cols]
    out = out.select(*sel)
    if how == "inner":
        out = out.filter(F.col(f"{on}{suffix}").isNotNull())
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """Interval-containment join: pair every left row with every right
    row whose ``[lo_col, hi_col]`` interval contains ``value_col``
    (inclusive both ends).

    Bucketize-and-refine: the right interval explodes into the
    fixed-width buckets it covers, the left value lands in exactly one
    bucket, and the bucket equi-join + exact BETWEEN refine yields each
    qualifying pair exactly once. Pick ``bucket_width`` near the median
    interval length: per-interval bucket count stays O(1) and per-bucket
    candidates stay small. Column names must be disjoint across sides.
    """
    clash = set(left.columns) & set(right.columns)
    if clash:
        raise ValueError(f"range_join: overlapping column names {sorted(clash)}")
    w = float(bucket_width)
    lb = left.withColumn("__b", F.floor(F.col(value_col) / w).cast("long"))
    rb = right.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / w).cast("long"),
                F.floor(F.col(hi_col) / w).cast("long"),
            )
        ),
    )
    joined = lb.join(rb, "__b", "inner").filter(
        (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) <= F.col(hi_col))
    )
    if how == "inner":
        return joined.drop("__b")
    if how != "left":
        raise ValueError("how must be 'inner' or 'left'")
    matched = joined.drop("__b")
    # null-SAFE anti join: plain column-equality would fail to exclude a
    # matched row containing any NULL (NULL = NULL is NULL), duplicating
    # it into the null-padded branch
    m = matched.select(*left.columns).distinct().alias("__m")
    lal = left.alias("__l")
    cond = None
    for c in left.columns:
        eq = F.col(f"__l.{c}").eqNullSafe(F.col(f"__m.{c}"))
        cond = eq if cond is None else (cond & eq)
    unmatched = lal.join(m, cond, "left_anti").select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns]
    )
    for c in right.columns:
        unmatched = unmatched.withColumn(c, F.lit(None).cast(dict(right.dtypes)[c]))
    return matched.unionByName(unmatched)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_lo: str,
    l_hi: str,
    r_lo: str,
    r_hi: str,
    bucket_width: float,
) -> DataFrame:
    """Interval-overlap join: pair rows whose [lo, hi] intervals
    intersect (touching endpoints count).

    Both sides explode into the fixed-width buckets their intervals
    cover and equi-join on bucket id; a pair sharing several buckets
    would duplicate, so each pair is emitted only from its CANONICAL
    bucket — the one containing max(l_lo, r_lo) — which both sides
    cover by construction. No dropDuplicates shuffle, each qualifying
    pair exactly once. Column names must be disjoint across sides.
    """
    clash = set(left.columns) & set(right.columns)
    if clash:
        raise ValueError(f"interval_overlap_join: overlapping column names {sorted(clash)}")
    w = float(bucket_width)

    def buckets(lo, hi):
        return F.sequence(
            F.floor(F.col(lo) / w).cast("long"), F.floor(F.col(hi) / w).cast("long")
        )

    lb = left.withColumn("__b", F.explode(buckets(l_lo, l_hi)))
    rb = right.withColumn("__b", F.explode(buckets(r_lo, r_hi)))
    return (
        lb.join(rb, "__b", "inner")
        .filter(
            (F.col(l_lo) <= F.col(r_hi))
            & (F.col(r_lo) <= F.col(l_hi))
            & (
                F.col("__b")
                == F.floor(F.greatest(F.col(l_lo), F.col(r_lo)) / w).cast("long")
            )
        )
        .drop("__b")
    )
