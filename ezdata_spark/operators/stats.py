"""Per-column statistics table (simpletable.py:2877-2929, fn library
3227-3271: nan-mean/max/min/std, var, p16/p50/p84, has_nan).

One Spark job computes every (column x statistic) cell as a single wide
aggregate row — a single scan + partial/final agg, no per-column jobs —
then unpivots driver-side into the reference's (column, stat...) layout.
NaN handling: the reference's nan* functions skip NaNs; Spark aggregates
skip nulls, so NaN values are first nulled via nanvl-style guard.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_FNS = ("mean", "std", "min", "max", "p16", "p50", "p84", "has_nan")


def _nan_to_null(c):
    return F.when(F.isnan(c), F.lit(None)).otherwise(c)


def _stat_col(name: str, fn: str):
    c = F.col(name)
    cc = _nan_to_null(c.cast("double"))
    if fn == "mean":
        return F.avg(cc)
    if fn == "std":
        return F.stddev_samp(cc)
    if fn == "var":
        return F.var_samp(cc)
    if fn == "min":
        return F.min(cc)
    if fn == "max":
        return F.max(cc)
    if fn == "sum":
        return F.sum(cc)
    if fn == "count":
        return F.count(cc)
    if fn.startswith("p") and fn[1:].isdigit():
        q = int(fn[1:]) / 100.0
        return F.percentile(cc, F.lit(q))
    if fn == "has_nan":
        return F.max(F.isnan(c.cast("double")) | c.isNull())
    raise ValueError(f"unknown stat {fn!r}")


def _wide_aggs(columns: Sequence[str], fns: Sequence[str]):
    """(aggregate list, post-projection list) for one wide stats row.

    Percentile fns are FUSED into one array ``percentile`` aggregate
    per column (r14): N scalar ``percentile`` calls each buffer and
    sort every value of the column independently — the array form
    computes every requested point from ONE buffer and ONE sort, with
    identical interpolation (value-identical results). The
    post-projection re-emits the exact ``col__fn`` schema in the same
    order, so callers see no change."""
    pfns = [fn for fn in fns if fn.startswith("p") and fn[1:].isdigit()]
    aggs, post = [], []
    for name in columns:
        fused = len(pfns) >= 2
        if fused:
            cc = _nan_to_null(F.col(name).cast("double"))
            aggs.append(
                F.percentile(
                    cc, F.array(*[F.lit(int(fn[1:]) / 100.0) for fn in pfns])
                ).alias(f"__ps__{name}")
            )
        for fn in fns:
            if fused and fn in pfns:
                continue
            aggs.append(_stat_col(name, fn).alias(f"{name}__{fn}"))
        for fn in fns:
            if fused and fn in pfns:
                src = F.col(f"__ps__{name}")[pfns.index(fn)]
            else:
                src = F.col(f"{name}__{fn}")
            post.append(src.alias(f"{name}__{fn}"))
    return aggs, post


def column_stats(df: DataFrame, columns: Sequence[str], fns: Sequence[str] | None = None) -> DataFrame:
    fns = tuple(fns or DEFAULT_FNS)
    aggs, post = _wide_aggs(columns, fns)
    wide = df.agg(*aggs).select(*post)  # single job, one row

    # unpivot to (column, <fn>...) — tiny, driver-safe
    spark = df.sparkSession
    row = wide.collect()[0]
    out_rows = []
    for name in columns:
        rec = {"column": name}
        for fn in fns:
            v = row[f"{name}__{fn}"]
            rec[fn] = float(v) if fn != "has_nan" and v is not None else v
        out_rows.append(rec)
    schema = "column string, " + ", ".join(
        f"{fn} boolean" if fn == "has_nan" else f"{fn} double" for fn in fns
    )
    return spark.createDataFrame(out_rows, schema=schema)


def stats_wide(df: DataFrame, columns: Sequence[str], fns: Sequence[str] | None = None) -> DataFrame:
    """Fully-distributed variant: one row, columns named col__fn (no
    collect). Used by oracle-checked queries. Percentile fns share one
    array aggregate per column (see :func:`_wide_aggs`)."""
    fns = tuple(fns or DEFAULT_FNS)
    aggs, post = _wide_aggs(columns, fns)
    return df.agg(*aggs).select(*post)


def approx_stats(
    df: DataFrame,
    columns: Sequence[str],
    group_by: Sequence[str] | None = None,
    rsd: float = 0.05,
    quantiles: Sequence[float] = (0.5,),
    accuracy: int = 10_000,
) -> DataFrame:
    """Sketch-based statistics for 100 TB profiling: HyperLogLog++
    distinct counts (``approx_count_distinct``, relative error ``rsd``)
    and KLL-style approximate quantiles (``percentile_approx``,
    1/``accuracy`` rank error) per column, optionally per group.

    The exact versions (``count(distinct)``, ``percentile``) shuffle
    every distinct value / sort every row; the sketches are fixed-size
    mergeable state per partition — the only viable shape for interactive
    profiling at corpus scale. Approximation error is pinned by
    tests/test_operators.py::test_approx_stats_close_to_exact.
    """
    def _qname(q: float) -> str:
        # percent naming (p50, p90, p100) with a dot-free fractional tail
        # (p50_1 for 0.501, p0_1 for 0.001) so distinct quantiles never
        # collide into one column name
        pct = q * 100
        name = f"p{pct:.10g}".replace(".", "_").replace("-", "m")
        return name

    qnames = [_qname(q) for q in quantiles]
    if len(set(qnames)) != len(qnames):
        raise ValueError(f"approx_stats: duplicate quantile names {qnames}")
    # ONE KLL sketch per column (percentile_approx takes the quantile
    # array), not one per (column, quantile) — the sketch build is the
    # dominant cost and is identical for every requested quantile
    aggs = []
    post = []
    for c in columns:
        aggs.append(F.approx_count_distinct(c, rsd=rsd).alias(f"{c}_approx_distinct"))
        aggs.append(
            F.percentile_approx(
                c, F.array(*[F.lit(float(q)) for q in quantiles]), accuracy
            ).alias(f"__q_{c}")
        )
        post.append((c, [f"{c}_{qn}" for qn in qnames]))
    g = df.groupBy(*[F.col(c) for c in (group_by or [])])
    out = g.agg(*aggs)
    for c, names in post:
        for i, alias in enumerate(names):
            out = out.withColumn(alias, F.col(f"__q_{c}")[i])
        out = out.drop(f"__q_{c}")
    return out
