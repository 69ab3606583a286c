"""N-D binned aggregation (histogram / binned-statistic) on Spark.

Reference: ``ezdata/xarray.py`` — ``xr_histogram`` (np.histogramdd,
38-96), ``xr_histogram_df`` (weighted per-column, 99-165),
``df_groupby_bins`` (pandas groupby + reindex keeping empty bins,
168-222), ``xr_binned_statistic_df`` (scipy.binned_statistic_dd,
categorical-aware, 269-335), ``guess_bins`` (23-35).

Spark mapping: bin ids are computed with pure column arithmetic
(``floor((x - lo) / width)``, clamped so the right edge falls in the last
bin, matching np.histogramdd edge semantics), aggregated with a single
hash-aggregate (map-side partial combine — one shuffle of at most
``prod(nbins)`` rows), then **densified** against a generated bin grid
(``spark.range`` per dim, cross-joined — the grid is tiny relative to
data and broadcast to the agg result). Scales: the shuffle carries bins,
not rows.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class BinSpec:
    """One binning dimension: numeric (lo/hi/nbins) or categorical."""

    col: str
    lo: float | None = None
    hi: float | None = None
    nbins: int | None = None
    categorical: bool = False

    @property
    def width(self) -> float:
        span = self.hi - self.lo
        # constant column (lo == hi): any positive width puts every value
        # in bin 0 instead of NaN bins from a zero division
        return (span if span > 0 else 1.0) / self.nbins


def _bin_id(spec: BinSpec) -> Column:
    """np.histogramdd semantics: values on the right edge of the last bin
    are included in it; out-of-range values are dropped by the caller.

    Float caveat: this is the O(1) ARITHMETIC form (one fused floor per
    row — the scale-correct choice; the DuckDB oracles use the same
    formula, so cross-engine hashes match). np.histogramdd instead
    searchsorts an explicit edge array, and the two can disagree for a
    value within ~1 ulp of an interior bin edge (e.g. x = -2.2e-16 with
    edges [-3, 0, 3]: (x+3)/3 rounds to exactly 1.0 -> bin 1, while the
    edge comparison x < 0 -> bin 0). For bit-exact edge semantics on
    adversarial boundary values, use :func:`bin_by_edges` (explicit
    edge comparisons, O(n_edges) per row)."""
    c = F.col(spec.col)
    raw = F.floor((c - F.lit(spec.lo)) / F.lit(spec.width))
    return F.least(raw, F.lit(spec.nbins - 1)).cast("long")


def _in_range(spec: BinSpec) -> Column:
    c = F.col(spec.col)
    return (c >= F.lit(spec.lo)) & (c <= F.lit(spec.hi)) & ~F.isnan(c.cast("double"))


def guess_range(df: DataFrame, cols: Sequence[str]) -> dict[str, tuple[float, float]]:
    """min/max per column in ONE job (xarray.py:29-35 computes eagerly
    per-column; we batch)."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"{c}__lo"), F.max(c).alias(f"{c}__hi")]
    row = df.agg(*aggs).collect()[0]
    out = {}
    for c in cols:
        lo, hi = row[f"{c}__lo"], row[f"{c}__hi"]
        if lo is None or hi is None:
            raise ValueError(
                f"column {c!r} has no non-null values to infer a range from; "
                "pass an explicit range="
            )
        out[c] = (lo, hi)
    return out


def _grid(df: DataFrame, specs: Sequence[BinSpec]) -> DataFrame:
    """Dense bin-id grid: cross product of per-dim ranges / categories.

    Kept lazy & generated (spark.range); for categorical dims the
    distinct values come from the data (one small job is avoided by
    crossing the distinct frame directly)."""
    spark = df.sparkSession
    grid = None
    for s in specs:
        if s.categorical:
            d = df.select(F.col(s.col).alias(f"{s.col}__bin")).distinct()
        else:
            d = spark.range(s.nbins).select(F.col("id").alias(f"{s.col}__bin"))
        grid = d if grid is None else grid.crossJoin(d)
    return grid


def binned_agg(
    df: DataFrame,
    specs: Sequence[BinSpec],
    aggs: dict[str, Column],
    densify: bool = True,
    fill: dict | None = None,
    with_centers: bool = True,
) -> DataFrame:
    """Group rows into N-D bins and aggregate; optionally densify so empty
    bins appear (xarray.py:218-221 ``reindex`` semantics).

    ``aggs``: output_name -> Spark aggregate Column.
    Result columns: ``<col>__bin`` (+ ``<col>__center`` for numeric dims)
    per dimension, then one column per agg.
    """
    pred = [_in_range(s) for s in specs if not s.categorical]
    filtered = df.filter(reduce(lambda a, b: a & b, pred)) if pred else df

    bin_cols = []
    for s in specs:
        if s.categorical:
            bin_cols.append(F.col(s.col).alias(f"{s.col}__bin"))
        else:
            bin_cols.append(_bin_id(s).alias(f"{s.col}__bin"))

    agged = filtered.groupBy(*bin_cols).agg(*[c.alias(n) for n, c in aggs.items()])

    if densify:
        grid = _grid(df, specs)
        keys = [f"{s.col}__bin" for s in specs]
        # the agg result is at most prod(nbins) rows -> broadcast side of
        # the densification join; grid is generated, also tiny.
        # NULL-SAFE equality: a categorical dim may contain null as a
        # real category, and a plain equi-join would drop its counts
        a = agged
        for k in keys:
            a = a.withColumnRenamed(k, k + "__r")
        cond = reduce(
            lambda x, y: x & y, [grid[k].eqNullSafe(a[k + "__r"]) for k in keys]
        )
        agged = grid.join(a, cond, "left").drop(*[k + "__r" for k in keys])
        fills = fill or {}
        for n in aggs:
            agged = agged.withColumn(n, F.coalesce(F.col(n), F.lit(fills.get(n, 0))))

    if with_centers:
        for s in specs:
            if not s.categorical:
                agged = agged.withColumn(
                    f"{s.col}__center",
                    (F.lit(s.lo) + (F.col(f"{s.col}__bin") + F.lit(0.5)) * F.lit(s.width)).cast("double"),
                )
    return agged


def guess_bins(df: DataFrame, col: str, max_distinct: int = 1_000_000):
    """Data-driven bin edges (guess_bins, xarray.py:23-31): dx = the
    minimum spacing between sorted distinct values, edges =
    ``arange(min - 0.5*dx, max + 0.6*dx, dx)`` so every value sits
    mid-bin and the last value is inside the final bin.

    Scale shape: ``distinct()`` is the data reducer (a shuffle of
    distinct values, not rows); the adjacent-diff window then runs over
    the DISTINCT frame only, which is capped at ``max_distinct`` — a
    min-spacing grid over more distinct values than that would also
    blow up the driver-side edge array (the reference has the same
    failure mode: np.arange with a tiny dx). Only 3 scalars reach the
    driver; the edge array is built locally from them."""
    import numpy as np

    d = df.select(F.col(col).cast("double").alias("v")).na.drop().distinct()
    n = d.count()
    if n < 2:
        raise ValueError(f"guess_bins({col!r}): need >= 2 distinct values, got {n}")
    if n > max_distinct:
        raise ValueError(
            f"guess_bins({col!r}): {n} distinct values would produce a >= {n}-bin grid; "
            "pass explicit bins/range for near-continuous columns"
        )
    from pyspark.sql import Window

    w = Window.orderBy("v")  # bounded: distinct values only (<= max_distinct)
    row = (
        d.withColumn("dx", F.col("v") - F.lag("v").over(w))
        .agg(F.min("v").alias("lo"), F.max("v").alias("hi"), F.min("dx").alias("dx"))
        .collect()[0]
    )
    return np.arange(row.lo - 0.5 * row.dx, row.hi + 0.6 * row.dx, row.dx)


def histogram(
    df: DataFrame,
    col: str,
    nbins: int | None = 50,
    lo: float | None = None,
    hi: float | None = None,
    weight: str | None = None,
    densify: bool = True,
) -> DataFrame:
    """1-D histogram (xr_histogram, xarray.py:38-96). ``nbins=None``
    infers data-driven edges from the minimum value spacing
    (guess_bins) — the reference's default for casual ``hist()``
    calls on quantized columns."""
    if nbins is None:
        edges = guess_bins(df, col)
        aggs = None if weight is None else {"wsum": F.sum(weight)}
        return histogram_like(df, col, [float(e) for e in edges], aggs)
    if lo is None or hi is None:
        r = guess_range(df, [col])[col]
        lo = lo if lo is not None else r[0]
        hi = hi if hi is not None else r[1]
    spec = BinSpec(col, float(lo), float(hi), nbins)
    agg = {"count": F.count(F.lit(1))} if weight is None else {"wsum": F.sum(weight)}
    return binned_agg(df, [spec], agg, densify=densify)


def bin_by_edges(col, edges: Sequence[float]) -> Column:
    """Bin id from EXPLICIT (possibly non-uniform) edges —
    xr_histogram_like semantics (xarray.py:234-266: reuse another
    grid's bin edges). np.histogramdd edge rules: right-closed last
    bin, out-of-range -> null.

    One aggregate pass over the literal edge array (O(n_edges) per row,
    codegen-free but tiny); for uniform edges prefer BinSpec's O(1)
    arithmetic form.
    """
    c = F.col(col) if isinstance(col, str) else col
    e = F.array(*[F.lit(float(x)) for x in edges])
    n = len(edges) - 1
    # count of edges <= value, over the interior edges only
    idx = F.aggregate(
        F.slice(e, 2, n - 1), F.lit(0), lambda acc, b: acc + F.when(c >= b, 1).otherwise(0)
    )
    lo, hi = float(edges[0]), float(edges[-1])
    return F.when((c >= F.lit(lo)) & (c <= F.lit(hi)), idx.cast("long")).otherwise(F.lit(None))


def histogram_like(
    df: DataFrame,
    col: str,
    edges: Sequence[float],
    aggs: dict[str, Column] | None = None,
    fill: dict | None = None,
) -> DataFrame:
    """Histogram on a reference grid's edges (xr_histogram_like,
    xarray.py:234-266): out-of-range rows drop, the last bin is
    right-closed, empty bins densify against the edge count.

    ``fill`` sets the empty-bin value per agg (default 0, matching
    np.histogram counts); non-additive stats (mean/min/...) should pass
    ``fill={name: None}`` to keep empty bins null, same policy as
    binned_agg."""
    spark = df.sparkSession
    binned = df.withColumn("__bin", bin_by_edges(col, edges)).filter(
        F.col("__bin").isNotNull()
    )
    use = aggs or {"count": F.count(F.lit(1))}
    agged = binned.groupBy(F.col("__bin").alias(f"{col}__bin")).agg(
        *[c.alias(nm) for nm, c in use.items()]
    )
    grid = spark.range(len(edges) - 1).select(F.col("id").alias(f"{col}__bin"))
    out = grid.join(agged, on=f"{col}__bin", how="left")
    fills = fill or {}
    unknown = set(fills) - set(use)
    if unknown:
        raise ValueError(f"fill keys not in aggs: {sorted(unknown)} (aggs: {sorted(use)})")
    for nm in use:
        fv = fills.get(nm, 0)
        if fv is not None:
            out = out.withColumn(nm, F.coalesce(F.col(nm), F.lit(fv)))
    return out


def histogram_df(
    df: DataFrame,
    binby: str,
    columns: Sequence[str] | None = None,
    nbins: int = 50,
    lo: float | None = None,
    hi: float | None = None,
    densify: bool = True,
) -> DataFrame:
    """Weighted histogram per column (xr_histogram_df, xarray.py:99-165):
    for each value column, the per-bin SUM of that column (weights=the
    column itself), plus the plain count — ALL columns in ONE pass
    (one groupBy; the reference loops np.histogram per column).
    """
    if lo is None or hi is None:
        r = guess_range(df, [binby])[binby]
        lo = lo if lo is not None else r[0]
        hi = hi if hi is not None else r[1]
    numeric = {"double", "float", "int", "bigint", "smallint", "tinyint"}
    cols = list(columns) if columns else [
        n for n, t in df.dtypes if t in numeric and n != binby
    ]
    spec = BinSpec(binby, float(lo), float(hi), nbins)
    aggs: dict[str, Column] = {"count": F.count(F.lit(1))}
    for c in cols:
        aggs[f"sum_{c}"] = F.sum(c)
    return binned_agg(df, [spec], aggs, densify=densify)


def count_cat(
    df: DataFrame,
    specs: Sequence[BinSpec],
    cat: str,
    densify: bool = False,
    max_categories: int = 10_000,
) -> DataFrame:
    """Datashader ``count_cat`` reduction (datashader.py:132-133): per
    raster cell, one count column per category — groupBy(bins, cat)
    then pivot. The category dimension must be low-cardinality (it
    becomes columns); the pivot values are collected once driver-side
    for a deterministic column order.

    ``max_categories`` bounds that collect: a high-cardinality column
    (user ids, raw text) would otherwise stream millions of pivot
    values into the driver before the pivot itself became unusable —
    fail fast with guidance instead. The probe fetches at most
    ``max_categories + 1`` rows regardless of true cardinality."""
    from .util import capped_distinct

    vals = capped_distinct(
        df, cat, max_categories, "count_cat",
        "each category becomes a pivot COLUMN, so this is almost "
        "certainly the wrong column (did you mean a binned/bucketed "
        "form of it?).",
    )
    cats = sorted(v for v in vals if v is not None)
    bin_cols = [
        (F.col(s.col) if s.categorical else _bin_id(s)).alias(f"{s.col}__bin")
        for s in specs
    ]
    pred = [_in_range(s) for s in specs if not s.categorical]
    filtered = df.filter(reduce(lambda a, b: a & b, pred)) if pred else df
    out = (
        filtered.groupBy(*bin_cols)
        .pivot(cat, cats)
        .agg(F.count(F.lit(1)))
        .na.fill(0, [str(c) for c in cats])
    )
    return out


def binned_statistic(
    df: DataFrame,
    bin_specs: Sequence[BinSpec],
    value: str,
    statistic: str = "mean",
    densify: bool = True,
) -> DataFrame:
    """N-D binned statistic (xr_binned_statistic_df, xarray.py:269-335);
    categorical dims are grouped directly (codes path at 300-313)."""
    from .groupby import _AGG_MAP

    if statistic not in _AGG_MAP:
        raise ValueError(f"unknown statistic {statistic!r}")
    agg_fn = _AGG_MAP[statistic]
    col = F.col(value)
    return binned_agg(
        df,
        bin_specs,
        {statistic: agg_fn(col)},
        densify=densify,
        fill={statistic: None} if statistic != "count" else None,
    )
