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


def lag_column(
    df: DataFrame, value: str, order_by: str, t: int = 1, partition_by: str | None = None,
    name: str | None = None,
) -> DataFrame:
    """x[t] series (lagplot analog). Without partition_by this is a
    global-sort window — fine for plot-sized frames, flagged for scale."""
    w = Window.orderBy(order_by) if partition_by is None else Window.partitionBy(partition_by).orderBy(order_by)
    return df.withColumn(name or f"{value}_lag{t}", F.lag(value, t).over(w))


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
    gap_seconds: int = 1800,
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
    us = F.unix_micros(F.col(ts))
    prev = F.lag(us).over(w)
    new_sess = F.when(
        prev.isNull() | (us - prev > int(gap_seconds) * 1_000_000), 1
    ).otherwise(0)
    return df.withColumn(name, F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0)))
