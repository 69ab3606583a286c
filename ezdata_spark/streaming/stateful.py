"""Custom stateful streaming operators via applyInPandasWithState.

Pure extension (the reference has no streaming, SURVEY.md §2.10). Two
surfaces:

- ``session_agg``: built-in ``F.session_window`` gap-based sessions —
  use this whenever the semantics fit; state handling is Spark's.
- ``running_stats_stream``: the custom-operator escape hatch —
  arbitrary per-key state (here: running count / sum / EMA of event
  values) kept in a GroupState with a timeout, the
  ``applyInPandasWithState`` pattern any bespoke stateful operator
  follows at scale (state is per-key, partitioned by the grouping key,
  checkpointed by the engine).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .windows import as_event_time

RUNNING_SCHEMA = "event_type string, n bigint, total double, ema double"
_STATE_SCHEMA = "n bigint, total double, ema double"


def session_agg(
    df: DataFrame,
    ts: str = "ts",
    gap: str = "30 minutes",
    keys: list[str] | tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Gap-based session windows (batch or stream: same expression).

    Sessions close after ``gap`` of inactivity per key — the built-in
    replacement for hand-rolled sessionization; on a stream add
    ``withWatermark`` so state for closed sessions is evicted.

    Scale note: the session merge shuffles and sorts by ``keys``, so the
    keys' cardinality bounds parallelism. Group by a high-cardinality
    key (user/session owner), not a low-cardinality category — 5
    distinct keys means 5 busy tasks regardless of cluster size.
    """
    df = as_event_time(df, ts)
    keys = list(keys)
    return (
        df.groupBy(F.session_window(ts, gap).alias("w"), *[F.col(k) for k in keys])
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            *keys,
            "n_events",
            "sum_value",
        )
    )


def _running_stats_fn(alpha: float):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, total, ema = state.get
        else:
            n, total, ema = 0, 0.0, None
        for pdf in pdfs:
            for v in pdf["value"]:
                v = float(v)
                n += 1
                total += v
                ema = v if ema is None else alpha * v + (1 - alpha) * ema
        state.update((n, total, ema))
        yield pd.DataFrame(
            {"event_type": [key[0]], "n": [n], "total": [total], "ema": [ema]}
        )

    return fn


def running_stats_stream(
    spark: SparkSession,
    path: str,
    schema,
    alpha: float = 0.1,
    timeout: str = GroupStateTimeout.NoTimeout,
) -> DataFrame:
    """Per-event-type running (count, sum, EMA) over a parquet stream.

    State is one small tuple per key, partitioned by the grouping key and
    checkpointed by the engine; emits the updated stats once per
    micro-batch per key.
    """
    stream = spark.readStream.schema(schema).parquet(path)
    return (
        stream.select("event_type", "value")
        .groupBy("event_type")
        .applyInPandasWithState(
            _running_stats_fn(alpha),
            outputStructType=RUNNING_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout,
        )
    )


def stream_dedup(
    stream: DataFrame,
    keys: list[str],
    ts: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup with bounded state.

    ``dropDuplicatesWithinWatermark``: a key seen once is suppressed on
    re-arrival until the watermark passes it, then its state is evicted
    — so state is O(keys per watermark window), not O(stream length).
    The streaming form of ``operators/dedup.py::exact_dedup`` for
    continuously-arriving corpora.
    """
    stream = as_event_time(stream, ts)
    return stream.withWatermark(ts, watermark).dropDuplicatesWithinWatermark(keys)


def run_stateful_to_memory(
    spark: SparkSession, path: str, schema, name: str = "ez_stateful", alpha: float = 0.1
) -> DataFrame:
    """Drive the stateful op over existing files (availableNow) and
    return the materialized per-key stats (integration-test harness)."""
    q = (
        running_stats_stream(spark, path, schema, alpha)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(120):
        q.stop()
        raise TimeoutError(f"stateful stream {name!r} did not finish within 120s")
    return spark.table(name)


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str = "ts",
    watermark: str = "1 hour",
    tolerance: str = "30 minutes",
) -> DataFrame:
    """Stream-stream inner equi-join with bounded state.

    Both sides carry a watermark and the join predicate bounds the
    event-time distance, so each side's state holds only rows within
    watermark + tolerance — the scalable shape for joining two live
    feeds (e.g. impressions x clicks).
    """
    lw = as_event_time(left, ts).withWatermark(ts, watermark)
    rw = (
        as_event_time(right, ts).withWatermark(ts, watermark)
        .withColumnRenamed(ts, f"{ts}_r")
        .withColumnRenamed(on, f"{on}_r")
    )
    cond = (
        (F.col(on) == F.col(f"{on}_r"))
        & (F.col(f"{ts}_r") >= F.col(ts))
        & (F.col(f"{ts}_r") <= F.col(ts) + F.expr(f"INTERVAL {tolerance}"))
    )
    return lw.join(rw, cond, "inner")
