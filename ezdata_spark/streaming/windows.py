"""Structured Streaming façade over the events table.

The reference has no streaming at all (SURVEY.md §2.10); this is a pure
extension. The same windowed aggregation is exposed twice:

- ``tumbling_agg(df, ...)``: batch form — ``F.window`` bucketing, used by
  the oracle-checked query (time_bucket-equivalent SQL).
- ``stream_tumbling_agg(spark, path, ...)``: streaming form — a
  ``readStream`` over the same parquet directory with a watermark for
  late data; identical aggregation expression, demonstrating
  batch/stream unification. Tested with trigger(availableNow=True) into
  a memory sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def as_event_time(df: DataFrame, ts: str) -> DataFrame:
    """Normalize an event-time column to session-TZ TIMESTAMP.

    ``withWatermark`` / streaming ``session_window`` raise
    EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE for TIMESTAMP_NTZ input (e.g.
    parquet TIMESTAMP(MICROS, isAdjustedToUTC=0)). The session TZ is
    pinned UTC, so the cast is a lossless reinterpretation; when the
    column is already TIMESTAMP the cast is a Catalyst no-op. Every
    event-time helper here owns this normalization so callers never
    depend on the fixture's parquet logical-type details.
    """
    if dict(df.dtypes).get(ts) == "timestamp_ntz":
        return df.withColumn(ts, F.col(ts).cast("timestamp"))
    return df


def tumbling_agg(df: DataFrame, ts: str = "ts", duration: str = "1 hour") -> DataFrame:
    return (
        df.groupBy(F.window(ts, duration).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "avg_value",
        )
    )


def stream_tumbling_agg(
    spark: SparkSession,
    path: str,
    schema,
    ts: str = "ts",
    duration: str = "1 hour",
    watermark: str = "2 hours",
):
    """readStream -> windowed agg with watermark; caller attaches the sink.

    Watermark bounds state: windows older than (max event time -
    watermark) are finalized and evicted, so state size is O(active
    windows), not O(stream length).
    """
    stream = as_event_time(spark.readStream.schema(schema).parquet(path), ts)
    return (
        stream.withWatermark(ts, watermark)
        .groupBy(F.window(ts, duration).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "avg_value")
    )


def run_stream_to_memory(spark: SparkSession, path: str, schema, name: str = "ez_stream") -> DataFrame:
    """Drive the streaming agg over existing files with availableNow and
    return the materialized result (integration-test harness)."""
    q = (
        stream_tumbling_agg(spark, path, schema)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(120):
        q.stop()
        raise TimeoutError(f"stream {name!r} did not finish within 120s")
    return spark.table(name)
