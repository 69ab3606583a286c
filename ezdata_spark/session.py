"""SparkSession factory tuned for the engine.

The reference (ezdata) is a single-process NumPy library with no session
concept; everything here is Spark-native configuration chosen for scale:

- AQE on: runtime coalescing of shuffle partitions, skew-join splitting,
  and dynamic join-strategy switching replace any hand-tuning.
- ANSI off: the reference's expression dialect is numpy ``eval`` —
  division by zero yields inf/NaN, overflow wraps, casts are lenient.
  Spark 4 defaults ANSI on; we turn it off so expression semantics match
  the numpy dialect (no runtime errors on edge values).
- Arrow on: every pandas_udf / applyInPandas / toPandas crossing is
  Arrow-batched.
- shuffle.partitions sized for local[32]; on a real cluster AQE coalesces
  from a larger initial number, so we set the initial partition number
  high and let AQE shrink it.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(app_name: str = "ezdata-spark", shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults applied."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sp = DEFAULT_SHUFFLE_PARTITIONS if shuffle_partitions is None else shuffle_partitions
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.sql.session.timeZone", "UTC")
    )
    spark = builder.getOrCreate()
    # getOrCreate returns an existing session with builder confs ignored;
    # re-apply the runtime-settable ones so explicit args are honored
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(sp))
    except Exception:
        pass
    return spark


def tune_existing(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine defaults to an externally-created session.

    The driver hands ``entry(spark)`` its own session; ANSI mode and AQE
    are runtime-settable SQL confs, so we align them here.
    """
    for k, v in {
        "spark.sql.ansi.enabled": "false",
        # the events fixture carries TIMESTAMP(NANOS) parquet, which the
        # Spark 4 reader rejects; read as long + convert (see queries.load)
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.session.timeZone": "UTC",
    }.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on this build — leave as-is
    return spark
