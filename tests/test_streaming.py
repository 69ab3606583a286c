"""Structured Streaming façade: the streaming tumbling-window agg over
the events fixture must equal the batch form (batch/stream unification,
streaming/windows.py)."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def events_batch(spark, sf_dir, tmp_path_factory):
    """Re-write events with micro timestamps so readStream (which cannot
    use the nanosAsLong long-read path with a user schema mismatch) sees
    a plain TIMESTAMP column."""
    from ezdata_spark.queries import load

    df = load(spark, sf_dir, "events")
    out = str(tmp_path_factory.mktemp("events_us"))
    df.write.mode("overwrite").parquet(out)
    return out, spark.read.parquet(out)


def test_stream_equals_batch(spark, events_batch):
    path, batch_df = events_batch
    from ezdata_spark.streaming.windows import run_stream_to_memory, tumbling_agg

    batch = {
        (r.window_start, r.event_type): (r.n_events, r.avg_value)
        for r in tumbling_agg(batch_df).collect()
    }
    streamed = run_stream_to_memory(spark, path, batch_df.schema, name="ez_stream_test")
    got = {
        (r.window_start, r.event_type): (r.n_events, r.avg_value)
        for r in streamed.collect()
    }
    assert got == batch
    assert len(got) > 0


def test_watermark_present_in_plan(spark, events_batch):
    path, batch_df = events_batch
    from ezdata_spark.streaming.windows import stream_tumbling_agg

    sdf = stream_tumbling_agg(spark, path, batch_df.schema)
    assert sdf.isStreaming
    assert "EventTimeWatermark" in sdf._jdf.queryExecution().logical().toString()
