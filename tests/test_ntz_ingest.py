"""Event-time ingest contract.

The driver's events fixture has changed parquet encoding across
regenerations: TIMESTAMP(NANOS) (read as bigint under nanosAsLong),
then TIMESTAMP(MICROS, isAdjustedToUTC=0) (read as TIMESTAMP_NTZ).
``queries.load`` must normalize every encoding to session-TZ TIMESTAMP
so event-time consumers (unix_micros, watermark, session_window) are
immune to fixture drift. These tests write the same small frame in all
three encodings and assert identical results.
"""

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

TS = [
    datetime.datetime(2026, 1, 1, 0, 0, 0),
    datetime.datetime(2026, 1, 1, 0, 10, 0),
    datetime.datetime(2026, 1, 1, 2, 0, 0),
    datetime.datetime(2026, 1, 1, 2, 0, 0),  # equal-ts tie, second user
    datetime.datetime(2026, 1, 1, 5, 0, 0),
]

ENCODINGS = {
    "micros_ntz": pa.timestamp("us"),            # isAdjustedToUTC=0 -> TIMESTAMP_NTZ
    "micros_utc": pa.timestamp("us", tz="UTC"),  # isAdjustedToUTC=1 -> TIMESTAMP
    "nanos": pa.timestamp("ns"),                 # TIMESTAMP(NANOS) -> bigint (nanosAsLong)
}


def _write(tmp_path, name, ts_type):
    d = tmp_path / name
    d.mkdir()
    tbl = pa.table(
        {
            "event_id": pa.array(range(len(TS)), pa.int64()),
            "ts": pa.array(TS, ts_type),
            "user_id": pa.array([1, 1, 1, 2, 1], pa.int64()),
            "value": pa.array([float(i) for i in range(len(TS))], pa.float64()),
        }
    )
    pq.write_table(tbl, str(d / "events.parquet"), version="2.6")
    return str(d)


def test_load_normalizes_all_ts_encodings(spark, tmp_path):
    from ezdata_spark.queries import load

    results = {}
    for name, t in ENCODINGS.items():
        sf = _write(tmp_path, name, t)
        df = load(spark, sf, "events")
        assert dict(df.dtypes)["ts"] == "timestamp", name
        results[name] = [tuple(r) for r in df.orderBy("event_id").collect()]
    assert results["micros_ntz"] == results["micros_utc"] == results["nanos"]


@pytest.mark.parametrize("name", list(ENCODINGS))
def test_sessionize_identical_across_encodings(spark, tmp_path, name):
    from ezdata_spark.operators.window import sessionize
    from ezdata_spark.queries import load

    sf = _write(tmp_path, f"{name}_sess", ENCODINGS[name])
    df = load(spark, sf, "events")
    out = sessionize(df, "ts", "user_id", gap_seconds=1800, tiebreak="event_id")
    got = {(r.event_id, r.session_id) for r in out.collect()}
    # user 1: 0:00, 0:10 (same session), 2:00 (new), 5:00 (new); user 2: 2:00
    assert got == {(0, 1), (1, 1), (2, 2), (3, 1), (4, 3)}, name


def test_sessionize_accepts_raw_ntz(spark, tmp_path):
    """Defensive path: sessionize on an un-normalized TIMESTAMP_NTZ frame
    (caller bypassed queries.load) must still work via its internal cast."""
    from ezdata_spark.operators.window import sessionize

    sf = _write(tmp_path, "raw_ntz", pa.timestamp("us"))
    raw = spark.read.parquet(f"{sf}/events.parquet")
    assert dict(raw.dtypes)["ts"] == "timestamp_ntz"
    out = sessionize(raw, "ts", "user_id", gap_seconds=1800, tiebreak="event_id")
    got = {(r.event_id, r.session_id) for r in out.collect()}
    assert got == {(0, 1), (1, 1), (2, 2), (3, 1), (4, 3)}


def test_as_event_time_casts_ntz_only(spark, tmp_path):
    from ezdata_spark.streaming.windows import as_event_time

    sf = _write(tmp_path, "ae", pa.timestamp("us"))
    raw = spark.read.parquet(f"{sf}/events.parquet")
    assert dict(raw.dtypes)["ts"] == "timestamp_ntz"
    out = as_event_time(raw, "ts")
    assert dict(out.dtypes)["ts"] == "timestamp"
    # already-TIMESTAMP input passes through untouched (no plan change)
    assert as_event_time(out, "ts") is out


def test_watermark_accepts_ntz_event_time(spark, tmp_path):
    """withWatermark rejects TIMESTAMP_NTZ; the streaming helpers own the
    normalization so an NTZ fixture can never break them again."""
    from pyspark.sql import functions as F

    from ezdata_spark.streaming.stateful import session_agg, stream_dedup

    sf = _write(tmp_path, "wm", pa.timestamp("us"))
    raw = spark.read.parquet(f"{sf}/events.parquet")

    # batch session_window over NTZ input
    sess = session_agg(raw.withColumn("event_type", F.lit("a")))
    assert sess.count() >= 1

    # streaming dedup plan builds (the watermark is attached to a cast col)
    stream = (
        spark.readStream.schema(raw.schema).parquet(sf)
    )
    plan = stream_dedup(stream, ["event_id"], ts="ts", watermark="1 hour")
    assert dict(plan.dtypes)["ts"] == "timestamp"
