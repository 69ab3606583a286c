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


def test_stateful_running_stats(spark, events_batch):
    """applyInPandasWithState running stats must equal batch aggregates
    for count/sum (EMA is order-dependent so only sanity-checked)."""
    path, batch_df = events_batch
    from ezdata_spark.streaming.stateful import run_stateful_to_memory

    got = run_stateful_to_memory(spark, path, batch_df.schema, name="ez_state_test")
    # update mode emits once per key per micro-batch; keep the last emit
    final = {}
    for r in got.collect():
        final[r.event_type] = (r.n, r.total, r.ema)
    ref = {
        r.event_type: (r.n, r.total)
        for r in batch_df.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert set(final) == set(ref)
    for k, (n, total) in ref.items():
        gn, gtotal, gema = final[k]
        assert gn == n
        assert gtotal == pytest.approx(total, rel=1e-9)
        lo, hi = batch_df.filter(F.col("event_type") == k).agg(
            F.min("value"), F.max("value")
        ).collect()[0]
        assert lo <= gema <= hi


def test_session_window_batch(spark, events_batch):
    from ezdata_spark.streaming.stateful import session_agg

    _, batch_df = events_batch
    out = session_agg(batch_df, gap="30 minutes")
    rows = out.collect()
    assert len(rows) > 0
    for r in rows[:50]:
        assert r.session_end > r.session_start


def test_stream_dedup_within_watermark(spark, events_batch, tmp_path_factory):
    """Duplicated input rows collapse to one within the watermark."""
    path, batch_df = events_batch
    from ezdata_spark.streaming.stateful import stream_dedup

    # duplicate every row, write as the stream source
    dup_path = str(tmp_path_factory.mktemp("events_dup"))
    batch_df.unionAll(batch_df).write.mode("overwrite").parquet(dup_path)

    stream = spark.readStream.schema(batch_df.schema).parquet(dup_path)
    q = (
        stream_dedup(stream, ["event_id"], ts="ts", watermark="1 hour")
        .writeStream.format("memory")
        .queryName("ez_dedup_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("ez_dedup_test").count()
    assert got == batch_df.count()  # every duplicate suppressed


def test_stream_stream_join(spark, events_batch):
    """Self-join of the event stream: every event joins itself at
    tolerance 0 (same key, same ts), proving the bounded-state
    stream-stream join wiring."""
    path, batch_df = events_batch
    from ezdata_spark.streaming.stateful import stream_stream_join

    s1 = spark.readStream.schema(batch_df.schema).parquet(path).select("event_id", "ts")
    s2 = spark.readStream.schema(batch_df.schema).parquet(path).select("event_id", "ts")
    j = stream_stream_join(s1, s2, on="event_id", ts="ts",
                           watermark="1 hour", tolerance="0 seconds")
    q = (
        j.writeStream.format("memory")
        .queryName("ez_ss_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.table("ez_ss_join").count() == batch_df.count()


def test_pipeline_ops_compose_with_streams(spark, tmp_path):
    """The stateless pipeline tier (quality features, lang id, PII scan/
    redaction, token counts) is plain column expressions, so the SAME
    operator code must run unchanged on a readStream frame."""
    from ezdata_spark.operators.textstats import (
        lang_id,
        pii_scan,
        quality_features,
        redact_pii,
        token_count,
    )

    docs = spark.createDataFrame(
        [(1, "the cat and the dog sat on a mat for a while today"),
         (2, "der hund ist nicht da und die katze auch nicht"),
         (3, "write to a.b@x.org or dial 555-123-4567 now")],
        "doc_id long, text string",
    )
    path = str(tmp_path / "docs")
    docs.write.mode("overwrite").parquet(path)

    stream = spark.readStream.schema(docs.schema).parquet(path)
    out = redact_pii(pii_scan(lang_id(quality_features(stream))))
    out = out.withColumn("n_tokens", token_count("text"))
    assert out.isStreaming

    q = (
        out.writeStream.format("memory")
        .queryName("ez_pipe_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r.doc_id: r for r in spark.sql("SELECT * FROM ez_pipe_stream").collect()}
    assert len(rows) == 3
    assert rows[1].lang_pred == "en" and rows[2].lang_pred == "de"
    assert rows[3].n_email == 1 and rows[3].n_phone == 1
    assert "<EMAIL>" in rows[3].redacted and "<PHONE>" in rows[3].redacted
    # batch and stream produce identical values for the same input
    batch = {r.doc_id: r for r in redact_pii(pii_scan(lang_id(quality_features(docs)))).collect()}
    for i in (1, 2, 3):
        assert rows[i].quality_score == batch[i].quality_score
        assert rows[i].redacted == batch[i].redacted


def test_decontaminate_stateless_on_stream(spark, tmp_path):
    """Stateless decontamination (arrays_overlap vs a literal benchmark
    n-gram set) must run under Structured Streaming append mode with
    values identical to batch — no state, no watermark needed."""
    import pandas as pd

    from ezdata_spark.operators.corpus import decontaminate_stateless

    src = str(tmp_path / "docs.parquet")
    pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "alpha beta gamma delta",
                "omega psi chi phi",
                "beta gamma delta epsilon",
            ],
        }
    ).to_parquet(src)
    batch_df = spark.read.parquet(src)
    bench = ["alpha beta gamma", "beta gamma delta"]

    stream = (
        spark.readStream.schema(batch_df.schema)
        .format("parquet")
        .load(str(tmp_path) + "/*.parquet")
    )
    flagged = decontaminate_stateless(stream, bench, n=3)
    q = (
        flagged.writeStream.format("memory")
        .queryName("decontam_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = {r.doc_id: r.contaminated
           for r in spark.sql("select * from decontam_stream").collect()}
    expected = {r.doc_id: r.contaminated
                for r in decontaminate_stateless(batch_df, bench, n=3).collect()}
    assert got == expected == {1: True, 2: False, 3: True}


def test_jsonl_stream_to_curated_parquet(spark, tmp_path):
    """End-to-end streaming ingest: JSONL corpus files -> stateless
    curation tier (quality gate + lang-id + PII redaction +
    decontamination) -> partitioned parquet sink, all under availableNow
    triggers — the shape of a continuously-ingesting corpus pipeline.
    Values must equal the batch run of the same composition."""
    import json as _json

    from ezdata_spark.operators.corpus import decontaminate_stateless, split_by_hash
    from ezdata_spark.operators.textstats import lang_id, quality_features, redact_pii

    src = tmp_path / "in"
    src.mkdir()
    rows = [
        {"doc_id": 1, "text": "the quick brown fox jumps over the lazy dog"},
        {"doc_id": 2, "text": "der schnelle braune fuchs und der faule hund"},
        {"doc_id": 3, "text": "contact me at bob@example.com for the data"},
        {"doc_id": 4, "text": "le renard brun et rapide est la"},
    ]
    with open(src / "part0.jsonl", "w") as fh:
        for r in rows:
            fh.write(_json.dumps(r) + "\n")

    schema = "doc_id long, text string"
    bench = ["quick brown fox"]

    def tier(df):
        out = redact_pii(lang_id(quality_features(df)))
        out = decontaminate_stateless(out, bench, n=3)
        return split_by_hash(out).select(
            "doc_id", "lang_pred", "quality_score", "redacted",
            "contaminated", "split",
        )

    out_dir = str(tmp_path / "out")
    stream = spark.readStream.schema(schema).json(str(src))
    q = (
        tier(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .partitionBy("split")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    batch = tier(spark.read.schema(schema).json(str(src)))
    got = {r.doc_id: (r.lang_pred, r.quality_score, r.redacted, r.contaminated, r.split)
           for r in spark.read.parquet(out_dir).collect()}
    exp = {r.doc_id: (r.lang_pred, r.quality_score, r.redacted, r.contaminated, r.split)
           for r in batch.collect()}
    assert got == exp
    assert len(got) == 4
    assert got[1][3] is True and got[2][3] is False  # decontamination flag
    assert "bob@example.com" not in got[3][2]        # PII redacted


def test_chunk_and_score_compose_with_streams(spark, tmp_path):
    """The round-6 stateless additions (sliding-window chunking and the
    literal-map linear scorer) are pure per-row expressions — the SAME
    operator code must run unchanged on a readStream frame in append
    mode and produce batch-identical values. (The DataFrame-weights
    ``linear_score`` aggregates per doc and is the batch/complete-mode
    form.)"""
    from ezdata_spark.operators.corpus import chunk_text
    from ezdata_spark.operators.textstats import linear_score_stateless

    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(11))), (2, "good text here")],
        "doc_id long, text string",
    )
    weights = {"good": 1.5, "w3": -0.5}
    path = str(tmp_path / "docs6")
    docs.write.mode("overwrite").parquet(path)
    stream = spark.readStream.schema(docs.schema).parquet(path)

    chunks = chunk_text(stream, chunk_tokens=4, overlap=1)
    assert chunks.isStreaming
    q = (
        chunks.writeStream.format("memory").queryName("ez_chunk_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        (r.doc_id, r.chunk_index): (r.chunk, r.chunk_tokens)
        for r in spark.sql("SELECT * FROM ez_chunk_stream").collect()
    }
    want = {
        (r.doc_id, r.chunk_index): (r.chunk, r.chunk_tokens)
        for r in chunk_text(docs, chunk_tokens=4, overlap=1).collect()
    }
    assert got == want

    scored = linear_score_stateless(stream, weights, bias=0.25)
    assert scored.isStreaming
    q2 = (
        scored.writeStream.format("memory").queryName("ez_score_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q2.awaitTermination(120)
    got2 = {
        r.doc_id: (r.n_tokens, r.prob)
        for r in spark.sql("SELECT * FROM ez_score_stream").collect()
    }
    want2 = {
        r.doc_id: (r.n_tokens, r.prob)
        for r in linear_score_stateless(docs, weights, bias=0.25).collect()
    }
    assert got2 == want2
