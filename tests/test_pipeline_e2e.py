"""End-to-end pipeline composition: the full training-data flow a
reference user would run, chained through real operator outputs —
curate -> near-dup dedup -> Bloom-screened decontamination -> quality
classifier train + AUC eval -> chunk -> pack -> split -> PCA-reduced
semantic dedup -> sharded parquet sink. Each stage consumes the
previous stage's frame (no re-reads), and the invariants asserted are
the contracts the individual operator tests pin in isolation — this
test pins that they hold COMPOSED."""

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"


def test_full_training_data_pipeline(spark, tmp_path):
    from ezdata_spark.operators.corpus import (
        chunk_text,
        curate,
        decontaminate,
        split_by_hash,
    )
    from ezdata_spark.operators.dedup import minhash_dedup, neardup_clusters
    from ezdata_spark.operators.decomp import pca_project, pca_train
    from ezdata_spark.operators.evaluate import binary_auc
    from ezdata_spark.operators.sampling import pack_sequences
    from ezdata_spark.operators.textstats import (
        linear_score_hashed,
        logreg_train_hashed,
        token_count,
    )
    from ezdata_spark.operators.corpus import semantic_dedup
    from ezdata_spark.cache import release_caches

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_raw = docs.count()

    # 1. curate: gates + exact dedup + per-source cap
    kept = curate(docs, min_chars=30, langs=["en", "de", "fr"], cap=200)
    n_kept = kept.count()
    assert 0 < n_kept <= n_raw

    # 2. near-dup dedup: pairs -> clusters -> keep min-id representative
    pairs = minhash_dedup(kept, "text", "doc_id", threshold=0.7)
    clusters = neardup_clusters(pairs, "id_a", "id_b")
    drop = clusters.filter(F.col("node") != F.col("cluster_id")).select(
        F.col("node").alias("doc_id")
    )
    deduped = kept.join(drop, "doc_id", "left_anti")
    n_dedup = deduped.count()
    assert n_dedup <= n_kept and n_dedup == n_kept - drop.count()

    # 3. decontamination vs a held-out slice, Bloom-screened; the
    # screen must not change results (spot-pinned here, fully pinned
    # in test_round10)
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    clean = decontaminate(deduped, bench, n=3, prefilter="bloom").filter(
        ~F.col("contaminated")
    )
    n_clean = clean.count()
    assert 0 < n_clean <= n_dedup

    # 4. quality classifier on the surviving corpus: train, score, AUC
    labeled = clean.withColumn("label", (F.col("lang") == "en").cast("double"))
    w, b = logreg_train_hashed(labeled, n_buckets=256, epochs=2, lr=1.0)
    scored = linear_score_hashed(labeled.select("doc_id", "text"), w, b).join(
        labeled.select("doc_id", "label"), "doc_id"
    )
    auc_row = binary_auc(
        scored.select(F.round("prob", 4).alias("score"), F.col("label").cast("int").alias("label"))
    ).first()
    assert auc_row["n_pos"] + auc_row["n_neg"] == n_clean
    assert auc_row["auc"] is not None and 0.0 <= auc_row["auc"] <= 1.0

    # 5. chunk + pack + split
    chunks = chunk_text(clean, chunk_tokens=32, overlap=8)
    assert chunks.count() >= n_clean  # >=1 chunk per non-empty doc
    toks = clean.select("doc_id", token_count("text").alias("n_tokens"))
    packs = pack_sequences(toks, max_len=256, n_shards=4)
    assert packs.select("doc_id").distinct().count() == n_clean  # nothing lost
    # budget: any over-budget pack must be a single overlong document
    # (documents are never split; an overlong doc gets its own pack)
    over = (
        packs.groupBy("pack_id")
        .agg(F.sum("n_tokens").alias("t"), F.count(F.lit(1)).alias("n"))
        .filter(F.col("t") > 256)
    )
    assert over.filter(F.col("n") > 1).count() == 0
    split = split_by_hash(clean, fractions={"train": 0.8, "val": 0.1, "test": 0.1})
    assert split.select("split").distinct().count() <= 3
    assert split.count() == n_clean

    # 6. embeddings: PCA reduce -> semantic dedup on the reduced space
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    mean, comps, _ = pca_train(emb, k=8)
    red = pca_project(emb, mean, comps).select("vec_id", F.col("pca").alias("embedding"))
    sem = semantic_dedup(red, threshold=0.98, n_cells=4)
    assert sem.count() == emb.count()
    assert sem.filter(F.col("keep")).count() >= 1

    # 7. sink: sharded parquet partitioned by split, read-back equality
    out = str(tmp_path / "corpus_out")
    split.select("doc_id", "text", "split").write.partitionBy("split").parquet(out)
    back = spark.read.parquet(out)
    assert back.count() == n_clean
    assert set(r["doc_id"] for r in back.select("doc_id").collect()) == set(
        r["doc_id"] for r in split.select("doc_id").collect()
    )
    release_caches()
