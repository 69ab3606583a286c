"""Round-10 tests: round-9 ADVICE regressions (sidecar preservation on
frame-only re-save, minhash geometry derivation, get_color_fn anchor
colorscale, auto id-order-skip warning), ADC cell pruning, collect
caps, logistic-regression training, and backoff n-gram LM."""

import json
import os
import warnings

import numpy as np
import pytest
from pyspark.sql import functions as F


# ------------------------------------------- ADVICE 1: sidecar preserved
def test_frame_only_resave_preserves_sidecar(spark, tmp_path):
    """A frame-only save_ann_index onto an existing artifact must carry
    the sidecar across the parquet overwrite — mode('overwrite') deletes
    the directory, and losing the trained centroids/codebooks only
    surfaced at next load."""
    from ezdata_spark.operators.ann_index import load_ann_index, save_ann_index

    path = str(tmp_path / "idx")
    df = spark.range(5).select(F.col("id"), (F.col("id") % 2).alias("cell"))
    meta = {"kind": "ivf_pq", "centroids": [[0.5, 1.5]], "codebooks": [[[1.0]]]}
    save_ann_index(path, df, meta, partition_by="cell")
    # re-save the frame alone (e.g. a re-encoded corpus, same params)
    df2 = spark.range(7).select(F.col("id"), (F.col("id") % 2).alias("cell"))
    save_ann_index(path, df2, meta=None, partition_by="cell")
    frame, got = load_ann_index(spark, path)
    assert got == meta
    assert frame.count() == 7


def test_frame_only_save_fresh_path_has_no_sidecar(spark, tmp_path):
    from ezdata_spark.operators.ann_index import load_ann_index, save_ann_index

    path = str(tmp_path / "plain")
    save_ann_index(path, spark.range(3))
    frame, meta = load_ann_index(spark, path)
    assert meta == {} and frame.count() == 3


# ------------------------------------- ADVICE 2: minhash geometry derived
def test_save_minhash_index_derives_geometry(spark, tmp_path):
    """num_hashes/n_bands come from the frames, not caller kwargs — a
    forgotten kwarg must not persist a wrong sidecar (the next increment
    would sign with mismatched geometry and silently empty the join)."""
    from ezdata_spark.operators.ann_index import (
        load_minhash_index,
        save_minhash_index,
    )
    from ezdata_spark.operators.dedup import minhash_dedup_incremental

    docs = spark.createDataFrame(
        [(i, f"document number {i} with some shared text body") for i in range(20)],
        ["doc_id", "text"],
    )
    # non-default geometry: 32 hashes, 8 bands
    surv, sigs, bands = minhash_dedup_incremental(
        docs, num_hashes=32, bands=8, return_bands=True
    )
    path = str(tmp_path / "mh")
    save_minhash_index(path, sigs, bands)  # note: NO geometry kwargs
    _, _, meta = load_minhash_index(spark, path)
    assert meta["num_hashes"] == 32
    assert meta["bands"] == 8


def test_save_minhash_index_cross_checks_geometry(spark, tmp_path):
    from ezdata_spark.operators.ann_index import save_minhash_index
    from ezdata_spark.operators.dedup import minhash_dedup_incremental

    docs = spark.createDataFrame(
        [(i, f"doc {i} body text here") for i in range(10)], ["doc_id", "text"]
    )
    _, sigs, bands = minhash_dedup_incremental(
        docs, num_hashes=32, bands=8, return_bands=True
    )
    with pytest.raises(ValueError, match="num_hashes=64 does not match"):
        save_minhash_index(str(tmp_path / "bad"), sigs, bands, num_hashes=64)


# --------------------------------- ADVICE 3: get_color_fn anchor colorscale
def test_get_color_fn_anchor_list_colorscale_uses_original_anchors():
    from ezdata_spark.functions.figures import get_color_fn

    anchors = ["#000000", "#ff0000", "#ffffff"]
    _, trace = get_color_fn([1.0, 2.0, 3.0], cmap=anchors, sampling=16)
    scale = trace["marker"]["colorscale"]
    assert len(scale) == 3  # the anchors, not the 16 interpolated stops
    assert scale[0] == [0.0, "rgb(0, 0, 0)"]
    assert scale[1] == [0.5, "rgb(255, 0, 0)"]
    assert scale[2] == [1.0, "rgb(255, 255, 255)"]


def test_get_color_fn_sampling_guard():
    from ezdata_spark.functions.figures import get_color_fn

    with pytest.raises(ValueError, match="sampling must be >= 2"):
        get_color_fn([1.0, 2.0], sampling=1)


def test_get_color_fn_named_cmap_unchanged():
    from ezdata_spark.functions.figures import get_color_fn

    fn, trace = get_color_fn([0.0, 10.0], cmap="viridis", sampling=5)
    assert trace["marker"]["colorscale"] == "viridis"
    assert fn(0.0) != fn(10.0)


# -------------------------------- ADVICE 4: auto id-order skip is visible
def test_auto_id_order_skip_warns_on_cached_history(spark):
    from ezdata_spark.operators.dedup import minhash_dedup_incremental

    hist = spark.createDataFrame(
        [(i, f"history doc {i} text") for i in range(5)], ["doc_id", "text"]
    )
    _, hist_sigs = minhash_dedup_incremental(hist)
    hist_sigs = hist_sigs.persist()
    hist_sigs.count()
    batch = spark.createDataFrame(
        [(i, f"new doc {i} text") for i in range(10, 15)], ["doc_id", "text"]
    )
    try:
        with pytest.warns(UserWarning, match="id-order guard skipped"):
            minhash_dedup_incremental(batch, history_signatures=hist_sigs)
        # explicit False: caller takes responsibility, no warning
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            minhash_dedup_incremental(
                batch, history_signatures=hist_sigs, check_id_order=False
            )
    finally:
        hist_sigs.unpersist()
