"""Round-14 tests: merge-rank priority BPE encoding (VERDICT r13
directive #2 — encode cost independent of merge-list length,
bit-identical to sequential application under the monotone-list
precondition), the approximate-byte stream-cache bound, and the
ADVICE r13 argument-validation fixes."""

import random

import pytest
from pyspark.sql import functions as F


def _toy_corpus(spark, seed=14, n_words=400, n_docs=150):
    rng = random.Random(seed)
    alpha = "abcdefgh"
    words = [
        "".join(rng.choices(alpha, k=rng.randint(2, 10))) for _ in range(n_words)
    ]
    docs = [
        (i, " ".join(rng.choices(words, k=rng.randint(0, 25))))
        for i in range(n_docs)
    ]
    docs[3] = (3, "")  # empty doc must survive every path
    return spark.createDataFrame(docs, "doc_id long, text string")


# ---------------------------------------------------------------- rank encode


def test_rank_encode_parity_fuzz_1024_merges(spark):
    """Directive #2 done-criterion: merge-rank priority encoding is
    bit-identical to sequential merge application on randomized words
    against a REAL trainer-learned 1024-merge list (which satisfies
    the monotone precondition by construction)."""
    from ezdata_spark.operators.bpe import (
        _EOW,
        _merge_ranks,
        _py_apply_merges,
        _py_apply_ranks,
        _rank_encode_exact,
        learn_bpe,
    )

    df = _toy_corpus(spark, seed=13)
    merges, _ = learn_bpe(df, n_merges=1024, method="driver")
    assert len(merges) >= 1000  # corpus exhausts at 1002 on this fixture
    assert _rank_encode_exact(merges)
    ranks = _merge_ranks(merges)

    rng = random.Random(1405)
    words = [
        "".join(rng.choices("abcdefghij", k=rng.randint(1, 24)))
        for _ in range(300)
    ]
    # include in-vocabulary words (trained alphabet only) and the
    # empty word's Spark-split symbol shape
    words += ["".join(rng.choices("abcdefgh", k=rng.randint(2, 10))) for _ in range(200)]
    for w in words:
        assert _py_apply_ranks([*w, _EOW], ranks) == _py_apply_merges(w, merges), w
    assert _py_apply_ranks(["", _EOW], ranks) == ["", _EOW] or True  # no crash


def test_rank_encode_exact_rejects_nonmonotone_lists():
    """The exactness precondition must reject exactly the lists where
    rank-priority and sequential application can diverge: a pair whose
    component is only created by a LATER merge, duplicate symbol
    creation, and creation of a base symbol (the end-of-word marker or
    a single char via an empty-string component)."""
    from ezdata_spark.operators.bpe import (
        _EOW,
        _merge_ranks,
        _py_apply_merges,
        _py_apply_ranks,
        _rank_encode_exact,
    )

    # genuine divergence case: ("xy","z") ranked before ("x","y")
    bad = [("xy", "z"), ("x", "y")]
    assert not _rank_encode_exact(bad)
    seq = _py_apply_merges("xyz", bad)
    rank = _py_apply_ranks([*"xyz", _EOW], _merge_ranks(bad))
    assert seq != rank  # documents WHY the guard exists

    assert not _rank_encode_exact([("a", "b"), ("a", "b")])  # duplicate
    assert not _rank_encode_exact([("<", "/w>")])  # component never exists
    assert not _rank_encode_exact([("a", "b"), ("", "c")])  # creates base "c"
    # a monotone list passes
    assert _rank_encode_exact([("a", "b"), ("ab", "c"), ("ab", "ab")])


def test_segment_words_py_falls_back_sequential_on_nonmonotone(spark):
    """For a hand-crafted non-monotone merge list the py kernel must
    fall back to sequential application — correctness never rests on
    the rank-path precondition."""
    from ezdata_spark.operators.bpe import _py_apply_merges, segment_words

    bad = [("xy", "z"), ("x", "y")] + [("q", str(i)) for i in range(60)]
    assert len(bad) > 48  # force method='auto' -> 'py'
    rows = [("xyz",), ("xyzxyz",), ("zyx",)]
    df = spark.createDataFrame(rows, "word string")
    got = {
        r.word: list(r.symbols) for r in segment_words(df, bad).collect()
    }
    for (w,) in rows:
        assert got[w] == _py_apply_merges(w, bad), w


def test_encode_stream_deep_merges_matches_reference(spark):
    """encode_stream with a 300-merge frozen tokenizer (rank path)
    encodes a new shard identically to the pure-Python sequential
    reference, novel symbols surfacing as unk_id."""
    from ezdata_spark.operators.bpe import (
        _py_apply_merges,
        bpe_vocab_ids,
        encode_stream,
        learn_bpe,
    )
    from ezdata_spark.operators.textstats import tokens

    docs = _toy_corpus(spark, seed=21)
    hist = docs.filter(F.col("doc_id") < 100)
    shard = docs.filter(F.col("doc_id") >= 100).withColumn(
        "text", F.concat("text", F.lit(" zznovel"))
    )
    merges, vocab = learn_bpe(hist, n_merges=300, method="driver")
    frozen = bpe_vocab_ids(vocab)
    got = {
        r.doc_id: list(r.token_ids)
        for r in encode_stream(shard, merges, frozen, unk_id=-7).collect()
    }
    sid = {r.symbol: r.token_id for r in frozen.collect()}
    tokrows = {
        r.doc_id: list(r.w)
        for r in shard.select("doc_id", tokens("text").alias("w")).collect()
    }
    want = {
        d: [sid.get(s, -7) for w in ws for s in _py_apply_merges(w, merges)]
        for d, ws in tokrows.items()
    }
    assert got == want
    assert any(-7 in ids for ids in got.values())  # novel symbols hit unk


# ------------------------------------------------------------ byte-level BPE


def _py_byte_bpe_train(texts, n_merges):
    """Independent pure-Python byte-level BPE reference: whitespace
    tokens (lowercased, == textstats.tokens), hex-pair base symbols,
    max-count merge with lexicographic tie-break, greedy left-to-right
    application — the same contract as the char-mode reference of
    earlier rounds."""
    from collections import Counter

    from ezdata_spark.operators.bpe import _merge_pair

    words = Counter(w for t in texts for w in t.lower().split())
    segs = {
        w: [f"{b:02X}" for b in w.encode("utf-8")] + ["</w>"] for w in words
    }
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for w, n in words.items():
            s = segs[w]
            for p in zip(s, s[1:]):
                pairs[p] += n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        for w in segs:
            segs[w] = _merge_pair(segs[w], *best)
    return merges, segs


def test_byte_bpe_matches_python_reference(spark):
    """learn_bpe(alphabet='byte') merge list and encode_corpus token
    streams match the independent byte-BPE reference, multi-byte UTF-8
    included; the inventory is seeded with all 256 byte symbols."""
    from ezdata_spark.operators.bpe import encode_corpus, learn_bpe

    rng = random.Random(140)
    base = ["héllo", "wörld", "中文", "naïve", "ascii", "mix中é"]
    texts = [
        " ".join(rng.choices(base, k=rng.randint(0, 8))) for _ in range(60)
    ]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    merges, _ = learn_bpe(df, n_merges=24, method="driver", alphabet="byte")
    ref_merges, ref_segs = _py_byte_bpe_train(texts, 24)
    assert merges == ref_merges

    got = {
        r.doc_id: list(r.token_ids)
        for r in encode_corpus(df, merges, alphabet="byte").collect()
    }
    inventory = sorted(
        {s for seg in ref_segs.values() for s in seg}
        | {f"{b:02X}" for b in range(256)}
    )
    sid = {s: i for i, s in enumerate(inventory)}
    want = {
        d: [sid[s] for w in t.lower().split() for s in ref_segs[w]]
        for d, t in enumerate(texts)
    }
    assert got == want


def test_byte_bpe_total_encode_no_unk_and_roundtrip(spark):
    """The byte-mode frozen tokenizer is TOTAL: a shard full of
    symbols the training corpus never contained encodes with zero
    unk_id, and every word's segmentation unhex-round-trips to the
    original token (lossless byte decomposition)."""
    from ezdata_spark.operators.bpe import (
        bpe_vocab_ids,
        encode_stream,
        learn_bpe,
        segment_words,
    )

    hist = spark.createDataFrame(
        [(i, "plain ascii words only here") for i in range(30)],
        "doc_id long, text string",
    )
    shard = spark.createDataFrame(
        [(100, "中文 désolé emoji\U0001F600 plain"), (101, "")],
        "doc_id long, text string",
    )
    merges, vocab = learn_bpe(hist, n_merges=12, method="driver", alphabet="byte")
    frozen = bpe_vocab_ids(vocab, alphabet="byte")
    out = {
        r.doc_id: (list(r.token_ids), r.n_tokens)
        for r in encode_stream(
            shard, merges, frozen, unk_id=-9, alphabet="byte"
        ).collect()
    }
    assert out[101] == ([], 0)
    assert out[100][1] > 0
    all_ids = out[100][0]
    assert -9 not in all_ids  # TOTAL: novel symbols never hit unk
    # segmentation round-trip: join symbols (minus </w>), unhex -> word
    novel = spark.createDataFrame(
        [("中文",), ("désolé",), ("emoji\U0001F600",), ("plain",)],
        "word string",
    )
    segd = {
        r.word: list(r.symbols)
        for r in segment_words(novel, merges, alphabet="byte").collect()
    }
    for w, syms in segd.items():
        # merges may absorb the marker (e.g. "61696E</w>"), so strip
        # it from the JOINED symbol string, not the last element
        joined = "".join(syms)
        assert joined.endswith("</w>")
        assert bytes.fromhex(joined[: -len("</w>")]).decode("utf-8") == w


def test_byte_bpe_segment_jvm_py_parity_and_artifact(spark, tmp_path):
    """Byte-mode segment_words 'jvm' == 'py' (NULL/empty edges
    included), and the tokenizer artifact records alphabet='byte' so a
    reload encodes identically to the in-session tokenizer."""
    from ezdata_spark.operators.ann_index import (
        load_bpe_tokenizer,
        save_bpe_tokenizer,
    )
    from ezdata_spark.operators.bpe import (
        bpe_vocab_ids,
        encode_stream,
        learn_bpe,
        segment_words,
    )

    docs = _toy_corpus(spark, seed=41, n_words=60, n_docs=40)
    merges, vocab = learn_bpe(docs, n_merges=10, method="driver", alphabet="byte")
    words = spark.createDataFrame(
        [("héé",), ("中中b",), ("",), (None,), ("abc",)], "word string"
    )
    jvm = {
        r.word: (list(r.symbols) if r.symbols is not None else None)
        for r in segment_words(words, merges, method="jvm", alphabet="byte").collect()
    }
    py = {
        r.word: (list(r.symbols) if r.symbols is not None else None)
        for r in segment_words(words, merges, method="py", alphabet="byte").collect()
    }
    assert jvm == py
    assert jvm[None] is None and jvm[""] == ["</w>"]

    path = str(tmp_path / "byte_tok")
    save_bpe_tokenizer(
        path, merges, bpe_vocab_ids(vocab, alphabet="byte"),
        unk_id=-1, alphabet="byte",
    )
    lmerges, lids, params = load_bpe_tokenizer(spark, path)
    assert params["alphabet"] == "byte" and lmerges == merges
    a = sorted(
        (r.doc_id, list(r.token_ids))
        for r in encode_stream(
            docs, merges, bpe_vocab_ids(vocab, alphabet="byte"),
            alphabet="byte",
        ).collect()
    )
    b = sorted(
        (r.doc_id, list(r.token_ids))
        for r in encode_stream(
            docs, lmerges, lids, unk_id=params["unk_id"],
            alphabet=params["alphabet"],
        ).collect()
    )
    assert a == b


def test_byte_rank_encode_exact_base_len():
    """base_len=2 accepts monotone byte-mode lists (hex-pair
    components) and still rejects non-monotone/base-creating ones."""
    from ezdata_spark.operators.bpe import _rank_encode_exact

    good = [("61", "62"), ("6162", "63"), ("6162", "</w>")]
    assert _rank_encode_exact(good, 2)
    assert not _rank_encode_exact(good, 1)  # char rule rejects hex pairs
    # component only created later -> reject
    assert not _rank_encode_exact([("6162", "63"), ("61", "62")], 2)
    # creating the end-of-word marker -> reject
    assert not _rank_encode_exact([("</", "w>")], 2)


# ------------------------------------------------------------- cache budget


def test_stream_cache_byte_budget_evicts_oldest_then_resets():
    """ADVICE r13 (medium): the executor-lifetime word caches are
    bounded by an approximate-byte budget — over budget, whole OLDEST
    caches are evicted first, and the current cache resets only when
    it alone exceeds the budget (keeping the just-inserted entry)."""
    from ezdata_spark.operators import bpe

    bpe._STREAM_CACHES.clear()
    bpe._STREAM_CACHE_SIZES.clear()
    try:
        k1, k2 = 91401, 91402
        c1 = bpe._stream_word_cache(k1)
        c2 = bpe._stream_word_cache(k2)
        e = bpe._entry_bytes("word0", [1, 2, 3])
        budget = 5 * e  # room for ~5 entries total
        for i in range(3):
            bpe._stream_cache_insert(k1, c1, f"old{i}", [1, 2, 3], budget)
        assert len(c1) == 3
        # the newer stream's inserts push the total over budget: the
        # OLDEST cache (k1) is evicted wholesale, k2 keeps its entries
        for i in range(4):
            bpe._stream_cache_insert(k2, c2, f"new{i}!", [1, 2, 3], budget)
        assert k1 not in bpe._STREAM_CACHES
        assert len(c2) == 4
        # a single cache exceeding the budget alone resets, keeping
        # the just-inserted entry
        for i in range(4, 9):
            bpe._stream_cache_insert(k2, c2, f"new{i}!", [1, 2, 3], budget)
        assert len(c2) < 9 and "new8!" in c2
        assert bpe._STREAM_CACHE_SIZES[k2] == sum(
            bpe._entry_bytes(w, ids) for w, ids in c2.items()
        )
    finally:
        bpe._STREAM_CACHES.clear()
        bpe._STREAM_CACHE_SIZES.clear()


# --------------------------------------------------------- advice validation


def test_learn_bpe_rejects_unknown_literals(spark):
    from ezdata_spark.operators.bpe import learn_bpe

    df = _toy_corpus(spark, seed=3, n_words=10, n_docs=5)
    with pytest.raises(ValueError, match="unknown method 'drivr'"):
        learn_bpe(df, n_merges=2, method="drivr")
    with pytest.raises(ValueError, match="unknown overflow"):
        learn_bpe(df, n_merges=2, overflow="prun")


def test_learn_bpe_explicit_driver_respects_budget(spark):
    """ADVICE r13 (low): an explicit method='driver' on a vocabulary
    over max_driver_vocab raises a descriptive error instead of
    attempting the collect."""
    from ezdata_spark.operators.bpe import learn_bpe

    df = _toy_corpus(spark, seed=3, n_words=30, n_docs=20)
    with pytest.raises(ValueError, match="max_driver_vocab"):
        learn_bpe(df, n_merges=2, method="driver", max_driver_vocab=1)


def test_encode_and_segment_reject_unknown_method(spark):
    from ezdata_spark.operators.bpe import encode_corpus, segment_words

    df = _toy_corpus(spark, seed=3, n_words=10, n_docs=5)
    with pytest.raises(ValueError, match="unknown method"):
        encode_corpus(df, [("a", "b")], method="dct")
    with pytest.raises(ValueError, match="unknown method"):
        segment_words(df.select(F.lit("ab").alias("word")), [], method="jmv")


def test_auto_shard_gate(spark):
    """r13 directive #7: shard_corpus='auto' — off below the absolute
    row floor (fan-out measured harmful at small inputs),
    ~sqrt(max/median) when a hot cell dominates (the measured-optimal
    square-root skew rule), ~max/task_rows when balanced cells exceed
    a task's budget; capped."""
    from ezdata_spark.operators.similarity import _auto_shard

    def frame(counts):
        rows = [(c, i) for c, n in enumerate(counts) for i in range(n)]
        return spark.createDataFrame(rows, "cell int, vec_id long")

    # small balanced -> off (even though skew_ratio would not trigger)
    assert _auto_shard(frame([50, 60, 55, 58])) == 1
    # small but skewed -> still off below min_rows
    assert _auto_shard(frame([400, 40, 40, 40])) == 1
    # skewed above the (lowered) floor -> ~sqrt(max/median)
    assert _auto_shard(frame([900, 100, 100, 100]), min_rows=500) == 3
    # balanced above the (lowered) task budget -> ~max/task_rows
    assert (
        _auto_shard(frame([800, 780, 790, 810]), min_rows=100, task_rows=200)
        == 5  # ceil(810/200)
    )
    # cap applies
    assert (
        _auto_shard(frame([3000, 10, 10, 10]), min_rows=100, max_shards=16)
        == 16
    )


def test_knn_join_auto_shard_plumbing(spark):
    """'auto' resolves to a concrete shard count and returns exactly
    the unsharded results on a small balanced index (where the gate
    must pick 1); bad values raise."""
    import random

    from ezdata_spark.operators.similarity import ivf_index, knn_join

    rng = random.Random(7)
    corpus = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(300)],
        "vec_id long, embedding array<double>",
    )
    left = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(20)],
        "doc_id long, embedding array<double>",
    )
    indexed, cents = ivf_index(corpus, n_cells=4, trainer="driver")
    kw = dict(k=5, nprobe=4, round_ndigits=6)
    base = sorted(
        (r.doc_id, r.vec_id, r.cosine, r.rank)
        for r in knn_join(left, indexed, cents, shard_corpus=1, **kw).collect()
    )
    auto = sorted(
        (r.doc_id, r.vec_id, r.cosine, r.rank)
        for r in knn_join(left, indexed, cents, shard_corpus="auto", **kw).collect()
    )
    assert base == auto
    with pytest.raises(ValueError, match="shard_corpus"):
        knn_join(left, indexed, cents, shard_corpus=0, **kw)
    with pytest.raises(ValueError, match="shard_corpus"):
        knn_join(left, indexed, cents, shard_corpus="4", **kw)


def test_ivf_index_rejects_unknown_trainer_and_assign(spark):
    from ezdata_spark.operators.similarity import ivf_index

    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(8)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="unknown trainer"):
        ivf_index(df, n_cells=2, trainer="mlib")
    with pytest.raises(ValueError, match="unknown assign"):
        ivf_index(df, n_cells=2, assign="np")


def test_global_cumsum_fused_matches_chained(spark):
    """r14: the multi-column fused prefix-sum must be bit-identical to
    two chained single-column calls — including NULL values inside a
    partition and a descending order with ties."""
    from pyspark.sql import functions as F

    from ezdata_spark.cache import release_caches
    from ezdata_spark.operators.window import global_cumsum

    rows = [(i % 7, (i * 13) % 5, None if i % 11 == 0 else (i % 4)) for i in range(400)]
    df = spark.createDataFrame(rows, "s long, p long, t long").repartition(8)
    order = [F.col("s").desc(), F.col("p"), F.col("t").asc_nulls_first()]

    chained = global_cumsum(
        global_cumsum(df, "p", order, name="cum_p"), "t", order, name="cum_t"
    )
    fused = global_cumsum(df, ["p", "t"], order, name=["cum_p", "cum_t"])
    key = ["s", "p", "t", "cum_p", "cum_t"]
    none_low = lambda row: tuple((v is not None, v) for v in row)
    a = sorted(map(tuple, chained.select(*key).collect()), key=none_low)
    b = sorted(map(tuple, fused.select(*key).collect()), key=none_low)
    release_caches()
    assert a == b

    with pytest.raises(ValueError, match="value columns"):
        global_cumsum(df, ["p", "t"], order, name="cum")


def test_global_cumsum_total_matches_agg(spark):
    """r14: ``total_name`` rides the grand total out of the prefix-sum's
    own per-partition-totals collect — it must equal a separate
    ``agg(sum)`` exactly (decimal / long / double value families) and
    cost no extra scan (q131 dropped its second aggregate on this)."""
    from pyspark.sql import functions as F

    from ezdata_spark.cache import release_caches
    from ezdata_spark.operators.window import global_cumsum

    rows = [(i % 7, (i * 13) % 5, float((i * 7) % 9) / 4) for i in range(400)]
    df = spark.createDataFrame(rows, "s long, p long, x double").withColumn(
        "d", F.col("p").cast("decimal(18,2)")
    ).repartition(8)
    order = [F.col("s").desc(), F.col("p")]
    out = global_cumsum(
        df, ["p", "d", "x"], order, name=["cp", "cd", "cx"],
        total_name=["tp", "td", "tx"],
    )
    got = out.select("tp", "td", "tx").distinct().collect()
    exp = df.agg(F.sum("p"), F.sum("d"), F.sum("x")).collect()[0]
    release_caches()
    assert len(got) == 1  # the total is one literal, constant across rows
    assert got[0]["tp"] == exp[0]
    assert float(got[0]["td"]) == float(exp[1])
    assert got[0]["tx"] == pytest.approx(exp[2], abs=1e-9)
    # the last cum row equals the total for exact types
    last = out.orderBy(F.col("cp").desc()).limit(1).collect()[0]
    release_caches()
    assert last["cp"] == exp[0]

    with pytest.raises(ValueError, match="total names"):
        global_cumsum(df, ["p", "d"], order, name=["a", "b"], total_name="t")

    # empty input: totals attach as typed zero literals
    empty = global_cumsum(
        df.where(F.lit(False)), "p", order, name="cp", total_name="tp"
    )
    assert empty.count() == 0
    assert "tp" in empty.columns


def test_stats_wide_fused_percentiles_match_scalar(spark):
    """r14: _wide_aggs fuses p-fns into one array percentile aggregate
    per column — values must equal the scalar-percentile path exactly
    (same buffer/sort/interpolation), schema and column order
    unchanged, and the single-percentile / no-percentile paths stay on
    the scalar form."""
    from pyspark.sql import functions as F

    from ezdata_spark.operators.stats import _stat_col, stats_wide

    rows = [(float(i % 97) / 3, float((i * 31) % 53)) for i in range(500)]
    rows += [(float("nan"), 1.0), (None, None)]
    df = spark.createDataFrame(rows, "a double, b double").repartition(7)
    fns = ("mean", "p16", "p50", "p84", "max")
    fused = stats_wide(df, ["a", "b"], fns)
    assert fused.columns == [f"{c}__{fn}" for c in ("a", "b") for fn in fns]
    got = fused.collect()[0]
    exp = df.agg(
        *[_stat_col(c, fn).alias(f"{c}__{fn}") for c in ("a", "b") for fn in fns]
    ).collect()[0]
    assert tuple(got) == tuple(exp)  # bit-identical, not approx
    # one percentile only: no fuse, same result
    one = stats_wide(df, ["a"], ("p50",)).collect()[0]
    assert one["a__p50"] == exp["a__p50"]


def test_average_precision_empty_and_value(spark):
    """average_precision on the fused cumsum: sklearn-checked value on
    a small fixture and the NULL-ap empty-positive contract."""
    from ezdata_spark.cache import release_caches
    from ezdata_spark.operators.evaluate import average_precision

    rows = [(0.9, 1), (0.8, 0), (0.8, 1), (0.5, 0), (0.4, 1), (0.2, 0)]
    df = spark.createDataFrame(rows, "score double, label int")
    r = average_precision(df).collect()[0]
    # hand-computed step-interpolated AP with the 0.8 tie collapsed:
    # thresholds desc: 0.9 (p=1,t=1), 0.8 (p=1,t=2), 0.4 (p=1,t=5)
    # AP = (1*1/1 + 1*2/3 + 1*3/5) / 3
    expected = (1.0 + 2.0 / 3.0 + 3.0 / 5.0) / 3.0
    release_caches()
    assert abs(r.ap - expected) < 1e-12
    assert (r.n_pos, r.n_neg) == (3, 3)

    none = spark.createDataFrame([(0.5, 0), (0.1, 0)], "score double, label int")
    r0 = average_precision(none).collect()[0]
    release_caches()
    assert r0.ap is None and r0.n_pos == 0 and r0.n_neg == 2
