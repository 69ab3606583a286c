"""Distributed BPE merge learning — tokenizer training on-cluster.

Classic byte-pair encoding (Sennrich et al. 2016, arXiv:1508.07909)
learned the scale-correct way: the corpus is scanned ONCE to build the
weighted distinct-word vocabulary (word, count); every merge round then
operates on that vocabulary frame — vocabulary-sized work per round
(web-scale: ~10^7-10^8 types, distributed fine), never corpus-sized.
Pair counting is an explode + hash aggregate weighted by word count;
the winning pair is a 1-row driver round-trip per merge (bounded by
n_merges); applying a merge is a greedy left-to-right fold over each
word's symbol array (interpreted HOF — vocabulary-sized input, so the
per-element cost never touches corpus rows). Lineage is cut with
localCheckpoint every few rounds so plans do not grow with merges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["build_word_vocab", "learn_bpe", "apply_bpe_merge", "segment_words"]

_EOW = "</w>"  # end-of-word marker, per the original BPE formulation


def build_word_vocab(docs: DataFrame, text: str = "text") -> DataFrame:
    """One corpus pass -> (word, count, symbols) with symbols = the
    word's characters + an end-of-word marker. This is the only
    corpus-sized job in BPE training."""
    from .textstats import tokens

    return (
        docs.select(F.explode(tokens(text)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
        .withColumn(
            "symbols",
            F.concat(
                F.split(F.col("word"), ""),  # one char per element
                F.array(F.lit(_EOW)),
            ),
        )
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Adjacent symbol pairs weighted by word count (one explode +
    partial-combine aggregate over the vocabulary frame)."""
    m = F.size("symbols") - 1
    pairs = F.zip_with(
        F.slice("symbols", 1, m),
        F.slice("symbols", 2, m),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )
    return (
        vocab.filter(F.size("symbols") >= 2)
        .select("count", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("count").alias("n"))
    )


def apply_bpe_merge(vocab: DataFrame, a: str, b: str) -> DataFrame:
    """Greedily merge every adjacent (a, b) into one symbol, left to
    right (a merged symbol does not re-merge within the same pass —
    standard BPE). Pure HOF fold: the accumulator carries (out array,
    pending symbol); a merge consumes the pending symbol so the next
    element starts fresh."""
    a_lit, b_lit = F.lit(a), F.lit(b)
    merged = F.lit(a + b)
    init = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("prev"),
    )
    step = lambda acc, s: (  # noqa: E731
        F.when(acc["prev"].isNull(), F.struct(acc["out"].alias("out"), s.alias("prev")))
        .when(
            (acc["prev"] == a_lit) & (s == b_lit),
            F.struct(
                F.concat(acc["out"], F.array(merged)).alias("out"),
                F.lit(None).cast("string").alias("prev"),
            ),
        )
        .otherwise(
            F.struct(
                F.concat(acc["out"], F.array(acc["prev"])).alias("out"),
                s.alias("prev"),
            )
        )
    )
    fin = lambda acc: F.when(  # noqa: E731
        acc["prev"].isNull(), acc["out"]
    ).otherwise(F.concat(acc["out"], F.array(acc["prev"])))
    return vocab.withColumn("symbols", F.aggregate("symbols", init, step, fin))


def learn_bpe(
    docs: DataFrame,
    n_merges: int = 50,
    text: str = "text",
    checkpoint_every: int = 8,
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn ``n_merges`` BPE merges from the corpus. Returns
    (ordered merge list, final segmented vocabulary frame).

    Ties on pair count break deterministically ((a, b) lexicographic),
    so the merge sequence is reproducible across runs and engines.
    Each round: vocabulary-sized pair count + a 1-row collect + a
    projection applying the merge; localCheckpoint every
    ``checkpoint_every`` rounds cuts the growing lambda lineage.
    """
    vocab = build_word_vocab(docs, text).localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for i in range(n_merges):
        top = (
            _pair_counts(vocab)
            .orderBy(F.col("n").desc(), F.col("a"), F.col("b"))
            .limit(1)
            .collect()
        )
        if not top:
            break  # every word is a single symbol
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        vocab = apply_bpe_merge(vocab, a, b)
        if (i + 1) % checkpoint_every == 0:
            vocab = vocab.localCheckpoint(eager=True)
    return merges, vocab


def segment_words(
    words: DataFrame,
    merges: list[tuple[str, str]],
    word_col: str = "word",
) -> DataFrame:
    """Apply a learned merge list to segment words (tokenization-time
    path): chars + end-of-word, then each merge in learned order. The
    merge list is folded into the plan as successive projections — one
    scan of the input, no shuffles."""
    out = words.withColumn(
        "symbols",
        F.concat(F.split(F.col(word_col), ""), F.array(F.lit(_EOW))),
    )
    for a, b in merges:
        out = apply_bpe_merge(out, a, b)
    return out
