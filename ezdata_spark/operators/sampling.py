"""Sampling and sequence-packing operators for training-data pipelines.

Extensions beyond the reference (SURVEY.md §7 phase 9 tier): corpus
mixing needs per-stratum sampling with exact, reproducible counts, and
sequence packing turns variable-length documents into fixed-budget
training rows.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

# pack ids are (shard << _PACK_SHIFT) | in-shard pack counter: unique
# across shards without any coordination
_PACK_SHIFT = 40


def stratified_sample(
    df: DataFrame,
    stratum: str,
    fraction: float | dict,
    id_col: str,
    seed: int = 42,
    exact: bool = True,
) -> DataFrame:
    """Per-stratum sample. ``fraction`` is a single rate or a
    {stratum_value: rate} dict (corpus-mixing weights; strata absent
    from the dict are DROPPED). ``exact=True``: deterministic
    rank-by-hash — within each stratum rows are ordered by
    xxhash64(id, seed) and the ``ceil(fraction * n)`` smallest kept, so
    the sampled COUNT per stratum is exact and the selection is stable
    across runs/cluster layouts. One shuffle on the stratum key (both
    windows share it). A very hot stratum serializes into one task —
    for skewed strata or when +-sqrt(n) count jitter is fine,
    ``exact=False`` uses Spark's ``sampleBy`` (Bernoulli per row,
    constant memory, no shuffle).
    """
    if not exact:
        fracs = (
            dict(fraction)
            if isinstance(fraction, dict)
            else {r[0]: fraction for r in df.select(stratum).distinct().collect()}
        )
        return df.sampleBy(stratum, fracs, seed)
    if isinstance(fraction, dict):
        frac_col = F.create_map(
            *[x for k, v in fraction.items() for x in (F.lit(k), F.lit(float(v)))]
        )[F.col(stratum)]
    else:
        frac_col = F.lit(float(fraction))
    w = Window.partitionBy(stratum).orderBy(
        F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)), F.col(id_col)
    )
    cw = Window.partitionBy(stratum)
    ranked = (
        df.withColumn("__rk", F.row_number().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(cw))
    )
    return ranked.filter(
        frac_col.isNotNull() & (F.col("__rk") <= F.ceil(frac_col * F.col("__n")))
    ).drop("__rk", "__n")


def mix_corpus(
    df: DataFrame,
    stratum: str,
    weights: dict,
    id_col: str,
    seed: int = 42,
) -> DataFrame:
    """Corpus mixing: per-source sampling rates (the data-mixing step of
    a training pipeline). Thin alias over stratified_sample with a
    weight dict; sources not named in ``weights`` are dropped."""
    return stratified_sample(df, stratum, weights, id_col, seed=seed)


def pack_sequences(
    df: DataFrame,
    n_tokens: str = "n_tokens",
    id_col: str = "doc_id",
    max_len: int = 2048,
    n_shards: int | None = None,
) -> DataFrame:
    """Greedy sequence packing: assign documents to fixed-token-budget
    packs (training rows), never splitting a document. Documents longer
    than ``max_len`` get a pack of their own (flagged ``truncated``).

    Scale shape: greedy packing is inherently sequential, so it runs
    WITHIN hash shards — each shard packs its documents independently
    (deterministic in-shard order by id) via one applyInPandas pass.
    Pack ids are globally unique ((shard << 40) | counter). Packing
    quality is per-shard greedy, the standard trade for parallel
    packing; n_shards defaults to cluster parallelism.

    Returns the input columns + ``pack_id`` + ``pack_pos`` (position of
    the document inside its pack).
    """
    spark = df.sparkSession
    n_shards = n_shards or spark.sparkContext.defaultParallelism

    out_schema = StructType(
        df.schema.fields
        + [StructField("pack_id", LongType()), StructField("pack_pos", LongType())]
    )
    max_len_v, id_v, tok_v = max_len, id_col, n_tokens

    def pack(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(key[0])
        pdf = pdf.sort_values(id_v, kind="mergesort").reset_index(drop=True)
        pack_ids, positions = [], []
        cur, used, pos = 0, 0, 0
        for t in pdf[tok_v]:
            t = min(int(t), max_len_v)
            if used + t > max_len_v and used > 0:
                cur += 1
                used, pos = 0, 0
            pack_ids.append((shard << _PACK_SHIFT) | cur)
            positions.append(pos)
            used += t
            pos += 1
        pdf["pack_id"] = pd.Series(pack_ids, dtype="int64")
        pdf["pack_pos"] = pd.Series(positions, dtype="int64")
        return pdf.drop(columns=["__shard"])

    sharded = df.withColumn(
        "__shard", F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(n_shards))
    )
    return sharded.groupBy("__shard").applyInPandas(pack, schema=out_schema)


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    score_col: str = "sample_score",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement: top-``k`` by the
    Efraimidis-Spirakis A-ES key (each row's inclusion probability is
    proportional to its weight; "Weighted random sampling with a
    reservoir", IPL 2006). Rows with non-positive or NULL weight are
    excluded (zero-weight rows must never be drawn).

    Deterministic: the uniform draw is the Knuth multiplicative hash of
    the id (same idiom as split_by_hash) rather than RNG state, so the
    sample is reproducible across runs, engines, and partitionings.
    The A-ES key u^(1/w) is compared through its log, ln(u)/w -- a
    monotone transform that avoids pow() underflow for large weights.

    Scale shape: one projection + global top-k. Spark plans the
    ORDER BY ... LIMIT k as per-partition top-k with a driver-side
    merge of k-row heads (TakeOrderedAndProject) -- no full sort, no
    single-partition exchange; k is the sample size, bounded by
    construction."""
    u = (
        F.pmod(F.col(id_col) * F.lit(2654435761), F.lit(4294967296)) + F.lit(0.5)
    ) / F.lit(4294967296.0)
    key = F.log(u) / F.col(weight_col)
    return (
        df.where(F.col(weight_col) > 0)
        .withColumn(score_col, key)
        .orderBy(F.col(score_col).desc(), F.col(id_col))
        .limit(k)
    )
