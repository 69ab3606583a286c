"""Data-profiling statistics over categorical columns: entropy,
mutual information, chi-square independence -- the column-association
diagnostics a curation pipeline runs before choosing dedup keys,
stratification columns, or mixing weights.

Scale design: every statistic here reduces to ONE hash aggregate over
the raw table (groupBy on the category cell), after which all math runs
on the contingency table -- |X| x |Y| rows, bounded by cardinality, not
data size. Marginals come from re-aggregating that tiny frame and are
broadcast back; no second scan of the input, no windows over a single
partition of raw data.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["association_stats", "entropy_profile"]

# NULL cells become their own category (pandas crosstab dropna=False
# semantics). The sentinel is a NUL-prefixed token no real string
# column produces (parquet strings are NUL-free in practice).
_NULL_CAT = "\x00null"


def _log2(c: Column) -> Column:
    # builtin log2 (libm) — bit-identical to DuckDB's log2, unlike
    # ln(x)/ln(2) which can differ in the last ulp
    return F.log2(c)


def association_stats(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Mutual information (bits), joint entropy, chi-square statistic
    and degrees of freedom between two categorical columns.

    Returns 1 row: (n, card_a, card_b, dof, mi_bits, h_joint_bits,
    chi2). chi2 is the FULL Pearson statistic: cells absent from the
    contingency table (observed 0, expected > 0) contribute their
    expected mass, folded in closed form as n - sum(expected over
    observed cells) -- no dense |X| x |Y| grid is materialized."""
    a = F.coalesce(F.col(col_a).cast("string"), F.lit(_NULL_CAT)).alias("a")
    b = F.coalesce(F.col(col_b).cast("string"), F.lit(_NULL_CAT)).alias("b")
    joint = df.select(a, b).groupBy("a", "b").agg(F.count(F.lit(1)).alias("nab"))
    ma = joint.groupBy("a").agg(F.sum("nab").alias("na"))
    mb = joint.groupBy("b").agg(F.sum("nab").alias("nb"))
    tot = joint.agg(F.sum("nab").alias("n"))
    cells = (
        joint.join(F.broadcast(ma), "a")
        .join(F.broadcast(mb), "b")
        .crossJoin(F.broadcast(tot))
    )
    pab = F.col("nab") / F.col("n")
    expect = F.col("na") * F.col("nb") / F.col("n")
    per_cell = cells.select(
        F.col("n"),
        (pab * _log2(pab * F.col("n") * F.col("n") / (F.col("na") * F.col("nb")))).alias(
            "mi_term"
        ),
        (-pab * _log2(pab)).alias("h_term"),
        ((F.col("nab") - expect) * (F.col("nab") - expect) / expect).alias("chi_term"),
        expect.alias("exp_obs"),
    )
    counts = joint.agg(
        F.countDistinct("a").alias("card_a"),
        F.countDistinct("b").alias("card_b"),
    )
    return (
        per_cell.groupBy("n")
        .agg(
            F.round(F.sum("mi_term"), 6).alias("mi_bits"),
            F.round(F.sum("h_term"), 6).alias("h_joint_bits"),
            F.round(
                F.sum("chi_term") + F.first("n") - F.sum("exp_obs"), 4
            ).alias("chi2"),
        )
        .crossJoin(F.broadcast(counts))
        .select(
            "n",
            "card_a",
            "card_b",
            ((F.col("card_a") - 1) * (F.col("card_b") - 1)).alias("dof"),
            "mi_bits",
            "h_joint_bits",
            "chi2",
        )
    )


def entropy_profile(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    """Per-column Shannon entropy (bits), distinct count, null count,
    and top-value share -- one row per profiled column.

    ONE scan: each row explodes into (column, value) pairs, then a
    single hash aggregate builds every column's value histogram at
    once; all downstream math runs on those histograms (rows = sum of
    column cardinalities, not data size)."""
    pairs = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.coalesce(F.col(c).cast("string"), F.lit(_NULL_CAT)).alias("v"),
            )
            for c in columns
        ]
    )
    allh = (
        df.select(F.explode(pairs).alias("p"))
        .select("p.column", "p.v")
        .groupBy("column", "v")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    tot = allh.groupBy("column").agg(F.sum("cnt").alias("n"))
    p_ = F.col("cnt") / F.col("n")
    return (
        allh.join(F.broadcast(tot), "column")
        .groupBy("column", "n")
        .agg(
            F.countDistinct("v").alias("n_distinct"),
            F.sum(
                F.when(F.col("v") == _NULL_CAT, F.col("cnt")).otherwise(F.lit(0))
            ).alias("n_null"),
            F.round(F.sum(-p_ * _log2(p_)), 6).alias("entropy_bits"),
            F.round(F.max(p_), 6).alias("top_share"),
        )
        .orderBy("column")
    )
