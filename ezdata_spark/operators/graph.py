"""Iterative graph algorithms on DataFrames: PageRank — the
domain-authority signal web-corpus curation pipelines use to weight or
cap sources (the same role it plays in CommonCrawl-derived corpus
recipes).

Power iteration (Page et al., 1999) expressed relationally: each round
is one equi-join of ranks against the out-edge list plus a sum
aggregate on the destination — the classic Spark formulation. Rounds
grow the lineage linearly, so every ``cut_every`` rounds the rank frame
is materialized through ``localCheckpoint`` (same discipline as
``dedup.neardup_clusters``); without the cut, 20+ rounds of stacked
plans blow up Catalyst analysis time at scale.

Dangling nodes (no out-edges) redistribute their mass uniformly — the
standard stochastic-matrix fix — so total rank stays 1 and results
match the dense power-iteration oracle exactly (to float tolerance).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank"]


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 10,
    damping: float = 0.85,
    cut_every: int = 5,
) -> DataFrame:
    """Rank every node of the directed graph ``edges`` (duplicate edges
    count once). Returns (node, rank) with ranks summing to 1.

    Scale shape per round: ranks ⋈ out-degree edges on ``src`` (one
    shuffle), groupBy ``dst`` sum (second shuffle), plus two tiny
    1-row aggregates for the dangling mass — all hash joins on the
    node id; the edge frame with degrees is computed once and
    persisted."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n_nodes = nodes.count()  # bounded driver scalar; also materializes nodes
    if n_nodes == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    out_edges = e.join(deg, "src").persist()
    out_edges.count()

    ranks = nodes.withColumn("rank", F.lit(1.0 / n_nodes))
    base = (1.0 - damping) / n_nodes
    for it in range(iterations):
        contrib = (
            ranks.join(out_edges, ranks["node"] == out_edges["src"])
            .select("dst", (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        # dangling mass: rank held by nodes with no out-edges
        dangling = (
            ranks.join(deg, ranks["node"] == deg["src"], "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
        )
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce(F.col("inflow"), F.lit(0.0)) + F.col("dm") / n_nodes)
                ).alias("rank"),
            )
        )
        if (it + 1) % cut_every == 0 and it + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=True)
    out = ranks
    nodes.unpersist()
    out_edges.unpersist()
    return out
