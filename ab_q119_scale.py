"""30M-row scale A/B for triangle_count: oriented⋈adj-on-u (old) vs
explode-of-adj (new, module code). Same fixture as scale_check.py
(30M edges over 3M nodes), 16g driver, interleaved ABBA + equality."""
import os
import statistics
import sys
import time

os.environ.setdefault("SPARK_DRIVER_MEMORY", "16g")
sys.path.insert(0, ".")
from pyspark.sql import functions as F

from ezdata_spark.cache import release_caches, track
from ezdata_spark.operators.graph import triangle_count
from ezdata_spark.session import get_spark


def triangle_count_old(edges, src="src", dst="dst"):
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    e = track(e)
    deg = (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    deg = track(deg)
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("db"))
    oriented = (
        e.join(da, "a")
        .join(db, "b")
        .select(
            F.when(
                (F.col("da") < F.col("db"))
                | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
            )
            .otherwise(F.struct(F.col("b").alias("u"), F.col("a").alias("v")))
            .alias("uv")
        )
        .select("uv.u", "uv.v")
    )
    adj = oriented.groupBy("u").agg(F.array_sort(F.collect_list("v")).alias("nb"))
    adj = track(adj)
    tri = (
        oriented.join(adj, "u")
        .select(F.col("v"), F.col("nb").alias("nbu"))
        .join(adj.select(F.col("u").alias("v"), F.col("nb").alias("nbv")), "v")
        .agg(
            F.coalesce(
                F.sum(F.size(F.array_intersect("nbu", "nbv"))), F.lit(0)
            ).alias("n_triangles")
        )
    )
    stats = e.agg(F.count(F.lit(1)).alias("n_edges")).crossJoin(
        F.broadcast(
            deg.agg(
                F.count(F.lit(1)).alias("n_nodes"),
                F.sum(F.expr("deg * (deg - 1) / 2")).cast("bigint").alias("n_wedges"),
            )
        )
    )
    return stats.crossJoin(F.broadcast(tri)).select(
        "n_nodes",
        "n_edges",
        "n_wedges",
        "n_triangles",
        F.round(
            F.when(F.col("n_wedges") > 0, 3.0 * F.col("n_triangles") / F.col("n_wedges")).otherwise(0.0),
            6,
        ).alias("global_clustering"),
    )


def main():
    n = int(float(sys.argv[1]) * 1e6) if len(sys.argv) > 1 else 30_000_000
    spark = get_spark("ab-q119-scale")
    spark.sparkContext.setLogLevel("ERROR")
    graph_nodes = max(n // 10, 1000)
    base = spark.range(n)
    edges = base.select(
        F.pmod(F.xxhash64("id"), F.lit(graph_nodes)).alias("src"),
        F.pmod(F.xxhash64("id", F.lit(3)), F.lit(graph_nodes)).alias("dst"),
    )

    r_old = triangle_count_old(edges).collect()
    release_caches(); spark.catalog.clearCache()
    r_new = triangle_count(edges).collect()
    release_caches(); spark.catalog.clearCache()
    assert r_old == r_new, f"MISMATCH: {r_old} vs {r_new}"
    print("RESULTS EQUAL:", r_new)

    variants = {"old": lambda: triangle_count_old(edges), "new": lambda: triangle_count(edges)}
    times = {"old": [], "new": []}
    for name in ["old", "new", "new", "old"]:
        spark.sparkContext.setJobDescription(f"ab119s {name}")
        t0 = time.perf_counter()
        variants[name]().write.format("noop").mode("overwrite").save()
        times[name].append(time.perf_counter() - t0)
        release_caches(); spark.catalog.clearCache()
    for name, ts in times.items():
        print(f"{name}: mean={statistics.mean(ts):.2f} {[round(t,2) for t in ts]}")
    spark.stop()


if __name__ == "__main__":
    main()
