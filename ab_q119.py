"""ABBA: q119 triangle_count — oriented⋈adj-on-u join (old) vs
explode-of-adj (new, current module code). Result equality + interleaved
timing, one session."""
import statistics
import sys
import time

sys.path.insert(0, ".")
from pyspark.sql import functions as F

from ezdata_spark.cache import release_caches, track
from ezdata_spark.queries import QUERIES, load
from ezdata_spark.session import get_spark

spark = get_spark("ab-q119")
spark.sparkContext.setLogLevel("ERROR")
sf = "/root/testdata/sf0.1"
spark.read.parquet(f"{sf}/region.parquet").count()


def build_old(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    edges = li.select(
        F.pmod(F.col("l_orderkey"), F.lit(20000)).alias("src"),
        F.pmod(F.col("l_partkey"), F.lit(20000)).alias("dst"),
    )
    src, dst = "src", "dst"
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


new_fn = QUERIES["q119_triangle_census"]

# result equality
r_old = build_old(spark, sf).collect()
release_caches(); spark.catalog.clearCache()
r_new = new_fn(spark, sf).collect()
release_caches(); spark.catalog.clearCache()
assert r_old == r_new, f"MISMATCH: {r_old} vs {r_new}"
print("RESULTS EQUAL:", r_new)

variants = {"old": lambda: build_old(spark, sf), "new": lambda: new_fn(spark, sf)}
times = {"old": [], "new": []}
order = ["old", "new", "new", "old"] * 3
for name in order:
    spark.sparkContext.setJobDescription(f"ab119 {name}")
    t0 = time.perf_counter()
    variants[name]().write.format("noop").mode("overwrite").save()
    times[name].append(time.perf_counter() - t0)
    release_caches(); spark.catalog.clearCache()
for name, ts in times.items():
    print(f"{name}: median={statistics.median(ts):.3f} min={min(ts):.3f} {[round(t,3) for t in ts]}")
spark.stop()
