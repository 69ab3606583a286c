"""ABBA: _train_sample conversion — toPandas().tolist() (old) vs Arrow
values-buffer reshape (new, module code). Bit-identity of the sample
matrix asserted, then interleaved q50b/z101 timing with the old form
monkeypatched in."""
import statistics
import sys
import time

sys.path.insert(0, ".")
import numpy as np
from pyspark.sql import functions as F

import ezdata_spark.operators.similarity as sim
from ezdata_spark.cache import release_caches
from ezdata_spark.queries import QUERIES, load
from ezdata_spark.session import get_spark


def _train_sample_old(df, vec, seed, sample_fraction, sample_rows):
    n = sim.normalize(df, vec, "v").select("v")
    if sample_fraction is not None:
        n = n.sample(sample_fraction, seed=seed)
    return np.asarray(
        n.orderBy(F.xxhash64("v")).limit(sample_rows).toPandas()["v"].tolist(),
        dtype=np.float64,
    )


spark = get_spark("ab-q50b")
spark.sparkContext.setLogLevel("ERROR")
sf = "/root/testdata/sf0.1"
spark.read.parquet(f"{sf}/region.parquet").count()

emb = load(spark, sf, "embeddings").withColumn(
    "embedding", F.col("embedding").cast("array<double>")
)

# conversion micro-bench + bit identity
t0 = time.perf_counter(); Xo = _train_sample_old(emb, "embedding", 42, None, 100_000); to = time.perf_counter() - t0
t0 = time.perf_counter(); Xn = sim._train_sample(emb, "embedding", 42, None, 100_000); tn = time.perf_counter() - t0
assert Xo.shape == Xn.shape and np.array_equal(Xo, Xn), f"sample mismatch {Xo.shape} {Xn.shape}"
print(f"SAMPLE BIT-IDENTICAL shape={Xn.shape}  old={to:.3f}s new={tn:.3f}s")
release_caches(); spark.catalog.clearCache()

new_fn = sim._train_sample
q50b, z101 = QUERIES["q50b_knn_join_pq"], QUERIES["z101_pq_ann"]
for qname, qfn in (("q50b", q50b), ("z101", z101)):
    times = {"old": [], "new": []}
    for variant in ["old", "new", "new", "old", "old", "new", "new", "old"]:
        sim._train_sample = _train_sample_old if variant == "old" else new_fn
        spark.sparkContext.setJobDescription(f"ab50b {qname} {variant}")
        t0 = time.perf_counter()
        qfn(spark, sf).write.format("noop").mode("overwrite").save()
        times[variant].append(time.perf_counter() - t0)
        release_caches(); spark.catalog.clearCache()
    for name, ts in times.items():
        print(f"{qname} {name}: median={statistics.median(ts):.3f} {[round(t,3) for t in ts]}")
sim._train_sample = new_fn
spark.stop()
