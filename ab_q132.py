"""ABBA: q132 trigram prefix stage — gram_df='window' (old) vs
'broadcast' + shared repartition(id) exchange (new). Result equality
(full sorted row compare) + interleaved timing, one session."""
import statistics
import sys
import time

sys.path.insert(0, ".")
from pyspark.sql import functions as F

from ezdata_spark.cache import release_caches
from ezdata_spark.operators.dedup import trigram_similarity_pairs
from ezdata_spark.queries import load
from ezdata_spark.session import get_spark

spark = get_spark("ab-q132")
spark.sparkContext.setLogLevel("ERROR")
sf = "/root/testdata/sf0.1"
spark.read.parquet(f"{sf}/region.parquet").count()
docs = load(spark, sf, "documents")


def run(mode):
    return trigram_similarity_pairs(
        docs, threshold=0.8, max_gram_df=None, gram_df=mode
    )


key = lambda r: (r.id_a, r.id_b)
r_old = sorted(run("window").collect(), key=key)
release_caches(); spark.catalog.clearCache()
r_new = sorted(run("broadcast").collect(), key=key)
release_caches(); spark.catalog.clearCache()
assert r_old == r_new, f"MISMATCH rows {len(r_old)} vs {len(r_new)}"
print(f"RESULTS EQUAL: {len(r_new)} pairs")

times = {"window": [], "broadcast": []}
for mode in ["window", "broadcast", "broadcast", "window",
             "window", "broadcast", "broadcast", "window"]:
    spark.sparkContext.setJobDescription(f"ab132 {mode}")
    t0 = time.perf_counter()
    run(mode).write.format("noop").mode("overwrite").save()
    times[mode].append(time.perf_counter() - t0)
    release_caches(); spark.catalog.clearCache()
for name, ts in times.items():
    print(f"{name}: median={statistics.median(ts):.3f} min={min(ts):.3f} {[round(t,3) for t in ts]}")
spark.stop()
