"""ABBA: q132 gram-set build — array_distinct on gram STRINGS then
hash (old) vs hash-before-distinct on LONGS (new, module code).
Monkeypatches dedup._gram_hash_set back to the old composition for the
'old' variant; asserts final-pair equality first."""
import statistics
import sys
import time

sys.path.insert(0, ".")
from pyspark.sql import functions as F

import ezdata_spark.operators.dedup as dd
from ezdata_spark.cache import release_caches
from ezdata_spark.queries import QUERIES, load
from ezdata_spark.session import get_spark


def old_gram_hash_set(text_col, unit):
    return F.transform(dd._gram_set(text_col, unit), lambda g: F.xxhash64(g))


new_gram_hash_set = dd._gram_hash_set

spark = get_spark("ab-q132h")
spark.sparkContext.setLogLevel("ERROR")
sf = "/root/testdata/sf0.1"
spark.read.parquet(f"{sf}/region.parquet").count()
fn = QUERIES["q132_trigram_similarity"]

key = lambda r: (r.id_a, r.id_b)
dd._gram_hash_set = old_gram_hash_set
r_old = sorted(fn(spark, sf).collect(), key=key)
release_caches(); spark.catalog.clearCache()
dd._gram_hash_set = new_gram_hash_set
r_new = sorted(fn(spark, sf).collect(), key=key)
release_caches(); spark.catalog.clearCache()
assert r_old == r_new, f"MISMATCH {len(r_old)} vs {len(r_new)}"
print(f"RESULTS EQUAL: {len(r_new)} pairs")

times = {"old": [], "new": []}
for variant in ["old", "new", "new", "old", "old", "new", "new", "old"]:
    dd._gram_hash_set = old_gram_hash_set if variant == "old" else new_gram_hash_set
    spark.sparkContext.setJobDescription(f"ab132h {variant}")
    t0 = time.perf_counter()
    fn(spark, sf).write.format("noop").mode("overwrite").save()
    times[variant].append(time.perf_counter() - t0)
    release_caches(); spark.catalog.clearCache()
dd._gram_hash_set = new_gram_hash_set
for name, ts in times.items():
    print(f"{name}: median={statistics.median(ts):.3f} min={min(ts):.3f} {[round(t,3) for t in ts]}")
spark.stop()
