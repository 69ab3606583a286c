"""Scale A/B for q132's gram_df mode: 'window' vs 'broadcast' on the
published scale_check.py sim_join_char3_auto fixture (300k docs,
boilerplate-spike corpus, max_gram_df='auto', 8 MB broadcast threshold
to keep scale-true join shapes). Equality via count + hash-sum."""
import os
import statistics
import sys
import time

os.environ.setdefault("SPARK_DRIVER_MEMORY", "16g")
sys.path.insert(0, ".")
from pyspark.sql import functions as F

from ezdata_spark.cache import release_caches
from ezdata_spark.operators.dedup import trigram_similarity_pairs
from ezdata_spark.session import get_spark


def main():
    ctri_n = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    spark = get_spark("ab-q132-scale")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(8 * 1024 * 1024))
    alpha62 = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
    suf = (
        "array_join(transform(sequence(1, 27), i -> substr('"
        + alpha62
        + "', cast(pmod(xxhash64(id - pmod(id, 3), i), 62) + 1 as int), 1)), '')"
    )
    tail = (
        "array_join(transform(sequence(1, 3), i -> substr('"
        + alpha62
        + "', cast(pmod(xxhash64(id, 100 + i), 62) + 1 as int), 1)), '')"
    )
    docs = spark.range(ctri_n).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") % 10 == 0,
            F.lit("standard boilerplate disclaimer appended to every document"),
        )
        .otherwise(
            F.concat(
                F.lit("standard boilerplate disclaimer appended to "),
                F.expr(suf),
                F.expr(tail),
            )
        )
        .alias("text"),
    )

    import warnings

    def run(mode):
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            return trigram_similarity_pairs(docs, threshold=0.8, gram_df=mode)

    def digest(df):
        return df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.xxhash64(
                    "id_a", "id_b", "n_inter", "n_a", "n_b",
                    F.format_number("jaccard", 6),
                )
            ).alias("h"),
        ).collect()[0]

    d_old = digest(run("window")); release_caches(); spark.catalog.clearCache()
    d_new = digest(run("broadcast")); release_caches(); spark.catalog.clearCache()
    assert (d_old.n, d_old.h) == (d_new.n, d_new.h), f"MISMATCH {d_old} vs {d_new}"
    print(f"RESULTS EQUAL: {d_new.n} pairs, hash {d_new.h}")

    times = {"window": [], "broadcast": []}
    for mode in ["window", "broadcast", "broadcast", "window"]:
        spark.sparkContext.setJobDescription(f"ab132s {mode}")
        t0 = time.perf_counter()
        run(mode).write.format("noop").mode("overwrite").save()
        times[mode].append(time.perf_counter() - t0)
        release_caches(); spark.catalog.clearCache()
    for name, ts in times.items():
        print(f"{name}: mean={statistics.mean(ts):.2f} {[round(t,2) for t in ts]}")
    spark.stop()


if __name__ == "__main__":
    main()
