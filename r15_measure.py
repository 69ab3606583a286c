"""Round-14 isolation harness: time individual queries with the noop
sink (guide §1.4) and dump .explain('formatted') to plans/r15/.

Usage:
  python r15_measure.py q132_trigram_similarity q119_triangle_census \
      [--reps=5] [--plan=before|after|none] [--sf=/root/testdata/sf0.1]

Per query: reps timed runs (median reported), caches released between
reps exactly like bench.py, jobs labelled for the UI. Prints one line
per query: name, median, min, all samples.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 5
    plan = "none"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for a in sys.argv[1:]:
        if a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
        elif a.startswith("--plan="):
            plan = a.split("=", 1)[1]
        elif a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]

    from ezdata_spark.cache import release_caches
    from ezdata_spark.plans import explain_text
    from ezdata_spark.queries import QUERIES
    from ezdata_spark.session import get_spark

    spark = get_spark("r15-measure")
    spark.sparkContext.setLogLevel("ERROR")

    # same warmup as bench.py so first-rep JIT noise doesn't skew medians
    from pyspark.sql import functions as F

    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    warm = spark.range(0, 20_000, 1, 32).select(
        F.expr(
            "aggregate(transform(sequence(1, 32),"
            " i -> xxhash64(concat(cast(id as string), '-', cast(i as string)))),"
            " array_repeat(9223372036854775807L, 8),"
            " (acc, h) -> zip_with(acc, acc, (x, y) -> least(x, h)))"
        ).alias("hof"),
        (F.col("id") % 97).alias("k"),
    )
    warm.groupBy("k").agg(F.count(F.lit(1))).write.format("noop").mode(
        "overwrite"
    ).save()

    plans_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r15")
    os.makedirs(plans_dir, exist_ok=True)

    out = {}
    for name in names:
        fn = QUERIES[name]
        if plan in ("before", "after"):
            df = fn(spark, sf_dir)
            with open(os.path.join(plans_dir, f"{name}_{plan}.txt"), "w") as fh:
                fh.write(explain_text(df, "formatted"))
            release_caches()
            spark.catalog.clearCache()
        samples = []
        for i in range(reps):
            spark.sparkContext.setJobDescription(f"r15 {name} rep{i}")
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
            release_caches()
            spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)
        out[name] = {
            "median": round(statistics.median(samples), 3),
            "min": round(min(samples), 3),
            "samples": [round(s, 3) for s in samples],
        }
        print(f"{name:30s} median={out[name]['median']:7.3f}  min={out[name]['min']:7.3f}  {out[name]['samples']}")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
