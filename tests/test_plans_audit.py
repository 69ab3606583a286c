"""plans/audit.py: the public plan-audit API — pushdown evidence,
hazard detection, and the waivable assert."""

import os

import pytest
from pyspark.sql import functions as F

from ezdata_spark.plans import assert_scale_safe, audit, scan_report

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")


def test_scan_report_shows_pushdown_and_pruning(spark):
    df = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .where((F.col("l_discount") > 0.05) & (F.col("l_quantity") < 10))
        .select("l_orderkey", "l_extendedprice")
    )
    scans = scan_report(df)
    assert len(scans) == 1
    s = scans[0]
    assert any("l_discount" in f for f in s["pushed_filters"])
    assert any("l_quantity" in f for f in s["pushed_filters"])
    # column pruning: only the filter + projection columns are read
    assert set(s["read_schema"]) == {
        "l_orderkey", "l_extendedprice", "l_discount", "l_quantity"
    }
    clean = assert_scale_safe(df)
    assert not clean["cartesian"] and not clean["global_funnels"]


def test_audit_flags_cartesian_and_global_window(spark):
    a = spark.range(10)
    b = spark.range(10).withColumnRenamed("id", "id2")
    cart = a.crossJoin(b)
    assert audit(cart)["cartesian"] or audit(cart)["nested_loop_join"]
    with pytest.raises(ValueError, match="not scale-safe"):
        assert_scale_safe(cart)
    from pyspark.sql.window import Window

    w = Window.orderBy("id")  # no partitionBy: the global funnel
    funnel = a.withColumn("rn", F.row_number().over(w))
    found = audit(funnel)
    assert found["global_funnels"], found
    with pytest.raises(ValueError, match="global sort/window funnel"):
        assert_scale_safe(funnel)


def test_audit_python_udf_tiers(spark):
    import pandas as pd

    df = spark.range(100).select(F.col("id").cast("double").alias("x"))

    @F.udf("double")
    def slow(x):
        return x + 1.0

    flagged = audit(df.select(slow("x").alias("y")))
    assert flagged["python_row_udfs"]
    with pytest.raises(ValueError, match="row-at-a-time"):
        assert_scale_safe(df.select(slow("y" if False else "x").alias("y")))
    # sanctioned boundary: Arrow-batched pandas UDF is NOT flagged
    @F.pandas_udf("double")
    def fast(x: pd.Series) -> pd.Series:
        return x + 1.0

    ok = audit(df.select(fast("x").alias("y")))
    assert not ok["python_row_udfs"]
    assert_scale_safe(df.select(fast("x").alias("y")))


def test_allow_nested_loop_waiver(spark):
    # broadcast 1-row scalar fold-in: the sanctioned BNLJ shape
    base = spark.range(1000).select(F.col("id").cast("double").alias("v"))
    total = base.agg(F.sum("v").alias("t"))
    folded = base.crossJoin(F.broadcast(total)).select((F.col("v") / F.col("t")).alias("share"))
    found = audit(folded)
    if found["nested_loop_join"]:
        with pytest.raises(ValueError):
            assert_scale_safe(folded)
        assert_scale_safe(folded, allow_nested_loop_join=True)
