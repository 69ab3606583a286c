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
        assert_scale_safe(df.select(slow("x").alias("y")))
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


def test_scalar_string_aggregate_not_flagged(spark):
    """An ungrouped scalar aggregate (SortAggregate for string max)
    legitimately reduces on one partition — one row per upstream task —
    and must NOT be reported as a global funnel."""
    df = spark.range(100).select(F.concat(F.lit("s"), "id").alias("s")).agg(
        F.max("s").alias("m")
    )
    found = audit(df)
    assert found["global_funnels"] == [], found
    assert_scale_safe(df)


def test_funnel_detection_sees_codegen_prefix():
    """Whole-stage-codegen rendering ('*(2) Sort ...') must still be
    recognized as a Sort funnel, and the reported name must be the bare
    operator, not a mangled argument fragment."""
    from ezdata_spark.plans import single_partition_funnels

    plan = "\n".join(
        [
            "*(2) Sort [id#0L ASC NULLS FIRST], true, 0",
            "+- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=1]",
            "   +- *(1) Range (0, 100, step=1, splits=32)",
        ]
    )
    assert single_partition_funnels(plan) == ["Sort"]
    benign = "\n".join(
        [
            "SortAggregate(key=[], functions=[max(s#1)])",
            "+- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=2]",
            "   +- SortAggregate(key=[], functions=[partial_max(s#1)])",
        ]
    )
    assert single_partition_funnels(benign) == []


def test_scan_report_in_filter_not_fragmented(spark):
    """Filters whose rendering contains commas (In lists) must stay ONE
    entry in scan_report."""
    df = spark.read.parquet(f"{SF_DIR}/documents.parquet").where(
        F.col("lang").isin("en", "fr", "de")
    )
    scans = scan_report(df)
    ins = [f for f in scans[0]["pushed_filters"] if f.startswith("In(lang")]
    assert len(ins) == 1 and "en" in ins[0] and "de" in ins[0], scans[0]


def test_read_schema_nested_types_not_fragmented(spark, tmp_path):
    """decimal(10,2) / map<string,bigint> / struct fields must each stay
    ONE read_schema entry (same top-level-split defect class as the In
    filter, on the type-parameter side)."""
    path = str(tmp_path / "nested.parquet")
    spark.sql(
        "SELECT 1L AS id, CAST(2.50 AS DECIMAL(10,2)) AS price, "
        "map('a', 1L) AS m, named_struct('x', 1, 'y', 2) AS st"
    ).write.parquet(path)
    df = spark.read.parquet(path).where(F.col("id") > 0)
    cols = scan_report(df)[0]["read_schema"]
    assert cols == ["id", "price", "m", "st"], cols


def test_split_top_level_unbalanced_closer_contained():
    """An unmatched closer inside one value corrupts at most that entry."""
    from ezdata_spark.plans.audit import _split_top_level

    parts = _split_top_level("EqualTo(tag,a]b), IsNotNull(x)")
    assert "IsNotNull(x)" in parts
