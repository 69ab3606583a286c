"""EzTable verb tests on small in-memory frames, mirroring the
reference's docstring examples (simpletable.py:19-33) as golden tests,
plus the documented divergences (true groupby vs adjacency, null vs
masked join misses)."""

import pytest
from pyspark.sql import functions as F

from ezdata_spark.table import EzTable


@pytest.fixture(scope="module")
def t(spark):
    df = spark.createDataFrame(
        [
            (1, 10.0, "a", 5.0),
            (2, 20.0, "b", None),
            (3, 30.0, "a", 1.0),
            (4, 40.0, "c", 2.0),
            (5, 50.0, "b", 3.0),
        ],
        "k int, v double, cat string, w double",
    )
    return EzTable(df, units={"v": "mag"}, desc={"v": "a value"})


def test_keys_regex(t):
    assert t.keys("k v") == ["k", "v"]
    assert t.keys(".*a.*") == ["cat"]


def test_get_preserves_metadata(t):
    out = t.get("k v")
    assert out.colnames == ["k", "v"]
    assert out.unit("v") == "mag"
    assert out.comment("v") == "a value"


def test_where_and_selectwhere(t):
    assert t.where("(v > 15) & (cat == 'b')").nrows == 2
    out = t.selectWhere("k", "v >= 30")
    assert sorted(r.k for r in out.df.collect()) == [3, 4, 5]


def test_where_python_fallback(t):
    """Untranslatable Python conditions (str methods, ternaries) degrade
    to the row-wise pandas_udf filter — reference dictdataframe.py:
    454-481 semantics — while translatable ones keep the Catalyst path
    (no Python eval node in the plan)."""
    with pytest.warns(UserWarning, match="not a scale path"):
        out = t.where("cat.startswith('b') if w is not None else False")
    assert sorted(r.k for r in out.df.collect()) == [5]

    with pytest.warns(UserWarning):
        out2 = t.where("len(cat.upper()) == 1 and (v > 25 or k == 1)")
    assert sorted(r.k for r in out2.df.collect()) == [1, 3, 4, 5]

    # exprvars and aliases bind in the fallback too
    ta = t.set_alias("CATEGORY", "cat")
    with pytest.warns(UserWarning):
        out3 = ta.where("CATEGORY in allowed", exprvars={"allowed": {"a", "c"}})
    assert sorted(r.k for r in out3.df.collect()) == [1, 3, 4]

    # unknown names raise clearly instead of failing per-row
    with pytest.raises(Exception, match="unknown name"):
        t.where("nosuchcol.startswith('x')")

    # the translatable path must NOT pick up a Python filter node
    plan = t.where("(v > 15) & (cat == 'b')").df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    fb_plan = out.df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" in fb_plan  # and the fallback is genuinely the UDF path


def test_evalexpr_with_exprvars(t):
    out = t.evalexpr("v * scale", exprvars={"scale": 2}, name="v2")
    assert [r.v2 for r in out.sort("k").df.collect()] == [20.0, 40.0, 60.0, 80.0, 100.0]


def test_add_rename_remove(t):
    out = t.add_column("v2", "v + 1", unit="mag").rename_columns({"v2": "vplus"})
    assert "vplus" in out.colnames
    assert out.unit("vplus") == "mag"
    out2 = out.remove_columns("vplus")
    assert "vplus" not in out2.colnames


def test_alias_lifecycle(t):
    ta = t.set_alias("VAL", "v")
    assert ta.resolve_alias("VAL") == "v"
    assert ta.reverse_alias("v") == ["VAL"]
    assert ta.where("VAL > 45").nrows == 1
    # orphan cleanup: dropping the target kills the alias
    assert "VAL" not in ta.remove_columns("v")._aliases


def test_sort_reverse(t):
    got = [r.k for r in t.sort("v", reverse=True).df.collect()]
    assert got == [5, 4, 3, 2, 1]


def test_stack_with_defaults(t, spark):
    other = EzTable(spark.createDataFrame([(9, "z")], "k int, cat string"))
    out = t.stack(other, defaults={"v": -1.0})
    assert out.nrows == 6
    row = [r for r in out.df.collect() if r.k == 9][0]
    assert row.v == -1.0


def test_join_left_null_fill(t, spark):
    """DictDataFrame.join miss -> masked/NaN (dictdataframe.py:768-779);
    ours -> null (documented improvement, SURVEY.md §1.2)."""
    dim = EzTable(spark.createDataFrame([("a", 1), ("b", 2)], "cat string, code int"))
    out = t.join(dim, on="cat", how="left")
    rows = {r.k: r.code for r in out.df.collect()}
    assert rows[1] == 1 and rows[4] is None


def test_join_suffix_collision(t, spark):
    other = EzTable(spark.createDataFrame([(1, 99.0)], "k int, v double"))
    out = t.join(other, on="k", how="inner", rsuffix="_r")
    assert set(out.colnames) == {"k", "v", "cat", "w", "v_r"}


def test_match_inner(t, spark):
    other = EzTable(spark.createDataFrame([(1,), (3,), (7,)], "k int"))
    assert t.match(other, "k").nrows == 2


def test_groupby_true_semantics(t):
    """True grouping even when key values are not adjacent (divergence
    from SimpleTable's itertools.groupby, simpletable.py:2869)."""
    got = {r.cat: r.n for r in t.groupby("cat").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got == {"a": 2, "b": 2, "c": 1}


def test_aggregate_string_specs(t):
    out = t.aggregate({"n": "count(*)", "mv": "mean(v)", "mw": "max(w)"}, keys="cat")
    rows = {r.cat: r for r in out.df.collect()}
    assert rows["a"].n == 2 and rows["a"].mv == 20.0 and rows["a"].mw == 5.0


def test_stats_has_nan_null(t):
    st = {r.column: r for r in t.stats("w").collect()}
    assert st["w"].has_nan is True  # null counts as missing
    assert st["w"].min == 1.0 and st["w"].max == 5.0


def test_find_duplicate(t):
    out = t.find_duplicate("cat")
    assert {r.cat for r in out.df.collect()} == {"a", "b"}


def test_positional_select_requires_row_id(t):
    with pytest.raises(ValueError):
        t.select("k", indices=[0, 1])
    out = t.with_row_id(order_by="k").select(["k", "row_id"], indices=[0, 2])
    assert sorted(r.k for r in out.df.collect()) == [1, 3]


def test_append_row(t):
    out = t.append_row({"k": 6, "v": 60.0, "cat": "d", "w": 0.0})
    assert out.nrows == 6


def test_info_contains_metadata(t):
    s = t.set_alias("VAL", "v").info()
    assert "mag" in s and "VAL --> v" in s


def test_apply_in_pandas(t):
    def top_row(pdf):
        return pdf.nlargest(1, "v")[["cat", "v"]]

    out = t.apply_in_pandas("cat", top_row, "cat string, v double")
    got = {r.cat: r.v for r in out.df.collect()}
    assert got == {"a": 30.0, "b": 50.0, "c": 40.0}


def test_rows_iter_and_head(spark, sf_dir):
    from ezdata_spark.table import EzTable

    t = EzTable.read_parquet(spark, f"{sf_dir}/region.parquet")
    rows = list(t.rows())
    assert len(rows) == t.nrows
    assert isinstance(rows[0], dict) and "r_name" in rows[0]
    assert len(t.head(3)) == 3
    assert len(t.to_pandas()) == t.nrows


def test_astrotable_surface(spark):
    from ezdata_spark import AstroTable
    from pyspark.sql import functions as F

    df = spark.range(2000).select(
        F.col("id"),
        ((F.col("id") * 37) % 360).cast("double").alias("ra"),
        ((F.col("id") % 173) - 86).cast("double").alias("dec"),
        (F.col("id") % 20).cast("double").alias("mag"),
    )
    t = AstroTable(df)
    assert t.ra_name == "ra" and t.dec_name == "dec"

    cone = t.coneSearch(180.0, 0.0, 10.0)
    assert "separation" in cone.colnames
    assert cone.df.filter(F.col("separation") > 10.0).count() == 0

    zone = t.zoneSearch(10, 20, -5, 5)
    assert zone.df.filter(
        (F.col("ra") < 10) | (F.col("ra") > 20) | (F.abs(F.col("dec")) > 5)
    ).count() == 0

    combo = t.selectWhere("id mag", "mag > 5", cone=(180.0, 0.0, 30.0))
    assert set(combo.colnames) == {"id", "mag", "separation"}
    assert combo.df.filter(F.col("mag") <= 5).count() == 0

    # guessed alternate names + metadata survival through the verbs
    t2 = AstroTable(df.withColumnRenamed("ra", "RAJ2000").withColumnRenamed("dec", "DEJ2000"))
    assert t2.ra_name == "RAJ2000" and t2.dec_name == "DEJ2000"
    assert isinstance(t2.coneSearch(0, 0, 5), AstroTable)


def test_eztable_plotter_property(spark, sf_dir):
    from ezdata_spark.table import EzTable

    t = EzTable.read_parquet(spark, f"{sf_dir}/lineitem.parquet")
    h = t.Plotter.hist("l_quantity", bins=5, range=(0.0, 51.0))
    assert h.counts.sum() == t.nrows


def test_evalexpr_dtype(spark, sf_dir):
    from ezdata_spark.table import EzTable

    t = EzTable.read_parquet(spark, f"{sf_dir}/lineitem.parquet")
    out = t.evalexpr("l_quantity * 2", name="q2", dtype="int")
    assert dict(out.df.dtypes)["q2"] == "int"


def test_keys_reference_semantics(spark):
    """Default = re.match (prefix: 'ra' also matches 'radius');
    full_match=True = re.fullmatch (simpletable.py:2055-2109)."""
    from ezdata_spark.table import EzTable

    df = spark.createDataFrame([(1.0, 2.0, 3.0)], "ra double, radius double, dec double")
    t = EzTable(df)
    assert t.keys("ra") == ["ra", "radius"]
    assert t.keys("ra", full_match=True) == ["ra"]


def test_join_same_key_left_right_on(spark):
    from ezdata_spark.table import EzTable

    l = EzTable(spark.createDataFrame([(1, "a"), (2, "b")], "id long, x string"))
    r = EzTable(spark.createDataFrame([(1, "A")], "id long, y string"))
    out = l.join(r, left_on="id", right_on="id", how="left").df
    assert out.count() == 2
    assert "id_r" in out.columns  # collided key suffixed, join still on it


def test_join_lsuffix_on_colliding_left_key(spark):
    """A left_on key that collides with a right column gets lsuffix-renamed;
    the join condition must follow the rename (round-1 ADVICE)."""
    from ezdata_spark.table import EzTable

    l = EzTable(spark.createDataFrame([(1, "a"), (2, "b")], "id long, x string"))
    r = EzTable(spark.createDataFrame([(1, "A")], "fk long, id string"))
    out = l.join(r, left_on="id", right_on="fk", how="left", lsuffix="_l").df
    assert out.count() == 2
    assert "id_l" in out.columns and "id_r" in out.columns


def test_join_list_on_columns_other(spark):
    from ezdata_spark.table import EzTable

    l = EzTable(spark.createDataFrame([(1, 2, "a")], "k1 long, k2 long, x string"))
    r = EzTable(spark.createDataFrame([(1, 2, "keep", "drop")], "k1 long, k2 long, v string, w string"))
    out = l.join(r, on=["k1", "k2"], columns_other=["v"]).df
    assert set(out.columns) == {"k1", "k2", "x", "v"}
    assert out.count() == 1


def test_broadcast_other_forced(spark):
    from ezdata_spark.table import EzTable

    l = EzTable(spark.range(1000).selectExpr("id AS k", "id * 2 AS a"))
    r = EzTable(spark.range(10).selectExpr("id AS k", "id AS b"))
    out = l.join(r, on="k", broadcast_other=True).df
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_alias_pruning_and_survival(spark):
    from ezdata_spark.table import EzTable

    df = spark.createDataFrame([(1.0, 2.0)], "a double, b double")
    t = EzTable(df).set_alias("s", "a + b").set_alias("two", "2 * pi")
    # dropping b prunes the broken alias, keeps the constant one
    t2 = t.remove_columns("b")
    assert "s" not in t2._aliases
    assert "two" in t2._aliases
    # renaming rewrites alias targets
    t3 = t.rename_columns({"a": "x"})
    assert t3._aliases["s"] == "x + b"
    assert t3.where("s > 0").df.count() == 1
    # grammar keywords in a target are not identifiers: alias survives
    t4 = EzTable(df).set_alias("c", "a if a > b else b").remove_columns([])
    assert "c" in t4._aliases
    t5 = EzTable(df).set_alias("m", "(a > 0) and (b > 0)")._clone(df)
    assert "m" in t5._aliases


def test_expr_arity_errors(spark):
    import pytest as _pytest

    from ezdata_spark.expr import ExprError, translate

    for bad in ("square()", "logical_and(x)", "clip(x)"):
        with _pytest.raises(ExprError):
            translate(bad, ["x"])


def test_extension_dispatch_read_write(spark, tmp_path):
    """SimpleTable(fname)/t.write(fname) parity (simpletable.py:
    1474-1565, 1720-1772): one call, format picked by extension."""
    from pyspark.sql import functions as F

    from ezdata_spark.table import EzTable

    t = EzTable(
        spark.range(0, 12).select(
            F.col("id").alias("a"), (F.col("id") * 1.5).alias("x")
        ),
        units={"x": "mag"},
    )
    for name in ("t.parquet", "t.ecsv", "t.csv", "t.fits", "t.h5", "t.vot", "t.jsonl"):
        p = str(tmp_path / name)
        t.write(p, single_file=True) if name.endswith(".csv") else t.write(p)
        # jsonl keeps its scale discipline: schema or bounded sample required
        kw = {"schema": "a long, x double"} if name.endswith(".jsonl") else {}
        back = EzTable.read(spark, p, **kw)
        assert back.df.count() == 12, name
        # jsonl adds its _corrupt_record quarantine column by design
        assert {"a", "x"}.issubset(set(back.df.columns)), name
        got = sorted(r.a for r in back.df.collect())
        assert got == list(range(12)), name
    # units survive the metadata-carrying formats
    for name in ("t.parquet", "t.ecsv", "t.fits", "t.vot"):
        back = EzTable.read(spark, str(tmp_path / name))
        assert back.unit("x") == "mag", name
    # latex is write-only
    t.write(str(tmp_path / "t.tex"), n=5)
    assert open(tmp_path / "t.tex").read().startswith("\\begin{table}")
    with pytest.raises(ValueError, match="unrecognized"):
        EzTable.read(spark, "x.unknownext")


def test_melt_matches_pandas(spark):
    import pandas as pd

    from ezdata_spark.table import EzTable

    pdf = pd.DataFrame(
        {"k": [1, 2], "a": [1.0, 2.0], "b": [3.0, 4.0], "c": [5.0, 6.0]}
    )
    t = EzTable(spark.createDataFrame(pdf))
    got = (
        t.melt(["k"], var_name="var", value_name="val")
        .df.orderBy("k", "var")
        .toPandas()
    )
    exp = (
        pdf.melt(id_vars=["k"], var_name="var", value_name="val")
        .sort_values(["k", "var"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # default value_vars = all non-id columns; explicit subset works too
    sub = t.melt(["k"], ["a"], var_name="var", value_name="val").df.collect()
    assert {(r.k, r.var, r.val) for r in sub} == {(1, "a", 1.0), (2, "a", 2.0)}
