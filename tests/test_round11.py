"""Round-11 tests: ANSI-mode-safe evaluation metrics, visible NULL-row
accounting in classification_report, the cohort-retention window-min
plan shape, PSD eigenvalue clamping in PCA, and the final-adaptive-plan
audit option."""

import numpy as np
import pytest
from pyspark.sql import functions as F


# ---------------------------------------------- ANSI-mode metric contracts
@pytest.fixture()
def ansi(spark):
    """Run a test under spark.sql.ansi.enabled=true (the Spark 4
    default for sessions NOT built by this repo's session factory) —
    the evaluation tier's NULL-when-undefined contract must hold there
    too, not fall over with DIVIDE_BY_ZERO."""
    old = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        yield spark
    finally:
        spark.conf.set("spark.sql.ansi.enabled", old)


def test_binary_auc_single_class_null_under_ansi(ansi):
    from ezdata_spark.operators.evaluate import binary_auc

    mono = ansi.createDataFrame([(3, 1), (5, 1)], "score int, label int")
    r = binary_auc(mono).first()
    assert r["auc"] is None and r["n_pos"] == 2 and r["n_neg"] == 0
    # and the defined case still computes under ANSI
    ok = ansi.createDataFrame([(10, 1), (1, 0)], "score int, label int")
    assert binary_auc(ok).first()["auc"] == 1.0


def test_average_precision_no_positives_null_under_ansi(ansi):
    from ezdata_spark.operators.evaluate import average_precision

    neg = ansi.createDataFrame([(3, 0), (5, 0)], "score int, label int")
    r = average_precision(neg).first()
    assert r["ap"] is None and r["n_pos"] == 0 and r["n_neg"] == 2


def test_classification_report_degenerate_null_under_ansi(ansi):
    from ezdata_spark.operators.evaluate import classification_report

    df = ansi.createDataFrame([(1, 0), (2, 0)], "score int, label int")
    r = classification_report(df, threshold=10).first()
    assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (0, 0, 0, 2)
    assert r["precision"] is None and r["recall"] is None and r["f1"] is None
    assert r["accuracy"] == 1.0


# ------------------------------------- classification_report NULL accounting
def test_classification_report_counts_dropped_rows(spark):
    from ezdata_spark.operators.evaluate import classification_report

    rows = [
        (9, 1),  # TP
        (7, 0),  # FP
        (1, 1),  # FN
        (0, 0),  # TN
        (None, 1),  # null score -> dropped
        (8, None),  # null label -> dropped
        (None, None),  # both null -> dropped (once)
    ]
    df = spark.createDataFrame(rows, "score int, label int")
    r = classification_report(df, threshold=5).first()
    assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (1, 1, 1, 1)
    assert r["dropped"] == 3
    assert r["tp"] + r["fp"] + r["fn"] + r["tn"] + r["dropped"] == df.count()
    # metrics computed over the VALID rows only
    assert r["accuracy"] == pytest.approx(0.5)
    assert r["precision"] == pytest.approx(0.5)


def test_classification_report_all_rows_null(spark):
    from ezdata_spark.operators.evaluate import classification_report

    df = spark.createDataFrame(
        [(None, 1), (None, 0)], "score int, label int"
    )
    r = classification_report(df, threshold=0).first()
    assert (r["tp"], r["fp"], r["fn"], r["tn"], r["dropped"]) == (0, 0, 0, 0, 2)
    assert r["accuracy"] is None and r["f1"] is None


# --------------------------------------------- cohort_retention (q130 shape)
def test_cohort_retention_matches_hand_matrix(spark):
    """The r11 window-min + plain-count shape must reproduce the
    obvious per-user first-month/count-distinct definition (computed
    by hand here) — including a user active twice in one month (the
    month distinct), and retention == 1.0 on every months_since=0
    cell."""
    import datetime as dt

    from ezdata_spark.operators.window import cohort_retention

    rows = [
        # user 1: cohort Jan, active Jan (twice), Feb, Apr
        (1, dt.datetime(2024, 1, 3)),
        (1, dt.datetime(2024, 1, 28)),
        (1, dt.datetime(2024, 2, 10)),
        (1, dt.datetime(2024, 4, 1)),
        # user 2: cohort Jan, active Jan, Feb
        (2, dt.datetime(2024, 1, 15)),
        (2, dt.datetime(2024, 2, 2)),
        # user 3: cohort Feb, active Feb only
        (3, dt.datetime(2024, 2, 20)),
    ]
    df = spark.createDataFrame(rows, "uid bigint, ts timestamp")
    out = {
        (r["cohort"].month, r["months_since"]): (
            r["active"],
            r["cohort_size"],
            r["retention"],
        )
        for r in cohort_retention(df, "uid", "ts").collect()
    }
    assert out == {
        (1, 0): (2, 2, 1.0),
        (1, 1): (2, 2, 1.0),
        (1, 3): (1, 2, 0.5),
        (2, 0): (1, 1, 1.0),
    }


def test_cohort_retention_sf_invariants(spark, sf_dir):
    """Structural invariants at fixture scale: every cohort has a
    months_since=0 cell with retention exactly 1.0, no cell exceeds
    its cohort size, and the total distinct-user mass is conserved
    (sum of cohort sizes == distinct users)."""
    from ezdata_spark.operators.window import cohort_retention

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    ret = cohort_retention(orders, "o_custkey", "o_orderdate")
    bad = ret.where(
        (F.col("active") > F.col("cohort_size"))
        | ((F.col("months_since") == 0) & (F.col("retention") != 1.0))
        | (F.col("months_since") < 0)
    )
    assert bad.count() == 0
    sizes = (
        ret.select("cohort", "cohort_size").distinct().agg(F.sum("cohort_size"))
    ).first()[0]
    users = orders.select("o_custkey").distinct().count()
    assert sizes == users


# ----------------------------------------------------- PCA eigenvalue clamp
def test_pca_from_moments_clamps_negative_eigenvalues():
    """Single-pass covariance with a mean that dwarfs the variance
    produces tiny NEGATIVE eigenvalues through cancellation; the ratio
    must still come back in [0, 1] (clamped), never negative."""
    from ezdata_spark.operators.decomp import pca_from_moments

    rng = np.random.RandomState(7)
    X = 1e8 + rng.standard_normal((64, 4)) * 1e-3
    moments = {
        "n": len(X),
        "sum": X.sum(axis=0).tolist(),
        "xtx": (X.T @ X).ravel().tolist(),
    }
    _, comps, ratio = pca_from_moments(moments, k=4)
    assert all(r >= 0.0 for r in ratio)
    assert sum(ratio) <= 1.0 + 1e-9
    C = np.asarray(comps)
    assert np.allclose(C @ C.T, np.eye(4), atol=1e-8)


# ------------------------------------------------- final-adaptive-plan audit
def test_audit_final_reads_executed_adaptive_plan(spark, sf_dir):
    from ezdata_spark.plans import audit, physical_plan

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    df = orders.join(cust, orders.o_custkey == cust.c_custkey).groupBy(
        "c_mktsegment"
    ).agg(F.count(F.lit(1)).alias("n"))
    before = physical_plan(df)
    assert "isFinalPlan=false" in before
    after = physical_plan(df, final=True)
    # the finalized rendering is the final physical subtree ALONE —
    # no initial-plan section, no pre-execution ASPE header
    assert "isFinalPlan=false" not in after and "Initial Plan" not in after
    assert "HashAggregate" in after
    found = audit(df, final=True)
    assert not found["cartesian"] and not found["python_row_udfs"]
    # the audited frame stays re-usable after the materializing audit
    assert df.count() > 0


# ------------------------------------------------- labelled grid (xarray)
def test_histogram_grid_matches_histogramdd(spark, sf_dir):
    """histogram_grid must reproduce np.histogramdd bit-for-bit on the
    same explicit ranges: dims named by the columns, coords = bin
    CENTERS (reference xarray.py:91 '0.5*(coo[:-1]+coo[1:])'), empty
    bins 0."""
    from ezdata_spark.operators.labelled import histogram_grid

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    rows = li.select("l_quantity", "l_discount").collect()
    X = np.array([[r[0], r[1]] for r in rows], dtype=np.float64)
    rng = [(1.0, 50.0), (0.0, 0.1)]
    g = histogram_grid(
        li, ["l_quantity", "l_discount"], nbins=[12, 5], range=rng
    )
    want, edges = np.histogramdd(X, bins=[12, 5], range=rng)
    assert g.dims == ("l_quantity", "l_discount")
    assert np.allclose(g.coords["l_quantity"], 0.5 * (edges[0][:-1] + edges[0][1:]))
    assert np.allclose(g.coords["l_discount"], 0.5 * (edges[1][:-1] + edges[1][1:]))
    assert np.array_equal(g.values, want)


def test_histogram_grid_weighted_and_inferred_range(spark, sf_dir):
    from ezdata_spark.operators.labelled import histogram_grid

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    rows = li.select("l_quantity", "l_extendedprice").collect()
    x = np.array([r[0] for r in rows], dtype=np.float64)
    wt = np.array([r[1] for r in rows], dtype=np.float64)
    g = histogram_grid(li, ["l_quantity"], nbins=10, weight="l_extendedprice")
    want, _ = np.histogram(
        x, bins=10, range=(x.min(), x.max()), weights=wt
    )
    assert np.allclose(g["wsum"], want, rtol=1e-12)


def test_labelled_grid_sel_and_isel(spark, sf_dir):
    from ezdata_spark.operators.labelled import histogram_grid

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    g = histogram_grid(
        li, ["l_quantity", "l_linenumber"], nbins=[7, 7],
        range=[(1.0, 50.0), (1.0, 8.0)],
    )
    c0 = float(g.coords["l_quantity"][3])
    row = g.sel(l_quantity=c0)
    assert row.dims == ("l_linenumber",)
    assert np.array_equal(row.values, g.values[3])
    # nearest snaps, exact raises on a non-coordinate
    width = float(g.coords["l_quantity"][1] - g.coords["l_quantity"][0])
    assert np.array_equal(
        g.sel(l_quantity=c0 + 0.3 * width, method="nearest").values,
        g.values[3],
    )
    with pytest.raises(KeyError):
        g.sel(l_quantity=c0 + 1.2345)
    # scalar cell by position
    cell = g.isel(l_quantity=3, l_linenumber=2)
    assert cell.dims == () and cell.values == g.values[3, 2]


def test_grid_from_binned_statistic_categorical_and_nan(spark, sf_dir):
    """binned_statistic with a categorical dim -> grid: category coords
    sorted, empty numeric bins NaN (the reference's pandas reindex
    semantics, xarray.py:218-221)."""
    from ezdata_spark.operators.binned import BinSpec, binned_statistic
    from ezdata_spark.operators.labelled import grid_from_binned

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    specs = [
        BinSpec("l_returnflag", categorical=True),
        BinSpec("l_quantity", 1.0, 50.0, 4),
    ]
    out = binned_statistic(li, specs, "l_extendedprice", "mean")
    g = grid_from_binned(out, specs)
    flags = sorted(
        r[0] for r in li.select("l_returnflag").distinct().collect()
    )
    assert list(g.coords["l_returnflag"]) == flags
    assert g["mean"].shape == (len(flags), 4)
    # spot-check one cell against a direct computation
    import pyspark.sql.functions as F

    f0 = flags[0]
    want = (
        li.where(
            (F.col("l_returnflag") == f0)
            & (F.col("l_quantity") >= 1.0)
            & (F.col("l_quantity") < 1.0 + 49.0 / 4)
        ).agg(F.avg("l_extendedprice")).first()[0]
    )
    assert g["mean"][0, 0] == pytest.approx(want)


def test_grid_from_binned_sparse_cells_nan(spark):
    """densify=False leaves holes; the grid surfaces them as NaN."""
    from ezdata_spark.operators.binned import BinSpec, binned_agg
    from ezdata_spark.operators.labelled import grid_from_binned
    import pyspark.sql.functions as F

    df = spark.createDataFrame([(0.5,), (2.5,)], "x double")
    specs = [BinSpec("x", 0.0, 4.0, 4)]
    out = binned_agg(df, specs, {"count": F.count(F.lit(1))}, densify=False)
    g = grid_from_binned(out, specs)
    assert g.values[0] == 1 and g.values[2] == 1
    assert np.isnan(g.values[1]) and np.isnan(g.values[3])


def test_labelled_grid_to_xarray_roundtrip(spark, sf_dir):
    xr = pytest.importorskip("xarray")
    from ezdata_spark.operators.labelled import histogram_grid

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    g = histogram_grid(li, ["l_quantity"], nbins=5, range=[(1.0, 50.0)],
                       name="counts")
    da = g.to_xarray()
    assert isinstance(da, xr.DataArray) and da.name == "counts"
    assert np.array_equal(da.values, g.values)
    assert float(da.sel(l_quantity=g.coords["l_quantity"][2])) == g.values[2]


# --------------------------------------------------- pprint_entry parity
def test_entry_golden_format(spark):
    """Golden render of the reference row-record formatter
    (simpletable.py:1601-1626): aligned 'key: value' lines, widths from
    the longest selected key."""
    from ezdata_spark.table import EzTable

    t = EzTable(
        spark.createDataFrame(
            [(1, "alpha", 2.5), (2, "beta", 7.25)],
            "id bigint, name string, radius double",
        )
    ).set_alias("r", "radius")
    assert t.entry(0) == "id    : 1\nname  : alpha\nradius: 2.5"
    # positional row 1
    assert t.entry(1, ["name"]) == "name: beta"
    # regex over columns AND aliases (re.match semantics: anchored
    # prefix), alias resolves to its target column's value
    out = t.entry(1, "r")
    assert out == "radius: 7.25\nr     : 7.25"
    with pytest.raises(ValueError):
        t.entry(0, "nomatch_.*")
    with pytest.raises(IndexError):
        t.entry(5)


def test_pprint_entry_prints(spark, capsys):
    from ezdata_spark.table import EzTable

    t = EzTable(spark.createDataFrame([(42,)], "x bigint"))
    t.pprint_entry(0)
    assert capsys.readouterr().out == "x: 42\n"


# ------------------------------------------- code-review fixes (round 11)
def test_entry_expression_alias(spark):
    """Aliases may target EXPRESSIONS; entry() must go through the
    _select_cols translation path, not F.col(resolve_alias(...))."""
    from ezdata_spark.table import EzTable

    t = EzTable(
        spark.createDataFrame([(2.5,), (4.0,)], "radius double")
    ).set_alias("r2", "radius*2")
    assert t.entry(1, ["r2"]) == "r2: 8.0"


def test_physical_plan_final_excludes_initial_plan(spark, sf_dir):
    """The finalized AQE rendering must contain ONLY the final plan —
    a node AQE optimized away in the initial plan must not be
    reported by a final=True audit."""
    from ezdata_spark.plans import physical_plan

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    df = orders.join(cust, orders.o_custkey == cust.c_custkey).groupBy(
        "c_mktsegment"
    ).agg(F.count(F.lit(1)).alias("n"))
    txt = physical_plan(df, final=True)
    assert "Initial Plan" not in txt and "HashAggregate" in txt


def test_grid_from_binned_skips_non_numeric_autoinfer(spark):
    from ezdata_spark.operators.binned import BinSpec, binned_agg
    from ezdata_spark.operators.labelled import grid_from_binned

    df = spark.createDataFrame(
        [(0.5, "a"), (2.5, "b"), (2.7, "b")], "x double, tag string"
    )
    specs = [BinSpec("x", 0.0, 4.0, 4)]
    out = binned_agg(
        df, specs,
        {"count": F.count(F.lit(1)), "tags": F.collect_set("tag")},
        densify=False,
    )
    g = grid_from_binned(out, specs)  # auto-inference skips 'tags'
    assert g.variables == ["count"]
    with pytest.raises(ValueError, match="tags"):
        grid_from_binned(out, specs, value_cols=["tags"])


# --------------------------------------- labelled-grid property tests
def test_histogram_grid_nan_rows_dropped_like_histogramdd(spark):
    """NaN values fall outside every range comparison in BOTH engines —
    np.histogramdd drops them, and so must the binned scan."""
    vals = [1.0, float("nan"), 2.5, 3.9, float("nan"), 0.1]
    from ezdata_spark.operators.labelled import histogram_grid

    df = spark.createDataFrame([(v,) for v in vals], "x double")
    g = histogram_grid(df, ["x"], nbins=4, range=[(0.0, 4.0)])
    want, _ = np.histogram(np.array(vals), bins=4, range=(0.0, 4.0))
    assert np.array_equal(g.values, want)


def test_histogram_grid_property_matches_histogramdd(spark):
    """Randomized agreement with np.histogramdd across bin counts,
    ranges (incl. values outside them), and 1-D/2-D shapes.

    Value/edge geometry is constrained to exact binary fractions
    (quarter-grid values, integer ranges, power-of-two bin counts) so
    every (x-lo)/width quotient is either an exact integer or >= 1/40
    from one — the arithmetic-vs-edge-searchsorted ulp divergence
    binned._bin_id documents cannot trigger, and any mismatch is a
    real bug, not a boundary lottery."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from ezdata_spark.operators.labelled import histogram_grid

    quarters = st.integers(-20, 20).map(lambda q: q / 4.0)

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        data=st.lists(st.tuples(quarters, quarters), min_size=1, max_size=60),
        nx=st.sampled_from([1, 2, 4, 8]),
        ny=st.sampled_from([1, 2, 4]),
        lo=st.integers(-4, 0),
        hi=st.integers(1, 4),
    )
    def check(data, nx, ny, lo, hi):
        X = np.array(data, dtype=np.float64)
        rng = [(float(lo), float(hi)), (-3.0, 3.0)]
        df = spark.createDataFrame(
            [(float(a), float(b)) for a, b in data], "x double, y double"
        )
        g = histogram_grid(df, ["x", "y"], nbins=[nx, ny], range=rng)
        want, _ = np.histogramdd(X, bins=[nx, ny], range=rng)
        assert g.values.shape == (nx, ny)
        assert np.array_equal(g.values, want)

    check()
