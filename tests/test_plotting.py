"""Plotting layer: every verb must aggregate on-cluster and return only
small numpy results (SURVEY.md §2.12 — never collect raw rows)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from ezdata_spark.functions import norms
from ezdata_spark.plotting import CornerPlot, Group, PairGrid, Plotter
from ezdata_spark.table import EzTable


@pytest.fixture(scope="module")
def lineitem(spark, sf_dir):
    return EzTable.read_parquet(spark, f"{sf_dir}/lineitem.parquet")


@pytest.fixture(scope="module")
def customer(spark, sf_dir):
    return EzTable.read_parquet(spark, f"{sf_dir}/customer.parquet")


def test_hist_counts_sum_to_rows(lineitem):
    n = lineitem.df.count()
    h = Plotter(lineitem).hist("l_quantity", bins=10, range=(0.0, 51.0))
    assert h.counts.sum() == n
    assert len(h.edges) == 11
    assert len(h.centers) == 10


def test_hist_expression_and_weights(lineitem):
    h = Plotter(lineitem).hist(
        "l_extendedprice * (1 - l_discount)", bins=5, weights="l_quantity"
    )
    total_w = lineitem.df.agg(F.sum("l_quantity")).collect()[0][0]
    assert h.counts.sum() == pytest.approx(total_w, rel=1e-9)


def test_hist2d_grid(lineitem):
    g = Plotter(lineitem).hist2d(
        "l_quantity", "l_discount", bins=(8, 4), range=((0.0, 51.0), (0.0, 0.12))
    )
    assert g.counts.shape == (8, 4)
    assert g.counts.sum() == lineitem.df.count()


def test_viewport_equals_full_raster_slice(lineitem):
    """Zoom re-aggregation: a viewport whose bins align with a sub-grid
    of the full raster reproduces exactly that slice (the reference's
    make_image contract, datashader.py:183-219)."""
    # edges placed OFF the discrete data values (quantities are ints,
    # discounts multiples of 0.01): a histogram's last bin is closed, so
    # a viewport edge that coincides with data absorbs it differently
    # from an interior edge of the full raster
    full = Plotter(lineitem).hist2d(
        "l_quantity", "l_discount", bins=(10, 11), range=((0.5, 50.5), (-0.005, 0.105))
    )
    view = Plotter(lineitem).viewport(
        "l_quantity", "l_discount", (10.5, 30.5), (0.035, 0.075), bins=(4, 4)
    )
    assert np.array_equal(view.counts, full.counts[2:6, 4:8])
    assert view.counts.sum() > 0
    assert view.x_edges[0] == 10.5 and view.x_edges[-1] == 30.5


def test_viewport_filter_pushed_to_scan(lineitem, spark):
    """The viewport's range predicate must reach the parquet scan as
    PushedFilters — a zoom that reads the whole table is wrong."""
    from ezdata_spark.operators.binned import BinSpec, binned_agg

    df = lineitem.df.withColumn("__x", F.col("l_quantity")).withColumn(
        "__y", F.col("l_discount")
    )
    specs = [BinSpec("__x", 10.0, 30.0, 4), BinSpec("__y", 0.04, 0.08, 4)]
    out = binned_agg(df, specs, {"v": F.count(F.lit(1))}, densify=False, with_centers=False)
    plan = (
        out._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
    )
    assert "PushedFilters" in plan
    pushed = plan[plan.index("PushedFilters") : plan.index("PushedFilters") + 400]
    assert "GreaterThanOrEqual(l_quantity,10.0" in pushed
    assert "LessThanOrEqual(l_discount,0.08" in pushed
    # column pruning: only the two raster columns reach the scan
    read = plan[plan.index("ReadSchema") : plan.index("ReadSchema") + 200]
    assert "l_quantity" in read and "l_discount" in read and "l_orderkey" not in read


def test_viewport_persist_loop(lineitem):
    """persist()/unpersist() bracket an interactive zoom loop; results
    are identical with the cache on."""
    p = Plotter(lineitem).persist()
    try:
        a = p.viewport("l_quantity", "l_discount", (0.0, 25.0), (0.0, 0.05), bins=4)
        b = p.viewport("l_quantity", "l_discount", (0.0, 25.0), (0.0, 0.05), bins=4)
        assert np.array_equal(a.counts, b.counts)
        assert p.t.df.storageLevel.useMemory
    finally:
        p.unpersist()
    assert not p.t.df.storageLevel.useMemory


def test_scatter_is_raster(lineitem):
    g = Plotter(lineitem).scatter("l_quantity", "l_extendedprice", bins=16)
    assert g.counts.shape == (16, 16)


def test_hexbin_counts(lineitem):
    hexed = Plotter(lineitem).hexbin("l_quantity", "l_extendedprice", gridsize=12)
    total = hexed.agg(F.sum("count")).collect()[0][0]
    assert total == lineitem.df.count()


def test_boxplot_matches_sql(customer):
    b = Plotter(customer).boxplot("c_mktsegment", "c_acctbal")
    ref = (
        customer.df.groupBy("c_mktsegment")
        .agg(F.percentile("c_acctbal", F.lit(0.5)).alias("m"))
        .orderBy("c_mktsegment")
        .collect()
    )
    assert list(b.keys) == [r["c_mktsegment"] for r in ref]
    np.testing.assert_allclose(b.median, [r["m"] for r in ref])
    assert np.all(b.q1 <= b.median) and np.all(b.median <= b.q3)


def test_groupby_group(customer):
    grp = Plotter(customer).groupby("c_mktsegment")
    nseg = customer.df.select("c_mktsegment").distinct().count()
    assert len(grp) == nseg
    hists = grp.hist("c_acctbal", bins=4, range=(-1000.0, 10000.0))
    assert len(hists) == nseg
    # per-group counts sum back to the total in range
    in_range = customer.df.filter(
        (F.col("c_acctbal") >= -1000) & (F.col("c_acctbal") <= 10000)
    ).count()
    assert sum(h.counts.sum() for h in hists) == in_range


def test_group_hist_fused_matches_member_loop(customer, spark):
    """Group.hist must equal the per-member loop exactly (explicit AND
    guessed ranges) while running O(1) jobs, not one per group."""
    grp = Plotter(customer).groupby("c_mktsegment")
    loop = [p.hist("c_acctbal", bins=8, range=(-1000.0, 10000.0)) for p in grp.members]

    sc = spark.sparkContext
    sc.setJobGroup("fused-hist", "fused-hist")
    fused = grp.hist("c_acctbal", bins=8, range=(-1000.0, 10000.0))
    n_jobs = len(sc.statusTracker().getJobIdsForGroup("fused-hist"))
    sc.setJobGroup("", "")
    # O(1) in the group count: broadcast materialization + AQE stages +
    # final collect — NOT one job per group (the member loop runs >= 5)
    assert n_jobs <= 3, f"fused Group.hist ran {n_jobs} jobs for {len(grp)} groups"

    for got, ref in zip(fused, loop):
        np.testing.assert_array_equal(got.counts, ref.counts)
        np.testing.assert_allclose(got.edges, ref.edges)
        assert got.label == ref.label

    # guessed (per-group) ranges also match member-wise guess_range
    loop_g = [p.hist("c_acctbal", bins=5) for p in grp.members]
    fused_g = grp.hist("c_acctbal", bins=5)
    for got, ref in zip(fused_g, loop_g):
        np.testing.assert_array_equal(got.counts, ref.counts)
        np.testing.assert_allclose(got.edges, ref.edges)


def test_select_groups_and_add(customer):
    g1 = Plotter(customer).select(["c_acctbal > 5000"], labels=["rich"])
    g2 = Plotter(customer).select(["c_acctbal <= 5000"], labels=["rest"])
    both = g1 + g2
    assert isinstance(both, Group) and len(both) == 2
    counts = [p.t.df.count() for p in both.members]
    assert sum(counts) == customer.df.count()


def test_lagplot_needs_order(lineitem):
    with pytest.raises(ValueError):
        Plotter(lineitem).lagplot("l_quantity", t=1)


def test_pairgrid_and_corner(lineitem):
    keys = ["l_quantity", "l_discount"]
    pg = PairGrid(lineitem, keys, bins=4)
    diag = pg.map_diag()
    assert set(diag) == set(keys)
    off = pg.map_offdiag()
    assert list(off) == [("l_quantity", "l_discount")]
    panels = CornerPlot(lineitem, keys, bins=4).panels()
    assert set(panels) == {"diag", "lower"}


def test_plot_aitoff_bounds(spark):
    df = spark.range(200).select(
        ((F.col("id") * 37) % 360).cast("double").alias("lon"),
        ((F.col("id") % 171) - 85).cast("double").alias("lat"),
    )
    g = Plotter(EzTable(df)).plot_aitoff("lon", "lat", bins=36)
    assert g.counts.sum() == 200  # every point lands inside the Aitoff ellipse


def test_render_gated_without_mpl(lineitem):
    h = Plotter(lineitem).hist("l_quantity", bins=4, range=(0.0, 51.0))
    try:
        import matplotlib  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError):
            h.render()


# ---- norms (driver-side raster transforms, matplotlib/norm.py:49-148) ----


def test_norms_range_and_shape():
    a = np.array([[0.0, 1.0, 10.0], [100.0, 5.0, np.nan]])
    for fn in (
        norms.arcsinh_norm,
        norms.sqrt_norm,
        norms.pow_norm,
        norms.log_norm,
        norms.midpoint_norm,
        norms.histeq_norm,
        norms.percentile_norm,
    ):
        out = fn(a)
        assert out.shape == a.shape
        finite = out[np.isfinite(out)]
        assert finite.min() >= 0.0 and finite.max() <= 1.0


def test_histeq_is_monotone():
    a = np.array([1.0, 2.0, 4.0, 8.0, 100.0])
    out = norms.histeq_norm(a, nbins=8)
    assert np.all(np.diff(out) >= 0)


def test_histeq_edges_cluster_side(spark):
    df = spark.range(1000).select(F.col("id").cast("double").alias("v"))
    edges = norms.histeq_edges(df, "v", nbins=4)
    assert len(edges) == 5
    assert edges[0] <= edges[1] <= edges[2] <= edges[3] <= edges[4]


def test_colorify_stable():
    m = norms.colorify(["b", "a", "c", "a"])
    assert m == {"a": 0, "b": 1, "c": 2}


def test_all_against(lineitem):
    out = Plotter(lineitem).all_against("l_quantity", ["l_discount", "l_tax"], bins=8)
    assert set(out) == {"l_discount", "l_tax"}
    assert all(g.counts.shape == (8, 8) for g in out.values())


def test_profile_feed(lineitem):
    rows = Plotter(lineitem).profile("l_quantity", "l_extendedprice", bins=10,
                                     range=(0.0, 51.0)).collect()
    assert len(rows) == 10  # densified: every bin present
    total = sum(r["n"] for r in rows)
    assert total == lineitem.df.count()


def test_hist_empty_column_clear_error(spark):
    df = spark.createDataFrame([(None,), (None,)], "x double")
    with pytest.raises(ValueError, match="no non-null values"):
        Plotter(EzTable(df)).hist("x")


def test_hist_constant_column(spark):
    df = spark.createDataFrame([(5.0,)] * 7, "x double")
    h = Plotter(EzTable(df)).hist("x", bins=4)
    assert h.counts.sum() == 7


def test_hexbin_is_nearest_center(spark):
    """Cube rounding: every point must land in the hex whose center is
    nearest in the axial metric (sheared-lattice rounding fails this)."""
    import itertools

    rows = [(float(x) / 7, float(y) / 7) for x, y in itertools.product(range(70), range(70))]
    df = spark.createDataFrame(rows, "x double, y double")
    hexed = Plotter(EzTable(df)).hexbin("x", "y", gridsize=10).collect()
    assert sum(r["count"] for r in hexed) == len(rows)
    # axial-distance check on a sample of assigned centers
    sx = sy = 10.0 / 10  # range/gridsize
    import numpy as np

    centers = [(r["x"], r["y"]) for r in hexed]

    def axial(px, py):
        return (px / sx - (py / sy) / 2.0, py / sy)

    carr = np.array([axial(cx, cy) for cx, cy in centers])
    for px, py in rows[::500]:
        pq, pr = axial(px, py)
        # hex distance in axial coords
        dq = carr[:, 0] - pq
        dr = carr[:, 1] - pr
        hexdist = (np.abs(dq) + np.abs(dr) + np.abs(dq + dr)) / 2
        # the point's own bucket must be among the nearest centers
        own = min(
            range(len(centers)),
            key=lambda i: hexdist[i],
        )
        assert hexdist[own] <= hexdist.min() + 1e-9


def test_hist_many_matches_per_column(lineitem, spark):
    """hist_many (one stacked scan) must equal per-column Plotter.hist
    for both shared explicit ranges and guessed ranges, in O(1) jobs."""
    p = Plotter(lineitem)
    cols = ["l_quantity", "l_discount", "l_extendedprice"]
    refs = {c: p.hist(c, bins=6) for c in cols}

    sc = spark.sparkContext
    # O(1) in the column count: same jobs for 1 column as for 3 (AQE
    # splits stages into jobs, so only the GROWTH is meaningful)
    sc.setJobGroup("hist-many-1", "hist-many-1")
    p.hist_many(cols[:1], bins=6)
    j1 = len(sc.statusTracker().getJobIdsForGroup("hist-many-1"))
    sc.setJobGroup("hist-many-3", "hist-many-3")
    got = p.hist_many(cols, bins=6)
    j3 = len(sc.statusTracker().getJobIdsForGroup("hist-many-3"))
    sc.setJobGroup("", "")
    assert j3 <= j1, f"hist_many jobs grew with columns: {j1} -> {j3}"
    for c in cols:
        np.testing.assert_array_equal(got[c].counts, refs[c].counts)
        np.testing.assert_allclose(got[c].edges, refs[c].edges)


def test_pairgrid_diag_uses_single_pass(lineitem):
    g = PairGrid(lineitem, ["l_quantity", "l_discount"], bins=5)
    diag = g.map_diag()
    ref_q = Plotter(lineitem).hist("l_quantity", bins=5, range=g._ranges["l_quantity"])
    np.testing.assert_array_equal(diag["l_quantity"].counts, ref_q.counts)
    assert set(diag) == {"l_quantity", "l_discount"}


# ----------------------------------------------------------- themes/colors
def test_color_conversion():
    from ezdata_spark.functions.themes import hex_to_rgb, normed_rgb, rgb

    assert rgb("#FFFFFF") == (255, 255, 255)
    assert rgb("plum") == (221, 160, 221)
    assert rgb((10, 20, 30)) == (10, 20, 30)  # idempotent
    assert hex_to_rgb("4682B4") == (70, 130, 180)
    assert normed_rgb("black") == (0.0, 0.0, 0.0)
    with pytest.raises(ValueError, match="Unknown color"):
        rgb("notacolorname")
    with pytest.raises(ValueError, match="Invalid RGB"):
        rgb((300, 0, 0))
    with pytest.raises(TypeError):
        rgb(12)


def test_theme_dicts_and_font_scaling():
    from ezdata_spark.functions.themes import (
        LIGHT_MINIMAL,
        font_pt,
        plotly_layout,
    )

    assert LIGHT_MINIMAL["axes.spines.top"] is False
    assert font_pt("x-large", "12pt") == 17  # 12 * 1.44
    assert font_pt(None, "14pt") == 14
    lay = plotly_layout(font_size="12pt")
    # same visual contract as the mpl theme: outward ticks, gray chrome,
    # label/title sizes derived through the same scaling table
    assert lay["xaxis"]["ticks"] == "outside"
    assert lay["xaxis"]["linecolor"] == LIGHT_MINIMAL["axes.edgecolor"]
    assert lay["title"]["font"]["size"] == font_pt("x-large", "12pt")
    assert lay["xaxis"]["tickfont"]["size"] == font_pt("small", "12pt")


def test_bokeh_theme_dict():
    from ezdata_spark.functions.themes import LIGHT_MINIMAL, bokeh_theme, font_pt

    t = bokeh_theme(font_size="12pt")
    attrs = t["attrs"]
    # same chrome contract as the reference bokeh theme
    # (bokeh/light_minimal_theme.py:35-116): gray axis lines, black
    # labels, sizes through the same scaling table, no outline
    assert attrs["Figure"]["outline_line_color"] is None
    assert attrs["Axis"]["axis_line_color"] == LIGHT_MINIMAL["axes.edgecolor"]
    assert attrs["Axis"]["axis_label_text_font_size"] == f"{font_pt('large', '12pt')}pt"
    assert attrs["Axis"]["major_label_text_font_size"] == f"{font_pt('small', '12pt')}pt"
    assert attrs["Title"]["text_font_size"] == f"{font_pt('x-large', '12pt')}pt"
    assert attrs["Legend"]["background_fill_alpha"] == 0.25
    assert attrs["ColorBar"]["major_tick_out"] == 8
    # plain dict template: no bokeh import required anywhere
    assert bokeh_theme(font_size="10pt")["attrs"]["Axis"][
        "major_label_text_font_size"
    ] == f"{font_pt('small', '10pt')}pt"


def test_render_helpers_gated_without_mpl():
    try:
        import matplotlib  # noqa: F401

        pytest.skip("matplotlib installed: gate not exercised")
    except ImportError:
        pass
    from ezdata_spark.functions.themes import (
        add_image_legend,
        apply_theme,
        generate_cmap_from_colors,
        label_subplots,
    )

    for fn in (apply_theme, label_subplots, add_image_legend):
        with pytest.raises(NotImplementedError, match="matplotlib"):
            fn()
    with pytest.raises(NotImplementedError, match="matplotlib"):
        generate_cmap_from_colors(["black", "white"])


# ------------------------------------------------------- plotly figure dicts
def test_plotly_figure_dicts(lineitem):
    """The plotly frontend is dict assembly over on-cluster aggregates:
    values in the figure must equal the Result's numpy values exactly."""
    from ezdata_spark.functions.figures import (
        combine_figures,
        hist_figure,
        raster_figure,
    )

    h = Plotter(lineitem).hist("l_quantity", bins=10, range=(0.0, 51.0))
    fh = hist_figure(h, title="qty")
    assert fh["data"][0]["type"] == "bar"
    assert fh["data"][0]["y"] == [float(v) for v in h.counts]
    assert fh["layout"]["title"]["text"] == "qty"

    g = Plotter(lineitem).hist2d(
        "l_quantity", "l_discount", bins=(6, 5), range=((0.0, 51.0), (0.0, 0.12))
    )
    fg = raster_figure(g)
    z = np.array(fg["data"][0]["z"])
    assert z.shape == (5, 6)  # heatmap rows are y
    assert np.array_equal(z, g.counts.T)
    assert fg["layout"]["xaxis"]["title"]["text"] == "l_quantity"

    flog = raster_figure(g, log=True)
    zl = flog["data"][0]["z"]
    nz = g.counts.T
    for yi in range(5):
        for xi in range(6):
            if nz[yi][xi] > 0:
                assert zl[yi][xi] == pytest.approx(np.log10(nz[yi][xi]))
            else:
                assert zl[yi][xi] is None
    assert flog["data"][0]["colorbar"]["tickvals"][0] == 0

    grid = combine_figures([fh, fg], cols=2)
    assert len(grid["data"]) == 2
    assert grid["data"][1]["xaxis"] == "x2"
    d1 = grid["layout"]["xaxis"]["domain"]
    d2 = grid["layout"]["xaxis2"]["domain"]
    assert d1[1] < d2[0]  # side by side, non-overlapping
    assert grid["layout"]["yaxis2"]["domain"] == grid["layout"]["yaxis"]["domain"]


def test_plotly_layout_helpers(lineitem):
    """Multi-raster combine with INDEPENDENT per-panel colorbars
    (reference plotly/tools.py:19-86 reposition/separate_colorbars,
    :206-300 annotation/axis copy — here over figure dicts)."""
    from ezdata_spark.functions.figures import (
        combine_figures,
        copy_axis,
        raster_figure,
        separate_colorbars,
        update_annotation_position,
    )

    p = Plotter(lineitem)
    g1 = p.hist2d("l_quantity", "l_discount", bins=(6, 5), range=((0.0, 51.0), (0.0, 0.12)))
    g2 = p.hist2d("l_quantity", "l_extendedprice", bins=(6, 4), range=((0.0, 51.0), (900.0, 105000.0)))
    grid = combine_figures([raster_figure(g1), raster_figure(g2)], cols=2)
    out = separate_colorbars(grid, xnorm=1.02)

    # each heatmap now references its own layout coloraxis
    cas = [tr["coloraxis"] for tr in out["data"]]
    assert cas == ["coloraxis", "coloraxis2"]
    assert all("colorscale" not in tr and "colorbar" not in tr for tr in out["data"])
    # and each colorbar sits just right of ITS subplot's x-domain
    for tr, ca in zip(out["data"], cas):
        xd = out["layout"][tr["xaxis"].replace("x", "xaxis", 1) if tr.get("xaxis") else "xaxis"]["domain"]
        cb = out["layout"][ca]["colorbar"]
        want_x = xd[0] + (xd[1] - xd[0]) * 1.02
        assert cb["x"] == pytest.approx(want_x, abs=1e-6)
        assert cb["y"] == pytest.approx(0.5, abs=1e-6)
    # the two bars are at different x positions (not stacked at the edge)
    xs = [out["layout"][ca]["colorbar"]["x"] for ca in cas]
    assert xs[0] < xs[1]

    # copy_axis drops placement keys, keeps styling
    frag = copy_axis(
        "xaxis3",
        {"title": {"text": "qty"}, "type": "log", "domain": [0, 0.5], "anchor": "y"},
    )
    assert frag == {"xaxis3": {"title": {"text": "qty"}, "type": "log"}}

    # paper-ref annotation rescales into the axis domain; data-ref
    # annotation retargets the numbered axis and keeps coordinates
    ann = update_annotation_position(
        out, "xaxis2", "yaxis2", {"x": 0.5, "y": 1.0, "xref": "paper", "yref": "paper", "text": "t"}
    )
    xd2 = out["layout"]["xaxis2"]["domain"]
    assert ann["x"] == pytest.approx(xd2[0] + (xd2[1] - xd2[0]) * 0.5, abs=1e-6)
    assert ann["y"] == pytest.approx(1.0, abs=1e-6)
    ann2 = update_annotation_position(
        out, "xaxis2", "yaxis2", {"x": 12.5, "y": 0.04, "xref": "x", "yref": "y", "text": "d"}
    )
    assert ann2["xref"] == "x2" and ann2["yref"] == "y2"
    assert ann2["x"] == 12.5 and ann2["y"] == 0.04


def test_plotly_box_figure(customer):
    from ezdata_spark.functions.figures import box_figure

    b = Plotter(customer).boxplot("c_mktsegment", "c_acctbal")
    fb = box_figure(b)
    assert len(fb["data"]) == len(b.keys)
    t0 = fb["data"][0]
    assert t0["type"] == "box"
    assert t0["median"] == [float(b.median[0])]
    assert t0["q1"] == [float(b.q1[0])] and t0["q3"] == [float(b.q3[0])]


def test_plotly_materializer_gated():
    from ezdata_spark.functions.figures import to_plotly_figure

    try:
        import plotly  # noqa: F401

        pytest.skip("plotly installed: gate not exercised")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="plotly"):
        to_plotly_figure({"data": [], "layout": {}})
