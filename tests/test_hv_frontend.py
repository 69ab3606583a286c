"""Holoviews-frontend parity (hvplotter.py:56-341): rasters and corner
composition must be value-identical to the underlying on-cluster
aggregates, quantile annotations must match numpy truth, and the
reduction vocabulary must map to the right Spark aggregates."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from ezdata_spark.functions.hv_frontend import (
    HvPlotter,
    imshow_hv_map,
    parse_reduction,
    sigma_levels,
)
from ezdata_spark.plotting import Plotter
from ezdata_spark.table import EzTable


@pytest.fixture(scope="module")
def lineitem(spark, sf_dir):
    return EzTable.read_parquet(spark, f"{sf_dir}/lineitem.parquet")


def test_scatter_matches_hist2d(lineitem):
    hv = HvPlotter(lineitem).scatter(
        "l_quantity", "l_extendedprice", x_range=(0, 51), y_range=(0, 60000), shape=16
    )
    base = Plotter(lineitem).hist2d(
        "l_quantity", "l_extendedprice", bins=16, range=((0, 51), (0, 60000))
    )
    assert np.array_equal(hv.counts, base.counts)
    assert np.array_equal(hv.x_edges, base.x_edges)


def test_scatter_auto_range_matches_minmax(lineitem):
    hv = HvPlotter(lineitem).scatter("l_quantity", "l_discount", shape=8)
    row = lineitem.df.agg(
        F.min("l_quantity"), F.max("l_quantity"), F.min("l_discount"), F.max("l_discount")
    ).collect()[0]
    assert hv.x_edges[0] == pytest.approx(row[0])
    # guess_range pads the top edge so the max lands inside the last bin
    assert hv.x_edges[-1] >= row[1]
    assert hv.y_edges[0] == pytest.approx(row[2])
    assert hv.counts.sum() == lineitem.df.count()


def test_scatter_half_pinned_range(lineitem):
    hv = HvPlotter(lineitem).scatter(
        "l_quantity", "l_discount", x_range=(0, 51), shape=8
    )
    assert hv.x_edges[0] == 0 and hv.x_edges[-1] == 51
    assert hv.counts.sum() == lineitem.df.filter(
        (F.col("l_quantity") >= 0) & (F.col("l_quantity") <= 51)
    ).count()


def test_plot_and_line_are_raster_aliases(lineitem):
    assert HvPlotter.plot is HvPlotter.scatter
    assert HvPlotter.line is HvPlotter.scatter


def test_logcount_reduction(lineitem):
    rng = ((0, 51), (0, 60000))
    hv = HvPlotter(lineitem).scatter(
        "l_quantity", "l_extendedprice",
        x_range=rng[0], y_range=rng[1], shape=8, what="logcount",
    )
    base = Plotter(lineitem).hist2d(
        "l_quantity", "l_extendedprice", bins=8, range=rng
    )
    with np.errstate(divide="ignore"):
        expect = np.log10(base.counts)
    assert np.array_equal(hv.counts, expect)


def test_mean_reduction(lineitem):
    rng = ((0, 51), (0, 1.1))
    hv = HvPlotter(lineitem).scatter(
        "l_quantity", "l_discount",
        x_range=rng[0], y_range=rng[1], shape=4, what="mean:l_extendedprice",
    )
    base = Plotter(lineitem).hist2d(
        "l_quantity", "l_discount", bins=4, range=rng,
        reduction=F.avg("l_extendedprice"),
    )
    assert np.allclose(hv.counts, base.counts, equal_nan=True)


def test_parse_reduction_vocabulary():
    assert parse_reduction(None) == (None, False)
    assert parse_reduction("count") == (None, False)
    assert parse_reduction("logcount") == (None, True)
    col, log = parse_reduction("sum:x")
    assert col is not None and not log
    passthrough = F.max("y")
    assert parse_reduction(passthrough) == (passthrough, False)
    with pytest.raises(ValueError, match="unknown datashader reduction"):
        parse_reduction("median:x")


def test_corner_quantiles_match_numpy(lineitem):
    keys = ["l_quantity", "l_discount"]
    c = HvPlotter(lineitem).corner(keys, shape=8, labels=["Q", "D"])
    pdf = lineitem.df.select(*keys).toPandas()
    for k in keys:
        q = np.quantile(pdf[k].to_numpy(), [0.16, 0.5, 0.84])
        assert np.allclose(c.quantiles[k], q, rtol=1e-9)
    assert set(c.diag) == set(keys)
    assert set(c.lower) == {("l_quantity", "l_discount")}
    # reference title format: label = $median_{-dm}^{+dp}$
    q16, q50, q84 = c.quantiles["l_quantity"]
    assert c.titles["l_quantity"] == (
        f"Q = ${q50:.2f}_{{-{q50 - q16:.2f}}}^{{+{q84 - q50:.2f}}}$"
    )


def test_sigma_levels_formula():
    lv = sigma_levels()
    expect = 1.0 - np.exp(-0.5 * np.arange(0.5, 2.1, 0.5) ** 2)
    assert np.allclose(lv, expect)


def test_imshow_hv_map_masks_below(lineitem):
    pytest.importorskip("matplotlib")
    import matplotlib

    matplotlib.use("Agg")
    hv = HvPlotter(lineitem).scatter(
        "l_quantity", "l_discount", x_range=(0, 51), y_range=(0, 1.1), shape=8
    )
    im = imshow_hv_map(hv, alpha_below=0.0)
    data = im.get_array()
    assert bool(data.mask.any()) == bool((hv.counts.T <= 0).any())
