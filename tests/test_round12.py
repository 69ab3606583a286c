"""Round-12 regression tests.

Covers the round-11 ADVICE findings (all low):
- plans/audit.py physical_plan non-ASPE fallback leaving the
  '== Final Plan ==' header line in the returned text,
- LabelledGrid.sel raising a bare KeyError on unknown dims instead of
  isel's friendly message (and the reserved 'method' keyword),
- grid_from_binned misreporting a missing value column as non-numeric.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


# ------------------------------------------------- ADVICE #1: audit.py
def test_strip_section_headers_drops_final_plan_header():
    from ezdata_spark.plans.audit import _strip_section_headers

    txt = (
        "AdaptiveSparkPlan isFinalPlan=true\n"
        "== Final Plan ==\n"
        "*(1) HashAggregate(keys=[k], functions=[count(1)])\n"
        "+- ShuffleQueryStage 0\n"
    )
    out = _strip_section_headers(txt)
    assert "== Final Plan ==" not in out
    assert "HashAggregate" in out and "ShuffleQueryStage" in out
    # a node line that merely contains '==' in an expression is kept
    keep = "+- Filter (isnotnull(x) AND (x == 3))"
    assert _strip_section_headers(keep) == keep


# --------------------------------------------- ADVICE #2: LabelledGrid.sel
def _grid(spark):
    from ezdata_spark.operators.labelled import histogram_grid

    df = spark.createDataFrame(
        [(0.5, 1.5), (2.5, 0.5), (2.7, 3.5)], "x double, y double"
    )
    return histogram_grid(
        df, ["x", "y"], nbins=[4, 4], range=[(0.0, 4.0), (0.0, 4.0)]
    )


def test_sel_unknown_dim_friendly_error(spark):
    g = _grid(spark)
    with pytest.raises(KeyError, match=r"unknown dims \['z'\]"):
        g.sel(z=1.0)
    # the valid-dims hint names the real dims
    with pytest.raises(KeyError, match="x"):
        g.sel(nope=0.5)


def test_sel_valid_after_validation(spark):
    g = _grid(spark)
    s = g.sel(x=2.5)  # bin center of [2,3)
    assert s.dims == ("y",)
    assert np.array_equal(s.values, g.values[2, :])


# --------------------------------- ADVICE #3: grid_from_binned missing col
def test_grid_from_binned_missing_value_col_message(spark):
    from ezdata_spark.operators.binned import BinSpec, binned_agg
    from ezdata_spark.operators.labelled import grid_from_binned

    df = spark.createDataFrame([(0.5,), (2.5,)], "x double")
    specs = [BinSpec("x", 0.0, 4.0, 4)]
    out = binned_agg(df, specs, {"count": F.count(F.lit(1))}, densify=True)
    with pytest.raises(ValueError, match="value columns not in frame"):
        grid_from_binned(out, specs, value_cols=["cnt_typo"])
