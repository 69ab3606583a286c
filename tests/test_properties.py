"""Property-based tests (SURVEY.md §5): join / groupby / stack checked
against pandas on small random frames — substituting for the reference's
missing test suite. Frames stay tiny (Spark round-trip per example is
the cost), so we bound example counts and sizes."""

import math

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ezdata_spark.table import EzTable

KEYS = st.integers(min_value=0, max_value=4)
VALS = st.one_of(
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.integers(min_value=-1000, max_value=1000).map(float),
)

frames = st.lists(st.tuples(KEYS, VALS), min_size=1, max_size=12)

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def _to_spark(spark, rows, cols):
    return spark.createDataFrame(pd.DataFrame(rows, columns=cols))


@given(left=frames, right=frames)
@SETTINGS
def test_left_join_matches_pandas(spark, left, right):
    ldf = pd.DataFrame(left, columns=["k", "a"])
    # unique right keys (the reference's duplicate-key behavior is
    # last-match-wins, documented as divergence; dedupe to compare)
    rdf = pd.DataFrame(right, columns=["k", "b"]).drop_duplicates("k")
    expected = ldf.merge(rdf, on="k", how="left")

    got = (
        EzTable(_to_spark(spark, left, ["k", "a"]))
        .join(EzTable(_to_spark(spark, rdf.values.tolist(), ["k", "b"])), on="k", how="left")
        .df.toPandas()
    )
    assert len(got) == len(expected)
    key = lambda df: sorted(
        (int(r.k), round(float(r.a), 4), None if pd.isna(r.b) else round(float(r.b), 4))
        for r in df.itertuples()
    )
    assert key(got) == key(expected)


@given(rows=frames)
@SETTINGS
def test_groupby_sum_matches_pandas(spark, rows):
    pdf = pd.DataFrame(rows, columns=["k", "v"])
    expected = pdf.groupby("k")["v"].agg(["sum", "count"]).reset_index()

    got = (
        EzTable(_to_spark(spark, rows, ["k", "v"]))
        .aggregate({"s": "sum(v)", "n": "count(v)"}, ["k"])
        .df.toPandas()
        .sort_values("k")
    )
    assert list(got["k"]) == list(expected["k"])
    assert list(got["n"]) == list(expected["count"])
    for g, e in zip(got["s"], expected["sum"]):
        assert math.isclose(g, e, rel_tol=1e-6, abs_tol=1e-6)


@given(a=frames, b=frames)
@SETTINGS
def test_stack_is_concat(spark, a, b):
    ta = EzTable(_to_spark(spark, a, ["k", "v"]))
    tb = EzTable(_to_spark(spark, b, ["k", "v"]))
    got = ta.stack(tb).df.count()
    assert got == len(a) + len(b)


@given(rows=frames, lo=st.integers(-2, 2), hi=st.integers(3, 6))
@SETTINGS
def test_where_partition(spark, rows, lo, hi):
    """where(cond) + where(~cond) partition the frame."""
    t = EzTable(_to_spark(spark, rows, ["k", "v"]))
    cond = f"(k >= {lo}) & (k < {hi})"
    n_in = t.where(cond).df.count()
    n_out = t.where(f"~({cond})").df.count()
    assert n_in + n_out == len(rows)
