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


# ---------------------------------------------------------------------
# corpus curation ops vs plain-Python references
# ---------------------------------------------------------------------
WORDS = st.lists(
    st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"]), min_size=0, max_size=12
)


@given(docs=st.lists(WORDS, min_size=1, max_size=6), n=st.integers(2, 4))
@SETTINGS
def test_word_ngrams_matches_python(spark, docs, n):
    from ezdata_spark.operators.corpus import word_ngrams

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: list(r.ng)
        for r in df.select("doc_id", word_ngrams("text", n).alias("ng")).collect()
    }
    for i, ws in enumerate(docs):
        expected = [
            " ".join(ws[j : j + n]) for j in range(len(ws) - n + 1)
        ] if len(ws) >= n else []
        assert got[i] == expected


@given(
    ids=st.lists(st.integers(0, 10**6), min_size=1, max_size=20, unique=True),
    keys=st.lists(st.sampled_from(["s0", "s1", "s2"]), min_size=20, max_size=20),
    cap=st.integers(1, 5),
)
@SETTINGS
def test_cap_per_key_properties(spark, ids, keys, cap):
    from ezdata_spark.operators.corpus import cap_per_key

    rows = [(i, k) for i, k in zip(ids, keys)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = cap_per_key(df, "source", cap).collect()
    # kept rows are a subset; per-key counts == min(cap, full count)
    assert {(r.doc_id, r.source) for r in out} <= set(rows)
    full: dict = {}
    for _, k in rows:
        full[k] = full.get(k, 0) + 1
    got: dict = {}
    for r in out:
        got[r.source] = got.get(r.source, 0) + 1
    assert got == {k: min(cap, v) for k, v in full.items()}


@given(ids=st.lists(st.integers(0, 10**9), min_size=1, max_size=25, unique=True))
@SETTINGS
def test_split_by_hash_matches_python(spark, ids):
    """The split is the documented pure function of the id — verify
    against a direct Python evaluation of the same arithmetic."""
    from ezdata_spark.operators.corpus import split_by_hash

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    got = {r.doc_id: r.split for r in split_by_hash(df, fractions=fr).collect()}

    def py_split(i):
        b = (i * 2654435761) % 4294967296 % 10000
        if b < 8000:
            return "train"
        if b < 9000:
            return "val"
        return "test"

    assert got == {i: py_split(i) for i in ids}


# ---------------------------------------------------------------------
# round 6: interpolation vs pandas, skyline vs brute force
# ---------------------------------------------------------------------

_interp_series = st.lists(
    st.one_of(st.none(), st.integers(min_value=-50, max_value=50).map(float)),
    min_size=1,
    max_size=14,
)


@given(series=_interp_series)
@SETTINGS
def test_interpolate_linear_matches_pandas(spark, series):
    """interpolate_linear == pandas Series.interpolate(method='index',
    limit_area='inside') on an evenly spaced per-key series with
    arbitrary NULL gaps (incl. all-null and leading/trailing gaps)."""
    from pyspark.sql import functions as F

    from ezdata_spark.operators.timeseries import interpolate_linear

    rows = [("k", i * 60, v) for i, v in enumerate(series)]
    df = spark.createDataFrame(rows, "key string, s long, v double").select(
        "key", F.timestamp_seconds("s").alias("bucket"), "v"
    )
    out = interpolate_linear(df, "v", ts_col="bucket", keys=["key"], out_col="f")
    got = [r.f for r in out.orderBy("bucket").collect()]

    exp = (
        pd.Series(series, index=[i * 60 for i in range(len(series))], dtype="float64")
        .interpolate(method="index", limit_area="inside")
        .tolist()
    )
    assert len(got) == len(exp)
    for g, e in zip(got, exp):
        if e is None or (isinstance(e, float) and math.isnan(e)):
            assert g is None
        else:
            assert g == pytest.approx(e, rel=1e-9)


_sky_pts = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=8), st.integers(min_value=0, max_value=8)
    ),
    min_size=1,
    max_size=25,
)


@given(pts=_sky_pts)
@SETTINGS
def test_skyline_matches_brute_force(spark, pts):
    """Distributed skyline == O(n^2) dominance scan under duplicates
    and heavy ties (small integer grid forces both)."""
    from ezdata_spark.operators.skyline import skyline

    rows = [(i, float(x), float(y)) for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows, "id long, x double, y double").repartition(3)
    got = {r.id for r in skyline(df, {"x": "max", "y": "max"}).collect()}
    expect = {
        i
        for i, x, y in rows
        if not any(
            qx >= x and qy >= y and (qx > x or qy > y) for _, qx, qy in rows
        )
    }
    assert got == expect
