"""Property tests for the native binary-table codecs at the numpy level
(no Spark session — fast): random compound schemas must round-trip
through the HDF5 datatype encoder/parser, and random record batches
through the FITS record layout."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

_SCALARS = ["<i2", "<i4", "<i8", "<u1", "<f4", "<f8", "S3", "S8"]


@st.composite
def compound_dtypes(draw):
    n = draw(st.integers(1, 6))
    fields = []
    for i in range(n):
        code = draw(st.sampled_from(_SCALARS))
        if draw(st.booleans()) and not code.startswith("S"):
            fields.append((f"c{i}", code, (draw(st.integers(1, 4)),)))
        else:
            fields.append((f"c{i}", code))
    return np.dtype(fields)


@settings(max_examples=60, deadline=None)
@given(dt=compound_dtypes())
def test_hdf5_compound_datatype_roundtrip(dt):
    from ezdata_spark.sources.hdf5_native import _dt_compound, _parse_datatype

    body = _dt_compound(dt)
    parsed, used = _parse_datatype(body, 0)
    assert used == len(body)
    assert parsed.itemsize == dt.itemsize
    assert parsed.names == dt.names
    for n in dt.names:
        assert parsed[n] == dt[n], (n, parsed[n], dt[n])
        assert parsed.fields[n][1] == dt.fields[n][1]  # member offsets


@settings(max_examples=30, deadline=None)
@given(
    n=st.integers(0, 40),
    seed=st.integers(0, 2**31 - 1),
)
def test_fits_record_layout_roundtrip(n, seed, tmp_path_factory):
    """write_fits' record encoding <-> _decode_chunk at the numpy level:
    big-endian fixed-width records survive a disk round trip exactly."""
    from ezdata_spark.sources.fits_native import (
        _decode_chunk,
        _record_dtype,
        fits_table_meta,
    )

    rng = np.random.RandomState(seed)
    columns = [("a", "K"), ("x", "D"), ("s", "5A"), ("v", "3E")]
    rec = np.zeros(n, dtype=_record_dtype(columns))
    rec["a"] = rng.randint(-(2**40), 2**40, size=n)
    rec["x"] = rng.standard_normal(n)
    rec["s"] = [f"r{i}".encode() for i in range(n)]
    rec["v"] = rng.standard_normal((n, 3)).astype(">f4")

    # minimal single-HDU file via the public writer path pieces
    from ezdata_spark.sources.fits_native import BLOCK, _card

    cards = [
        _card("SIMPLE", True), _card("BITPIX", 8), _card("NAXIS", 0),
        _card("EXTEND", True), _card("END", None),
    ]
    primary = b"".join(cards)
    primary += b" " * (-len(primary) % BLOCK)
    tbl = [
        _card("XTENSION", "BINTABLE"), _card("BITPIX", 8), _card("NAXIS", 2),
        _card("NAXIS1", rec.dtype.itemsize), _card("NAXIS2", n),
        _card("PCOUNT", 0), _card("GCOUNT", 1), _card("TFIELDS", 4),
    ]
    for i, (name, tform) in enumerate(columns, start=1):
        tbl += [_card(f"TTYPE{i}", name), _card(f"TFORM{i}", tform)]
    tbl.append(_card("END", None))
    hdr = b"".join(tbl)
    hdr += b" " * (-len(hdr) % BLOCK)
    payload = rec.tobytes()
    payload += b"\x00" * (-len(payload) % BLOCK)

    d = tmp_path_factory.mktemp("fitsprop")
    p = str(d / "t.fits")
    with open(p, "wb") as f:
        f.write(primary + hdr + payload)

    meta = fits_table_meta(p)
    assert meta["nrows"] == n and meta["row_bytes"] == rec.dtype.itemsize
    pdf = _decode_chunk(p, 1, 0, n)
    assert np.array_equal(pdf["a"].to_numpy(), rec["a"])
    assert np.array_equal(pdf["x"].to_numpy(), rec["x"].astype("<f8"))
    assert list(pdf["s"]) == [f"r{i}" for i in range(n)]
    for i in range(n):
        assert np.array_equal(pdf["v"].iloc[i], rec["v"][i].astype("<f4"))


# ----------------------------------------------------------- Spark-level HDF5
# UTF-8 incl. multi-byte and the empty string; widths force both the
# S-width math (bytes, not chars) and the 0-row decode guard
_LABELS = st.text(alphabet=list("ab·π🚀"), min_size=0, max_size=6)


@settings(max_examples=8, deadline=None)
@given(data=st.data())
def test_hdf5_spark_roundtrip_edge_dtypes(spark, data):
    """Spark-level write_hdf5 -> scan_hdf5 round trip over the writer's
    documented policy surface: utf8 strings (empty / multi-byte / null ->
    ''), null-heavy booleans (-> False) and doubles (-> NaN), vector
    columns, and int64 values past 2^53 (exact — never a float detour).
    The writer targets libhdf5's 'earliest' layout; with no h5py in the
    container this pins the codec against its own parser over the edge
    dtypes most likely to ship malformed."""
    import math
    import tempfile

    n = data.draw(st.integers(0, 12))
    rows = []
    for i in range(n):
        rows.append(
            (
                data.draw(st.integers(-(2**62), 2**62)),  # well past 2^53
                data.draw(st.one_of(st.none(), _LABELS)),
                data.draw(st.one_of(st.none(), st.booleans())),
                data.draw(
                    st.one_of(
                        st.none(),
                        st.floats(allow_nan=False, allow_infinity=True, width=64),
                    )
                ),
                [float(data.draw(st.integers(-5, 5))) for _ in range(3)],
            )
        )
    from ezdata_spark.sources.hdf5_native import scan_hdf5, write_hdf5
    from ezdata_spark.table import EzTable

    df = spark.createDataFrame(
        rows, "k long, label string, flag boolean, x double, vec array<double>"
    )
    with tempfile.TemporaryDirectory() as d:
        p = f"{d}/edge.h5"
        write_hdf5(EzTable(df), p)
        back = scan_hdf5(spark, p, "data").df.orderBy("k").collect()
    want = sorted(rows, key=lambda r: r[0])
    assert len(back) == n
    for got, w in zip(back, want):
        assert got.k == w[0]
        assert got.label == (w[1] or "")  # policy: string null -> ''
        assert got.flag == int(bool(w[2]))  # policy: bool -> u1, null -> 0
        if w[3] is None or math.isnan(w[3]):
            # null -> NaN on write; Arrow reads NaN back as null — the
            # format conflates them (documented policy)
            assert got.x is None or math.isnan(got.x)
        else:
            assert got.x == w[3]
        assert list(got.vec) == w[4]


def test_hdf5_corrupt_files_error_clearly(tmp_path):
    """Malformed inputs fail with a clear error, never garbage data:
    wrong signature, truncated superblock, truncated object header."""
    import pytest

    from ezdata_spark.sources.hdf5_native import hdf5_table_meta

    bad_sig = tmp_path / "sig.h5"
    bad_sig.write_bytes(b"NOTHDF5!" + b"\x00" * 100)
    with pytest.raises(ValueError, match="not an HDF5 file"):
        hdf5_table_meta(str(bad_sig), "data")

    trunc = tmp_path / "trunc.h5"
    trunc.write_bytes(b"\x89HDF\r\n\x1a\n" + b"\x00" * 8)  # signature only
    with pytest.raises(Exception):
        hdf5_table_meta(str(trunc), "data")


def test_hdf5_truncated_valid_file_errors(tmp_path, spark):
    """A valid file cut mid-payload errors on read rather than decoding
    short rows silently."""
    import pytest

    from ezdata_spark.sources.hdf5_native import (
        hdf5_table_meta,
        read_h5_rows,
        write_hdf5,
    )
    from ezdata_spark.table import EzTable

    df = spark.range(0, 50).selectExpr("id AS k", "CAST(id * 2.0 AS DOUBLE) AS x")
    p = str(tmp_path / "full.h5")
    write_hdf5(EzTable(df), p)
    blob = open(p, "rb").read()
    cut = str(tmp_path / "cut.h5")
    open(cut, "wb").write(blob[: len(blob) - 200])
    meta = hdf5_table_meta(cut, "data")  # header region intact
    with pytest.raises(Exception):
        pdf = read_h5_rows(cut, "data", 0, meta["nrows"])
        assert len(pdf) == meta["nrows"]  # must not return short frames
