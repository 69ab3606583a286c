"""I/O breadth: ECSV, commented-header CSV, parquet metadata
round-trip, chunked binary-table ingest (SURVEY.md §2.1, §7 phase 7)."""

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ezdata_spark.sources.binary_tables import (
    from_dict,
    from_records,
    ingest_chunked,
    read_fits,
    read_hdf5,
)
from ezdata_spark.sources.csv_meta import read_csv, write_csv
from ezdata_spark.sources.ecsv import read_ecsv, write_ecsv
from ezdata_spark.sources.parquet_meta import read_parquet, write_parquet
from ezdata_spark.table import EzTable


@pytest.fixture()
def meta_table(spark):
    t = from_dict(
        spark,
        {"ra": [10.0, 20.0, 30.5], "dec": [-5.0, 0.0, 5.5], "mag": [12.1, 13.2, 14.3]},
        header={"SURVEY": "demo", "EPOCH": "J2000"},
        units={"ra": "deg", "dec": "deg"},
        desc={"mag": "G-band magnitude"},
        aliases={"RAdeg": "ra"},
    )
    return t


def test_ecsv_roundtrip(spark, meta_table, tmp_path):
    path = str(tmp_path / "t.ecsv")
    write_ecsv(meta_table, path)
    back = read_ecsv(spark, path)
    assert back.df.count() == 3
    assert back.unit("ra") == "deg"
    assert back.comment("mag") == "G-band magnitude"
    assert back.header.get("SURVEY") == "demo"
    got = sorted(r["ra"] for r in back.df.collect())
    assert got == [10.0, 20.0, 30.5]
    # declared (not inferred) schema
    assert dict(back.df.dtypes)["ra"] == "double"


def test_ecsv_vector_column(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0]), (2, [4.0, 5.0, 6.0])], "id long, vec array<float>"
    )
    path = str(tmp_path / "vec.ecsv")
    write_ecsv(EzTable(df), path)
    # header declares the subtype convention (ezdata/ecsv.py:63-77)
    head = open(path).read()
    assert "%ECSV" in head and "subtype" in head
    back = read_ecsv(spark, path)
    row = back.df.orderBy("id").collect()[0]
    assert list(row["vec"]) == [1.0, 2.0, 3.0]
    assert isinstance(back.df.schema["vec"].dataType, T.ArrayType)


def test_csv_meta_roundtrip(spark, meta_table, tmp_path):
    path = str(tmp_path / "t.csv")
    write_csv(meta_table, path, single_file=True)
    text = open(path).read()
    assert text.startswith("#")  # commented header block
    assert "## ra\tdeg" in text
    back = read_csv(spark, path)
    assert back.df.count() == 3
    assert back.unit("ra") == "deg"
    assert back.header.get("SURVEY") == "demo"
    assert back.resolve_alias("RAdeg") == "ra" if hasattr(back, "resolve_alias") else True
    got = sorted(r["mag"] for r in back.df.collect())
    assert got == [12.1, 13.2, 14.3]


def test_csv_meta_sidecar_layout(spark, meta_table, tmp_path):
    path = str(tmp_path / "parts")
    write_csv(meta_table, path, single_file=False)
    import os

    assert os.path.exists(os.path.join(path, "_header"))


def test_parquet_meta_roundtrip(spark, meta_table, tmp_path):
    path = str(tmp_path / "t.parquet")
    write_parquet(meta_table, path)
    back = read_parquet(spark, path)
    assert back.df.count() == 3
    assert back.unit("ra") == "deg"
    assert back.unit("dec") == "deg"
    assert back.comment("mag") == "G-band magnitude"
    assert back.header == {"SURVEY": "demo", "EPOCH": "J2000"}
    assert back._aliases == {"RAdeg": "ra"}


def test_ingest_chunked_plumbing(spark):
    """Chunked (file, start, stop) ingest with a synthetic decoder —
    the dask/hdf5.py:199-283 pattern scheduled by Spark."""
    import pandas as pd

    def count_rows(path):
        return 25

    def read_chunk(path, start, stop):
        return pd.DataFrame({"x": np.arange(start, stop), "f": [path] * (stop - start)})

    out = ingest_chunked(
        spark,
        ["fileA", "fileB"],
        "x long, f string",
        count_rows,
        read_chunk,
        chunk_rows=10,
    )
    # 2 files * ceil(25/10)=3 chunks -> 6 tasks, full parallelism
    assert out.rdd.getNumPartitions() == 6
    rows = out.collect()
    assert len(rows) == 50
    per_file = out.groupBy("f").agg(F.sum("x").alias("s")).collect()
    assert all(r["s"] == sum(range(25)) for r in per_file)


def test_hdf5_fits_import_gated(spark):
    # neither read_hdf5 nor read_fits gates anymore: without h5py/astropy
    # they fall back to the native scanners, which fail on the missing
    # file rather than on a missing dependency
    try:
        read_hdf5(spark, ["f"], dataset="d", schema="x long")
    except (FileNotFoundError, ValueError):
        pass
    try:
        read_fits(spark, ["f"])
    except (FileNotFoundError, ValueError):
        pass


def test_from_records(spark):
    t = from_records(spark, [{"a": 1, "b": "x"}, {"a": 2, "b": "y"}])
    assert t.df.count() == 2
    assert set(t.colnames) == {"a", "b"}


def test_votable_gated_and_latex(spark, meta_table):
    from ezdata_spark.sources.binary_tables import read_votable, to_latex

    try:
        read_votable(spark, "/nonexistent.vot")
    except NotImplementedError:
        pass
    except Exception:
        pass  # astropy present: file-not-found path instead
    tex = to_latex(meta_table, n=2)
    assert tex.startswith("\\begin{table}")
    assert "ra & dec & mag" in tex


def test_latex_sink_golden(spark, tmp_path):
    """Golden string: the full _latex_writeto structure (simpletable.py:
    792-844) — caption, c-aligned tabular, escaped underscores, notes
    block from column descriptions — plus the file sink."""
    from ezdata_spark.sources.binary_tables import to_latex, write_latex
    from ezdata_spark.table import EzTable

    df = spark.createDataFrame(
        [(1, 10.5, "x_a"), (2, 20.0, "y")], "row_id int, m_val double, tag string"
    )
    t = EzTable(df, desc={"m_val": "a measure"})
    got = to_latex(t.sort("row_id"), n=2, name="my_cat")
    # EzTable.sort returns a new table; descriptions ride along
    want = "\n".join(
        [
            "\\begin{table}",
            "\\begin{center}",
            "\\caption{my\\_cat}",
            "\\begin{tabular}{ccc}",
            "row\\_id & m\\_val & tag \\\\",
            "\\hline",
            "1 & 10.5 & x\\_a \\\\",
            "2 & 20.0 & y \\\\",
            "\\end{tabular}",
            "\\end{center}",
            "% notes",
            "\\begin{scriptsize}",
            "0 m\\_val: a measure \\\\",
            "\\end{scriptsize}",
            "\\end{table}",
            "",
        ]
    )
    assert got == want
    p = str(tmp_path / "t.tex")
    write_latex(t.sort("row_id"), p, n=2, name="my_cat")
    assert open(p).read() == want
    # no descriptions -> no notes block; no name -> no caption
    bare = to_latex(EzTable(df).sort("row_id"), n=1)
    assert "caption" not in bare and "notes" not in bare


def test_partitioned_write_prunes(spark, tmp_path):
    """Partitioned parquet layout -> partition pruning reaches the scan
    (the 100 TB read-path discipline: a filtered read must touch only
    its partitions)."""
    df = spark.range(1000).selectExpr("id", "id % 7 AS cell", "id * 2.0 AS v")
    path = str(tmp_path / "bycell")
    df.write.mode("overwrite").partitionBy("cell").parquet(path)

    back = spark.read.parquet(path).filter("cell = 3")
    assert back.count() == len([i for i in range(1000) if i % 7 == 3])
    plan = back._jdf.queryExecution().executedPlan().toString()
    # pruned to a single hive-style partition directory
    assert "PartitionFilters" in plan and "cell" in plan


def test_parquet_meta_partitioned_by_first_column(spark, tmp_path):
    """Table-level metadata must survive partitioning by the first
    schema column (the metadata carrier skips partition columns)."""
    t = from_dict(
        spark,
        {"cell": [1, 1, 2], "flux": [0.1, 0.2, 0.3]},
        header={"NAME": "survey"},
        units={"cell": "healpix", "flux": "mJy"},
        aliases={"f": "flux"},
    )
    path = str(tmp_path / "bycell.parquet")
    write_parquet(t, path, partition_by=["cell"])
    back = read_parquet(spark, path)
    assert back.header == {"NAME": "survey"}
    assert back._aliases == {"f": "flux"}
    assert back.unit("flux") == "mJy"
    assert back.unit("cell") == "healpix"  # partition column meta restored
    assert back.df.count() == 3


def test_csv_meta_directory_roundtrip(spark, meta_table, tmp_path):
    """Default (scalable) layout: part files + _header sidecar must
    round-trip through read_csv."""
    path = str(tmp_path / "parts_rt")
    write_csv(meta_table, path, single_file=False)
    back = read_csv(spark, path)
    assert back.df.count() == 3
    assert back.unit("ra") == "deg"
    assert back.header.get("SURVEY") == "demo"
    assert set(back.colnames) == {"ra", "dec", "mag"}


def test_bucketed_join_no_shuffle(spark, sf_dir):
    """Two tables bucketed on the join key must join with NO Exchange
    in the physical plan (the co-located-join discipline for
    large-large joins at scale)."""
    from ezdata_spark.sources.bucketed import is_shuffle_free_join, write_bucketed

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_orderkey", "l_quantity")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select("o_orderkey", "o_totalprice")
    write_bucketed(li, "ez_li_bucketed", "l_orderkey", n_buckets=8)
    write_bucketed(
        orders.withColumnRenamed("o_orderkey", "l_orderkey"),
        "ez_ord_bucketed",
        "l_orderkey",
        n_buckets=8,
    )
    a = spark.table("ez_li_bucketed")
    b = spark.table("ez_ord_bucketed")
    # disable broadcast so the plan must pick a shuffle-or-colocated join
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, "l_orderkey")
        assert is_shuffle_free_join(joined)
        assert joined.count() == li.join(
            orders, li.l_orderkey == orders.o_orderkey
        ).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS ez_li_bucketed")
        spark.sql("DROP TABLE IF EXISTS ez_ord_bucketed")


def test_ecsv_hash_prefixed_value(spark, tmp_path):
    """String values starting with '#' must survive the round-trip
    (quoted on write so the comment option cannot eat them)."""
    df = spark.createDataFrame([("#note", 1), ("plain", 2)], "tag string, v long")
    path = str(tmp_path / "hash.ecsv")
    write_ecsv(EzTable(df), path)
    back = read_ecsv(spark, path)
    assert back.df.count() == 2
    assert {r["tag"] for r in back.df.collect()} == {"#note", "plain"}


def test_to_latex_sink(spark):
    """LaTeX tabular sink (simpletable.py:792-844): header + escaped
    underscores + one line per row, capped at n."""
    from ezdata_spark.sources.binary_tables import to_latex

    t = EzTable(
        spark.createDataFrame([(1, "a_b"), (2, "c"), (3, "d")], "col_id int, name string")
    )
    tex = to_latex(t, n=2)
    lines = tex.splitlines()
    assert lines[0] == "\\begin{table}"
    assert lines[2] == "\\begin{tabular}{cc}"
    assert lines[3] == "col\\_id & name \\\\"
    assert lines[4] == "\\hline"
    assert "a\\_b" in lines[5]
    assert lines[-1] == "\\end{table}"
    # n=2 cap: wrapper(2) + header(3) + 2 rows + tabular/center/table ends
    assert len(lines) == 10


def test_jsonl_roundtrip_and_corrupt_capture(spark, tmp_path):
    """JSONL ingest: explicit schema, corrupt-line quarantine, gzip
    round-trip (the sharded-corpus layout)."""
    import gzip
    import json as jsonlib

    from ezdata_spark.sources.jsonl import read_jsonl, split_corrupt, write_jsonl

    raw = tmp_path / "docs.jsonl"
    lines = [
        jsonlib.dumps({"doc_id": 1, "text": "hello world", "score": 0.5}),
        jsonlib.dumps({"doc_id": 2, "text": "zweite zeile", "score": 1.5}),
        '{"doc_id": 3, "text": "broken',  # corrupt line
    ]
    raw.write_text("\n".join(lines) + "\n")

    t = read_jsonl(spark, str(raw), schema="doc_id long, text string, score double")
    good, bad = split_corrupt(t.df)
    assert {r.doc_id for r in good.collect()} == {1, 2}
    assert bad.count() == 1 and "broken" in bad.collect()[0][0]

    out = tmp_path / "out"
    write_jsonl(good, str(out), compression="gzip")
    import glob

    files = glob.glob(f"{out}/*.json.gz")
    assert files
    with gzip.open(files[0], "rt") as fh:
        assert jsonlib.loads(fh.readline())["text"] in {"hello world", "zweite zeile"}
    back = read_jsonl(spark, str(out), schema="doc_id long, text string, score double")
    g2, b2 = split_corrupt(back.df)
    assert {r.doc_id for r in g2.collect()} == {1, 2} and b2.count() == 0


def test_jsonl_schema_inference_needs_optin(spark, tmp_path):
    from ezdata_spark.sources.jsonl import read_jsonl

    p = tmp_path / "d.jsonl"
    p.write_text('{"a": 1}\n{"a": 2}\n')
    with pytest.raises(ValueError, match="sample_fraction"):
        read_jsonl(spark, str(p))
    t = read_jsonl(spark, str(p), sample_fraction=1.0)
    assert {r.a for r in t.df.select("a").collect()} == {1, 2}


def test_jsonl_corrupt_lines_scale_path(spark, tmp_path):
    from ezdata_spark.sources.jsonl import corrupt_lines

    p = tmp_path / "d.jsonl"
    p.write_text('{"a": 1}\n{broken\n{}\n')
    bad = corrupt_lines(spark, str(p), "a long").collect()
    assert len(bad) == 1 and "{broken" in bad[0][0]  # {} is valid, not flagged


def test_write_sharded_file_counts_and_roundtrip(spark, tmp_path):
    """Sharded corpus sink: hive dirs per split, bounded files per dir,
    lossless read-back."""
    import glob

    from ezdata_spark.operators.corpus import split_by_hash
    from ezdata_spark.sources.parquet_meta import write_sharded

    docs = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc "), F.col("id").cast("string")).alias("text"),
    )
    tagged = split_by_hash(docs, fractions={"train": 0.8, "val": 0.2})
    out = str(tmp_path / "corpus")
    write_sharded(
        tagged, out, partition_by=["split"], files_per_partition=4,
        sort_by=["doc_id"],
    )

    for split in ("train", "val"):
        files = glob.glob(f"{out}/split={split}/*.parquet")
        assert 1 <= len(files) <= 4, (split, files)

    back = spark.read.parquet(out)
    assert back.count() == 2000
    # lossless: every (doc_id, text, split) survives
    orig = {(r.doc_id, r.text, r.split) for r in tagged.collect()}
    got = {(r.doc_id, r.text, r.split) for r in back.collect()}
    assert got == orig


# --------------------------------------------------------------- FITS native
def _fits_fixture_table(spark):
    from pyspark.sql import functions as F

    return EzTable(
        spark.range(0, 57)
        .select(
            F.col("id").cast("long").alias("row_id"),
            F.col("id").cast("int").alias("i32"),
            (F.col("id") % 7).cast("short").alias("i16"),
            (F.col("id") * 1.5).cast("double").alias("x"),
            (F.col("id") * 0.25).cast("float").alias("y"),
            (F.col("id") % 2 == 0).alias("flag"),
            F.concat(F.lit("name_"), F.col("id")).alias("label"),
            F.array((F.col("id") * 2.0), (F.col("id") * 3.0)).alias("vec"),
        ),
        units={"x": "mag", "y": "deg"},
    )


def test_fits_native_roundtrip(spark, tmp_path):
    """Pure-numpy FITS sink -> distributed scan round-trip with exact
    values, schema, vector columns, and TUNIT unit metadata
    (simpletable.py:1523-1538 read, 1756-1772 write — astropy-free)."""
    from ezdata_spark.sources.fits_native import scan_fits, write_fits

    t = _fits_fixture_table(spark)
    path = str(tmp_path / "t.fits")
    write_fits(t, path)

    back = scan_fits(spark, path)
    assert back.units == {"x": "mag", "y": "deg"}
    a = t.df.orderBy("row_id").collect()
    b = back.df.orderBy("row_id").collect()
    assert [r.asDict() for r in a] == [r.asDict() for r in b]
    assert dict(back.df.dtypes) == dict(t.df.dtypes)


def test_fits_native_chunked_multifile(spark, tmp_path):
    """Multi-file scan with chunk_rows small enough to force several
    (file, row-range) tasks — the 100 TB ingest shape."""
    from pyspark.sql import functions as F

    from ezdata_spark.sources.fits_native import fits_table_meta, scan_fits, write_fits

    paths = []
    for k in range(3):
        df = spark.range(k * 100, k * 100 + 100).select(
            F.col("id").alias("row_id"), (F.col("id") * 2.0).alias("x")
        )
        p = str(tmp_path / f"part{k}.fits")
        write_fits(EzTable(df), p)
        paths.append(p)

    meta = fits_table_meta(paths[0])
    assert meta["nrows"] == 100 and meta["row_bytes"] == 16

    back = scan_fits(spark, paths, chunk_rows=37)  # 3 files x 3 chunks
    assert back.df.count() == 300
    got = back.df.agg(F.sum("row_id"), F.sum("x")).collect()[0]
    assert got[0] == sum(range(300)) and got[1] == 2.0 * sum(range(300))


def test_fits_header_is_standard(tmp_path, spark):
    """Header blocks are 2880-byte aligned, 80-char cards, with the
    mandatory BINTABLE keyword sequence."""
    from ezdata_spark.sources.fits_native import BLOCK, write_fits

    path = str(tmp_path / "h.fits")
    write_fits(_fits_fixture_table(spark), path)
    raw = open(path, "rb").read()
    assert len(raw) % BLOCK == 0
    assert raw[:6] == b"SIMPLE"
    assert raw[BLOCK : BLOCK + 8] == b"XTENSION"
    cards = [raw[BLOCK + i : BLOCK + i + 80].decode() for i in range(0, BLOCK, 80)]
    keys = [c[:8].strip() for c in cards]
    assert keys[:8] == ["XTENSION", "BITPIX", "NAXIS", "NAXIS1", "NAXIS2", "PCOUNT",
                        "GCOUNT", "TFIELDS"]
    assert "TUNIT4" in keys  # x -> mag


def test_read_fits_falls_back_to_native(spark, tmp_path):
    """binary_tables.read_fits no longer raises without astropy — it
    delegates to the native scanner."""
    from pyspark.sql import functions as F

    from ezdata_spark.sources.binary_tables import read_fits
    from ezdata_spark.sources.fits_native import write_fits

    p = str(tmp_path / "fb.fits")
    write_fits(EzTable(spark.range(5).select(F.col("id").alias("a"))), p)
    df = read_fits(spark, [p])
    assert df.count() == 5 and df.columns == ["a"]


def test_fits_bool_array_roundtrip(spark, tmp_path):
    """array<boolean> columns encode as vector 'L' with 'T'/'F' bytes
    (FITS Standard logical encoding), not raw 0/1, and read back exactly."""
    from ezdata_spark.sources.fits_native import scan_fits, write_fits

    df = spark.range(0, 9).select(
        F.col("id").alias("row_id"),
        F.array(F.col("id") % 2 == 0, F.col("id") % 3 == 0, F.lit(True)).alias("flags"),
    )
    path = str(tmp_path / "b.fits")
    write_fits(EzTable(df), path)
    raw = open(path, "rb").read()
    assert b"'3L" in raw  # vector logical TFORM
    back = scan_fits(spark, path)
    a = [(r.row_id, list(r.flags)) for r in df.orderBy("row_id").collect()]
    b = [(r.row_id, list(r.flags)) for r in back.df.orderBy("row_id").collect()]
    assert a == b
    assert dict(back.df.dtypes)["flags"] == "array<boolean>"


def test_fits_int_null_roundtrip(spark, tmp_path):
    """Integer nulls write a TNULLn sentinel and read back as real nulls
    — never silent INT_MIN corruption via the NaN float path."""
    from ezdata_spark.sources.fits_native import scan_fits, write_fits

    df = spark.range(0, 10).select(
        F.col("id").cast("int").alias("row_id"),
        F.when(F.col("id") % 3 == 0, None)
        .otherwise(F.col("id") * 10)
        .cast("long")
        .alias("v"),
        F.when(F.col("id") % 4 == 0, None)
        .otherwise(F.col("id"))
        .cast("int")
        .alias("w"),
    )
    path = str(tmp_path / "n.fits")
    write_fits(EzTable(df), path)
    assert b"TNULL" in open(path, "rb").read()
    back = scan_fits(spark, path)
    a = {(r.row_id, r.v, r.w) for r in df.collect()}
    b = {(r.row_id, r.v, r.w) for r in back.df.collect()}
    assert a == b
    nulls_back = back.df.filter(F.col("v").isNull()).count()
    assert nulls_back == 4  # ids 0,3,6,9


def test_fits_int_null_big_values_and_intmin(spark, tmp_path):
    """Two TNULL edge cases: (a) int64 values past 2^53 in a nulled
    column survive exactly (the Arrow nullable-Int collect never visits
    float64); (b) a legitimate INT_MIN value coexists with nulls — the
    sentinel walks past it instead of reading back as null."""
    from ezdata_spark.sources.fits_native import scan_fits, write_fits

    intmin = -(2**63)
    big = 2**53 + 7  # not representable in float64
    df = spark.createDataFrame(
        [(0, big), (1, None), (2, intmin), (3, big + 1)],
        "row_id int, v long",
    )
    path = str(tmp_path / "big.fits")
    write_fits(EzTable(df), path)
    back = {(r.row_id, r.v) for r in scan_fits(spark, path).df.collect()}
    assert back == {(0, big), (1, None), (2, intmin), (3, big + 1)}


def test_fits_card_overflow_raises(spark):
    """Oversized header values raise instead of silently truncating."""
    from ezdata_spark.sources.fits_native import _card

    with pytest.raises(ValueError, match="overflows 80"):
        _card("TUNIT1", "x" * 100)
    with pytest.raises(ValueError, match="8 characters"):
        _card("TOOLONGKEYWORD", 1)
    # comments may be trimmed (standard-permitted), never the value
    assert len(_card("TTYPE1", "ok", "c" * 200)) == 80


def test_read_fits_native_schema_validation(spark, tmp_path):
    """A caller-supplied schema on the native fallback path is validated
    against the BINTABLE header instead of being silently ignored."""
    from ezdata_spark.sources.binary_tables import read_fits
    from ezdata_spark.sources.fits_native import write_fits

    df = spark.range(0, 5).select(
        F.col("id").alias("row_id"), (F.col("id") * 1.0).alias("x")
    )
    p = str(tmp_path / "s.fits")
    write_fits(EzTable(df), p)
    ok = read_fits(spark, [p], schema="row_id bigint, x double")
    assert ok.count() == 5
    with pytest.raises(ValueError, match="does not match"):
        read_fits(spark, [p], schema="row_id int, x double")


# --------------------------------------------------------------- HDF5 native
def test_hdf5_native_roundtrip(spark, tmp_path):
    """Pure-numpy HDF5 sink -> distributed scan round-trip: compound
    dataset with ints, floats, strings, and a vector member
    (simpletable.py:1539-1550 read, 1756-1772 write — h5py-free)."""
    from ezdata_spark.sources.hdf5_native import hdf5_table_meta, scan_hdf5, write_hdf5

    df = spark.range(0, 57).select(
        F.col("id").alias("row_id"),
        F.col("id").cast("int").alias("i32"),
        (F.col("id") % 7).cast("short").alias("i16"),
        (F.col("id") * 1.5).alias("x"),
        (F.col("id") * 0.25).cast("float").alias("y"),
        F.concat(F.lit("name_"), F.col("id")).alias("label"),
        F.array((F.col("id") * 2.0), (F.col("id") * 3.0)).alias("vec"),
    )
    p = str(tmp_path / "t.h5")
    write_hdf5(EzTable(df), p, dataset="mytable")
    meta = hdf5_table_meta(p, "mytable")
    assert meta["nrows"] == 57

    back = scan_hdf5(spark, p, "mytable")
    a = [r.asDict() for r in df.orderBy("row_id").collect()]
    b = [r.asDict() for r in back.df.orderBy("row_id").collect()]
    assert a == b
    assert dict(back.df.dtypes) == dict(df.dtypes)


def test_hdf5_native_chunked_multifile(spark, tmp_path):
    """Multi-file scan with chunk_rows forcing several (file, row-range)
    tasks — the 100 TB ingest shape, matching the FITS scan contract."""
    from ezdata_spark.sources.hdf5_native import scan_hdf5, write_hdf5

    paths = []
    for k in range(3):
        df = spark.range(k * 100, k * 100 + 100).select(
            F.col("id").alias("row_id"), (F.col("id") * 2.0).alias("x")
        )
        p = str(tmp_path / f"part{k}.h5")
        write_hdf5(EzTable(df), p)
        paths.append(p)

    back = scan_hdf5(spark, paths, "data", chunk_rows=37)  # 3 files x 3 chunks
    assert back.df.count() == 300
    got = back.df.agg(F.sum("row_id"), F.sum("x")).collect()[0]
    assert got[0] == sum(range(300)) and got[1] == 2.0 * sum(range(300))


def test_hdf5_native_empty_table_with_strings(spark, tmp_path):
    """A 0-row dataset with a string column keeps its declared schema:
    np.char.decode on an empty S-array degrades to float64 without the
    length guard, mistyping the empty chunk."""
    from ezdata_spark.sources.hdf5_native import scan_hdf5, write_hdf5

    df = spark.createDataFrame([], "row_id bigint, label string, x double")
    p = str(tmp_path / "empty.h5")
    write_hdf5(EzTable(df), p)
    back = scan_hdf5(spark, p, "data")
    assert back.df.count() == 0
    assert dict(back.df.dtypes) == {"row_id": "bigint", "label": "string", "x": "double"}


def test_hdf5_native_bool_and_int_null_policy(spark, tmp_path):
    """Booleans store as u1 0/1 (documented: HDF5 has no portable bool);
    integer nulls are rejected with a clear error."""
    from ezdata_spark.sources.hdf5_native import scan_hdf5, write_hdf5

    df = spark.range(0, 6).select(
        F.col("id").alias("row_id"), (F.col("id") % 2 == 0).alias("flag")
    )
    p = str(tmp_path / "b.h5")
    write_hdf5(EzTable(df), p)
    back = scan_hdf5(spark, p, "data")
    got = {(r.row_id, r.flag) for r in back.df.collect()}
    assert got == {(i, int(i % 2 == 0)) for i in range(6)}

    bad = spark.range(0, 6).select(
        F.when(F.col("id") % 2 == 0, None).otherwise(F.col("id")).alias("v")
    )
    with pytest.raises(ValueError, match="has nulls"):
        write_hdf5(EzTable(bad), str(tmp_path / "bad.h5"))


def test_read_hdf5_falls_back_to_native(spark, tmp_path):
    """binary_tables.read_hdf5 no longer raises without h5py — it
    delegates to the native scanner and validates a requested schema."""
    from ezdata_spark.sources.binary_tables import read_hdf5
    from ezdata_spark.sources.hdf5_native import write_hdf5

    p = str(tmp_path / "fb.h5")
    write_hdf5(EzTable(spark.range(5).select(F.col("id").alias("a"))), p)
    df = read_hdf5(spark, [p], dataset="data", schema="a bigint")
    assert df.count() == 5 and df.columns == ["a"]
    with pytest.raises(ValueError, match="does not match"):
        read_hdf5(spark, [p], dataset="data", schema="a int")


def test_hdf5_native_unsupported_features_error_clearly(tmp_path):
    """New-style files / bad signatures produce actionable errors, not
    silent misreads."""
    from ezdata_spark.sources.hdf5_native import _H5

    p = tmp_path / "x.h5"
    p.write_bytes(b"not an hdf5 file at all, padded" + b"\x00" * 100)
    with pytest.raises(ValueError, match="signature"):
        _H5(str(p))
    sig = b"\x89HDF\r\n\x1a\n"
    p2 = tmp_path / "v3.h5"
    p2.write_bytes(sig + bytes([3]) + b"\x00" * 120)
    with pytest.raises(NotImplementedError, match="superblock version"):
        _H5(str(p2))


# ------------------------------------------------------------ VOTable native
def test_votable_native_roundtrip(spark, tmp_path):
    """Stdlib-XML VOTable TABLEDATA writer -> reader round-trip with
    units, nulls, and a numeric array column (astropy-free parity for
    simpletable.py:1551-1565)."""
    from ezdata_spark.sources.votable_native import read_votable_native, write_votable

    df = spark.createDataFrame(
        [
            (1, 10.5, "a b<c", True, [1.0, 2.0]),
            (2, None, "y", False, [3.0]),
            (3, 30.25, None, None, None),
        ],
        "id long, x double, s string, flag boolean, vec array<double>",
    )
    t = EzTable(df, units={"x": "mag"})
    p = str(tmp_path / "t.vot")
    write_votable(t, p)
    back = read_votable_native(spark, p)
    assert back.unit("x") == "mag"
    a = [r.asDict() for r in df.orderBy("id").collect()]
    b = [r.asDict() for r in back.df.orderBy("id").collect()]
    # empty-string TD reads as null: the None string column comes back None
    assert a == b
    assert dict(back.df.dtypes) == dict(df.dtypes)


def test_read_votable_falls_back_to_native(spark, tmp_path):
    """binary_tables.read_votable no longer gates on astropy."""
    from ezdata_spark.sources.binary_tables import read_votable
    from ezdata_spark.sources.votable_native import write_votable

    p = str(tmp_path / "fb.vot")
    write_votable(EzTable(spark.range(4).select(F.col("id").alias("a"))), p)
    t = read_votable(spark, p)
    assert t.df.count() == 4 and t.df.columns == ["a"]


@pytest.mark.parametrize("serialization", ["binary", "binary2"])
def test_votable_native_binary_roundtrip(spark, tmp_path, serialization):
    """IVOA BINARY/BINARY2 base64 stream writer -> reader round-trip:
    big-endian packed cells, count-prefixed variable arrays, UTF-16BE
    unicode, BINARY2 null bitmask (VOTable 1.4 §5.2-5.3). The BINARY
    (v1) case uses NaN for the null float — the only null the
    mask-less serialization can carry."""
    from ezdata_spark.sources.votable_native import read_votable_native, write_votable

    rows = [
        (1, 10.5, "a b<c", True, [1.0, 2.0], [7, 8]),
        (2, None, "ünïcode", False, [3.0], []),
        (3, 30.25, "y", True, [-1.5], [9]),
    ]
    if serialization == "binary2":
        rows.append((4, 1.25, None, None, None, None))
    df = spark.createDataFrame(
        rows,
        "id long, x double, s string, flag boolean, "
        "vec array<double>, iv array<int>",
    )
    t = EzTable(df, units={"x": "mag"})
    p = str(tmp_path / f"t_{serialization}.vot")
    write_votable(t, p, serialization=serialization)
    assert f"<{'BINARY2' if serialization == 'binary2' else 'BINARY'}>" in open(p).read()
    back = read_votable_native(spark, p)
    assert back.unit("x") == "mag"
    a = [r.asDict() for r in df.orderBy("id").collect()]
    b = [r.asDict() for r in back.df.orderBy("id").collect()]
    # binary v1 cannot carry null arrays: they round-trip as empty
    if serialization == "binary":
        for r in a:
            for k in ("vec", "iv"):
                if r[k] is None:
                    r[k] = []
    assert a == b
    assert dict(back.df.dtypes) == dict(df.dtypes)


def test_votable_binary_matches_tabledata(spark, tmp_path):
    """The three serializations of the same table read back
    value-identical (cross-serialization property)."""
    from ezdata_spark.sources.votable_native import read_votable_native, write_votable

    df = spark.range(50).selectExpr(
        "id",
        "cast(id * 1.5 as double) AS x",
        "concat('s', id) AS s",
        "array(cast(id as double), cast(id + 1 as double)) AS vec",
    )
    t = EzTable(df)
    outs = {}
    for ser in ("tabledata", "binary", "binary2"):
        p = str(tmp_path / f"m_{ser}.vot")
        write_votable(t, p, serialization=ser)
        outs[ser] = [
            r.asDict() for r in read_votable_native(spark, p).df.orderBy("id").collect()
        ]
    assert outs["tabledata"] == outs["binary"] == outs["binary2"]


def test_votable_binary_v1_null_int_raises(spark, tmp_path):
    from ezdata_spark.sources.votable_native import write_votable

    df = spark.createDataFrame([(1,), (None,)], "k long")
    with pytest.raises(ValueError, match="binary2"):
        write_votable(EzTable(df), str(tmp_path / "n.vot"), serialization="binary")


def test_votable_native_fits_stream_errors(spark, tmp_path):
    from ezdata_spark.sources.votable_native import read_votable_native

    p = tmp_path / "fits.vot"
    p.write_text(
        '<VOTABLE><RESOURCE><TABLE>'
        '<FIELD name="x" datatype="double"/>'
        "<DATA><FITS><STREAM/></FITS></DATA>"
        "</TABLE></RESOURCE></VOTABLE>"
    )
    with pytest.raises(NotImplementedError, match="FITS"):
        read_votable_native(spark, str(p))


def test_fits_sharded_sink_roundtrip(spark, tmp_path):
    """Distributed FITS export: each partition writes its own file
    executor-side (no driver collect); scan_fits reads the directory
    back as a multi-file archive with exact values."""
    import glob

    from ezdata_spark.sources.fits_native import scan_fits, write_fits_sharded

    df = (
        spark.range(0, 1000)
        .select(
            F.col("id").alias("row_id"),
            (F.col("id") * 0.5).alias("x"),
            F.concat(F.lit("s"), F.col("id")).alias("s"),
        )
        .repartition(7)
    )
    d = str(tmp_path / "shards")
    manifest = write_fits_sharded(EzTable(df, units={"x": "mag"}), d)
    files = sorted(glob.glob(f"{d}/part-*.fits"))
    assert len(files) == 7 == len(manifest)
    assert sum(m["rows"] for m in manifest) == 1000

    back = scan_fits(spark, files)
    assert back.units == {"x": "mag"}
    got = back.df.agg(F.sum("row_id"), F.sum("x"), F.count(F.lit(1))).collect()[0]
    assert got[0] == sum(range(1000)) and got[1] == 0.5 * sum(range(1000)) and got[2] == 1000
    s_vals = {r.s for r in back.df.collect()}
    assert s_vals == {f"s{i}" for i in range(1000)}


def test_hdf5_sharded_sink_roundtrip(spark, tmp_path):
    """Distributed HDF5 export mirror of the FITS sharded sink."""
    import glob

    from ezdata_spark.sources.hdf5_native import scan_hdf5, write_hdf5_sharded

    df = (
        spark.range(0, 900)
        .select(
            F.col("id").alias("row_id"),
            (F.col("id") * 0.25).alias("x"),
            F.concat(F.lit("h"), F.col("id")).alias("s"),
        )
        .repartition(5)
    )
    d = str(tmp_path / "h5shards")
    manifest = write_hdf5_sharded(EzTable(df), d)
    files = sorted(glob.glob(f"{d}/part-*.h5"))
    assert len(files) == 5 == len(manifest)
    assert sum(m["rows"] for m in manifest) == 900

    back = scan_hdf5(spark, files, "data")
    got = back.df.agg(F.sum("row_id"), F.sum("x"), F.count(F.lit(1))).collect()[0]
    assert got[0] == sum(range(900)) and got[1] == 0.25 * sum(range(900)) and got[2] == 900
    assert {r.s for r in back.df.collect()} == {f"h{i}" for i in range(900)}
