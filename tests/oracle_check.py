"""Local replica of the driver's correctness gate: run every
``queries()`` entry at sf0.01 and compare to ``oracle_sql()`` via DuckDB
(row count + schema kind + order-insensitive value comparison).

Usage: python tests/oracle_check.py [query_name ...] [--sf DIR]
Exit code 0 iff all checked queries match.
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(value):
    """Canonical form for order-insensitive comparison.

    Ints and floats canonicalize DIFFERENTLY (integral floats keep a
    ``.0``): the driver fetches DuckDB results through pandas, where
    HUGEINT (SUM of integers) and DECIMAL become float64, so an oracle
    that leaves those types unchecked hash-mismatches against Spark's
    bigint even when the values are equal (round-1 q32/q40). Keeping the
    distinction here makes that class of bug fail locally too — oracles
    must CAST integer sums to BIGINT."""
    import datetime
    import decimal

    if value is None:
        return "NULL"
    try:
        if value != value:  # NaN / NaT from the pandas fetch
            return "NULL"
    except (TypeError, ValueError):
        pass
    if isinstance(value, bool):
        return str(value)
    if isinstance(value, decimal.Decimal):
        return canon(float(value))  # driver-side pandas fetch does this
    if isinstance(value, float):
        if math.isnan(value):
            return "NULL"  # NaN(duckdb/numpy) == null(Spark) per SURVEY §1.2
        s = f"{value:.9g}"
        if "." not in s and "e" not in s and "n" not in s:
            s += ".0"  # integral float stays distinct from int
        return s
    if isinstance(value, datetime.datetime):
        return value.replace(tzinfo=None).isoformat()
    if isinstance(value, (list, tuple)):
        return "[" + ",".join(canon(v) for v in value) + "]"
    if hasattr(value, "tolist") and not isinstance(value, (str, bytes)):
        # DuckDB LIST columns surface as numpy arrays through the pandas
        # fetch; str() on those would yield '[1 2 3]' vs Spark's '[1,2,3]'
        return canon(value.tolist())
    return str(value)


def rows_to_multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted("|".join(canon(r[i]) for i in order) for r in rows)


def connect_oracle(sf_dir: str):
    """DuckDB connection with the driver's table views registered."""
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def compare_one(spark, con, fn, oracle_sql: str | None, sf_dir: str):
    """Run one catalog entry against its oracle exactly as the driver
    does. Returns (status, n_rows, msgs): status 'pass'|'fail'|'rows'."""
    try:
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        scols = sdf.columns
    except Exception as exc:
        return "fail", 0, [f"spark error: {exc}"]
    if oracle_sql is None:
        return "rows", len(srows), []
    try:
        # fetch via pandas like the driver does: HUGEINT/DECIMAL ->
        # float64, so type drift vs Spark is caught locally
        odf = con.execute(oracle_sql).df()
        ocols = list(odf.columns)
        orows = [tuple(r) for r in odf.itertuples(index=False, name=None)]
    except Exception as exc:
        return "fail", len(srows), [f"duckdb error: {exc}"]
    msgs = []
    if len(srows) != len(orows):
        msgs.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
    if sorted(scols) != sorted(ocols):
        msgs.append(f"columns spark={sorted(scols)} oracle={sorted(ocols)}")
    if not msgs:
        ms = rows_to_multiset([tuple(r) for r in srows], scols)
        mo = rows_to_multiset(orows, ocols)
        if ms != mo:
            diff = [(a, b) for a, b in zip(ms, mo) if a != b][:3]
            msgs.append(f"values differ, first diffs: {diff}")
    return ("fail" if msgs else "pass"), len(srows), msgs


def main():
    import __spark_entry__ as entry_mod
    from ezdata_spark.session import get_spark

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = "/root/testdata/sf0.01"
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = args or list(queries)

    spark = get_spark("oracle-check")
    spark.sparkContext.setLogLevel("ERROR")
    con = connect_oracle(sf_dir)

    n_pass = n_fail = n_rowsonly = 0
    failures = []
    for name in names:
        status, n_rows, msgs = compare_one(spark, con, queries[name], oracles.get(name), sf_dir)
        if status == "rows":
            print(f"rows  {name}: {n_rows} rows (no oracle)")
            n_rowsonly += 1
        elif status == "pass":
            print(f"PASS  {name}: {n_rows} rows")
            n_pass += 1
        else:
            print(f"FAIL  {name}: " + "; ".join(msgs))
            n_fail += 1
            failures.append(name)

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    if failures:
        print("failures:", " ".join(failures))
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
