"""Slowly-changing-dimension maintenance: the type-2 (history-keeping)
merge that warehouse MERGE statements (Delta/Iceberg MERGE INTO, Kimball
SCD2) perform, expressed as a pure DataFrame transformation over open
formats — no table-format dependency.

A historized dimension holds one OPEN row per key (``valid_to`` null)
plus closed history rows. Applying a batch of updates:

- keys with a changed attribute: the open row closes (``valid_to`` =
  update ts) and a new open row starts (``valid_from`` = update ts);
- keys with an unchanged attribute, and keys without updates: open row
  passes through;
- brand-new keys: a new open row;
- closed history rows always pass through untouched.

Scale shape: one latest-per-key window over the update batch (batches
are small relative to the dimension), one full-outer equi-join on the
key, and unions — a single shuffle on the dimension key; history rows
are not even joined.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["scd2_apply"]


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    attrs: Sequence[str],
    ts_col: str = "ts",
    from_col: str = "valid_from",
    to_col: str = "valid_to",
) -> DataFrame:
    """Apply an update batch to an SCD2 dimension; returns the new
    dimension (closed history + refreshed open rows). When a key has
    several updates in the batch, the LATEST by ``ts_col`` wins
    (tie-broken by the attribute values for determinism) — classic
    batch-merge semantics; intra-batch intermediate versions are not
    historized."""
    attrs = list(attrs)
    w = Window.partitionBy(key).orderBy(
        F.col(ts_col).desc(), *[F.col(a).desc() for a in attrs]
    )
    latest = (
        updates.select(key, ts_col, *attrs)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    closed = dim.where(F.col(to_col).isNotNull())
    open_rows = dim.where(F.col(to_col).isNull())

    u = latest.select(
        F.col(key).alias("_k"),
        F.col(ts_col).alias("_ts"),
        *[F.col(a).alias(f"_u_{a}") for a in attrs],
    )
    j = open_rows.join(u, open_rows[key] == u["_k"], "full_outer")

    same = F.lit(True)
    for a in attrs:
        same = same & (F.col(a).eqNullSafe(F.col(f"_u_{a}")))
    has_open = F.col(key).isNotNull()
    has_upd = F.col("_k").isNotNull()

    out_cols = [key, *attrs, from_col, to_col]

    # open rows that survive unchanged (no update, or identical attrs)
    unchanged = j.where(has_open & (~has_upd | same)).select(*out_cols)
    # open rows closed by a changed update
    closing = j.where(has_open & has_upd & ~same).select(
        F.col(key),
        *attrs,
        F.col(from_col),
        F.col("_ts").alias(to_col),
    )
    # new open rows: changed keys and brand-new keys
    opening = j.where(has_upd & (~has_open | ~same)).select(
        F.coalesce(F.col(key), F.col("_k")).alias(key),
        *[F.col(f"_u_{a}").alias(a) for a in attrs],
        F.col("_ts").alias(from_col),
        F.lit(None).cast(dim.schema[to_col].dataType).alias(to_col),
    )
    return (
        closed.select(*out_cols)
        .unionByName(unchanged)
        .unionByName(closing)
        .unionByName(opening)
    )
