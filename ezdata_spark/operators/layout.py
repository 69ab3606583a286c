"""Data-layout optimization: Z-order (Morton) clustering for
multi-dimensional row-group pruning — the standard 100 TB lever for
tables queried on more than one column (the technique behind Delta
OPTIMIZE ZORDER BY / Hudi clustering, here as a plain expression over
open parquet).

Sorting a table by the bit-interleave of its filter columns makes
parquet row-group min/max stats tight on EVERY interleaved column at
once, so a scan with a predicate on any of them skips most row groups;
a lexicographic sort only achieves that for the leading column.

The discretization bounds are passed explicitly (catalog knowledge —
at scale you know your value domains; rediscovering them would cost a
full scan). Values outside the bounds clamp to the edge cells, nulls
go to cell 0 — both keep the sort total.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_value", "zorder_layout", "write_zordered"]


def _cell(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Discretize to an integer cell in [0, 2^bits): linear scale,
    clamped, null -> 0."""
    if not hi > lo:
        raise ValueError(f"zorder bounds need hi > lo, got ({lo}, {hi})")
    n_cells = 1 << bits
    scaled = F.floor((col.cast("double") - F.lit(float(lo)))
                     / F.lit(float(hi - lo)) * F.lit(float(n_cells)))
    return F.coalesce(
        F.least(F.lit(n_cells - 1), F.greatest(F.lit(0), scaled)), F.lit(0)
    ).cast("long")


def zorder_value(
    bounds: dict[str, tuple[float, float]], bits: int = 16
) -> Column:
    """Morton (Z-order) interleave of the given columns: each column is
    discretized to ``bits`` bits inside its ``(lo, hi)`` bounds and the
    bits are interleaved column-round-robin into one long. Pure
    codegen'd integer expression — no shuffle, no UDF.

    ``bits * len(bounds)`` must fit the 63 usable bits of a long."""
    cols = list(bounds)
    d = len(cols)
    if d == 0:
        raise ValueError("zorder_value needs at least one column")
    if bits * d > 63:
        raise ValueError(f"{bits} bits x {d} columns exceeds a long")
    cells = [_cell(F.col(c), *bounds[c], bits) for c in cols]
    out = F.lit(0).cast("long")
    one = F.lit(1).cast("long")
    for i in range(bits):
        for j, cell in enumerate(cells):
            out = out.bitwiseOR(
                F.shiftleft(F.shiftright(cell, i).bitwiseAND(one), i * d + j)
            )
    return out


def zorder_sql(bounds: dict[str, tuple[float, float]], bits: int = 16) -> str:
    """The identical arithmetic as ANSI/DuckDB SQL (oracle parity)."""
    cols = list(bounds)
    d = len(cols)
    n_cells = 1 << bits
    cells = []
    for c in cols:
        lo, hi = bounds[c]
        cells.append(
            f"CAST(COALESCE(LEAST({n_cells - 1}, GREATEST(0, "
            f"FLOOR((CAST({c} AS DOUBLE) - {float(lo)}) / {float(hi - lo)}"
            f" * {float(n_cells)}))), 0) AS BIGINT)"
        )
    terms = []
    for i in range(bits):
        for j, cell in enumerate(cells):
            terms.append(f"((({cell} >> {i}) & 1) << {i * d + j})")
    return "(" + " | ".join(terms) + ")"


def zorder_layout(
    df: DataFrame,
    bounds: dict[str, tuple[float, float]],
    bits: int = 16,
    out: str = "zval",
) -> DataFrame:
    """Attach the Z-value column (see :func:`zorder_value`)."""
    return df.withColumn(out, zorder_value(bounds, bits))


def write_zordered(
    df: DataFrame,
    path: str,
    bounds: dict[str, tuple[float, float]],
    bits: int = 16,
    n_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write parquet clustered by Z-value: range-repartition on the
    Z-value (each output file owns a contiguous Morton range, so
    per-file min/max stats are tight on every interleaved column),
    sort within partitions, drop the helper column. One range shuffle
    total — the same cost as any global sort."""
    zdf = zorder_layout(df, bounds, bits)
    (
        zdf.repartitionByRange(n_files, F.col("zval"))
        .sortWithinPartitions("zval")
        .drop("zval")
        .write.mode(mode)
        .parquet(path)
    )
