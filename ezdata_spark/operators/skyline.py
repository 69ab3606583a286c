"""Skyline (Pareto-front) query: keep every row not dominated by
another row, where p dominates q when p is at-least-as-good on every
criterion and strictly better on at least one (Borzsony, Kossmann &
Stocker, ICDE 2001).

Scale design -- the classic two-phase distributed skyline:
1. LOCAL phase (mapInPandas): each partition computes its own exact
   skyline with a vectorized numpy dominance sweep over rows sorted by
   criterion sum (a point can only be dominated by one with a >= sum,
   so the sweep compares each point against the current survivor set
   only). Output size is the local skyline -- for d small and data
   even lightly correlated, orders of magnitude below partition size.
2. GLOBAL phase: survivors from all partitions are coalesced into one
   partition (bounded: the union of local skylines) and swept once
   more. A point dominated anywhere is dominated by some local
   survivor, so the two-phase result is exact.

The only all-to-one movement is the candidate set, never raw data; at
100 TB the driver-side risk is a pathological anti-correlated dataset
whose true skyline itself is huge -- in that case no algorithm returns
a small answer, and the final sweep cost matches the output size.
"""

from __future__ import annotations

from collections.abc import Iterator, Mapping

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

__all__ = ["skyline"]


def _sweep(mat: np.ndarray) -> np.ndarray:
    """Exact skyline indices of `mat` (rows = points, all criteria
    maximized). Sorted-sum sweep: after sorting by -sum, a point can
    only be dominated by an earlier (or equal-sum identical) point, so
    one pass against the survivor set suffices."""
    n = mat.shape[0]
    if n == 0:
        return np.empty(0, dtype=np.int64)
    order = np.argsort(-mat.sum(axis=1), kind="stable")
    sm = mat[order]
    keep: list[int] = []
    kept = np.empty((0, mat.shape[1]))
    for i in range(n):
        p = sm[i]
        if kept.shape[0]:
            ge = (kept >= p).all(axis=1)
            gt = (kept > p).any(axis=1)
            if bool(np.any(ge & gt)):
                continue
        keep.append(i)
        kept = np.vstack([kept, p])
    return order[np.asarray(keep, dtype=np.int64)]


def skyline(df: DataFrame, criteria: Mapping[str, str]) -> DataFrame:
    """Pareto front of `df` over `criteria` -- a mapping of column name
    to 'max' or 'min'. Duplicate points (equal on every criterion) are
    all kept, as are rows tied with a skyline point: only STRICT
    dominance removes a row (the standard skyline definition, matching
    a NOT EXISTS dominance predicate in SQL).

    Rows with NULL in any criterion are dropped (they cannot be
    compared)."""
    cols = list(criteria)
    signs = np.array([1.0 if criteria[c] == "max" else -1.0 for c in cols])
    clean = df.dropna(subset=cols)
    schema = clean.schema

    def local(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Concatenate the partition's Arrow batches before sweeping:
        # the sweep must see the whole partition, or survivors of one
        # batch could remain dominated by a point in another -- which
        # would make the single-partition GLOBAL phase inexact.
        parts = [pdf for pdf in batches if len(pdf)]
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True) if len(parts) > 1 else parts[0]
        mat = pdf[cols].to_numpy(dtype=np.float64) * signs
        yield pdf.iloc[_sweep(mat)]

    candidates = clean.mapInPandas(local, schema=schema)
    # Global refine over the bounded candidate set.
    final = candidates.coalesce(1).mapInPandas(local, schema=schema)
    return final
