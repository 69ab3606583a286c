"""Distributed PCA over embedding columns: one-pass covariance, driver
eigendecomposition, broadcast projection.

Extension tier (the reference has no vector decomposition): the
standard dimensionality-reduction step in front of the ANN / semantic-
dedup tier (similarity.py, corpus.py::semantic_dedup) — projecting
768-d model embeddings to 64-128 d cuts every downstream shuffle,
codebook, and distance kernel proportionally, and PCA is also the
initialization OPQ rotates (similarity.py::opq_train).

Scale shape — the same train/apply split as the PQ/OPQ tier:

* ``pca_train`` makes ONE pass over the corpus: each Arrow batch
  reduces to a (count, sum-vector, X^T X) partial — d*(d+1) float64s,
  ~33 KB at d=64 — via ``mapInPandas`` (one BLAS syrk-shaped dgemm per
  batch); the driver combines the P bounded partials and runs the d x d
  symmetric eigendecomposition locally (milliseconds for any d that
  fits a float column). Nothing corpus-sized ever reaches the driver,
  and the pass is embarrassingly parallel — no shuffle at all
  (the partials frame collapses through a coalesce-free collect of
  one row per batch).
* ``pca_project`` broadcasts the (k x d) component matrix inside an
  Arrow-batched pandas UDF: one dgemm per batch, linear, stateless,
  column-appending (composes with any downstream frame op).

Sign convention: each component is flipped so its largest-magnitude
coordinate is positive — eigenvectors are sign-ambiguous, and a
deterministic convention makes train runs reproducible across
partitionings (the covariance itself is permutation-invariant up to
float association; see the last-ulp caveat on window.py's prefix sums).

Public background: snapshot-matrix PCA via the covariance eigenproblem
is textbook (Jolliffe, "Principal Component Analysis"); the
sum/outer-product single-pass reduction is the same moment-combining
used by Spark MLlib's RowMatrix.computeCovariance.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType


def pca_train(
    emb: DataFrame,
    vec_col: str = "embedding",
    k: int = 8,
) -> tuple[list[float], list[list[float]], list[float]]:
    """Fit PCA on an ``array<float>``/``array<double>`` column.

    Returns ``(mean, components, explained_variance_ratio)``:
    ``mean`` is the d-vector to center with, ``components`` the k x d
    row-major principal axes (orthonormal, descending variance),
    ``explained_variance_ratio`` each axis' share of total variance.
    Plain Python lists — JSON-serializable, so the fit persists through
    an ann_index.py-style sidecar.
    """
    if k < 1:
        raise ValueError(f"pca_train: k must be >= 1, got {k}")
    m = pca_moments(emb, vec_col)
    d = len(m["sum"])
    if k > d:
        raise ValueError(f"pca_train: k={k} exceeds dimensionality d={d}")
    if m["n"] < 2:
        raise ValueError(f"pca_train: need >= 2 vectors, got {m['n']}")
    return pca_from_moments(m, k)


def _axes_from_cov(
    mean: np.ndarray, cov: np.ndarray, k: int
) -> tuple[list[float], list[list[float]], list[float]]:
    evals, evecs = np.linalg.eigh(cov)  # ascending
    # a covariance matrix is PSD, so negative eigenvalues are pure
    # floating-point noise (e.g. single-pass-moments cancellation,
    # see pca_from_moments); clamp so explained_variance_ratio stays
    # in [0, 1] instead of going slightly negative / summing past 1
    evals = np.maximum(evals, 0.0)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # (k, d)
    # deterministic sign: largest-|coord| of each axis made positive
    flip = np.sign(comps[np.arange(k), np.abs(comps).argmax(axis=1)])
    flip[flip == 0] = 1.0
    comps = comps * flip[:, None]
    total = float(evals.sum())
    ratio = (evals[order] / total) if total > 0 else np.zeros(k)
    return mean.tolist(), comps.tolist(), ratio.tolist()


def pca_moments(
    emb: DataFrame,
    vec_col: str = "embedding",
) -> dict:
    """The sufficient statistics of :func:`pca_train` as a MERGEABLE
    artifact: ``{'n', 'sum', 'xtx'}`` — count, sum vector, raw
    second-moment matrix. Because all three are plain sums,
    :func:`merge_moments` combines shards EXACTLY (integer count;
    float sums associate, same caveat as any distributed reduction),
    so a corpus fit updates incrementally: keep the moments artifact
    (JSON via ann_index.save_ann_index, kind='pca_moments'), fold each
    new shard in with one pass over the NEW data only, and re-derive
    axes with :func:`pca_from_moments` — no historical re-scan, the
    same train-once/update-cheaply contract as the incremental MinHash
    and n-gram-LM artifacts."""

    def partials(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    "n": [len(X)],
                    "s": [X.sum(axis=0).tolist()],
                    "xtx": [(X.T @ X).ravel().tolist()],
                }
            )

    rows = (
        emb.select(vec_col)
        .where(F.col(vec_col).isNotNull())
        .mapInPandas(partials, "n long, s array<double>, xtx array<double>")
        .collect()
    )
    if not rows:
        raise ValueError("pca_moments: no non-null vectors in input")
    return {
        "n": int(sum(r["n"] for r in rows)),
        "sum": np.sum([r["s"] for r in rows], axis=0).tolist(),
        "xtx": np.sum([r["xtx"] for r in rows], axis=0).tolist(),
    }


def merge_moments(a: dict, b: dict) -> dict:
    """Combine two :func:`pca_moments` artifacts (same dimensionality)."""
    if len(a["sum"]) != len(b["sum"]):
        raise ValueError(
            f"merge_moments: dimensionality mismatch "
            f"({len(a['sum'])} vs {len(b['sum'])})"
        )
    return {
        "n": a["n"] + b["n"],
        "sum": (np.asarray(a["sum"]) + np.asarray(b["sum"])).tolist(),
        "xtx": (np.asarray(a["xtx"]) + np.asarray(b["xtx"])).tolist(),
    }


def pca_from_moments(moments: dict, k: int) -> tuple[list[float], list[list[float]], list[float]]:
    """Derive ``(mean, components, explained_variance_ratio)`` from a
    moments artifact — the driver-side tail of :func:`pca_train`.

    Numerical caveat: ``cov = (XtX - n*mu*mu^T) / (n-1)`` is the
    single-pass covariance formula, which cancels catastrophically
    when the mean dominates the variance (a corpus of embeddings with
    a large common offset can lose most significant digits, surfacing
    as tiny negative eigenvalues — clamped to 0 downstream — and, in
    the extreme, distorted axes). If your vectors carry a large common
    offset, subtract a pilot mean before :func:`pca_moments` (any
    constant shift leaves the covariance unchanged mathematically but
    removes the cancellation): project through
    :func:`pca_project` with ``components=I`` or simply shift the
    array column, then fold the pilot mean back into the returned
    ``mean``."""
    n = moments["n"]
    s = np.asarray(moments["sum"], dtype=np.float64)
    xtx = np.asarray(moments["xtx"], dtype=np.float64)
    d = s.shape[0]
    if k < 1 or k > d:
        raise ValueError(f"pca_from_moments: need 1 <= k <= {d}, got {k}")
    if n < 2:
        raise ValueError(f"pca_from_moments: need >= 2 vectors, got {n}")
    mean = s / n
    cov = (xtx.reshape(d, d) - n * np.outer(mean, mean)) / (n - 1)
    return _axes_from_cov(mean, cov, k)


def random_projection(
    df: DataFrame,
    dim: int,
    k: int,
    seed: int = 42,
    vec_col: str = "embedding",
    out_col: str = "rp",
) -> DataFrame:
    """Johnson-Lindenstrauss reduction: append ``out_col`` =
    ``x @ R^T / sqrt(k)`` with a seeded Gaussian ``k x dim`` matrix —
    the TRAIN-FREE alternative to :func:`pca_project` (no corpus pass
    at all; pairwise distances preserved within the JL distortion
    bound in expectation). The matrix derives deterministically from
    ``seed`` on the driver (a few KB) and broadcasts inside the same
    batched-dgemm pandas UDF, so two jobs — or two SHARDS of one
    corpus, or a stream and its batch history — project identically
    by sharing the seed.
    """
    if k < 1 or dim < 1:
        raise ValueError(f"random_projection: need k,dim >= 1, got k={k} dim={dim}")
    R = np.random.RandomState(seed).standard_normal((k, dim)) / np.sqrt(k)
    return pca_project(df, [0.0] * dim, R.tolist(), vec_col=vec_col, out_col=out_col)


def pca_project(
    df: DataFrame,
    mean: list[float],
    components: list[list[float]],
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Append ``out_col`` = (x - mean) @ components^T as
    ``array<double>`` — the k-d reduced embedding. One broadcast dgemm
    per Arrow batch; all other columns pass through untouched."""
    mu = np.asarray(mean, dtype=np.float64)
    C = np.asarray(components, dtype=np.float64)
    if C.ndim != 2 or C.shape[1] != mu.shape[0]:
        raise ValueError(
            f"pca_project: components {C.shape} do not match mean d={mu.shape[0]}"
        )

    @F.pandas_udf(ArrayType(DoubleType()))
    def proj(col: pd.Series) -> pd.Series:
        out = np.empty(len(col), dtype=object)
        out[:] = None
        mask = col.notna().to_numpy()
        if mask.any():
            X = np.stack(col[mask].to_numpy()).astype(np.float64)
            Y = (X - mu) @ C.T
            for i, y in zip(np.flatnonzero(mask), Y):
                out[i] = y
        return pd.Series(out)

    return df.withColumn(out_col, proj(F.col(vec_col)))
