"""Value-normalization transforms for the render path.

Reference: matplotlib/norm.py:49-148 and datashader.py:140-174 —
arcsinh / sqrt / pow / log / histeq / midpoint normalizations applied to
aggregated rasters before colormapping.

These operate on the *aggregate* (a small numpy grid on the driver), so
they are plain numpy. ``histeq_edges`` is the one cluster-side piece:
computing the CDF of a full column uses percentile_approx on-cluster.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def arcsinh_norm(a: np.ndarray, scale: float = 1.0) -> np.ndarray:
    out = np.arcsinh(np.asarray(a, dtype="float64") / scale)
    return _rescale01(out)


def sqrt_norm(a: np.ndarray) -> np.ndarray:
    return _rescale01(np.sqrt(np.clip(np.asarray(a, dtype="float64"), 0, None)))


def pow_norm(a: np.ndarray, gamma: float = 2.0) -> np.ndarray:
    return _rescale01(np.power(_rescale01(a), gamma))


def log_norm(a: np.ndarray) -> np.ndarray:
    return _rescale01(np.log10(1.0 + np.clip(np.asarray(a, dtype="float64"), 0, None)))


def midpoint_norm(a: np.ndarray, midpoint: float = 0.0) -> np.ndarray:
    """Two-slope rescale around a midpoint (norm.py midpoint class)."""
    a = np.asarray(a, dtype="float64")
    lo, hi = np.nanmin(a), np.nanmax(a)
    lo = min(lo, midpoint)
    hi = max(hi, midpoint)
    out = np.where(
        a <= midpoint,
        0.5 * (a - lo) / max(midpoint - lo, 1e-300),
        0.5 + 0.5 * (a - midpoint) / max(hi - midpoint, 1e-300),
    )
    return np.clip(out, 0, 1)


def histeq_norm(a: np.ndarray, nbins: int = 256) -> np.ndarray:
    """Histogram-equalize a raster (norm.py histeq): CDF lookup."""
    a = np.asarray(a, dtype="float64")
    flat = a[np.isfinite(a)]
    if flat.size == 0:
        return np.zeros_like(a)
    hist, edges = np.histogram(flat, bins=nbins)
    cdf = np.cumsum(hist).astype("float64")
    cdf /= cdf[-1]
    idx = np.clip(np.searchsorted(edges[1:], a), 0, nbins - 1)
    return np.where(np.isfinite(a), cdf[idx], 0.0)


def percentile_norm(a: np.ndarray, plo: float = 1.0, phi: float = 99.0) -> np.ndarray:
    a = np.asarray(a, dtype="float64")
    lo, hi = np.nanpercentile(a, [plo, phi])
    return np.clip((a - lo) / max(hi - lo, 1e-300), 0, 1)


def _rescale01(a: np.ndarray) -> np.ndarray:
    lo, hi = np.nanmin(a), np.nanmax(a)
    if hi <= lo:
        return np.zeros_like(a)
    return (a - lo) / (hi - lo)


def histeq_edges(df: DataFrame, col: str, nbins: int = 256) -> list[float]:
    """Cluster-side CDF edges for equalizing a *column* (not a raster):
    one percentile_approx pass, no data movement."""
    qs = [i / nbins for i in range(nbins + 1)]
    return df.agg(F.percentile_approx(col, qs, 10_000).alias("e")).collect()[0]["e"]


def colorify(values, cmap_size: int = 16) -> dict:
    """value -> stable color-index map (plotter.py:1875-1912): distinct
    values cycled through a palette; palette index only — actual RGBA is
    a render concern."""
    uniq = sorted(set(values), key=lambda v: (v is None, v))
    return {v: i % cmap_size for i, v in enumerate(uniq)}
