"""Holoviews/hvplot-frontend parity: the reference's ``HvPlotter``
surface (hvplotter.py:56-297) re-expressed as on-cluster aggregates.

The reference rasterizes driver-side through a datashader Canvas
(hvplotter.py:56-93: ``get_hv_canvas`` -> ``canvas.points`` ->
``plt.imshow``); on Spark the same raster is ONE binned groupBy
(plotting.py::Plotter.hist2d), so the hv frontend reduces to (a) the
datashader reduction vocabulary (count / logcount / sum / mean / min /
max per hvplotter.py:112-179 and 337-341), (b) the canvas range
resolution (one min/max job when a range is omitted), and (c) the
corner-plot composition with on-cluster quantile annotations
(hvplotter.py:181-229: q16/q50/q84 dashed lines + formatted titles).

Everything here returns small numpy Results / plain dicts; matplotlib
appears only inside the explicitly-gated ``imshow_hv_map`` render
helper (the ``_imshow_hv_map`` equivalent, hvplotter.py:97-110).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

from ..plotting import CornerPlot, Hist2DResult, Plotter, _require_ax

__all__ = [
    "HvPlotter",
    "CornerResult",
    "parse_reduction",
    "imshow_hv_map",
    "sigma_levels",
]


def parse_reduction(what: str | Column | None) -> tuple[Column | None, bool]:
    """Datashader reduction vocabulary -> (Spark aggregate, log_finalize).

    Strings mirror the reductions the reference passes as ``what=``
    (hvplotter.py:115, 151): ``"count"`` (default), ``"logcount"``
    (count finalized as log10, the reference's ``logcount`` subclass at
    hvplotter.py:337-341), and ``"sum:col"`` / ``"mean:col"`` /
    ``"min:col"`` / ``"max:col"``. A ready Column passes through.
    """
    if what is None or (isinstance(what, str) and what == "count"):
        return None, False
    if isinstance(what, Column):
        return what, False
    if what == "logcount":
        return None, True
    if ":" in what:
        op, col = what.split(":", 1)
        fns = {"sum": F.sum, "mean": F.avg, "min": F.min, "max": F.max}
        if op in fns:
            return fns[op](col), False
    raise ValueError(f"unknown datashader reduction {what!r}")


def _finalize_log(result: Hist2DResult) -> Hist2DResult:
    # reference logcount._finalize: log10 of the count raster
    # (hvplotter.py:337-341); 0-count cells -> -inf, masked at render
    with np.errstate(divide="ignore"):
        return Hist2DResult(
            result.x_edges, result.y_edges, np.log10(result.counts),
            result.xlabel, result.ylabel,
        )


@dataclass
class CornerResult:
    """Corner-plot data (hvplotter.py:181-229): histogram diagonal,
    raster lower triangle, and per-variable q16/q50/q84 with the
    reference's ``label = median_{-dm}^{+dp}`` title strings."""

    keys: list[str]
    labels: list[str]
    diag: dict
    lower: dict
    quantiles: dict[str, tuple[float, float, float]]

    @property
    def titles(self) -> dict[str, str]:
        out = {}
        for key, label in zip(self.keys, self.labels):
            q16, q50, q84 = self.quantiles[key]
            out[key] = (
                f"{label} = ${q50:.2f}_{{-{q50 - q16:.2f}}}^{{+{q84 - q50:.2f}}}$"
            )
        return out


def sigma_levels(upto: float = 2.1, step: float = 0.5) -> np.ndarray:
    """Gaussian-sigma colorbar levels (corner_colorbar,
    hvplotter.py:299-334): ``1 - exp(-k^2 / 2)`` for k = 0.5, 1, ..."""
    return 1.0 - np.exp(-0.5 * np.arange(0.5, upto, step) ** 2)


def imshow_hv_map(result: Hist2DResult, alpha_below: float = 0.0, ax=None, **kw):
    """Gated render: masked imshow with the holoviews defaults (origin
    lower, aspect auto, extent from the canvas — hvplotter.py:97-110).
    Cells at or below ``alpha_below`` are masked out (the reference's
    ``alpha_below`` pop)."""
    ax = _require_ax(ax)
    extent = (
        float(result.x_edges[0]), float(result.x_edges[-1]),
        float(result.y_edges[0]), float(result.y_edges[-1]),
    )
    masked = np.ma.masked_less_equal(np.ma.masked_invalid(result.counts.T), alpha_below)
    im = ax.imshow(masked, origin="lower", aspect="auto", extent=extent, **kw)
    ax.set_xlabel(result.xlabel)
    ax.set_ylabel(result.ylabel)
    return im


class HvPlotter(Plotter):
    """``HvPlotter(Plotter)`` parity (hvplotter.py:231-297): scatter /
    plot / line rasterize points server-side (here: on-cluster binned
    groupBy) with the datashader reduction vocabulary; ``corner``
    composes the pair grid with quantile annotations. Rendering stays
    out of the data path — every method returns Results/dicts."""

    def scatter(
        self,
        xname: str,
        yname: str,
        x_range: tuple[float, float] | None = None,
        y_range: tuple[float, float] | None = None,
        shape: int | tuple[int, int] = 256,
        what: str | Column | None = None,
        **kw,
    ) -> Hist2DResult:
        """hv_scatter (hvplotter.py:112-145): canvas raster of the
        point cloud. Omitted ranges resolve exactly like
        ``get_hv_canvas`` (nanmin/nanmax of each axis — one Spark
        min/max job for both axes, not a collect)."""
        reduction, log_fin = parse_reduction(what)
        rng = None
        if x_range is not None and y_range is not None:
            rng = (tuple(x_range), tuple(y_range))
        elif x_range is not None or y_range is not None:
            # one axis pinned: resolve only the other (single agg job)
            from ..operators.binned import guess_range

            df = self._frame_with({"__x": xname, "__y": yname})
            missing = "__x" if x_range is None else "__y"
            got = guess_range(df, [missing])[missing]
            rng = (tuple(x_range or got), tuple(y_range or got))
        result = self.hist2d(xname, yname, bins=shape, range=rng, reduction=reduction)
        return _finalize_log(result) if log_fin else result

    # the reference rasterizes lines identically (hv_plot ==
    # canvas.points; hvplotter.py:148-179) and aliases line = plot
    plot = scatter
    line = scatter

    def corner(
        self,
        varnames: list[str] | None = None,
        shape: int = 32,
        labels: list[str] | None = None,
    ) -> CornerResult:
        """hv_corner (hvplotter.py:181-229): PairGrid diagonal hists +
        lower-triangle rasters + q16/q50/q84 per variable. The
        quantiles for ALL variables come from ONE exact-percentile
        aggregate job (the reference calls np.quantile per column on
        the collected data)."""
        keys = list(varnames) if varnames is not None else list(self.t.df.columns)
        labels = list(labels) if labels is not None else keys
        grid = CornerPlot(self.t, keys, bins=shape)
        qcols = [
            F.percentile(F.col(k), F.array(F.lit(0.16), F.lit(0.5), F.lit(0.84))).alias(k)
            for k in keys
        ]
        row = self.t.df.agg(*qcols).collect()[0]
        quantiles = {k: tuple(float(v) for v in row[k]) for k in keys}
        return CornerResult(
            keys=keys,
            labels=labels,
            diag=grid.map_diag(),
            lower=grid.map_lower(),
            quantiles=quantiles,
        )
