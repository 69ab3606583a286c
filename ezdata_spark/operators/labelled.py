"""Labelled N-D grid results — the reference's xarray adapter.

The reference's binned tier returns coordinate-labelled arrays
(``xarray.DataArray`` from ``xr_histogram``,
``/root/reference/ezdata/xarray.py:38-96``: dims named by the binning
columns, coords = bin CENTERS ``0.5*(edges[:-1]+edges[1:])``;
``df_groupby_bins`` reindexes the full center product so empty bins
exist, ``xarray.py:218-221``). Our :mod:`binned` operators return the
same information as a DataFrame (``<col>__bin`` / ``<col>__center``
columns + one column per aggregate), which is the right shape ON the
cluster — but a user porting reference code that does
``out.sel(logT=4.2)`` needs the labelled object back on the driver.

:class:`LabelledGrid` is that object: a dependency-free labelled array
(dims / center coords / one ndarray per variable) with ``sel`` /
``isel`` label indexing, built by collecting a DENSIFIED binned result
(bounded at ``prod(nbins)`` cells — an aggregate, never raw rows) and
scattering it into dense ndarrays. ``to_xarray()`` converts to a real
``xarray.DataArray``/``Dataset`` when xarray is installed (it is an
optional dependency, exactly like the reference's soft imports);
everything else works without it.

Empty-bin semantics follow the reference: counts densify to 0
(``np.histogramdd``), non-additive statistics to NaN (the pandas
``reindex`` path) — whatever fill the upstream ``binned_agg`` applied
is preserved here, with genuinely-missing cells (``densify=False``
inputs) surfacing as NaN.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass, field, replace

import numpy as np

from pyspark.sql import DataFrame

from .binned import BinSpec

__all__ = ["LabelledGrid", "grid_from_binned", "histogram_grid"]


@dataclass(frozen=True)
class LabelledGrid:
    """A labelled N-D grid: ``dims`` names each axis, ``coords[dim]``
    labels its positions (bin centers for numeric dims, category
    values for categorical ones), and ``data[var]`` is one ndarray of
    shape ``tuple(len(coords[d]) for d in dims)`` per variable."""

    dims: tuple[str, ...]
    coords: dict[str, np.ndarray]
    data: dict[str, np.ndarray]
    name: str | None = None
    attrs: dict = field(default_factory=dict)

    # -- array-ish surface -------------------------------------------------
    @property
    def shape(self) -> tuple[int, ...]:
        return tuple(len(self.coords[d]) for d in self.dims)

    @property
    def variables(self) -> list[str]:
        return list(self.data)

    @property
    def values(self) -> np.ndarray:
        """The single variable's ndarray (DataArray-style access);
        raises if the grid holds several variables."""
        if len(self.data) != 1:
            raise ValueError(
                f"grid has {len(self.data)} variables {self.variables}; "
                "use grid[name]"
            )
        return next(iter(self.data.values()))

    def __getitem__(self, var: str) -> np.ndarray:
        return self.data[var]

    # -- label indexing ----------------------------------------------------
    def _locate(self, dim: str, value, method: str | None) -> int:
        coo = self.coords[dim]
        if np.issubdtype(np.asarray(coo).dtype, np.number):
            diff = np.abs(np.asarray(coo, dtype=np.float64) - float(value))
            i = int(diff.argmin())
            # exact selection tolerates float-representation noise only
            # (xarray's sel: exact unless method='nearest')
            if method != "nearest" and diff[i] > 1e-9 * max(1.0, abs(float(value))):
                raise KeyError(
                    f"{value!r} not a coordinate of {dim!r} "
                    f"(nearest is {coo[i]!r}; pass method='nearest')"
                )
            return i
        matches = np.nonzero(coo == value)[0]
        if not len(matches):
            raise KeyError(f"{value!r} not a coordinate of {dim!r}")
        return int(matches[0])

    def isel(self, **indexers: int) -> "LabelledGrid":
        """Positional selection along named dims (each drops its axis)."""
        unknown = set(indexers) - set(self.dims)
        if unknown:
            raise KeyError(f"unknown dims {sorted(unknown)} (have {self.dims})")
        idx = tuple(
            indexers[d] if d in indexers else slice(None) for d in self.dims
        )
        keep = tuple(d for d in self.dims if d not in indexers)
        return replace(
            self,
            dims=keep,
            coords={d: self.coords[d] for d in keep},
            data={v: a[idx] for v, a in self.data.items()},
        )

    def sel(self, method: str | None = None, **indexers) -> "LabelledGrid":
        """Label selection along named dims — the ``out.sel(logT=4.2)``
        surface of the reference's DataArray results. Numeric dims
        match their bin CENTER (``method='nearest'`` snaps, the
        default is exact); categorical dims match the category value.
        Selected axes are dropped, like xarray's scalar sel.

        The keyword ``method`` is reserved (as in xarray's sel); a dim
        literally named ``method`` must be selected positionally via
        :meth:`isel`."""
        unknown = set(indexers) - set(self.dims)
        if unknown:
            raise KeyError(f"unknown dims {sorted(unknown)} (have {self.dims})")
        return self.isel(
            **{d: self._locate(d, v, method) for d, v in indexers.items()}
        )

    # -- conversion --------------------------------------------------------
    def to_xarray(self):
        """Convert to ``xarray.DataArray`` (single variable, named like
        the reference's ``xr_histogram`` result) or ``xarray.Dataset``
        (several variables, like ``xr_histogram_df``). Requires the
        optional ``xarray`` dependency."""
        try:
            import xarray as xr
        except ImportError as exc:  # pragma: no cover - env without xarray
            raise ImportError(
                "to_xarray() needs the optional xarray package; "
                "LabelledGrid.sel/isel/values work without it"
            ) from exc
        coords = [(d, np.asarray(self.coords[d])) for d in self.dims]
        if len(self.data) == 1:
            ((var, arr),) = self.data.items()
            out = xr.DataArray(arr, coords=coords, attrs=dict(self.attrs))
            out.name = self.name or var
            return out
        return xr.Dataset(
            {v: (self.dims, a) for v, a in self.data.items()},
            coords=dict(coords),
            attrs=dict(self.attrs),
        )


def grid_from_binned(
    df: DataFrame,
    specs: Sequence[BinSpec],
    value_cols: Sequence[str] | None = None,
    name: str | None = None,
) -> LabelledGrid:
    """Collect a :func:`binned.binned_agg`-shaped frame (``<col>__bin``
    key columns + aggregate columns, ideally ``densify=True``) into a
    :class:`LabelledGrid`.

    The collect is bounded by construction: the input is the binned
    AGGREGATE (at most ``prod(nbins)`` x ``n_categories`` cells), never
    the raw rows — same driver-side footprint as the reference, which
    materializes the same cube as an ndarray. Cells absent from the
    frame (``densify=False``) become NaN, matching the pandas
    ``reindex`` semantics of the reference's ``df_groupby_bins``.

    Numeric dims are labelled by their bin centers (recomputed from the
    spec — identical to the frame's ``<col>__center`` values);
    categorical dims by their sorted observed values (NULL category
    last, labelled as numpy ``nan``-free Python ``None``).
    """
    key_cols = [f"{s.col}__bin" for s in specs]
    missing = [k for k in key_cols if k not in df.columns]
    if missing:
        raise ValueError(
            f"not a binned frame: missing key columns {missing} "
            f"(have {df.columns})"
        )
    numeric = {"double", "float", "bigint", "int", "smallint", "tinyint", "boolean"}

    def _is_numeric(dtype: str) -> bool:
        return dtype in numeric or dtype.startswith("decimal")

    dtypes = dict(df.dtypes)
    if value_cols is None:
        skip = set(key_cols) | {f"{s.col}__center" for s in specs}
        # the grid scatters through float(): auto-inference takes only
        # the numeric aggregates (a collect_set/string agg riding along
        # in the frame is skipped, not crashed on)
        value_cols = [
            c for c in df.columns if c not in skip and _is_numeric(dtypes[c])
        ]
    else:
        absent = [c for c in value_cols if c not in dtypes]
        if absent:
            raise ValueError(
                f"value columns not in frame: {absent} (have {df.columns})"
            )
        bad = [c for c in value_cols if not _is_numeric(dtypes[c])]
        if bad:
            raise ValueError(
                f"non-numeric value columns {bad} cannot be gridded "
                f"(dtypes: {[dtypes.get(c) for c in bad]}); LabelledGrid "
                "cells are float ndarrays"
            )
    if not value_cols:
        raise ValueError("no numeric value columns to grid")
    rows = df.select(*key_cols, *value_cols).collect()

    coords: dict[str, np.ndarray] = {}
    index: list[dict] = []
    for s in specs:
        if s.categorical:
            seen = {r[f"{s.col}__bin"] for r in rows}
            cats = sorted((c for c in seen if c is not None), key=str)
            if None in seen:
                cats.append(None)
            coords[s.col] = np.asarray(cats, dtype=object)
            index.append({c: i for i, c in enumerate(cats)})
        else:
            centers = s.lo + (np.arange(s.nbins) + 0.5) * s.width
            coords[s.col] = centers
            index.append(None)  # bin id IS the position
    shape = tuple(len(coords[s.col]) for s in specs)

    data: dict[str, np.ndarray] = {}
    for v in value_cols:
        data[v] = np.full(shape, np.nan)
    oob = 0
    for r in rows:
        pos = []
        ok = True
        for s, idx in zip(specs, index):
            b = r[f"{s.col}__bin"]
            if idx is None:
                if b is None or not (0 <= b < s.nbins):
                    ok = False
                    break
                pos.append(int(b))
            else:
                pos.append(idx[b])
        if not ok:
            oob += 1
            continue
        for v in value_cols:
            val = r[v]
            data[v][tuple(pos)] = np.nan if val is None else float(val)
    return LabelledGrid(
        dims=tuple(s.col for s in specs),
        coords=coords,
        data=data,
        name=name,
        attrs={"oob_cells_dropped": oob} if oob else {},
    )


def histogram_grid(
    df: DataFrame,
    cols: Sequence[str],
    nbins: int | Sequence[int] = 10,
    range: Sequence[tuple[float, float]] | None = None,  # noqa: A002 - reference name
    weight: str | None = None,
    name: str | None = None,
) -> LabelledGrid:
    """N-D histogram as a labelled grid — ``xr_histogram``
    (``/root/reference/ezdata/xarray.py:38-96``) end to end: bin on the
    cluster (one hash aggregate, shuffle carries bins not rows),
    densify, collect the cube, label dims by bin centers. Empty bins
    are 0, the ``np.histogramdd`` convention; ``range=None`` infers
    min/max per column in one job (``guess_range``)."""
    from pyspark.sql import functions as F

    from .binned import binned_agg, guess_range

    cols = list(cols)
    if isinstance(nbins, int):
        nbins = [nbins] * len(cols)
    if len(nbins) != len(cols):
        raise ValueError(f"need one nbins per col: {len(nbins)} vs {len(cols)}")
    if range is None:
        r = guess_range(df, cols)
        range = [r[c] for c in cols]
    specs = [
        BinSpec(c, float(lo), float(hi), int(nb))
        for c, (lo, hi), nb in zip(cols, range, nbins)
    ]
    agg = (
        {"count": F.count(F.lit(1))}
        if weight is None
        else {"wsum": F.sum(weight)}
    )
    out = binned_agg(df, specs, agg, densify=True, with_centers=False)
    return grid_from_binned(out, specs, name=name)
