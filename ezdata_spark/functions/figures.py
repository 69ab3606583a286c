"""Plotly-frontend parity: build standard plotly FIGURE DICTS from the
on-cluster aggregate Results (reference: plotly/tools.py:105-417,
hvplotter.py:112-230).

The reference's plotly/holoviews frontends re-aggregate driver-side
(datashader canvas, plotly histograms over raw columns); on Spark the
aggregation already happened on-cluster (plotting.py returns small
numpy Results), so the interactive frontend reduces to FORMATTING: a
plotly figure is a plain JSON dict — ``{"data": [traces], "layout"``
— renderable with ``plotly.graph_objects.Figure(dict)`` when plotly is
installed and fully testable without it. Every builder here is pure
driver-side dict assembly over already-reduced data; no library import,
no data path.
"""

from __future__ import annotations

import math

import numpy as np

from .themes import plotly_layout


def _layout(title: str | None = None, **overrides) -> dict:
    lay = plotly_layout()
    if title:
        lay["title"] = {**lay.get("title", {}), "text": title}
    lay.update(overrides)
    return lay


def hist_figure(h, log: bool = False, title: str | None = None) -> dict:
    """HistResult -> bar-trace figure dict (the plotly histogram the
    reference draws from raw columns, hvplotter.py:148-179 — here from
    the pre-aggregated counts)."""
    lay = _layout(title or h.label)
    if log:
        lay["yaxis"] = {**lay["yaxis"], "type": "log"}
    return {
        "data": [
            {
                "type": "bar",
                "x": [float(c) for c in h.centers],
                "y": [float(v) for v in h.counts],
                "width": [float(w) for w in np.diff(h.edges)],
                "name": h.label or "count",
            }
        ],
        "layout": lay,
    }


def raster_figure(
    g,
    log: bool = False,
    colorscale: str = "Viridis",
    title: str | None = None,
) -> dict:
    """Hist2DResult -> heatmap figure dict. ``log=True`` reproduces the
    reference's logscale colorbar treatment (plotly/tools.py:105-204):
    z becomes log10(z), the colorbar ticks show the original decades."""
    z = np.asarray(g.counts, dtype=float).T  # heatmap rows = y
    xc = 0.5 * (g.x_edges[:-1] + g.x_edges[1:])
    yc = 0.5 * (g.y_edges[:-1] + g.y_edges[1:])
    trace: dict = {
        "type": "heatmap",
        "x": [float(v) for v in xc],
        "y": [float(v) for v in yc],
        "colorscale": colorscale,
        "colorbar": {"title": {"text": "count"}},
    }
    if log:
        pos = z[z > 0]
        zlog = np.where(z > 0, np.log10(np.where(z > 0, z, 1.0)), np.nan)
        trace["z"] = [[None if math.isnan(v) else float(v) for v in row] for row in zlog]
        hi = int(math.ceil(float(np.log10(pos.max())))) if pos.size else 1
        ticks = list(range(0, hi + 1))
        trace["colorbar"]["tickvals"] = ticks
        trace["colorbar"]["ticktext"] = [f"1e{t}" if t > 1 else str(10**t) for t in ticks]
    else:
        trace["z"] = [[float(v) for v in row] for row in z]
    lay = _layout(title)
    lay["xaxis"] = {**lay["xaxis"], "title": {"text": g.xlabel}}
    lay["yaxis"] = {**lay["yaxis"], "title": {"text": g.ylabel}}
    return {"data": [trace], "layout": lay}


def box_figure(b, title: str | None = None) -> dict:
    """BoxStats -> box traces with PRECOMPUTED quartiles (plotly's
    q1/median/q3 attributes) — the quantiles came from one on-cluster
    percentile pass, never raw rows."""
    traces = [
        {
            "type": "box",
            "name": str(k),
            "q1": [float(b.q1[i])],
            "median": [float(b.median[i])],
            "q3": [float(b.q3[i])],
            "lowerfence": [float(b.lo[i])],
            "upperfence": [float(b.hi[i])],
            "mean": [float(b.mean[i])],
            "x": [str(k)],
        }
        for i, k in enumerate(b.keys)
    ]
    return {"data": traces, "layout": _layout(title)}


def combine_figures(figs: list[dict], cols: int = 2, hgap: float = 0.08, vgap: float = 0.12) -> dict:
    """Grid-combine figure dicts into one subplot figure (the
    reference's combine_figures, plotly/tools.py:303-416): each panel's
    traces move onto numbered axes (x2/y2, ...) whose domains tile the
    grid row-major, top row first."""
    n = len(figs)
    cols = max(1, min(cols, n))
    rows = -(-n // cols)
    w = (1.0 - hgap * (cols - 1)) / cols
    h = (1.0 - vgap * (rows - 1)) / rows
    out: dict = {"data": [], "layout": _layout()}
    for i, fig in enumerate(figs):
        r, c = divmod(i, cols)
        ax = "" if i == 0 else str(i + 1)
        x0 = c * (w + hgap)
        y1 = 1.0 - r * (h + vgap)
        src_lay = fig.get("layout", {})
        out["layout"][f"xaxis{ax}"] = {
            **src_lay.get("xaxis", {}),
            "domain": [round(x0, 6), round(x0 + w, 6)],
            "anchor": f"y{ax or '1'}" if ax else "y",
        }
        out["layout"][f"yaxis{ax}"] = {
            **src_lay.get("yaxis", {}),
            "domain": [round(y1 - h, 6), round(y1, 6)],
            "anchor": f"x{ax or '1'}" if ax else "x",
        }
        for tr in fig["data"]:
            t = dict(tr)
            if ax:
                t["xaxis"] = f"x{ax}"
                t["yaxis"] = f"y{ax}"
            out["data"].append(t)
    return out


def _axis_of(trace: dict, which: str) -> str:
    """Layout key of the axis a trace draws on: 'x2' -> 'xaxis2'."""
    ref = trace.get(f"{which}axis") or which
    return ref.replace(which, f"{which}axis", 1)


def _domain(layout: dict, axis_key: str) -> tuple:
    dom = layout.get(axis_key, {}).get("domain", [0.0, 1.0])
    return float(dom[0]), float(dom[1])


def separate_colorbars(fig: dict, xnorm: float = 1.0, ynorm: float = 0.5, **kwargs) -> dict:
    """Give every color-mapped trace its OWN layout coloraxis and place
    each colorbar beside its subplot (reference plotly/tools.py:55-86).
    Without this, a combined figure's heatmaps either share one global
    colorbar scale or stack their bars at the figure edge.

    Works on figure DICTS: per-trace color properties (colorscale,
    colorbar, zmin/zmax) move onto numbered ``layout.coloraxisN``
    entries and the trace keeps only the ``coloraxis`` reference —
    exactly the structure plotly renders. Returns the same dict,
    updated in place, for chaining."""
    layout = fig.setdefault("layout", {})
    num = 0
    for tr in fig.get("data", []):
        if tr.get("type") not in ("heatmap", "histogram2d", "contour") and (
            "colorscale" not in tr and "coloraxis" not in tr
        ):
            continue
        num += 1
        name = "coloraxis" if num == 1 else f"coloraxis{num}"
        axis_props = layout.get(tr.get("coloraxis", ""), {}) if tr.get("coloraxis") else {}
        axis_props = dict(axis_props)
        for src, dst in (
            ("colorscale", "colorscale"),
            ("zmin", "cmin"),
            ("zmax", "cmax"),
            ("colorbar", "colorbar"),
        ):
            if src in tr:
                axis_props[dst] = tr.pop(src)
        layout[name] = axis_props
        tr["coloraxis"] = name
    return reposition_colorbars(fig, xnorm=xnorm, ynorm=ynorm, **kwargs)


def reposition_colorbars(fig: dict, xnorm: float = 1.0, ynorm: float = 0.5, **kwargs) -> dict:
    """Move each trace's colorbar to the same RELATIVE position inside
    its own subplot's domain (reference plotly/tools.py:19-52):
    ``x = x0 + (x1-x0)*xnorm``, same for y — so a grid of heatmaps gets
    a bar beside every panel instead of all bars at the figure edge.
    Extra kwargs merge into each colorbar (len, thickness, ...)."""
    layout = fig.setdefault("layout", {})
    for tr in fig.get("data", []):
        ca = tr.get("coloraxis")
        target = layout.get(ca) if ca else tr
        if target is None or (not ca and "colorbar" not in tr and tr.get("type") != "heatmap"):
            continue
        x0, x1 = _domain(layout, _axis_of(tr, "x"))
        y0, y1 = _domain(layout, _axis_of(tr, "y"))
        cb = dict(target.get("colorbar", {}) or {})
        cb["x"] = round(x0 + (x1 - x0) * xnorm, 6)
        cb["y"] = round(y0 + (y1 - y0) * ynorm, 6)
        cb.setdefault("len", round(y1 - y0, 6))
        cb.update(kwargs)
        target["colorbar"] = cb
    return fig


def copy_axis(new_axis_name: str, axis: dict) -> dict:
    """Copy an axis dict onto a new layout axis name, dropping the
    placement keys (domain / anchor / matches) that must come from the
    new grid position (reference plotly/tools.py:283-300). Returns a
    layout-fragment dict to merge into ``fig['layout']``."""
    ignore = ("domain", "anchor", "matches")
    return {new_axis_name: {k: v for k, v in (axis or {}).items() if k not in ignore}}


def update_annotation_position(
    fig: dict, xaxis_name: str, yaxis_name: str, annotation: dict
) -> dict:
    """Re-anchor an annotation after its subplot moved in a combined
    grid (reference plotly/tools.py:206-246): paper-referenced
    coordinates rescale into the new axis domain; data-referenced
    coordinates keep their values and retarget the numbered axis.
    Returns a NEW annotation dict."""
    layout = fig.get("layout", {})
    out = dict(annotation)
    if annotation.get("xref", "paper") == "paper":
        x0, x1 = _domain(layout, xaxis_name)
        out["x"] = round(x0 + (x1 - x0) * float(annotation.get("x", 0.5)), 6)
    else:
        out["xref"] = xaxis_name.replace("axis", "")
    if annotation.get("yref", "paper") == "paper":
        y0, y1 = _domain(layout, yaxis_name)
        out["y"] = round(y0 + (y1 - y0) * float(annotation.get("y", 0.5)), 6)
    else:
        out["yref"] = yaxis_name.replace("axis", "")
    return out


def update_colorbar_position(
    fig: dict,
    xaxis_name: str,
    yaxis_name: str,
    coloraxis_name: str,
    colorbar: dict | None = None,
    xnorm: float = 1.05,
    ynorm: float = 0.5,
    **cbar_defaults,
) -> dict:
    """Reset ONE named coloraxis' colorbar position to match a new
    subplot layout (reference plotly/tools.py:247-281): the bar lands
    at the (xnorm, ynorm) point of the subplot's normalized axis
    domains — x = x0 + (x1-x0)*xnorm, same for y. ``colorbar`` is the
    coloraxis' existing property dict (its other keys are preserved);
    ``cbar_defaults`` merge into the repositioned colorbar. Returns a
    layout-fragment dict ``{coloraxis_name: {...}}`` to merge into
    ``fig['layout']`` — the same contract as the reference (which
    returns the updates rather than mutating)."""
    layout = fig.get("layout", {})
    x0, x1 = _domain(layout, xaxis_name)
    y0, y1 = _domain(layout, yaxis_name)
    props = dict(colorbar or {})
    # merge into any nested colorbar props (title/len/...) instead of
    # replacing the dict wholesale — the reference replaces, but that
    # silently drops styling on reposition; sibling
    # reposition_colorbars merges, so match it (documented divergence)
    props["colorbar"] = {
        **(props.get("colorbar") or {}),
        "x": round(x0 + (x1 - x0) * xnorm, 6),
        "y": round(y0 + (y1 - y0) * ynorm, 6),
        **cbar_defaults,
    }
    return {coloraxis_name: props}


# plotly.colors.sequential.Viridis — plotly's default quantitative
# scale, reproduced so sampling needs no plotly import
_VIRIDIS = (
    "#440154", "#482878", "#3e4989", "#31688e", "#26828e",
    "#1f9e89", "#35b779", "#6ece58", "#b5de2b", "#fde725",
)
_NAMED_SCALES = {"viridis": _VIRIDIS}


def sample_colorscale(cmap, sampling: int = 255) -> list[str]:
    """``sampling`` evenly spaced 'rgb(r, g, b)' strings from a
    colorscale — a named scale ('viridis') or an explicit anchor list
    (hex / rgb tuples), linearly interpolated in RGB exactly like
    plotly's even-anchor sampling."""
    from .themes import normed_rgb

    anchors = _NAMED_SCALES.get(cmap.lower()) if isinstance(cmap, str) else cmap
    if anchors is None:
        raise ValueError(
            f"unknown colorscale {cmap!r}: pass an anchor list or one of "
            f"{sorted(_NAMED_SCALES)}"
        )
    rgbs = np.asarray([normed_rgb(a) for a in anchors])  # (n, 3) in [0,1]
    pos = np.linspace(0.0, 1.0, len(rgbs))
    ts = np.linspace(0.0, 1.0, sampling)
    out = []
    for t in ts:
        c = [np.interp(t, pos, rgbs[:, ch]) for ch in range(3)]
        out.append(
            "rgb({}, {}, {})".format(*(int(round(v * 255)) for v in c))
        )
    return out


def _anchor_scale(anchors) -> list[list]:
    """Normalize an explicit anchor list into a plotly colorscale
    ``[[pos, 'rgb(...)'], ...]`` over the ORIGINAL anchors."""
    from .themes import normed_rgb

    def rgb_str(a):
        return "rgb({}, {}, {})".format(
            *(int(round(v * 255)) for v in normed_rgb(a))
        )

    if len(anchors) == 1:
        c = rgb_str(anchors[0])
        return [[0.0, c], [1.0, c]]
    n = len(anchors) - 1
    return [[i / n, rgb_str(a)] for i, a in enumerate(anchors)]


def get_color_fn(quant, cmap="viridis", sampling: int = 255, **colorbar):
    """Map quantitative values to colors + a colorbar-only dummy trace
    (reference plotly/tools.py:418-470): returns ``(color_fn,
    dummy_trace)`` where ``color_fn(x)`` indexes ``sampling`` colors
    sampled from ``cmap`` by x's position in [nanmin, nanmax], and
    ``dummy_trace`` is an invisible two-point scatter DICT whose marker
    carries the colorbar (plotly shows a colorbar only through a
    trace). Constant input maps everything to the low end instead of
    dividing by zero (the one divergence from the reference, which
    would raise)."""
    if sampling < 2:
        raise ValueError(f"get_color_fn: sampling must be >= 2, got {sampling}")
    seq = sample_colorscale(cmap, sampling)
    q = np.asarray(quant, dtype=float)
    minval = float(np.nanmin(q))
    maxval = float(np.nanmax(q))
    diffval = maxval - minval
    hi = len(seq) - 1

    def color_fn(x):
        # NaN maps to the low end (nanmin/nanmax tolerate NaNs in the
        # training data, so the mapper must too); out-of-range values
        # clamp — the reference raises on both
        if diffval == 0 or x != x:
            return seq[0]
        return seq[min(max(int((x - minval) / diffval * hi), 0), hi)]

    cb = dict(thickness=20)
    cb.update(colorbar)
    dummy_trace = {
        "type": "scatter",
        "x": [minval, maxval],
        "y": [minval, maxval],
        "mode": "markers",
        "marker": {
            "size": 0,
            "color": [minval, maxval],
            # anchor-list cmaps: normalize the ORIGINAL anchors (a
            # handful of stops), not the `sampling` interpolated colors
            # — plotly interpolates between stops itself, and embedding
            # 255 stops bloats the figure dict for no fidelity gain
            "colorscale": cmap if isinstance(cmap, str) else _anchor_scale(cmap),
            "colorbar": cb,
            "showscale": True,
        },
        "hoverinfo": "none",
        "showlegend": False,
    }
    return color_fn, dummy_trace


def to_plotly_figure(spec: dict):
    """Materialize a dict into a live ``plotly.graph_objects.Figure``
    (the only function here that needs plotly installed)."""
    try:
        import plotly.graph_objects as go
    except ImportError as exc:
        raise NotImplementedError("to_plotly_figure requires plotly") from exc
    return go.Figure(spec)
