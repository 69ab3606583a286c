"""Driver-side theme / color / legend helpers — the render-frontend
parity tier (reference: matplotlib/colors.py:91-167, legend.py:35-130,
helpers.py:7-42, light_minimal_theme.py; plotly/light_minimal_theme.py,
fivethirtyeight_theme.py).

Like the rest of the plotting layer, everything here is a RENDER
concern: pure driver-side dict/tuple manipulation with matplotlib- or
plotly-gated appliers, never a data path. The core (color conversion,
theme dictionaries, font scaling) is dependency-free so it imports and
tests in a headless cluster image; only ``apply_*``/legend calls need
the render library installed.
"""

from __future__ import annotations

import string

# Minimal built-in name table so color conversion works without
# matplotlib (names + hex are the public CSS/web color standard);
# matplotlib's full tables are consulted first when installed.
_BASIC_COLORS = {
    "black": "#000000", "white": "#FFFFFF", "red": "#FF0000",
    "green": "#008000", "blue": "#0000FF", "yellow": "#FFFF00",
    "cyan": "#00FFFF", "magenta": "#FF00FF", "gray": "#808080",
    "grey": "#808080", "orange": "#FFA500", "purple": "#800080",
    "brown": "#A52A2A", "pink": "#FFC0CB", "olive": "#808000",
    "navy": "#000080", "teal": "#008080", "maroon": "#800000",
    "lime": "#00FF00", "silver": "#C0C0C0", "gold": "#FFD700",
    "indigo": "#4B0082", "violet": "#EE82EE", "plum": "#DDA0DD",
    "salmon": "#FA8072", "khaki": "#F0E68C", "crimson": "#DC143C",
    "steelblue": "#4682B4", "skyblue": "#87CEEB", "tomato": "#FF6347",
}


def hex_to_rgb(x: str) -> tuple[int, int, int]:
    """'#RRGGBB' (or 'RRGGBB') -> (r, g, b) ints in 0..255."""
    x = x.strip("#")
    try:
        return (int(x[:2], 16), int(x[2:4], 16), int(x[4:6], 16))
    except ValueError as exc:
        raise ValueError(f"Invalid hex color {x!r}") from exc


def rgb(x) -> tuple[int, int, int]:
    """Name / hex / rgb-tuple -> (r, g, b) ints; idempotent on valid
    tuples (reference colors.py:107-138)."""
    if isinstance(x, str):
        if x.startswith("#"):
            return hex_to_rgb(x)
        name = x.lower()
        try:  # matplotlib knows the full CSS4/xkcd tables
            from matplotlib import colors as mc

            for table in (mc.BASE_COLORS, mc.CSS4_COLORS, mc.TABLEAU_COLORS, mc.XKCD_COLORS):
                if x in table or name in table:
                    c = table.get(x, table.get(name))
                    if isinstance(c, str):
                        return hex_to_rgb(c)
                    return tuple(int(round(k * 255)) for k in c)
        except ImportError:
            pass
        if name in _BASIC_COLORS:
            return hex_to_rgb(_BASIC_COLORS[name])
        raise ValueError(f"Unknown color: {x!r}")
    if isinstance(x, tuple) and len(x) == 3:
        if min(x) < 0 or max(x) > 255:
            raise ValueError("Invalid RGB tuple")
        return x
    raise TypeError(f"Don't know how to convert {x!r} to RGB")


def normed_rgb(x) -> tuple[float, float, float]:
    """rgb() scaled to 0..1 floats (matplotlib's native color triple)."""
    return tuple(k / 255.0 for k in rgb(x))


def generate_cmap_from_colors(seq, n: int = 256, name: str = "user"):
    """Build a LinearSegmentedColormap from names / hex / rgb triples
    (reference colors.py:161-167). Requires matplotlib."""
    try:
        from matplotlib.colors import LinearSegmentedColormap
    except ImportError as exc:
        raise NotImplementedError(
            "generate_cmap_from_colors requires matplotlib"
        ) from exc
    if isinstance(seq, str):
        seq = ["white", seq]
    return LinearSegmentedColormap.from_list(name, [normed_rgb(k) for k in seq], N=n)


# ------------------------------------------------------------------ themes
# rcParams-style dict (reference light_minimal_theme.py): serif,
# outward ticks, no top/right spines, muted gray chrome.
LIGHT_MINIMAL = {
    "font.family": "serif",
    "font.size": 14,
    "axes.titlesize": "x-large",
    "axes.labelsize": "large",
    "axes.edgecolor": "#666666",
    "xtick.direction": "out",
    "ytick.direction": "out",
    "xtick.major.size": "8",
    "xtick.minor.size": "4",
    "ytick.major.size": "8",
    "ytick.minor.size": "4",
    "xtick.labelsize": "small",
    "ytick.labelsize": "small",
    "xtick.color": "#666666",
    "ytick.color": "#666666",
    "xtick.top": False,
    "ytick.right": False,
    "axes.spines.top": False,
    "axes.spines.right": False,
    "image.aspect": "auto",
}

# fivethirtyeight variant (reference plotly/fivethirtyeight_theme.py:1-75
# ports the classic 538 look to plotly; matplotlib itself ships a
# 'fivethirtyeight' style these rcParams mirror): light gray grid, no
# zero line, muted tick labels, thick lines, the 6-color 538 colorway.
FIVETHIRTYEIGHT_COLORWAY = [
    "#008fd5", "#fc4f30", "#e5ae38", "#6d904f", "#8b8b8b", "#810f7c",
]

FIVETHIRTYEIGHT = {
    "font.size": 14,
    "axes.titlesize": "x-large",
    "axes.labelsize": "x-large",
    "axes.edgecolor": "#ffffff",
    "axes.facecolor": "#ffffff",
    "figure.facecolor": "#ffffff",
    "axes.grid": True,
    "grid.color": "#cbcbcb",
    "grid.linewidth": 1.0,
    "lines.linewidth": 4,
    "xtick.labelsize": "large",
    "ytick.labelsize": "large",
    "xtick.color": "#808080",
    "ytick.color": "#808080",
    "xtick.major.size": "0",
    "ytick.major.size": "0",
    # string form: matplotlib's rc validator evals cycler() strings, so
    # the dict stays importable without a matplotlib/cycler dependency
    "axes.prop_cycle": "cycler('color', %r)" % (FIVETHIRTYEIGHT_COLORWAY,),
    "legend.framealpha": 0.8,
}

THEMES = {
    "light_minimal": LIGHT_MINIMAL,
    "fivethirtyeight": FIVETHIRTYEIGHT,
}

# matplotlib's relative-fontsize scaling factors (public rcParams
# semantics) — shared by the plotly layout generator below.
FONT_SCALINGS = {
    "xx-small": 0.579, "x-small": 0.694, "small": 0.833, "medium": 1.0,
    "large": 1.2, "x-large": 1.44, "xx-large": 1.728,
    "larger": 1.2, "smaller": 0.833, None: 1.0,
}


def font_pt(which: str | None, normal: str = "12pt") -> int:
    """Resolve a relative size name against a base point size
    (reference plotly/light_minimal_theme.py font scaling)."""
    base = float(str(normal).replace("pt", ""))
    if which is None:
        return int(base)
    try:
        return int(base * FONT_SCALINGS.get(str(which).lower(), 1.0))
    except ValueError:
        return int(base)


def apply_theme(name: str = "light_minimal") -> dict:
    """Install a theme into matplotlib's rcParams (reference
    light_minimal_theme.use). Returns the dict (inspectable headless)."""
    theme = THEMES[name]
    try:
        import matplotlib.pyplot as plt

        plt.style.use(theme)
    except ImportError as exc:
        raise NotImplementedError("apply_theme requires matplotlib") from exc
    return theme


def plotly_layout(name: str = "light_minimal", font_size: str = "12pt") -> dict:
    """The same theme as a plain plotly layout dict (reference
    plotly/light_minimal_theme.py) — a dict template, so it needs no
    plotly import and feeds ``fig.update_layout(**plotly_layout())``."""
    theme = THEMES[name]
    gray = theme["axes.edgecolor"]
    axis = {
        "showgrid": False,
        "zeroline": False,
        "showline": True,
        "linecolor": gray,
        "ticks": "outside",
        "tickcolor": gray,
        "tickfont": {"size": font_pt(theme["xtick.labelsize"], font_size)},
        "title": {"font": {"size": font_pt(theme["axes.labelsize"], font_size)}},
        "mirror": False,
    }
    return {
        "font": {"family": theme["font.family"], "size": font_pt(None, font_size)},
        "title": {"font": {"size": font_pt(theme["axes.titlesize"], font_size)}},
        "paper_bgcolor": "white",
        "plot_bgcolor": "white",
        "xaxis": dict(axis),
        "yaxis": dict(axis),
    }


def plotly_template(name: str = "light_minimal", font_size: str = "12pt") -> dict:
    """A full plotly TEMPLATE dict (``{"data": ..., "layout": ...}``)
    for ``pio.templates[name]`` / ``fig.update(template=...)`` — plain
    dicts, so no plotly import is needed to build or inspect it.

    ``fivethirtyeight`` reproduces the reference's template
    (plotly/fivethirtyeight_theme.py:1-75): width-4 scatter lines,
    translucent legend box, #cbcbcb grid with no zero line and no
    ticks, 18pt axis titles / 14pt gray tick labels, the 6-color 538
    colorway, white canvas, fixed 800x600 with the reference's margin
    block. ``light_minimal`` wraps :func:`plotly_layout`.
    """
    if name == "fivethirtyeight":
        axis = {
            "gridcolor": "#cbcbcb",
            "gridwidth": 1,
            "zeroline": False,
            "ticklen": 0,
            "title": {"font": {"size": 18}},
            "tickfont": {"size": 14, "color": "#808080"},
        }
        return {
            "data": {"scatter": [{"line": {"width": 4}}]},
            "layout": {
                "legend": {
                    "bgcolor": "rgba(255, 255, 255, 0.8)",
                    "bordercolor": "rgba(0, 0, 0, 0.5)",
                    "borderwidth": 0,
                },
                "xaxis": dict(axis),
                "yaxis": dict(axis),
                "colorway": list(FIVETHIRTYEIGHT_COLORWAY),
                # the reference sets #f0f0f0 then overrides both to white
                "paper_bgcolor": "#ffffff",
                "plot_bgcolor": "#ffffff",
                "font": {"size": 14},
                "margin": {"l": 80, "r": 95, "b": 70, "t": 100, "pad": 5},
                "title": {"font": {"size": 20}},
                "width": 800,
                "height": 600,
                "autosize": False,
            },
        }
    return {"data": {}, "layout": plotly_layout(name, font_size)}


def register_plotly_template(name: str = "fivethirtyeight") -> None:
    """Install the template into ``plotly.io.templates`` under ``name``
    (the reference's module-import side effect, made explicit).
    Requires plotly."""
    try:
        import plotly.io as pio
    except ImportError as exc:
        raise NotImplementedError(
            "register_plotly_template requires plotly; "
            "plotly_template() returns the plain dict without it"
        ) from exc
    pio.templates[name] = plotly_template(name)


def bokeh_theme(name: str = "light_minimal", font_size: str = "12pt") -> dict:
    """The same theme as a bokeh Theme-json dict (reference
    bokeh/light_minimal_theme.py:35-116) — plain ``{"attrs": {...}}``
    structure, so it needs no bokeh import; feed it to
    ``bokeh.themes.Theme(json=bokeh_theme())`` when bokeh is installed."""
    theme = THEMES[name]
    gray = theme["axes.edgecolor"]
    black = theme.get("axes.labelcolor", "#000000")
    family = theme["font.family"]

    def pt(which):
        return f"{font_pt(theme.get(which, which), font_size)}pt"

    return {
        "attrs": {
            "Figure": {
                "toolbar_location": "right",
                "outline_line_color": None,
                "min_border_right": 10,
                "width": 400,
                "height": 300,
            },
            "Axis": {
                "major_label_text_font_size": pt("xtick.labelsize"),
                "major_label_text_font_style": "normal",
                "major_label_text_color": gray,
                "major_tick_line_alpha": 1.0,
                "major_label_text_font": family,
                "major_tick_line_color": gray,
                "minor_tick_line_alpha": 1.0,
                "minor_tick_line_color": gray,
                "axis_line_alpha": 1.0,
                "axis_line_color": gray,
                "axis_label_text_font": family,
                "axis_label_text_font_style": "normal",
                "axis_label_text_color": black,
                "axis_label_text_font_size": pt("axes.labelsize"),
                "major_tick_in": None,
                "minor_tick_out": None,
                "minor_tick_in": None,
            },
            "Legend": {
                "spacing": 8,
                "glyph_width": 15,
                "label_standoff": 8,
                "label_text_color": black,
                "label_text_font": family,
                "label_text_font_size": pt("xtick.labelsize"),
                "border_line_alpha": 0,
                "background_fill_alpha": 0.25,
            },
            "ColorBar": {
                "title_text_color": black,
                "title_text_font": family,
                "title_text_alpha": 1,
                "title_text_font_size": pt("axes.labelsize"),
                "title_text_font_style": "normal",
                "title_text_line_height": 1.2,
                "major_label_text_color": gray,
                "major_label_text_font": family,
                "major_label_text_font_size": pt("xtick.labelsize"),
                "major_tick_out": 8,
                "major_tick_in": None,
                "major_tick_line_alpha": 1.0,
                "major_tick_line_color": gray,
                "bar_line_alpha": 1,
                "width": 15,
            },
            "Title": {
                "text_color": black,
                "text_font": family,
                "text_font_size": pt("axes.titlesize"),
            },
        }
    }


# ------------------------------------------------------- legend helpers
def is_colorbar(ax) -> bool:
    """Heuristic from reference helpers.py:7-24: a colorbar axes has
    data ratio 1.0 and is not navigable."""
    return ax.get_data_ratio() == 1.0 and not ax.get_navigate()


def label_subplots(axes=None, fmt: str = "{0:s}", uppercase: bool = True, **kwargs):
    """Letter-label each panel (reference helpers.py:26-42). Requires
    matplotlib (operates on live axes)."""
    try:
        import matplotlib.pyplot as plt
    except ImportError as exc:
        raise NotImplementedError("label_subplots requires matplotlib") from exc
    if axes is None:
        axes = [ax for ax in plt.gcf().get_axes() if not is_colorbar(ax)]
    letters = string.ascii_uppercase if uppercase else string.ascii_lowercase
    defaults = dict(fontsize="large", fontweight="bold", va="center", ha="right")
    defaults.update(kwargs)
    for letter, ax in zip(letters, axes):
        ax.text(-0.08, 1.0, fmt.format(letter), transform=ax.transAxes, **defaults)
    return axes


def add_image_legend(artists=None, labels=None, ax=None, merge: bool = True, **kwargs):
    """Legend entries for IMAGE artists (rasters have no line handle):
    proxy patches colored from each image's colormap midpoint, merged
    with the normal handle legend (reference legend.py:35-130)."""
    try:
        import matplotlib.pyplot as plt
        from matplotlib.patches import Patch
    except ImportError as exc:
        raise NotImplementedError("add_image_legend requires matplotlib") from exc
    if ax is None:
        ax = plt.gca()
    if artists is None:
        artists = list(ax.images)
    artists_, labels_ = [], []
    if labels is not None and len(labels) == len(artists):
        artists_, labels_ = list(artists), list(labels)
    else:
        for a in artists:
            lbl = getattr(a, "get_label", lambda: "_")()
            if lbl and not str(lbl).startswith("_"):
                artists_.append(a)
                labels_.append(str(lbl))
    proxies = [
        Patch(color=a.get_cmap()(0.5), label=lbl)
        for a, lbl in zip(artists_, labels_)
    ]
    handles = proxies
    if merge:
        line_handles, line_labels = ax.get_legend_handles_labels()
        handles = line_handles + proxies
        labels_ = line_labels + labels_
    return ax.legend(handles, labels_, **kwargs)
