"""Aggregation spec parsing: "fn(expr)" strings -> Spark agg Columns.

The reference parses aggregate strings like ``'count(*)'`` /
``'median(parallax)'`` in its healpix plot path (astro.py:380-393) and
accepts arbitrary Python reducers in ``aggregate`` (dictdataframe.py:
578-599). Here the string dialect maps onto Spark's native (partial +
final, map-side-combined) aggregate physical operators.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_AGG_MAP = {
    "count": F.count,
    "sum": F.sum,
    "mean": F.avg,
    "avg": F.avg,
    "min": F.min,
    "max": F.max,
    "std": F.stddev_samp,
    "stddev": F.stddev_samp,
    "var": F.var_samp,
    "variance": F.var_samp,
    "median": lambda c: F.percentile(c, F.lit(0.5)),
    "mode": F.mode,  # datashader.py:132-133 reduction set
    "first": F.first,
    "last": F.last,
    "any": lambda c: F.max(c.cast("boolean")),
    "count_distinct": F.count_distinct,
    "approx_count_distinct": F.approx_count_distinct,
    "collect_list": F.collect_list,
    "collect_set": F.collect_set,
}

_SPEC_RE = re.compile(r"^\s*([A-Za-z_][A-Za-z0-9_]*)\s*\((.*)\)\s*$", re.S)


def parse_agg(table, spec: str) -> Column:
    """Parse ``'fn(value_expr)'`` where value_expr is numpy-dialect.

    ``'count(*)'`` maps to count(1) (astro.py:386-388 semantics). A bare
    paren-free expression defaults to its mean (scipy binned_statistic
    default); anything else malformed raises instead of silently
    aggregating the wrong thing.
    """
    m = _SPEC_RE.match(spec)
    if not m:
        if "(" in spec or ")" in spec:
            raise ValueError(
                f"cannot parse aggregate spec {spec!r}; expected 'fn(expr)' "
                f"with fn in {sorted(_AGG_MAP)}"
            )
        # bare column/expression -> mean (binned_statistic default)
        return F.avg(F.expr(table._translate(spec)))
    fn_name, inner = m.group(1).lower(), m.group(2).strip()
    # the greedy regex would accept 'sum(a) + sum(b)' with unbalanced
    # inner text; compound aggregate arithmetic is not this dialect
    if inner.count("(") != inner.count(")"):
        raise ValueError(
            f"cannot parse aggregate spec {spec!r} (unbalanced parentheses); "
            "compound aggregates like 'sum(a) + sum(b)' are not supported — "
            "compute them as separate aggs and combine afterwards"
        )
    if fn_name not in _AGG_MAP:
        raise ValueError(f"unknown aggregate {fn_name!r}; known: {sorted(_AGG_MAP)}")
    if inner in ("*", ""):
        if fn_name == "count":
            return F.count(F.lit(1))
        raise ValueError(f"{fn_name}(*) is only valid for count")
    col = F.expr(table._translate(inner))
    return _AGG_MAP[fn_name](col)
