"""Plan auditing: the engine's 100 TB scale-hygiene checks as a public
API.

Every operator in this repo is held to a set of physical-plan
invariants by the test suite (tests/test_plan_shapes.py sweeps the
whole query catalog): no cartesian products, no accidental
nested-loop joins, no global Sort/Window funnels through a single
partition, no row-at-a-time Python UDFs on the hot path, and filters/
projections pushed into the parquet scan. This module exposes those
checks so USER pipelines built on the library can enforce the same
invariants — in CI, or as a guard before launching a large job:

    from ezdata_spark.plans import assert_scale_safe, scan_report
    assert_scale_safe(df)           # raises with findings if unsafe
    scan_report(df)                 # [{'pushed_filters': [...], ...}]

All checks parse the compiled PHYSICAL plan (what will actually run,
after Catalyst), not the logical one, so they see through the
optimizer: a filter that failed to push down, a join that silently
degraded to BNLJ because a key was lost, a window someone forgot to
partition.

Heuristics note: the detectors string-match Spark's physical-plan
rendering (stable across 3.x/4.x for these node names). They are
advisory — a flagged plan is worth a look, not automatically wrong;
``assert_scale_safe`` takes ``allow`` knobs for the legitimate
exceptions (e.g. a broadcast 1-row scalar fold-in plans as BNLJ).

AQE caveat: before execution, an adaptive plan renders as its INITIAL
physical plan (``AdaptiveSparkPlan isFinalPlan=false``) — runtime
re-optimizations (a sort-merge join AQE later converts to broadcast,
skew-join splits, partition coalescing) are NOT visible yet, so a
pre-run audit can differ from what actually executes. The checks here
are still sound as a pre-launch screen (AQE makes plans safer, not
less safe: it never introduces a cartesian product or un-pushes a
filter), but for the executed truth pass ``final=True`` to
:func:`physical_plan` / :func:`audit` / :func:`assert_scale_safe`,
which materializes the frame once (a JVM-side distributed count of
the result RDD — nothing is collected to the driver) and renders the
FINAL adaptive plan.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

__all__ = [
    "physical_plan",
    "explain_text",
    "scan_report",
    "single_partition_funnels",
    "audit",
    "assert_scale_safe",
]


def physical_plan(df: DataFrame, final: bool = False) -> str:
    """The compiled physical plan as text (ASCII tree). Node lines are
    width-truncated by Spark's renderer — fine for the node-presence
    checks here; :func:`scan_report` uses the formatted explain, whose
    per-field lines are complete.

    Under AQE this is the INITIAL adaptive plan until the frame has
    executed (module docstring); ``final=True`` runs the plan once
    (distributed JVM-side count of the result RDD, no driver
    collection) so the rendering reflects the final adaptive plan."""
    jplan = df._jdf.queryExecution().executedPlan()
    if not final:
        return jplan.toString()
    jplan.execute().count()
    jplan = df._jdf.queryExecution().executedPlan()
    # a finalized AdaptiveSparkPlanExec renders BOTH '== Final Plan =='
    # and '== Initial Plan ==' subtrees when they differ — substring
    # checks over that would still see initial-plan-only nodes (and the
    # section headers break the funnel walker's parent-depth walk), so
    # return the final physical subtree alone. ASPE exposes it as
    # executedPlan(); a non-adaptive root has no such method — its
    # toString is already the single executed plan.
    try:
        return jplan.executedPlan().toString()
    except Exception:  # noqa: BLE001 - py4j method-missing on non-ASPE roots
        txt = jplan.toString()
        cut = txt.find("== Initial Plan ==")
        return _strip_section_headers(txt if cut < 0 else txt[:cut])


def _strip_section_headers(txt: str) -> str:
    """Drop '== Final Plan ==' style section-header lines — a bare
    header would break single_partition_funnels' parent-depth indent
    walk (it has no operator indentation)."""
    return "\n".join(
        ln for ln in txt.splitlines()
        if not (ln.startswith("== ") and ln.rstrip().endswith(" =="))
    )


def explain_text(df: DataFrame, mode: str = "formatted") -> str:
    """`df.explain(mode)` as a string instead of stdout."""
    jqe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    return jqe.explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def scan_report(df: DataFrame) -> list[dict]:
    """One dict per file scan in the plan: ``pushed_filters`` (the
    predicates the parquet reader will evaluate against row-group
    statistics), ``partition_filters`` (partition pruning, incl.
    dynamic), and ``read_schema`` (the columns actually read — column
    pruning evidence). Empty pushed_filters on a filtered scan, or a
    read_schema much wider than the query's projection, are the two
    classic lost-pushdown smells."""
    out = []
    rec = None
    for line in explain_text(df, "formatted").splitlines():
        s = line.strip()
        m = re.match(r"\(\d+\) Scan ", s)
        if m:
            if rec is not None:
                out.append(rec)
            rec = {
                "scan": s,
                "pushed_filters": [],
                "partition_filters": [],
                "read_schema": [],
            }
            continue
        if rec is None:
            continue
        if not s:  # blank line ends the scan's field block
            out.append(rec)
            rec = None
            continue
        for key, label in (
            ("pushed_filters", "PushedFilters"),
            ("partition_filters", "PartitionFilters"),
        ):
            fm = re.match(rf"{label}: \[(.*)\]$", s)
            if fm:
                rec[key] = _split_top_level(fm.group(1))
        fm = re.match(r"ReadSchema: struct<(.*)>$", s)
        if fm:
            rec["read_schema"] = [
                c.split(":")[0].strip()
                for c in _split_top_level(fm.group(1))
            ]
    if rec is not None:
        out.append(rec)
    return out


def _split_top_level(s: str) -> list[str]:
    """Split a rendered list on commas OUTSIDE any nesting — filter
    arguments (``In(lang, [de,en,fr])`` is ONE filter) and schema type
    parameters (``price:decimal(10,2)``, ``m:map<string,bigint>`` are
    ONE field each). Depth clamps at zero so an unbalanced closer
    inside a data-derived string value corrupts at most its own entry,
    not every entry after it."""
    parts, buf, depth = [], [], 0
    for ch in s:
        if ch in "([<":
            depth += 1
        elif ch in ")]>":
            depth = max(0, depth - 1)
        if ch == "," and depth == 0:
            parts.append("".join(buf).strip())
            buf = []
        else:
            buf.append(ch)
    tail = "".join(buf).strip()
    if tail:
        parts.append(tail)
    return [p for p in parts if p]


def single_partition_funnels(plan: str) -> list[str]:
    """Operators fed by an ``Exchange SinglePartition`` that funnel ALL
    data rows through one task: Sort / Window / WindowGroupLimit
    parents. (An ungrouped scalar aggregate's final reduce also runs on
    one partition, but its input is one row per upstream task — that is
    fine and not reported.)"""
    lines = plan.splitlines()

    def depth(line: str) -> int:
        m = max(line.find("+- "), line.find(":- "))
        return m if m >= 0 else -1  # root

    bad = []
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        d = depth(line)
        for j in range(i - 1, -1, -1):
            if depth(lines[j]) < d:
                parent = lines[j].strip().lstrip("+-:").strip()
                # drop the whole-stage-codegen prefix ("*(2) Sort ...")
                parent = re.sub(r"^\*?\(\d+\)\s*", "", parent)
                # exact operator-NAME match: "SortAggregate" (a scalar
                # aggregate's legitimate one-row-per-task reduce) must
                # NOT match "Sort"
                name = re.match(r"[A-Za-z]+", parent)
                if name and name.group(0) in (
                    "Sort",
                    "Window",
                    "WindowGroupLimit",
                    "WindowInPandas",
                ):
                    bad.append(name.group(0))
                break
    return bad


def audit(df: DataFrame, final: bool = False) -> dict:
    """Inspect the physical plan for the scale hazards the library's
    own catalog is tested against. Returns a findings dict::

        {'cartesian': bool,             # CartesianProduct node
         'nested_loop_join': bool,      # BroadcastNestedLoopJoin node
         'global_funnels': [str, ...],  # single-partition Sort/Window
         'python_row_udfs': bool,       # BatchEvalPython (non-Arrow)
         'scans': [...]}                # scan_report(df)

    Arrow-vectorized Python (``ArrowEvalPython``, ``mapInPandas``,
    pandas UDFs) is NOT flagged — that is the sanctioned Python
    boundary; ``BatchEvalPython`` is the row-at-a-time slow path.

    ``final=True`` executes the frame once so the audit reads the
    FINAL adaptive plan instead of AQE's initial one (module
    docstring).
    """
    plan = physical_plan(df, final=final)
    return {
        "cartesian": "CartesianProduct" in plan,
        "nested_loop_join": "BroadcastNestedLoopJoin" in plan,
        "global_funnels": single_partition_funnels(plan),
        "python_row_udfs": "BatchEvalPython" in plan,
        "scans": scan_report(df),
    }


def assert_scale_safe(
    df: DataFrame,
    allow_nested_loop_join: bool = False,
    allow_python_row_udfs: bool = False,
    final: bool = False,
) -> dict:
    """Raise ``ValueError`` listing every hazard :func:`audit` finds
    (minus the explicitly allowed ones); returns the findings dict when
    clean. ``allow_nested_loop_join`` is for the legitimate broadcast
    1-row scalar fold-in shape; cartesian products and global funnels
    have no sanctioned use in this engine and cannot be waived.
    ``final=True`` audits the executed adaptive plan (runs the frame
    once) rather than AQE's initial plan."""
    found = audit(df, final=final)
    problems = []
    if found["cartesian"]:
        problems.append("CartesianProduct (keyless join?)")
    if found["nested_loop_join"] and not allow_nested_loop_join:
        problems.append(
            "BroadcastNestedLoopJoin (non-equi join? pass "
            "allow_nested_loop_join=True for a broadcast 1-row scalar fold-in)"
        )
    for op in found["global_funnels"]:
        problems.append(
            f"single-partition exchange feeding {op} (global sort/window "
            "funnel — partition the window or use a distributed prefix-sum)"
        )
    if found["python_row_udfs"] and not allow_python_row_udfs:
        problems.append(
            "BatchEvalPython (row-at-a-time Python UDF — use built-in "
            "functions or an Arrow-batched pandas UDF)"
        )
    if problems:
        raise ValueError(
            "plan is not scale-safe:\n  - " + "\n  - ".join(problems)
        )
    return found
