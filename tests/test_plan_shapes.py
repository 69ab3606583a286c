"""Plan-shape regression sweep: every catalog query's PHYSICAL plan is
checked for the scale anti-patterns that small-sf correctness tests
cannot catch — cartesian products, nested-loop joins, and windows over a
single-partition exchange. A query that passes its oracle but plans a
cross join would still be lethal at 100x data; this locks the plan
shapes audited in round 2/3.
"""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"

# Queries whose nested-loop join is deliberate and bounded:
# - q50_cosine_topk: brute-force baseline — scoring every (query, corpus)
#   pair IS the semantics; the query side is broadcast (tiny), the corpus
#   streams once. The scale path is q51/q78 (LSH) / q81 (IVF).
# - q52_embedding_neardup: exact theta-join pair scoring kept as the
#   small-sf oracle crosscheck; the exercised scale path is q83.
# - q27/q28 (histogram densify): the BNLJ is the bin-grid construction —
#   a crossJoin of generated/distinct frames whose size is bins x
#   categories, bounded by construction and independent of data rows.
# - q87/q88/q90 (corpus scoring): crossJoin(broadcast(1-row aggregate))
#   — corpus totals (N, avgdl, T/V) folded onto every row. The BNLJ's
#   build side is exactly one row by construction (an ungrouped agg),
#   so it is a broadcast scalar fold-in: O(n) stream, no shuffle.
BNLJ_ALLOWED = {
    "q50_cosine_topk",
    "q52_embedding_neardup",
    "q27_histogram_2d_weighted",
    "q28_binned_statistic_cat",
    "q87_tfidf_topterms",
    "q88_bm25_search",
    "q90_unigram_logprob",
    # q90a/q90b: same 1-row scalar fold-in as q90 — crossJoin(broadcast)
    # of the ungrouped corpus-token-total aggregate onto the scored stream
    "q90a_backoff_logprob",
    "q90b_backoff_external",
    # q111: same scalar fold-in — crossJoin(broadcast(1-row n_docs agg))
    # inside the on-the-fly idf weight derivation; production weights
    # arrive as a file and the fold-in disappears entirely
    "q111_linear_classifier",
    # z118: per-round crossJoin(broadcast(1-row dangling-mass agg)) —
    # the standard PageRank dangling redistribution, one scalar per
    # iteration folded onto the rank frame
    "z118_pagerank",
    # q119/q120: the same 1-row scalar fold-in — crossJoin(broadcast)
    # of ungrouped aggregates (triangle count / n, cardinalities) onto
    # a frame that is itself an aggregate result (graph census /
    # contingency cells), so both BNLJ sides are bounded
    "q119_triangle_census",
    "q120_mutual_information",
    # q131: crossJoin(broadcast(1-row total-revenue agg)) onto the
    # customer-level aggregate — the same bounded scalar fold-in
    "q131_pareto_contribution",
    # PQ's ADC pass deliberately scores every code word against the
    # broadcast query LUTs (the linear ADC scan of Jegou et al.) — the
    # compression is the point: m table lookups per vector over the
    # codes column only, with IVF cells as the pruning composition
    "z101_pq_ann",
    # z154: the exact-reference side IS q50's cosine_topk (the
    # allowlisted broadcast-queries crossJoin); topk_recall itself
    # adds only (query, id) equi-joins
    "z154_ann_recall",
}


def _catalog():
    import __spark_entry__ as entry_mod

    return entry_mod.queries()


@pytest.mark.parametrize("name", sorted(_catalog()))
def test_plan_shape(spark, name):
    fn = _catalog()[name]
    df = fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name}: cartesian product in plan"
    if name not in BNLJ_ALLOWED:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name}: nested-loop join in plan (non-equi or keyless join?)"
        )
    for parent in _single_partition_parents(plan):
        # an ungrouped (scalar) aggregate's final reduce legitimately
        # runs on one partition — its input is 1 row per upstream task.
        # The anti-pattern is a Sort/Window funnel: ALL data rows
        # through one task.
        assert not parent.startswith(("Sort", "Window", "WindowGroupLimit")), (
            f"{name}: single-partition exchange feeding {parent.split(' ')[0]} "
            f"(global sort funnel)"
        )


def _single_partition_parents(plan: str) -> list[str]:
    """Operator name of the tree-parent of every `Exchange
    SinglePartition` node (parent = nearest preceding line at lower
    tree depth, per the ASCII plan art)."""
    lines = plan.splitlines()

    def depth(line: str) -> int:
        m = max(line.find("+- "), line.find(":- "))
        return m if m >= 0 else -1  # root

    parents = []
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        d = depth(line)
        for j in range(i - 1, -1, -1):
            if depth(lines[j]) < d:
                parents.append(lines[j].strip().lstrip("+-:").strip())
                break
    return parents
