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
BNLJ_ALLOWED = {
    "q50_cosine_topk",
    "q52_embedding_neardup",
    "q27_histogram_2d_weighted",
    "q28_binned_statistic_cat",
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
    if "Window" in plan:
        assert "Exchange SinglePartition" not in plan, (
            f"{name}: window over a single-partition exchange (global sort funnel)"
        )
