"""Physical-plan audit over the whole contract query surface.

Catches scale regressions at test time that correctness checks can't see:
a cartesian product, a BroadcastNestedLoopJoin (quadratic row-pair
evaluation), or a row-at-a-time Python UDF (BatchEvalPython) sneaking
into any QUERIES entry. Arrow-batched pandas operators (MapInPandas /
FlatMapGroupsInPandas) are the sanctioned Python path and pass.
"""

import pytest

from rottnest_spark import entrypoints as ep

FORBIDDEN = (
    "CartesianProduct",
    "BroadcastNestedLoopJoin",
    "BatchEvalPython",  # row-at-a-time Python UDF — the slow path
)

# Queries whose DataFrame is produced by driver-side composition of several
# jobs (index probe plans run eagerly inside); audit the FINAL frame only.
ALL_QUERIES = sorted(ep.QUERIES)


@pytest.mark.parametrize("name", ALL_QUERIES)
def test_no_forbidden_physical_operators(spark, sf_dir, name):
    df = ep.QUERIES[name](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for op in FORBIDDEN:
        assert op not in plan, f"{name}: forbidden operator {op} in plan:\n{plan}"


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    """Narrow filters must reach the parquet scan (PushedFilters), and the
    scan must prune to the referenced columns (ReadSchema)."""
    df = ep.q_tpch_q6(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    # Q6 reads only 4 lineitem columns — the scan schema must not contain
    # untouched wide columns like l_comment-style fields
    assert "l_partkey" not in plan.split("ReadSchema")[1][:400]
