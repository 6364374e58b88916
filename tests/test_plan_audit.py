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


def _fact_tainted_broadcasts():
    """AST sweep of entrypoints.py: every explicit ``F.broadcast(x)`` where
    ``x`` (transitively) derives from an SF-proportional table (lineitem /
    orders / customer / part / partsupp, including the lineitem-derived
    ``_supply`` relation).

    A broadcast hint forces the exchange regardless of runtime size, so a
    hint on an SF-proportional frame is the classic 100×-scale killer: it
    may fit at sf0.1 and OOM every executor at SF100.  customer (SF×150k)
    and part (SF×200k) grow linearly just like the facts — a hint on them,
    even region/segment-filtered (1/5 of the table), is a forced multi-GB
    exchange at SF100.  Bounded dimensions (region=5, nation=25) and
    SF×10k supplier are fine and not tainted; provably-tiny filtered
    frames go on the explicit allowlist below with a size argument.
    """
    import ast
    import inspect

    src = inspect.getsource(ep)
    tree = ast.parse(src)
    FACTS = {"lineitem", "orders", "customer", "part", "partsupp"}
    flagged = set()

    def names_in(node):
        return {n.id for n in ast.walk(node) if isinstance(n, ast.Name)}

    def load_tables_in(node):
        out = set()
        for n in ast.walk(node):
            if isinstance(n, ast.Call):
                fn = n.func
                if isinstance(fn, ast.Name) and fn.id == "load":
                    for a in n.args:
                        if isinstance(a, ast.Constant) and a.value in FACTS:
                            out.add(a.value)
                if isinstance(fn, ast.Name) and fn.id == "_supply":
                    out.add("lineitem")
        return out

    for fn in tree.body:
        if not isinstance(fn, (ast.FunctionDef, ast.AsyncFunctionDef)):
            continue
        taint = {}  # var name -> set of fact tables it derives from

        def expr_taint(node):
            t = set(load_tables_in(node))
            for name in names_in(node):
                t |= taint.get(name, set())
            return t

        for stmt in ast.walk(fn):
            if isinstance(stmt, ast.Assign) and len(stmt.targets) == 1 and isinstance(
                stmt.targets[0], ast.Name
            ):
                taint[stmt.targets[0].id] = expr_taint(stmt.value)
            elif isinstance(stmt, ast.Call):
                f = stmt.func
                is_bc = (isinstance(f, ast.Attribute) and f.attr == "broadcast") or (
                    isinstance(f, ast.Name) and f.id == "broadcast"
                )
                if is_bc and stmt.args:
                    t = expr_taint(stmt.args[0])
                    if t & FACTS:
                        arg = ast.unparse(stmt.args[0])
                        flagged.add((fn.name, arg.split(".")[0]))
    return flagged


# SF-proportional-derived broadcasts that are provably tiny at any SF:
#   q15 `top`      — global max over the per-supplier aggregate: ≤ a few rows.
#   q2  `part`     — ONE p_type × ONE p_size (≈1/7500 of part: SF×27 rows).
#   q2  `min_cost` — per-part min cost keyed on that same 1/7500 part set.
#   q8  `part`     — ONE p_type (1/150 of part: SF×1.3k rows, ~130k keys at
#                    SF100 — a few MB of longs).
# Anything NOT in this list that broadcasts a frame derived from an
# SF-proportional table fails the audit — add here only with a
# multiplicative-selectivity size argument that holds at SF1000.
ALLOWED_FACT_BROADCASTS = {
    ("q_tpch_q15", "top"),
    ("q_tpch_q2", "part"),
    ("q_tpch_q2", "min_cost"),
    ("q_tpch_q8", "part"),
}


def test_no_unjustified_fact_scale_broadcasts():
    extra = _fact_tainted_broadcasts() - ALLOWED_FACT_BROADCASTS
    assert not extra, (
        "explicit broadcast() on fact-derived frames (scale hazard): "
        f"{sorted(extra)} — remove the hint (AQE will broadcast when truly "
        "small) or allowlist with a size justification"
    )


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    """Narrow filters must reach the parquet scan (PushedFilters), and the
    scan must prune to the referenced columns (ReadSchema)."""
    df = ep.q_tpch_q6(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    # Q6 reads only 4 lineitem columns — the scan schema must not contain
    # untouched wide columns like l_comment-style fields
    assert "l_partkey" not in plan.split("ReadSchema")[1][:400]
