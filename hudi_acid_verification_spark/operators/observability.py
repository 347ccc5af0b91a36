"""Plan observability operators (round 8, VERDICT r7 #5 fourth candidate).

The engine asserts its physical-plan properties in tests
(tests/test_plans.py); production platforms also need them as DATA — a
nightly job that records which join strategies the optimizer actually
chose for the workload's flagship queries, so a stats regression (lost
broadcast, surprise cartesian) shows up as a diff in a table instead of
a latency page. This is the observability twin of `join_strategy_hints`
(which FORCES strategies); here the engine's own choices are emitted.

Rows-only by design: the output describes Spark's physical planning, so
no DuckDB oracle can exist; determinism on the fixed fixtures is pinned
by tests/test_plans.py instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import QUERIES, query

# the audited flagship queries: the TPC-H composites whose join trees
# exercise every strategy class the optimizer picks between
_AUDIT_QUERIES = (
    "q3_shipping_priority",
    "q5_region_revenue",
    "q7_nation_volume",
    "q8_market_share",
    "q9_profit_proxy",
    "q10_returned_revenue",
)
_JOIN_NODES = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
)


def _walk(node):
    yield node
    children = node.children()
    for i in range(children.size()):
        yield from _walk(children.apply(i))


def _count_join_nodes(tree: str) -> dict[str, int]:
    """Count physical join nodes from ONE ``treeString`` (optimization
    r8): the per-node py4j walk paid a JVM round trip per plan node
    (hundreds per composite — half this operator's wall time); parsing
    the single string is one round trip per query. A node line's head is
    its name after the indent/codegen prefix (``+-``, ``:-``, ``*(n)``),
    so expression text can never false-match; verified row-identical to
    the node walk on all audited composites. (Unlike ``children()``, the
    tree string also prints subquery inner children — none of the
    audited composites has one, and a strategy chosen inside a subquery
    would BELONG in this audit anyway.)"""
    counts = {s: 0 for s in _JOIN_NODES}
    for line in tree.splitlines():
        head = line.lstrip(" :+-*(0123456789)")
        for s in _JOIN_NODES:
            if head.startswith(s):
                counts[s] += 1
                break
    return counts


@query("audit_join_strategies")  # rows-only: describes Spark's own planning
def audit_join_strategies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOIN-STRATEGY audit: plan (never execute) each flagship TPC-H
    composite and emit one row per (query, join strategy) with the count
    of physical join nodes using it — the table a platform's nightly
    plan-regression monitor diffs. A lost broadcast (dimension outgrew
    the threshold, stats went stale) or a surprise CartesianProduct
    appears here before it appears in the latency dashboard.

    Cost shape: pure driver-side planning — ``sparkPlan`` forces
    analysis+optimization+strategy selection but runs NO job and reads
    no data beyond file-listing metadata, so the audit is O(plans),
    data-size independent. The emitted DataFrame is assembled with
    ``createDataFrame`` from the (queries × strategies)-bounded counts —
    a driver-side constant, not a collect of distributed data."""
    # The audited plans are independent, so optimize+plan them
    # CONCURRENTLY (guide-§2.6 shape applied to driver-side work:
    # Catalyst planning runs in the JVM, one thread per plan, no jobs);
    # measured serial planning was ~0.7 s per composite and dominated
    # this operator. treeString + Python-side counting keeps the py4j
    # traffic to one round trip per query (r8; see _count_join_nodes).
    from concurrent.futures import ThreadPoolExecutor

    def plan_one(qname: str):
        # construction itself is hundreds of py4j round trips per
        # composite — the dominant cost — and each call releases the
        # GIL on the socket, so building in the pool overlaps them too
        df = QUERIES[qname](spark, sf_dir)
        return qname, df._jdf.queryExecution().sparkPlan().treeString()

    with ThreadPoolExecutor(max_workers=len(_AUDIT_QUERIES)) as pool:
        trees = list(pool.map(plan_one, _AUDIT_QUERIES))
    rows: list[tuple[str, str, int]] = []
    for qname, tree in trees:
        counts = _count_join_nodes(tree)
        rows.extend(
            (qname, s, c) for s, c in sorted(counts.items()) if c > 0
        )
    return spark.createDataFrame(
        rows, "query string, join_strategy string, n_joins bigint"
    )
