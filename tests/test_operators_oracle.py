"""Every registered operator with a DuckDB oracle must hash-match it at
sf0.001 (fast) — the local equivalent of the driver's t2 correctness gate.

Rows-only operators (no oracle) are smoke-checked: they run and return a
stable schema with >= 0 rows.
"""

from __future__ import annotations

import pytest

from hudi_acid_verification_spark import operators as ops
from tests.conftest import SF_SMALL
from tests.oracle_check import compare

ORACLED = sorted(ops.ORACLES)
ROWS_ONLY = sorted(set(ops.QUERIES) - set(ops.ORACLES))


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_parity(spark, name):
    df = ops.QUERIES[name](spark, SF_SMALL)
    compare(name, df, ops.ORACLES[name], SF_SMALL)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_smoke(spark, name):
    df = ops.QUERIES[name](spark, SF_SMALL)
    rows = df.collect()
    assert rows is not None
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())


def test_stream_stateful_fold_matches_batch(spark):
    """The final per-user state must equal the batch groupBy answer —
    incremental fold correctness, the property SQL can't oracle."""
    from hudi_acid_verification_spark.operators import load
    from pyspark.sql import functions as F

    got = {
        r["user_id"]: (r["n_purchases"], round(r["revenue"], 6))
        for r in ops.QUERIES["stream_stateful_fold"](spark, SF_SMALL).collect()
    }
    exp = {
        r["user_id"]: (r["n"], round(r["total"], 6))
        for r in (
            load(spark, SF_SMALL, "events")
            .filter(F.col("event_type") == "purchase")
            .groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("value").alias("total"),
            )
        ).collect()
    }
    assert got == exp


def test_approx_distinct_within_error_bound(spark):
    """HLL estimate must sit within 3× the configured rsd of the exact
    distinct count (rsd=0.02 → assert ±6%)."""
    from pyspark.sql import functions as F
    from hudi_acid_verification_spark.operators import load

    approx = {
        r["l_returnflag"]: r["approx_parts"]
        for r in ops.QUERIES["agg_approx_distinct"](spark, SF_SMALL).collect()
    }
    exact = {
        r["l_returnflag"]: r["n"]
        for r in (
            load(spark, SF_SMALL, "lineitem")
            .groupBy("l_returnflag")
            .agg(F.countDistinct("l_partkey").alias("n"))
        ).collect()
    }
    assert set(approx) == set(exact)
    for k, est in approx.items():
        assert abs(est - exact[k]) <= 0.06 * exact[k], (k, est, exact[k])


def test_acid_stream_ingest_matches_batch_union(spark):
    """Every streamed micro-batch lands as one atomic commit; the final
    snapshot must equal the batch-mode row set."""
    from pyspark.sql import functions as F
    from hudi_acid_verification_spark.operators import load

    snap = ops.QUERIES["acid_stream_ingest"](spark, SF_SMALL)
    n_purchases = (
        load(spark, SF_SMALL, "events")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    assert snap.count() == n_purchases


def test_certification_order_invariants():
    """The driver certifies the FIRST ~50 entries of queries() each round.
    Pin the auto-rotation: the base order covers the registry exactly with
    no dupes, and the emitted order is (never-certified oracled,
    never-certified rows-only, previously-certified) — so the window always
    spends itself on queries that still need a green row."""
    import __spark_entry__ as e

    order = e._CERT_ORDER
    assert len(order) == len(set(order)), "duplicate names in _CERT_ORDER"
    assert set(order) == set(ops.QUERIES), (
        "certification order out of sync with registry: "
        f"missing={set(ops.QUERIES) - set(order)} "
        f"stale={set(order) - set(ops.QUERIES)}"
    )
    emitted = list(e.queries())
    assert set(emitted) == set(ops.QUERIES)
    assert list(e.oracle_sql()) == [n for n in emitted if n in ops.ORACLES]

    done = e._certified_names()

    def cls(n: str) -> int:
        if n not in done:
            return 0 if n in ops.ORACLES else 1
        return 2

    classes = [cls(n) for n in emitted]
    # every pending query precedes every certified one
    if 2 in classes:
        first_cert = classes.index(2)
        assert all(c == 2 for c in classes[first_cert:]), (
            "rotation violated: certified entries must come last"
        )
    # the ~50-entry driver window must hold the interleave quota: up to
    # _WINDOW_ROWS_ONLY pending rows-only demos (so demos don't queue behind
    # the backlog), with pending oracled entries filling the other slots
    pending_oracled = [n for n in emitted if cls(n) == 0]
    pending_rows = [n for n in emitted if cls(n) == 1]
    window = set(emitted[:e._WINDOW_TOTAL])
    n_rows = min(len(pending_rows), e._WINDOW_ROWS_ONLY)
    n_oracled = e._WINDOW_TOTAL - n_rows
    assert set(pending_oracled[:n_oracled]) <= window
    assert set(pending_rows[:n_rows]) <= window


def test_certification_staleness_requeues_rewritten_plans():
    """cert_ledger.json records the source hash each driver row certified;
    a mismatching hash (plan rewritten after its green row) must drop the
    name from the certified set so it rotates back into the window
    (VERDICT r4 directive #2)."""
    import json
    import os

    import __spark_entry__ as e

    # _source_hash is stable and covers both function source and oracle SQL
    h1 = e._source_hash("dedup_exact")
    assert h1 == e._source_hash("dedup_exact") and len(h1) == 64
    assert e._source_hash("not_a_query") is None

    here = os.path.dirname(os.path.abspath(e.__file__))
    with open(os.path.join(here, "cert_ledger.json")) as f:
        ledger = json.load(f)
    done = e._certified_names()
    # every ledger entry whose hash mismatches the current source is pending
    for name, recorded in ledger.items():
        if name in ops.QUERIES and recorded != e._source_hash(name):
            assert name not in done, (
                f"{name}: ledger hash mismatch (rewritten plan) must re-queue"
            )
    # the three force-staled r4 rewrites are pending until a fresh green row
    for name in ("dedup_embedding_lsh", "dedup_components",
                 "dedup_group_split"):
        if ledger.get(name, "").startswith("stale:"):
            assert name not in done


def test_source_hash_covers_one_level_helpers():
    """VERDICT r5 "What's wrong" #1: the staleness hash must cover
    same-module private helpers one level deep, so a helper-only rewrite
    (the r5 staging pattern) re-queues its consumers automatically instead
    of relying on --force-stale discipline."""
    import inspect

    import __spark_entry__ as e
    from hudi_acid_verification_spark.operators import graph

    # editing _pair_edges must flip its registered consumers to stale:
    # their payloads embed the helper's source verbatim.
    helper_src = inspect.getsource(graph._pair_edges)
    for consumer in ("graph_triangle_count", "graph_degree_distribution",
                     "graph_common_neighbors", "graph_kcore_peel",
                     "graph_bfs_distance", "graph_label_propagation"):
        payload = e._hash_payload(consumer)
        assert payload is not None and helper_src in payload, (
            f"{consumer}: _pair_edges source must be in its staleness payload"
        )

    # same-module scalar constants referenced by the operator are covered
    # too (ADVICE r5: plan-invisible closure constants).
    from hudi_acid_verification_spark.operators import ann

    payload = e._hash_payload("dedup_embedding_lsh")
    assert f"_DUP_TAU={ann._DUP_TAU!r}" in payload

    # nested-code references are collected (a module-global helper used
    # only inside an inner def/lambda still counts as a one-level
    # reference). exec at module-style scope so `helper` is a global,
    # as it is in the real operator modules.
    ns: dict = {}
    exec(
        "def helper():\n    return 1\n"
        "def outer():\n"
        "    def inner():\n        return helper()\n"
        "    return inner\n",
        ns,
    )
    assert "helper" in e._collect_code_names(ns["outer"].__code__)

    # cross-module infrastructure stays OUT of the hash by design: a touch
    # to operators.load/materialize_once must not re-queue the registry.
    import hudi_acid_verification_spark.operators as pkg

    assert inspect.getsource(pkg.load) not in e._hash_payload("scan_project")


def test_acid_bloom_lookup_prunes_and_stays_exact(spark):
    """Every probe's lookup must be exact, the bloom candidate set must
    never exceed the range candidate set, and on the z-ordered layout it
    must genuinely prune (strictly fewer files for at least one probe)."""
    rows = ops.QUERIES["acid_bloom_lookup"](spark, SF_SMALL).collect()
    assert rows
    assert all(r["lookup_exact"] for r in rows)
    assert all(r["bloom_candidates"] <= r["range_candidates"] for r in rows)
    assert any(r["bloom_candidates"] < r["range_candidates"] for r in rows)
