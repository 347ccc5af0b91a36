"""materialize_once: staged shared intermediates (r5).

Six graph operators, five shingle consumers, and the two LSH dup-pair
consumers all start from a shared build-side artifact; ``materialize_once``
stages each artifact once per (SparkContext, canonicalized plan). These
tests pin the contract: memo hits are plan-keyed (variants never collide),
and staged rows are identical to a fresh build.
"""

from __future__ import annotations

from pyspark.sql import functions as F

import hudi_acid_verification_spark.operators as ops
from hudi_acid_verification_spark.operators import load, materialize_once

SF_SMALL = "/root/testdata/sf0.001"


def test_same_plan_same_object(spark):
    """Two independently-constructed but semantically-equal plans must
    resolve to ONE staged artifact (expression ids are normalized by the
    canonicalized-plan key)."""
    a = materialize_once(
        load(spark, SF_SMALL, "region").select("r_regionkey")
    )
    b = materialize_once(
        load(spark, SF_SMALL, "region").select("r_regionkey")
    )
    assert a is b


def test_variant_plans_do_not_collide(spark):
    """A filter upstream of the staging point is part of the key: the
    sampled variant must stage separately and keep its own rows."""
    base = load(spark, SF_SMALL, "nation").select("n_nationkey")
    full = materialize_once(base)
    sampled = materialize_once(base.filter(F.col("n_nationkey") % 5 == 0))
    assert full is not sampled
    assert full.count() == 25
    assert sampled.count() == 5


def test_staged_rows_equal_fresh_build(spark):
    """The staged co-purchase edge list must be row-identical to a fresh
    (unstaged) build of the same plan."""
    from hudi_acid_verification_spark.operators.graph import (
        _pair_edges,
        _pair_edges_plan,
    )

    li = load(spark, SF_SMALL, "lineitem").select("l_orderkey", "l_partkey")
    staged = {(r["u"], r["v"]) for r in _pair_edges(li).collect()}
    fresh = {(r["u"], r["v"]) for r in _pair_edges_plan(li).collect()}
    assert staged == fresh
    assert len(staged) > 0


def test_staged_cn_derivation_equals_fresh_build(spark):
    """The staging registrar derives the cn variant from the staged FULL
    edge list (optimization r9) and registers it under the operators' own
    staged key: the derived rows must equal a fresh lineitem-side build
    of the cn variant (the vertex filter commutes with per-order pair
    generation), and a consumer's later lookup must HIT that entry."""
    from hudi_acid_verification_spark.operators.graph import (
        _pair_edges_plan,
        _stage_copurchase_edges,
        _variant_key,
        _variant_li,
    )

    ops._ONCE.clear()
    _stage_copurchase_edges(spark, SF_SMALL)
    sc = spark.sparkContext
    key = (
        sc.applicationId,
        "named\x00" + f"pair_edges:{_variant_key(SF_SMALL, 'cn')}" + "\x00",
    )
    derived = ops._ONCE.get(key)
    assert derived is not None, "cn entry must be staged by the registrar"
    fresh = _pair_edges_plan(_variant_li(spark, SF_SMALL, "cn"))
    a = {(r["u"], r["v"]) for r in derived.collect()}
    b = {(r["u"], r["v"]) for r in fresh.collect()}
    assert a == b and len(a) > 0


def test_graph_consumers_share_one_staging(spark):
    """Running two full-edge-list graph operators must stage the edge
    build once: the second query reuses the first's artifact. The
    triangle consumers additionally share ONE staged orientation + ONE
    staged triangle list (optimization r8) — the third consumer adds no
    new artifacts at all."""
    ops._ONCE.clear()
    ops.QUERIES["graph_degree_distribution"](spark, SF_SMALL).collect()
    n_after_first = len(ops._ONCE)
    ops.QUERIES["graph_triangle_count"](spark, SF_SMALL).collect()
    # triangle count reuses the edge artifact and stages exactly the
    # oriented edge list + the triangle list on top of it
    assert len(ops._ONCE) == n_after_first + 2
    n_after_tri = len(ops._ONCE)
    ops.QUERIES["graph_clustering_coefficient"](spark, SF_SMALL).collect()
    ops.QUERIES["graph_neighborhood_jaccard"](spark, SF_SMALL).collect()
    # both triangle-kernel consumers reuse the staged kernel wholesale
    assert len(ops._ONCE) == n_after_tri


def test_lru_eviction_bounds_cache_and_rebuilds(spark, monkeypatch):
    """VERDICT r5 #2: the staged-artifact cache must be bounded. Past
    _ONCE_MAX the least-recently-used entry is evicted, and a re-request
    of an evicted plan rebuilds with identical rows."""
    ops._ONCE.clear()
    monkeypatch.setattr(ops, "_ONCE_MAX", 3)
    base = load(spark, SF_SMALL, "nation").select("n_nationkey")
    staged = [
        materialize_once(base.filter(F.col("n_nationkey") % 7 == r))
        for r in range(3)
    ]
    assert len(ops._ONCE) == 3
    first_rows = {r["n_nationkey"] for r in staged[0].collect()}
    # touching an entry refreshes its LRU position: re-request plan 0,
    # then insert a 4th — plan 1 (now oldest) must be the eviction victim
    assert materialize_once(base.filter(F.col("n_nationkey") % 7 == 0)) is staged[0]
    materialize_once(base.filter(F.col("n_nationkey") % 7 == 3))
    assert len(ops._ONCE) == 3
    assert materialize_once(base.filter(F.col("n_nationkey") % 7 == 0)) is staged[0]
    rebuilt = materialize_once(base.filter(F.col("n_nationkey") % 7 == 1))
    assert rebuilt is not staged[1], "evicted entry must rebuild"
    assert {r["n_nationkey"] for r in rebuilt.collect()} == {
        r["n_nationkey"] for r in staged[1].collect()
    }
    # and the re-staged plan 0 still serves the same rows
    assert {r["n_nationkey"] for r in staged[0].collect()} == first_rows
    ops._ONCE.clear()


def test_extra_key_separates_closure_variants(spark):
    """ADVICE r5: parameters invisible to the canonicalized plan (closure
    constants) must key separately via extra_key — same plan, different
    extra_key, different staged artifact."""
    ops._ONCE.clear()
    base = load(spark, SF_SMALL, "region").select("r_regionkey")
    a = materialize_once(base, extra_key="tau=0.35")
    b = materialize_once(base, extra_key="tau=0.50")
    assert a is not b
    assert materialize_once(base, extra_key="tau=0.35") is a
    ops._ONCE.clear()


def test_dead_context_entries_dropped_on_insert(spark):
    """Entries keyed by a dead SparkContext pin nothing useful (their
    checkpointed blocks died with the context) — the next insert sweeps
    them."""
    ops._ONCE.clear()
    base = load(spark, SF_SMALL, "region").select("r_regionkey")
    live = materialize_once(base)
    ops._ONCE[("app-deadbeef", "x" * 64)] = live  # simulated dead entry
    materialize_once(base.filter(F.col("r_regionkey") >= 0))
    assert ("app-deadbeef", "x" * 64) not in ops._ONCE
    ops._ONCE.clear()


def test_staged_artifacts_distinct_across_fixture_dirs(spark):
    """Round-8 regression (the bench_scale 10x bug): canonicalized plans
    erase BOTH the parquet path (``Relation [...] parquet``) and the
    checkpointed-RDD identity (``LogicalRDD [schema]``), so without
    ``_plan_source_identity`` in the cache key a session touching two
    fixture dirs silently served the FIRST dir's staged artifact to the
    second — bench_scale's 10x tier consumed 1x artifacts and every
    staged-consumer ratio in BENCH_SCALE r7 measured cache reuse, not
    scaling."""
    ops._ONCE.clear()
    sf_medium = "/root/testdata/sf0.01"
    a = materialize_once(load(spark, SF_SMALL, "embeddings").select("vec_id"))
    b = materialize_once(load(spark, sf_medium, "embeddings").select("vec_id"))
    assert a is not b, "two fixture dirs must stage two artifacts"
    assert a is materialize_once(
        load(spark, SF_SMALL, "embeddings").select("vec_id")
    ), "same dir must still cache-hit"
    # checkpoint-ROOTED plans (the staged-artifact-of-a-staged-artifact
    # case, e.g. dup pairs filtered from band pairs): identical schemas,
    # identical canonicalized strings, different RDD ids — must not merge
    fa = materialize_once(a.filter(F.col("vec_id") % 2 == 0))
    fb = materialize_once(b.filter(F.col("vec_id") % 2 == 0))
    assert fa is not fb
    assert fa is materialize_once(a.filter(F.col("vec_id") % 2 == 0))


def test_named_staged_fast_path_contract(spark):
    """The r8 named fast path (`operators.staged`): O(1) name-keyed hits
    return the SAME artifact without re-running the builder; distinct
    names, fixture dirs, and extra_keys never collide; and the staged
    rows equal a fresh (unstaged) build of the same plan."""
    from hudi_acid_verification_spark.operators import staged

    ops._ONCE.clear()
    calls = {"n": 0}
    base = load(spark, SF_SMALL, "region").select("r_regionkey")

    def build():
        calls["n"] += 1
        return base

    a = staged(spark, f"t:{SF_SMALL}", build)
    assert staged(spark, f"t:{SF_SMALL}", build) is a
    assert calls["n"] == 1, "memo hit must not re-run the builder"
    assert staged(spark, f"t:{SF_SMALL}x", build) is not a  # name keys
    assert staged(spark, f"t:{SF_SMALL}", build, extra_key="tau=2") is not a
    assert calls["n"] == 3
    ops._ONCE.clear()
    # converted artifact: staged rows == fresh plan rows
    from hudi_acid_verification_spark.operators.dedup import (
        _capped_shingles_plan,
        _capped_shingles_spark,
    )

    got = {
        (r["doc_id"], r["h"])
        for r in _capped_shingles_spark(spark, SF_SMALL).collect()
    }
    fresh = {
        (r["doc_id"], r["h"])
        for r in _capped_shingles_plan(spark, SF_SMALL).collect()
    }
    assert got == fresh and len(got) > 0
    ops._ONCE.clear()
