"""Semantic invariants for the round-3 operator families — properties the
DuckDB hash comparison cannot express (it proves Spark == oracle, not
that both are RIGHT). Each test pins the mathematical contract of an
operator on the sf0.001 fixture.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hudi_acid_verification_spark.operators import QUERIES

SF = "/root/testdata/sf0.001"


def test_penny_allocation_sums_exactly(spark):
    """Per order: allocated cents must sum EXACTLY to the rebate
    (floor(order_cents * 250 / 10000)) — the whole point of
    largest-remainder allocation."""
    out = QUERIES["scalar_penny_allocation"](spark, SF)
    check = (
        out.groupBy("l_orderkey")
        .agg(
            F.sum("alloc_cents").alias("allocated"),
            F.expr("CAST((sum(cents) * 250) DIV 10000 AS BIGINT)").alias(
                "rebate"
            ),
        )
        .filter(F.col("allocated") != F.col("rebate"))
        .count()
    )
    assert check == 0


def test_hll_estimate_within_bound(spark):
    """HLL with m=256 has ~6.5% relative standard error; the fixture
    estimate must land inside 3 sigma (~20%)."""
    row = QUERIES["sketch_hll_merge"](spark, SF).collect()[0]
    assert row["err_permille"] < 200, row


def test_passage_dedup_keeps_each_chunk_once(spark):
    """Across the whole corpus, the number of kept passages must equal
    the number of DISTINCT passages (each survives exactly once)."""
    from hudi_acid_verification_spark.operators import load

    out = QUERIES["pipeline_passage_dedup"](spark, SF)
    kept_total = out.agg(F.sum("n_kept")).collect()[0][0]
    d = load(spark, SF, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("t"))
    n_chunks = F.ceil(F.size("t") / F.lit(10.0)).cast("int")
    distinct_chunks = (
        toks.select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), n_chunks - 1),
                    lambda i: F.array_join(
                        F.slice(F.col("t"), i * 10 + 1, 10), " "
                    ),
                )
            ).alias("chunk")
        )
        .distinct()
        .count()
    )
    assert kept_total == distinct_chunks


def test_epoch_shuffle_orders_differ_and_reproduce(spark):
    """Different epochs must order documents differently; the same epoch
    must reproduce bit-identically across independent runs."""
    a = QUERIES["pipeline_epoch_shuffle"](spark, SF).collect()
    b = QUERIES["pipeline_epoch_shuffle"](spark, SF).collect()
    key = lambda rows: sorted(  # noqa: E731
        (r["epoch"], r["shard"], r["pos_in_shard"], r["doc_id"]) for r in rows
    )
    assert key(a) == key(b)  # reproducible
    by_epoch = {}
    for r in a:
        by_epoch.setdefault(r["epoch"], []).append(
            (r["shard"], r["pos_in_shard"], r["doc_id"])
        )
    orders = [tuple(sorted(v)) for v in by_epoch.values()]
    assert len(set(orders)) == len(orders)  # each epoch a different order


def test_asof_nearest_matches_bruteforce(spark):
    """The union-stream nearest join must agree with a brute-force
    per-user minimum on the small fixture."""
    from hudi_acid_verification_spark.operators import load

    out = {
        (r["user_id"], r["signup_event"]): r["dist_us"]
        for r in QUERIES["join_asof_nearest"](spark, SF).collect()
    }
    e = load(spark, SF, "events").select(
        "user_id", "event_type", "event_id", F.expr("ts_ns DIV 1000").alias("t")
    )
    s = e.filter(F.col("event_type") == "signup").collect()
    p = {}
    for r in e.filter(F.col("event_type") == "purchase").collect():
        p.setdefault(r["user_id"], []).append(r["t"])
    expected = {}
    for r in s:
        if r["user_id"] in p:
            expected[(r["user_id"], r["event_id"])] = min(
                abs(t - r["t"]) for t in p[r["user_id"]]
            )
    assert out == expected


def test_rfm_quartiles_are_balanced(spark):
    """ntile(4) bucket sizes may differ by at most one user per axis."""
    rows = QUERIES["event_rfm_segmentation"](spark, SF).collect()
    for axis in ("r_score", "f_score", "m_score"):
        per = {}
        for r in rows:
            per[r[axis]] = per.get(r[axis], 0) + r["n_users"]
        assert max(per.values()) - min(per.values()) <= 1, (axis, per)


def test_triangle_count_matches_naive_small(spark):
    """Degree-ordered orientation must count exactly what the naive
    u<v<w enumeration counts on the small fixture."""
    from hudi_acid_verification_spark.operators import load

    row = QUERIES["graph_triangle_count"](spark, SF).collect()[0]
    li = load(spark, SF, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
        .distinct()
    )
    es = {(r["u"], r["v"]) for r in edges.collect()}
    adj = {}
    for u, v in es:
        adj.setdefault(u, set()).add(v)
    naive = sum(
        1
        for (u, v) in es
        for w in adj.get(v, ())
        if (u, w) in es
    )
    assert row["n_triangles"] == naive
    assert row["n_edges"] == len(es)


def test_length_buckets_cover_all_docs(spark):
    """Every document lands in exactly one bucket; real_tokens never
    exceeds padded_tokens."""
    from hudi_acid_verification_spark.operators import load

    rows = QUERIES["pipeline_length_bucket_pack"](spark, SF).collect()
    n_docs = load(spark, SF, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    for r in rows:
        assert r["real_tokens"] <= r["padded_tokens"]


def test_benford_shares_sum_to_one(spark):
    """Observed first-digit shares must partition the probability mass."""
    rows = QUERIES["quality_benford_deviation"](spark, SF).collect()
    assert abs(sum(r["observed"] for r in rows) - 1.0) < 1e-9
