"""Iterative graph analytics over the order fixture's bipartite
customer–supplier graph (an edge where a lineitem connects them).

The reference has no graph surface; this is a north-star extension showing
the Pregel-style iterate-with-joins shape (the same loop GraphX/Spark's own
PageRank runs) expressed declaratively, with one twist that makes it
EXACTLY DuckDB-oracle-able: ranks are scaled int64 and every per-edge
contribution is an integer division — sums of integers are associative and
order-independent, so both engines produce bit-identical ranks no matter
how the partials are combined. (Float PageRank can only ever be compared
with tolerance; integer PageRank hashes.)

Scale notes (100 TB): each iteration is two edge-table shuffles with
map-side partial sums (contribution aggregation), degrees join on the edge
key co-partitioned — no driver state beyond the loop counter, no collect.
K iterations = 2K shuffles over |E|; at web scale the same loop runs with
localCheckpoint every few rounds to cap lineage (see dedup_components for
that pattern) — 3 rounds here keeps lineage trivially small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load, query

_PR_SCALE = 1_000_000  # rank fixed-point scale
_PR_ROUNDS = 3
_PR_TOP = 20
_PR_BASE = (15 * _PR_SCALE) // 100  # (1-d) mass, d = 0.85


def _pagerank_oracle() -> str:
    parts = [
        """edges AS (
        SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ),
    degc AS (SELECT c, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY c),
    degs AS (SELECT s, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY s),
    rc0 AS (SELECT c, CAST({S} AS BIGINT) AS r FROM degc),
    rs0 AS (SELECT s, CAST({S} AS BIGINT) AS r FROM degs)""".format(
            S=_PR_SCALE
        )
    ]
    for t in range(1, _PR_ROUNDS + 1):
        parts.append(
            f"""rs{t} AS (
        SELECT e.s, {_PR_BASE} + (85 * sum(rc.r // dc.d)) // 100 AS r
        FROM edges e
        JOIN rc{t - 1} rc ON rc.c = e.c
        JOIN degc dc ON dc.c = e.c
        GROUP BY e.s
    ),
    rc{t} AS (
        SELECT e.c, {_PR_BASE} + (85 * sum(rs.r // ds.d)) // 100 AS r
        FROM edges e
        JOIN rs{t - 1} rs ON rs.s = e.s
        JOIN degs ds ON ds.s = e.s
        GROUP BY e.c
    )"""
        )
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"""
    SELECT s AS suppkey, CAST(r AS BIGINT) AS rank
    FROM rs{_PR_ROUNDS}
    ORDER BY r DESC, s
    LIMIT {_PR_TOP}
    """
    )


@query("graph_pagerank_bipartite", oracle=_pagerank_oracle())
def graph_pagerank_bipartite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{K}-round synchronous PageRank on the bipartite customer–supplier
    graph; returns the top-{T} suppliers by final rank (tie-break on key).
    Scaled-integer arithmetic — see module docstring for why that makes an
    iterative algorithm hash-exact across engines.
    """
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
        .cache()
    )
    degc = edges.groupBy("c").agg(F.count(F.lit(1)).alias("dc"))
    degs = edges.groupBy("s").agg(F.count(F.lit(1)).alias("ds"))
    rc = degc.select("c", F.lit(_PR_SCALE).cast("bigint").alias("r"))
    rs = degs.select("s", F.lit(_PR_SCALE).cast("bigint").alias("r"))

    def half_step(ranks: DataFrame, deg: DataFrame, frm: str, to: str) -> DataFrame:
        contrib = (
            edges.join(ranks, frm)
            .join(deg, frm)
            .select(to, F.expr(f"r DIV d{frm}").alias("contrib"))
        )
        return contrib.groupBy(to).agg(
            (
                F.lit(_PR_BASE)
                + F.expr("(85 * sum(contrib)) DIV 100")
            ).cast("bigint").alias("r")
        )

    for _ in range(_PR_ROUNDS):
        rs_next = half_step(rc, degc, "c", "s")
        rc_next = half_step(rs, degs, "s", "c")
        rs, rc = rs_next, rc_next

    return (
        rs.orderBy(F.col("r").desc(), "s")
        .limit(_PR_TOP)
        .select(F.col("s").alias("suppkey"), F.col("r").alias("rank"))
    )
