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


@query(
    "graph_triangle_count",
    oracle="""
    WITH e AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM lineitem a
        JOIN lineitem b ON a.l_orderkey = b.l_orderkey
                       AND a.l_partkey < b.l_partkey
    ),
    nodes AS (
        SELECT count(DISTINCT x) AS n FROM (
            SELECT u AS x FROM e UNION SELECT v FROM e
        )
    )
    SELECT CAST((SELECT n FROM nodes) AS BIGINT) AS n_nodes,
           CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
           CAST((SELECT count(*)
                 FROM e e1
                 JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
                 JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v)
                AS BIGINT) AS n_triangles
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle counting on the part co-purchase graph (parts that
    appear in the same order are connected) — the clustering / community
    signal of market-basket analytics, and the canonical "join explosion
    you must orient" graph kernel.

    Scale shape: the DEGREE-ORDERED ORIENTATION algorithm (each edge
    directed from its lower-(degree, id) endpoint), which bounds wedge
    generation by O(m^1.5) regardless of degree skew — a celebrity node
    with degree 10^6 produces no wedge storm because its edges all point
    INTO it (out-degree of every node ≤ O(√m)). Wedges (u→v, u→w) join
    against oriented edges (v→w) to close triangles: three shuffles total
    (degree count, wedge build, closing join), all partial-aggregated.
    Each triangle is counted exactly once — orientation induces a total
    order, so the count equals the oracle's u<v<w enumeration.

    Edge building is bounded by construction: pairs explode within an
    order (≤ k lineitems → k²/2 pairs), never across orders.
    """
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.alias("a")
    b = li.alias("b")
    edges = (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
        .distinct()
    )
    edges = edges.localCheckpoint(eager=False)
    deg = (
        edges.select(F.col("u").alias("x"))
        .unionAll(edges.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # orient: src = endpoint with the smaller (degree, id) pair
    du = deg.select(F.col("x").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("x").alias("v"), F.col("d").alias("dv"))
    ranked = edges.join(du, "u").join(dv, "v")
    lower_u = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = ranked.select(
        F.when(lower_u, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(
            lower_u,
            F.struct(F.col("dv").alias("deg"), F.col("v").alias("id")),
        )
        .otherwise(
            F.struct(F.col("du").alias("deg"), F.col("u").alias("id"))
        )
        .alias("dst"),  # carry (degree, id) so wedge ordering is total
    ).localCheckpoint(eager=False)
    w1 = oriented.select("src", F.col("dst").alias("d1"))
    w2 = oriented.select("src", F.col("dst").alias("d2"))
    wedges = (
        w1.join(w2, "src")
        .filter(F.col("d1") < F.col("d2"))  # struct order = orientation order
        .select(
            F.col("d1").getField("id").alias("wu"),
            F.col("d2").getField("id").alias("wv"),
        )
    )
    closing = oriented.select(
        F.col("src").alias("wu"), F.col("dst").getField("id").alias("wv")
    )
    n_tri = wedges.join(closing, ["wu", "wv"]).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_triangles")
    )
    n_nodes = deg.agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
    n_edges = edges.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    return n_nodes.crossJoin(n_edges).crossJoin(n_tri)


@query(
    "graph_degree_distribution",
    oracle="""
    WITH e AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM lineitem a
        JOIN lineitem b ON a.l_orderkey = b.l_orderkey
                       AND a.l_partkey < b.l_partkey
    ),
    deg AS (
        SELECT x, CAST(count(*) AS BIGINT) AS d FROM (
            SELECT u AS x FROM e UNION ALL SELECT v FROM e
        ) GROUP BY x
    ),
    binned AS (
        SELECT CAST(floor(ln(d) / ln(2)) AS BIGINT) AS log2_bin,
               d
        FROM deg
    )
    SELECT log2_bin,
           CAST(power(2, log2_bin) AS BIGINT) AS bin_lo,
           CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(min(d) AS BIGINT) AS min_degree,
           CAST(max(d) AS BIGINT) AS max_degree
    FROM binned GROUP BY log2_bin
    """,
)
def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log₂-binned degree histogram of the co-purchase graph — the
    skew-diagnostic every graph job runs FIRST (a heavy tail here is what
    makes the unoriented triangle join explode, and what decides salting /
    orientation strategy). Bin boundaries are powers of two, so the
    floor(log₂ d) bin index is exact for every int degree: ln(d)/ln(2) is
    computed from identical operands in both engines and the floor of it
    can only disagree where d is an exact power of two — where the IEEE
    quotient is exact anyway.

    Shape: one bounded pair-explosion (within orders), one degree count
    shuffle, then a collapse to ≤ 64 histogram rows. At 100 TB this is
    two partial-aggregated exchanges; the histogram itself is driver-tiny.
    """
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.alias("a")
    b = li.alias("b")
    edges = (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
        .distinct()
    )
    deg = (
        edges.select(F.col("u").alias("x"))
        .unionAll(edges.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    binned = deg.select(
        F.floor(F.log(F.col("d").cast("double")) / F.log(F.lit(2.0)))
        .cast("bigint")
        .alias("log2_bin"),
        "d",
    )
    return (
        binned.groupBy("log2_bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
            F.min("d").cast("bigint").alias("min_degree"),
            F.max("d").cast("bigint").alias("max_degree"),
        )
        .select(
            "log2_bin",
            F.pow(F.lit(2.0), F.col("log2_bin")).cast("bigint").alias("bin_lo"),
            "n_nodes",
            "min_degree",
            "max_degree",
        )
    )
