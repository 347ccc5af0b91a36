"""Third batch of composite analytics shapes (TPC-H Q2/Q6/Q8/Q9/Q11/Q13/
Q16/Q20 style) — completing the TPC-H plan-shape coverage on the driver's
reduced fixture schema (TESTDATA.md: no partsupp table, so the part↔supplier
relation and its cost/availability analogs derive from lineitem; each query
keeps its namesake's PLAN SHAPE, which is what matters for the engine).

Shapes and why they matter at 100 TB:
- Q2  min-per-group scalar subquery decorrelated to an aggregate + join-back
  (pick the argmin row, not just the min value) + deterministic top-k.
- Q6  pure scan-filter-aggregate: the no-join baseline every scan
  optimization (pushdown, pruning, vectorization) shows up in.
- Q8  market-share ratio: two-level dimension closure (customer→nation→
  region and supplier→nation) feeding a conditional ratio per year.
- Q9  profit decomposition: 5-way join with a LIKE-filtered dimension and a
  two-term decimal measure, grouped by nation × year.
- Q11 group + global-scalar-threshold (HAVING share-of-total) — the scalar
  broadcasts back, integer-scaled to stay exact.
- Q13 outer-join count distribution (customers with zero orders must
  survive) — two cascaded aggregations.
- Q16 distinct-count per attribute triple with a NOT-IN exclusion
  decorrelated to an anti join over a pre-distinct pair set.
- Q20 nested share-of-part threshold (2·supplier_qty > part_total) via two
  aggregation levels joined back — semi-join chain up to the supplier dim.

Float discipline (oracle bit-parity): money/quantity sums go through
DECIMAL(18,4); share thresholds use integer-scaled decimal comparisons
(1000·v > total, 2·q > total) instead of float multiplies; ratios are one
double divide of two exact decimal sums (correctly-rounded IEEE, identical
in both engines); years are integer extracts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import load, query
from .composite2 import _DEC2, _VOLUME_SQL, _volume


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
               * CAST(l_discount AS DECIMAL(18,4))), 4) AS DOUBLE) AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q6-style forecast revenue: scan → filter → global aggregate,
    no joins — the baseline where scan efficiency is the whole query. All
    three predicates (date range, discount band, quantity cap) must reach
    the parquet scan (asserted in test_plans); the aggregate is one row, so
    partial aggregation does ~all the work map-side and the exchange moves
    a handful of bytes.
    """
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast(_DEC2)
                    * F.col("l_discount").cast(_DEC2)
                ),
                4,
            ).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "q13_custdist",
    oracle="""
    WITH c_orders AS (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o
          ON o.o_custkey = c.c_custkey
         AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    SELECT c_count, count(*) AS custdist
    FROM c_orders GROUP BY c_count
    """,
)
def q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q13-style customer order-count distribution: LEFT OUTER join
    (customers with zero qualifying orders must appear as c_count=0 — an
    inner join silently drops them) with an extra join-time predicate,
    then two cascaded aggregations.

    Scale notes: the outer join shuffles on custkey and the first
    aggregate reuses that partitioning (no second exchange); the
    distribution aggregate is tiny. The filter on the orders side applies
    BEFORE the join (pushed beneath the outer join by Catalyst — safe
    because it references only the preserved-null side's input).
    """
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q8_market_share",
    oracle=f"""
    WITH flat AS (
        SELECT year(o.o_orderdate) AS o_year,
               {_VOLUME_SQL} AS volume,
               sn.n_name AS supp_nation
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = 'PROMO'
        JOIN orders o ON o.o_orderkey = l.l_orderkey
         AND o.o_orderdate >= TIMESTAMP '1995-01-01'
         AND o.o_orderdate < TIMESTAMP '1997-01-01'
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation cn ON cn.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = cn.n_regionkey AND r.r_name = 'ASIA'
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation sn ON sn.n_nationkey = s.s_nationkey
    )
    SELECT o_year,
           CAST(round(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume END), 4)
                AS DOUBLE)
           / CAST(round(sum(volume), 4) AS DOUBLE) AS mkt_share,
           count(*) AS n_lines
    FROM flat GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q8-style national market share: the fraction of ASIA's PROMO
    order volume supplied by NATION_3, per order year — a 7-way join
    closing two dimension chains (customer→nation→region gates the demand
    side; supplier→nation labels the supply side) into one conditional
    ratio.

    Share math: both sums accumulate as DECIMAL(18,4) (order-independent),
    and the share is one double divide of the two — bit-identical across
    engines. NULL when a year has no NATION_3 volume (CASE without ELSE),
    matching SQL semantics.

    Scale notes: every dimension here broadcasts (nation/region/customer/
    supplier/part are all ≪ fact); the only fact-sized shuffle is
    lineitem⋈orders on orderkey, and the date gate prunes orders before
    that join. Group-by year is ~7 groups — the aggregate is all map-side.
    """
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    s = load(spark, sf_dir, "supplier")
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    flat = (
        li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(c), c.c_custkey == o.o_custkey)
        .join(F.broadcast(cn), F.col("cn_key") == c.c_nationkey)
        .join(F.broadcast(r), r.r_regionkey == F.col("cn_region"))
        .join(F.broadcast(s), s.s_suppkey == li.l_suppkey)
        .join(F.broadcast(sn), F.col("sn_key") == s.s_nationkey)
        .select(
            F.year("o_orderdate").alias("o_year"),
            _volume().alias("volume"),
            "supp_nation",
        )
    )
    agg = flat.groupBy("o_year").agg(
        F.sum(
            F.when(F.col("supp_nation") == "NATION_3", F.col("volume"))
        ).alias("nat"),
        F.sum("volume").alias("total"),
        F.count(F.lit(1)).alias("n_lines"),
    )
    return agg.select(
        "o_year",
        # ratio operands rounded to scale 4 first — exact double conversion
        (
            F.round(F.col("nat"), 4).cast("double")
            / F.round(F.col("total"), 4).cast("double")
        ).alias("mkt_share"),
        "n_lines",
    )


@query(
    "q9_profit_proxy",
    oracle=f"""
    SELECT sn.n_name AS nation, year(o.o_orderdate) AS o_year,
           CAST(round(sum({_VOLUME_SQL}
               - CAST(p.p_retailprice * 0.1 AS DECIMAL(18,4))
                 * CAST(l.l_quantity AS DECIMAL(18,4))), 4) AS DOUBLE) AS profit,
           count(*) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%widget%'
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation sn ON sn.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY sn.n_name, year(o.o_orderdate)
    """,
)
def q9_profit_proxy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q9-style product-line profit by supplier nation × order year.
    The fixture has no partsupp.ps_supplycost, so unit cost is proxied as
    10% of p_retailprice — the PLAN shape (LIKE-filtered part dim, 5-way
    join, two-term measure, nation×year rollup) is the namesake's.

    Decimal discipline: the cost term quantizes `retailprice·0.1` (one
    IEEE double multiply, identical both engines) to DECIMAL(18,4) BEFORE
    the decimal×decimal quantity product, keeping every accumulated term
    inside DECIMAL(37,8) — a three-way decimal product would overflow
    precision 38 and fall back to engine-specific behavior.

    Scale notes: part/supplier/nation broadcast; lineitem⋈orders is the
    one fact shuffle. The LIKE '%widget%' can't prune the scan (no prefix)
    but cuts the join input in the same stage.
    """
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = load(spark, sf_dir, "supplier")
    sn = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation")
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    cost = (F.col("p_retailprice") * F.lit(0.1)).cast(_DEC2) * F.col(
        "l_quantity"
    ).cast(_DEC2)
    return (
        li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
        .join(F.broadcast(s), s.s_suppkey == li.l_suppkey)
        .join(F.broadcast(sn), F.col("sn_key") == s.s_nationkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(F.sum(_volume() - cost), 4).cast("double").alias("profit"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "q11_important_value",
    oracle="""
    WITH v AS (
        SELECT l.l_partkey AS partkey,
               sum(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS part_value
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
         AND n.n_name = 'NATION_1'
        GROUP BY l.l_partkey
    )
    SELECT partkey, CAST(part_value AS DOUBLE) AS part_value FROM v
    WHERE 1000 * part_value > (SELECT sum(part_value) FROM v)
    """,
)
def q11_important_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q11-style important-stock filter: per-part value supplied by
    one nation's suppliers, keeping parts above a fixed share of the
    nation's total — a grouped aggregate gated by a GLOBAL scalar
    aggregate of itself.

    The share threshold is integer-scaled (1000·v > total) on exact
    decimal sums — no float multiply, so the boundary rows are identical
    in both engines. The global total is a window over the ALREADY
    AGGREGATED frame (an empty partitionBy — fine here because the frame
    is aggregate-sized, ~#parts rows), so the fact is scanned exactly
    once and nothing needs caching.

    Scale notes: supplier/nation broadcast into the fact scan; one shuffle
    on partkey. The self-threshold pattern needs no second scan of the
    fact — only the (much smaller) per-part aggregate funnels through the
    single-partition window.
    """
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    v = (
        li.join(F.broadcast(s), s.s_suppkey == li.l_suppkey)
        .join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(
            F.sum(F.col("l_extendedprice").cast(_DEC2)).alias("part_value")
        )
    )
    total = F.sum("part_value").over(Window.partitionBy())
    return (
        v.withColumn("__total", total)
        # share threshold on EXACT decimals; double only in the output
        .filter(F.col("part_value") * 1000 > F.col("__total"))
        .select("partkey", F.col("part_value").cast("double").alias("part_value"))
    )


@query(
    "q16_supplier_cnt",
    oracle="""
    WITH pairs AS (
        SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    )
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT pr.l_suppkey) AS supplier_cnt
    FROM pairs pr
    JOIN part p ON p.p_partkey = pr.l_partkey
    WHERE p.p_brand <> 'Brand#4'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND pr.l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q16-style supplier diversity count: distinct suppliers per
    (brand, type, size) triple, excluding a complaint set — here suppliers
    with negative balance, standing in for the comment-LIKE exclusion the
    fixture lacks. The part↔supplier relation derives from lineitem
    (no partsupp table): a pre-DISTINCT pair projection collapses the
    fact before any join touches it.

    The NOT IN decorrelates to a broadcast anti join — safe because
    s_suppkey is non-null (a nullable NOT-IN list would legally empty the
    result; the anti join implements the intended semantics, same stance
    as the reference's DELETE defect D2 fix).

    Scale notes: the DISTINCT pair set is the expensive shuffle, so the
    selective part predicate semi-joins into the fact BEFORE it
    (broadcast on surviving partkeys — optimization r8): the exchange
    carries only pair rows that can survive the final inner part join,
    on the narrowest possible projection; everything after (part filter
    join, anti join, distinct count) runs on pair cardinality, not fact
    cardinality.
    """
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#4")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    # Optimization r8 (guide §3.2, the q2 lesson): the part predicate
    # keeps ~1/7 of partkeys and the final join is INNER on part, so
    # restricting the fact BEFORE the distinct-pair shuffle is exact —
    # a broadcast semi-join on surviving partkeys cuts the expensive
    # exchange to the selectivity of the part filter.
    pairs = (
        load(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .join(
            F.broadcast(p.select("p_partkey")),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .distinct()
    )
    excluded = load(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select(F.col("s_suppkey").alias("l_suppkey"))
    return (
        pairs.join(F.broadcast(excluded), "l_suppkey", "left_anti")
        .join(F.broadcast(p), p.p_partkey == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q20_excess_suppliers",
    oracle="""
    WITH shipped AS (
        SELECT l_partkey, l_suppkey,
               sum(CAST(l_quantity AS DECIMAL(18,4))) AS qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY l_partkey, l_suppkey
    ),
    tot AS (
        SELECT l_partkey, sum(qty) AS total_qty FROM shipped GROUP BY l_partkey
    )
    SELECT DISTINCT s.s_suppkey, s.s_name
    FROM shipped sh
    JOIN tot ON tot.l_partkey = sh.l_partkey
    JOIN part p ON p.p_partkey = sh.l_partkey AND p.p_name LIKE 'blue%'
    JOIN supplier s ON s.s_suppkey = sh.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey AND n.n_name = 'NATION_2'
    WHERE 2 * sh.qty > tot.total_qty
    """,
)
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q20-style dominant-supplier detection: NATION_2 suppliers who
    shipped MORE THAN HALF of a blue part's 1997 volume — two aggregation
    levels (per pair, then per part) joined back, then a semi-style climb
    to the supplier dimension. The availqty threshold of the namesake
    becomes a share-of-part threshold on lineitem-derived quantities.

    The half-share test is `2·qty > total` on exact decimal sums — integer
    doubling instead of a 0.5 float multiply, so boundary equality (a
    supplier with exactly half) excludes identically in both engines.

    Scale notes: both aggregations shuffle on partkey(-led) keys, so the
    second reuses the first's partitioning; part/supplier/nation broadcast.
    The date gate prunes the fact scan before any aggregation.
    """
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast(_DEC2)).alias("qty")
    )
    tot = shipped.groupBy("l_partkey").agg(F.sum("qty").alias("total_qty"))
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("blue%"))
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_2")
    return (
        shipped.join(tot, "l_partkey")
        .filter(F.col("qty") * 2 > F.col("total_qty"))
        .join(F.broadcast(p), p.p_partkey == F.col("l_partkey"))
        .join(F.broadcast(s), s.s_suppkey == F.col("l_suppkey"))
        .join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .select("s_suppkey", "s_name")
        .distinct()
    )


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH cost AS (
        SELECT l_partkey, l_suppkey,
               min(CAST(l_extendedprice AS DECIMAL(18,4))) AS pair_cost
        FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    best AS (
        SELECT l_partkey, min(pair_cost) AS best_cost
        FROM cost GROUP BY l_partkey
    )
    SELECT p.p_partkey, p.p_brand, s.s_name, s.s_acctbal,
           CAST(c.pair_cost AS DOUBLE) AS best_cost
    FROM cost c
    JOIN best b ON b.l_partkey = c.l_partkey AND c.pair_cost = b.best_cost
    JOIN part p ON p.p_partkey = c.l_partkey
     AND p.p_size = 25 AND p.p_type = 'LARGE'
    JOIN supplier s ON s.s_suppkey = c.l_suppkey
    ORDER BY s.s_acctbal DESC, s.s_suppkey, p.p_partkey
    LIMIT 20
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q2-style minimum-cost supplier: for each size-25 LARGE part,
    the supplier(s) achieving the minimum observed price — the correlated
    `= (SELECT min(...))` scalar subquery, decorrelated into a per-part
    aggregate joined back on (part, value) so the ARGMIN ROWS survive, not
    just the min value. Cost analog: min observed l_extendedprice per
    (part, supplier) pair (no partsupp in the fixture).

    Determinism: ties (several suppliers at the min) are all kept, then
    the top-20 orders by (acctbal DESC, suppkey, partkey) — a total order,
    so the LIMIT cuts identically in both engines.

    Scale notes: the selective part predicate is applied to the FACT
    before the pair aggregate via a broadcast semi-join on the surviving
    part keys (optimization r8, guide §3.2 — the earlier shape aggregated
    every (part, supplier) pair and filtered afterwards, shuffling the
    full pair domain for rows the part join would discard; the per-part
    minimum over the kept parts is unchanged by dropping parts never
    output). The pair aggregate is then the one fact shuffle; `best`
    reuses its partitioning (partkey prefix). The join-back is
    aggregate-sized, part/supplier broadcast, and the global top-20 plans
    as TakeOrderedAndProject — no full sort.
    """
    p_keys = (
        load(spark, sf_dir, "part")
        .filter((F.col("p_size") == 25) & (F.col("p_type") == "LARGE"))
        .select(F.col("p_partkey").alias("l_partkey"))
    )
    cost = (
        load(spark, sf_dir, "lineitem")
        .join(F.broadcast(p_keys), "l_partkey", "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice").cast(_DEC2)).alias("pair_cost"))
    )
    # explicit renames break the shared lineage (cost → best is a self-
    # derived frame; joining on same-named columns would be ambiguous)
    best = (
        cost.groupBy("l_partkey")
        .agg(F.min("pair_cost").alias("best_cost"))
        .select(F.col("l_partkey").alias("b_partkey"), "best_cost")
    )
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_size") == 25) & (F.col("p_type") == "LARGE")
    )
    s = load(spark, sf_dir, "supplier")
    return (
        cost.join(
            best,
            (F.col("b_partkey") == F.col("l_partkey"))
            & (F.col("pair_cost") == F.col("best_cost")),
        )
        .join(F.broadcast(p), p.p_partkey == F.col("l_partkey"))
        .join(F.broadcast(s), s.s_suppkey == F.col("l_suppkey"))
        .select(
            "p_partkey", "p_brand", "s_name", "s_acctbal", "s_suppkey",
            # min-equality matched on the EXACT decimal; double in the output
            F.col("pair_cost").cast("double").alias("best_cost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "s_suppkey", "p_partkey")
        .limit(20)
        .drop("s_suppkey")
    )
