"""Second batch of composite analytics shapes (TPC-H Q7/Q12/Q14/Q19/Q21/Q22
style), adapted to the driver's reduced fixture schema (TESTDATA.md has no
shipmode/commitdate/partsupp/phone columns — each query keeps the *plan
shape* of its TPC-H namesake on the columns that exist).

These extend the north-star analytics surface (BASELINE.json) beyond the
reference's own DML-only operators (SURVEY.md §2A ends at MERGE/DELETE;
§2B adds the analytics inventory these register into).

Shapes covered here and why they matter at 100 TB:
- Q7  double-dimension join (nation × nation) with a disjunctive pair
  filter — join-order + broadcast selection on a self-joined dimension.
- Q12 conditional aggregation (CASE inside SUM) — one fact shuffle, no
  second pass per condition.
- Q14 ratio-of-sums — single-scan global aggregate; the ratio must be
  computed once on the driver side of the agg, not via a self-join.
- Q19 OR-of-ANDs predicate — tests that the disjunction still prunes
  (per-branch pushdown) and stays inside one scan.
- Q21 multi-correlated EXISTS / NOT EXISTS on the same fact — decorrelated
  to one distinct projection + semi + anti join, all sharing the orderkey
  shuffle.
- Q22 scalar subquery (global avg) + anti join — the scalar broadcasts,
  the anti-join prunes with a broadcast of order customer keys.

Float discipline (oracle bit-parity): money sums go through DECIMAL(18,4)
(order-independent integer arithmetic); averages are re-derived as
CAST(decimal_sum AS DOUBLE)/count with the same textual expression in both
engines (one correctly-rounded IEEE divide).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load, query

_DEC2 = "decimal(18,4)"
_VOLUME_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,4))"
    " * CAST(1.0 - l_discount AS DECIMAL(18,4))"
)


def _volume() -> F.Column:
    return F.col("l_extendedprice").cast(_DEC2) * (
        F.lit(1.0) - F.col("l_discount")
    ).cast(_DEC2)


@query(
    "q7_nation_volume",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(round(sum(volume), 4) AS DOUBLE) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               year(l.l_shipdate) AS l_year,
               {_VOLUME_SQL} AS volume
        FROM supplier s
        JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
        JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate < TIMESTAMP '1998-01-01'
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q7-style bilateral trade volume: lineitem joined to BOTH a
    supplier-side and a customer-side nation dimension, keeping only one
    nation pair (in either direction), grouped by direction and ship year.

    Scale notes: both nation joins BROADCAST (the disjunctive pair filter
    applies after the two-sided join, on broadcast rows — no extra
    shuffle); the only shuffles are lineitem⋈orders on orderkey and the
    final (nation, nation, year) aggregate, which is tiny.
    """
    s = load(spark, sf_dir, "supplier")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            _volume().alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum("volume"), 4).cast("double").alias("revenue"))
    )


@query(
    "q12_priority_by_flag",
    oracle="""
    SELECT l.l_returnflag,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l.l_returnflag
    """,
)
def q12_priority_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q12-style conditional aggregation: per return flag, how many
    1997 shipments belonged to high- vs low-priority orders — both counts
    from ONE pass (CASE inside SUM), not two filtered scans.
    """
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q14_promo_revenue",
    oracle=f"""
    SELECT 100.0 * CAST(round(sum(CASE WHEN p.p_type = 'PROMO'
                                 THEN {_VOLUME_SQL} END), 4) AS DOUBLE)
                 / CAST(round(sum({_VOLUME_SQL}), 4) AS DOUBLE) AS promo_revenue_pct,
           count(*) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-06-01'
      AND l.l_shipdate < TIMESTAMP '1997-09-01'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q14-style promo revenue ratio: one scan computes both the
    conditional and total revenue sums; the percentage is derived from the
    two DECIMAL sums with one double divide (bit-identical across engines
    because both operands convert exactly the same and the divide is a
    single correctly-rounded IEEE op).

    Scale notes: part joins on partkey — at 100 TB the part side buckets
    or broadcasts per AQE; the aggregate itself is global (one row), so
    partial aggregation does almost all the work map-side.
    """
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-06-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-09-01").cast("timestamp"))
    )
    p = load(spark, sf_dir, "part")
    agg = (
        li.join(p, p.p_partkey == li.l_partkey)
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", _volume())).alias("promo"),
            F.sum(_volume()).alias("total"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )
    return agg.select(
        # ratio operands rounded to scale 4 first — exact double conversion
        # (raw scale-8 sums can exceed 2^53 unscaled and double-round
        # differently per engine)
        (
            F.lit(100.0)
            * F.round(F.col("promo"), 4).cast("double")
            / F.round(F.col("total"), 4).cast("double")
        ).alias("promo_revenue_pct"),
        "n_lines",
    )


@query(
    "q19_disjunctive_pred",
    oracle=f"""
    SELECT CAST(round(sum({_VOLUME_SQL}), 4) AS DOUBLE) AS revenue,
           count(*) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q19-style OR-of-ANDs predicate over a fact⋈dimension join.

    Scale notes: Catalyst extracts the common single-side conjuncts of the
    disjunction (`p_brand IN (...)`, the size/quantity range hull) and
    pushes them below the join into both scans, so the OR does not defeat
    pushdown; the residual disjunction evaluates post-join inside codegen.
    """
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    q = F.col("l_quantity")
    sz = F.col("p_size")
    branch = (
        ((F.col("p_brand") == "Brand#12") & sz.between(1, 15) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & sz.between(1, 25) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & sz.between(1, 35) & q.between(20, 30))
    )
    return (
        li.join(p, p.p_partkey == li.l_partkey)
        .filter(branch)
        .agg(
            F.round(F.sum(_volume()), 4).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "q21_sole_returner",
    oracle="""
    WITH r AS (
        SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
        WHERE l_returnflag = 'R'
    ),
    a AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
    SELECT s.s_name, count(*) AS numwait
    FROM r
    JOIN supplier s ON s.s_suppkey = r.l_suppkey
    WHERE EXISTS (
        SELECT 1 FROM a
        WHERE a.l_orderkey = r.l_orderkey AND a.l_suppkey <> r.l_suppkey
    )
    AND NOT EXISTS (
        SELECT 1 FROM r r2
        WHERE r2.l_orderkey = r.l_orderkey AND r2.l_suppkey <> r.l_suppkey
    )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
)
def q21_sole_returner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q21-style double-correlated EXISTS / NOT EXISTS: suppliers who
    were the ONLY supplier with returned lines on a multi-supplier order
    (the reference shape's "kept orders waiting" with returnflag standing
    in for the missing commit/receipt dates).

    Decorrelation: the COUNTED leg collapses to the distinct (orderkey,
    suppkey) projection of lineitem; EXISTS → left-semi join, NOT EXISTS
    → left-anti join, each an equi-join on orderkey with the suppkey
    inequality as the join residual. The PROBE sides of the semi and
    anti joins are deliberately NOT deduplicated (optimization r8):
    semi/anti existence is unchanged by duplicate probe rows, so the
    raw projections skip one exact-distinct aggregation each — two
    fewer exchanges for bit-identical output. All three legs share one
    orderkey shuffle partitioning; the supplier dimension broadcasts.
    """
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    r = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    a = li.select(
        F.col("l_orderkey").alias("a_orderkey"),
        F.col("l_suppkey").alias("a_suppkey"),
    )
    r2 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("r2_orderkey"),
        F.col("l_suppkey").alias("r2_suppkey"),
    )
    multi = r.join(
        a,
        (F.col("l_orderkey") == F.col("a_orderkey"))
        & (F.col("l_suppkey") != F.col("a_suppkey")),
        "left_semi",
    )
    sole = multi.join(
        r2,
        (F.col("l_orderkey") == F.col("r2_orderkey"))
        & (F.col("l_suppkey") != F.col("r2_suppkey")),
        "left_anti",
    )
    return (
        sole.join(F.broadcast(s), sole.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@query(
    "q22_idle_customers",
    oracle="""
    WITH pool AS (
        SELECT c_custkey % 10 AS cntrycode, c_custkey, c_acctbal
        FROM customer
        WHERE c_custkey % 10 IN (1, 3, 5, 7)
    ),
    avg_bal AS (
        SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
               / count(*) AS a
        FROM pool WHERE c_acctbal > 0.0
    )
    SELECT cntrycode, count(*) AS numcust,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS totacctbal
    FROM pool, avg_bal
    WHERE c_acctbal > a
      AND NOT EXISTS (
          SELECT 1 FROM orders o WHERE o.o_custkey = pool.c_custkey
      )
    GROUP BY cntrycode
    """,
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q22-style: rich customers (above the average positive balance
    of their cohort, cohort = custkey mod 10 standing in for the missing
    phone country code) who have never placed an order.

    Decorrelation: the scalar AVG computes once and joins as a broadcast
    single-row cross join; NOT EXISTS(orders) is a left-anti join on
    custkey. The average is CAST(decimal_sum AS DOUBLE)/count — the same
    two exact operands and one IEEE divide in both engines.
    """
    pool = (
        load(spark, sf_dir, "customer")
        .filter((F.col("c_custkey") % 10).isin(1, 3, 5, 7))
        .select(
            (F.col("c_custkey") % 10).alias("cntrycode"),
            "c_custkey",
            "c_acctbal",
        )
    )
    avg_bal = pool.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast(_DEC2)).cast("double")
            / F.count(F.lit(1))
        ).alias("a")
    )
    o = load(spark, sf_dir, "orders").select(F.col("o_custkey"))
    return (
        pool.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(o, pool.c_custkey == o.o_custkey, "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast(_DEC2)).cast("double").alias("totacctbal"),
        )
    )


@query(
    "q10_returned_revenue",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           CAST(round(sum({_VOLUME_SQL}), 4) AS DOUBLE) AS revenue,
           c.c_acctbal, n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-07-01'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY sum({_VOLUME_SQL}) DESC, c.c_custkey
    LIMIT 20
    """,
)
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q10-style returned-item reporting: the 20 customers with the
    most revenue in returned ('R') lines over a half-year of orders.

    Scale notes: the date filter prunes orders BEFORE the fact-fact join;
    returnflag prunes lineitem at the scan; nation broadcasts; the final
    top-20 is a TakeOrdered over the grouped result, no full sort.
    """
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_volume()).alias("revenue_dec"))
        # order + cut on the EXACT decimal, cast only in the final projection
        .orderBy(F.col("revenue_dec").desc(), "c_custkey")
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            F.round(F.col("revenue_dec"), 4).cast("double").alias("revenue"),
            "c_acctbal",
            "n_name",
        )
    )


@query(
    "q15_top_supplier",
    oracle=f"""
    WITH rev AS (
        SELECT l_suppkey, sum({_VOLUME_SQL}) AS total_revenue
        FROM lineitem l
        WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
          AND l.l_shipdate < TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(round(r.total_revenue, 4) AS DOUBLE) AS total_revenue
    FROM supplier s
    JOIN rev r ON r.l_suppkey = s.s_suppkey
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q15-style top supplier: the supplier(s) whose quarterly revenue
    equals the global maximum — a reused aggregate (the "view") consumed
    twice: once for the per-supplier totals, once reduced to the scalar max
    that filters them.

    Determinism: revenue is a DECIMAL sum, so the max-equality comparison
    is exact in both engines (double revenue would make ties
    engine-dependent). Scale notes: rev shuffles once on suppkey; the max
    is a single-row broadcast; supplier joins broadcast-wise.
    """
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(F.sum(_volume()).alias("total_revenue"))
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    s = load(spark, sf_dir, "supplier")
    return (
        s.join(rev, rev.l_suppkey == s.s_suppkey)
        .crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        # max-equality tested on the EXACT decimal; double only in the output
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("total_revenue"), 4).cast("double").alias("total_revenue"),
        )
    )
