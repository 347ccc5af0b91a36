"""Correlated-subquery shapes (TPC-H Q4/Q17 style) — EXISTS and scalar
correlated subqueries expressed in their decorrelated DataFrame form, the
plan Catalyst itself would rewrite them to. Writing the decorrelated form
directly documents the scale behavior: EXISTS → left-semi hash join (no row
multiplication), scalar avg-per-key → one pre-aggregation plus an equi-join
instead of a per-row subquery execution.

Adaptation note: the fixture lineitem carries only l_shipdate (no
commit/receipt dates, TESTDATA.md), so Q4's "late delivery" EXISTS becomes
"shipped after the order date" — same shape, same decorrelation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load, query

_DEC2 = "decimal(18,4)"


@query(
    "q4_order_priority",
    oracle="""
    SELECT o.o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-07-01'
      AND o.o_orderdate < TIMESTAMP '1997-10-01'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate
      )
    GROUP BY o.o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q4-style: orders in a quarter with at least one late-shipped
    line, counted per priority. EXISTS decorrelates to a left-semi join on
    (orderkey, shipdate > orderdate) — the semi join emits each order at
    most once, so no pre-join dedup of lineitem is needed.
    """
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "q17_small_qty_revenue",
    oracle="""
    WITH avg_qty AS (
        SELECT l_partkey,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                   / count(*) AS avg_quantity
        FROM lineitem GROUP BY l_partkey
    )
    SELECT p.p_brand,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
               AS small_qty_revenue,
           count(*) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN avg_qty a ON a.l_partkey = l.l_partkey
    WHERE p.p_brand IN ('Brand#2', 'Brand#4')
      AND l.l_quantity < 0.5 * a.avg_quantity
    GROUP BY p.p_brand
    """,
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q17-style: revenue of below-half-average-quantity lines for two
    brands. The correlated scalar subquery avg(l_quantity) per partkey is
    decorrelated into one grouped pre-aggregation joined back to the fact —
    lineitem is scanned twice but shuffles on the same key both times, and
    AQE can reuse the exchange. The avg is an exact decimal sum divided by
    the count in ONE double division, so both engines bit-agree on the
    0.5·avg comparison.
    """
    li = load(spark, sf_dir, "lineitem")
    avg_qty = li.groupBy("l_partkey").agg(
        (
            F.sum(F.col("l_quantity").cast(_DEC2)).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_quantity")
    )
    p = load(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#2", "Brand#4")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(avg_qty, "l_partkey")
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_quantity"))
        .groupBy("p_brand")
        .agg(
            F.sum(F.col("l_extendedprice").cast(_DEC2))
            .cast("double")
            .alias("small_qty_revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )
