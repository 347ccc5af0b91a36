"""Set operations (SURVEY.md §2B: set_union_except_intersect).

One query exercising UNION (distinct), EXCEPT ALL and INTERSECT ALL, with a
branch tag so all three land in a single comparable result.

Scale notes: UNION distinct and INTERSECT/EXCEPT shuffle on the full row;
at 100 TB prefer pre-aggregated keys (as here — we operate on key columns,
not wide rows). Spark plans EXCEPT ALL/INTERSECT ALL as left-anti/left-semi
style joins with multiplicity counters — same shuffle shape as a join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load, query


@query(
    "set_union_except_intersect",
    oracle="""
    WITH building AS (
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    ),
    big_spenders AS (
        SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 250000.0
    )
    SELECT 'union' AS op, c_custkey FROM (
        SELECT c_custkey FROM building UNION SELECT c_custkey FROM big_spenders
    )
    UNION ALL
    SELECT 'except_all' AS op, c_custkey FROM (
        SELECT c_custkey FROM building EXCEPT ALL SELECT c_custkey FROM big_spenders
    )
    UNION ALL
    SELECT 'intersect_all' AS op, c_custkey FROM (
        SELECT c_custkey FROM building INTERSECT ALL SELECT c_custkey FROM big_spenders
    )
    """,
)
def set_union_except_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / EXCEPT ALL / INTERSECT ALL over customer-key sets, tagged."""
    building = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    big_spenders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 250000.0)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    tagged = [
        building.union(big_spenders).distinct().select(
            F.lit("union").alias("op"), "c_custkey"
        ),
        building.exceptAll(big_spenders).select(
            F.lit("except_all").alias("op"), "c_custkey"
        ),
        building.intersectAll(big_spenders).select(
            F.lit("intersect_all").alias("op"), "c_custkey"
        ),
    ]
    out = tagged[0]
    for t in tagged[1:]:
        out = out.unionByName(t)
    return out
