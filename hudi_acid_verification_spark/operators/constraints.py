"""Declarative data-quality constraint suite (Deequ/Great-Expectations
shape): a named list of constraints over the warehouse tables evaluated in
as few scans as the constraints allow, returning one row per constraint
with the measured metric and a pass/fail verdict.

This is the validation stage every production pipeline runs between
ingestion and publication; expressing it IN the engine (instead of a
driver-side loop of count() calls) keeps it one job, partial-aggregated,
and cheap at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load, query

_PRIORITIES = (
    "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
)


def _constraints_oracle() -> str:
    pris = ", ".join(f"'{p}'" for p in _PRIORITIES)
    return f"""
    WITH o AS (
        SELECT
            CAST(count(*) AS BIGINT) AS n_rows,
            CAST(count(*) - count(o_orderkey) AS BIGINT) AS null_pk,
            CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS dup_pk,
            CAST(count(*) - count(o_totalprice) AS BIGINT) AS null_price,
            CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS nonpos_price,
            CAST(sum(CASE WHEN o_orderpriority NOT IN ({pris})
                     THEN 1 ELSE 0 END) AS BIGINT) AS bad_priority
        FROM orders
    ),
    l AS (
        SELECT CAST(count(*) AS BIGINT) AS l_rows FROM lineitem
    ),
    orphans AS (
        SELECT CAST(count(*) AS BIGINT) AS n_orphans
        FROM lineitem li
        WHERE NOT EXISTS (
            SELECT 1 FROM orders oo WHERE oo.o_orderkey = li.l_orderkey
        )
    )
    SELECT * FROM (
        SELECT 'orders_pk_complete' AS constraint_name,
               null_pk AS violations, n_rows AS population,
               (null_pk = 0) AS passed FROM o
        UNION ALL
        SELECT 'orders_pk_unique', dup_pk, n_rows, dup_pk = 0 FROM o
        UNION ALL
        SELECT 'orders_price_complete', null_price, n_rows,
               null_price = 0 FROM o
        UNION ALL
        SELECT 'orders_price_positive', nonpos_price, n_rows,
               nonpos_price = 0 FROM o
        UNION ALL
        SELECT 'orders_priority_domain', bad_priority, n_rows,
               bad_priority = 0 FROM o
        UNION ALL
        SELECT 'lineitem_fk_orders', n_orphans, l_rows, n_orphans = 0
        FROM orphans, l
    )
    """


@query("quality_constraint_suite", oracle=_constraints_oracle())
def quality_constraint_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative constraint validation (the Deequ pattern): six named
    checks — pk completeness, pk uniqueness, measure completeness, value
    positivity, categorical domain membership, and lineitem→orders
    referential integrity — each reported as (violations, population,
    passed).

    Plan discipline: the five single-table checks fuse into ONE aggregate
    over one orders scan (count-distinct shares the scan via Expand); the
    FK check is a broadcast-friendly anti-join counted to a scalar. The
    constraint rows themselves are a 6-row union of scalar frames —
    metadata-sized. A naive validator issuing one job per constraint
    scans the table six times; this shape is why in-engine validation
    stays O(1 scan) per table at 100 TB.
    """
    pris = list(_PRIORITIES)
    o = load(spark, sf_dir, "orders")
    om = o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - F.count("o_orderkey")).alias("null_pk"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("dup_pk"),
        (F.count(F.lit(1)) - F.count("o_totalprice")).alias("null_price"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0))
        .cast("bigint").alias("nonpos_price"),
        F.sum(F.when(~F.col("o_orderpriority").isin(pris), 1).otherwise(0))
        .cast("bigint").alias("bad_priority"),
    )
    li = load(spark, sf_dir, "lineitem")
    l_rows = li.agg(F.count(F.lit(1)).alias("l_rows"))
    orphans = (
        li.select("l_orderkey")
        .join(o.select("o_orderkey"),
              li["l_orderkey"] == o["o_orderkey"], "left_anti")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orphans"))
    )

    def row(name: str, viol, pop):
        return F.struct(
            F.lit(name).alias("constraint_name"),
            viol.cast("bigint").alias("violations"),
            pop.cast("bigint").alias("population"),
            (viol == 0).alias("passed"),
        )

    single = om.select(
        F.explode(
            F.array(
                row("orders_pk_complete", F.col("null_pk"), F.col("n_rows")),
                row("orders_pk_unique", F.col("dup_pk"), F.col("n_rows")),
                row("orders_price_complete", F.col("null_price"),
                    F.col("n_rows")),
                row("orders_price_positive", F.col("nonpos_price"),
                    F.col("n_rows")),
                row("orders_priority_domain", F.col("bad_priority"),
                    F.col("n_rows")),
            )
        ).alias("c")
    ).select("c.*")
    fk = orphans.crossJoin(l_rows).select(
        F.lit("lineitem_fk_orders").alias("constraint_name"),
        F.col("n_orphans").alias("violations"),
        F.col("l_rows").alias("population"),
        (F.col("n_orphans") == 0).alias("passed"),
    )
    return single.unionAll(fk)
