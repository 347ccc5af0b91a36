"""Bucketed-table co-located join — the shuffle-elimination lever for
repeated big-fact joins at 100 TB: both sides pre-hashed into the same
bucket count on the join key, so the sort-merge join reads co-located
buckets with NO exchange on either side. Amortizes one layout write across
every subsequent join/aggregation on that key.

The bucketed copies are materialized once per (sf, bucket-count) into a
local warehouse via saveAsTable (bucketing metadata lives in the catalog;
plain parquet paths can't carry it). The oracle is the logical join result,
which bucketing must not change.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load, query

_BUCKETS = 8


def _bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Materialize orders/lineitem bucketed by the join key (idempotent)."""
    tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    warehouse = os.path.join(
        tempfile.gettempdir(), "hudi_acid_verification_spark", "bucketed_wh"
    )
    o_name, l_name = f"orders_b_{tag}", f"lineitem_b_{tag}"
    for name, table, key in (
        (o_name, "orders", "o_orderkey"),
        (l_name, "lineitem", "l_orderkey"),
    ):
        marker = os.path.join(warehouse, f"{name}._done")
        if spark.catalog.tableExists(name) and os.path.exists(marker):
            continue
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        path = os.path.join(warehouse, name)
        (
            load(spark, sf_dir, table)
            .write.mode("overwrite")
            .format("parquet")
            .option("path", path)
            .bucketBy(_BUCKETS, key)
            .sortBy(key)
            .saveAsTable(name)
        )
        open(marker, "a").close()
    return o_name, l_name


@query(
    "join_bucketed_colocated",
    oracle="""
    SELECT o.o_orderpriority,
           count(*) AS n_lines,
           CAST(sum(CAST(l.l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact join on pre-bucketed tables: zero exchanges on the join
    (asserted by the plan audit), then a tiny aggregate shuffle."""
    o_name, l_name = _bucketed_tables(spark, sf_dir)
    o = spark.table(o_name)
    li = spark.table(l_name)
    return (
        o.join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("l_quantity").cast("decimal(18,4)"))
            .cast("double")
            .alias("sum_qty"),
        )
    )
