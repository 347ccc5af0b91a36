"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY.md §2B via the
registry in ``hudi_acid_verification_spark.operators``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from hudi_acid_verification_spark import operators as ops
from hudi_acid_verification_spark.session import configure_existing

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-style pricing summary) on /root/testdata/sf0.001."""
    configure_existing(spark)
    return ops.QUERIES["q1_pricing_summary"](spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2B."""

    def wrap(fn: ops.QueryFn) -> ops.QueryFn:
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            configure_existing(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in ops.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query name (rows-only ops are absent)."""
    return dict(ops.ORACLES)
