"""SparkSession factory.

Local-mode testing defaults that remain correct on a real cluster:

- AQE on (runtime shuffle-partition coalescing, skew-join splitting) — the
  100 TB path relies on AQE re-planning rather than hand-tuned partition counts.
- ``spark.sql.shuffle.partitions`` sized to local cores for the test harness;
  on a 1000-executor cluster this is overridden by AQE's coalescing anyway.
- UTC session timezone so results compare bit-for-bit with the DuckDB oracle.
- Arrow enabled for every pandas-UDF / toPandas boundary.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "hudi_acid_verification_spark", cpus: str | None = None) -> SparkSession:
    """Create (or fetch) the session with engine defaults applied."""
    cpus = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Fixture events.parquet stores TIMESTAMP(NANOS); Spark has no ns
        # timestamp type, so read the raw int64 and convert at load().
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    _silence_window_warn(spark)
    return spark


def _silence_window_warn(spark: SparkSession) -> None:
    """Raise the WindowExec logger to ERROR.

    A handful of operators window over already-collapsed frames (per-day
    counts, histogram buckets) where a single partition is the DESIGNED
    scale-safe shape; Catalyst constant-folds the ``partitionBy(lit(0))``
    sentinel away, so WindowExec still logs its single-partition warning
    on every run and floods the driver's log budget. Demote that one
    logger — real warnings elsewhere stay visible.
    """
    try:
        jvm = spark.sparkContext._jvm
        jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
            "org.apache.spark.sql.execution.window.WindowExec",
            jvm.org.apache.logging.log4j.Level.ERROR,
        )
    except Exception:
        pass  # non-log4j2 deployments: cosmetic only, never fail a query


def configure_existing(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine confs to a session we didn't build
    (the driver hands ``entry()``/``queries()`` an arbitrary session)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    _silence_window_warn(spark)
    return spark
