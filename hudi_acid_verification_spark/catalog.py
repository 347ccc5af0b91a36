"""SQL-surface catalog: run the engine through ``spark.sql`` like the
reference does (it issues literal SQL for DDL and reads —
writer/TransactionManager.java:70-88, reader/ReaderThread.java:74-77).

- ``ensure_database`` — CREATE SCHEMA IF NOT EXISTS (§2A #1).
- ``register_fixtures`` — the driver's parquet tables as named views, so any
  oracle SQL's FROM-clause names work verbatim in Spark SQL too.
- ``register_acid_table`` — an AcidTable snapshot as a view;
  ``refresh_acid_table`` re-resolves the manifest (the honest analog of the
  reference's REFRESH TABLE + MSCK ritual, §2A #4/#5 — under the manifest
  protocol a refresh is just re-registering the current snapshot, and MSCK
  partition discovery is unnecessary because the manifest IS the partition
  listing).

Scale notes: views are metadata-only (no materialization); the underlying
scans keep pushdown/pruning. Temp views are session-scoped, mirroring the
reference's session-per-client isolation (TransactionManager.java:95-101).

For registrations that must OUTLIVE the process — the reference's Hive
metastore usage (SparkSessionProvider.java:62-68) — see ``metastore.py``:
an embedded-Derby Hive catalog whose table definitions persist on disk and
survive restarts (tests/test_metastore.py proves the round trip).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .acid import AcidTable

FIXTURE_TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()


def ensure_database(spark: SparkSession, name: str) -> None:
    """CREATE SCHEMA IF NOT EXISTS (TransactionManager.java:70-72 parity)."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {name}")


def register_fixtures(
    spark: SparkSession, sf_dir: str, suffix: str = ""
) -> list[str]:
    """Register every fixture parquet as a temp view ``<table><suffix>``."""
    from .operators import load

    names = []
    for t in FIXTURE_TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t + suffix)
        names.append(t + suffix)
    return names


def register_acid_table(
    spark: SparkSession, table: AcidTable, view_name: str
) -> None:
    """Expose the table's CURRENT snapshot to Spark SQL under ``view_name``.

    The view pins the manifest resolved now (snapshot isolation for SQL
    readers); call :func:`refresh_acid_table` to advance it.
    """
    table.snapshot().createOrReplaceTempView(view_name)


def refresh_acid_table(
    spark: SparkSession, table: AcidTable, view_name: str
) -> None:
    """REFRESH TABLE analog (ReaderThread.java:75): re-resolve ``_latest``
    and swap the view to the new snapshot."""
    register_acid_table(spark, table, view_name)
