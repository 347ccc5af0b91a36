"""Persistent catalog: a Hive-metastore-backed SparkSession whose table
registrations survive process restarts.

Reference parity: the reference registers its tables in a Hive metastore via
its session provider (SparkSessionProvider.java:62-68) so every later
session resolves them by name. Round-1 scoped this out (no external
metastore service in the environment); this module closes the gap with
Spark's embedded-Derby metastore — catalog state lives on disk under the
warehouse directory (``metastore_db/``), so a brand-new process that opens a
session on the same warehouse sees every registered table with no
re-registration.

Scale notes: in production the same code points at a shared external
metastore (``hive.metastore.uris``) or a lakehouse catalog; the DDL issued
here (unmanaged `CREATE TABLE ... USING parquet LOCATION`) is identical.
Registering the fixture tables costs one metadata write each — no data is
copied or moved, and partition discovery stays with the parquet reader.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

FIXTURE_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def hive_session(
    warehouse: str, app: str = "hive-catalog", cpus: str | int = 8
) -> SparkSession:
    """A SparkSession backed by the embedded-Derby Hive metastore rooted at
    ``warehouse`` (both the managed-table root and ``metastore_db/`` live
    there, so the catalog is a plain directory you can back up or ship)."""
    os.makedirs(warehouse, exist_ok=True)
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app)
        .config("spark.sql.warehouse.dir", warehouse)
        .config(
            "spark.driver.extraJavaOptions",
            f"-Dderby.system.home={warehouse}",
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .enableHiveSupport()
        .getOrCreate()
    )


def register_fixture_tables(
    spark: SparkSession, sf_dir: str, db: str = "tpch"
) -> list[str]:
    """Register the driver's parquet fixture tables as UNMANAGED catalog
    tables in ``db`` (CREATE TABLE ... USING parquet LOCATION — metadata
    only, the files stay where they are). Idempotent; returns the
    fully-qualified names registered."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    names = []
    for t in FIXTURE_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if not os.path.exists(path):
            continue
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {db}.{t} USING parquet "
            f"LOCATION '{path}'"
        )
        names.append(f"{db}.{t}")
    return names
