"""Persistent-catalog demo/driver: register the fixture tables in an
embedded-Derby Hive metastore, or reopen the same warehouse from a FRESH
process and resolve them by name with no re-registration — proving the
catalog survives restarts (reference parity: SparkSessionProvider.java:62-68).

Usage:
    python scripts/persistent_catalog_demo.py register <warehouse> <sf_dir>
    python scripts/persistent_catalog_demo.py reuse    <warehouse>

Prints one JSON line: {"phase": ..., "tables": N, "lineitem_rows": N}.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hudi_acid_verification_spark.metastore import (  # noqa: E402
    hive_session,
    register_fixture_tables,
)


def main() -> None:
    phase, warehouse = sys.argv[1], sys.argv[2]
    spark = hive_session(warehouse, app=f"catalog-{phase}", cpus=4)
    if phase == "register":
        names = register_fixture_tables(spark, sys.argv[3])
    elif phase == "reuse":
        # must resolve purely from the on-disk metastore
        names = [
            f"tpch.{t.name}" for t in spark.catalog.listTables("tpch")
        ]
    else:
        raise SystemExit(f"unknown phase {phase!r}")
    rows = spark.sql(
        "SELECT count(*) AS n FROM tpch.lineitem"
    ).first()["n"]
    print(json.dumps({"phase": phase, "tables": len(names), "lineitem_rows": rows}))
    spark.stop()


if __name__ == "__main__":
    main()
