"""SQL-surface catalog tests: the reference's DDL/read ritual through
spark.sql (CREATE SCHEMA, view registration, refresh-after-commit)."""

from __future__ import annotations

from pyspark.sql import types as T

from hudi_acid_verification_spark.acid import AcidTable
from hudi_acid_verification_spark.catalog import (
    ensure_database,
    refresh_acid_table,
    register_acid_table,
    register_fixtures,
)
from tests.conftest import SF_SMALL

SCHEMA = T.StructType(
    [
        T.StructField("primaryKeyValue", T.StringType(), False),
        T.StructField("partitionKeyValue", T.StringType(), False),
        T.StructField("dataValue", T.StringType(), True),
    ]
)


def test_ensure_database(spark):
    ensure_database(spark, "acid_test_db")
    assert spark.catalog.databaseExists("acid_test_db")


def test_fixture_views_queryable(spark):
    register_fixtures(spark, SF_SMALL, suffix="_cat")
    n = spark.sql(
        "SELECT count(*) AS n FROM nation_cat JOIN region_cat "
        "ON n_regionkey = r_regionkey"
    ).collect()[0]["n"]
    assert n == 25


def test_acid_view_snapshot_and_refresh(spark, tmp_path):
    t = AcidTable.create(
        spark, str(tmp_path / "cat_tbl"), SCHEMA, pk="primaryKeyValue",
        partition_col="partitionKeyValue", precombine_col="dataValue",
    )
    t.upsert(spark.createDataFrame([("PK1", "P0", "v1")], SCHEMA))
    register_acid_table(spark, t, "acid_v")
    assert spark.sql("SELECT count(*) AS n FROM acid_v").collect()[0]["n"] == 1

    # a later commit is invisible until refresh (snapshot isolation for SQL)
    t.upsert(spark.createDataFrame([("PK2", "P1", "v2")], SCHEMA))
    assert spark.sql("SELECT count(*) AS n FROM acid_v").collect()[0]["n"] == 1
    refresh_acid_table(spark, t, "acid_v")
    assert spark.sql("SELECT count(*) AS n FROM acid_v").collect()[0]["n"] == 2
