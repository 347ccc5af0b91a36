"""AcidTable ADD/DROP column schema evolution (`evolve_schema`).

The evolution commit is metadata-only; correctness rests on
schema-on-read: old parquet files null-fill added columns and ignore
dropped ones. These tests pin that behavior on both table modes, the
guard rails, time travel across the evolution, and DML against the
evolved shape.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hudi_acid_verification_spark.acid import AcidTable

SCHEMA = T.StructType(
    [
        T.StructField("primaryKeyValue", T.StringType(), False),
        T.StructField("partitionKeyValue", T.StringType(), False),
        T.StructField("dataValue", T.StringType(), True),
    ]
)


def rows(spark, data, schema=SCHEMA):
    return spark.createDataFrame(data, schema)


@pytest.fixture(params=["cow", "mor"])
def table(spark, tmp_path, request):
    path = str(tmp_path / f"tbl_{request.param}")
    return AcidTable.create(
        spark, path, SCHEMA, pk="primaryKeyValue",
        partition_col="partitionKeyValue", precombine_col="dataValue",
        mode=request.param,
    )


def test_add_column_null_fills_old_files(spark, table):
    table.upsert(rows(spark, [("PK1", "P0", "v1"), ("PK2", "P1", "v2")]))
    v = table.evolve_schema(add={"score": T.LongType()})
    assert v == 2
    got = {
        r["primaryKeyValue"]: r["score"] for r in table.snapshot().collect()
    }
    assert got == {"PK1": None, "PK2": None}

    # DML against the evolved shape: new rows carry values, old stay NULL
    evolved = T.StructType(
        list(SCHEMA.fields) + [T.StructField("score", T.LongType(), True)]
    )
    table.upsert(rows(spark, [("PK3", "P0", "v3", 7)], evolved))
    got = {
        r["primaryKeyValue"]: r["score"] for r in table.snapshot().collect()
    }
    assert got == {"PK1": None, "PK2": None, "PK3": 7}


def test_drop_column_hides_it_everywhere(spark, table):
    table.upsert(rows(spark, [("PK1", "P0", "v1")]))
    table.evolve_schema(add={"score": T.LongType()})
    table.evolve_schema(drop=["score"])
    assert "score" not in table.snapshot().columns
    # and the pre-drop files (which physically lack score anyway) read fine
    assert table.snapshot().count() == 1


def test_time_travel_pins_old_schema(spark, table):
    table.upsert(rows(spark, [("PK1", "P0", "v1")]))
    v_before = table.version()
    table.evolve_schema(add={"score": T.LongType()})
    assert "score" in table.snapshot().columns
    assert "score" not in table.snapshot(version=v_before).columns


def test_string_typed_add(spark, table):
    table.upsert(rows(spark, [("PK1", "P0", "v1")]))
    table.evolve_schema(add={"tags": "array<string>"})
    f = {x.name: x.dataType for x in table.snapshot().schema.fields}
    assert f["tags"] == T.ArrayType(T.StringType())


def test_guards(spark, table):
    table.upsert(rows(spark, [("PK1", "P0", "v1")]))
    with pytest.raises(ValueError):
        table.evolve_schema()  # nothing to do
    with pytest.raises(ValueError):
        table.evolve_schema(add={"dataValue": T.StringType()})  # exists
    with pytest.raises(ValueError):
        table.evolve_schema(add={"__seq": T.LongType()})  # reserved
    with pytest.raises(ValueError):
        table.evolve_schema(drop=["primaryKeyValue"])  # pk protected
    with pytest.raises(ValueError):
        table.evolve_schema(drop=["nope"])  # unknown


def test_merge_and_delete_after_evolution(spark, table):
    evolved = T.StructType(
        list(SCHEMA.fields) + [T.StructField("score", T.LongType(), True)]
    )
    table.upsert(rows(spark, [("PK1", "P0", "v1"), ("PK2", "P1", "v2")]))
    table.evolve_schema(add={"score": T.LongType()})
    table.merge(rows(spark, [("PK1", "P0", "v1b", 5)], evolved))
    table.delete(["PK2"])
    got = {
        r["primaryKeyValue"]: (r["dataValue"], r["score"])
        for r in table.snapshot().collect()
    }
    assert got == {"PK1": ("v1b", 5)}


@pytest.fixture(params=["cow", "mor"])
def nopc_table(spark, tmp_path, request):
    # no precombine: dataValue must be droppable for the re-add guard test
    path = str(tmp_path / f"nopc_{request.param}")
    return AcidTable.create(
        spark, path, SCHEMA, pk="primaryKeyValue",
        partition_col="partitionKeyValue", precombine_col=None,
        mode=request.param,
    )


def test_readd_of_dropped_column_guarded_until_rewrite(spark, nopc_table):
    """Re-adding a dropped column name is rejected while any live file
    still physically carries it — with name-based column binding the old
    values would resurrect instead of the documented NULL backfill. After
    cluster() rewrites the files, the re-add is legal and null-fills."""
    table = nopc_table
    table.upsert(rows(spark, [("PK1", "P0", "keepme"), ("PK2", "P1", "x")]))
    table.evolve_schema(drop=["dataValue"])
    with pytest.raises(ValueError, match="re-add"):
        table.evolve_schema(add={"dataValue": T.StringType()})
    with pytest.raises(ValueError, match="re-add"):
        table.add_column(T.StructField("dataValue", T.StringType(), True))
    # a brand-new name is unaffected by the guard
    table.evolve_schema(add={"fresh": T.StringType()})
    # rewriting the live files clears the physical remnants...
    table.cluster(files_per_partition=1)
    table.evolve_schema(add={"dataValue": T.StringType()})
    # ...and the re-added column reads NULL everywhere, never "keepme"
    got = {
        r["primaryKeyValue"]: r["dataValue"]
        for r in table.snapshot().collect()
    }
    assert got == {"PK1": None, "PK2": None}


def test_readd_guard_treats_corrupt_footer_conservatively(spark, nopc_table):
    """A corrupt/truncated parquet footer raises pyarrow ArrowInvalid, not
    OSError — the guard must still take the documented conservative path
    (reject the re-add with its own message), never surface a raw Arrow
    error (ADVICE r4)."""
    import glob
    import os

    table = nopc_table
    table.upsert(rows(spark, [("PK1", "P0", "v")]))
    table.evolve_schema(drop=["dataValue"])
    # truncate one live data file so its footer is unreadable
    victim = sorted(
        glob.glob(os.path.join(table.path, "data", "**", "*.parquet"),
                  recursive=True)
    )[0]
    with open(victim, "r+b") as f:
        f.truncate(max(4, os.path.getsize(victim) // 2))
    with pytest.raises(ValueError, match="re-add"):
        table.evolve_schema(add={"dataValue": T.StringType()})
