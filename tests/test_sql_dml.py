"""SQL-text DML shim tests: the literal MERGE INTO / DELETE FROM statement
text the reference writer emits (writer/TransactionWriter.java:143-178) must
execute against AcidTable through acid.sql_dml.execute_dml — including the
reference's defective delimiter-less DELETE IN-list (defect D2), which the
shim parses to the INTENDED key list."""

from __future__ import annotations

import pytest

from hudi_acid_verification_spark.acid.sql_dml import execute_dml
from hudi_acid_verification_spark.acid.table import AcidTable
from hudi_acid_verification_spark.verify import HarnessConfig, TransactionHarness
from hudi_acid_verification_spark.verify.harness import RECORD_SCHEMA


def _fresh_table(spark, tmp_path, rows):
    t = AcidTable.create(
        spark,
        str(tmp_path / "sql_tbl"),
        RECORD_SCHEMA,
        pk="primaryKeyValue",
        partition_col="partitionKeyValue",
    )
    t.upsert(spark.createDataFrame(rows, RECORD_SCHEMA))
    return t


def _snapshot(t):
    return {
        r["primaryKeyValue"]: (r["partitionKeyValue"], r["dataValue"])
        for r in t.snapshot().collect()
    }


def test_merge_statement_text_updates_and_inserts(spark, tmp_path):
    t = _fresh_table(
        spark, tmp_path, [("k1", "p0", "old1"), ("k2", "p1", "old2")]
    )
    spark.createDataFrame(
        [("k2", "p1", "new2"), ("k3", "p0", "new3")], RECORD_SCHEMA
    ).createOrReplaceTempView("updates_view")
    # the reference's literal statement shape, TransactionWriter.java:154-159
    execute_dml(
        t,
        "MERGE INTO acid USING (SELECT * FROM updates_view) s "
        "ON acid.primaryKeyValue = s.primaryKeyValue "
        "WHEN MATCHED THEN UPDATE SET acid.dataValue = s.dataValue "
        "WHEN NOT MATCHED THEN INSERT "
        "(primaryKeyValue, partitionKeyValue, dataValue) VALUES "
        "(s.primaryKeyValue, s.partitionKeyValue, s.dataValue)",
    )
    assert _snapshot(t) == {
        "k1": ("p0", "old1"),   # untouched
        "k2": ("p1", "new2"),   # matched → dataValue updated
        "k3": ("p0", "new3"),   # not matched → inserted
    }


def test_merge_statement_text_set_null(spark, tmp_path):
    """SQL MERGE semantics: a matched UPDATE SET to a NULL source value
    must NULL the column (not keep the target's old value), and a matched
    row's NULL in a NON-updated column must stay NULL — the coalesce()
    regression pinned by the model test, exercised through the SQL text
    front door on both table types."""
    for mode in ("cow", "mor"):
        t = AcidTable.create(
            spark,
            str(tmp_path / f"sql_null_{mode}"),
            RECORD_SCHEMA,
            pk="primaryKeyValue",
            partition_col="partitionKeyValue",
            mode=mode,
            compact_every=None,
        )
        t.upsert(
            spark.createDataFrame(
                [("k1", "p0", "old1"), ("k2", "p1", None)], RECORD_SCHEMA
            )
        )
        spark.createDataFrame(
            [("k1", "p0", None), ("k2", "p1", "set2")], RECORD_SCHEMA
        ).createOrReplaceTempView("null_updates_view")
        execute_dml(
            t,
            "MERGE INTO acid USING (SELECT * FROM null_updates_view) s "
            "ON acid.primaryKeyValue = s.primaryKeyValue "
            "WHEN MATCHED THEN UPDATE SET acid.dataValue = s.dataValue "
            "WHEN NOT MATCHED THEN INSERT "
            "(primaryKeyValue, partitionKeyValue, dataValue) VALUES "
            "(s.primaryKeyValue, s.partitionKeyValue, s.dataValue)",
        )
        assert _snapshot(t) == {
            "k1": ("p0", None),    # matched → explicitly nulled
            "k2": ("p1", "set2"),  # matched → NULL overwritten with value
        }, f"mode={mode}"


def test_delete_statement_text_comma_list(spark, tmp_path):
    t = _fresh_table(
        spark, tmp_path,
        [("k1", "p0", "a"), ("k2", "p1", "b"), ("k3", "p0", "c")],
    )
    execute_dml(t, "DELETE FROM acid WHERE primaryKeyValue IN ('k1', 'k3')")
    assert set(_snapshot(t)) == {"k2"}


def test_delete_parses_reference_d2_delimiterless_list(spark, tmp_path):
    """The reference joins its quoted keys with NO delimiter (defect D2,
    TransactionWriter.java:173) — the shim must still recover the intended
    keys, mirroring AcidTable.delete's intended-semantics stance."""
    t = _fresh_table(
        spark, tmp_path,
        [("k1", "p0", "a"), ("k2", "p1", "b"), ("k3", "p0", "c")],
    )
    execute_dml(t, "DELETE FROM acid WHERE primaryKeyValue IN ('k1''k3')")
    assert set(_snapshot(t)) == {"k2"}


def test_unsupported_statements_refuse(spark, tmp_path):
    t = _fresh_table(spark, tmp_path, [("k1", "p0", "a")])
    with pytest.raises(ValueError, match="unsupported statement"):
        execute_dml(t, "UPDATE acid SET dataValue = 'x'")
    with pytest.raises(ValueError, match="primary key"):
        execute_dml(t, "DELETE FROM acid WHERE dataValue IN ('a')")
    with pytest.raises(ValueError, match="ON"):
        execute_dml(
            t,
            "MERGE INTO acid USING (SELECT 1 AS x) s ON acid.dataValue = "
            "s.dataValue WHEN MATCHED THEN UPDATE SET acid.dataValue = "
            "s.dataValue WHEN NOT MATCHED THEN INSERT (x) VALUES (s.x)",
        )


@pytest.mark.slow
def test_harness_passes_in_sql_mode(spark, tmp_path):
    """The concurrency harness driven through the literal-SQL writer path
    must give the same ACID outcome as the DataFrame path."""
    cfg = HarnessConfig(
        table_path=str(tmp_path / "acid_sql_mode"),
        number_of_writers=2,
        number_of_readers=1,
        total_transactions=20,
        records_per_transaction=3,
        maximum_number_of_records=40,
        maximum_number_of_partitions=4,
        seed=1234,
        sql_mode=True,
    )
    report = TransactionHarness(spark, cfg).run()
    assert report.committed_transactions == 20
    assert report.failed_transactions == 0
    assert report.verification_failures == 0, report.failure_details[:3]
    assert not report.writer_errors, report.writer_errors[:3]
    assert not report.reader_errors, report.reader_errors[:3]
