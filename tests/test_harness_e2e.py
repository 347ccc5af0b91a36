"""Randomized end-to-end concurrency test — the pytest port of the
reference's TransactionManagerTest.java:38-50, against AcidTable.

The reference's own run degrades (3-9 final rows, dead writers —
BASELINE.md); the rebuild's target is the *intended* outcome: every
transaction commits, zero verification failures, zero dead threads.

Reduced workload for CI speed (the full 1000-txn config runs via
scripts/run_acid_harness.py); same seed/weights/key-space shape.
"""

from __future__ import annotations

import pytest

from hudi_acid_verification_spark.verify import HarnessConfig, TransactionHarness


@pytest.mark.slow
def test_concurrent_harness_passes(spark, tmp_path):
    cfg = HarnessConfig(
        table_path=str(tmp_path / "acid_tbl"),
        number_of_writers=2,
        number_of_readers=2,
        total_transactions=30,
        records_per_transaction=3,
        maximum_number_of_records=40,
        maximum_number_of_partitions=4,
        seed=1234,
    )
    report = TransactionHarness(spark, cfg).run()

    assert report.committed_transactions == 30
    assert report.failed_transactions == 0
    assert report.verification_failures == 0, report.failure_details[:3]
    assert not report.writer_errors, report.writer_errors[:3]
    assert not report.reader_errors, report.reader_errors[:3]
    assert report.verification_runs > 0
    # steady state: inserts dominate early; the table holds whatever the
    # seeded mix produced, bounded by the key space
    assert 0 < report.final_row_count <= 40


@pytest.mark.slow
def test_concurrent_harness_passes_mor(spark, tmp_path):
    """Same seeded workload on a merge-on-read table: delta-append commits
    with read-time resolution must give the same ACID guarantees."""
    cfg = HarnessConfig(
        table_path=str(tmp_path / "acid_tbl_mor"),
        number_of_writers=2,
        number_of_readers=2,
        total_transactions=30,
        records_per_transaction=3,
        maximum_number_of_records=40,
        maximum_number_of_partitions=4,
        seed=1234,
        table_mode="mor",
    )
    report = TransactionHarness(spark, cfg).run()

    assert report.committed_transactions == 30
    assert report.failed_transactions == 0
    assert report.verification_failures == 0, report.failure_details[:3]
    assert not report.writer_errors, report.writer_errors[:3]
    assert not report.reader_errors, report.reader_errors[:3]
    assert 0 < report.final_row_count <= 40


@pytest.mark.slow
def test_concurrent_harness_passes_occ(spark, tmp_path):
    """Same seeded workload with OPTIMISTIC writers: data writes run
    lock-free, same-partition races surface as CommitConflictError and
    retry, disjoint-partition races rebase — the ACID verdict must be
    identical to the pessimistic run."""
    cfg = HarnessConfig(
        table_path=str(tmp_path / "acid_tbl_occ"),
        number_of_writers=2,
        number_of_readers=2,
        total_transactions=30,
        records_per_transaction=3,
        maximum_number_of_records=40,
        maximum_number_of_partitions=4,
        seed=1234,
        occ=True,
    )
    report = TransactionHarness(spark, cfg).run()

    assert report.committed_transactions == 30
    assert report.failed_transactions == 0
    assert report.verification_failures == 0, report.failure_details[:3]
    assert not report.writer_errors, report.writer_errors[:3]
    assert not report.reader_errors, report.reader_errors[:3]
    assert 0 < report.final_row_count <= 40


@pytest.mark.slow
def test_concurrent_harness_passes_mor_occ(spark, tmp_path):
    """MOR + optimistic writers: appends rebase their __seq at publish and
    NEVER hard-conflict — the whole seeded workload must commit with the
    same ACID verdict."""
    cfg = HarnessConfig(
        table_path=str(tmp_path / "acid_tbl_mor_occ"),
        number_of_writers=2,
        number_of_readers=2,
        total_transactions=30,
        records_per_transaction=3,
        maximum_number_of_records=40,
        maximum_number_of_partitions=4,
        seed=1234,
        table_mode="mor",
        occ=True,
    )
    report = TransactionHarness(spark, cfg).run()

    assert report.committed_transactions == 30
    assert report.failed_transactions == 0
    assert report.verification_failures == 0, report.failure_details[:3]
    assert not report.writer_errors, report.writer_errors[:3]
    assert not report.reader_errors, report.reader_errors[:3]
    assert 0 < report.final_row_count <= 40


@pytest.mark.slow
def test_partition_scoped_reads_race(spark, tmp_path):
    """Partition-scoped read mode (VERDICT r6 directive #7): readers pin a
    version and compare the PRUNED snapshot resolution against the full
    resolution of that same version while OCC writers keep committing —
    shard/manifest pruning must never drop or invent rows under
    concurrency. MOR + OCC is the hardest mode (delta resolution on the
    read path, rebased appends on the write path)."""
    cfg = HarnessConfig(
        table_path=str(tmp_path / "acid_tbl_scoped"),
        number_of_writers=2,
        number_of_readers=2,
        total_transactions=30,
        records_per_transaction=3,
        maximum_number_of_records=40,
        maximum_number_of_partitions=4,
        seed=1234,
        table_mode="mor",
        occ=True,
        partition_scoped_reads=True,
    )
    report = TransactionHarness(spark, cfg).run()

    assert report.committed_transactions == 30
    assert report.failed_transactions == 0
    assert report.verification_failures == 0, report.failure_details[:3]
    assert not report.writer_errors, report.writer_errors[:3]
    assert not report.reader_errors, report.reader_errors[:3]
    assert report.scoped_read_checks > 0, "scoped mode never engaged"
    assert 0 < report.final_row_count <= 40
