"""AcidTable unit + concurrency tests (SURVEY.md §7.2).

Covers the reference's transactional surface with its defects fixed:
upsert/merge/delete semantics, snapshot isolation, PK-uniqueness audit,
atomicity under writer failure, and serialized concurrent commits.
"""

from __future__ import annotations

import os
import threading

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hudi_acid_verification_spark.acid import (
    AcidTable,
    CommitConflictError,
    InconsistentSnapshotError,
)

SCHEMA = T.StructType(
    [
        T.StructField("primaryKeyValue", T.StringType(), False),
        T.StructField("partitionKeyValue", T.StringType(), False),
        T.StructField("dataValue", T.StringType(), True),
    ]
)


def rows(spark, data):
    return spark.createDataFrame(data, SCHEMA)


@pytest.fixture()
def table(spark, tmp_path):
    path = str(tmp_path / "tbl")
    return AcidTable.create(
        spark, path, SCHEMA, pk="primaryKeyValue",
        partition_col="partitionKeyValue", precombine_col="dataValue",
    )


def snap_dict(table):
    return {
        r["primaryKeyValue"]: (r["partitionKeyValue"], r["dataValue"])
        for r in table.snapshot().collect()
    }


def test_create_empty_snapshot(table):
    assert table.snapshot().count() == 0
    assert table.version() == 0


def test_upsert_insert_and_replace(spark, table):
    table.upsert(rows(spark, [("PK1", "P0", "v1"), ("PK2", "P1", "v2")]))
    assert snap_dict(table) == {"PK1": ("P0", "v1"), "PK2": ("P1", "v2")}
    # same pk replaces, new pk appends
    table.upsert(rows(spark, [("PK1", "P0", "v9"), ("PK3", "P0", "v3")]))
    assert snap_dict(table) == {
        "PK1": ("P0", "v9"), "PK2": ("P1", "v2"), "PK3": ("P0", "v3"),
    }
    table.audit_unique()


def test_upsert_precombine_dedups_batch(spark, table):
    # duplicate pk within one batch: greatest precombine (dataValue) wins
    table.upsert(rows(spark, [("PK1", "P0", "a"), ("PK1", "P0", "z")]))
    assert snap_dict(table) == {"PK1": ("P0", "z")}


def test_merge_updates_only_datavalue(spark, table):
    """MERGE parity: matched rows update dataValue only; unmatched insert
    (TransactionWriter.java:154-159)."""
    table.upsert(rows(spark, [("PK1", "P0", "old"), ("PK2", "P1", "keep")]))
    table.merge(
        rows(spark, [("PK1", "P9", "new"), ("PK3", "P2", "ins")]),
        update_cols=["dataValue"],
    )
    got = snap_dict(table)
    # PK1: dataValue updated, partition NOT moved (P0, not source's P9)
    assert got["PK1"] == ("P0", "new")
    assert got["PK2"] == ("P1", "keep")
    assert got["PK3"] == ("P2", "ins")
    table.audit_unique()


def test_delete_intended_semantics(spark, table):
    table.upsert(rows(spark, [(f"PK{i}", f"P{i % 2}", f"v{i}") for i in range(6)]))
    table.delete(["PK0", "PK3", "PKmissing"])
    assert set(snap_dict(table)) == {"PK1", "PK2", "PK4", "PK5"}


def test_snapshot_isolation_and_time_travel(spark, table):
    table.upsert(rows(spark, [("PK1", "P0", "v1")]))
    old = table.snapshot()  # resolves manifest v1 now
    v1 = table.version()
    table.upsert(rows(spark, [("PK1", "P0", "v2"), ("PK2", "P0", "x")]))
    # the previously-resolved snapshot still sees the old state
    assert {r["dataValue"] for r in old.collect()} == {"v1"}
    assert table.snapshot(version=v1).count() == 1
    assert table.snapshot().count() == 2


def test_partition_scoped_rewrite(spark, table):
    """COW must not rewrite partitions untouched by the commit."""
    table.upsert(rows(spark, [("PK1", "P0", "a"), ("PK2", "P1", "b")]))
    m1 = table._read_manifest()
    p1_files = {f["file"] for f in m1.files if f["partition"] == "P1"}
    table.upsert(rows(spark, [("PK1", "P0", "a2")]))  # touches P0 only
    m2 = table._read_manifest()
    assert {f["file"] for f in m2.files if f["partition"] == "P1"} == p1_files


def test_atomicity_orphan_files_invisible(spark, table):
    """Files written without a manifest swap are never visible (the crash-
    before-commit case)."""
    table.upsert(rows(spark, [("PK1", "P0", "v1")]))
    m = table._read_manifest()
    # simulate a crashed writer: data lands, manifest never swaps
    rows(spark, [("PKghost", "P0", "boo")]).write.mode("overwrite").partitionBy(
        "partitionKeyValue"
    ).parquet(os.path.join(table._data_dir, "crashed-commit"))
    assert "PKghost" not in snap_dict(table)
    assert table._read_manifest().version == m.version


def test_audit_detects_duplicates(spark, table, tmp_path):
    table.upsert(rows(spark, [("PK1", "P0", "v1")]))
    # forge a duplicate by writing a second file and appending it manually,
    # placed in the table's hive layout like a real commit's file
    staging = str(tmp_path / "forge-staging")
    rows(spark, [("PK1", "P1", "dup")]).write.mode("overwrite").partitionBy(
        "partitionKeyValue"
    ).parquet(staging)
    m = table._read_manifest()
    forged = list(m.files)
    src_dir = os.path.join(staging, "partitionKeyValue=P1")
    dest_dir = os.path.join(table._data_dir, "partitionKeyValue=P1")
    os.makedirs(dest_dir, exist_ok=True)
    for fn in os.listdir(src_dir):
        if fn.endswith(".parquet"):
            os.rename(os.path.join(src_dir, fn), os.path.join(dest_dir, fn))
            forged.append(
                {"file": os.path.join("partitionKeyValue=P1", fn), "partition": "P1"}
            )
    from hudi_acid_verification_spark.acid.table import _Manifest

    table._write_manifest_and_swap(
        _Manifest(m.version + 1, m.schema, m.pk, m.partition_col, m.precombine_col, forged)
    )
    with pytest.raises(InconsistentSnapshotError):
        table.audit_unique()


def test_concurrent_writers_serialize(spark, table):
    """N threads upserting disjoint keys: all commits land, versions are
    strictly sequential, no lost updates (the reference's core question)."""
    errs: list[Exception] = []

    def work(i: int) -> None:
        try:
            df = rows(spark, [(f"PK{i}-{j}", f"P{j % 2}", f"v{i}") for j in range(3)])
            table.upsert(df, timeout=120.0)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=work, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    assert table.version() == 6
    assert table.snapshot().count() == 18
    table.audit_unique()


def test_lock_timeout_raises(table):
    fd = table._acquire_lock()
    try:
        with pytest.raises(CommitConflictError):
            table._acquire_lock(timeout=0.2)
    finally:
        table._release_lock(fd)


# ---------------------------------------------- incremental / compaction / ingest


def test_incremental_read_upserts_and_updates(spark, table):
    v0 = table.version()
    table.upsert(rows(spark, [("PK1", "P0", "v1"), ("PK2", "P1", "v2")]))
    v1 = table.version()
    table.upsert(rows(spark, [("PK1", "P0", "v1b"), ("PK3", "P0", "v3")]))
    v2 = table.version()

    inc01 = {
        r["primaryKeyValue"]: r["dataValue"]
        for r in table.read_incremental(v0, v1).collect()
    }
    assert inc01 == {"PK1": "v1", "PK2": "v2"}

    # (v1, v2]: PK1's post-image and the new PK3; PK2's partition untouched
    inc12 = {
        r["primaryKeyValue"]: r["dataValue"]
        for r in table.read_incremental(v1, v2).collect()
    }
    assert inc12 == {"PK1": "v1b", "PK3": "v3"}

    # full window = current state as post-images (no deletes yet)
    inc02 = {
        r["primaryKeyValue"]: r["dataValue"]
        for r in table.read_incremental(v0, v2).collect()
    }
    assert inc02 == {"PK1": "v1b", "PK2": "v2", "PK3": "v3"}


def test_incremental_excludes_carried_rows(spark, table):
    # PK1 and PK2 share partition P0; updating PK1 rewrites the partition,
    # carrying PK2's unchanged row into a new file — it must NOT appear as
    # a change.
    table.upsert(rows(spark, [("PK1", "P0", "v1"), ("PK2", "P0", "v2")]))
    v1 = table.version()
    table.merge(rows(spark, [("PK1", "P0", "v1b")]))
    changed = table.read_incremental(v1).collect()
    assert {r["primaryKeyValue"] for r in changed} == {"PK1"}


def test_deleted_keys_changefeed(spark, table):
    table.upsert(rows(spark, [("PK1", "P0", "v1"), ("PK2", "P0", "v2")]))
    v1 = table.version()
    table.delete(["PK2"])
    deleted = [r["primaryKeyValue"] for r in table.deleted_keys(v1).collect()]
    assert deleted == ["PK2"]
    # PK1 was carried into the rewritten file unchanged: not a change, not a delete
    assert table.read_incremental(v1).count() == 0


def test_compaction_preserves_content_and_reduces_files(spark, table):
    # Commit writes rebalance on the partition column, so a COW partition
    # normally lands as one right-sized file; multi-file partitions arise
    # when AQE splits a large write. Fabricate that state: two write batches
    # published under one commit → P0 holds two small files.
    table.upsert(rows(spark, [("PK0", "P0", "v0")]))
    m = table._read_manifest()
    extra = table._write_data(
        rows(spark, [("PK1", "P0", "v1"), ("PK2", "P0", "v2")]), m
    ) + table._write_data(rows(spark, [("PK3", "P0", "v3")]), m)
    table._commit(lambda cur: cur.files + extra)
    before = snap_dict(table)
    hist = table.history()
    assert hist[-1]["partitions"]["P0"] >= 2  # small files accreted
    v = table.compact(max_files_per_partition=1)
    assert table.version() == v
    assert snap_dict(table) == before
    assert table.history()[-1]["partitions"]["P0"] == 1
    # compaction emits no phantom changes in the changefeed
    assert table.read_incremental(v - 1, v).count() == 0
    assert table.deleted_keys(v - 1, v).count() == 0


def test_file_scoped_rewrite_carries_disjoint_files(spark, table):
    """A point DML on a multi-file partition must rewrite only the files
    whose manifest pk range can contain the touched keys; range-disjoint
    files carry over as the SAME manifest entries (no data movement) —
    the column-stats file pruning that keeps a 3-row commit from rewriting
    a whole partition."""
    table.upsert(rows(spark, [("PK0", "P0", "v0")]))
    m = table._read_manifest()
    extra = table._write_data(
        rows(spark, [("PK5", "P0", "v5")]), m
    ) + table._write_data(rows(spark, [("PK9", "P0", "v9")]), m)
    table._commit(lambda cur: cur.files + extra)
    files_before = {f["file"] for f in table._read_manifest().files}
    assert len(files_before) == 3

    table.upsert(rows(spark, [("PK9", "P0", "v9b")]))
    files_after = {f["file"] for f in table._read_manifest().files}
    # PK0's and PK5's files survive untouched; only PK9's file was replaced
    assert len(files_before & files_after) == 2
    assert snap_dict(table) == {
        "PK0": ("P0", "v0"),
        "PK5": ("P0", "v5"),
        "PK9": ("P0", "v9b"),
    }

    # a delete likewise touches only the overlapping file
    files_before = files_after
    table.delete(["PK5"], partitions=["P0"])
    files_after = {f["file"] for f in table._read_manifest().files}
    assert len(files_before & files_after) == 2
    assert snap_dict(table) == {"PK0": ("P0", "v0"), "PK9": ("P0", "v9b")}


def test_history_timeline(spark, table):
    table.upsert(rows(spark, [("PK1", "P0", "v1")]))
    table.upsert(rows(spark, [("PK2", "P1", "v2")]))
    hist = table.history()
    assert [h["version"] for h in hist] == [0, 1, 2]
    assert hist[0]["n_files"] == 0
    assert hist[2]["n_files"] > hist[1]["n_files"]


def test_ingest_streamer_checkpointed(spark, table, tmp_path):
    from hudi_acid_verification_spark.acid.streamer import IngestStreamer

    drops = tmp_path / "drops"
    drops.mkdir()
    rows(spark, [("PK1", "P0", "v1")]).write.parquet(str(drops / "d1"))
    rows(spark, [("PK2", "P1", "v2")]).write.parquet(str(drops / "d2"))

    s = IngestStreamer(table, str(drops / "*" / "*.parquet"))
    n = s.run_once(spark)
    assert n >= 2
    assert snap_dict(table) == {"PK1": ("P0", "v1"), "PK2": ("P1", "v2")}

    # caught up: no reprocessing
    assert s.run_once(spark) == 0

    # a new drop (an update) is picked up incrementally
    rows(spark, [("PK1", "P0", "v1b")]).write.parquet(str(drops / "d3"))
    assert s.run_once(spark) >= 1
    assert snap_dict(table)["PK1"] == ("P0", "v1b")
    assert s.run_once(spark) == 0


# ------------------------------------------------------------- merge-on-read


@pytest.fixture()
def mor_table(spark, tmp_path):
    path = str(tmp_path / "mor_tbl")
    return AcidTable.create(
        spark, path, SCHEMA, pk="primaryKeyValue",
        partition_col="partitionKeyValue", precombine_col="dataValue",
        mode="mor",
    )


def test_mor_upsert_resolves_latest(spark, mor_table):
    t = mor_table
    t.upsert(rows(spark, [("PK1", "P0", "v1"), ("PK2", "P1", "v2")]))
    t.upsert(rows(spark, [("PK1", "P0", "v1b"), ("PK3", "P0", "v3")]))
    assert snap_dict(t) == {
        "PK1": ("P0", "v1b"), "PK2": ("P1", "v2"), "PK3": ("P0", "v3"),
    }
    t.audit_unique()
    # both commits were pure appends: every live file is a delta, and commit
    # 2's manifest strictly extends commit 1's file list
    m1 = t._read_manifest(1)
    m2 = t._read_manifest(2)
    assert all(f.get("kind") == "delta" for f in m2.files)
    assert {f["file"] for f in m1.files} <= {f["file"] for f in m2.files}


def test_mor_delete_tombstones(spark, mor_table):
    t = mor_table
    t.upsert(rows(spark, [("PK1", "P0", "v1"), ("PK2", "P0", "v2")]))
    t.delete([("PK2", "P0")])
    assert snap_dict(t) == {"PK1": ("P0", "v1")}
    # bare keys also work (derived via semi-join)
    t.upsert(rows(spark, [("PK3", "P1", "v3")]))
    t.delete(["PK1"])
    assert snap_dict(t) == {"PK3": ("P1", "v3")}
    # re-insert after tombstone resurrects the key (later seq wins)
    t.upsert(rows(spark, [("PK2", "P0", "v2new")]))
    assert snap_dict(t)["PK2"] == ("P0", "v2new")


def test_mor_merge_full_row_and_time_travel(spark, mor_table):
    t = mor_table
    t.upsert(rows(spark, [("PK1", "P0", "v1")]))
    v1 = t.version()
    t.merge(rows(spark, [("PK1", "P0", "v1b"), ("PK2", "P1", "v2")]),
            update_cols=["dataValue"])
    assert snap_dict(t) == {"PK1": ("P0", "v1b"), "PK2": ("P1", "v2")}
    # time travel resolves against the old manifest
    old = {
        r["primaryKeyValue"]: r["dataValue"]
        for r in t.snapshot(version=v1).collect()
    }
    assert old == {"PK1": "v1"}


def test_mor_compact_folds_deltas(spark, mor_table):
    t = mor_table
    for i in range(4):
        t.upsert(rows(spark, [("PK1", "P0", f"v{i}"), (f"K{i}", "P0", "x")]))
    t.delete([("K0", "P0")])
    before = snap_dict(t)
    v = t.compact()
    assert snap_dict(t) == before
    hist = t.history()
    assert hist[-1]["partitions"]["P0"] == 1  # deltas folded into one base
    # compaction is change-free in the changefeed
    assert t.read_incremental(v - 1, v).count() == 0
    assert t.deleted_keys(v - 1, v).count() == 0
    # and the folded base keeps winning over nothing stale
    t.upsert(rows(spark, [("PK1", "P0", "after-compact")]))
    assert snap_dict(t)["PK1"] == ("P0", "after-compact")


def test_mor_incremental_changefeed(spark, mor_table):
    t = mor_table
    t.upsert(rows(spark, [("PK1", "P0", "v1"), ("PK2", "P1", "v2")]))
    v1 = t.version()
    t.upsert(rows(spark, [("PK1", "P0", "v1b")]))
    t.delete([("PK2", "P1")])
    v3 = t.version()
    changed = {
        r["primaryKeyValue"]: r["dataValue"]
        for r in t.read_incremental(v1, v3).collect()
    }
    assert changed == {"PK1": "v1b"}
    assert [r["primaryKeyValue"] for r in t.deleted_keys(v1, v3).collect()] == ["PK2"]


def test_mor_precombine_within_batch(spark, mor_table):
    t = mor_table
    t.upsert(rows(spark, [("PK1", "P0", "a"), ("PK1", "P0", "z")]))
    assert snap_dict(t)["PK1"] == ("P0", "z")  # greatest precombine wins
    t.audit_unique()


WIDE = T.StructType(
    list(SCHEMA.fields) + [T.StructField("extra", T.StringType(), True)]
)


@pytest.fixture()
def wide_mor(spark, tmp_path):
    return AcidTable.create(
        spark, str(tmp_path / "wide"), WIDE, pk="primaryKeyValue",
        partition_col="partitionKeyValue", mode="mor",
    )


def wide_snap(t):
    return {
        r["primaryKeyValue"]: (
            r["partitionKeyValue"], r["dataValue"], r["extra"]
        )
        for r in t.snapshot().collect()
    }


def test_mor_partial_merge_updates_only_named_columns(spark, wide_mor):
    t = wide_mor
    t.upsert(spark.createDataFrame(
        [("PK1", "P0", "v1", "e1"), ("PK2", "P1", "v2", "e2")], WIDE))
    # matched: only dataValue changes, extra keeps target value even though
    # the source carries a different one; unmatched: full source row inserts
    t.merge(spark.createDataFrame(
        [("PK1", "P0", "v1b", "IGNORED"), ("PK3", "P0", "v3", "e3")], WIDE),
        update_cols=["dataValue"])
    assert wide_snap(t) == {
        "PK1": ("P0", "v1b", "e1"),
        "PK2": ("P1", "v2", "e2"),
        "PK3": ("P0", "v3", "e3"),
    }
    t.audit_unique()
    # the commit was a pure append (no rewrite)
    m = t._read_manifest()
    assert any(f.get("op") == "partial" for f in m.files)


def test_mor_partial_merges_stack_per_column(spark, wide_mor):
    t = wide_mor
    t.upsert(spark.createDataFrame([("PK1", "P0", "v1", "e1")], WIDE))
    t.merge(spark.createDataFrame([("PK1", "P0", "v2", "zz")], WIDE),
            update_cols=["dataValue"])
    t.merge(spark.createDataFrame([("PK1", "P0", "zz", "e2")], WIDE),
            update_cols=["extra"])
    # each partial touched its own column; both survive
    assert wide_snap(t)["PK1"] == ("P0", "v2", "e2")
    # explicit NULL set is an override, not a fallthrough
    t.merge(spark.createDataFrame([("PK1", "P0", None, "zz")], WIDE),
            update_cols=["dataValue"])
    assert wide_snap(t)["PK1"] == ("P0", None, "e2")


def test_mor_partial_after_delete_and_full_upsert_resets(spark, wide_mor):
    t = wide_mor
    t.upsert(spark.createDataFrame([("PK1", "P0", "v1", "e1")], WIDE))
    t.delete([("PK1", "P0")])
    # partial merge on a dead key = WHEN NOT MATCHED: full carried row inserts
    t.merge(spark.createDataFrame([("PK1", "P0", "v2", "e2")], WIDE),
            update_cols=["dataValue"])
    assert wide_snap(t)["PK1"] == ("P0", "v2", "e2")
    # a later full upsert resets every column (partials below it are dead)
    t.merge(spark.createDataFrame([("PK1", "P0", "z1", "zz")], WIDE),
            update_cols=["extra"])
    t.upsert(spark.createDataFrame([("PK1", "P0", "v3", "e3")], WIDE))
    assert wide_snap(t)["PK1"] == ("P0", "v3", "e3")


def test_mor_partial_compaction_folds_and_preserves(spark, wide_mor):
    t = wide_mor
    t.upsert(spark.createDataFrame(
        [("PK1", "P0", "v1", "e1"), ("PK2", "P0", "v2", "e2")], WIDE))
    t.merge(spark.createDataFrame([("PK1", "P0", "v1b", "zz")], WIDE),
            update_cols=["dataValue"])
    t.merge(spark.createDataFrame([("PK2", "P0", "zz", "e2b")], WIDE),
            update_cols=["extra"])
    before = wide_snap(t)
    v = t.compact()
    assert wide_snap(t) == before
    m = t._read_manifest()
    assert not any(f.get("op") == "partial" for f in m.files)
    assert t.read_incremental(v - 1, v).count() == 0
    # post-compaction partials still apply on the folded base
    t.merge(spark.createDataFrame([("PK1", "P0", "zz", "e9")], WIDE),
            update_cols=["extra"])
    assert wide_snap(t)["PK1"] == ("P0", "v1b", "e9")


def test_mor_partial_rejects_key_or_partition_update(spark, wide_mor):
    t = wide_mor
    t.upsert(spark.createDataFrame([("PK1", "P0", "v1", "e1")], WIDE))
    with pytest.raises(ValueError):
        t.merge(spark.createDataFrame([("PK1", "P1", "v", "e")], WIDE),
                update_cols=["partitionKeyValue"])


def test_vacuum_removes_old_versions_and_orphans(spark, table):
    t = table
    for i in range(5):
        t.upsert(rows(spark, [(f"PK{i}", "P0", f"v{i}")]))
    before = snap_dict(t)
    # plant an orphan (crashed-writer debris: parquet no manifest references)
    orphan_dir = os.path.join(t.path, "data", "partitionKeyValue=P0")
    orphan = os.path.join(orphan_dir, "orphan-debris.parquet")
    rows(spark, [("ZZZ", "P0", "ghost")]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(orphan + ".tmp")
    import glob as _glob
    os.rename(
        _glob.glob(os.path.join(orphan + ".tmp", "*.parquet"))[0], orphan
    )

    stats = t.vacuum(retain_versions=2, orphan_grace_seconds=0)
    assert stats["dropped_manifests"] >= 3
    assert stats["removed_files"] >= 1  # at least the orphan
    # current snapshot unharmed, time travel within retention works
    assert snap_dict(t) == before
    assert t.snapshot(version=t.version() - 1).count() >= 0
    # vacuumed versions fail fast
    with pytest.raises(FileNotFoundError):
        t.snapshot(version=0)


def test_add_column_schema_evolution(spark, table):
    t = table
    t.upsert(rows(spark, [("PK1", "P0", "v1")]))
    t.add_column(T.StructField("note", T.StringType(), True))
    # pre-evolution rows read NULL for the new column
    got = {r["primaryKeyValue"]: r["note"] for r in t.snapshot().collect()}
    assert got == {"PK1": None}
    # post-evolution writes carry it
    wide = T.StructType(list(SCHEMA.fields) + [T.StructField("note", T.StringType(), True)])
    t.upsert(spark.createDataFrame([("PK2", "P1", "v2", "hello")], wide))
    got = {r["primaryKeyValue"]: r["note"] for r in t.snapshot().collect()}
    assert got == {"PK1": None, "PK2": "hello"}
    t.audit_unique()
    with pytest.raises(ValueError):
        t.add_column(T.StructField("note", T.StringType(), True))
    with pytest.raises(ValueError):
        t.add_column(T.StructField("strict", T.StringType(), False))


def test_add_column_on_mor(spark, mor_table):
    t = mor_table
    t.upsert(rows(spark, [("PK1", "P0", "v1")]))
    t.add_column(T.StructField("score", T.DoubleType(), True))
    wide = T.StructType(list(SCHEMA.fields) + [T.StructField("score", T.DoubleType(), True)])
    t.upsert(spark.createDataFrame([("PK1", "P0", "v2", 1.5)], wide))
    got = {r["primaryKeyValue"]: (r["dataValue"], r["score"]) for r in t.snapshot().collect()}
    assert got == {"PK1": ("v2", 1.5)}


def test_mor_key_moves_partition(spark, mor_table):
    """A key upserted into a different partition must resolve to the newest
    row only — and a partition-filtered read must not resurrect the stale
    row (the filter stays above the pk-window, Catalyst can't push it past
    a window keyed on a different column)."""
    t = mor_table
    t.upsert(rows(spark, [("PK1", "P0", "old-home")]))
    t.upsert(rows(spark, [("PK1", "P1", "new-home")]))
    assert snap_dict(t) == {"PK1": ("P1", "new-home")}
    t.audit_unique()
    p0 = t.snapshot().filter(F.col("partitionKeyValue") == "P0").collect()
    assert p0 == []


def test_ingest_streamer_partial_merge(spark, wide_mor, tmp_path):
    """IngestStreamer op='merge' with update_cols: arriving files override
    only the named columns on matched keys (pure delta append on MOR)."""
    from hudi_acid_verification_spark.acid.streamer import IngestStreamer

    t = wide_mor
    t.upsert(spark.createDataFrame(
        [("PK1", "P0", "v1", "e1"), ("PK2", "P1", "v2", "e2")], WIDE))

    drops = tmp_path / "mdrops"
    drops.mkdir()
    spark.createDataFrame(
        [("PK1", "P0", "v1b", "IGNORED"), ("PK3", "P0", "v3", "e3")], WIDE
    ).write.parquet(str(drops / "d1"))

    s = IngestStreamer(t, str(drops / "*" / "*.parquet"))
    assert s.run_once(spark, op="merge", update_cols=["dataValue"]) >= 1
    assert wide_snap(t) == {
        "PK1": ("P0", "v1b", "e1"),   # only dataValue streamed in
        "PK2": ("P1", "v2", "e2"),
        "PK3": ("P0", "v3", "e3"),    # new key inserts the full row
    }
    assert s.run_once(spark, op="merge", update_cols=["dataValue"]) == 0
    with pytest.raises(ValueError):
        s.run_once(spark, op="replace")
    t.audit_unique()


def test_merge_stream_into_mor(spark, wide_mor, tmp_path):
    """foreachBatch partial-column MERGE sink: each micro-batch is one delta
    append; non-updated columns survive from the base rows."""
    from hudi_acid_verification_spark.acid.streamer import (
        merge_stream_into_table,
    )

    t = wide_mor
    t.upsert(spark.createDataFrame(
        [("PK1", "P0", "v1", "e1"), ("PK2", "P1", "v2", "e2")], WIDE))
    v_base = t.version()

    src = tmp_path / "stream_src"
    spark.createDataFrame(
        [("PK1", "P0", "v1b", "MUST-NOT-WIN")], WIDE
    ).coalesce(1).write.parquet(str(src / "batch=0"))
    spark.createDataFrame(
        [("PK2", "P1", "v2b", "MUST-NOT-WIN"), ("PK3", "P2", "v3", "e3")],
        WIDE,
    ).coalesce(1).write.parquet(str(src / "batch=1"))

    stream = (
        spark.readStream.schema(WIDE)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "*.parquet")
        .parquet(str(src) + "/batch=*")
    )
    q = merge_stream_into_table(
        stream, t, str(tmp_path / "ckpt"), update_cols=["dataValue"]
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    assert wide_snap(t) == {
        "PK1": ("P0", "v1b", "e1"),
        "PK2": ("P1", "v2b", "e2"),
        "PK3": ("P2", "v3", "e3"),
    }
    # one commit per micro-batch, all pure partial-delta appends
    assert t.version() == v_base + 2
    m = t._read_manifest()
    assert sum(1 for f in m.files if f.get("op") == "partial") >= 2
    t.audit_unique()


def _cdc_dict(df):
    return {
        r["primaryKeyValue"]: (
            r["_change_op"],
            None if r["before"] is None else tuple(r["before"]),
            None if r["after"] is None else tuple(r["after"]),
        )
        for r in df.collect()
    }


@pytest.mark.parametrize("fixture", ["table", "mor_table"])
def test_changes_cdc_ops_and_images(spark, fixture, request):
    """CDC query parity (Hudi incremental.format=cdc): op + before/after
    images per changed key; carried rows cancel."""
    t = request.getfixturevalue(fixture)
    t.upsert(rows(spark, [("PK1", "P0", "v1"), ("PK2", "P0", "v2")]))
    v1 = t.version()
    t.upsert(rows(spark, [("PK1", "P0", "v9"), ("PK3", "P0", "v3")]))
    v2 = t.version()
    t.delete(["PK2"])
    v3 = t.version()

    # update + insert window: PK2 is a carried row and must not appear
    assert _cdc_dict(t.changes(v1, v2)) == {
        "PK1": ("update", ("P0", "v1"), ("P0", "v9")),
        "PK3": ("insert", None, ("P0", "v3")),
    }
    # delete window carries the full before image
    assert _cdc_dict(t.changes(v2, v3)) == {
        "PK2": ("delete", ("P0", "v2"), None),
    }
    # from table creation everything alive is an insert, deleted keys absent
    assert _cdc_dict(t.changes(0)) == {
        "PK1": ("insert", None, ("P0", "v9")),
        "PK3": ("insert", None, ("P0", "v3")),
    }


def test_changes_sees_schema_evolution_as_null_before(spark, table):
    t = table
    t.upsert(rows(spark, [("PK1", "P0", "v1")]))
    v1 = t.version()
    t.add_column(T.StructField("extra", T.StringType(), True))
    wide = T.StructType(list(SCHEMA.fields) + [T.StructField("extra", T.StringType(), True)])
    t.upsert(spark.createDataFrame([("PK1", "P0", "v2", "e1")], wide))
    assert _cdc_dict(t.changes(v1)) == {
        "PK1": ("update", ("P0", "v1", None), ("P0", "v2", "e1")),
    }


@pytest.mark.parametrize("fixture", ["table", "mor_table"])
def test_restore_rolls_back_and_keeps_history(spark, fixture, request):
    t = request.getfixturevalue(fixture)
    t.upsert(rows(spark, [("PK1", "P0", "v1"), ("PK2", "P1", "v2")]))
    v1 = t.version()
    t.upsert(rows(spark, [("PK1", "P0", "v9"), ("PK3", "P0", "v3")]))
    t.delete(["PK2"])
    v3 = t.version()

    v4 = t.restore(v1)
    assert v4 == v3 + 1
    assert snap_dict(t) == {"PK1": ("P0", "v1"), "PK2": ("P1", "v2")}
    # undone versions still time-travel until vacuumed
    assert {r["primaryKeyValue"] for r in t.snapshot(v3).collect()} == {"PK1", "PK3"}
    # the changefeed across the restore is the inverse of the undone window
    assert _cdc_dict(t.changes(v3, v4)) == {
        "PK1": ("update", ("P0", "v9"), ("P0", "v1")),
        "PK2": ("insert", None, ("P1", "v2")),
        "PK3": ("delete", ("P0", "v3"), None),
    }
    t.audit_unique()


def test_restore_fails_on_vacuumed_version(spark, table):
    t = table
    for i in range(5):
        t.upsert(rows(spark, [("PK1", "P0", f"v{i}")]))
    t.vacuum(retain_versions=2)
    with pytest.raises(FileNotFoundError):
        t.restore(1)


def test_manifest_records_pk_stats(spark, table):
    table.upsert(rows(spark, [("PK1", "P0", "v1"), ("PK5", "P0", "v5"),
                              ("PK9", "P1", "v9")]))
    m = table._read_manifest()
    assert m.files, "commit produced no files"
    for f in m.files:
        assert f["pk_min"] <= f["pk_max"]
    p0 = [f for f in m.files if f["partition"] == "P0"]
    covered = {k for f in p0 for k in ("PK1", "PK5")
               if f["pk_min"] <= k <= f["pk_max"]}
    assert covered == {"PK1", "PK5"}


@pytest.mark.parametrize("fixture", ["table", "mor_table"])
def test_lookup_point_read_prunes_and_resolves(spark, fixture, request):
    """Point lookup must return exactly the live row while reading only
    files whose pk range can contain the probe (column-stats pruning)."""
    t = request.getfixturevalue(fixture)
    t.upsert(rows(spark, [(f"A{i}", "P0", f"a{i}") for i in range(3)]))
    t.upsert(rows(spark, [(f"Z{i}", "P1", f"z{i}") for i in range(3)]))
    t.upsert(rows(spark, [("A1", "P0", "a1-new")]))
    t.delete(["A2"])

    got = {r["primaryKeyValue"]: r["dataValue"] for r in t.lookup("A1").collect()}
    assert got == {"A1": "a1-new"}
    assert t.lookup("A2").count() == 0
    got = {r["primaryKeyValue"] for r in t.lookup(["A0", "Z2"]).collect()}
    assert got == {"A0", "Z2"}

    # pruning: a Z-range probe must not consider the A-range files
    m = t._read_manifest()
    a_files = [f for f in m.files
               if f.get("pk_max", "").startswith("A") and f.get("pk_min")]
    assert a_files, "expected A-range files with stats"
    probe = "Z0"
    kept = [f for f in m.files
            if f.get("pk_min") is None
            or f["pk_min"] <= probe <= f["pk_max"]]
    assert all(f not in kept for f in a_files)
    assert len(kept) < len(m.files)


@pytest.mark.parametrize("fixture", ["table", "mor_table"])
def test_cluster_tightens_stats_and_preserves_rows(spark, fixture, request):
    """Sort-clustering must preserve content, bound files per partition,
    and restore lookup pruning (tight per-file pk ranges)."""
    t = request.getfixturevalue(fixture)
    import random
    rng = random.Random(7)
    keys = [f"K{i:03d}" for i in range(40)]
    rng.shuffle(keys)
    # 4 interleaved commits → many files with overlapping key ranges
    for chunk in (keys[:10], keys[10:20], keys[20:30], keys[30:]):
        t.upsert(rows(spark, [(k, f"P{int(k[1:]) % 2}", f"v-{k}") for k in chunk]))
    before = snap_dict(t)
    n_files_before = len(t._read_manifest().files)

    t.cluster(files_per_partition=2)

    assert snap_dict(t) == before
    m = t._read_manifest()
    per_part: dict[str, list] = {}
    for f in m.files:
        per_part.setdefault(f["partition"], []).append(f)
    for part, fs in per_part.items():
        assert len(fs) <= 3, f"{part} has {len(fs)} files after clustering"
        # ranges within a partition must not overlap (contiguous layout)
        spans = sorted((f["pk_min"], f["pk_max"]) for f in fs)
        for (lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
            assert hi1 <= lo2, f"overlapping ranges in {part}: {spans}"
    # clustering targets files_per_partition=2 × 2 partitions; since the
    # write path now PRESERVES the requested range layout (instead of
    # rebalance-coalescing it back to one file per partition), the bound is
    # the requested layout, not the pre-cluster count
    assert len(m.files) <= 2 * 2, (n_files_before, len(m.files))
    # a point probe now keeps at most one file per partition
    probe = "K013"
    kept = [f for f in m.files if f["pk_min"] <= probe <= f["pk_max"]]
    assert len(kept) <= 2
    got = {r["primaryKeyValue"]: r["dataValue"] for r in t.lookup(probe).collect()}
    assert got == {probe: "v-K013"}
    t.audit_unique()


def test_incremental_agg_maintenance_matches_recompute(spark):
    """The CDC-maintained aggregate must equal a direct recompute of the
    final snapshot (the IVM invariant)."""
    from hudi_acid_verification_spark import operators as ops

    sf = "/root/testdata/sf0.001"
    maintained = {
        r["segment"]: (r["n_customers"], r["balance_cents"])
        for r in ops.QUERIES["acid_incremental_agg_maintenance"](spark, sf).collect()
    }
    # direct recompute from the table the query left behind
    import os, tempfile
    from hudi_acid_verification_spark.acid import AcidTable

    path = os.path.join(
        tempfile.gettempdir(), "hudi_acid_verification_spark", "acid_ivm_sf0.001"
    )
    t = AcidTable(spark, path)
    direct = {
        r["segment"]: (r["n"], r["cents"])
        for r in t.snapshot()
        .groupBy(F.col("partitionKeyValue").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("dataValue").cast("bigint")).alias("cents"),
        )
        .collect()
    }
    assert maintained == direct
    assert "HOUSEHOLD" not in maintained


# ------------------------------------------------------------------ OCC


def _occ_pair(spark, tmp_path):
    """Two writer handles on one COW table, seeded with one row per
    partition; writer A has OCC on."""
    path = str(tmp_path / "occ_tbl")
    t_seed = AcidTable.create(
        spark, path, SCHEMA, pk="primaryKeyValue",
        partition_col="partitionKeyValue", precombine_col="dataValue",
    )
    t_seed.upsert(rows(spark, [("k1", "p1", "v1"), ("k2", "p2", "v2")]))
    a = AcidTable(spark, path, occ=True)
    b = AcidTable(spark, path, occ=True)
    return a, b


def _interleave(a, b, b_action):
    """Run ``b_action`` after A's data files land but before A publishes —
    the deterministic OCC race: B commits a whole transaction inside A's
    lock-free write phase."""
    real = a._write_data
    state = {"fired": False}

    def hooked(df, m, preserve_layout=False):
        entries = real(df, m, preserve_layout=preserve_layout)
        if not state["fired"]:
            state["fired"] = True
            b_action()
        return entries

    a._write_data = hooked
    return a


def test_occ_disjoint_partitions_both_commit(spark, tmp_path):
    a, b = _occ_pair(spark, tmp_path)
    v0 = a.version()
    _interleave(
        a, b, lambda: b.upsert(rows(spark, [("k2", "p2", "v2b")]))
    )
    v = a.upsert(rows(spark, [("k1", "p1", "v1a")]))
    assert v == v0 + 2  # B took v0+1, A rebased onto it
    got = {
        r["primaryKeyValue"]: r["dataValue"] for r in a.snapshot().collect()
    }
    assert got == {"k1": "v1a", "k2": "v2b"}
    a.audit_unique()


def test_occ_same_partition_conflicts_and_retry_succeeds(spark, tmp_path):
    a, b = _occ_pair(spark, tmp_path)
    _interleave(
        a, b, lambda: b.upsert(rows(spark, [("k1", "p1", "v1B")]))
    )
    with pytest.raises(CommitConflictError):
        a.upsert(rows(spark, [("k1", "p1", "v1A")]))
    # loser left no trace: B's write is the visible state and it's clean
    got = {
        r["primaryKeyValue"]: r["dataValue"] for r in a.snapshot().collect()
    }
    assert got == {"k1": "v1B", "k2": "v2"}
    # no orphaned manifest entries: every listed file exists
    m = a._read_manifest()
    for f in m.files:
        assert os.path.exists(os.path.join(a._data_dir, f["file"]))
    # retry against the fresh snapshot wins
    a.upsert(rows(spark, [("k1", "p1", "v1A2")]))
    got = {
        r["primaryKeyValue"]: r["dataValue"] for r in a.snapshot().collect()
    }
    assert got["k1"] == "v1A2"
    a.audit_unique()


def test_occ_delete_rebases_over_disjoint_commit(spark, tmp_path):
    a, b = _occ_pair(spark, tmp_path)
    _interleave(
        a, b, lambda: b.upsert(rows(spark, [("k2", "p2", "v2b")]))
    )
    a.delete(["k1"])
    got = {
        r["primaryKeyValue"]: r["dataValue"] for r in a.snapshot().collect()
    }
    assert got == {"k2": "v2b"}


def _occ_mor_pair(spark, tmp_path):
    path = str(tmp_path / "occ_mor")
    t_seed = AcidTable.create(
        spark, path, SCHEMA, pk="primaryKeyValue",
        partition_col="partitionKeyValue", precombine_col=None,
        mode="mor",
    )
    t_seed.upsert(rows(spark, [("k1", "p1", "v0")]))
    return AcidTable(spark, path, occ=True), AcidTable(spark, path, occ=True)


def test_occ_mor_sequential_works(spark, tmp_path):
    a, _ = _occ_mor_pair(spark, tmp_path)
    a.upsert(rows(spark, [("k1", "p1", "v2")]))
    got = {r["primaryKeyValue"]: r["dataValue"] for r in a.snapshot().collect()}
    assert got == {"k1": "v2"}


def test_occ_mor_raced_append_rebases_seq_and_wins(spark, tmp_path):
    """Two MOR writers race on the SAME key: B commits inside A's write
    phase; A rebases by rewriting its delta's __seq to the granted
    version, so A — the later commit — wins latest-per-key resolution.
    Zero conflicts, both transactions land."""
    a, b = _occ_mor_pair(spark, tmp_path)
    v0 = a.version()
    _interleave(
        a, b, lambda: b.upsert(rows(spark, [("k1", "p1", "vB")]))
    )
    v = a.upsert(rows(spark, [("k1", "p1", "vA")]))
    assert v == v0 + 2
    got = {r["primaryKeyValue"]: r["dataValue"] for r in a.snapshot().collect()}
    assert got == {"k1": "vA"}  # publish order decides latest-wins
    a.audit_unique()
    # the rebased delta carries the granted seq in manifest and rows
    m = a._read_manifest()
    assert max(f.get("seq", 0) for f in m.files) == v


def test_occ_mor_raced_delete_rebases(spark, tmp_path):
    a, b = _occ_mor_pair(spark, tmp_path)
    _interleave(
        a, b, lambda: b.upsert(rows(spark, [("k1", "p1", "vB")]))
    )
    a.delete([("k1", "p1")])
    assert a.snapshot().count() == 0  # delete published later, wins


def test_occ_threaded_disjoint_writers_all_commit(spark, tmp_path):
    """4 OCC writers × 3 commits each, every writer owning its own
    partition: all 12 commits must land (rebase, not conflict) and the
    final state must hold every write."""
    path = str(tmp_path / "occ_threads")
    AcidTable.create(
        spark, path, SCHEMA, pk="primaryKeyValue",
        partition_col="partitionKeyValue", precombine_col="dataValue",
    )
    errs = []

    def writer(i: int):
        t = AcidTable(spark, path, occ=True)
        try:
            for j in range(3):
                t.upsert(rows(spark, [(f"k{i}", f"p{i}", f"v{i}_{j}")]))
        except Exception as ex:  # noqa: BLE001
            errs.append((i, ex))

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(4)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs, errs
    t = AcidTable(spark, path)
    assert t.version() == 12
    got = {
        r["primaryKeyValue"]: r["dataValue"] for r in t.snapshot().collect()
    }
    assert got == {f"k{i}": f"v{i}_2" for i in range(4)}
    t.audit_unique()


# ------------------------------------------------------- partition evolution


def test_repartition_table_cow_preserves_rows_and_serves_dml(spark, tmp_path):
    path = str(tmp_path / "repart_cow")
    t = AcidTable.create(
        spark, path, SCHEMA, pk="primaryKeyValue",
        partition_col="partitionKeyValue", precombine_col="dataValue",
    )
    t.upsert(rows(spark, [("k1", "p1", "a"), ("k2", "p2", "b"),
                          ("k3", "p1", "a")]))
    v_old = t.version()
    before = {(r[0], r[1], r[2]) for r in t.snapshot().collect()}
    t.repartition_table("dataValue")
    m = t._read_manifest()
    assert m.partition_col == "dataValue"
    assert {f["partition"] for f in m.files} == {"a", "b"}
    assert {(r[0], r[1], r[2]) for r in t.snapshot().collect()} == before
    # time travel to the pre-evolution layout still resolves
    assert {(r[0], r[1], r[2])
            for r in t.snapshot(version=v_old).collect()} == before
    # DML under the new layout
    t.upsert(rows(spark, [("k4", "p3", "b")]))
    t.delete(["k1"])
    got = {r["primaryKeyValue"] for r in t.snapshot().collect()}
    assert got == {"k2", "k3", "k4"}
    assert t.lookup("k4").count() == 1
    t.audit_unique()


def test_repartition_table_mor_resolves_then_evolves(spark, tmp_path):
    path = str(tmp_path / "repart_mor")
    t = AcidTable.create(
        spark, path, SCHEMA, pk="primaryKeyValue",
        partition_col="partitionKeyValue", precombine_col="dataValue",
        mode="mor",
    )
    t.upsert(rows(spark, [("k1", "p1", "a"), ("k2", "p2", "b")]))
    t.upsert(rows(spark, [("k1", "p1", "a2")]))  # delta shadows base
    t.delete([("k2", "p2")])                      # tombstone
    t.repartition_table("dataValue")
    m = t._read_manifest()
    assert m.partition_col == "dataValue"
    got = {
        r["primaryKeyValue"]: r["dataValue"] for r in t.snapshot().collect()
    }
    assert got == {"k1": "a2"}
    # deltas/tombstones resolved away: new layout starts from base files
    assert all(f.get("kind") == "base" for f in m.files)
    t.upsert(rows(spark, [("k9", "p9", "z")]))
    assert t.snapshot().count() == 2
    t.audit_unique()


def test_repartition_table_rejects_bad_column(spark, tmp_path):
    path = str(tmp_path / "repart_bad")
    t = AcidTable.create(
        spark, path, SCHEMA, pk="primaryKeyValue",
        partition_col="partitionKeyValue", precombine_col="dataValue",
    )
    with pytest.raises(ValueError, match="not a schema column"):
        t.repartition_table("nope")
    with pytest.raises(ValueError, match="already partitioned"):
        t.repartition_table("partitionKeyValue")


def test_history_records_timeline_actions(spark, tmp_path):
    """Every commit carries its action label (Hudi timeline analog):
    create → upsert → merge → delete → compact/cluster → restore."""
    path = str(tmp_path / "timeline")
    t = AcidTable.create(
        spark, path, SCHEMA, pk="primaryKeyValue",
        partition_col="partitionKeyValue", precombine_col="dataValue",
    )
    t.upsert(rows(spark, [("k1", "p1", "a"), ("k2", "p2", "b")]))
    t.merge(rows(spark, [("k1", "p1", "a2")]), update_cols=["dataValue"])
    t.delete(["k2"])
    t.restore(1)
    got = [h["op"] for h in t.history()]
    assert got == ["create", "upsert", "merge", "delete", "restore"]


def test_vacuum_grace_protects_inflight_occ_write(spark, tmp_path):
    """A cleaner racing an optimistic writer must NOT delete the writer's
    freshly staged (still-unreferenced) files: vacuum runs between A's
    data write and A's publish, and A's commit must still succeed and
    read back intact."""
    a, b = _occ_pair(spark, tmp_path)
    _interleave(a, b, lambda: b.vacuum(retain_versions=1))
    a.upsert(rows(spark, [("k1", "p1", "v1a")]))
    got = {
        r["primaryKeyValue"]: r["dataValue"] for r in a.snapshot().collect()
    }
    assert got["k1"] == "v1a"
    # every manifest-listed file exists (nothing was vacuumed from under us)
    m = a._read_manifest()
    for f in m.files:
        assert os.path.exists(os.path.join(a._data_dir, f["file"]))


# ------------------------------------------------------------- shallow clone


def test_shallow_clone_cow_reads_and_diverges(spark, tmp_path):
    src_path = str(tmp_path / "clone_src")
    src = AcidTable.create(
        spark, src_path, SCHEMA, pk="primaryKeyValue",
        partition_col="partitionKeyValue", precombine_col="dataValue",
    )
    src.upsert(rows(spark, [("k1", "p1", "a"), ("k2", "p2", "b")]))
    clone = src.clone_to(str(tmp_path / "clone_dst"))
    # zero-copy: clone's own data dir holds no parquet yet
    n_local = sum(
        len([f for f in fs if f.endswith(".parquet")])
        for _, _, fs in os.walk(clone._data_dir)
    )
    assert n_local == 0
    assert snap_dict(clone) == snap_dict(src)
    # divergence: clone writes stay local, source unaffected (and reverse)
    clone.upsert(rows(spark, [("k1", "p1", "a-clone")]))
    src.upsert(rows(spark, [("k2", "p2", "b-src")]))
    assert snap_dict(clone) == {"k1": ("p1", "a-clone"), "k2": ("p2", "b")}
    assert snap_dict(src) == {"k1": ("p1", "a"), "k2": ("p2", "b-src")}
    # untouched partition of the clone still references the source root
    m = clone._read_manifest()
    assert any(f.get("root") for f in m.files)
    assert clone.lookup("k2").first()["dataValue"] == "b"
    clone.audit_unique()


def test_shallow_clone_compact_materializes(spark, tmp_path):
    src_path = str(tmp_path / "clone_src2")
    src = AcidTable.create(
        spark, src_path, SCHEMA, pk="primaryKeyValue",
        partition_col="partitionKeyValue", precombine_col="dataValue",
    )
    src.upsert(rows(spark, [("k1", "p1", "a"), ("k2", "p2", "b"),
                            ("k3", "p1", "c")]))
    clone = src.clone_to(str(tmp_path / "clone_dst2"))
    before = snap_dict(clone)
    clone.compact(max_files_per_partition=0)
    m = clone._read_manifest()
    assert not any(f.get("root") for f in m.files), "still references source"
    assert snap_dict(clone) == before
    # now fully independent: dropping the source leaves the clone intact
    AcidTable.drop(src_path)
    assert snap_dict(clone) == before


def test_shallow_clone_mor_and_version_pin(spark, tmp_path):
    src_path = str(tmp_path / "clone_src3")
    src = AcidTable.create(
        spark, src_path, SCHEMA, pk="primaryKeyValue",
        partition_col="partitionKeyValue", precombine_col=None, mode="mor",
    )
    src.upsert(rows(spark, [("k1", "p1", "v1")]))
    v1 = src.version()
    src.upsert(rows(spark, [("k1", "p1", "v2")]))
    clone_old = src.clone_to(str(tmp_path / "clone_dst3a"), version=v1)
    clone_new = src.clone_to(str(tmp_path / "clone_dst3b"))
    assert snap_dict(clone_old) == {"k1": ("p1", "v1")}
    assert snap_dict(clone_new) == {"k1": ("p1", "v2")}
    clone_new.delete([("k1", "p1")])
    assert clone_new.snapshot().count() == 0
    assert snap_dict(src) == {"k1": ("p1", "v2")}


# ---------------------------------------------------------------- r3 fixes


def test_bloom_bytes_key_no_false_negative():
    """BinaryType pk: _bloom_build decodes bytes to utf-8 before hashing,
    so _bloom_contains must decode the probe the same way — str(b'..')
    would hash \"b'..'\" and guarantee a false negative (silent wrong
    pruning in lookup()/delete())."""
    bloom = AcidTable._bloom_build([b"key-1", b"key-2", b"key-3"])
    assert bloom is not None
    for k in (b"key-1", b"key-2", b"key-3"):
        assert AcidTable._bloom_contains(bloom, k)
        # decoded-str probe hits the same bits
        assert AcidTable._bloom_contains(bloom, k.decode())


def test_lookup_binary_pk_end_to_end(spark, tmp_path):
    schema = T.StructType(
        [
            T.StructField("pk", T.BinaryType(), False),
            T.StructField("part", T.StringType(), False),
            T.StructField("val", T.StringType(), True),
        ]
    )
    t = AcidTable.create(
        spark, str(tmp_path / "binpk"), schema, pk="pk",
        partition_col="part", precombine_col=None,
    )
    t.upsert(spark.createDataFrame(
        [(b"alpha", "p1", "v1"), (b"beta", "p1", "v2")], schema))
    t.upsert(spark.createDataFrame([(b"gamma", "p2", "v3")], schema))
    got = t.lookup(b"alpha").collect()
    assert len(got) == 1 and got[0]["val"] == "v1"
    # bytes scalar must not be iterated into a list of ints
    assert t.lookup(b"gamma").count() == 1


def test_occ_raced_repartition_table_conflicts(spark, tmp_path):
    """A raced partition-evolution commit changes partition_col; even when
    partition VALUE sets are disjoint (A inserts a brand-new partition),
    the rebase must conflict — appending old-layout files onto the new
    manifest would publish an unreadable mixed layout."""
    a, b = _occ_pair(spark, tmp_path)
    _interleave(a, b, lambda: b.repartition_table("dataValue"))
    with pytest.raises(CommitConflictError, match="metadata"):
        a.upsert(rows(spark, [("k9", "p9-brand-new", "v9")]))
    # loser left no orphans referenced anywhere; table reads clean under
    # the new layout and a retry against the fresh snapshot lands
    assert a._read_manifest().partition_col == "dataValue"
    a.upsert(rows(spark, [("k9", "p9-brand-new", "v9")]))
    got = {r["primaryKeyValue"] for r in a.snapshot().collect()}
    assert got == {"k1", "k2", "k9"}
    a.audit_unique()


def test_occ_vacuumed_intermediate_manifest_retries_internally(spark, tmp_path):
    """A concurrent vacuum dropping an intermediate manifest mid-replay is
    a content-preserving layout race: the writer retries internally
    against the fresh snapshot and COMMITS (r5 layout fairness —
    previously this surfaced CommitConflictError for the caller to
    retry). It must never leak a FileNotFoundError or orphan files."""
    a, b = _occ_pair(spark, tmp_path)

    def b_commits_then_vacuums():
        b.upsert(rows(spark, [("k2", "p2", "v2b")]))
        b.upsert(rows(spark, [("k2", "p2", "v2c")]))
        b.vacuum(retain_versions=1, orphan_grace_seconds=3600.0)

    _interleave(a, b, b_commits_then_vacuums)
    a.upsert(rows(spark, [("k1", "p1", "v1a")]))  # absorbed, no conflict
    # every manifest-listed file exists; both writers' rows landed
    m = a._read_manifest()
    for f in m.files:
        assert os.path.exists(os.path.join(a._data_dir, f["file"]))
    s = snap_dict(a)
    assert s["k1"] == ("p1", "v1a") and s["k2"] == ("p2", "v2c")
    a.audit_unique()


def test_zorder_wide_column_list_no_bit_overflow(spark, tmp_path):
    """≥6 z-order columns at 12 bits/dim would shift past 63 and alias
    bits mod 64; _with_zvalue must scale bits-per-dim down instead."""
    schema = T.StructType(
        [T.StructField("pk", T.StringType(), False),
         T.StructField("part", T.StringType(), False)]
        + [T.StructField(f"c{i}", T.LongType(), True) for i in range(6)]
    )
    t = AcidTable.create(
        spark, str(tmp_path / "zwide"), schema, pk="pk",
        partition_col="part", precombine_col=None,
    )
    data = [(f"k{j}", "p", *[(j * (i + 1)) % 97 for i in range(6)])
            for j in range(50)]
    df = spark.createDataFrame(data, schema)
    zdf = t._with_zvalue(df, [f"c{i}" for i in range(6)])
    vals = [r["__zval__"] for r in zdf.collect()]
    # 6 dims → 10 bits each → every key below 2^60, none negative/aliased
    assert all(0 <= v < (1 << 60) for v in vals)
    # single-dim sanity at reduced bits: ordering by zval == ordering by col
    one = t._with_zvalue(df.select("pk", "part", "c0"), ["c0"]).collect()
    by_z = [r["c0"] for r in sorted(one, key=lambda r: r["__zval__"])]
    assert by_z == sorted(by_z)
    with pytest.raises(ValueError, match="63"):
        t._with_zvalue(df, [f"c{i % 6}" for i in range(70)])


def test_mor_merge_keeps_target_partition_on_partition_mismatch(spark, mor_table):
    """A matched MERGE must never move the row to the source's partition
    (the reference's matched branch updates dataValue only) — including
    when update_cols covers every non-key column, and including across a
    compaction whose crowded set initially excludes the base row's
    partition (the payload file lands in the SOURCE partition; folding it
    without its base would flip the partition). Regression for the
    model-test finding (seed 101)."""
    t = mor_table
    t.upsert(rows(spark, [("PK1", "P2", "v1")]))
    t.merge(rows(spark, [("PK1", "P1", "v2")]), update_cols=["dataValue"])
    assert snap_dict(t) == {"PK1": ("P2", "v2")}
    t.compact()
    assert snap_dict(t) == {"PK1": ("P2", "v2")}
    t.audit_unique()


def test_mor_compact_does_not_resurrect_cross_partition_tombstone(spark, mor_table):
    """Folding a tombstone without the cross-partition base it shadows
    must not resurrect the key: the fold set closes under pk-range
    overlap so the shadowed base folds (and dies) together with the
    tombstone. Regression for the resurrection repro."""
    t = mor_table
    t.upsert(rows(spark, [("PK1", "P2", "v1")]))
    t.compact()  # P2 becomes a single quiet base file
    t.upsert(rows(spark, [("PK1", "P1", "v2")]))  # cross-partition move
    t.delete(["PK1"])
    assert snap_dict(t) == {}
    t.compact()
    assert snap_dict(t) == {}, "deleted key resurrected by compaction"


def test_mor_update_where_sees_partial_payload_state(spark, tmp_path):
    """Predicate UPDATE must evaluate against CURRENT state (including
    partial-payload overrides living in other partitions) and its delta
    must survive partial-payload resolution. Regression: the update
    delta was written with an op marker the partial resolution path
    dropped, and the subset resolve matched stale values."""
    t = AcidTable.create(
        spark, str(tmp_path / "uw"), SCHEMA, pk="primaryKeyValue",
        partition_col="partitionKeyValue", precombine_col=None, mode="mor",
    )
    t.upsert(rows(spark, [("PK1", "P2", "v1"), ("PK2", "P0", "x1")]))
    t.merge(rows(spark, [("PK1", "P1", "v2")]), update_cols=["dataValue"])
    t.update_where("dataValue", {"dataValue": "UPD"}, lo="v2", hi="v2")
    assert snap_dict(t) == {"PK1": ("P2", "UPD"), "PK2": ("P0", "x1")}
    # and the stale value must NOT match: v1 is history, not state
    t.update_where("dataValue", {"dataValue": "BAD"}, lo="v1", hi="v1")
    assert snap_dict(t) == {"PK1": ("P2", "UPD"), "PK2": ("P0", "x1")}


def test_mor_scan_range_excludes_cross_partition_shadowed_base(
    spark, mor_table
):
    """scan_range's MOR partition pruning must close the candidate set
    under pk overlap: after PK1 moves P0→P1 via upsert, a range predicate
    matching only the STALE P0 value must not resurrect it (regression:
    unclosed subset resolved P0 alone and returned the shadowed base)."""
    t = mor_table
    t.upsert(rows(spark, [("PK1", "P0", "aaa"), ("PK2", "P1", "mmm")]))
    t.upsert(rows(spark, [("PK1", "P1", "zzz")]))  # cross-partition move
    assert t.scan_range("dataValue", lo="aaa", hi="aaa").count() == 0
    live = {
        r["primaryKeyValue"]: (r["partitionKeyValue"], r["dataValue"])
        for r in t.scan_range("dataValue", lo="zzz", hi="zzz").collect()
    }
    assert live == {"PK1": ("P1", "zzz")}


def test_merge_rejects_partition_update_cols_both_modes(
    spark, table, mor_table
):
    """update_cols naming the pk or partition column is rejected on COW
    and MOR alike — one contract, not a MOR-only partial-payload check."""
    for t in (table, mor_table):
        t.upsert(rows(spark, [("PK1", "P0", "v1")]))
        for cols in (["partitionKeyValue"], ["dataValue", "primaryKeyValue"]):
            with pytest.raises(ValueError, match="update_cols"):
                t.merge(rows(spark, [("PK1", "P9", "x")]), update_cols=cols)
        assert snap_dict(t) == {"PK1": ("P0", "v1")}


def test_mor_cdc_sees_cross_partition_move_before_image(spark, mor_table):
    """The CDC/incremental file diff must close its partition set under pk
    overlap: after PK1 moves P0→P1, changes() must report an UPDATE with
    the (P0, old) before image — an unclosed subset resolves only P1 on
    the before side and misreports an insert (regression)."""
    t = mor_table
    t.upsert(rows(spark, [("PK1", "P0", "old"), ("PKX", "P1", "pad")]))
    v1 = t.version()
    t.upsert(rows(spark, [("PK1", "P1", "new")]))
    v2 = t.version()
    got = {
        r["primaryKeyValue"]: (r["_change_op"], r["before"], r["after"])
        for r in t.changes(v1, v2).collect()
    }
    assert set(got) == {"PK1"}
    op, before, after = got["PK1"]
    assert op == "update"
    assert (before["partitionKeyValue"], before["dataValue"]) == ("P0", "old")
    assert (after["partitionKeyValue"], after["dataValue"]) == ("P1", "new")
    # move-then-delete: the deleted key's only window-touched partition is
    # P1, but its v1 before-row lives in P0 — deleted_keys must still see it
    t.delete(["PK1"])
    v3 = t.version()
    assert {r[0] for r in t.deleted_keys(v1, v3).collect()} == {"PK1"}
    cdc = {
        r["primaryKeyValue"]: r["_change_op"]
        for r in t.changes(v1, v3).collect()
    }
    assert cdc == {"PK1": "delete"}


def test_merge_explicit_null_set_wins_both_modes(spark, tmp_path):
    """SQL MERGE semantics on both table types: WHEN MATCHED UPDATE SET
    col = NULL nulls the column (regression: COW's coalesce kept the old
    value while MOR honored the explicit NULL — cross-mode divergence),
    and a matched row's NULL in a NON-updated column stays NULL instead
    of stealing the source's value."""
    for mode in ("cow", "mor"):
        t = AcidTable.create(
            spark, str(tmp_path / f"nullset_{mode}"), SCHEMA,
            pk="primaryKeyValue", partition_col="partitionKeyValue",
            precombine_col=None, mode=mode,
        )
        t.upsert(rows(spark, [("PK1", "P0", "v")]))
        t.merge(rows(spark, [("PK1", "P0", None)]), update_cols=["dataValue"])
        assert snap_dict(t) == {"PK1": ("P0", None)}, mode
        t.upsert(rows(spark, [("PK2", "P0", None)]))
        t.merge(rows(spark, [("PK2", "P0", "donttake")]), update_cols=[])
        assert snap_dict(t)["PK2"] == ("P0", None), mode


def test_cow_upsert_moves_row_across_partitions(spark, table):
    """An upsert whose incoming partition differs from the matched row's
    current partition must MOVE the row — rewriting the old partition too
    — never leave a same-pk row behind in the old partition. Regression
    for the model-test finding (seed 303, cross-partition upsert)."""
    t = table
    t.upsert(rows(spark, [("PK1", "P1", "v1"), ("PK2", "P0", "x1")]))
    t.upsert(rows(spark, [("PK1", "P0", "v2")]))
    assert snap_dict(t) == {"PK1": ("P0", "v2"), "PK2": ("P0", "x1")}
    t.audit_unique()


def test_mor_compact_does_not_resurrect_shadowed_cross_partition_row(
    spark, tmp_path
):
    """Partial-fold resurrection regression (found by the concurrent
    linearizability soak, reachable single-threaded): a cross-partition
    move leaves a stale shadowed base copy behind; once the DESTINATION
    partition has been compacted into a quiet single base, a LATER
    compaction folding only the stale copy's partition re-emits it at the
    new commit's seq — above the true row — unless the fold set is closed
    under pk overlap for plain full-row folds too."""
    t = AcidTable.create(
        spark, str(tmp_path / "resurrect"), SCHEMA,
        pk="primaryKeyValue", partition_col="partitionKeyValue",
        precombine_col=None, mode="mor",
    )
    t.upsert(rows(spark, [("PK1", "P2", "stale"), ("PK9", "P2", "other")]))
    t.compact()  # establish a P2 BASE file holding PK1
    # move PK1 to P1: delta lands in P1, the P2 base copy is shadowed
    t.upsert(rows(spark, [("PK1", "P1", "moved")]))
    # fold P1 (the only partition holding a delta) into a quiet base
    t.compact()
    assert snap_dict(t)["PK1"] == ("P1", "moved")
    # an unrelated delta makes P2 crowded while P1 stays quiet
    t.upsert(rows(spark, [("PK9", "P2", "other2")]))
    t.compact()  # pre-fix: folded P2 alone, re-emitting stale PK1 on top
    assert snap_dict(t)["PK1"] == ("P1", "moved"), "stale copy resurrected"
    assert snap_dict(t)["PK9"] == ("P2", "other2")
    t.audit_unique()
    # every retained version still time-travels to its own state
    assert {
        r["primaryKeyValue"]: r["dataValue"]
        for r in t.snapshot(version=3).collect()
    }["PK1"] == "moved"


def test_pk_closure_sweep_equals_bruteforce_fixpoint(spark, tmp_path):
    """The memoized sort-sweep closure (r5, replaces the O(rounds×files²)
    fixpoint) must equal the brute-force fixpoint on randomized manifests:
    int and string pk stats, stats-less files, seed partitions with and
    without files, multi-chain overlap graphs."""
    import random

    from hudi_acid_verification_spark.acid.table import AcidTable, _Manifest

    t = AcidTable.create(
        spark, str(tmp_path / "closure"), SCHEMA,
        pk="primaryKeyValue", partition_col="partitionKeyValue",
        precombine_col=None, mode="mor",
    )

    def brute(m, parts):
        overlaps = AcidTable._pk_overlap
        parts = set(parts)
        grew = True
        while grew:
            grew = False
            inside = [f for f in m.files if f["partition"] in parts]
            for f in m.files:
                if f["partition"] not in parts and any(
                    overlaps(f, g) for g in inside
                ):
                    parts.add(f["partition"])
                    grew = True
        return parts

    rng = random.Random(20260815)
    for trial in range(200):
        n_files = rng.randint(0, 18)
        n_parts = rng.randint(1, 6)
        files = []
        for i in range(n_files):
            part = f"P{rng.randrange(n_parts)}"
            if rng.random() < 0.12:
                files.append({"file": f"f{i}", "partition": part})  # no stats
            else:
                if rng.random() < 0.5:
                    lo = rng.randint(0, 40)
                    hi = lo + rng.randint(0, 12)
                else:
                    lo = f"k{rng.randint(0, 40):02d}"
                    hi = f"k{min(99, int(lo[1:]) + rng.randint(0, 12)):02d}"
                files.append(
                    {"file": f"f{i}", "partition": part,
                     "pk_min": lo, "pk_max": hi}
                )
        # keep pk stats type-consistent per manifest (same-table invariant)
        kinds = {type(f["pk_min"]) for f in files if "pk_min" in f}
        if len(kinds) > 1:
            files = [
                f for f in files
                if "pk_min" not in f or isinstance(f["pk_min"], int)
            ]
        m = _Manifest(
            version=trial, schema=SCHEMA, pk="primaryKeyValue",
            partition_col="partitionKeyValue", precombine_col=None,
            files=files, mode="mor",
        )
        seed_pool = [f"P{j}" for j in range(n_parts)] + ["P_empty"]
        seed = set(rng.sample(seed_pool, rng.randint(1, len(seed_pool))))
        got = t._pk_closed_partitions(m, seed)
        want = brute(m, seed)
        assert got == want, (trial, files, seed, got, want)
        # memoized second call answers identically for a different seed
        seed2 = {rng.choice(seed_pool)}
        assert t._pk_closed_partitions(m, seed2) == brute(m, seed2)
