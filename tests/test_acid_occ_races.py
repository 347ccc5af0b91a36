"""Directed OCC race tests — deterministic interleavings of two writers.

Each test pins writer A's snapshot by pausing it between its lock-free
data write and its publish (the instance's ``_acquire_lock`` waits on an
event), lets writer B commit in the gap, then releases A. This is the
exact window the OCC design races over (table.py `_commit` occ=True), made
deterministic so the assertions are about SEMANTICS, not thread luck.

The isolation contract these tests pin down (and the docstrings document):

- COW: a raced commit whose file delta overlaps mine in PARTITION *or in
  PRIMARY-KEY RANGE* conflicts. Partition intersection alone is not
  enough — two writers inserting the SAME new pk into DIFFERENT
  partitions would both survive a partition-only check and publish a
  duplicate key, breaking the table's core invariant
  (ResultSet.java:26-34 pk uniqueness).
- MOR: appends rebase with a seq fix-up; read-time resolution makes the
  outcome equal to replaying the commits in version order (full-row
  deltas are last-writer-wins, partial payloads resolve matched-ness at
  read time against whatever committed below them).
- Presence-dependent ops (bare-key DELETE pruned against the pinned
  snapshot) are snapshot-isolation, not serializable: a concurrently
  inserted key can be missed. Same caveat as Hudi's file-level OCC.
"""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import types as T

from hudi_acid_verification_spark.acid import AcidTable
from hudi_acid_verification_spark.acid.table import CommitConflictError

SCHEMA = T.StructType(
    [
        T.StructField("primaryKeyValue", T.StringType(), False),
        T.StructField("partitionKeyValue", T.StringType(), False),
        T.StructField("dataValue", T.StringType(), True),
    ]
)


def _rows(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _snap(table):
    return {
        r["primaryKeyValue"]: (r["partitionKeyValue"], r["dataValue"])
        for r in table.snapshot().collect()
    }


def _race(table_a, op_a, op_b):
    """Run ``op_a`` on a paused writer: A's lock-free mutate executes
    against the current snapshot, then A waits; ``op_b`` commits in the
    window; A resumes and publishes (or conflicts). Returns A's error."""
    a_wrote = threading.Event()
    b_done = threading.Event()
    orig = type(table_a)._acquire_lock

    def paused_acquire(timeout):
        a_wrote.set()
        assert b_done.wait(120), "writer B never committed"
        return orig(table_a, timeout)

    table_a._acquire_lock = paused_acquire
    err: list[BaseException] = []

    def run_a():
        try:
            op_a()
        except BaseException as exc:  # noqa: BLE001 - surfaced to the test
            err.append(exc)

    th = threading.Thread(target=run_a)
    th.start()
    try:
        assert a_wrote.wait(120), "writer A never reached publish"
        op_b()
    finally:
        b_done.set()
        th.join(120)
        del table_a._acquire_lock  # restore the class method
    return err[0] if err else None


@pytest.fixture()
def cow(spark, tmp_path):
    path = str(tmp_path / "occ_cow")
    AcidTable.create(
        spark, path, SCHEMA, pk="primaryKeyValue",
        partition_col="partitionKeyValue", mode="cow",
    )
    t = AcidTable(spark, path, occ=True)
    t.upsert(_rows(spark, [("PK0", "P0", "base")]))
    return t, AcidTable(spark, path, occ=True)


@pytest.fixture()
def mor(spark, tmp_path):
    path = str(tmp_path / "occ_mor")
    AcidTable.create(
        spark, path, SCHEMA, pk="primaryKeyValue",
        partition_col="partitionKeyValue", mode="mor", compact_every=None,
    )
    t = AcidTable(spark, path, occ=True)
    t.upsert(_rows(spark, [("PK0", "P0", "base")]))
    return t, AcidTable(spark, path, occ=True)


def test_cow_same_new_pk_cross_partition_conflicts(spark, cow):
    """Insert/insert race on ONE new pk aimed at DIFFERENT partitions:
    partition sets are disjoint, so only a pk-range check can see it.
    Without one, both rows publish and the snapshot carries a duplicate
    primary key."""
    a, b = cow
    err = _race(
        a,
        lambda: a.upsert(_rows(spark, [("PK7", "P1", "from_a")])),
        lambda: b.upsert(_rows(spark, [("PK7", "P2", "from_b")])),
    )
    assert isinstance(err, CommitConflictError), (
        f"cross-partition same-pk race must conflict, got {err!r}"
    )
    a.audit_unique()
    assert _snap(a)["PK7"] == ("P2", "from_b")
    # the loser retries against the fresh snapshot and lands cleanly
    a.upsert(_rows(spark, [("PK7", "P1", "from_a")]))
    a.audit_unique()
    assert _snap(a)["PK7"] == ("P1", "from_a")


def test_cow_disjoint_keys_disjoint_partitions_both_survive(spark, cow):
    """The OCC throughput win must survive the stricter check: disjoint
    partitions AND disjoint pk ranges rebase cleanly — both commits
    publish without a retry."""
    a, b = cow
    err = _race(
        a,
        lambda: a.upsert(_rows(spark, [("PKa1", "P1", "a")])),
        lambda: b.upsert(_rows(spark, [("PKz9", "P2", "b")])),
    )
    assert err is None, f"disjoint writers must both publish, got {err!r}"
    s = _snap(a)
    assert s["PKa1"] == ("P1", "a") and s["PKz9"] == ("P2", "b")
    a.audit_unique()


def test_cow_merge_insert_vs_raced_insert_conflicts(spark, cow):
    """The same hole through MERGE's WHEN NOT MATCHED branch: A's merge
    decided 'insert' against the pinned snapshot; B inserts the same key
    into another partition in the window."""
    a, b = cow
    err = _race(
        a,
        lambda: a.merge(
            _rows(spark, [("PK8", "P1", "merged")]), update_cols=["dataValue"]
        ),
        lambda: b.upsert(_rows(spark, [("PK8", "P2", "raced")])),
    )
    assert isinstance(err, CommitConflictError)
    a.audit_unique()
    assert _snap(a)["PK8"] == ("P2", "raced")


def test_mor_full_row_race_is_version_order_lww(spark, mor):
    """MOR insert/insert on one key across partitions: the rebase grants A
    the LATER seq, so read-time resolution must equal replaying the two
    commits in version order — A wins, no duplicate."""
    a, b = mor
    err = _race(
        a,
        lambda: a.upsert(_rows(spark, [("PK7", "P1", "from_a")])),
        lambda: b.upsert(_rows(spark, [("PK7", "P2", "from_b")])),
    )
    assert err is None, f"MOR appends must rebase, got {err!r}"
    a.audit_unique()
    assert _snap(a)["PK7"] == ("P1", "from_a")


def test_mor_partial_merge_over_raced_insert_resolves_as_update(spark, mor):
    """A's partial-payload merge was computed while PK9 did not exist; B
    inserts PK9 in the window. Read-time matched-ness must see B's row
    below A's partial and apply the UPDATE branch: B's partition kept,
    only dataValue overridden — exactly the version-order serial replay."""
    a, b = mor
    err = _race(
        a,
        lambda: a.merge(
            _rows(spark, [("PK9", "P1", "patched")]), update_cols=["dataValue"]
        ),
        lambda: b.upsert(_rows(spark, [("PK9", "P2", "raced")])),
    )
    assert err is None, f"MOR partial merge must rebase, got {err!r}"
    a.audit_unique()
    assert _snap(a)["PK9"] == ("P2", "patched")


def _data_files(table):
    """Every data file on disk under the table's data dir (relative)."""
    import os

    root = table._data_dir
    out = set()
    for dirpath, _dirs, files in os.walk(root):
        for fn in files:
            out.add(os.path.relpath(os.path.join(dirpath, fn), root))
    return out


def _referenced_files(table):
    import json
    import os

    out = set()
    for name in os.listdir(table._manifest_dir):
        if name.startswith("v") and name.endswith(".json"):
            with open(os.path.join(table._manifest_dir, name)) as f:
                for e in json.load(f).get("files", []):
                    out.add(e["file"])
    return out


def test_cow_raced_schema_evolution_conflicts_and_cleans_up(spark, cow):
    """A's pinned snapshot predates B's ADD COLUMN: publishing A's files
    (written under the OLD schema) onto the evolved manifest would be a
    mixed layout — the metadata check must conflict, and A's orphaned
    data files must be cleaned up (no stray unreferenced parquet)."""
    a, b = cow
    err = _race(
        a,
        lambda: a.upsert(_rows(spark, [("PK5", "P1", "stale-schema")])),
        lambda: b.evolve_schema(add={"extra": "string"}),
    )
    assert isinstance(err, CommitConflictError)
    assert "metadata" in str(err)
    assert _data_files(a) <= _referenced_files(a), "conflict left orphans"
    a.audit_unique()


def test_cow_raced_partition_evolution_conflicts(spark, cow):
    """Same metadata race through PARTITION evolution: A's files are
    hive-encoded under the old partition column; a raced
    repartition_table must conflict A outright even though the partition
    VALUE sets never intersect."""
    a, b = cow
    err = _race(
        a,
        lambda: a.upsert(_rows(spark, [("PK6", "P1", "old-layout")])),
        lambda: b.repartition_table("dataValue"),
    )
    assert isinstance(err, CommitConflictError)
    assert "metadata" in str(err)
    # the retry against the evolved layout lands cleanly
    a.upsert(_rows(spark, [("PK6", "P1", "old-layout")]))
    assert _snap(a)["PK6"] == ("P1", "old-layout")
    a.audit_unique()


def test_cow_vacuum_during_replay_retries_internally(spark, cow):
    """B commits twice and vacuums the intermediate manifest away while A
    is pinned: A's replay walk hits the missing manifest, classifies it
    as a content-preserving layout race (vacuum), retries internally
    against the fresh snapshot, and COMMITS — the caller never sees a
    conflict, and never a raw IO error (r5 layout fairness; previously
    this surfaced a CommitConflictError for the caller to retry)."""
    a, b = cow

    def op_b():
        b.upsert(_rows(spark, [("PKb1", "P2", "b1")]))
        b.upsert(_rows(spark, [("PKb2", "P2", "b2")]))
        b.vacuum(retain_versions=1, orphan_grace_seconds=0.0)

    err = _race(
        a,
        lambda: a.upsert(_rows(spark, [("PKa1", "P1", "a1")])),
        op_b,
    )
    assert err is None, f"vacuum race must be retried internally: {err!r}"
    s = _snap(a)
    assert s["PKa1"] == ("P1", "a1") and s["PKb2"] == ("P2", "b2")
    a.audit_unique()


def test_cow_vacuum_grace_protects_inflight_occ_files(spark, cow):
    """A is paused between its lock-free data write and its publish — its
    parquet is on disk but unreferenced by any manifest. A vacuum with a
    non-zero orphan grace window (the documented default posture) must NOT
    delete it, and A must publish cleanly afterwards."""
    a, b = cow

    def op_b():
        b.upsert(_rows(spark, [("PKb", "P2", "b")]))
        info = b.vacuum(retain_versions=10, orphan_grace_seconds=3600.0)
        assert info["removed_files"] == 0, info

    err = _race(
        a,
        lambda: a.upsert(_rows(spark, [("PKa", "P1", "a")])),
        op_b,
    )
    assert err is None, f"grace-window vacuum must not break A, got {err!r}"
    s = _snap(a)
    assert s["PKa"] == ("P1", "a") and s["PKb"] == ("P2", "b")
    a.audit_unique()


def test_cow_raced_restore_conflicts_pinned_writer(spark, cow):
    """B rolls the table back to v1 while A is pinned on a later snapshot:
    the restore's file delta overlaps A's footprint (partition or pk
    range), so A must conflict and retry against the restored state."""
    a, b = cow
    b.upsert(_rows(spark, [("PK1", "P1", "pre")]))
    v_before = b.version()
    err = _race(
        a,
        lambda: a.upsert(_rows(spark, [("PK1", "P1", "from_a")])),
        lambda: b.restore(v_before - 1),
    )
    assert isinstance(err, CommitConflictError)
    assert "PK1" not in _snap(a)  # the restore rolled the insert back
    a.upsert(_rows(spark, [("PK1", "P1", "from_a")]))
    assert _snap(a)["PK1"] == ("P1", "from_a")
    a.audit_unique()


def test_mor_pair_delete_over_raced_insert_wins_by_seq(spark, mor):
    """(pk, partition)-pair tombstones are blind (no presence pruning), so
    a tombstone granted the later seq must kill the concurrently inserted
    row even though the row landed in a DIFFERENT partition."""
    a, b = mor
    err = _race(
        a,
        lambda: a.delete([("PK0", "P0")]),
        lambda: b.upsert(_rows(spark, [("PK0", "P2", "raced")])),
    )
    assert err is None, f"MOR tombstone append must rebase, got {err!r}"
    a.audit_unique()
    assert "PK0" not in _snap(a)


def test_occ_data_loss_streak_escalates_to_pessimistic(spark, cow):
    """Data-conflict fairness (r5): a handle that loses
    _OCC_DATA_LOSS_ESCALATE consecutive optimistic races serializes its
    NEXT attempt (pessimistic — raced commits can no longer conflict it),
    then the streak resets. Single-race semantics are untouched: below
    the threshold the conflict still surfaces to the caller."""
    from hudi_acid_verification_spark.acid.table import (
        _OCC_DATA_LOSS_ESCALATE,
    )

    a, b = cow
    # below threshold: a data race still surfaces (contract unchanged)
    assert a._occ_loss_streak == 0
    err = _race(
        a,
        lambda: a.upsert(_rows(spark, [("PK8", "P1", "from_a")])),
        lambda: b.upsert(_rows(spark, [("PK8", "P2", "from_b")])),
    )
    assert isinstance(err, CommitConflictError) and err.layout_op is None
    assert a._occ_loss_streak == 1

    # at the threshold: the same race is absorbed by the pessimistic
    # attempt — A's commit re-reads under the lock AFTER B, so it wins
    a._occ_loss_streak = _OCC_DATA_LOSS_ESCALATE
    err = _race(
        a,
        lambda: a.upsert(_rows(spark, [("PK9", "P1", "esc_a")])),
        lambda: b.upsert(_rows(spark, [("PK9", "P2", "esc_b")])),
    )
    assert err is None, f"escalated attempt must not conflict: {err!r}"
    assert a._occ_loss_streak == 0, "streak must reset after success"
    a.audit_unique()
    assert _snap(a)["PK9"] == ("P1", "esc_a")
