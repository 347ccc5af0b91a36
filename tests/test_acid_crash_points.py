"""Crash-point injection over the commit protocol (r5).

The manifest protocol claims (acid/table.py module docstring): a commit
writes parquet into the data layout, then manifest v(N+1), then atomically
renames a temp file over ``_latest`` — so a writer crash at ANY point
before the pointer swap leaves readers on the old snapshot, the table
writable, and at worst unreferenced orphan files that ``vacuum`` reclaims.
These tests simulate the crash at each protocol step by fault-injecting
``os.rename`` / the manifest writer and assert exactly those guarantees,
on both table modes. The reference harness only ever observes crashes
from the OUTSIDE (writer threads dying, README degraded-run narrative);
this pins the recovery contract the rebuild's storage layer actually
makes.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import types as T

from hudi_acid_verification_spark.acid import AcidTable

_SCHEMA = T.StructType(
    [
        T.StructField("pk", T.LongType(), False),
        T.StructField("part", T.StringType(), False),
        T.StructField("val", T.StringType(), True),
    ]
)


def _rows(spark, keys, tag):
    return spark.createDataFrame(
        [(k, f"p{k % 2}", f"{tag}-{k}") for k in keys], _SCHEMA
    )


def _state(table):
    return {
        (r["pk"], r["part"], r["val"]) for r in table.snapshot().collect()
    }


@pytest.fixture(params=["cow", "mor"])
def crash_table(spark, tmp_path, request):
    t = AcidTable.create(
        spark, str(tmp_path / "t"), _SCHEMA,
        pk="pk", partition_col="part", mode=request.param,
    )
    t.upsert(_rows(spark, range(4), "base"))
    return t


def _assert_recovers(spark, table, before, monkeypatch):
    """Post-crash contract: old snapshot intact (crashed handle AND a
    fresh handle), lock not leaked (a clean commit succeeds promptly),
    final state correct, vacuum reclaims crashed-writer debris."""
    monkeypatch.undo()
    assert _state(table) == before, "crashed commit leaked into a read"
    fresh = AcidTable(spark, table.path)
    assert _state(fresh) == before, "on-disk state torn for a new reader"
    table.upsert(_rows(spark, range(2, 6), "after"), timeout=30.0)
    expected = {t for t in before if t[0] < 2} | {
        (k, f"p{k % 2}", f"after-{k}") for k in range(2, 6)
    }
    assert _state(table) == expected
    assert _state(AcidTable(spark, table.path)) == expected
    rep = table.vacuum(retain_versions=1, orphan_grace_seconds=0.0)
    assert _state(table) == expected, f"vacuum broke the snapshot ({rep})"


def test_crash_mid_data_publish(spark, crash_table, monkeypatch):
    """Writer dies HALFWAY through renaming data files into the hive
    layout: some new parquet is already sitting in data/, no manifest
    references it."""
    before = _state(crash_table)
    real_rename = os.rename
    seen = {"n": 0}

    def failing(src, dst):
        if dst.startswith(crash_table._data_dir + os.sep):
            seen["n"] += 1
            if seen["n"] >= 2:
                raise RuntimeError("simulated crash mid data publish")
        return real_rename(src, dst)

    monkeypatch.setattr(os, "rename", failing)
    with pytest.raises(RuntimeError, match="mid data publish"):
        crash_table.upsert(_rows(spark, range(2, 6), "crash"))
    assert seen["n"] >= 2, "fault never armed — commit wrote <2 files"
    _assert_recovers(spark, crash_table, before, monkeypatch)


def test_crash_after_data_before_manifest(spark, crash_table, monkeypatch):
    """Writer dies after the data files are fully published but before
    manifest v(N+1) exists — the pure-orphan case."""
    before = _state(crash_table)

    def failing(self, m, prev=None):
        raise RuntimeError("simulated crash before manifest write")

    monkeypatch.setattr(AcidTable, "_write_manifest_and_swap", failing)
    with pytest.raises(RuntimeError, match="before manifest"):
        crash_table.upsert(_rows(spark, range(2, 6), "crash"))
    _assert_recovers(spark, crash_table, before, monkeypatch)


def test_crash_between_manifest_and_pointer(spark, crash_table, monkeypatch):
    """Writer dies after manifest v(N+1) is durably renamed into place
    but before the ``_latest`` pointer swap: readers must keep resolving
    v(N), and the recovery commit must reclaim the version number (its
    manifest rename REPLACES the orphan v(N+1).json)."""
    before = _state(crash_table)
    real_rename = os.rename

    def failing(src, dst):
        if dst == crash_table._latest_ptr:
            raise RuntimeError("simulated crash before pointer swap")
        return real_rename(src, dst)

    monkeypatch.setattr(os, "rename", failing)
    with pytest.raises(RuntimeError, match="before pointer swap"):
        crash_table.upsert(_rows(spark, range(2, 6), "crash"))
    orphans = sorted(os.listdir(crash_table._manifest_dir))
    with open(crash_table._latest_ptr) as f:
        pointed = f.read().strip()
    assert pointed != orphans[-1], "pointer moved despite the crash"
    _assert_recovers(spark, crash_table, before, monkeypatch)


def test_sigkilled_lock_holder_does_not_deadlock(spark, crash_table):
    """A writer PROCESS killed with SIGKILL while holding the table lock
    must not brick the table: flock is released by the OS on process
    death (the reason the lock is an flock, not a lockfile whose
    existence is the lock), so the next commit proceeds without manual
    cleanup. The in-process crash tests can't show this — their lock
    release runs in a ``finally``."""
    import signal
    import subprocess
    import sys
    import time

    holder = subprocess.Popen(
        [
            sys.executable,
            "-c",
            (
                "import fcntl, os, sys, time\n"
                f"fd = os.open({crash_table._lock_path!r}, os.O_RDWR)\n"
                "fcntl.flock(fd, fcntl.LOCK_EX)\n"
                "print('LOCKED', flush=True)\n"
                "time.sleep(120)\n"
            ),
        ],
        stdout=subprocess.PIPE,
        text=True,
    )
    try:
        assert holder.stdout.readline().strip() == "LOCKED"
        # the lock is genuinely held: a short-timeout commit must fail
        from hudi_acid_verification_spark.acid.table import (
            CommitConflictError,
        )

        with pytest.raises(CommitConflictError, match="could not lock"):
            crash_table.upsert(_rows(spark, [99], "blocked"), timeout=0.3)
        holder.send_signal(signal.SIGKILL)
        holder.wait(timeout=10)
        time.sleep(0.1)
        crash_table.upsert(_rows(spark, [99], "unblocked"), timeout=15.0)
        assert (99, "p1", "unblocked-99") in _state(crash_table)
    finally:
        if holder.poll() is None:
            holder.kill()


def test_vacuum_reclaims_crashed_writer_debris(spark, crash_table, monkeypatch):
    """After a mid-publish crash the data dir holds unreferenced parquet;
    vacuum with zero grace must delete it (cold-table reclamation) while
    every referenced file survives."""
    before = _state(crash_table)
    monkeypatch.setattr(
        AcidTable,
        "_write_manifest_and_swap",
        lambda self, m, prev=None: (_ for _ in ()).throw(RuntimeError("boom")),
    )
    with pytest.raises(RuntimeError, match="boom"):
        crash_table.upsert(_rows(spark, range(10, 14), "crash"))
    monkeypatch.undo()

    def data_files():
        out = []
        for root, _dirs, files in os.walk(crash_table._data_dir):
            out += [os.path.join(root, f) for f in files
                    if f.endswith(".parquet")]
        return set(out)

    with_debris = data_files()
    rep = crash_table.vacuum(retain_versions=1, orphan_grace_seconds=0.0)
    after = data_files()
    assert after < with_debris, f"vacuum deleted no debris ({rep})"
    assert _state(crash_table) == before


def test_streamer_crash_between_commit_and_checkpoint(
    spark, tmp_path, monkeypatch
):
    """IngestStreamer's delivery contract (acid/streamer.py module
    docstring): the ingest checkpoint is written AFTER the table commit,
    so a crash between the two replays the same source files on restart —
    and the idempotent keyed upsert makes the replay converge to the
    identical table state (at-least-once delivery, effectively-once
    result). Fault-inject the checkpoint write to simulate the crash."""
    from hudi_acid_verification_spark.acid.streamer import IngestStreamer

    t = AcidTable.create(
        spark, str(tmp_path / "t"), _SCHEMA, pk="pk", partition_col="part"
    )
    drops = tmp_path / "drops"
    _rows(spark, range(6), "b1").write.parquet(str(drops / "d1"))
    s = IngestStreamer(t, str(drops / "*" / "*.parquet"))

    died = {"n": 0}
    real_save = IngestStreamer._save_processed

    def dying_save(self, files):
        died["n"] += 1
        raise OSError("simulated crash before checkpoint write")

    monkeypatch.setattr(IngestStreamer, "_save_processed", dying_save)
    with pytest.raises(OSError, match="simulated crash"):
        s.run_once(spark)
    assert died["n"] == 1
    monkeypatch.undo()

    # the table commit LANDED (checkpoint-after-commit ordering) ...
    committed = _state(t)
    assert {r[0] for r in committed} == set(range(6))
    v_after_crash = t.version()
    # ... and the batch is still PENDING (checkpoint never advanced)
    restarted = IngestStreamer(t, str(drops / "*" / "*.parquet"))
    n_pending = len(restarted.pending())
    assert n_pending >= 1

    # restart replays the same files; the keyed upsert is idempotent, so
    # the state is unchanged and the checkpoint finally advances
    assert restarted.run_once(spark) == n_pending
    assert _state(t) == committed, "replay must converge, not duplicate"
    assert t.version() == v_after_crash + 1  # replay commit, same content
    assert restarted.pending() == []
    assert restarted.run_once(spark) == 0

    # a second source drop flows normally after recovery
    _rows(spark, range(4, 9), "b2").write.parquet(str(drops / "d2"))
    assert restarted.run_once(spark) >= 1
    assert {r[0] for r in _state(t)} == set(range(9))
    # real checkpoint writer restored for later suites
    assert IngestStreamer._save_processed is real_save


def test_crash_mid_shard_write_leaves_old_checkpoint_readable(
    spark, tmp_path, monkeypatch
):
    """Writer dies while writing a SHARDED checkpoint's shard files (r6
    encoding): some new content-addressed shards exist on disk, the
    checkpoint manifest was never swapped in. Readers stay on the old
    snapshot, the table stays writable, and zero-grace vacuum reclaims
    the orphan shards no manifest references."""
    from hudi_acid_verification_spark.acid.table import _Manifest

    t = AcidTable.create(
        spark, str(tmp_path / "t"), _SCHEMA, pk="pk", partition_col="part"
    )
    t.upsert(_rows(spark, range(4), "base"))
    before = _state(t)
    v_before = t.version()

    # a big synthetic full manifest that will shard (the crash target)
    entries = [
        {"file": f"part=p{p}/x-{i:05d}.parquet", "partition": f"p{p}"}
        for p in range(6)
        for i in range(100)
    ]
    m_big = _Manifest(
        v_before + 1, t._read_manifest().schema, "pk", "part", None,
        entries, "cow", None, op="upsert", dropped=[],
    )

    real_rename = os.rename
    seen = {"n": 0}

    def failing(src, dst):
        if os.sep + "shards" + os.sep in dst:
            seen["n"] += 1
            if seen["n"] >= 3:
                raise RuntimeError("simulated crash mid shard write")
        return real_rename(src, dst)

    monkeypatch.setattr(os, "rename", failing)
    with pytest.raises(RuntimeError, match="mid shard write"):
        t._write_manifest_and_swap(m_big, prev=t._read_manifest())
    assert seen["n"] >= 3
    monkeypatch.undo()

    # old snapshot intact on both the crashed handle and a fresh one;
    # orphan shards exist but are unreferenced
    assert _state(t) == before
    assert t.version() == v_before
    fresh = AcidTable(spark, t.path)
    assert _state(fresh) == before
    orphans = set(os.listdir(t._shard_dir))
    assert len(orphans) >= 2, "crash left no shard orphans to reclaim"

    # the table keeps committing, and vacuum reclaims the orphans
    t.upsert(_rows(spark, [99], "post"))
    assert (99, "p1", "post-99") in _state(t)
    rep = t.vacuum(retain_versions=1, orphan_grace_seconds=0.0)
    assert rep["dropped_shards"] >= len(orphans)
    assert _state(t) == _state(AcidTable(spark, t.path))
