"""Delta-encoded manifest log (r5): per-commit manifest I/O must be
O(changed files), with full checkpoints every ``_CHECKPOINT_EVERY``
versions, layout commits falling back to full, and vacuum compacting the
log tail into a checkpoint at the retention cutoff. Resolution is pinned
against an independently-tracked expectation at EVERY version."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import types as T

from hudi_acid_verification_spark.acid import AcidTable
from hudi_acid_verification_spark.acid.table import _CHECKPOINT_EVERY

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


def _state(table, version=None):
    return {
        (r["pk"], r["val"]) for r in table.snapshot(version).collect()
    }


def _raw(table, version):
    with open(
        os.path.join(table._manifest_dir, f"v{version:012d}.json")
    ) as f:
        return json.load(f)


def test_deltas_between_checkpoints_and_every_version_resolves(
    spark, tmp_path
):
    # MOR: append-only commits, so the per-commit file delta is a shrinking
    # fraction of the growing table — the regime the delta log exists for
    # (a COW commit on this 2-partition fixture rewrites both partitions,
    # so its "delta" is the whole table and the encoder rightly goes full)
    t = AcidTable.create(
        spark, str(tmp_path / "t"), _SCHEMA,
        pk="pk", partition_col="part", mode="mor",
    )
    expected = {0: set()}  # version -> state
    for i in range(1, _CHECKPOINT_EVERY + 4):
        t.upsert(_rows(spark, [i % 5, 100 + i], f"c{i}"))
        expected[i] = _state(t)
    n_deltas = 0
    for v in range(_CHECKPOINT_EVERY + 4):
        d = _raw(t, v)
        if v % _CHECKPOINT_EVERY == 0:
            assert "files" in d and "delta_from" not in d, f"v{v} not full"
        elif "delta_from" in d:
            assert d["delta_from"] == v - 1
            assert "files" not in d
            n_deltas += 1
    # all but the earliest couple of commits (table ≈ commit size there,
    # where the size rule rightly prefers full) must be delta-encoded
    assert n_deltas >= _CHECKPOINT_EVERY - 2, f"only {n_deltas} deltas"
    # every historical version must resolve to the state tracked when it
    # was the head (time travel through mixed checkpoint/delta chains)
    for v, want in expected.items():
        assert _state(t, v) == want, f"time travel to v{v} diverged"


def test_layout_commit_writes_full_manifest(spark, tmp_path):
    """cluster()/compact() rewrite most files — their delta would be as
    large as the table, so they fall back to a full checkpoint."""
    t = AcidTable.create(
        spark, str(tmp_path / "t"), _SCHEMA, pk="pk", partition_col="part"
    )
    for i in range(1, 4):
        t.upsert(_rows(spark, range(4 * i, 4 * i + 4), f"c{i}"))
    before = _state(t)
    v = t.cluster()
    assert v % _CHECKPOINT_EVERY != 0, "pick a non-checkpoint version"
    d = _raw(t, v)
    assert "files" in d and "delta_from" not in d
    assert _state(t) == before


def test_vacuum_compacts_log_tail_into_checkpoint(spark, tmp_path):
    t = AcidTable.create(
        spark, str(tmp_path / "t"), _SCHEMA, pk="pk", partition_col="part"
    )
    states = {0: set()}
    for i in range(1, 12):
        t.upsert(_rows(spark, [i, 50 + i], f"c{i}"))
        states[i] = _state(t)
    rep = t.vacuum(retain_versions=4, orphan_grace_seconds=0.0)
    cutoff = rep["retained_from_version"]
    assert cutoff == 8
    # the cutoff manifest was re-encoded full; the chain below is gone
    d = _raw(t, cutoff)
    assert "files" in d and "delta_from" not in d
    names = sorted(os.listdir(t._manifest_dir))
    versions = [int(n[1:-5]) for n in names
                if n.startswith("v") and n.endswith(".json")]
    assert min(versions) == cutoff
    # retained versions (mixed re-encoded checkpoint + deltas) resolve
    for v in range(cutoff, 12):
        assert _state(t, v) == states[v], f"retained v{v} diverged"
    # vacuumed versions fail fast on the missing manifest
    with pytest.raises(FileNotFoundError):
        t.snapshot(version=cutoff - 1)
    # and the table keeps committing after tail compaction
    t.upsert(_rows(spark, [999], "post"))
    assert (999, "post-999") in _state(t)


def test_vacuum_after_tighter_vacuum_clamps_cutoff(spark, tmp_path):
    """Regression (ADVICE r5, medium): a vacuum with LOOSER retention after
    a tighter one must clamp its cutoff to the oldest surviving manifest
    instead of trying to re-encode a vacuumed version and crashing."""
    t = AcidTable.create(
        spark, str(tmp_path / "t"), _SCHEMA, pk="pk", partition_col="part"
    )
    for i in range(1, 12):
        t.upsert(_rows(spark, [i, 50 + i], f"c{i}"))
    before = _state(t)
    t.vacuum(retain_versions=3, orphan_grace_seconds=0.0)  # cutoff 9
    rep = t.vacuum(retain_versions=10, orphan_grace_seconds=0.0)
    # requested cutoff would be 2, but v2 is gone — clamped to the oldest
    # retained manifest; nothing is dropped and nothing crashes
    assert rep["retained_from_version"] == 9
    assert rep["dropped_manifests"] == 0
    assert _state(t) == before
    t.upsert(_rows(spark, [999], "post"))
    assert (999, "post-999") in _state(t)


def test_read_manifest_errors_distinguish_retention_from_breakage(
    spark, tmp_path
):
    """ADVICE r5 (low): after the one concurrent-vacuum retry, a persistent
    FileNotFoundError must say WHICH failure it is — a version vacuumed out
    of the retention window vs a genuinely broken chain."""
    # MOR: append-only commits on a growing table, so delta encoding is
    # guaranteed for the later versions the breakage half needs
    t = AcidTable.create(
        spark, str(tmp_path / "t"), _SCHEMA,
        pk="pk", partition_col="part", mode="mor",
    )
    for i in range(1, 8):
        t.upsert(_rows(spark, range(4 * i, 4 * i + 4), f"c{i}"))
    t.vacuum(retain_versions=2, orphan_grace_seconds=0.0)
    with pytest.raises(FileNotFoundError, match="outside the retention"):
        t.snapshot(version=1)
    # break the retained chain: find a delta-encoded version and delete the
    # manifest it chains through
    head = t.version()
    victim = next(
        v for v in range(head, 0, -1) if "delta_from" in _raw(t, v)
    )
    os.remove(
        os.path.join(
            t._manifest_dir, f"v{_raw(t, victim)['delta_from']:012d}.json"
        )
    )
    with pytest.raises(FileNotFoundError, match="broken manifest chain"):
        t.snapshot(version=victim)


def test_delta_manifest_is_small_on_a_many_file_table(spark, tmp_path):
    """The design point itself: with many live files, a 2-row commit's
    manifest must be a small fraction of the full file list."""
    t = AcidTable.create(
        spark, str(tmp_path / "t"), _SCHEMA,
        pk="pk", partition_col="part", mode="mor",
    )
    # MOR appends delta files per commit, so live-file count grows fast
    for i in range(1, _CHECKPOINT_EVERY - 2):
        t.upsert(_rows(spark, range(4 * i, 4 * i + 4), f"c{i}"))
    v = t.upsert(_rows(spark, [1], "tiny"))
    d = _raw(t, v)
    assert d.get("delta_from") == v - 1
    assert len(d["added"]) <= 3
    delta_size = os.path.getsize(
        os.path.join(t._manifest_dir, f"v{v:012d}.json")
    )
    m = t._read_manifest()
    full_size = len(m.to_json())
    assert len(m.files) >= 20, "fixture too small to mean anything"
    assert delta_size < 0.4 * full_size, (
        "delta manifest not materially smaller than a full rewrite "
        f"({delta_size}B delta vs {full_size}B full, "
        f"{len(m.files)} live files)"
    )


def _fake_entries(parts: int, per_part: int, tag: str = "a"):
    return [
        {
            "file": f"part=p{p}/{tag}-{i:06d}.parquet",
            "partition": f"p{p}",
        }
        for p in range(parts)
        for i in range(per_part)
    ]


def test_sharded_checkpoint_roundtrip_and_pruned_read(spark, tmp_path):
    """A checkpoint above _SHARD_MIN_FILES entries must carry shard_refs
    (no inline file list), resolve to the identical entry set, and a
    partition-pruned read must open only that partition's shards."""
    from hudi_acid_verification_spark.acid.table import (
        _Manifest, _SHARD_MIN_FILES,
    )

    t = AcidTable.create(
        spark, str(tmp_path / "t"), _SCHEMA, pk="pk", partition_col="part"
    )
    m0 = t._read_manifest()
    entries = _fake_entries(parts=10, per_part=100)
    assert len(entries) >= _SHARD_MIN_FILES
    m1 = _Manifest(
        1, m0.schema, m0.pk, m0.partition_col, m0.precombine_col,
        entries, m0.mode, m0.compact_every, op="upsert", dropped=[],
    )
    t._write_manifest_and_swap(m1, prev=m0)
    raw = _raw(t, 1)
    assert "shard_refs" in raw and "files" not in raw
    assert sum(r["n"] for r in raw["shard_refs"]) == len(entries)
    # full resolution round-trips the entry set exactly
    got = t._read_manifest(version=1).files
    assert sorted(e["file"] for e in got) == sorted(
        e["file"] for e in entries
    )
    # pruned resolution touches only the requested partition's shards
    pruned = t._read_manifest(version=1, partitions={"p3"}).files
    assert len(pruned) == 100
    assert all(e["partition"] == "p3" for e in pruned)


def test_checkpoint_shards_reused_when_unchanged(spark, tmp_path):
    """Content addressing is the write-cost bound: re-encoding a
    checkpoint after touching ONE partition must write only that
    partition's shard files — the other shards are byte-identical and
    reused by name."""
    from hudi_acid_verification_spark.acid.table import _Manifest

    t = AcidTable.create(
        spark, str(tmp_path / "t"), _SCHEMA, pk="pk", partition_col="part"
    )
    m0 = t._read_manifest()
    entries = _fake_entries(parts=10, per_part=100)
    m1 = _Manifest(
        1, m0.schema, m0.pk, m0.partition_col, m0.precombine_col,
        entries, m0.mode, m0.compact_every, op="upsert", dropped=[],
    )
    t._encode_full(m1)
    before = set(os.listdir(t._shard_dir))
    assert len(before) == 10  # one shard per partition at this size
    changed = entries + [
        {"file": "part=p0/extra-1.parquet", "partition": "p0"}
    ]
    m2 = _Manifest(
        2, m0.schema, m0.pk, m0.partition_col, m0.precombine_col,
        changed, m0.mode, m0.compact_every, op="upsert", dropped=[],
    )
    payload = json.loads(t._encode_full(m2))
    after = set(os.listdir(t._shard_dir))
    assert len(after - before) == 1, "only p0's shard may be rewritten"
    reused = {r["name"] for r in payload["shard_refs"]} & before
    assert len(reused) == 9


def test_sharded_checkpoint_at_1e5_files_writes_only_changed_shards(
    spark, tmp_path
):
    """The 1e5-entry regime the sharding exists for: the second
    checkpoint's I/O is bounded by the changed partition (≤2 shard files
    of ~5k entries), not the 100k-entry list, and a pruned read parses
    one partition's shards only."""
    import time as _time

    from hudi_acid_verification_spark.acid.table import _Manifest

    t = AcidTable.create(
        spark, str(tmp_path / "t"), _SCHEMA, pk="pk", partition_col="part"
    )
    m0 = t._read_manifest()
    entries = _fake_entries(parts=20, per_part=5000)  # 100k entries
    m1 = _Manifest(
        1, m0.schema, m0.pk, m0.partition_col, m0.precombine_col,
        entries, m0.mode, m0.compact_every, op="upsert", dropped=[],
    )
    t0 = _time.perf_counter()
    t._write_manifest_and_swap(m1, prev=m0)
    first_write = _time.perf_counter() - t0
    n_shards = len(os.listdir(t._shard_dir))
    assert n_shards >= 20
    changed = entries + [
        {"file": "part=p7/extra-1.parquet", "partition": "p7"}
    ]
    m2 = _Manifest(
        2, m0.schema, m0.pk, m0.partition_col, m0.precombine_col,
        changed, m0.mode, m0.compact_every, op="upsert", dropped=[],
    )
    before = set(os.listdir(t._shard_dir))
    t0 = _time.perf_counter()
    payload = t._encode_full(m2)
    second_encode = _time.perf_counter() - t0
    new_shards = set(os.listdir(t._shard_dir)) - before
    assert len(new_shards) <= 2, "re-encode must write only p7's shards"
    # manifest list itself stays tiny (refs, not entries)
    assert len(payload) < 0.05 * (100_000 * 40)
    # pruned read opens only p7's shards
    t._write_manifest_and_swap(m2, prev=m1)
    pruned = t._read_manifest(version=2, partitions={"p7"}).files
    assert len(pruned) == 5001
    # loose wall bound: the changed-shard encode must not cost like the
    # full 40-shard write (hash pass over entries is CPU-only; the I/O is
    # 1-2 shard files)
    assert second_encode < max(1.0, first_write), (
        f"second encode {second_encode:.2f}s vs first write "
        f"{first_write:.2f}s"
    )


def test_vacuum_gcs_unreferenced_shards(spark, tmp_path):
    """Shards referenced by NO retained manifest are garbage after the
    log-tail compaction; vacuum must delete them (zero grace) and keep
    every referenced shard readable."""
    from hudi_acid_verification_spark.acid.table import _Manifest

    t = AcidTable.create(
        spark, str(tmp_path / "t"), _SCHEMA, pk="pk", partition_col="part"
    )
    m0 = t._read_manifest()
    prev = m0
    for v in range(1, 6):
        # each version rewrites one partition's entries (distinct tag) so
        # old checkpoints pin shards newer ones no longer reference
        entries = _fake_entries(parts=10, per_part=100, tag=f"v{v}")
        m = _Manifest(
            v, m0.schema, m0.pk, m0.partition_col, m0.precombine_col,
            entries, m0.mode, m0.compact_every, op="upsert", dropped=[],
        )
        t._write_manifest_and_swap(m, prev=prev)
        prev = m
    n_before = len(os.listdir(t._shard_dir))
    rep = t.vacuum(retain_versions=2, orphan_grace_seconds=0.0)
    assert rep["dropped_shards"] > 0
    assert len(os.listdir(t._shard_dir)) < n_before
    # retained versions still resolve completely
    for v in (4, 5):
        assert len(t._read_manifest(version=v).files) == 1000


@pytest.mark.soak  # ~2 min: real MOR table grown past the shard threshold
def test_real_table_crosses_shard_threshold_and_stays_consistent(
    spark, tmp_path
):
    """Integration (not synthetic manifests): grow a real MOR table past
    _SHARD_MIN_FILES live entries with plain upserts, so a periodic
    checkpoint genuinely shards; then every resolution path — full read,
    time travel across the sharded checkpoint, partition-pruned read,
    vacuum + tail compaction, post-vacuum commits — must agree with an
    independently tracked expectation."""
    from hudi_acid_verification_spark.acid.table import (
        _CHECKPOINT_EVERY, _SHARD_MIN_FILES,
    )

    t = AcidTable.create(
        spark, str(tmp_path / "t"), _SCHEMA,
        pk="pk", partition_col="part", mode="mor",
    )
    expected: dict[int, set] = {}
    sharded_cp = None
    v = 0
    # MOR append-only: each upsert adds ~2 files; run until a CHECKPOINT
    # version lands with >= _SHARD_MIN_FILES live entries, then a bit more
    while v < 200:
        keys = [v % 37, 1000 + v, 2000 + 2 * v]
        t.upsert(_rows(spark, keys, f"c{v}"))
        v = t.version()
        if v % 8 == 0:  # track a subset of versions (collect is slow)
            expected[v] = _state(t)
        if (
            sharded_cp is None
            and v % _CHECKPOINT_EVERY == 0
            and len(t._read_manifest().files) >= _SHARD_MIN_FILES
        ):
            sharded_cp = v
        if sharded_cp is not None and v >= sharded_cp + 6:
            break
    assert sharded_cp is not None, "table never crossed the shard threshold"
    raw = _raw(t, sharded_cp)
    assert "shard_refs" in raw and "files" not in raw
    # time travel THROUGH the sharded checkpoint and around it
    for ver, want in expected.items():
        assert _state(t, ver) == want, f"v{ver} diverged"
    # partition-pruned read on the sharded head: p0 rows only, exact
    full_now = _state(t)
    p0 = {
        (r["pk"], r["val"])
        for r in t.snapshot(partitions=["p0"]).collect()
    }
    assert p0 == {x for x in full_now if x[0] % 2 == 0}
    # vacuum: tail compaction + shard GC, retained versions intact
    rep = t.vacuum(retain_versions=5, orphan_grace_seconds=0.0)
    assert rep["retained_from_version"] > 0
    assert _state(t) == full_now
    # and the table keeps committing after all of it
    t.upsert(_rows(spark, [9999], "post"))
    assert (9999, "post-9999") in _state(t)
