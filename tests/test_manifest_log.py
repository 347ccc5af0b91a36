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
