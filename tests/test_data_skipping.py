"""Column-stats data skipping + z-order clustering on AcidTable.

The manifest harvests per-file [min, max] for every primitive column at
commit time (parquet footers, no data scan); ``scan_range`` prunes files
with them and ``cluster(zorder_cols=...)`` lays rows on a Morton curve so
multiple columns prune simultaneously. These tests pin:
- correctness: scan_range == full-scan filter, COW and MOR, before and
  after any re-layout;
- effectiveness: after z-order clustering, a selective range on a NON-pk
  column touches a strict minority of files (the whole point of the index).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from hudi_acid_verification_spark.acid.table import AcidTable

SCHEMA = T.StructType(
    [
        T.StructField("pk", T.StringType(), False),
        T.StructField("part", T.StringType(), False),
        T.StructField("val", T.LongType(), True),
        T.StructField("score", T.DoubleType(), True),
    ]
)


def _mk(spark, tmp_path, mode: str) -> AcidTable:
    t = AcidTable.create(
        spark,
        str(tmp_path / f"tbl_{mode}"),
        SCHEMA,
        pk="pk",
        partition_col="part",
        precombine_col=None,
        mode=mode,
    )
    # 3 commits × interleaved val ranges → overlapping per-file ranges
    for c in range(3):
        rows = [
            (f"k{c}_{i}", f"p{i % 2}", (i * 37 + c * 13) % 1000, float(i % 97))
            for i in range(200)
        ]
        t.upsert(spark.createDataFrame(rows, SCHEMA))
    return t


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_scan_range_matches_full_filter(spark, tmp_path, mode):
    t = _mk(spark, tmp_path, mode)
    full = {
        (r["pk"], r["val"])
        for r in t.snapshot().filter((F.col("val") >= 100) & (F.col("val") <= 250)).collect()
    }
    pruned = {
        (r["pk"], r["val"]) for r in t.scan_range("val", 100, 250).collect()
    }
    assert pruned == full
    assert full  # predicate actually selects something


def test_manifest_carries_col_stats(spark, tmp_path):
    t = _mk(spark, tmp_path, "cow")
    m = t._read_manifest()
    assert m.files
    with_stats = [f for f in m.files if f.get("stats")]
    assert with_stats, "no file carries col stats"
    s = with_stats[0]["stats"]
    assert "val" in s and "score" in s
    lo, hi = s["val"]
    assert lo <= hi


def test_zorder_cluster_prunes_non_pk_column(spark, tmp_path):
    t = _mk(spark, tmp_path, "cow")
    before = t.prune_stats("val", 0, 49)
    # 16 files/partition → 5 z-bits of file splits → ≥2 bits per dimension,
    # so a ~5% val range must prune to ≤ 1/4 of the files (z-order gives
    # each of d dims ~files^(1/d) pruning, here 2 bits = 4×)
    t.cluster(files_per_partition=16, zorder_cols=["val", "score"])
    after = t.prune_stats("val", 0, 49)
    assert after["n_files"] >= 16
    assert after["n_candidates"] <= after["n_files"] / 2, (before, after)
    # and correctness is unchanged
    full = {
        (r["pk"], r["val"])
        for r in t.snapshot().filter(F.col("val").between(0, 49)).collect()
    }
    assert {(r["pk"], r["val"]) for r in t.scan_range("val", 0, 49).collect()} == full


def test_zorder_keeps_both_dims_tight(spark, tmp_path):
    t = _mk(spark, tmp_path, "cow")
    t.cluster(files_per_partition=16, zorder_cols=["val", "score"])
    pv = t.prune_stats("val", 0, 99)
    ps = t.prune_stats("score", 0.0, 9.0)
    assert pv["n_candidates"] < pv["n_files"]
    assert ps["n_candidates"] < ps["n_files"]


def test_zorder_rejects_string_dimension(spark, tmp_path):
    t = _mk(spark, tmp_path, "cow")
    with pytest.raises(ValueError, match="numeric"):
        t.cluster(zorder_cols=["part"])


def test_scan_range_open_ended_and_pk(spark, tmp_path):
    t = _mk(spark, tmp_path, "cow")
    got = {r["pk"] for r in t.scan_range("pk", lo="k2_0").collect()}
    exp = {r["pk"] for r in t.snapshot().filter(F.col("pk") >= "k2_0").collect()}
    assert got == exp


# ---------------------------------------------------------------- bloom index


def test_manifest_carries_pk_bloom(spark, tmp_path):
    t = _mk(spark, tmp_path, "cow")
    m = t._read_manifest()
    blooms = [f["pk_bloom"] for f in m.files if f.get("pk_bloom")]
    assert blooms, "no file carries a pk bloom"
    b = blooms[0]
    assert b["m"] >= 64 and b["k"] >= 1 and b["b64"]


def test_bloom_prunes_interleaved_lookup(spark, tmp_path):
    """After z-order clustering, per-file pk ranges interleave — min/max
    alone keeps nearly everything; the bloom must prune further, and the
    lookup result must stay exact."""
    t = _mk(spark, tmp_path, "cow")
    t.cluster(files_per_partition=16, zorder_cols=["val", "score"])
    s = t.lookup_stats("k1_3")
    assert s["bloom_candidates"] < s["range_candidates"], s
    rows = t.lookup("k1_3").collect()
    assert len(rows) == 1 and rows[0]["pk"] == "k1_3"


def test_bloom_no_false_negatives_over_sample(spark, tmp_path):
    t = _mk(spark, tmp_path, "cow")
    t.cluster(files_per_partition=16, zorder_cols=["val", "score"])
    for c in range(3):
        for i in range(0, 200, 23):
            k = f"k{c}_{i}"
            rows = t.lookup(k).collect()
            assert len(rows) == 1 and rows[0]["pk"] == k, k


def test_bloom_absent_key_reads_nothing(spark, tmp_path):
    t = _mk(spark, tmp_path, "cow")
    t.cluster(files_per_partition=16, zorder_cols=["val", "score"])
    s = t.lookup_stats("definitely_absent_9999")
    # deterministic for a fixed key/layout; FPs allowed but must stay rare
    assert s["bloom_candidates"] <= 2, s
    assert t.lookup("definitely_absent_9999").count() == 0


def test_delete_bloom_scopes_cow_rewrite(spark, tmp_path):
    """An IN-list DELETE on an interleaved (z-ordered) layout must rewrite
    only files whose bloom can contain a deleted key — the rest carry over
    byte-identical (same manifest file entries)."""
    t = _mk(spark, tmp_path, "cow")
    t.cluster(files_per_partition=16, zorder_cols=["val", "score"])
    before = {f["file"] for f in t._read_manifest().files}
    assert len(before) > 8  # layout actually split into many files
    expect = t.snapshot().count() - 2
    t.delete(["k0_7", "k2_190"])
    m = t._read_manifest()
    after = {f["file"] for f in m.files}
    carried = before & after
    # strictly more files carried over than partitions merely require
    assert len(carried) >= len(before) - 6, (len(before), len(carried))
    assert t.snapshot().count() == expect
    assert t.lookup("k0_7").count() == 0
    assert t.lookup("k2_190").count() == 0
