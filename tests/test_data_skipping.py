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
