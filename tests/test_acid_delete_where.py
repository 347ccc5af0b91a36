"""Unit tests for AcidTable.delete_where (predicate/TTL delete)."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hudi_acid_verification_spark.acid import AcidTable

SCHEMA = T.StructType(
    [
        T.StructField("pk", T.LongType(), False),
        T.StructField("part", T.StringType(), False),
        T.StructField("v", T.LongType(), True),
    ]
)


def _mk(spark, mode: str):
    base = os.path.join(
        tempfile.gettempdir(), "hudi_acid_verification_spark",
        f"dw_{mode}",
    )
    shutil.rmtree(base, ignore_errors=True)
    t = AcidTable.create(
        spark, base, SCHEMA, pk="pk", partition_col="part",
        precombine_col=None, mode=mode,
    )
    # TIME-BUCKETED partitions (the standard TTL layout): files carry
    # tight per-partition v ranges by construction
    rows = [(i, f"d{(i - 1) // 10}", i * 10) for i in range(1, 31)]
    t.upsert(spark.createDataFrame(rows, SCHEMA))
    return t


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_delete_where_semantics(spark, mode):
    t = _mk(spark, mode)
    assert t.snapshot().count() == 30
    t.delete_where("v", hi=150)  # expire v in [10, 150] → pks 1..15
    left = sorted(r["pk"] for r in t.snapshot().collect())
    assert left == list(range(16, 31))
    # survivors keep their values; pk uniqueness holds
    assert t.snapshot().filter(F.col("v") <= 150).count() == 0


def test_delete_where_metadata_only_drop(spark):
    t = _mk(spark, "cow")
    m0 = t._read_manifest()
    # range covers the first commit's files ENTIRELY and no others
    t.delete_where("v", hi=100)
    m1 = t._read_manifest()
    before = {f["file"] for f in m0.files}
    after = {f["file"] for f in m1.files}
    assert len(before - after) > 0          # whole files dropped
    assert after <= before                   # and NOTHING was rewritten
    assert t.snapshot().count() == 20


def test_delete_where_straddler_rewrites_only_that_file(spark):
    t = _mk(spark, "cow")
    m0 = t._read_manifest()
    t.delete_where("v", lo=110, hi=140)  # inside the second commit only
    m1 = t._read_manifest()
    before = {f["file"] for f in m0.files}
    after = {f["file"] for f in m1.files}
    carried = before & after
    # d0 and d2 are disjoint from the range → carried over untouched;
    # only the straddling d1 file rewrites
    assert len(carried) == 2
    assert len(before - after) == 1 and len(after - before) == 1
    assert t.snapshot().count() == 30 - 4  # v in {110,120,130,140}
    assert t.snapshot().filter(
        (F.col("v") >= 110) & (F.col("v") <= 140)
    ).count() == 0


def test_delete_where_mor_appends_tombstones_no_rewrite(spark):
    t = _mk(spark, "mor")
    m0 = t._read_manifest()
    t.delete_where("v", hi=100)
    m1 = t._read_manifest()
    before = {f["file"] for f in m0.files}
    after = {f["file"] for f in m1.files}
    assert before <= after  # appends only: every old file still live
    assert t.snapshot().count() == 20
    # time travel still sees the pre-delete table
    assert t.snapshot(version=m0.version).count() == 30


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_update_where_semantics(spark, mode):
    t = _mk(spark, mode)
    t.update_where("v", {"v": F.col("v") + 1}, lo=110, hi=140)
    got = {r["pk"]: r["v"] for r in t.snapshot().collect()}
    assert len(got) == 30  # no rows appear or vanish
    for pk, v in got.items():
        base = pk * 10
        assert v == (base + 1 if 110 <= base <= 140 else base)


def test_update_where_carries_disjoint_files(spark):
    t = _mk(spark, "cow")
    m0 = t._read_manifest()
    t.update_where("v", {"v": F.lit(0)}, lo=110, hi=140)
    m1 = t._read_manifest()
    carried = {f["file"] for f in m0.files} & {f["file"] for f in m1.files}
    assert len(carried) == 2  # d0 and d2 untouched, only d1 rewritten
    assert t.snapshot().filter(F.col("v") == 0).count() == 4


def test_update_where_protects_keys(spark):
    t = _mk(spark, "cow")
    with pytest.raises(ValueError):
        t.update_where("v", {"pk": F.lit(1)}, hi=100)
    with pytest.raises(ValueError):
        t.update_where("v", {"part": F.lit("x")}, hi=100)


def test_update_where_mor_time_travel(spark):
    t = _mk(spark, "mor")
    m0 = t._read_manifest()
    t.update_where("v", {"v": F.col("v") * 2}, hi=50)
    assert t.snapshot().filter(F.col("v") == 20).count() == 1  # pk 1: 10→20
    # old snapshot unchanged
    old = {r["pk"]: r["v"] for r in t.snapshot(version=m0.version).collect()}
    assert old[1] == 10
