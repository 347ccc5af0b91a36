"""Regressions for the round-8 ADVICE fixes (judge findings on round 7):

- `window_gap_interpolate`: the interpolation division relied on a
  nonnegative numerator for cross-engine parity (both Spark DIV and
  DuckDB // truncate toward zero, which only equals floor for
  nonnegative values). A refund-heavy day making a daily cents sum
  negative would silently break hash parity. Both engines now compute
  an explicit floor (a DIV b − 1[a%b≠0 ∧ a<0]); pinned here on a
  fixture with NEGATIVE daily sums bracketing a gap.
- `__spark_entry__._canon_const`: the staleness-hash canonicalization
  only special-cased TOP-LEVEL frozensets; a frozenset nested inside a
  tuple constant still repr'd in PYTHONHASHSEED-dependent order, so the
  hash could flap between driver runs. Now recursive at every depth.
- `dedup_incremental_minhash` forced-broadcast guard lives in
  `tests/test_plans.py::test_incremental_minhash_no_forced_broadcast`
  (the batch is corpus-proportional; nothing may force it broadcast).
"""

from __future__ import annotations

import os
import shutil
import tempfile

import duckdb
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry
import hudi_acid_verification_spark.operators as ops
from tests.oracle_check import normalize


def _mini_oracle(sql: str, sf_dir: str, tables: tuple[str, ...]):
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM read_parquet('{sf_dir}/{t}.parquet/*.parquet')"
        )
    tbl = con.execute(sql).arrow()
    con.close()
    cols = list(tbl.schema.names)
    rows = [tuple(d.values()) for d in tbl.to_pylist()]
    return cols, rows


@pytest.fixture(scope="module")
def refund_dir(spark):
    """events where some DAILY sums are NEGATIVE (refund-heavy days) and
    gaps exist between observed days, so interpolated values take the
    line between a positive and a negative bracket — the numerator sign
    flips inside a single key's spine."""
    base = os.path.join(
        tempfile.gettempdir(), "hudi_acid_verification_spark", "advice_r7"
    )
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base, exist_ok=True)
    rows = [
        # (day-offset, event_type, value): purchase observed on days
        # 0, 3, 7 — gaps at 1-2 and 4-6; day-3 sum is NEGATIVE (-250.57),
        # so the 0→3 ramp crosses zero and 3→7 climbs out of it, hitting
        # both a<0 branches of the floor correction (exact and inexact).
        (0, "purchase", 100.33),
        (3, "purchase", -250.57),
        (7, "purchase", 49.99),
        # refund: all-negative series with a gap (1 … 5)
        (1, "refund", -10.01),
        (5, "refund", -3.17),
        # click: plain nonnegative control with a gap
        (2, "click", 7.0),
        (6, "click", 11.5),
    ]
    df = spark.createDataFrame(
        [
            (
                i,
                # midday UTC 2023-11-15 + d days: midday keeps the DATE
                # stable across any sane session timezone
                1_700_049_600 + d * 86_400,
                1 + i,
                et,
                v,
                "{}",
            )
            for i, (d, et, v) in enumerate(rows)
        ],
        "event_id bigint, epoch bigint, user_id bigint, event_type string,"
        " value double, props string",
    ).select(
        "event_id",
        F.timestamp_seconds(F.col("epoch")).alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    df.write.mode("overwrite").parquet(os.path.join(base, "events.parquet"))
    yield base
    shutil.rmtree(base, ignore_errors=True)


def test_gap_interpolate_negative_values_keep_parity(spark, refund_dir):
    """Negative daily sums: Spark result must still match the oracle
    value-for-value (the explicit floor is mirrored on both sides), and
    the interpolated values must be true floors, not truncations."""
    sdf = ops.QUERIES["window_gap_interpolate"](spark, refund_dir)
    s_rows = [tuple(r) for r in sdf.collect()]
    d_cols, d_rows = _mini_oracle(
        ops.ORACLES["window_gap_interpolate"], refund_dir, ("events",)
    )
    assert sorted(sdf.columns) == sorted(d_cols)
    assert normalize(sdf.columns, s_rows) == normalize(d_cols, d_rows)

    got = {
        (r["event_type"], r["day"]): r["cents_x1e6"]
        for r in (row.asDict() for row in sdf.collect())
    }
    # purchase spine: cents 10033 @d0 (2023-11-15), -25057 @d3 → the d0+1
    # interpolation is floor((10033*2 + (-25057)*1) * 1e6 / 3)
    # = floor(-4991e6/3) = -1663666667 (truncation gives ...666, one off).
    assert got[("purchase", "2023-11-15")] == 10033 * 1_000_000
    assert got[("purchase", "2023-11-16")] == -1_663_666_667
    # d0+2: floor((10033*1 - 25057*2)*1e6/3) = floor(-40081e6/3)
    assert got[("purchase", "2023-11-17")] == -13_360_333_334
    # refund spine: -1001 @d1 (2023-11-16), -317 @d5: the midpoint day
    # divides exactly: ((-1001*2) + (-317*2))*1e6/4 = -659e6 — the a<0,
    # a%b==0 branch must NOT apply the −1 correction
    assert got[("refund", "2023-11-18")] == -659_000_000


def test_canon_const_recursive_frozenset_in_tuple():
    """A frozenset nested inside a tuple canonicalizes (sorted elements)
    the same as a top-level one; scalars and plain tuples stay
    byte-identical to repr so existing ledger hashes do not move."""
    canon = entry._canon_const
    # nested: element order of construction must not matter
    a = (("x", frozenset({3, 1, 2})), 5)
    b = (("x", frozenset({2, 3, 1})), 5)
    assert canon(a) == canon(b)
    assert "frozenset([1, 2, 3])" in canon(a)
    # top-level frozenset: same format the r6 fix certified into ledgers
    assert canon(frozenset({"b", "a"})) == "frozenset(['a', 'b'])"
    # repr-fidelity for everything without a nested frozenset
    for obj in (
        7,
        -1.5,
        "s'q",
        b"\x00ab",
        True,
        (1, "two", (3.0, b"4")),
        (1,),
        (),
    ):
        assert canon(obj) == repr(obj)


def test_source_hash_stable_and_sensitive_to_nested_frozenset():
    """The hash payload built from a module constant containing a nested
    frozenset is deterministic across element orderings but changes when
    the VALUE changes."""
    canon = entry._canon_const
    assert canon((frozenset({10, 20}),)) == canon((frozenset({20, 10}),))
    assert canon((frozenset({10, 20}),)) != canon((frozenset({10, 21}),))
