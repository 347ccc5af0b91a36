"""Nightly-tier OCC fairness soak (over the 900s soak budget — VERDICT r5
#7): the unthrottled layout-commit starvation loop moved here from
test_acid_occ_chaos.py unchanged. Run with ``pytest -m nightly`` on a
schedule; the per-commit soak tier stays under its budget without it."""

from __future__ import annotations

import threading

import pytest

from hudi_acid_verification_spark.acid import AcidTable
from hudi_acid_verification_spark.acid.table import CommitConflictError
from tests.test_acid_occ_chaos import SCHEMA

pytestmark = pytest.mark.nightly


def test_layout_commit_loop_does_not_starve_occ_writers(spark, tmp_path):
    """Fairness soak (VERDICT r4 #3): a TIGHT layout-commit loop
    (compact/cluster alternating, no throttle) used to conflict every
    pinned OCC snapshot forever — writers starved into their retry cap.
    With layout-tagged conflicts retried internally and escalated to one
    pessimistic attempt, three COW OCC writers on disjoint keys and
    partitions must complete with ZERO caller-visible conflicts, while
    the layout loop genuinely races them."""
    path = str(tmp_path / "fairness")
    AcidTable.create(
        spark, path, SCHEMA, pk="primaryKeyValue",
        partition_col="partitionKeyValue", precombine_col=None, mode="cow",
    )
    stop = threading.Event()
    layout_commits = []
    errors: list[BaseException] = []

    def layout_loop():
        t = AcidTable(spark.newSession(), path)
        i = 0
        try:
            while not stop.is_set():
                if i % 2 == 0:
                    layout_commits.append(t.compact(timeout=300.0))
                else:
                    layout_commits.append(
                        t.cluster(files_per_partition=1, timeout=300.0)
                    )
                i += 1
        except BaseException as exc:  # noqa: BLE001
            errors.append(exc)

    caller_conflicts = []
    lock_waits = []

    def writer(wid):
        t = AcidTable(spark.newSession(), path, occ=True)
        try:
            for j in range(6):
                df = t.spark.createDataFrame(
                    [(f"W{wid}K{j}", f"P{wid}", f"v{wid}-{j}")], SCHEMA
                )
                while True:
                    try:
                        t.upsert(df, timeout=300.0)
                        break
                    except CommitConflictError as e:
                        # a lock TIMEOUT is queue pressure on a loaded box,
                        # not starvation — bounded retries allowed; any
                        # OTHER conflict means a layout race leaked past
                        # the internal escalation (disjoint keys and
                        # partitions rule out data-data conflicts)
                        if "could not lock" in str(e):
                            lock_waits.append(repr(e))
                            if len(lock_waits) > 12:
                                raise AssertionError(
                                    f"lock-starved: {lock_waits[-3:]}"
                                )
                            continue
                        caller_conflicts.append(repr(e))
                        raise AssertionError(
                            f"layout race leaked: {caller_conflicts}"
                        )
        except BaseException as exc:  # noqa: BLE001
            errors.append(exc)

    lt = threading.Thread(target=layout_loop)
    ws = [threading.Thread(target=writer, args=(i,)) for i in range(3)]
    lt.start()
    for w in ws:
        w.start()
    for w in ws:
        w.join(560)
    stop.set()
    lt.join(120)
    assert not lt.is_alive() and not any(w.is_alive() for w in ws)
    assert not errors, f"failed: {errors[0]!r}"
    assert caller_conflicts == [], (
        f"layout races leaked to the caller: {caller_conflicts}"
    )
    # the layout loop must have genuinely raced the writers
    assert len(layout_commits) >= 6, layout_commits

    table = AcidTable(spark, path)
    got = {
        r["primaryKeyValue"]: (r["partitionKeyValue"], r["dataValue"])
        for r in table.snapshot().collect()
    }
    want = {
        f"W{w}K{j}": (f"P{w}", f"v{w}-{j}")
        for w in range(3) for j in range(6)
    }
    assert got == want
    table.audit_unique()
