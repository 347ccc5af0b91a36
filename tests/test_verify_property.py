"""Property-based history check of the two-cut expectation algebra.

The harness e2e (tests/test_harness_e2e.py) exercises the algebra against the
real AcidTable under real threads; this file attacks it adversarially in pure
Python: a seeded scheduler interleaves the four writer steps
(intent-log → atomic apply → commit feedback → commit-log, the reference's
order at TransactionWriter.java:81,83-97,100,101) across several concurrent
transactions in every ordering hypothesis finds, snapshots the table at
arbitrary points between the two log cuts, and asserts the derived
expectations accept every snapshot a correct ACID table can produce.

This is the soundness half of the algebra (no false verification failures —
the reference's observed failure mode was the opposite defect class, D3/D4).
A deliberately corrupted snapshot must conversely be rejected (completeness
spot-check at the bottom).
"""

from __future__ import annotations

import random

from hypothesis import given, settings
from hypothesis import strategies as st

from hudi_acid_verification_spark.verify.expectations import ResultSet
from hudi_acid_verification_spark.verify.generator import TransactionGenerator
from hudi_acid_verification_spark.verify.log import TransactionLog
from hudi_acid_verification_spark.verify.model import ManipulationType, Record
from hudi_acid_verification_spark.verify.producer import ExpectationProducer

MAX_IN_FLIGHT = 3
TOTAL_TXNS = 40
RECORDS = 20
PER_TXN = 2

# Writer step indices (reference order, TransactionWriter.java:81-101).
INTENT, APPLY, FEEDBACK, COMMIT_LOG = range(4)


class _Sim:
    """One simulated run: table is a dict (atomic multi-row apply = the ACID
    guarantee under test is *assumed* here; the algebra is what's on trial)."""

    def __init__(self, seed: int):
        self.rng = random.Random(seed)
        self.gen = TransactionGenerator(
            maximum_number_of_records=RECORDS,
            records_per_transaction=PER_TXN,
            seed=seed ^ 0x5EED,
        )
        self.log = TransactionLog()
        self.producer = ExpectationProducer(self.log)
        self.table: dict[str, Record] = {}
        self.in_flight: list[tuple] = []  # (txn, next_step)
        self.started = 0

    def can_start(self) -> bool:
        return self.started < TOTAL_TXNS and len(self.in_flight) < MAX_IN_FLIGHT

    def step(self) -> bool:
        """Run one atomic scheduler step; False when nothing left to do."""
        choices = []
        if self.can_start():
            choices.append(-1)
        choices.extend(range(len(self.in_flight)))
        if not choices:
            return False
        pick = self.rng.choice(choices)
        if pick == -1:
            txn = self.gen.get_next_transaction()
            self.started += 1
            self.in_flight.append((txn, INTENT))
            return True
        txn, stage = self.in_flight[pick]
        if stage == INTENT:
            self.log.log_intent(txn)
        elif stage == APPLY:
            if txn.manipulation_type is ManipulationType.DELETE:
                for dm in txn.data_manipulations:
                    self.table.pop(dm.primary_key_value, None)
            else:
                for dm in txn.data_manipulations:
                    self.table[dm.primary_key_value] = dm.to_record()
        elif stage == FEEDBACK:
            self.gen.transaction_committed(txn)
        else:  # COMMIT_LOG
            self.log.log_commit(txn)
            self.in_flight.pop(pick)
            return True
        self.in_flight[pick] = (txn, stage + 1)
        return True

    def run_steps(self, n: int) -> None:
        for _ in range(n):
            if not self.step():
                return

    def snapshot(self) -> ResultSet:
        return ResultSet(list(self.table.values()))


@settings(max_examples=60, deadline=None)
@given(st.integers(min_value=0, max_value=2**32 - 1))
def test_two_cut_expectations_accept_every_reachable_snapshot(seed: int) -> None:
    sim = _Sim(seed)
    verified = 0
    while True:
        # random burst of writer activity
        sim.run_steps(sim.rng.randrange(1, 12))
        # one full reader verification: cut1 → races → snapshot → races → cut2
        cnt_before = sim.log.get_event_count()
        sim.run_steps(sim.rng.randrange(0, 8))
        snap = sim.snapshot()
        sim.run_steps(sim.rng.randrange(0, 8))
        cnt_after = sim.log.get_event_count()
        exps = sim.producer.create_result_set_expectations(cnt_before, cnt_after)
        ok, detail = exps.is_satisfied(snap)
        assert ok, f"seed={seed} verification #{verified}: {detail}"
        verified += 1
        if sim.started >= TOTAL_TXNS and not sim.in_flight:
            break


@settings(max_examples=25, deadline=None)
@given(st.integers(min_value=0, max_value=2**32 - 1))
def test_quiesced_log_pins_exact_table_state(seed: int) -> None:
    """With no in-flight transactions and both cuts at the full log, every
    expectation is certain — the table must match exactly, closed-world."""
    sim = _Sim(seed)
    while sim.step():
        pass
    n = sim.log.get_event_count()
    exps = sim.producer.create_result_set_expectations(n, n)
    ok, detail = exps.is_satisfied(sim.snapshot())
    assert ok, f"seed={seed}: {detail}"
    # completeness spot-checks: any tampering must be rejected
    if sim.table:
        pk, rec = next(iter(sim.table.items()))
        # (a) corrupt a payload
        tampered = dict(sim.table)
        tampered[pk] = Record(rec.primary_key_value, rec.partition_key_value, "WRONG")
        ok, _ = exps.is_satisfied(ResultSet(list(tampered.values())))
        assert not ok, "corrupted payload accepted"
        # (b) resurrect/invent a row never expected
        tampered = dict(sim.table)
        tampered["RecordGhost"] = Record("RecordGhost", "Partition0", "boo")
        ok, _ = exps.is_satisfied(ResultSet(list(tampered.values())))
        assert not ok, "unexpected pk accepted (closed-world violated)"
        # (c) lose a committed row
        tampered = dict(sim.table)
        del tampered[pk]
        ok, _ = exps.is_satisfied(ResultSet(list(tampered.values())))
        assert not ok, "missing committed row accepted"
