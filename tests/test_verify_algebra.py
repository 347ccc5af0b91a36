"""Unit tests of the verification algebra — pytest port of the reference's
ExpectationTest.java truth tables plus D3-corrected delete cases and
two-cut producer scenarios."""

from __future__ import annotations

import pytest

from hudi_acid_verification_spark.verify import (
    DataManipulation,
    EventType,
    ExpectationProducer,
    InconsistentResultSetException,
    ManipulationType,
    Record,
    RecordAbsence,
    RecordPresence,
    ResultSet,
    ResultSetExpectations,
    Transaction,
    TransactionLog,
)

# Fixtures mirror TestDataFactory.java:10-19: PK{n}/Partition{n%4}/Initial value {n}
R1 = Record("PK1", "Partition1", "Initial value 1")
R2 = Record("PK2", "Partition2", "Initial value 2")
R1_UPDATED = Record("PK1", "Partition1", "Initial value 1 updated")
BASE = ResultSet([R1, R2])


# --- presence truth table (ExpectationTest.java:25-46,81-90) ---------------

@pytest.mark.parametrize(
    "expectation,satisfied",
    [
        (RecordPresence(R1), True),
        (RecordPresence(R1_UPDATED), False),          # same pk, different payload
        (RecordPresence(Record("PK9", "Partition1", "x")), False),  # absent pk
    ],
)
def test_presence(expectation, satisfied):
    assert expectation.is_satisfied(BASE) is satisfied


# --- absence truth table (ExpectationTest.java:48-69,92-101) ---------------

@pytest.mark.parametrize(
    "pk,satisfied", [("PK9", True), ("PK1", False), ("PK2", False)]
)
def test_absence(pk, satisfied):
    assert RecordAbsence(pk).is_satisfied(BASE) is satisfied


# --- duplicate pk raises (ExpectationTest.java:38-46,61-69) ----------------

def test_duplicate_pk_raises():
    dup = ResultSet([R1, Record("PK1", "Partition1", "other")])
    with pytest.raises(InconsistentResultSetException):
        RecordPresence(R1).is_satisfied(dup)
    with pytest.raises(InconsistentResultSetException):
        RecordAbsence("PK1").is_satisfied(dup)
    with pytest.raises(InconsistentResultSetException):
        dup.assert_unique()


# --- OR combinator (ExpectationTest.java:71-79,103-117) --------------------

@pytest.mark.parametrize(
    "left,right,satisfied",
    [
        (RecordPresence(R1), RecordPresence(R1_UPDATED), True),
        (RecordPresence(R1_UPDATED), RecordPresence(R1), True),
        (RecordPresence(R1_UPDATED), RecordAbsence("PK1"), False),
        (RecordAbsence("PK9"), RecordPresence(Record("PK9", "P", "x")), True),
    ],
)
def test_or(left, right, satisfied):
    assert left.or_(right).is_satisfied(BASE) is satisfied


# --- expectation map: conjunction + closed world ---------------------------

def test_map_satisfied_and_closed_world():
    exps = ResultSetExpectations()
    exps.set("PK1", RecordPresence(R1))
    exps.set("PK2", RecordPresence(R2))
    ok, _ = exps.is_satisfied(BASE)
    assert ok

    # closed world: a result pk without any expectation fails
    exps2 = ResultSetExpectations()
    exps2.set("PK1", RecordPresence(R1))
    ok, detail = exps2.is_satisfied(BASE)
    assert not ok and "unexpected" in detail


# --- two-cut producer -------------------------------------------------------

def _txn(mtype, *records):
    return Transaction(
        mtype,
        tuple(
            DataManipulation(r.primary_key_value, r.partition_key_value, r.data_value)
            for r in records
        ),
    )


def test_producer_certain_insert_then_certain_delete_expects_absence():
    """D3 fixed: committed DELETE ⇒ absence (reference inverted it)."""
    log = TransactionLog()
    ins, dele = _txn(ManipulationType.INSERT, R1), _txn(ManipulationType.DELETE, R1)
    log.log_intent(ins); log.log_commit(ins)
    log.log_intent(dele); log.log_commit(dele)
    exps = ExpectationProducer(log).create_result_set_expectations(4, 4)
    ok, _ = exps.is_satisfied(ResultSet([]))       # deleted: absent is correct
    assert ok
    ok, detail = exps.is_satisfied(ResultSet([R1]))  # still present: failure
    assert not ok and "PK1" in detail


def test_producer_uncertain_insert_allows_both_states():
    log = TransactionLog()
    ins = _txn(ManipulationType.INSERT, R1)
    log.log_intent(ins)  # intended, never committed within the window
    exps = ExpectationProducer(log).create_result_set_expectations(1, 1)
    assert exps.is_satisfied(ResultSet([]))[0]      # not yet visible: fine
    assert exps.is_satisfied(ResultSet([R1]))[0]    # already visible: fine
    # but a different payload for that pk is never acceptable
    assert not exps.is_satisfied(ResultSet([R1_UPDATED]))[0]


def test_producer_commit_between_cuts_is_uncertain():
    log = TransactionLog()
    ins = _txn(ManipulationType.INSERT, R1)
    log.log_intent(ins)          # event 0  (within cut1 prefix)
    cnt_before = log.get_event_count()
    log.log_commit(ins)          # event 1  (after cut1, within cut2)
    cnt_after = log.get_event_count()
    exps = ExpectationProducer(log).create_result_set_expectations(
        cnt_before, cnt_after
    )
    assert exps.is_satisfied(ResultSet([]))[0]
    assert exps.is_satisfied(ResultSet([R1]))[0]


def test_producer_certain_update_requires_new_value():
    log = TransactionLog()
    ins = _txn(ManipulationType.INSERT, R1)
    upd = _txn(ManipulationType.UPDATE, R1_UPDATED)
    for t in (ins, upd):
        log.log_intent(t); log.log_commit(t)
    exps = ExpectationProducer(log).create_result_set_expectations(4, 4)
    assert exps.is_satisfied(ResultSet([R1_UPDATED]))[0]
    assert not exps.is_satisfied(ResultSet([R1]))[0]      # stale value
    assert not exps.is_satisfied(ResultSet([]))[0]        # missing


def test_producer_uncertain_update_allows_old_or_new():
    log = TransactionLog()
    ins = _txn(ManipulationType.INSERT, R1)
    upd = _txn(ManipulationType.UPDATE, R1_UPDATED)
    log.log_intent(ins); log.log_commit(ins)
    log.log_intent(upd)                      # update in flight at cut time
    exps = ExpectationProducer(log).create_result_set_expectations(3, 3)
    assert exps.is_satisfied(ResultSet([R1]))[0]
    assert exps.is_satisfied(ResultSet([R1_UPDATED]))[0]
    assert not exps.is_satisfied(ResultSet([]))[0]


def test_producer_update_without_prior_raises():
    log = TransactionLog()
    upd = _txn(ManipulationType.UPDATE, R1_UPDATED)
    log.log_intent(upd)
    with pytest.raises(RuntimeError):
        ExpectationProducer(log).create_result_set_expectations(1, 1)
