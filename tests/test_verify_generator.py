"""Workload generator: determinism, pool discipline, decision-tree weights."""

from __future__ import annotations

from hudi_acid_verification_spark.verify import ManipulationType, TransactionGenerator


def drive(gen, n):
    txns = []
    for _ in range(n):
        t = gen.get_next_transaction()
        gen.transaction_committed(t)
        txns.append(t)
    return txns


def test_seeded_determinism():
    a = drive(TransactionGenerator(seed=1234), 200)
    b = drive(TransactionGenerator(seed=1234), 200)
    assert [
        (t.manipulation_type, tuple(d.primary_key_value for d in t.data_manipulations))
        for t in a
    ] == [
        (t.manipulation_type, tuple(d.primary_key_value for d in t.data_manipulations))
        for t in b
    ]


def test_first_transactions_are_inserts():
    gen = TransactionGenerator(seed=7)
    t = gen.get_next_transaction()
    assert t.manipulation_type is ManipulationType.INSERT  # nothing exists yet
    assert len(t.data_manipulations) == 3
    assert len({d.primary_key_value for d in t.data_manipulations}) == 3


def test_pool_discipline_no_duplicate_inflight_keys():
    """Keys polled for a txn are out of both pools until commit feedback —
    concurrent transactions can never target the same key."""
    gen = TransactionGenerator(seed=42, maximum_number_of_records=12)
    t1 = gen.get_next_transaction()
    t2 = gen.get_next_transaction()
    k1 = {d.primary_key_value for d in t1.data_manipulations}
    k2 = {d.primary_key_value for d in t2.data_manipulations}
    assert not (k1 & k2)
    gen.transaction_committed(t1)
    gen.transaction_committed(t2)
    assert gen.pool_sizes() == (6, 6)


def test_delete_returns_keys_to_nonexisting():
    gen = TransactionGenerator(seed=1, maximum_number_of_records=6)
    ins = gen.get_next_transaction()
    gen.transaction_committed(ins)
    # force a mutation: non_existing (3) >= 3 so inserts stay possible;
    # run until we see a DELETE and check pool feedback
    for _ in range(100):
        t = gen.get_next_transaction()
        gen.transaction_committed(t)
        if t.manipulation_type is ManipulationType.DELETE:
            break
    existing, non_existing = gen.pool_sizes()
    assert existing + non_existing == 6


def test_failed_transaction_returns_keys_to_origin():
    gen = TransactionGenerator(seed=5, maximum_number_of_records=6)
    t = gen.get_next_transaction()  # INSERT of 3 keys
    assert gen.pool_sizes() == (0, 3)
    gen.transaction_failed(t)
    assert gen.pool_sizes() == (0, 6)  # keys back in non-existing


def test_partition_derivation_stable_and_in_range():
    gen = TransactionGenerator(maximum_number_of_partitions=4)
    parts = {gen.partition_for(f"Record{i}") for i in range(100)}
    assert parts <= {f"Partition{i}" for i in range(4)}
    assert gen.partition_for("Record1") == gen.partition_for("Record1")
