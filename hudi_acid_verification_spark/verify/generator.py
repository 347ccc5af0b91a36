"""Seeded random workload generator with key-pool state.

Port (intent) of writer/TransactionGenerator.java:14-133:
- weighted DML decision tree (:31-47): INSERT when enough unused keys AND
  (not enough live keys OR rand < insert_probability); otherwise UPDATE with
  p = update_probability, else DELETE;
- two key pools (existing / non-existing) with uniformly-random polls
  (:49-57,81-131); keys held out of both pools while their transaction is in
  flight, returned by commit feedback (DELETE → non-existing, else existing);
- derived partition and payload (:75-79). Partition uses a sign-safe stable
  hash (zlib.crc32) instead of Java's hashCode — defect D8 fixed.

Added beyond the reference: ``transaction_failed`` returns in-flight keys to
their original pools so a permanently-failed transaction does not leak keys
(the reference loses them, which contributes to its observed stall).
"""

from __future__ import annotations

import random
import threading
import zlib

from .model import DataManipulation, ManipulationType, Transaction


class WorkloadExhaustedError(Exception):
    """Both pools too small to build a transaction (reference throws)."""


class TransactionGenerator:
    def __init__(
        self,
        maximum_number_of_records: int = 100,
        maximum_number_of_partitions: int = 4,
        records_per_transaction: int = 3,
        insert_probability: float = 0.25,
        update_probability: float = 0.75,
        seed: int = 1234,
    ):
        self._rng = random.Random(seed)
        self._lock = threading.Lock()
        self._records_per_txn = records_per_transaction
        self._max_partitions = maximum_number_of_partitions
        self._p_insert = insert_probability
        self._p_update = update_probability
        # pk domain: Record0..Record{N-1} (TransactionGenerator.java:87-89)
        self._non_existing = [f"Record{i}" for i in range(maximum_number_of_records)]
        self._existing: list[str] = []

    # ------------------------------------------------------------- derived

    def partition_for(self, pk: str) -> str:
        """'Partition' + stable_hash(pk) % max (sign-safe; D8 fixed)."""
        return f"Partition{zlib.crc32(pk.encode()) % self._max_partitions}"

    def _payload(self) -> str:
        return f"Some random value: {self._rng.getrandbits(63)}"

    # ---------------------------------------------------------------- pools

    def _poll(self, pool: list[str]) -> str:
        """Remove a uniformly random element (TransactionGenerator.java:115-122)."""
        idx = self._rng.randrange(len(pool))
        return pool.pop(idx)

    # ------------------------------------------------------------ lifecycle

    def get_next_transaction(self) -> Transaction:
        """Weighted DML choice (TransactionGenerator.java:31-47)."""
        with self._lock:
            n = self._records_per_txn
            can_insert = len(self._non_existing) >= n
            can_mutate = len(self._existing) >= n
            if can_insert and (not can_mutate or self._rng.random() < self._p_insert):
                mtype = ManipulationType.INSERT
                keys = [self._poll(self._non_existing) for _ in range(n)]
            elif can_mutate:
                if self._rng.random() < self._p_update:
                    mtype = ManipulationType.UPDATE
                else:
                    mtype = ManipulationType.DELETE
                keys = [self._poll(self._existing) for _ in range(n)]
            else:
                raise WorkloadExhaustedError(
                    f"existing={len(self._existing)} non_existing="
                    f"{len(self._non_existing)} both below {n}"
                )
            dms = tuple(
                DataManipulation(pk, self.partition_for(pk), self._payload())
                for pk in keys
            )
            return Transaction(mtype, dms)

    def transaction_committed(self, txn: Transaction) -> None:
        """Return keys to the proper pool (TransactionGenerator.java:49-57):
        DELETE → non-existing, INSERT/UPDATE → existing."""
        with self._lock:
            target = (
                self._non_existing
                if txn.manipulation_type is ManipulationType.DELETE
                else self._existing
            )
            target.extend(dm.primary_key_value for dm in txn.data_manipulations)

    def transaction_failed(self, txn: Transaction) -> None:
        """Return keys to their ORIGINAL pool so failed transactions don't
        leak keys (improvement over the reference — see module docstring)."""
        with self._lock:
            origin = (
                self._non_existing
                if txn.manipulation_type is ManipulationType.INSERT
                else self._existing
            )
            origin.extend(dm.primary_key_value for dm in txn.data_manipulations)

    def pool_sizes(self) -> tuple[int, int]:
        with self._lock:
            return len(self._existing), len(self._non_existing)
