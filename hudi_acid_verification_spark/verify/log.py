"""In-memory append-only transaction log — the WAL-for-verification.

Port of transactionlog/TransactionLog.java:8-36: synchronized append, prefix
snapshots (``get_first_n_events``) and a monotonic event count. Log order is
*not* guaranteed to match storage commit order (README.md:33-34) — the
expectation algebra absorbs that race.
"""

from __future__ import annotations

import threading

from .model import EventType, Transaction, TransactionLogEvent


class TransactionLog:
    def __init__(self) -> None:
        self._events: list[TransactionLogEvent] = []
        self._lock = threading.Lock()

    def log_intent(self, txn: Transaction) -> None:
        """Logged *before* the storage write (TransactionWriter.java:81)."""
        with self._lock:
            self._events.append(
                TransactionLogEvent(EventType.TRANSACTION_INTENDED, txn)
            )

    def log_commit(self, txn: Transaction) -> None:
        """Logged *after* the storage write (TransactionWriter.java:101)."""
        with self._lock:
            self._events.append(
                TransactionLogEvent(EventType.TRANSACTION_COMMITTED, txn)
            )

    def get_event_count(self) -> int:
        with self._lock:
            return len(self._events)

    def get_first_n_events(self, n: int) -> list[TransactionLogEvent]:
        """Prefix snapshot (TransactionLog.java:26-33)."""
        with self._lock:
            return self._events[:n]
