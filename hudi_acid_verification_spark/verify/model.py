"""Row / transaction / log-event model.

Ports (intent, not code): resultset/Record.java:15-31,
transactionlog/{Transaction,TransactionLogEvent,EventType,ManipulationType,
DataManipulation}.java.
"""

from __future__ import annotations

import enum
import uuid
from dataclasses import dataclass, field


@dataclass(frozen=True)
class Record:
    """The one user-facing row type (Record.java:15-31). Equality covers all
    three fields — presence verification is full-row equality, not key
    existence (Record.java:11,17,21,24)."""

    primary_key_value: str
    partition_key_value: str
    data_value: str | None = None

    def as_tuple(self) -> tuple:
        return (self.primary_key_value, self.partition_key_value, self.data_value)


class ManipulationType(enum.Enum):
    INSERT = "INSERT"
    UPDATE = "UPDATE"
    DELETE = "DELETE"


class EventType(enum.Enum):
    TRANSACTION_INTENDED = "TRANSACTION_INTENDED"
    TRANSACTION_COMMITTED = "TRANSACTION_COMMITTED"


@dataclass(frozen=True)
class DataManipulation:
    """Write intent for one row (DataManipulation.java:10-30)."""

    primary_key_value: str
    partition_key_value: str
    data_value: str | None = None

    def to_record(self) -> Record:
        return Record(self.primary_key_value, self.partition_key_value, self.data_value)


@dataclass(frozen=True)
class Transaction:
    """One DML type × N rows (Transaction.java:11-21); the multi-row-ness is
    what makes atomicity observable."""

    manipulation_type: ManipulationType
    data_manipulations: tuple[DataManipulation, ...]
    transaction_id: str = field(default_factory=lambda: str(uuid.uuid4()))


@dataclass(frozen=True)
class TransactionLogEvent:
    """(TransactionLogEvent.java:10-19)."""

    event_type: EventType
    transaction: Transaction
