"""Client-side ACID verification layer (SURVEY.md §7.3).

Pure-Python port of the reference's verification algebra — the in-memory
transaction log, the two-cut expectation producer, the seeded workload
generator, and the concurrent read/verify harness — with the reference's
defects D3/D4/D5 fixed (SURVEY.md §4.4). The storage under test is
``acid.AcidTable`` instead of Hudi.
"""

from .expectations import (
    InconsistentResultSetException,
    Or,
    RecordAbsence,
    RecordPresence,
    ResultSet,
    ResultSetExpectations,
)
from .generator import TransactionGenerator
from .harness import HarnessConfig, HarnessReport, TransactionHarness
from .log import TransactionLog
from .model import (
    DataManipulation,
    EventType,
    ManipulationType,
    Record,
    Transaction,
    TransactionLogEvent,
)
from .producer import ExpectationProducer

__all__ = [
    "DataManipulation",
    "EventType",
    "ExpectationProducer",
    "HarnessConfig",
    "HarnessReport",
    "InconsistentResultSetException",
    "ManipulationType",
    "Or",
    "Record",
    "RecordAbsence",
    "RecordPresence",
    "ResultSet",
    "ResultSetExpectations",
    "Transaction",
    "TransactionGenerator",
    "TransactionHarness",
    "TransactionLog",
    "TransactionLogEvent",
]
