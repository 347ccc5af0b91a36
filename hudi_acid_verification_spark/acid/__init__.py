"""ACID table layer: keyed, partitioned, snapshot-isolated COW parquet with
an atomic manifest commit protocol (SURVEY.md §4.3 / §7.2)."""

from .table import AcidTable, CommitConflictError, InconsistentSnapshotError

__all__ = ["AcidTable", "CommitConflictError", "InconsistentSnapshotError"]
