"""Expectation algebra + result-set model.

Ports (intent): resultexpectations/{Expectation,ExpectRecordPresence,
ExpectRecordAbsence,Or,ResultSetExpectations}.java and
resultset/{ResultSet,InconsistentResultSetException}.java.
"""

from __future__ import annotations

from collections.abc import Iterable

from .model import Record


class InconsistentResultSetException(Exception):
    """More than one row for a primary key (ResultSet.java:26-34) — PK
    uniqueness is an asserted invariant of every read."""


class ResultSet:
    """Materialized rows + pk index (ResultSet.java:16-24)."""

    def __init__(self, records: Iterable[Record]):
        self.records = list(records)
        self._by_pk: dict[str, list[Record]] = {}
        for r in self.records:
            self._by_pk.setdefault(r.primary_key_value, []).append(r)

    def get_record_by_primary_key(self, pk: str) -> Record | None:
        """0-or-1 row; duplicates raise (ResultSet.java:26-34)."""
        hits = self._by_pk.get(pk, [])
        if len(hits) > 1:
            raise InconsistentResultSetException(
                f"{len(hits)} rows for primary key {pk!r}"
            )
        return hits[0] if hits else None

    def primary_keys(self) -> set[str]:
        return set(self._by_pk)

    def assert_unique(self) -> None:
        """Whole-result uniqueness audit (run on every snapshot read)."""
        for pk, hits in self._by_pk.items():
            if len(hits) > 1:
                raise InconsistentResultSetException(
                    f"{len(hits)} rows for primary key {pk!r}"
                )


class Expectation:
    """Base predicate over a ResultSet (Expectation.java:5-12)."""

    def is_satisfied(self, result_set: ResultSet) -> bool:  # pragma: no cover
        raise NotImplementedError

    def or_(self, other: "Expectation") -> "Expectation":
        return Or(self, other)


class RecordPresence(Expectation):
    """Row with this pk exists AND equals the expected record — full-row
    equality (ExpectRecordPresence.java:16-24)."""

    def __init__(self, record: Record):
        self.record = record

    def is_satisfied(self, result_set: ResultSet) -> bool:
        found = result_set.get_record_by_primary_key(self.record.primary_key_value)
        return found is not None and found == self.record

    def __repr__(self) -> str:
        return f"Presence({self.record.as_tuple()})"


class RecordAbsence(Expectation):
    """No row with this pk (ExpectRecordAbsence.java:13-21)."""

    def __init__(self, primary_key_value: str):
        self.primary_key_value = primary_key_value

    def is_satisfied(self, result_set: ResultSet) -> bool:
        return result_set.get_record_by_primary_key(self.primary_key_value) is None

    def __repr__(self) -> str:
        return f"Absence({self.primary_key_value!r})"


class Or(Expectation):
    """(Or.java:9-18) — uncertain transactions chain into or-trees."""

    def __init__(self, left: Expectation, right: Expectation):
        self.left = left
        self.right = right

    def is_satisfied(self, result_set: ResultSet) -> bool:
        return self.left.is_satisfied(result_set) or self.right.is_satisfied(result_set)

    def __repr__(self) -> str:
        return f"Or({self.left!r}, {self.right!r})"


class ResultSetExpectations:
    """Per-pk expectation map: conjunction of all expectations plus the
    closed-world check — every pk in the result must be expected
    (ResultSetExpectations.java:20-41)."""

    def __init__(self) -> None:
        self._by_pk: dict[str, Expectation] = {}

    def get(self, pk: str) -> Expectation | None:
        return self._by_pk.get(pk)

    def set(self, pk: str, expectation: Expectation) -> None:
        self._by_pk[pk] = expectation

    def expected_keys(self) -> set[str]:
        return set(self._by_pk)

    def is_satisfied(self, result_set: ResultSet) -> tuple[bool, str | None]:
        """Returns (ok, failure_detail)."""
        for pk, exp in self._by_pk.items():
            if not exp.is_satisfied(result_set):
                found = result_set._by_pk.get(pk)
                return False, f"pk={pk!r}: expected {exp!r}, found {found!r}"
        unexpected = result_set.primary_keys() - self.expected_keys()
        if unexpected:
            return False, f"unexpected primary keys in result: {sorted(unexpected)[:5]}"
        return True, None
