"""Two-cut log-window expectation derivation.

Port of resultexpectations/ResultSetExpectationProducer.java:22-95 with
defect D3 fixed: a committed DELETE expects *absence* (the reference's
:63-67 inverted it to presence — SURVEY.md §4.4).

Protocol: the reader samples the log length before the scan (cut 1,
``cnt_before``) and after (cut 2, ``cnt_after``). Every transaction whose
COMMIT event lies within the first ``cnt_before`` events is *certain* — its
effect must be visible. Every other intended transaction in the first
``cnt_after`` events is *uncertain* — the scan may or may not have seen it,
so the prior expectation is OR-chained with the new one. A pk in the result
with no expectation at all fails the closed-world check. This is a windowed
linearizability check in the spirit of Jepsen history checking
(README.md:12-34,47-50).
"""

from __future__ import annotations

from .expectations import (
    Expectation,
    RecordAbsence,
    RecordPresence,
    ResultSetExpectations,
)
from .log import TransactionLog
from .model import EventType, ManipulationType


class ExpectationProducer:
    def __init__(self, log: TransactionLog):
        self._log = log

    def create_result_set_expectations(
        self, cnt_before: int, cnt_after: int
    ) -> ResultSetExpectations:
        events = self._log.get_first_n_events(cnt_after)
        certain_ids = {
            e.transaction.transaction_id
            for e in events[:cnt_before]
            if e.event_type is EventType.TRANSACTION_COMMITTED
        }

        exps = ResultSetExpectations()
        for event in events:
            if event.event_type is not EventType.TRANSACTION_INTENDED:
                continue
            txn = event.transaction
            certain = txn.transaction_id in certain_ids
            for dm in txn.data_manipulations:
                pk = dm.primary_key_value
                if txn.manipulation_type is ManipulationType.DELETE:
                    new: Expectation = RecordAbsence(pk)  # D3 fixed
                else:
                    new = RecordPresence(dm.to_record())

                if certain:
                    exps.set(pk, new)
                    continue

                prev = exps.get(pk)
                if prev is None:
                    if txn.manipulation_type is ManipulationType.INSERT:
                        # before an uncertain INSERT the key did not exist
                        # (ResultSetExpectationProducer.java:39-49)
                        prev = RecordAbsence(pk)
                    else:
                        # UPDATE/DELETE require a prior state (:51-73); the
                        # generator guarantees the INSERT intent+commit are
                        # earlier in any prefix containing this event
                        raise RuntimeError(
                            f"{txn.manipulation_type.value} for {pk!r} with no "
                            "prior expectation — log prefix is inconsistent"
                        )
                exps.set(pk, prev.or_(new))
        return exps
