"""Concurrent randomized linearizability check of OCC commits.

Two writer threads (own Spark sessions, like the harness's
TransactionWriter analog) fire seeded random DML at ONE table with
``occ=True``, retrying on :class:`CommitConflictError`. Each successful
commit records ``(granted version, logical op payload)``. Afterwards the
committed history — every thread's ops merged and sorted by the version
the table actually granted — is replayed against the plain dict model,
and the table must agree with the replay at EVERY version (time travel)
and at the head.

This is strictly stronger than the harness's expectation algebra: it
asserts the OCC rebase path yields a SERIAL order (the version order),
not merely that each writer's own reads verify. It would have caught the
cross-partition duplicate-pk race directly.

Workload shape (why it must serialize):
- upserts and merges draw from a SHARED key pool — both are
  footprint-complete (every source key lands in a written file's pk
  range), so racing writers conflict and retry into a serial order;
- deletes draw only from the thread's OWN key range — presence against
  the pinned snapshot is then exact (the other thread never writes those
  keys), which keeps bare-key deletes inside the serializable fragment
  (the snapshot-isolation caveat in ``_commit``'s docstring is exactly
  about deletes of keys a CONCURRENT writer inserts).
"""

from __future__ import annotations

import random
import threading

import pytest
from pyspark.sql import types as T

from hudi_acid_verification_spark.acid import AcidTable
from hudi_acid_verification_spark.acid.table import CommitConflictError

pytestmark = pytest.mark.soak  # separable tier (VERDICT r4 #5)

SCHEMA = T.StructType(
    [
        T.StructField("primaryKeyValue", T.StringType(), False),
        T.StructField("partitionKeyValue", T.StringType(), False),
        T.StructField("dataValue", T.StringType(), True),
    ]
)
PARTS = ["P0", "P1", "P2"]
N_OPS = 5  # per thread
MAX_RETRY = 30


def _apply(model: dict, op: tuple) -> None:
    kind, payload = op
    if kind == "upsert":
        model.update(payload)
    elif kind == "merge":  # update_cols=["dataValue"]
        for k, (part, val) in payload.items():
            if k in model:
                model[k] = (model[k][0], val)
            else:
                model[k] = (part, val)
    elif kind == "delete":
        for k in payload:
            model.pop(k, None)


def _writer(table, rng, shared_keys, own_keys, history, errors, n_ops=N_OPS):
    def batch(keys):
        return table.spark.createDataFrame(
            [
                (k, rng.choice(PARTS), f"{threading.current_thread().name}-{i}-{k}")
                for i, k in enumerate(keys)
            ],
            SCHEMA,
        )

    try:
        for _ in range(n_ops):
            kind = rng.choices(
                ["upsert", "merge", "delete"], weights=[45, 35, 20]
            )[0]
            if kind == "delete":
                keys = rng.sample(own_keys, rng.randint(1, 2))
                payload = list(keys)
                commit = lambda: table.delete(payload)
            else:
                pool = shared_keys + own_keys
                keys = list(dict.fromkeys(rng.sample(pool, rng.randint(1, 3))))
                b = batch(keys)
                rows = {r[0]: (r[1], r[2]) for r in b.collect()}
                payload = rows
                if kind == "upsert":
                    commit = lambda: table.upsert(b)
                else:
                    commit = lambda: table.merge(b, update_cols=["dataValue"])
            for attempt in range(MAX_RETRY):
                try:
                    v = commit()
                    break
                except CommitConflictError:
                    continue
            else:
                raise AssertionError(f"{kind} never committed in {MAX_RETRY} tries")
            history.append((v, (kind, payload)))
    except BaseException as exc:  # noqa: BLE001 - re-raised by the test
        errors.append(exc)


@pytest.mark.parametrize(
    ("seed", "mode", "compact_every"),
    [
        (1101, "cow", None),
        (1102, "cow", None),
        (2201, "mor", None),
        (2202, "mor", None),
        # inline compaction racing the writers: compaction commits are
        # content-neutral no-ops in the replay, but they fold deltas and
        # tombstones while OCC rebases land around them — the resolution
        # closure must not lose or resurrect a row at ANY version
        (3301, "mor", 3),
        (3302, "mor", 2),
    ],
)
def test_concurrent_occ_history_replays_serially(
    spark, tmp_path, seed, mode, compact_every
):
    _run_linearizable(spark, tmp_path, seed, mode, compact_every, n_writers=2)


@pytest.mark.parametrize(
    ("seed", "mode"), [(4401, "cow"), (4402, "mor")]
)
def test_three_writer_occ_replay_chains(spark, tmp_path, seed, mode):
    """Three writers force the COW rebase to walk MULTI-version replay
    chains (two raced commits between a writer's pin and its publish) and
    give MOR seq fix-ups longer reorderings — the same serial-replay
    assertion must hold."""
    _run_linearizable(spark, tmp_path, seed, mode, None, n_writers=3)


def test_three_writer_soak_with_inline_compaction(spark, tmp_path):
    """The soak configuration that found the compaction-resurrection bug
    (a later fold re-emitting a stale shadowed cross-partition copy above
    the true row): three writers, ten ops each, compaction folding every
    other commit. Long histories make a partition go quiet between folds,
    which is exactly the layout the fold closure must handle."""
    _run_linearizable(
        spark, tmp_path, 7705, "mor", 2, n_writers=3, n_ops=10
    )


def _run_linearizable(
    spark, tmp_path, seed, mode, compact_every, n_writers, n_ops=None
):
    n_ops = n_ops or N_OPS
    rng = random.Random(seed)
    path = str(tmp_path / f"lin_{mode}_{seed}")
    AcidTable.create(
        spark, path, SCHEMA, pk="primaryKeyValue",
        partition_col="partitionKeyValue", precombine_col=None,
        mode=mode, compact_every=compact_every,
    )
    seeder = AcidTable(spark, path, occ=True)
    shared = [f"SK{i:02d}" for i in range(8)]
    own = [
        [f"{chr(65 + w)}{i:02d}" for i in range(6)] for w in range(n_writers)
    ]
    base = {
        k: (rng.choice(PARTS), "seed")
        for k in shared[:4] + [k for o in own for k in o[:3]]
    }
    seeder.upsert(
        spark.createDataFrame([(k, p, v) for k, (p, v) in base.items()], SCHEMA)
    )
    v0 = seeder.version()

    history: list[tuple[int, tuple]] = []
    errors: list[BaseException] = []
    threads = [
        threading.Thread(
            target=_writer,
            name=f"w{i}",
            args=(
                AcidTable(spark.newSession(), path, occ=True),
                random.Random(seed * 10 + i),
                shared,
                own[i],
                history,
                errors,
                n_ops,
            ),
        )
        for i in range(n_writers)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(540)
    assert not any(t.is_alive() for t in threads), "a writer hung past join"
    assert not errors, f"writer failed: {errors[0]!r}"
    assert len(history) == n_writers * n_ops

    # granted versions are unique; without inline compaction they are also
    # contiguous (one manifest per DML commit). Compaction commits appear
    # as version gaps — content-neutral no-ops in the replay.
    versions = sorted(v for v, _ in history)
    assert len(set(versions)) == len(versions)
    table = AcidTable(spark, path)
    head = table.version()
    if compact_every is None:
        assert versions == list(range(v0 + 1, v0 + 1 + len(history)))
    else:
        assert versions[-1] <= head

    # replay the committed history in version order; the table must agree
    # with the model at every version — including the compaction-commit
    # gaps, where the folded layout must read identically
    model = dict(base)
    by_version = dict(history)
    states = {v0: dict(model)}
    for v in range(v0 + 1, head + 1):
        if v in by_version:
            _apply(model, by_version[v])
        states[v] = dict(model)
        got = {
            r["primaryKeyValue"]: (r["partitionKeyValue"], r["dataValue"])
            for r in table.snapshot(version=v).collect()
        }
        assert got == model, f"v{v} diverged from serial replay (seed {seed})"
    table.audit_unique()

    # CDC over the CONCURRENT history: rebased seqs and compaction folds
    # must leave the changefeed clean — verbatim rewrites cancel, and the
    # per-key before/after images equal the serial-model diff
    import itertools

    pairs = list(itertools.combinations(sorted(states), 2))
    for v1, v2 in rng.sample(pairs, min(4, len(pairs))):
        s1, s2 = states[v1], states[v2]
        want = {}
        for k in set(s1) | set(s2):
            if k not in s1:
                want[k] = ("insert", None, s2[k])
            elif k not in s2:
                want[k] = ("delete", s1[k], None)
            elif s1[k] != s2[k]:
                want[k] = ("update", s1[k], s2[k])
        got = {}
        for r in table.changes(v1, v2).collect():
            img = lambda x: (
                None if x is None
                else (x["partitionKeyValue"], x["dataValue"])
            )
            got[r["primaryKeyValue"]] = (
                r["_change_op"], img(r["before"]), img(r["after"])
            )
        assert got == want, f"CDC v{v1}->v{v2} diverged (seed {seed})"
