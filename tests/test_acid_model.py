"""Model-based randomized lifecycle check of AcidTable (COW and MOR).

The directed tests in test_acid_table.py each pin one behavior; this file
drives RANDOM (seeded, reproducible) operation sequences — upsert, merge,
delete, predicate delete, compact, cluster, restore — against a plain dict
model, asserting the snapshot equals the model after EVERY commit and that
time travel reproduces every retained version's model state. Random
interleavings catch cross-feature interactions (e.g. a merge after a
restore after a predicate delete) that directed tests never compose.

The model encodes the reference's intended semantics (SURVEY §7.3):
- upsert: full-row replace-or-insert by pk;
- merge(update_cols=["dataValue"]): matched rows update dataValue ONLY and
  KEEP their target partition; unmatched rows insert with source partition;
- delete(keys): drop present keys, ignore absent ones;
- delete_where(col, lo, hi): drop rows with lo <= value <= hi;
- compact/cluster: content-neutral layout commits;
- restore(v): content returns to version v's state (a new commit).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import types as T

from hudi_acid_verification_spark.acid import AcidTable

SCHEMA = T.StructType(
    [
        T.StructField("primaryKeyValue", T.StringType(), False),
        T.StructField("partitionKeyValue", T.StringType(), False),
        T.StructField("dataValue", T.StringType(), True),
    ]
)

PARTS = ["P0", "P1", "P2"]
N_OPS = 16


def _snap_dict(table, version=None):
    return {
        r["primaryKeyValue"]: (r["partitionKeyValue"], r["dataValue"])
        for r in table.snapshot(version=version).collect()
    }


@pytest.mark.parametrize(
    ("seed", "table_type", "precombine"),
    [
        (101, "cow", "dataValue"),
        (101, "mor", "dataValue"),
        (202, "cow", None),   # no precombine → update_where joins the mix
        (202, "mor", None),
    ],
)
def test_random_lifecycle_matches_dict_model(
    spark, tmp_path, seed, table_type, precombine
):
    rng = random.Random(seed)
    table = AcidTable.create(
        spark,
        str(tmp_path / f"model_{table_type}_{seed}"),
        SCHEMA,
        pk="primaryKeyValue",
        partition_col="partitionKeyValue",
        precombine_col=precombine,
        mode=table_type,
        compact_every=5 if table_type == "mor" else None,
    )
    model: dict[str, tuple[str, str]] = {}
    states: dict[int, dict] = {table.version(): dict(model)}
    counter = 0

    def fresh_value() -> str:
        nonlocal counter
        counter += 1
        return f"v{counter:04d}"

    def some_keys(include_new: bool) -> list[str]:
        pool = list(model) + (
            [f"PK{rng.randint(0, 30)}" for _ in range(2)] if include_new else []
        )
        rng.shuffle(pool)
        return pool[: rng.randint(1, 3)] or [f"PK{rng.randint(0, 30)}"]

    def batch(keys):
        return spark.createDataFrame(
            [(k, rng.choice(PARTS), fresh_value()) for k in keys], SCHEMA
        )

    ops = ["upsert", "merge", "delete", "delete_where", "compact",
           "cluster", "restore"]
    weights = [30, 20, 15, 10, 8, 7, 10]
    if precombine is None:  # dataValue not protected → predicate UPDATE too
        ops.append("update_where")
        weights.append(12)
    for _ in range(N_OPS):
        op = rng.choices(ops, weights=weights)[0]
        if op == "upsert":
            keys = list(dict.fromkeys(some_keys(include_new=True)))
            b = batch(keys)
            rows = {r[0]: (r[1], r[2]) for r in b.collect()}
            table.upsert(b)
            model.update(rows)
        elif op == "merge":
            keys = list(dict.fromkeys(some_keys(include_new=True)))
            b = batch(keys)
            rows = {r[0]: (r[1], r[2]) for r in b.collect()}
            table.merge(b, update_cols=["dataValue"])
            for k, (part, val) in rows.items():
                if k in model:  # matched: dataValue only, partition kept
                    model[k] = (model[k][0], val)
                else:  # unmatched: full insert with source partition
                    model[k] = (part, val)
        elif op == "delete":
            keys = some_keys(include_new=True)
            table.delete(keys)
            for k in keys:
                model.pop(k, None)
        elif op == "delete_where":
            if not model:
                continue
            vals = sorted(v for _, v in model.values())
            lo = rng.choice(vals)
            hi = rng.choice([v for v in vals if v >= lo])
            table.delete_where("dataValue", lo=lo, hi=hi)
            model = {
                k: pv for k, pv in model.items() if not (lo <= pv[1] <= hi)
            }
        elif op == "update_where":
            if not model:
                continue
            vals = sorted(v for _, v in model.values())
            lo = rng.choice(vals)
            hi = rng.choice([v for v in vals if v >= lo])
            newv = fresh_value()
            table.update_where("dataValue", {"dataValue": newv}, lo=lo, hi=hi)
            model = {
                k: ((pv[0], newv) if lo <= pv[1] <= hi else pv)
                for k, pv in model.items()
            }
        elif op == "compact":
            table.compact()
        elif op == "cluster":
            table.cluster(files_per_partition=2)
        elif op == "restore":
            candidates = [v for v in states if v < table.version()]
            if not candidates:
                continue
            v = rng.choice(candidates)
            table.restore(v)
            model = dict(states[v])
        states[table.version()] = dict(model)
        assert _snap_dict(table) == model, f"divergence after {op} (seed {seed})"
        table.audit_unique()

    # time travel must reproduce every retained version's model state
    for v in rng.sample(sorted(states), min(4, len(states))):
        assert _snap_dict(table, version=v) == states[v], (
            f"time travel to v{v} diverged (seed {seed})"
        )

    # CDC / incremental changefeed must equal the MODEL DIFF between any
    # two versions: per-key _change_op + full before/after images
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
            before = (
                (r["before"]["partitionKeyValue"], r["before"]["dataValue"])
                if r["before"] is not None else None
            )
            after = (
                (r["after"]["partitionKeyValue"], r["after"]["dataValue"])
                if r["after"] is not None else None
            )
            got[r["primaryKeyValue"]] = (r["_change_op"], before, after)
        assert got == want, f"CDC v{v1}->v{v2} diverged (seed {seed})"
        inc = {
            r["primaryKeyValue"]: (r["partitionKeyValue"], r["dataValue"])
            for r in table.read_incremental(v1, v2).collect()
        }
        assert inc == {
            k: s2[k] for k in s2 if s1.get(k) != s2[k]
        }, f"read_incremental v{v1}->v{v2} diverged (seed {seed})"
        dels = {
            r["primaryKeyValue"]
            for r in table.deleted_keys(v1, v2).collect()
        }
        assert dels == {k for k in s1 if k not in s2}, (
            f"deleted_keys v{v1}->v{v2} diverged (seed {seed})"
        )
