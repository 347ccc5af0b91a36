#!/usr/bin/env python
"""Maintain ``cert_ledger.json`` — source hashes backing driver certifications.

The driver certifies the first ~50 entries of ``__spark_entry__.queries()``
each round and records the outcome in ``CORRECTNESS_r{N}.json``. A
certification is only as good as the operator source it ran against: a plan
rewritten AFTER its green row carries a stale certification (VERDICT r4,
"What's wrong" #2). The ledger makes staleness structural: it maps each
certified query name to the sha256 of its registered function source (plus
oracle SQL) at certification time; ``__spark_entry__._certified_names()``
drops any name whose CURRENT hash no longer matches, so a rewritten operator
automatically rotates back into the certification window.

Run this at ROUND START, before editing any operator source — at that moment
the working tree matches what the driver ran last round, so "current hash"
== "hash at certification time":

    python scripts/update_cert_ledger.py

Rules applied:
- names green in the NEWEST CORRECTNESS artifact: ledger hash := current
  hash (a fresh green row re-certifies a previously-stale name);
- names certified only in older artifacts: added if missing (legacy trust),
  existing entries left untouched (they may be deliberately stale);
- ``--force-stale NAME ...``: pin a sentinel so the name re-queues even
  though its green row predates a rewrite the hash can't see (e.g. a shared
  helper changed but the registered function body didn't).

- ``--rehash``: recompute EVERY non-sentinel ledger entry under the current
  hash algorithm. Only valid when the working tree still matches what the
  driver certified (i.e. at round start, before any operator edit) — used
  once per hash-algorithm migration, e.g. the r6 one-level helper walk.

Hash coverage (r6): the registered function's own source, same-module
helpers/classes it references one level deep, same-module scalar constants,
and the oracle SQL (``__spark_entry__._hash_payload``). Cross-module shared
infrastructure (``operators.load``, ``materialize_once``) and deeper
transitive edits still take ``--force-stale`` when a value-changing edit
lands there.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LEDGER = os.path.join(HERE, "cert_ledger.json")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--force-stale", nargs="*", default=[],
                    help="names to pin with a stale sentinel hash")
    ap.add_argument("--rehash", action="store_true",
                    help="recompute all non-sentinel entries under the "
                         "current hash algorithm (round start only)")
    args = ap.parse_args()

    sys.path.insert(0, HERE)
    import __spark_entry__ as entry

    ledger: dict[str, str] = {}
    if os.path.exists(LEDGER):
        with open(LEDGER) as f:
            ledger = json.load(f)

    artifacts = sorted(glob.glob(os.path.join(HERE, "CORRECTNESS_r*.json")))
    newest_green: set[str] = set()
    older_green: set[str] = set()
    for path in artifacts:
        with open(path) as f:
            rows = json.load(f)
        bucket = newest_green if path == artifacts[-1] else older_green
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            if row.get("hash_match") is True or (
                row.get("err") == "no_oracle"
                and row.get("spark_rows") is not None
            ):
                bucket.add(name)

    changed = []
    if args.rehash:
        for name in sorted(ledger):
            if ledger[name].startswith("stale:"):
                continue
            h = entry._source_hash(name)
            if h is not None and ledger[name] != h:
                ledger[name] = h
                changed.append((name, "rehashed"))
    for name in sorted(newest_green):
        h = entry._source_hash(name)
        if h is not None and ledger.get(name) != h:
            ledger[name] = h
            changed.append((name, "recertified"))
    for name in sorted(older_green - newest_green):
        if name not in ledger:
            h = entry._source_hash(name)
            if h is not None:
                ledger[name] = h
                changed.append((name, "bootstrap"))
    for name in args.force_stale:
        ledger[name] = "stale:forced"
        changed.append((name, "forced-stale"))

    with open(LEDGER, "w") as f:
        json.dump(ledger, f, indent=1, sort_keys=True)
        f.write("\n")
    for name, why in changed:
        print(f"{why:14s} {name}")
    print(f"ledger: {len(ledger)} entries -> {LEDGER}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
