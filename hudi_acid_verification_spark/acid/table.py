"""AcidTable — a keyed, partitioned, ACID table on plain parquet.

Replaces the Hudi runtime the reference delegates to (SURVEY.md §4.3): keyed
upsert + atomic multi-row commit + snapshot isolation + writer mutual
exclusion, with zero non-Spark engine code beyond this commit protocol.

Reference parity (cited per method):
- create:   writer/TransactionManager.java:76-88 (CREATE TABLE ... USING hudi
            PARTITIONED BY ... TBLPROPERTIES primaryKey/preCombineField)
- upsert:   writer/TransactionWriter.java:121-141 (df.write.format("hudi")
            .option(recordkey/partitionpath/precombine).mode(Append))
- merge:    writer/TransactionWriter.java:143-166 (MERGE INTO ... WHEN MATCHED
            THEN UPDATE SET t.dataValue = s.dataValue WHEN NOT MATCHED INSERT)
- delete:   writer/TransactionWriter.java:168-178, with the *intended*
            IN-list semantics (defect D2 fixed — SURVEY.md §4.4)
- snapshot + uniqueness audit: reader/ReaderThread.java:74-83 +
            resultset/ResultSet.java:26-34

Commit protocol
---------------
::

    <path>/
      _manifests/v{N:012d}.json   immutable: schema, pk, partition col,
                                  and EITHER the full [{file, partition}]
                                  live-file list (a checkpoint — every
                                  _CHECKPOINT_EVERY-th version, and any
                                  version whose delta would be larger)
                                  OR {delta_from, added, removed} against
                                  v(N-1) — per-commit manifest I/O is
                                  O(changed files), not O(all files)
      _latest                     one line: the current manifest file name;
                                  swapped via os.rename (atomic on POSIX)
      _lock                       flock'd for writer mutual exclusion
      data/<commit-uuid>/<partition_col>=<val>/part-*.parquet   immutable

A commit writes new parquet files, writes manifest v(N+1), then atomically
renames a temp file over ``_latest``. Readers resolve ``_latest`` once per
snapshot — they see either the old or the new manifest, never a mix
(snapshot isolation). A writer crash before the rename leaves orphan parquet
files that no manifest references (atomicity). Writers serialize on an
OS-level ``flock`` — the effective serialization the reference configures via
Hudi's lock providers (hudi-defaults.conf:4, TransactionWriter.java:137).

Scale design (100 TB): data files are hive-partitioned by the partition
column and the manifest records each file's partition value, so upsert /
merge / delete rewrite **only the partitions containing affected keys**
(copy-on-write scoped by partition pruning), not the table. Snapshot reads
use ``basePath`` so Catalyst still gets partition pruning and parquet
predicate pushdown over the manifest's file list. The manifest log is
delta-encoded with periodic full checkpoints (see ``_CHECKPOINT_EVERY``)
and vacuum compacts the log tail into a checkpoint at the retention
cutoff — the Delta-log/Hudi-timeline design point that keeps a 3-row
commit from serializing a 10⁵-entry file list. Checkpoints above
``_SHARD_MIN_FILES`` entries are themselves SHARDED Iceberg-style: the
manifest carries a tiny shard-ref list and the per-partition shards are
content-addressed under ``_manifests/shards/`` — an unchanged shard is
byte-identical, so it is reused across checkpoints (write cost O(changed
shards)) and ``snapshot(partitions=[...])`` parses only the shards its
partitions touch. The protocol — immutable files + atomic pointer swap —
is unchanged.
"""

from __future__ import annotations

import base64
import fcntl
import hashlib
import json
import os
import time
import types
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


class CommitConflictError(Exception):
    """An OCC publish lost a race (or the writer lock timed out).

    ``layout_op`` names the racing commit's timeline action when the
    conflict was caused by a LAYOUT commit (compact / cluster /
    repartition / restore / evolve_schema / vacuum) rather than by
    another writer's data: layout conflicts are retried internally with
    bounded escalation to a pessimistic attempt (see ``_commit``), while
    data conflicts surface to the caller's retry loop unchanged."""

    def __init__(self, msg: str, layout_op: str | None = None):
        super().__init__(msg)
        self.layout_op = layout_op


# Timeline action labels that rewrite layout/metadata rather than change
# logical content on behalf of a user DML. A racing commit with one of
# these ops conflicts with EVERY pinned OCC snapshot (it rewrites most
# files), so it is the starvation hazard the internal escalation exists
# for; data-data conflicts (both ops in _DATA_OPS) stay caller-visible.
_DATA_OPS = frozenset({"upsert", "merge", "delete", "update"})
# The CONTENT-PRESERVING subset of layout actions: racing one of these
# rearranges files without changing any logical row, so re-running the
# writer's mutate against the fresh manifest recomputes the identical
# operation — safe to retry internally, invisible to the caller. restore
# (changes content), evolve_schema / repartition (can invalidate the
# caller's input DataFrame) stay caller-visible conflicts by design.
_RETRYABLE_LAYOUT_OPS = frozenset({"compact", "cluster", "vacuum"})
# OCC attempts allowed to lose against layout commits before the writer
# escalates to one pessimistic attempt (lock held across the data write,
# which no concurrent commit can interrupt — guaranteed progress).
_OCC_LAYOUT_RETRIES = 2
# Consecutive caller-visible DATA-conflict losses before the NEXT commit
# attempt on this table handle runs pessimistically. A slow transaction
# (merge: read+join+write, seconds) racing a fast writer (sub-second
# upserts) can lose every optimistic race indefinitely — observed as a
# 1000-txn OCC harness run failing one UPDATE after 100 bounded retries.
# The streak preserves single-race semantics (the first N losses still
# surface to the caller, whose retry loop owns recompute semantics); only
# a caller that KEEPS retrying crosses the threshold and gets the
# serialized guaranteed-progress attempt. Reset on any successful commit.
_OCC_DATA_LOSS_ESCALATE = 5


class InconsistentSnapshotError(Exception):
    """A snapshot contains duplicate primary keys
    (port of resultset/InconsistentResultSetException.java)."""


@dataclass(frozen=True)
class _Manifest:
    version: int
    schema: T.StructType
    pk: str
    partition_col: str
    precombine_col: str | None
    files: list[dict]  # {"file", "partition"[, "kind": base|delta, "seq"]}
    mode: str = "cow"  # "cow" (rewrite on commit) | "mor" (delta + resolve)
    compact_every: int | None = None  # mor: inline-compact every N commits
    op: str | None = None  # what produced this version (timeline action label)
    # names ever DROPPED from the schema — an optimization HINT for the
    # re-add guard, NOT ground truth: adding a name in this list (or any
    # name when the list is None/unknown, e.g. a legacy manifest) verifies
    # against the live files' parquet footers. A site that forgets to
    # thread it degrades to None, which is the conservative slow path.
    dropped: list[str] | None = None

    def to_json(self) -> str:
        return json.dumps(
            {
                "version": self.version,
                "schema": self.schema.jsonValue(),
                "pk": self.pk,
                "partition_col": self.partition_col,
                "precombine_col": self.precombine_col,
                "files": self.files,
                "mode": self.mode,
                "compact_every": self.compact_every,
                "op": self.op,
                "dropped": self.dropped,
                "created_at": time.time(),
            }
        )

    @staticmethod
    def from_json(text: str) -> "_Manifest":
        return _Manifest.from_dict(json.loads(text))

    @staticmethod
    def from_dict(d: dict) -> "_Manifest":
        return _Manifest(
            version=d["version"],
            schema=T.StructType.fromJson(d["schema"]),
            pk=d["pk"],
            partition_col=d["partition_col"],
            precombine_col=d.get("precombine_col"),
            files=d["files"],
            mode=d.get("mode", "cow"),
            compact_every=d.get("compact_every"),
            op=d.get("op"),
            dropped=d.get("dropped"),
        )


# Manifest LOG encoding: a commit whose version is a multiple of this (or
# whose file delta would be larger than the full list — layout commits)
# writes a FULL manifest (a checkpoint); every other commit writes only
# its file DELTA against version-1 plus the (tiny) table metadata. This is
# what keeps per-commit manifest I/O O(changed files) instead of O(all
# files): at 100 TB a table holds ~10⁵ file entries, and a full rewrite
# per 3-row upsert would make manifest serialization — not the data write
# — the commit bottleneck (the Delta-log / Hudi-timeline design point).
# Readers replay at most _CHECKPOINT_EVERY-1 deltas onto one checkpoint;
# vacuum re-encodes the retention cutoff as a full checkpoint (log-tail
# compaction) so the chain below it can be dropped.
_CHECKPOINT_EVERY = 16

# Checkpoint SHARDING (Iceberg manifest-list shape, VERDICT r5 directive
# #3): a checkpoint with at least _SHARD_MIN_FILES live entries does not
# inline its file list — it groups entries by partition into shards of at
# most _SHARD_MAX_ENTRIES, writes each shard CONTENT-ADDRESSED
# (shards/s-<sha>.json; an unchanged shard from the previous checkpoint is
# the same bytes, hence the same name, hence NOT rewritten), and stores
# only the tiny shard-ref list (the manifest list). Consequences at 1e5+
# file entries: checkpoint write cost is O(changed shards) instead of one
# multi-MB JSON per 16th commit, and a reader pruning to specific
# partitions parses only the shards those partitions touch. Small tables
# stay inline — sharding tiny lists would add I/O for nothing.
_SHARD_MIN_FILES = 256
_SHARD_MAX_ENTRIES = 4096


class AcidTable:
    """Keyed, partitioned, snapshot-isolated parquet table.

    Two table types mirroring Hudi's (hudi-defaults.conf:3 picks COW in the
    reference): ``cow`` rewrites affected partitions per commit (fast reads,
    write amplification); ``mor`` appends delta files per commit and resolves
    latest-per-key at read time (fast writes, read amplification bounded by
    ``compact()``)."""

    def __init__(self, spark: SparkSession, path: str, occ: bool = False):
        self.spark = spark
        self.path = path
        # Writer-side concurrency mode (Hudi write.concurrency.mode analog):
        # occ=True lets COW DML write data lock-free and conflict-check at
        # publish — see _commit. Per-writer, like Hudi's: readers and
        # pessimistic writers interoperate unchanged on the same table.
        self.occ = occ
        # consecutive caller-visible OCC data-conflict losses on this
        # handle; at _OCC_DATA_LOSS_ESCALATE the next attempt serializes
        # (pessimistic) so slow transactions can't livelock behind fast
        # writers. Handles are per-writer (like a Hudi write client), so
        # plain instance state suffices.
        self._occ_loss_streak = 0
        self._manifest_dir = os.path.join(path, "_manifests")
        self._latest_ptr = os.path.join(path, "_latest")
        self._lock_path = os.path.join(path, "_lock")
        self._data_dir = os.path.join(path, "data")

    # ------------------------------------------------------------------ DDL

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        schema: T.StructType,
        pk: str,
        partition_col: str,
        precombine_col: str | None = None,
        if_not_exists: bool = False,
        mode: str = "cow",
        compact_every: int | None = None,
    ) -> "AcidTable":
        """CREATE TABLE (TransactionManager.java:76-88 parity).

        ``mode`` selects the Hudi table-type analog: ``"cow"`` (copy-on-
        write: commits rewrite affected partitions, reads are plain scans)
        or ``"mor"`` (merge-on-read: commits append delta files, reads
        resolve latest-per-key; ``compact()`` folds deltas into base files).

        ``compact_every`` (mor only) inline-compacts after every Nth commit
        — Hudi's `hoodie.compact.inline.max.delta.commits` analog, bounding
        read amplification without a separate maintenance process.
        """
        t = cls(spark, path)
        if os.path.exists(t._latest_ptr):
            if if_not_exists:
                return t
            raise FileExistsError(f"AcidTable already exists at {path}")
        if pk not in schema.names or partition_col not in schema.names:
            raise ValueError("pk/partition_col must be schema columns")
        if mode not in ("cow", "mor"):
            raise ValueError(f"mode must be 'cow' or 'mor', got {mode!r}")
        os.makedirs(t._manifest_dir, exist_ok=True)
        os.makedirs(t._data_dir, exist_ok=True)
        open(t._lock_path, "a").close()
        m = _Manifest(
            0, schema, pk, partition_col, precombine_col, [], mode,
            compact_every, op="create", dropped=[],
        )
        t._write_manifest_and_swap(m)
        return t

    @staticmethod
    def drop(path: str) -> None:
        """DROP TABLE IF EXISTS (TransactionManager.java:75 parity)."""
        import shutil

        shutil.rmtree(path, ignore_errors=True)

    # ------------------------------------------------------------- snapshots

    def _read_manifest(
        self,
        version: int | None = None,
        partitions: set[str] | None = None,
    ) -> _Manifest:
        """Resolve one manifest version: load its file; if it is a DELTA
        (``delta_from`` present), walk the chain down to the nearest full
        checkpoint and replay the file deltas forward. The chain is at
        most ``_CHECKPOINT_EVERY - 1`` hops. A concurrent vacuum can
        re-encode the cutoff as a full checkpoint and drop the chain
        below it between this reader opening a delta and walking past the
        cutoff — on that FileNotFoundError the resolution restarts once
        from the top (the re-encoded checkpoint then terminates the walk;
        content is identical by construction).

        ``partitions`` (a set of partition-value strings) prunes the
        resolution to those partitions: on a sharded checkpoint only the
        matching shards are opened — the point-lookup path parses
        O(touched shards), not the whole file list."""
        try:
            return self._read_manifest_once(version, partitions)
        except FileNotFoundError:
            try:
                return self._read_manifest_once(version, partitions)
            except FileNotFoundError as err:
                # Distinguish the two persistent cases for the caller: a
                # version vacuumed out of the retention window vs a chain
                # whose checkpoint/delta files are genuinely missing.
                existing = [
                    int(n[1:-5])
                    for n in os.listdir(self._manifest_dir)
                    if n.startswith("v") and n.endswith(".json")
                ] if os.path.isdir(self._manifest_dir) else []
                oldest = min(existing) if existing else None
                if (
                    version is not None
                    and oldest is not None
                    and version < oldest
                ):
                    raise FileNotFoundError(
                        f"manifest v{version} is outside the retention "
                        f"window (oldest retained: v{oldest}); it was "
                        "removed by vacuum()"
                    ) from err
                raise FileNotFoundError(
                    f"broken manifest chain resolving "
                    f"{'latest' if version is None else f'v{version}'}: "
                    f"{err} (not a retention miss — a checkpoint or delta "
                    "file is missing from an otherwise-retained chain)"
                ) from err

    def _read_manifest_once(
        self,
        version: int | None = None,
        partitions: set[str] | None = None,
    ) -> _Manifest:
        if version is None:
            with open(self._latest_ptr) as f:
                name = f.read().strip()
        else:
            name = f"v{version:012d}.json"
        with open(os.path.join(self._manifest_dir, name)) as f:
            d = json.loads(f.read())
        if "delta_from" not in d:
            top = dict(d)
            top["files"] = self._files_of(d, partitions)
            top.pop("shard_refs", None)
            return _Manifest.from_dict(top)
        deltas = [d]
        while "delta_from" in d:
            pname = f"v{d['delta_from']:012d}.json"
            with open(os.path.join(self._manifest_dir, pname)) as f:
                d = json.loads(f.read())
            if "delta_from" not in d:
                break
            deltas.append(d)
        # checkpoint base (pruned shards under partition pruning); delta
        # replay filters adds the same way — removals by file name are
        # no-ops for entries outside the pruned subset
        files = self._files_of(d, partitions)
        for dd in reversed(deltas):
            removed = set(dd["removed"])
            files = [e for e in files if e["file"] not in removed]
            added = dd["added"]
            if partitions is not None:
                added = [
                    e for e in added
                    if str(e.get("partition")) in partitions
                ]
            files += added
        top = dict(deltas[0])
        top["files"] = files
        return _Manifest.from_dict(top)

    def version(self) -> int:
        return self._read_manifest().version

    @property
    def pk(self) -> str:
        """Primary-key column name (hoodie.datasource.write.recordkey.field)."""
        return self._read_manifest().pk

    @property
    def partition_col(self) -> str:
        """Partition column name (hoodie.datasource.write.partitionpath.field)."""
        return self._read_manifest().partition_col

    def snapshot(
        self,
        version: int | None = None,
        partitions: list | None = None,
    ) -> DataFrame:
        """Consistent snapshot DataFrame (ReaderThread.java:77-80 parity;
        ``version`` gives time travel over retained manifests).

        ``partitions`` restricts the snapshot to those partition values
        AND prunes the manifest resolution itself: on a sharded
        checkpoint only the matching shards are parsed — partition
        pruning starts at the METADATA layer, before any file listing
        (the Iceberg manifest-list read path)."""
        part_set = (
            {str(p) for p in partitions} if partitions is not None else None
        )
        m = self._read_manifest(version, partitions=part_set)
        return self._df_for(m)

    def _df_for(self, m: _Manifest) -> DataFrame:
        if not m.files:
            return self.spark.createDataFrame([], m.schema)
        if m.mode == "mor":
            return self._resolve(m, m.files)
        return self._scan_files(m, m.files).select(*m.schema.names)

    def _scan_files(self, m: _Manifest, files: list[dict]) -> DataFrame:
        """Read manifest entries with the physical schema. Entries may carry
        a ``root`` (shallow clones reference the SOURCE table's data dir);
        each root group is read with its own ``basePath`` — which recovers
        the hive partition column from directory names and keeps Catalyst
        partition pruning + parquet pushdown — then the groups union."""
        by_root: dict[str, list[dict]] = {}
        for f in files:
            by_root.setdefault(f.get("root", self._data_dir), []).append(f)
        out: DataFrame | None = None
        for root, fs in by_root.items():
            paths = [os.path.join(root, f["file"]) for f in fs]
            part = (
                self.spark.read.option("basePath", root)
                .schema(self._physical_schema(m))
                .parquet(*paths)
            )
            out = part if out is None else out.unionByName(part)
        return out

    def _physical_schema(self, m: _Manifest) -> T.StructType:
        # Partition column comes from the directory, but listing it in the
        # read schema keeps its type stable. MOR files additionally carry the
        # operation marker and commit sequence used by read-time resolution.
        if m.mode == "mor":
            return T.StructType(
                list(m.schema.fields)
                + [
                    T.StructField("__op", T.StringType(), False),
                    T.StructField("__seq", T.LongType(), False),
                    # partial-update payloads list the columns they set;
                    # NULL for full rows (and for files written before the
                    # column existed — parquet read-by-name fills NULL)
                    T.StructField(
                        "__cols", T.ArrayType(T.StringType()), True
                    ),
                ]
            )
        return m.schema

    def _resolve(self, m: _Manifest, files: list[dict]) -> DataFrame:
        """MOR read-time merge: latest commit sequence wins per key,
        tombstones drop the key — Hudi's snapshot query over base + log
        files, expressed as one window over the unioned scan.

        Scale notes: the resolve shuffles the scanned rows once on pk (the
        MOR read amplification); `compact()` folds deltas so the delta:base
        ratio — and with it this window's input — stays bounded. Partition
        pruning still applies (delta files live in their hive partition
        dirs), so point-partition reads only resolve that partition.
        """
        if not files:
            return self.spark.createDataFrame([], m.schema)
        df = self._scan_files(m, files)
        if any(f.get("op") == "partial" for f in files):
            return self._resolve_with_partials(m, df)
        order = [F.col("__seq").desc()]
        if m.precombine_col:
            order.append(F.col(m.precombine_col).desc())
        w = Window.partitionBy(m.pk).orderBy(*order)
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .filter(F.col("__op") != "delete")
            .select(*m.schema.names)
        )

    def _guard_readd(self, m: _Manifest, name: str) -> None:
        """Reject adding ``name`` while any LIVE file physically carries it.

        With name-based parquet binding, re-adding a previously dropped
        column over files that still contain it would resurrect the
        pre-drop values instead of the documented NULL backfill. Ground
        truth is the files' parquet FOOTERS (a driver-side metadata read,
        no data scan) — exact for any table, including legacy manifests.
        ``m.dropped`` is only the fast path: a name never dropped (and a
        known history) skips the footer sweep entirely, so the common
        add-new-column call stays O(1); the sweep runs only for re-adds
        of dropped names or when the history is unknown (None).
        """
        if m.dropped is not None and name not in m.dropped:
            return
        import pyarrow as pa
        import pyarrow.parquet as pq

        for e in m.files:
            path = os.path.join(e.get("root", self._data_dir), e["file"])
            try:
                carried = name in pq.ParquetFile(path).schema_arrow.names
            except (OSError, pa.lib.ArrowInvalid):
                # unreadable footer: assume the worst. pyarrow raises
                # ArrowInvalid (not OSError) for corrupt/truncated footers —
                # both must take the same conservative rejection path so the
                # error contract is one message, not a raw Arrow traceback.
                carried = True
            if carried:
                raise ValueError(
                    f"cannot re-add column {name!r}: live data file "
                    f"{e['file']!r} still carries it from before it was "
                    f"dropped — rewrite the files first (cluster / "
                    f"repartition_table) or use a new name"
                )

    @staticmethod
    def _pk_overlap(a: dict, b: dict) -> bool:
        """Can two manifest entries share a primary key? Range test over the
        per-file ``pk_min``/``pk_max`` stats; entries without stats are
        conservatively overlapping. Shared by the MOR partition closure and
        the OCC cross-partition conflict check."""
        alo, ahi = a.get("pk_min"), a.get("pk_max")
        blo, bhi = b.get("pk_min"), b.get("pk_max")
        if alo is None or ahi is None or blo is None or bhi is None:
            return True
        return not (ahi < blo or alo > bhi)

    @staticmethod
    def _pk_components(m: _Manifest) -> tuple[dict, bool, set]:
        """Partition connectivity under pk-range overlap, memoized per
        manifest object (the closure is asked for on every MOR scan_range /
        predicate-DML / CDC / compact — recomputing it per call was the r4
        driver-side stall flagged in ADVICE).

        Returns ``(comp_of, has_statless, all_parts)``: a partition →
        component-root map over every file-bearing partition, whether any
        file lacks pk stats (such a file overlaps EVERYTHING, collapsing
        the graph to one component), and the set of file-bearing
        partitions. Built in O(n log n): sort intervals by pk_min and
        sweep — a maximal run where the next interval's lo ≤ the running
        max hi is exactly one connected component of the interval-overlap
        graph — union-finding partitions within each run (files sharing a
        partition are connected by definition, which the shared UF node
        encodes)."""
        cached = getattr(m, "_pk_comp_cache", None)
        if cached is not None:
            return cached

        parent: dict = {}

        def find(x):
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:  # path compression
                parent[x], x = root, parent[x]
            return root

        def union(a, b):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[rb] = ra

        statless = False
        ivals = []
        all_parts: set = set()
        for f in m.files:
            p = f["partition"]
            all_parts.add(p)
            parent.setdefault(p, p)
            lo, hi = f.get("pk_min"), f.get("pk_max")
            if lo is None or hi is None:
                statless = True
            else:
                ivals.append((lo, hi, p))
        if not statless:
            ivals.sort(key=lambda t: (t[0], t[1]))
            run_hi = None
            run_part = None
            for lo, hi, p in ivals:
                if run_hi is not None and lo <= run_hi:
                    union(run_part, p)
                    if hi > run_hi:
                        run_hi = hi
                else:
                    run_hi, run_part = hi, p
        comp_of = {p: find(p) for p in parent}
        cache = (comp_of, statless, all_parts)
        object.__setattr__(m, "_pk_comp_cache", cache)
        return cache

    def _pk_closed_partitions(self, m: _Manifest, parts: set) -> set:
        """Close a partition set under pk-range overlap (to a fixpoint).

        MOR resolution and delta folding are only correct over a file set
        containing ALL of a key's rows — and a key's rows (bases, full
        deltas, partial payloads, tombstones) can span partitions after a
        cross-partition upsert or a matched merge, because delta files
        land in the SOURCE row's partition while the shadowed base stays
        in the target's. Any file outside the set whose pk range overlaps
        a file inside pulls its partition in; files without pk stats are
        included conservatively. Manifest metadata only — no data read.
        On layouts where the pk correlates with the partition (or after
        ``cluster()``), the closure stays tight; uncorrelated layouts
        degrade toward a full resolve — the honest price of per-key
        completeness without a global key index.

        The fixpoint equals reachability in the partition graph whose
        edges are "some file here pk-overlaps some file there", so it is
        answered from the memoized O(n log n) sweep components in
        ``_pk_components`` — O(|parts| + |partitions|) per call, never the
        O(rounds × files²) pure-Python loop this replaced (ADVICE r4).
        """
        parts = set(parts)
        comp_of, statless, all_parts = self._pk_components(m)
        touched = {p for p in parts if p in comp_of}
        if not touched:
            # partitions with no files pull nothing in
            return parts
        if statless:
            # a stats-less file overlaps every file: one giant component
            return parts | all_parts
        want = {comp_of[p] for p in touched}
        return parts | {p for p, c in comp_of.items() if c in want}

    def _resolve_with_partials(self, m: _Manifest, df: DataFrame) -> DataFrame:
        """MOR resolution when partial-update payloads are present (Hudi
        ``PartialUpdateAvroPayload`` analog).

        Per-key semantics, with ``__seq`` strictly increasing per commit:

        1. the newest tombstone (if any) kills everything at or below it;
        2. the *base* row is the newest full row (``__op='upsert'``) above
           the tombstone — or, when no full row exists (MERGE's WHEN NOT
           MATCHED branch arriving as a partial payload), the OLDEST
           surviving partial row, whose full carried values act as the
           insert;
        3. every partial row newer than the base overrides exactly the
           columns named in its ``__cols`` — per column, the newest setter
           wins; an explicit NULL set is preserved (the override is
           detected by struct-nullness, not value-nullness).

        One shuffle: the per-key window and the groupBy hash-partition on
        the same key, so Catalyst reuses the exchange. Scale: identical
        read-amplification story to plain MOR resolve; ``compact()`` folds
        partial payloads into base rows, after which the cheap
        window-latest path applies again.
        """
        kw = Window.partitionBy(m.pk)
        op, seq = F.col("__op"), F.col("__seq")
        df = df.withColumn(
            "__del_seq",
            F.coalesce(
                F.max(F.when(op == "delete", seq)).over(kw), F.lit(-1)
            ),
        ).filter((op != "delete") & (seq > F.col("__del_seq")))
        df = (
            df.withColumn(
                "__base_seq",
                F.coalesce(
                    F.max(F.when(op == "upsert", seq)).over(kw),
                    F.min(F.when(op == "partial", seq)).over(kw),
                ),
            )
            .withColumn("__is_base", seq == F.col("__base_seq"))
            .filter(
                F.col("__is_base")
                | ((op == "partial") & (seq > F.col("__base_seq")))
            )
        )
        data_cols = [c for c in m.schema.names if c != m.pk]
        base_struct = ", ".join(f"`{c}`" for c in data_cols)
        aggs = [
            F.expr(
                f"max_by(struct({base_struct}), __seq)"
                " FILTER (WHERE __is_base)"
            ).alias("__base")
        ]
        for c in data_cols:
            aggs.append(
                F.expr(
                    f"max_by(struct(`{c}` AS v), __seq) FILTER (WHERE"
                    f" __op = 'partial' AND NOT __is_base"
                    f" AND array_contains(__cols, '{c}'))"
                ).alias(f"__ov_{c}")
            )
        out = df.groupBy(m.pk).agg(*aggs)
        final = [F.col(m.pk)]
        for c in data_cols:
            ov = F.col(f"__ov_{c}")
            final.append(
                F.when(ov.isNotNull(), ov["v"])
                .otherwise(F.col("__base")[c])
                .alias(c)
            )
        return out.select(*final).select(*m.schema.names)

    def _write_delta(
        self, df: DataFrame, m: _Manifest, op: str, seq: int, kind: str,
        cols: list[str] | None = None, preserve_layout: bool = False,
    ) -> list[dict]:
        """Write rows (plus op/seq markers) and return manifest entries
        tagged with the file kind — a delta append is ONE Spark write job
        with no read of existing data. ``cols`` (op="partial" only) lists
        the columns this payload sets; the rest are carried for the
        insert branch but ignored when a live base row exists."""
        physical = df.withColumn("__op", F.lit(op)).withColumn(
            "__seq", F.lit(seq).cast("long")
        )
        if cols is not None:
            # explicit cast: F.array() with ZERO elements (an empty SET
            # list, e.g. merge(update_cols=[])) types as array<void> and
            # parquet-writes a BOOLEAN element, breaking later reads that
            # expect array<string>
            physical = physical.withColumn(
                "__cols",
                F.array(*[F.lit(c) for c in cols]).cast(
                    T.ArrayType(T.StringType())
                ),
            )
        else:
            physical = physical.withColumn(
                "__cols", F.lit(None).cast(T.ArrayType(T.StringType()))
            )
        entries = self._write_data(physical, m, preserve_layout=preserve_layout)
        for e in entries:
            e["kind"] = kind
            e["seq"] = seq
            e["op"] = op
        return entries

    def audit_unique(self, df: DataFrame | None = None) -> None:
        """PK-uniqueness invariant of every read (ResultSet.java:26-34)."""
        m = self._read_manifest()
        snap = df if df is not None else self._df_for(m)
        dup = (
            snap.groupBy(m.pk)
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            raise InconsistentSnapshotError(
                f"duplicate primary key {dup[0][0]!r} (count={dup[0][1]})"
            )

    # ----------------------------------------------------------------- locks

    def _acquire_lock(self, timeout: float = 60.0):
        fd = os.open(self._lock_path, os.O_RDWR | os.O_CREAT)
        deadline = time.monotonic() + timeout
        while True:
            try:
                fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                return fd
            except BlockingIOError:
                if time.monotonic() >= deadline:
                    os.close(fd)
                    raise CommitConflictError(
                        f"could not lock {self._lock_path} within {timeout}s"
                    )
                time.sleep(0.01)

    @staticmethod
    def _release_lock(fd: int) -> None:
        fcntl.flock(fd, fcntl.LOCK_UN)
        os.close(fd)

    # --------------------------------------------------------------- commits

    def _write_manifest_and_swap(
        self, m: _Manifest, prev: _Manifest | None = None
    ) -> None:
        mpath = os.path.join(self._manifest_dir, f"v{m.version:012d}.json")
        payload = self._encode_manifest(m, prev)
        tmp = mpath + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(payload)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, mpath)
        ptr_tmp = self._latest_ptr + f".tmp.{uuid.uuid4().hex}"
        with open(ptr_tmp, "w") as f:
            f.write(os.path.basename(mpath))
            f.flush()
            os.fsync(f.fileno())
        os.rename(ptr_tmp, self._latest_ptr)  # atomic on POSIX

    def _encode_manifest(self, m: _Manifest, prev: _Manifest | None) -> str:
        """Serialize a manifest as a DELTA against version-1 when that is
        smaller, else as a full checkpoint (see ``_CHECKPOINT_EVERY``).
        Full is forced on checkpoint versions, on the first manifest of a
        table (clone — no predecessor to delta against), and when the
        file delta is no smaller than the full list (compaction /
        clustering rewrite most files, so their "delta" IS the table).
        File entries are compared by WHOLE-entry equality: an entry
        re-stated with different stats under the same name lands in both
        ``removed`` (by name) and ``added`` (new entry), so replay keeps
        the restatement."""
        if m.version % _CHECKPOINT_EVERY == 0:
            return self._encode_full(m)
        if prev is None or prev.version != m.version - 1:
            try:
                prev = self._read_manifest(version=m.version - 1)
            except (OSError, ValueError, KeyError):
                return self._encode_full(m)
        old_keys = {json.dumps(e, sort_keys=True) for e in prev.files}
        new_keys = {json.dumps(e, sort_keys=True) for e in m.files}
        added = [
            e for e in m.files
            if json.dumps(e, sort_keys=True) not in old_keys
        ]
        removed = [
            e["file"] for e in prev.files
            if json.dumps(e, sort_keys=True) not in new_keys
        ]
        if len(added) + len(removed) >= max(1, len(m.files)):
            return self._encode_full(m)
        d = json.loads(m.to_json())
        del d["files"]
        d["delta_from"] = m.version - 1
        d["added"] = added
        d["removed"] = removed
        return json.dumps(d)

    @property
    def _shard_dir(self) -> str:
        return os.path.join(self._manifest_dir, "shards")

    def _encode_full(self, m: _Manifest) -> str:
        """Serialize a full checkpoint. Large file lists shard by
        partition into content-addressed files (see _SHARD_MIN_FILES):
        shard content is canonical JSON sorted by file name, so a shard
        whose entries did not change since the previous checkpoint hashes
        to the SAME name and is skipped — checkpoint write cost is
        O(changed shards). The checkpoint manifest itself carries only
        ``shard_refs`` (name, partition, entry count): the manifest list.
        """
        if len(m.files) < _SHARD_MIN_FILES:
            return m.to_json()
        groups: dict[str, list[dict]] = {}
        for e in m.files:
            groups.setdefault(str(e.get("partition")), []).append(e)
        os.makedirs(self._shard_dir, exist_ok=True)
        shard_refs: list[dict] = []
        for part in sorted(groups):
            entries = sorted(groups[part], key=lambda e: e["file"])
            for i in range(0, len(entries), _SHARD_MAX_ENTRIES):
                chunk = entries[i:i + _SHARD_MAX_ENTRIES]
                payload = json.dumps(chunk, sort_keys=True)
                name = (
                    "s-"
                    + hashlib.sha256(payload.encode()).hexdigest()[:24]
                    + ".json"
                )
                path = os.path.join(self._shard_dir, name)
                if not os.path.exists(path):
                    tmp = path + f".tmp.{uuid.uuid4().hex}"
                    with open(tmp, "w") as f:
                        f.write(payload)
                        f.flush()
                        os.fsync(f.fileno())
                    os.rename(tmp, path)
                shard_refs.append(
                    {"name": name, "partition": part, "n": len(chunk)}
                )
        d = json.loads(m.to_json())
        del d["files"]
        d["shard_refs"] = shard_refs
        return json.dumps(d)

    def _files_of(self, d: dict, partitions: set[str] | None = None) -> list:
        """Materialize a raw full-manifest dict's file entries — inline
        ``files`` or sharded ``shard_refs`` — optionally pruned to a set
        of partition values (only matching shards are even opened)."""
        if "shard_refs" in d:
            files: list[dict] = []
            for ref in d["shard_refs"]:
                if partitions is not None and ref["partition"] not in partitions:
                    continue
                with open(os.path.join(self._shard_dir, ref["name"])) as f:
                    files.extend(json.loads(f.read()))
            return files
        files = d["files"]
        if partitions is not None:
            files = [
                e for e in files if str(e.get("partition")) in partitions
            ]
        return files

    def _write_data(
        self, df: DataFrame, m: _Manifest, preserve_layout: bool = False
    ) -> list[dict]:
        """Write df hive-partitioned, publish files under the table's
        top-level ``<partition_col>=<value>/`` dirs, return manifest entries.

        Spark writes into a staging commit dir; files are then renamed into
        the final single-level hive layout (``data/<part>=<val>/<commit>-f``)
        so that one ``basePath`` read covers every commit. The renames happen
        *before* the manifest swap — files are invisible until the manifest
        references them, so a crash mid-move leaves only unreferenced orphans
        (same guarantee a direct-write committer gives on an object store).
        """
        commit_id = uuid.uuid4().hex
        staging = os.path.join(self.path, "_staging", commit_id)
        # Rebalance on the partition column so each hive partition gets a few
        # right-sized files instead of one per upstream task (32 shuffle
        # partitions × partition values = hundreds of tiny files per commit,
        # compounding into every later snapshot read). AQE's rebalance both
        # coalesces small partitions and splits skewed ones, so this stays
        # correct when one partition value carries most of a 100 TB batch.
        # ``preserve_layout`` skips the rebalance: cluster() has already
        # range-partitioned + sorted the rows into its target file layout,
        # and rebalancing would coalesce the curve back into one file per
        # hive partition, erasing the stats-index tightness it just built.
        if not preserve_layout:
            df = df.hint("rebalance", m.partition_col)
        df.write.mode("overwrite").partitionBy(m.partition_col).parquet(staging)
        entries: list[dict] = []
        prefix = f"{m.partition_col}="
        for root, _dirs, files in os.walk(staging):
            seg = os.path.basename(root)
            if not seg.startswith(prefix):
                continue
            part = seg[len(prefix):]
            dest_dir = os.path.join(self._data_dir, seg)
            os.makedirs(dest_dir, exist_ok=True)
            for fn in files:
                if not fn.endswith(".parquet"):
                    continue
                final = f"{commit_id}-{fn}"
                dest = os.path.join(dest_dir, final)
                os.rename(os.path.join(root, fn), dest)
                entry = {"file": os.path.join(seg, final), "partition": part}
                entry.update(self._pk_stats(dest, m.pk))
                entries.append(entry)
        import shutil

        shutil.rmtree(staging, ignore_errors=True)
        return entries

    _MAX_STAT_COLS = 12  # manifest col-stats index width cap

    # pk bloom-filter index (Hudi BLOOM index analog). ~10 bits/key with
    # k=7 double-hashed probes ≈ 0.8% false-positive rate. Built only for
    # files up to _BLOOM_MAX_KEYS rows: the filter lives in the JSON
    # manifest, so its size must stay bounded — at cluster scale the blooms
    # move into the parquet footers / a metadata table (exactly where Hudi
    # keeps them) and the cap goes away; the probe protocol is identical.
    _BLOOM_BITS_PER_KEY = 10
    _BLOOM_K = 7
    _BLOOM_MAX_KEYS = 20000

    @staticmethod
    def _bloom_hash_pair(key) -> tuple[int, int]:
        """(h1, h2) for double hashing: probe_i = (h1 + i*h2) mod m.
        Keys hash via str() so int and str pks normalize identically at
        build and probe time; h2 is forced odd so probes cycle all of m."""
        d = hashlib.md5(str(key).encode("utf-8")).digest()
        return int.from_bytes(d[:8], "big"), int.from_bytes(d[8:], "big") | 1

    @classmethod
    def _bloom_build(cls, values) -> dict | None:
        vals = [v for v in values if v is not None]
        if not vals or len(vals) > cls._BLOOM_MAX_KEYS:
            return None
        # str()-normalization is only provably identical at build and probe
        # time for string/int keys (bytes decode to the str the user would
        # pass); anything else (timestamps, floats) renders ambiguously and
        # a mismatch would be a FALSE NEGATIVE — no bloom is always correct.
        if not all(isinstance(v, (str, int, bytes)) for v in vals):
            return None
        m_bits = max(64, len(vals) * cls._BLOOM_BITS_PER_KEY)
        arr = bytearray((m_bits + 7) // 8)
        for v in vals:
            if isinstance(v, bytes):
                v = v.decode("utf-8", "replace")
            h1, h2 = cls._bloom_hash_pair(v)
            for i in range(cls._BLOOM_K):
                idx = (h1 + i * h2) % m_bits
                arr[idx >> 3] |= 1 << (idx & 7)
        return {
            "m": m_bits,
            "k": cls._BLOOM_K,
            "b64": base64.b64encode(bytes(arr)).decode("ascii"),
        }

    @classmethod
    def _bloom_contains(cls, bloom: dict, key) -> bool:
        m_bits, k = bloom["m"], bloom["k"]
        arr = base64.b64decode(bloom["b64"])
        if isinstance(key, bytes):
            # mirror _bloom_build's normalization: a bytes pk is hashed via
            # its utf-8 decode at build time, so the probe must decode too —
            # str(b'..') would hash "b'..'" and guarantee a false negative.
            key = key.decode("utf-8", "replace")
        h1, h2 = cls._bloom_hash_pair(key)
        for i in range(k):
            idx = (h1 + i * h2) % m_bits
            if not (arr[idx >> 3] >> (idx & 7)) & 1:
                return False
        return True

    @staticmethod
    def _pk_stats(path: str, pk: str) -> dict:
        """Per-file column min/max from the parquet footer — the manifest's
        column-stats index (Hudi metadata-table `column_stats` analog). Read
        once at commit time from metadata the writer already produced (no
        data scan). The primary key's range lands in ``pk_min``/``pk_max``
        (:meth:`lookup` and :meth:`_disjoint` prune with it); every other
        primitive column's range (up to ``_MAX_STAT_COLS``) lands in
        ``stats: {col: [lo, hi]}`` for :meth:`scan_range` data skipping.
        """
        try:
            import datetime
            import pyarrow.parquet as pq

            md = pq.ParquetFile(path).metadata

            def norm(v):
                if isinstance(v, bytes):
                    return v.decode("utf-8", "replace")
                if isinstance(v, (datetime.datetime, datetime.date)):
                    return v.isoformat()
                return v

            def col_range(idx):
                lo = hi = None
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(idx).statistics
                    if st is None or not st.has_min_max:
                        return None
                    lo = norm(st.min) if lo is None else min(lo, norm(st.min))
                    hi = norm(st.max) if hi is None else max(hi, norm(st.max))
                if lo is None or not isinstance(lo, (str, int, float, bool)):
                    return None
                return [lo, hi]

            out: dict = {}
            stats: dict = {}
            for i in range(md.num_columns):
                name = md.schema.column(i).name
                rng = col_range(i)
                if rng is None:
                    continue
                if name == pk:
                    out["pk_min"], out["pk_max"] = rng
                elif len(stats) < AcidTable._MAX_STAT_COLS:
                    stats[name] = rng
            if stats:
                out["stats"] = stats
            # pk bloom: one columnar read of the key column of the file this
            # commit just wrote (what Hudi's write path does to seed its
            # bloom index). Range stats prune by locality; the bloom prunes
            # when ranges interleave (post-z-order layouts, hash-ish keys).
            if md.num_rows <= AcidTable._BLOOM_MAX_KEYS:
                bloom = AcidTable._bloom_build(
                    pq.read_table(path, columns=[pk]).column(0).to_pylist()
                )
                if bloom is not None:
                    out["pk_bloom"] = bloom
            return out
        except Exception:
            return {}  # stats are an optimization; never fail a commit

    def lookup(self, keys) -> DataFrame:
        """Point lookup by primary key(s), file-pruned via the manifest's
        pk min/max stats: only files whose key range can contain a probe
        key are read — on a large table a point read touches O(1) files
        instead of scanning the snapshot (the read path Hudi serves with
        its bloom/column-stats indexes).

        MOR: every candidate file (base, delta, tombstone — all carry the
        pk) joins the read-time resolution restricted to candidates;
        stats are conservative, so resolution over the candidate set gives
        exactly the live rows. Files from manifests written before the
        stats existed have no range and are conservatively kept.

        Two pruning levels, both from the manifest, no file I/O: the pk
        [min, max] range first, then the per-file pk bloom filter for files
        whose range overlaps a probe key (Hudi bloom-index analog — decisive
        when file key ranges interleave, where min/max alone keeps
        everything). Blooms have no false negatives, so pruning is exact;
        a false positive only reads one extra file.
        """
        if isinstance(keys, (str, int, bytes)):
            keys = [keys]
        keys = list(keys)
        m = self._read_manifest()

        def may_contain(f: dict) -> bool:
            lo, hi = f.get("pk_min"), f.get("pk_max")
            in_range = keys
            if lo is not None and hi is not None:
                try:
                    in_range = [k for k in keys if lo <= k <= hi]
                except TypeError:
                    in_range = keys  # incomparable stats: keep conservatively
                if not in_range:
                    return False
            bloom = f.get("pk_bloom")
            if bloom is not None:
                return any(self._bloom_contains(bloom, k) for k in in_range)
            return True

        cand = [f for f in m.files if may_contain(f)]
        if m.mode == "mor":
            df = self._resolve(m, cand)
        else:
            df = self._df_for_files(m, cand)
        return df.filter(F.col(m.pk).isin(keys))

    def lookup_stats(self, keys) -> dict:
        """Observability for the point-read index: how many manifest files a
        :meth:`lookup` of ``keys`` would read under (a) no index, (b) the pk
        range stats only, (c) range + bloom. The bloom-index unit tests
        assert (c) < (b) on interleaved-key layouts."""
        if isinstance(keys, (str, int, bytes)):
            keys = [keys]
        keys = list(keys)
        m = self._read_manifest()

        def in_range(f: dict) -> list:
            lo, hi = f.get("pk_min"), f.get("pk_max")
            if lo is None or hi is None:
                return keys
            try:
                return [k for k in keys if lo <= k <= hi]
            except TypeError:
                return keys

        range_cand = [f for f in m.files if in_range(f)]
        bloom_cand = [
            f
            for f in range_cand
            if f.get("pk_bloom") is None
            or any(self._bloom_contains(f["pk_bloom"], k) for k in in_range(f))
        ]
        return {
            "total_files": len(m.files),
            "range_candidates": len(range_cand),
            "bloom_candidates": len(bloom_cand),
        }

    @staticmethod
    def _may_overlap(f: dict, col: str, lo, hi, pk: str | None = None) -> bool:
        """Can file ``f`` contain a row with ``lo <= col <= hi``? Missing or
        incomparable stats keep the file (stats only ever prune)."""
        if col == pk:
            rng = [f.get("pk_min"), f.get("pk_max")]
        else:
            rng = (f.get("stats") or {}).get(col) or [None, None]
        flo, fhi = rng
        if flo is None or fhi is None:
            return True
        try:
            if lo is not None and fhi < lo:
                return False
            if hi is not None and flo > hi:
                return False
            return True
        except TypeError:
            return True

    def prune_stats(self, col: str, lo=None, hi=None) -> dict:
        """Observability for the stats index: how many manifest files a
        range predicate on ``col`` would touch vs. the total. The unit test
        for :meth:`cluster` z-ordering asserts this ratio drops."""
        m = self._read_manifest()
        n_cand = sum(
            1 for f in m.files if self._may_overlap(f, col, lo, hi, m.pk)
        )
        return {"n_files": len(m.files), "n_candidates": n_cand}

    def scan_range(self, col: str, lo=None, hi=None) -> DataFrame:
        """Range scan with column-stats data skipping: read only the files
        whose footer-harvested [min, max] for ``col`` can overlap
        [lo, hi], then apply the exact predicate as a residual filter —
        the Hudi/Iceberg/Delta data-skipping read path over the manifest's
        column-stats index. After :meth:`cluster` with ``zorder_cols``
        containing ``col``, per-file ranges are tight and a selective
        range touches O(selectivity) files instead of the whole table.

        MOR prunes at PARTITION granularity (a candidate file's partition
        resolves fully), then closes the partition set under pk-range
        overlap: a row's newest version can live in any delta file of its
        partition — or, after a cross-partition upsert, in ANOTHER
        partition's delta — so file-level skipping would under-resolve and
        an unclosed partition subset would return a shadowed stale row
        (the same closure delete_where/update_where need).
        """
        m = self._read_manifest()
        cand = [f for f in m.files if self._may_overlap(f, col, lo, hi, m.pk)]
        if m.mode == "mor":
            parts = self._pk_closed_partitions(
                m, {f["partition"] for f in cand}
            )
            cand = [f for f in m.files if f["partition"] in parts]
            df = self._resolve(m, cand)
        else:
            df = self._df_for_files(m, cand)
        pred = F.lit(True)
        if lo is not None:
            pred = pred & (F.col(col) >= F.lit(lo))
        if hi is not None:
            pred = pred & (F.col(col) <= F.lit(hi))
        return df.filter(pred)

    def _commit_with(self, make, timeout: float = 60.0, op: str | None = None) -> int:
        """The one commit path: under the writer lock, derive the next
        manifest from the current one via ``make(current) -> _Manifest``
        and atomically publish it. Every commit — DML, compaction,
        clustering, restore, schema evolution — goes through here, so
        protocol changes (hooks, conflict checks, new manifest fields)
        apply everywhere at once."""
        fd = self._acquire_lock(timeout)
        try:
            cur = self._read_manifest()
            nm = make(cur)
            assert nm.version == cur.version + 1
            if op is not None and nm.op is None:
                from dataclasses import replace as _dc_replace

                nm = _dc_replace(nm, op=op)
            self._write_manifest_and_swap(nm, prev=cur)
            return nm.version
        finally:
            self._release_lock(fd)

    def _commit(
        self, mutate, timeout: float = 60.0, occ: bool = False,
        op: str | None = None,
    ) -> int:
        """Run ``mutate(manifest) -> new_files`` and atomically publish the
        next manifest version (metadata carried over unchanged).

        ``occ=False`` (default): pessimistic — the writer lock is held
        across the whole mutation, including the Spark data-write jobs.

        ``occ=True`` (COW only): optimistic concurrency (Hudi
        ``optimistic_concurrency_control`` analog). The expensive phase —
        reading the snapshot and writing new parquet — runs LOCK-FREE
        against a pinned manifest; the lock is taken only for the
        millisecond-scale publish. At publish time, if other writers
        committed in between, their per-commit file deltas are replayed:
        commits touching only OTHER partitions rebase cleanly (this
        writer's delta applies on top of theirs — both commits survive,
        which is the throughput win: N writers on disjoint partitions
        stream commits in parallel instead of serializing their write
        jobs); any intermediate commit touching one of this writer's
        partitions — or whose file deltas' PK RANGES overlap this
        writer's (two writers inserting the same new pk into DIFFERENT
        partitions are invisible to a partition-only check and would
        publish a duplicate key) — raises :class:`CommitConflictError`
        (orphaned files are cleaned up), and the caller retries against
        the fresh snapshot — the reference harness's retry loop
        (TransactionWriter.java:104-119 intent, defect D4 fixed).

        Liveness: a full-layout commit (cluster / a wide compaction)
        rewrites most files, so it conflicts with every concurrently
        pinned OCC writer. Conflicts whose racing commit is a
        CONTENT-PRESERVING layout action (``CommitConflictError.
        layout_op`` in ``_RETRYABLE_LAYOUT_OPS``: compact / cluster /
        vacuum) are therefore retried INTERNALLY against a fresh
        snapshot, and after ``_OCC_LAYOUT_RETRIES`` losses the writer
        escalates to one pessimistic attempt (lock held across the data
        write) — progress is guaranteed within a bounded number of
        attempts even under a tight layout-commit loop (the r5 fairness
        soak drives an unthrottled compact/cluster loop against 3 OCC
        writers with zero caller-visible failures). Data-data conflicts,
        restore, and schema/partition evolution races surface to the
        caller unchanged — that retry loop owns their semantics (a
        metadata race can invalidate the caller's input DataFrame;
        restore changes the content the caller computed against) — BUT a
        handle that keeps losing data races eventually serializes too:
        after ``_OCC_DATA_LOSS_ESCALATE`` consecutive caller-visible
        losses the next attempt runs pessimistically (a slow merge behind
        a sub-second upsert loop can otherwise lose every optimistic race
        — observed once in 1000 harness transactions), then the streak
        resets.

        Isolation level: snapshot isolation, like Hudi's file-level OCC.
        An op whose effect depends on row PRESENCE in the pinned snapshot
        and that leaves no file footprint for the missed key — a bare-key
        DELETE of a key inserted concurrently, a predicate DML whose
        phantom row lands in an untouched partition with a disjoint pk
        range — commits as computed against its snapshot rather than
        serializing behind the race. Footprint-complete ops (upsert,
        merge — both always write every source key) DO conflict and
        serialize via retry.

        ``occ=True`` (MOR): MOR DML appends never remove files, so
        concurrent appends NEVER hard-conflict — the only hazard is the
        resolution sequence number baked into the delta rows
        (``__seq = version+1`` against the pinned snapshot; rebasing
        as-is would tie with a concurrent append's seq and make
        latest-wins ambiguous). The rebase therefore REWRITES the freshly
        appended delta files' ``__seq`` column to the version actually
        granted at publish (a driver-side pyarrow column swap over
        batch-sized files — no Spark job, microseconds of work) and
        appends onto the winner's manifest. Every MOR writer streams
        commits with zero retries; this is the analog of Hudi granting the
        instant time under the timeline lock, done as fix-up instead of
        up-front. A MOR mutation that removes files (never a DML append)
        conflicts outright when raced.
        """

        def make(m: _Manifest) -> _Manifest:
            return _Manifest(
                m.version + 1, m.schema, m.pk, m.partition_col,
                m.precombine_col, mutate(m), m.mode, m.compact_every,
                dropped=m.dropped,
            )

        if not occ:
            return self._commit_with(make, timeout, op=op)

        # Layout-commit fairness: a compact/cluster commit rewrites most
        # files, so it conflicts with EVERY pinned OCC snapshot; under a
        # tight layout loop (routine background compaction at 100 TB) a
        # plain raise-to-caller policy starves data writers — each retry
        # re-pins, re-writes, and loses again. Conflicts tagged with a
        # CONTENT-PRESERVING layout op therefore retry internally against
        # a fresh snapshot (the recomputed mutate is semantically
        # identical — no row changed), and after _OCC_LAYOUT_RETRIES
        # losses the writer escalates to ONE pessimistic attempt — the
        # writer lock held across the data write, which no concurrent
        # commit can interrupt — so progress is guaranteed within a
        # bounded number of attempts. Data-data conflicts, restore, and
        # schema/partition evolution races still surface immediately:
        # the caller's retry loop owns those semantics (a metadata race
        # can invalidate the caller's input DataFrame; restore changes
        # the content the caller computed against).
        if self._occ_loss_streak >= _OCC_DATA_LOSS_ESCALATE:
            # this handle has lost _OCC_DATA_LOSS_ESCALATE consecutive
            # optimistic races (a slow txn behind a fast writer) — take
            # the lock across the whole attempt: guaranteed progress
            v = self._commit_with(make, timeout, op=op)
            self._occ_loss_streak = 0
            return v
        for _ in range(_OCC_LAYOUT_RETRIES):
            try:
                v = self._occ_publish(mutate, self._read_manifest(),
                                      timeout, op)
                self._occ_loss_streak = 0
                return v
            except CommitConflictError as e:
                if e.layout_op not in _RETRYABLE_LAYOUT_OPS:
                    if e.layout_op is None:
                        self._occ_loss_streak += 1
                    raise
        v = self._commit_with(make, timeout, op=op)
        self._occ_loss_streak = 0
        return v

    def _racing_layout_op(self, v_from: int, v_to: int) -> str | None:
        """The first non-data timeline action in commits (v_from, v_to],
        or None when every racing commit was plain DML. Used to classify
        conflicts whose raise site doesn't iterate the replay manifests;
        a missing intermediate manifest reads as 'vacuum' (only vacuum
        drops them)."""
        for v in range(v_from + 1, v_to + 1):
            try:
                mv = self._read_manifest(version=v)
            except (FileNotFoundError, OSError):
                return "vacuum"
            if mv.op and mv.op not in _DATA_OPS:
                return mv.op
        return None

    def _occ_publish(self, mutate, cur0: "_Manifest", timeout: float,
                     op: str | None) -> int:
        """One optimistic attempt against the pinned snapshot ``cur0``:
        run the lock-free data write, then take the lock, replay any
        intermediate commits (rebase or conflict), and publish. Raises
        :class:`CommitConflictError` — tagged with ``layout_op`` when
        the losing race was a layout commit — and cleans up orphans.
        ``_commit`` owns the retry/escalation policy around this."""
        files1 = mutate(cur0)  # lock-free: snapshot read + data write
        before = {f["file"]: f for f in cur0.files}
        after_names = {f["file"] for f in files1}
        removed = set(before) - after_names
        added = [f for f in files1 if f["file"] not in before]
        my_parts = {f["partition"] for f in added} | {
            before[fn]["partition"] for fn in removed
        }

        def orphan_cleanup() -> None:
            for f in added:  # best-effort: the files were never published
                try:
                    os.remove(os.path.join(self._data_dir, f["file"]))
                except OSError:
                    pass

        def meta_conflict(m: _Manifest, where: str) -> None:
            """Partition-value intersection can't see LAYOUT races: a raced
            repartition_table / schema change / mode flip invalidates the
            pinned snapshot even when partition VALUE sets are disjoint
            (our files are hive-encoded under the OLD partition column —
            appending them onto the new manifest would publish an
            unreadable mixed layout). Any such metadata delta conflicts
            outright."""
            if (
                m.partition_col != cur0.partition_col
                or m.schema != cur0.schema
                or m.mode != cur0.mode
            ):
                orphan_cleanup()
                raise CommitConflictError(
                    f"OCC conflict: {where} changed table metadata "
                    f"(partition_col/schema/mode) since snapshot "
                    f"v{cur0.version}",
                    layout_op=m.op or "metadata",
                )

        fd = self._acquire_lock(timeout)
        try:
            cur_n = self._read_manifest()
            if cur_n.version == cur0.version:
                files_out = files1
            elif cur_n.mode == "mor":
                meta_conflict(cur_n, f"commit v{cur_n.version}")
                if removed:
                    orphan_cleanup()
                    raise CommitConflictError(
                        "OCC conflict: raced MOR mutation removes files "
                        f"({len(removed)}) and cannot rebase",
                        layout_op=self._racing_layout_op(
                            cur0.version, cur_n.version
                        ),
                    )
                added = self._rebase_delta_seq(added, cur_n.version + 1)
                files_out = list(cur_n.files) + added
            else:
                meta_conflict(cur_n, f"commit v{cur_n.version}")
                prev = cur0
                # my footprint for the pk-overlap check: ADDED files only.
                # A duplicate key needs both sides to WRITE the same pk, so
                # added-vs-added overlap is the hazard; interactions with
                # the files I removed (the rows my rewrite read) are
                # already covered by the partition check — any raced write
                # to a key I read must touch that key's partition, which is
                # in my_parts. Including removed files' ranges here would
                # make every point DML in a wide-range base file conflict
                # unrelated inserts across the table.
                my_entries = list(added)
                for v in range(cur0.version + 1, cur_n.version + 1):
                    try:
                        mv = self._read_manifest(version=v)
                    except (FileNotFoundError, OSError):
                        # a concurrent vacuum with a small retain window can
                        # drop an intermediate manifest mid-replay; surface
                        # the documented retry signal, not a raw IO error
                        orphan_cleanup()
                        raise CommitConflictError(
                            f"OCC conflict: intermediate manifest v{v} was "
                            "vacuumed during replay",
                            layout_op="vacuum",
                        )
                    meta_conflict(mv, f"commit v{v}")
                    pf = {f["file"]: f for f in prev.files}
                    nf = {f["file"]: f for f in mv.files}
                    delta_entries = [
                        (pf.get(fn) or nf.get(fn)) for fn in set(pf) ^ set(nf)
                    ]
                    delta_parts = {e["partition"] for e in delta_entries}
                    if delta_parts & my_parts:
                        orphan_cleanup()
                        raise CommitConflictError(
                            f"OCC conflict: commit v{v} touched partitions "
                            f"{sorted(delta_parts & my_parts)}",
                            layout_op=(
                                mv.op
                                if mv.op and mv.op not in _DATA_OPS
                                else None
                            ),
                        )
                    # partition sets disjoint is NOT enough: two writers
                    # inserting the SAME new pk into DIFFERENT partitions
                    # would both survive a partition-only check and publish
                    # a duplicate key (pk uniqueness is the table's core
                    # invariant, ResultSet.java:26-34). Conflict whenever
                    # the raced delta's pk ranges can overlap mine; stats
                    # are per-file manifest metadata, so this is a few
                    # comparisons, and range-disjoint writers (the common
                    # partitioned-ingest case) still rebase lock-free.
                    hit = [
                        e["file"]
                        for e in delta_entries
                        if any(self._pk_overlap(e, g) for g in my_entries)
                    ]
                    if hit:
                        orphan_cleanup()
                        raise CommitConflictError(
                            f"OCC conflict: commit v{v} wrote pk ranges "
                            f"overlapping this commit's ({hit[:3]})",
                            layout_op=(
                                mv.op
                                if mv.op and mv.op not in _DATA_OPS
                                else None
                            ),
                        )
                    prev = mv
                files_out = [
                    f for f in cur_n.files if f["file"] not in removed
                ] + added
            nm = _Manifest(
                cur_n.version + 1, cur_n.schema, cur_n.pk,
                cur_n.partition_col, cur_n.precombine_col, files_out,
                cur_n.mode, cur_n.compact_every, op=op,
                dropped=cur_n.dropped,
            )
            self._write_manifest_and_swap(nm, prev=cur_n)
            return nm.version
        finally:
            self._release_lock(fd)

    def _rebase_delta_seq(self, entries: list[dict], new_seq: int) -> list[dict]:
        """OCC seq fix-up for MOR rebases: rewrite each appended file's
        ``__seq`` column (and manifest tag) to the publish-time version.
        Driver-side pyarrow column swap — delta files are batch-sized, so
        this is microseconds and needs no Spark job. On any failure the
        caller's files are orphaned and a CommitConflictError sends the
        writer down the ordinary retry path (no partial state: the new
        manifest is not yet written)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        try:
            out = []
            for e in entries:
                if e.get("seq") is None:
                    out.append(e)
                    continue
                src = os.path.join(self._data_dir, e["file"])
                t = pq.read_table(src)
                idx = t.schema.get_field_index("__seq")
                t = t.set_column(
                    idx,
                    t.schema.field(idx),
                    pa.array([new_seq] * t.num_rows, type=pa.int64()),
                )
                dirn, base = os.path.split(e["file"])
                new_rel = os.path.join(dirn, f"r{new_seq}-{base}")
                pq.write_table(t, os.path.join(self._data_dir, new_rel))
                os.remove(src)
                ne = dict(e)
                ne["file"] = new_rel
                ne["seq"] = new_seq
                out.append(ne)
            return out
        except Exception as exc:  # pragma: no cover - defensive
            for e in entries:
                try:
                    os.remove(os.path.join(self._data_dir, e["file"]))
                except OSError:
                    pass
            raise CommitConflictError(f"OCC seq rebase failed: {exc!r}")

    def _commit_dml(self, mutate, timeout: float, op: str | None = None) -> int:
        """Commit a DML mutation, then fire inline compaction when the table
        asks for it (mor + compact_every). Compaction is its own commit; if
        another writer holds the lock, skip — a later trigger will fold."""
        v = self._commit(mutate, timeout, occ=self.occ, op=op)
        m = self._read_manifest()
        if m.mode == "mor" and m.compact_every and v % m.compact_every == 0:
            try:
                self.compact(timeout=timeout)
            except CommitConflictError:
                pass
        return v

    # ------------------------------------------------------------------ DML

    def _precombine(self, df: DataFrame, m: _Manifest) -> DataFrame:
        """Keep one row per pk within a batch — greatest precombine value wins
        (Hudi precombine semantics, TransactionWriter.java:136)."""
        order = (
            F.col(m.precombine_col).desc() if m.precombine_col else F.lit(1)
        )
        w = Window.partitionBy(m.pk).orderBy(order)
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

    def _partition_scoped_rewrite(
        self,
        m: _Manifest,
        changed,
        rewrite,
        scope_keys: DataFrame | None = None,
        scope_key_list: list | None = None,
    ) -> list[dict]:
        """COW scoped by partition, then by file: only files whose partition
        value appears in ``changed`` — and, when ``scope_keys`` is given,
        whose manifest pk range can overlap the incoming keys — are
        rewritten; all other live files carry over untouched.

        ``changed`` is either a DataFrame carrying the partition column (one
        distinct+collect job discovers the affected set) or an iterable of
        partition values the caller already knows — the fast path for small
        DML batches built driver-side, where an extra Spark job would
        dominate the commit latency.

        ``scope_keys`` is a DataFrame carrying the pk column of every key
        this DML can match. File-level pruning (Hudi's file-slice tagging
        against column_stats) is what keeps a point update from rewriting a
        whole 100 TB partition: one tiny min/max job on the keys, then any
        file whose [pk_min, pk_max] is disjoint carries over. UTF-8 byte
        order (parquet stats) equals code-point order (Python str), so the
        driver-side compare is exact. The stats job is skipped when every
        affected partition holds at most one file — then it can prune
        nothing (single-file partitions must rewrite regardless), so small
        fresh tables pay zero extra latency.

        ``scope_key_list`` is the same key set as a driver-side Python list
        when the caller already has one (DELETE with an IN-list): then each
        range-overlapping file is additionally probed against its manifest
        pk bloom — zero Spark jobs — and carries over untouched when every
        key misses. Blooms never false-negative, so this only ever shrinks
        the rewrite set; a false positive merely rewrites one extra file.

        ``rewrite(old_rows_df) -> new_rows_df`` receives the current rows of
        the files being rewritten only.
        """
        if isinstance(changed, DataFrame):
            affected = {
                str(r[0])
                for r in changed.select(m.partition_col).distinct().collect()
            }
        else:
            affected = {str(p) for p in changed}
        keep = [f for f in m.files if f["partition"] not in affected]
        touch = [f for f in m.files if f["partition"] in affected]
        multi_file = len({f["partition"] for f in touch}) < len(touch)
        if scope_key_list and multi_file:
            def bloom_free(f: dict) -> bool:
                bloom = f.get("pk_bloom")
                return bloom is not None and not any(
                    self._bloom_contains(bloom, k) for k in scope_key_list
                )

            keep.extend(f for f in touch if bloom_free(f))
            touch = [f for f in touch if not bloom_free(f)]
        if scope_keys is not None and multi_file:
            lo, hi = scope_keys.agg(
                F.min(m.pk), F.max(m.pk)
            ).first()
            if lo is not None:
                def disjoint(f: dict) -> bool:
                    try:
                        return (
                            "pk_min" in f
                            and "pk_max" in f
                            and (f["pk_max"] < lo or f["pk_min"] > hi)
                        )
                    except TypeError:
                        # incomparable stat/key types (e.g. bytes stats vs a
                        # non-str pk): keep the file conservatively, same
                        # stance as lookup()'s may_contain()
                        return False

                keep.extend(f for f in touch if disjoint(f))
                touch = [f for f in touch if not disjoint(f)]
        if touch:
            old = self._scan_files(m, touch).select(*m.schema.names)
        else:
            old = self.spark.createDataFrame([], m.schema)
        new_rows = rewrite(old)
        new_entries = self._write_data(new_rows.select(*m.schema.names), m)
        return keep + new_entries

    def _matched_partitions(self, m: _Manifest, keys: DataFrame) -> DataFrame:
        """Partitions currently holding any row whose pk appears in
        ``keys`` — the discovery read behind cross-partition DML, pruned
        by the manifest pk [min, max] index: one tiny agg on the keys,
        then only range-overlapping files are scanned, so a point DML on
        a key-clustered 100 TB table reads O(1) files instead of the
        snapshot. Files without pk stats are kept conservatively, and
        every file holding a probed key's row overlaps the key range by
        construction, so the candidate set is exact for those keys."""
        klo, khi = keys.agg(F.min(m.pk), F.max(m.pk)).first()
        if klo is None:  # empty batch: nothing can match
            return self.spark.createDataFrame(
                [], T.StructType([m.schema[m.partition_col]])
            )
        cand = [
            f for f in m.files if self._may_overlap(f, m.pk, klo, khi, m.pk)
        ]
        live = (
            self._resolve(m, cand)
            if m.mode == "mor"
            else self._df_for_files(m, cand)
        )
        return live.join(keys.select(m.pk), m.pk, "left_semi").select(
            m.partition_col
        )

    def upsert(
        self, df: DataFrame, timeout: float = 60.0,
        partitions: list[str] | None = None,
    ) -> int:
        """Atomic multi-row upsert (INSERT path, TransactionWriter.java:121-141):
        incoming rows replace same-pk rows, new pks are appended.

        A matched row whose CURRENT partition differs from the incoming
        row's moves partitions: the rewrite must cover the union of the
        source partitions and the matched rows' current partitions, else
        the old row survives as a duplicate key (caught by the model-based
        lifecycle test, seed 303). ``partitions`` optionally declares that
        partition = f(pk) for this batch — the partition values present in
        ``df`` AND the only partitions any matched row can live in (true
        for the reference harness workload) — which skips the semi-join
        discovery read."""

        def mutate(m: _Manifest) -> list[dict]:
            incoming = self._precombine(df.select(*m.schema.names), m)
            if m.mode == "mor":
                # append-only delta: no read, no rewrite — the whole point
                return m.files + self._write_delta(
                    incoming, m, op="upsert", seq=m.version + 1, kind="delta"
                )
            incoming.cache()
            try:
                if partitions is not None:
                    changed = partitions
                else:
                    changed = incoming.select(m.partition_col).unionByName(
                        self._matched_partitions(m, incoming)
                    )
                return self._partition_scoped_rewrite(
                    m,
                    changed,
                    lambda old: old.join(
                        incoming.select(m.pk), m.pk, "left_anti"
                    ).unionByName(incoming),
                    scope_keys=incoming,
                )
            finally:
                incoming.unpersist()

        return self._commit_dml(mutate, timeout, op="upsert")

    def merge(
        self,
        source: DataFrame,
        update_cols: list[str] | None = None,
        timeout: float = 60.0,
        partition_from_key: bool = False,
        partitions: list[str] | None = None,
    ) -> int:
        """MERGE INTO rewrite (TransactionWriter.java:143-166): WHEN MATCHED
        update only ``update_cols`` (reference updates only dataValue), WHEN
        NOT MATCHED insert the full source row.

        Matched rows keep their target partition value (the reference's
        matched branch never moves a row across partitions), so the rewrite
        must touch both source partitions (inserts) and the partitions of
        matched target rows — by default we resolve the union of the two with
        a semi-join against the pk-range-pruned live files
        (:meth:`_matched_partitions`).

        ``partition_from_key=True`` declares that the partition value is a
        pure function of the primary key (true for the harness workload,
        TransactionGenerator.java:75-78) — matched rows then necessarily
        live in the source's partitions, and the semi-join read is skipped
        entirely: one fewer read job per commit.
        """

        def mutate(m: _Manifest) -> list[dict]:
            upd = update_cols if update_cols is not None else [
                c for c in m.schema.names if c not in (m.pk, m.partition_col)
            ]
            # mode-independent: a matched MERGE row never changes identity
            # or moves partitions (reference semantics) — reject on COW too,
            # not only on the MOR partial-payload path, so the two table
            # types present one contract
            if m.pk in upd or m.partition_col in upd:
                raise ValueError(
                    "update_cols may not include the primary key or "
                    "partition column"
                )
            if m.mode == "mor":
                full = {
                    c for c in m.schema.names if c not in (m.pk, m.partition_col)
                }
                src = self._precombine(source.select(*m.schema.names), m)
                if set(upd) == full and (
                    partition_from_key or partitions is not None
                ):
                    # complete rows AND partition = f(pk) declared by the
                    # caller (explicitly, or implicitly via a caller-supplied
                    # partition set): latest-wins replacement is exact —
                    # plain delta upsert, no payload marker needed. Without
                    # that declaration the shortcut would be WRONG: a matched
                    # row must KEEP its target partition, but a plain upsert
                    # delta carries the SOURCE partition (caught by the
                    # model-based lifecycle test, seed 101).
                    return m.files + self._write_delta(
                        src, m, op="upsert", seq=m.version + 1, kind="delta"
                    )
                # partial-column payload (Hudi PartialUpdateAvroPayload
                # analog): append the full source row tagged with the
                # update-column list; read-time resolution overrides only
                # those columns on matched keys and uses the whole carried
                # row for the WHEN NOT MATCHED insert branch. Still a pure
                # append — one write job, no read of existing data.
                return m.files + self._write_delta(
                    src, m, op="partial", seq=m.version + 1, kind="delta",
                    cols=sorted(upd),
                )
            src = self._precombine(source.select(*m.schema.names), m)
            src.cache()
            try:
                if partitions is not None:
                    # caller-supplied partition set (implies partition=f(pk)):
                    # zero discovery jobs
                    changed = partitions
                elif partition_from_key:
                    changed = src.select(m.partition_col)
                else:
                    changed = src.select(m.partition_col).unionByName(
                        self._matched_partitions(m, src)
                    )

                def rewrite(old: DataFrame) -> DataFrame:
                    s = src.select(
                        F.col(m.pk).alias("__s_pk"),
                        *[F.col(c).alias(f"__s_{c}") for c in m.schema.names if c != m.pk],
                    )
                    joined = old.join(s, old[m.pk] == s["__s_pk"], "full_outer")
                    # branch on MATCH (pk presence), never on value-nullness:
                    # coalesce() here would silently flip two cases — a
                    # matched UPDATE SET col = NULL must null the column
                    # (SQL MERGE semantics, and what the MOR partial-payload
                    # resolution does), and a matched row's NULL in a
                    # NON-updated column must stay NULL, not take the
                    # source's value
                    cols = []
                    for c in m.schema.names:
                        if c == m.pk:
                            cols.append(F.coalesce(old[m.pk], s["__s_pk"]).alias(c))
                        elif c in upd:
                            # matched or insert: source value as given;
                            # old-only rows keep theirs
                            cols.append(
                                F.when(s["__s_pk"].isNotNull(), s[f"__s_{c}"])
                                .otherwise(old[c])
                                .alias(c)
                            )
                        else:
                            # non-updated col: target value wherever a
                            # target row exists; source only for the
                            # WHEN NOT MATCHED insert branch
                            cols.append(
                                F.when(old[m.pk].isNotNull(), old[c])
                                .otherwise(s[f"__s_{c}"])
                                .alias(c)
                            )
                    return joined.select(*cols)

                return self._partition_scoped_rewrite(
                    m, changed, rewrite, scope_keys=src
                )
            finally:
                src.unpersist()

        return self._commit_dml(mutate, timeout, op="merge")

    def delete(self, keys, timeout: float = 60.0, partitions: list[str] | None = None) -> int:
        """DELETE WHERE pk IN (...) with the intended semantics
        (TransactionWriter.java:168-178, defect D2 fixed): left-anti join.

        ``partitions`` optionally names the partitions containing the keys
        (derivable when partition = f(pk)); when given, the semi-join scan
        that locates affected partitions is skipped.

        ``keys`` may be bare pk values, (pk, partition) pairs, or a
        DataFrame whose first column is the pk (optionally also carrying the
        partition column). On a MOR table the delete appends tombstone rows
        — (pk, partition) pairs are required to place the tombstone in the
        key's partition; bare keys derive them with one semi-join read (no
        rewrite either way).
        """

        def tombstone_pairs(m: _Manifest) -> DataFrame:
            pair_schema = T.StructType(
                [m.schema[m.pk], m.schema[m.partition_col]]
            )
            if isinstance(keys, DataFrame):
                if m.partition_col in keys.columns:
                    return keys.select(m.pk, m.partition_col)
                kdf = keys.select(F.col(keys.columns[0]).alias(m.pk))
            elif keys and isinstance(keys[0], (tuple, list)):
                return self.spark.createDataFrame(list(keys), pair_schema)
            else:
                kdf = self.spark.createDataFrame(
                    [(k,) for k in keys], T.StructType([m.schema[m.pk]])
                )
            snap = self._df_for(m)
            return snap.join(F.broadcast(kdf), m.pk, "left_semi").select(
                m.pk, m.partition_col
            )

        def mutate(m: _Manifest) -> list[dict]:
            if m.mode == "mor":
                pairs = tombstone_pairs(m).dropDuplicates([m.pk])
                tomb = pairs.select(
                    *[
                        F.col(c)
                        if c in (m.pk, m.partition_col)
                        else F.lit(None).cast(m.schema[c].dataType).alias(c)
                        for c in m.schema.names
                    ]
                )
                return m.files + self._write_delta(
                    tomb, m, op="delete", seq=m.version + 1, kind="delta"
                )
            if isinstance(keys, DataFrame):
                kdf = keys.select(F.col(keys.columns[0]).alias(m.pk))
            elif keys and isinstance(keys[0], (tuple, list)):
                kdf = self.spark.createDataFrame(
                    [(k[0],) for k in keys], T.StructType([m.schema[m.pk]])
                )
            else:
                kdf = self.spark.createDataFrame(
                    [(k,) for k in keys], T.StructType([m.schema[m.pk]])
                )
            kdf.cache()
            try:
                if partitions is not None:
                    changed = partitions
                else:
                    live = self._df_for(m)
                    changed = live.join(kdf, m.pk, "left_semi").select(m.partition_col)
                key_list = None
                if not isinstance(keys, DataFrame):
                    key_list = [
                        k[0] if isinstance(k, (tuple, list)) else k
                        for k in keys
                    ]
                return self._partition_scoped_rewrite(
                    m,
                    changed,
                    lambda old: old.join(F.broadcast(kdf), m.pk, "left_anti"),
                    scope_keys=kdf,
                    scope_key_list=key_list,
                )
            finally:
                kdf.unpersist()

        return self._commit_dml(mutate, timeout, op="delete")

    def delete_where(
        self, col: str, lo=None, hi=None, timeout: float = 60.0
    ) -> int:
        """Predicate DELETE over a range of any stats-indexed column — the
        Delta/Hudi ``DELETE FROM t WHERE col BETWEEN lo AND hi`` analog;
        TTL retention is ``delete_where(ts_col, hi=cutoff)``.

        COW classifies every live file against the manifest's column-stats
        index into three classes:
        - DISJOINT from the range → carries over untouched (never read);
        - ENTIRELY INSIDE the range → dropped from the manifest without
          being read (parquet footer min/max are exact, so every row
          matches) — on a time-clustered table, retention is a
          METADATA-ONLY commit, the same reason warehouses drop whole
          partitions for TTL;
        - straddling (or stats-less) → rewritten with the residual
          ``NOT (lo <= col <= hi)`` filter.

        MOR appends tombstones for the matching keys (stats-pruned
        partition-resolved scan finds them; no base-file rewrite), the
        same no-rewrite discipline as :meth:`delete`.
        """

        def fully_inside(f: dict, pk: str) -> bool:
            if col == pk:
                rng = [f.get("pk_min"), f.get("pk_max")]
            else:
                rng = (f.get("stats") or {}).get(col) or [None, None]
            flo, fhi = rng
            if flo is None or fhi is None:
                return False  # no stats: never drop blind
            try:
                return (lo is None or flo >= lo) and (
                    hi is None or fhi <= hi
                )
            except TypeError:
                return False

        def pred():
            p = F.lit(True)
            if lo is not None:
                p = p & (F.col(col) >= F.lit(lo))
            if hi is not None:
                p = p & (F.col(col) <= F.lit(hi))
            return p

        def mutate(m: _Manifest) -> list[dict]:
            if m.mode == "mor":
                # stats prune at partition granularity (scan_range rule),
                # then resolve and tombstone the matching keys; pk-closure
                # because a partition-SUBSET resolve can yield stale values
                # for keys whose newer rows live in other partitions — the
                # range test would then select keys from history, not state
                cand = [
                    f for f in m.files
                    if self._may_overlap(f, col, lo, hi, m.pk)
                ]
                parts = self._pk_closed_partitions(
                    m, {f["partition"] for f in cand}
                )
                live = self._resolve(
                    m, [f for f in m.files if f["partition"] in parts]
                )
                pairs = (
                    live.filter(pred())
                    .select(m.pk, m.partition_col)
                    .dropDuplicates([m.pk])
                )
                tomb = pairs.select(
                    *[
                        F.col(c)
                        if c in (m.pk, m.partition_col)
                        else F.lit(None).cast(m.schema[c].dataType).alias(c)
                        for c in m.schema.names
                    ]
                )
                return m.files + self._write_delta(
                    tomb, m, op="delete", seq=m.version + 1, kind="delta"
                )
            keep, drop, straddle = [], [], []
            for f in m.files:
                if not self._may_overlap(f, col, lo, hi, m.pk):
                    keep.append(f)
                elif fully_inside(f, m.pk):
                    drop.append(f)
                else:
                    straddle.append(f)
            if not straddle:
                return keep  # metadata-only commit (drop + carry-over)
            survivors = self._scan_files(m, straddle).select(
                *m.schema.names
            ).filter(~pred())
            return keep + self._write_data(survivors, m)

        return self._commit_dml(mutate, timeout, op="delete")

    def update_where(
        self, col: str, set: dict, lo=None, hi=None, timeout: float = 60.0
    ) -> int:
        """Predicate UPDATE — ``UPDATE t SET ... WHERE lo <= col <= hi``
        (the Delta/Hudi SQL UPDATE analog, completing the predicate-DML
        triad with :meth:`delete_where`). ``set`` maps column name →
        Column expression (or literal), evaluated against the matching
        row; pk / partition / precombine columns are protected.

        COW: files DISJOINT from the range (column-stats index) carry
        over unread; every overlapping file rewrites with the SET applied
        to matching rows only. MOR: the stats-pruned resolved matching
        rows are re-emitted with the SET applied as an appended delta
        (newest-seq wins on read) — no base rewrite, the same no-rewrite
        discipline as MOR upsert.
        """
        m0 = self._read_manifest()
        protected = {m0.pk, m0.partition_col}
        if m0.precombine_col:
            protected.add(m0.precombine_col)
        bad = protected & set.keys()
        if bad:
            raise ValueError(f"update_where may not set {sorted(bad)}")

        def pred():
            p = F.lit(True)
            if lo is not None:
                p = p & (F.col(col) >= F.lit(lo))
            if hi is not None:
                p = p & (F.col(col) <= F.lit(hi))
            return p

        def apply_set(df: DataFrame, m: _Manifest, only_matching: bool):
            cond = pred()
            out = df
            for c, expr in set.items():
                val = expr if isinstance(expr, F.Column) else F.lit(expr)
                val = val.cast(m.schema[c].dataType)
                if only_matching:
                    out = out.withColumn(
                        c, F.when(cond, val).otherwise(F.col(c))
                    )
                else:
                    out = out.withColumn(c, val)
            return out.select(*m.schema.names)

        def mutate(m: _Manifest) -> list[dict]:
            if m.mode == "mor":
                cand = [
                    f for f in m.files
                    if self._may_overlap(f, col, lo, hi, m.pk)
                ]
                # pk-closure: resolving a partition SUBSET can yield stale
                # values for keys whose newer rows (full deltas, partial
                # payloads, tombstones) live in other partitions — the
                # predicate would then match against history, not state
                parts = self._pk_closed_partitions(
                    m, {f["partition"] for f in cand}
                )
                live = self._resolve(
                    m, [f for f in m.files if f["partition"] in parts]
                )
                changed = apply_set(live.filter(pred()), m, False)
                # written as op="upsert": these are COMPLETE resolved rows
                # acting as new bases — the partial-payload resolution
                # path only recognizes upsert/partial/delete markers
                return m.files + self._write_delta(
                    changed, m, op="upsert", seq=m.version + 1, kind="delta"
                )
            keep = [
                f for f in m.files
                if not self._may_overlap(f, col, lo, hi, m.pk)
            ]
            touch = [f for f in m.files if f not in keep]
            if not touch:
                return keep
            old = self._scan_files(m, touch).select(*m.schema.names)
            return keep + self._write_data(apply_set(old, m, True), m)

        return self._commit_dml(mutate, timeout, op="update")

    # ------------------------------------------------- incremental / timeline

    def current_version(self) -> int:
        """Version the ``_latest`` pointer resolves to right now — the pin
        a partition-scoped reader uses to compare PRUNED vs FULL resolution
        of the *same* snapshot while writers keep committing (harness
        ``partition_scoped_reads`` mode; VERDICT r6 directive #7)."""
        with open(self._latest_ptr) as f:
            name = f.read().strip()
        return int(name[1:-5])

    def history(self) -> list[dict]:
        """Commit timeline (Hudi `.hoodie` timeline analog): one entry per
        retained manifest version with its live-file count per partition."""
        out = []
        for name in sorted(os.listdir(self._manifest_dir)):
            if not (name.startswith("v") and name.endswith(".json")):
                continue
            # resolve through the delta chain — a raw parse would see only
            # a delta's added files
            m = self._read_manifest(version=int(name[1:-5]))
            parts: dict[str, int] = {}
            for e in m.files:
                parts[e["partition"]] = parts.get(e["partition"], 0) + 1
            out.append(
                {
                    "version": m.version,
                    "op": m.op,
                    "n_files": len(m.files),
                    "partitions": parts,
                }
            )
        return out

    def _diff_rows(
        self, mb: _Manifest, me: _Manifest
    ) -> tuple[DataFrame, DataFrame]:
        """(old_rows, new_rows) for the version window ``(mb, me]`` — the
        shared file-pruned core of the incremental/CDC surface.

        Only files ADDED since ``mb`` (candidate post-images) and files
        REMOVED since ``mb`` (prior images) are read; untouched partitions
        never scan. Under MOR the same file diff selects the touched
        partitions, CLOSED under pk-range overlap across both manifests,
        and both snapshots are resolved restricted to them. A raw
        file-level diff would re-emit every superseded version a delta
        file shadows — and an UNCLOSED partition subset would misreport a
        cross-partition move: the new delta's partition is in the set but
        the shadowed base's is not, so the before-image goes missing (an
        update surfaces as an insert; a move-then-delete loses the
        deleted key). Closing over the UNION of both versions' files is
        conservative-correct: extra partitions resolve identically on
        both sides and cancel downstream.
        """
        before = {f["file"] for f in mb.files}
        after = {f["file"] for f in me.files}
        added = [f for f in me.files if f["file"] not in before]
        removed = [f for f in mb.files if f["file"] not in after]
        if me.mode == "mor":
            parts = self._pk_closed_partitions(
                types.SimpleNamespace(files=mb.files + me.files),
                {f["partition"] for f in added}
                | {f["partition"] for f in removed},
            )
            return (
                self._resolve(
                    mb, [f for f in mb.files if f["partition"] in parts]
                ),
                self._resolve(
                    me, [f for f in me.files if f["partition"] in parts]
                ),
            )
        return self._df_for_files(mb, removed), self._df_for_files(me, added)

    def read_incremental(
        self, begin_version: int, end_version: int | None = None
    ) -> DataFrame:
        """Post-image rows changed in ``(begin_version, end_version]`` —
        Hudi's incremental query (`hoodie.datasource.query.type=incremental`).

        A rewritten partition carries its unchanged rows into new files, so
        the added-file rows are anti-joined (full-row ``exceptAll``) against
        the removed-file rows to keep only genuine inserts/updates. Deletes
        are exposed by :meth:`deleted_keys`; full before/after images by
        :meth:`changes`.
        """
        mb = self._read_manifest(begin_version)
        me = self._read_manifest(end_version)
        old_rows, new_rows = self._diff_rows(mb, me)
        return new_rows.exceptAll(old_rows)

    def deleted_keys(
        self, begin_version: int, end_version: int | None = None
    ) -> DataFrame:
        """Primary keys removed in ``(begin_version, end_version]`` — the
        delete half of the incremental changefeed (same file pruning)."""
        mb = self._read_manifest(begin_version)
        me = self._read_manifest(end_version)
        old_rows, new_rows = self._diff_rows(mb, me)
        new_keys = new_rows.select(me.pk)
        old_keys = old_rows.select(mb.pk)
        return old_keys.join(new_keys, mb.pk, "left_anti").distinct()

    def changes(
        self, begin_version: int, end_version: int | None = None
    ) -> DataFrame:
        """Row-level CDC over ``(begin_version, end_version]``: one row per
        changed key with ``_change_op`` ∈ {insert, update, delete} and full
        ``before`` / ``after`` images as structs — Hudi 0.14's CDC query
        shape (`hoodie.datasource.query.incremental.format=cdc`, which the
        reference's Hudi version exposes but the harness never calls).

        Derivation: keyed full-outer join of the file-pruned prior images
        against the post-images; a key only in the new side is an insert,
        only in the old side a delete, in both with any differing column an
        update. Carried rows (rewritten partitions re-emit unchanged rows)
        cancel via null-safe struct equality. Columns added by schema
        evolution inside the window read as NULL in the before image.

        Scale notes: one shuffle on pk over only the touched partitions'
        rows (same pruning as :meth:`read_incremental`); snapshot PK
        uniqueness bounds each side at one row per key, so the join never
        multiplies.
        """
        mb = self._read_manifest(begin_version)
        me = self._read_manifest(end_version)
        old_rows, new_rows = self._diff_rows(mb, me)
        data_cols = [c for c in me.schema.names if c != me.pk]

        def image(df: DataFrame, alias: str):
            cols = [
                F.col(c)
                if c in df.columns
                else F.lit(None).cast(me.schema[c].dataType).alias(c)
                for c in data_cols
            ]
            return F.struct(*cols).alias(alias)

        o = old_rows.select(F.col(mb.pk).alias("__pk_b"), image(old_rows, "before"))
        n = new_rows.select(F.col(me.pk).alias("__pk_a"), image(new_rows, "after"))
        j = o.join(n, o["__pk_b"] == n["__pk_a"], "full_outer")
        return j.filter(~F.col("before").eqNullSafe(F.col("after"))).select(
            F.coalesce("__pk_b", "__pk_a").alias(me.pk),
            F.when(F.col("__pk_b").isNull(), F.lit("insert"))
            .when(F.col("__pk_a").isNull(), F.lit("delete"))
            .otherwise(F.lit("update"))
            .alias("_change_op"),
            "before",
            "after",
        )

    def restore(self, version: int, timeout: float = 60.0) -> int:
        """Roll the table back to ``version`` as a NEW commit (Hudi
        savepoint + restore analog): publishes the next manifest carrying
        the target version's schema and file list verbatim.

        Because data files are immutable and the restore is itself a
        commit, history is preserved — time travel to the undone versions
        still works until :meth:`vacuum` reclaims them, and the changefeed
        across the restore shows the inverse of the undone changes (what a
        downstream incremental consumer needs to heal). Fails fast if the
        target manifest was already vacuumed.
        """
        def make(cur: _Manifest) -> _Manifest:
            target = self._read_manifest(version)
            # drop-history hint: union of both horizons (names dropped on
            # either side may linger in the reinstated files); unknown on
            # either side stays unknown (conservative footer sweep)
            dropped = None
            if cur.dropped is not None and target.dropped is not None:
                dropped = sorted(set(cur.dropped) | set(target.dropped))
            return _Manifest(
                cur.version + 1, target.schema, target.pk,
                target.partition_col, target.precombine_col, target.files,
                target.mode, target.compact_every, dropped=dropped,
            )

        return self._commit_with(make, timeout, op="restore")

    def evolve_schema(
        self,
        add: dict[str, T.DataType] | None = None,
        drop: list[str] | None = None,
        timeout: float = 60.0,
    ) -> int:
        """ADD/DROP column schema evolution as ONE metadata-only commit
        (Hudi/Delta ``ALTER TABLE ADD COLUMNS`` / ``DROP COLUMN`` analog):
        the new manifest carries the evolved schema over the UNCHANGED
        file list — zero data rewritten, because the reader is already
        schema-on-read: :meth:`_scan_files` reads every file through the
        manifest schema, and parquet read-by-name null-fills columns a
        file predates and ignores columns the schema no longer carries
        (the same mechanism MOR partial-update payloads rely on).

        Guards: added names must be new (and not the reserved MOR marker
        columns); dropped names must exist and may not be the pk,
        partition, or precombine column. Added columns are nullable by
        construction — every pre-existing row reads NULL for them; to
        keep that true under name-based column binding, RE-adding a
        previously dropped name is rejected while any live file still
        physically carries it (verified against the files' parquet
        footers, with the manifest's drop-history list as the fast path
        — :meth:`_guard_readd`) — rewrite the files or pick a new name.

        Concurrency: the commit runs under the writer lock, and a raced
        OCC writer detects the schema change in its rebase check
        (``m.schema != cur0.schema``) and raises CommitConflictError —
        so no writer ever publishes files shaped against a stale schema.
        Time travel keeps working: older manifests pin their own schema,
        so reads at a pre-evolution version return the old shape.
        """
        add = dict(add or {})
        drop = list(drop or [])
        if not add and not drop:
            raise ValueError("evolve_schema: nothing to add or drop")

        def make(m: _Manifest) -> _Manifest:
            names = set(m.schema.names)
            protected = {m.pk, m.partition_col, m.precombine_col}
            reserved = {"__op", "__seq", "__cols"}
            for c in add:
                if c in names:
                    raise ValueError(f"column {c!r} already exists")
                if c in reserved:
                    raise ValueError(f"column name {c!r} is reserved")
                self._guard_readd(m, c)
            for c in drop:
                if c not in names:
                    raise ValueError(f"cannot drop unknown column {c!r}")
                if c in protected:
                    raise ValueError(
                        f"cannot drop {c!r}: pk/partition/precombine column"
                    )
            fields = [f for f in m.schema.fields if f.name not in set(drop)]
            for c, dt in add.items():
                if isinstance(dt, str):
                    dt = T._parse_datatype_string(dt)
                fields.append(T.StructField(c, dt, True))
            # maintain the drop-history hint: dropped names join it, and a
            # successfully re-added name (footer sweep passed: no live
            # file carries it) leaves it. Unknown history stays unknown.
            new_dropped = m.dropped
            if new_dropped is not None:
                new_dropped = [c for c in new_dropped if c not in add]
                new_dropped += [c for c in drop if c not in new_dropped]
            return _Manifest(
                m.version + 1, T.StructType(fields), m.pk, m.partition_col,
                m.precombine_col, m.files, m.mode, m.compact_every,
                dropped=new_dropped,
            )

        return self._commit_with(make, timeout, op="evolve_schema")

    def _df_for_files(self, m: _Manifest, files: list[dict]) -> DataFrame:
        if not files:
            return self.spark.createDataFrame([], m.schema)
        return self._scan_files(m, files).select(*m.schema.names)

    # ------------------------------------------------------------ maintenance

    def clone_to(self, dest_path: str, version: int | None = None) -> "AcidTable":
        """Zero-copy SHALLOW CLONE (Delta `CREATE TABLE ... SHALLOW CLONE`
        analog): create a new table at ``dest_path`` whose v0 manifest
        references the SOURCE's data files in place — no bytes move,
        cloning a petabyte costs one manifest write. The clone is then a
        fully independent table: its DML commits write files under its own
        path (a COW rewrite or MOR delta diverges only the touched
        partitions — untouched data keeps reading from the source root),
        and ``compact()`` fully materializes it if divergence should
        become physical.

        Pinning: the clone references the source at ``version`` (default:
        latest). The source must RETAIN that data — a source ``vacuum()``
        that drops files the clone still references breaks the clone, the
        same contract Delta documents for shallow clones. The clone's own
        vacuum never touches foreign roots.
        """
        m = self._read_manifest(version)
        t = AcidTable(self.spark, dest_path, occ=self.occ)
        if os.path.exists(t._latest_ptr):
            raise FileExistsError(f"AcidTable already exists at {dest_path}")
        os.makedirs(t._manifest_dir, exist_ok=True)
        os.makedirs(t._data_dir, exist_ok=True)
        open(t._lock_path, "a").close()
        files = [
            {**f, "root": f.get("root", self._data_dir)} for f in m.files
        ]
        # The clone's manifest starts at the SOURCE's version, not 0: MOR
        # resolution orders rows by the __seq baked into the (referenced)
        # source deltas, so the clone's own commits must number PAST the
        # source horizon or a cloned row would outrank a newer local
        # tombstone/update.
        t._write_manifest_and_swap(
            _Manifest(
                m.version, m.schema, m.pk, m.partition_col,
                m.precombine_col, files, m.mode, m.compact_every, op="clone",
                dropped=m.dropped,
            )
        )
        return t

    def repartition_table(
        self, new_partition_col: str, timeout: float = 60.0
    ) -> int:
        """Partition evolution as ONE atomic commit: rewrite every live row
        hive-partitioned on ``new_partition_col`` and publish a manifest
        whose partition column is the new one. The Iceberg-style outcome —
        change how the table partitions without downtime or a side copy —
        delivered as a rewrite commit, which is the only honest form when
        partition values are directory-encoded (Hudi cannot do this at all;
        Iceberg keeps both layouts live because its manifests carry
        per-file partition tuples — ours do too, so readers of RETAINED
        older manifests keep resolving the old layout untouched).

        MOR tables resolve first (deltas and tombstones are keyed to the
        old partitions), so the new layout starts from fresh base files.
        The changefeed stays clean: live rows are rewritten verbatim, so
        read_incremental's exceptAll cancels them out.
        """

        def make(m: _Manifest) -> _Manifest:
            if new_partition_col not in m.schema.names:
                raise ValueError(
                    f"{new_partition_col!r} is not a schema column"
                )
            if new_partition_col == m.partition_col:
                raise ValueError(
                    f"table is already partitioned by {new_partition_col!r}"
                )
            layout = _Manifest(
                m.version + 1, m.schema, m.pk, new_partition_col,
                m.precombine_col, [], m.mode, m.compact_every,
            )  # write-target: only partition_col/schema/pk are read
            rows = self._df_for(m).select(*m.schema.names)
            if m.mode == "mor":
                files = self._write_delta(
                    rows, layout, op="upsert", seq=m.version + 1, kind="base"
                )
            else:
                files = self._write_data(rows, layout)
            return _Manifest(
                m.version + 1, m.schema, m.pk, new_partition_col,
                m.precombine_col, files, m.mode, m.compact_every,
                dropped=[],  # full rewrite: no live file predates the schema
            )

        return self._commit_with(make, timeout, op="repartition")

    def compact(self, max_files_per_partition: int = 1, timeout: float = 60.0) -> int:
        """Rewrite partitions holding more than ``max_files_per_partition``
        live files into one file each (Hudi inline compaction / clustering
        analog for the small-file problem: frequent small commits accrete
        files until scans are listing-bound; compaction restores scan-sized
        files without changing any row).

        Runs under the writer lock as a normal commit — readers on older
        manifests still see the pre-compaction files (immutable), and the
        changefeed stays clean because compaction rewrites rows verbatim
        (read_incremental's exceptAll cancels them out).
        """

        def mutate(m: _Manifest) -> list[dict]:
            by_part: dict[str, list[dict]] = {}
            for f in m.files:
                by_part.setdefault(f["partition"], []).append(f)
            crowded = {
                p
                for p, fs in by_part.items()
                if len(fs) > max_files_per_partition
                or any(f.get("kind") == "delta" for f in fs)
            }
            if not crowded:
                return m.files
            if m.mode == "mor":
                # Close the fold set under pk-range overlap — for EVERY
                # MOR fold, not only partial/tombstone folds. Folding a
                # PARTIAL payload without its base row, or a TOMBSTONE
                # without the shadowed base it kills, corrupts the table
                # directly. But plain full-row folds are NOT safe alone
                # either: folded rows are re-emitted at THIS commit's seq,
                # so a stale SHADOWED copy inside the fold set whose
                # latest version lives OUTSIDE it (cross-partition move,
                # then an earlier compaction folded the destination
                # partition into a quiet single base) would be rewritten
                # ABOVE the true row and resurrect it — found by the
                # concurrent linearizability soak (three writers +
                # inline compaction), but reachable single-threaded too.
                # The closure pulls the latest copy's partition into the
                # fold so the key resolves once, to its newest row.
                crowded = self._pk_closed_partitions(m, crowded)
            keep = [f for f in m.files if f["partition"] not in crowded]
            touch = [f for f in m.files if f["partition"] in crowded]
            if m.mode == "mor":
                # fold base + deltas into resolved base files; the new rows
                # carry the compaction commit's seq so they outrank every
                # folded delta (all of which this commit removes anyway)
                rows = self._resolve(m, touch).repartition(
                    len(crowded), F.col(m.partition_col)
                )
                return keep + self._write_delta(
                    rows, m, op="upsert", seq=m.version + 1, kind="base"
                )
            rows = self._df_for_files(m, touch).repartition(
                len(crowded), F.col(m.partition_col)
            )
            return keep + self._write_data(rows, m)

        return self._commit(mutate, timeout, op="compact")

    _Z_BITS = 12  # z-order grid resolution per dimension

    def _with_zvalue(self, df: DataFrame, cols: list[str]) -> DataFrame:
        """Append ``__zval__``: the Z-order (Morton) key interleaving each
        column's 2^{_Z_BITS}-grid coordinate, scaled by the global
        [min, max] from one tiny aggregate. Numeric columns only — string
        dimensions need a rank-grid (a sampled sort), deliberately out of
        scope for the inline path."""
        numeric = ("int", "bigint", "smallint", "tinyint", "float", "double",
                   "decimal", "date", "timestamp")
        dtypes = dict(df.dtypes)
        for c in cols:
            if not dtypes.get(c, "").startswith(numeric):
                raise ValueError(
                    f"zorder_cols must be numeric/date; {c} is {dtypes.get(c)}"
                )
        def as_double(c: str) -> F.Column:
            return (
                F.unix_date(F.col(c)).cast("double")
                if dtypes.get(c) == "date"
                else F.col(c).cast("double")
            )

        # Interleaved key must fit a signed 64-bit long: bits_per_dim *
        # n_cols <= 63, else JVM shiftleft wraps mod 64 and aliases bits
        # (silent ordering corruption). Scale resolution down for wide
        # column lists instead of overflowing.
        zbits = min(self._Z_BITS, 63 // len(cols))
        if zbits < 1:
            raise ValueError(
                f"zorder_cols supports at most 63 columns; got {len(cols)}"
            )

        aggs: list = []
        for c in cols:
            aggs += [F.min(as_double(c)), F.max(as_double(c))]
        row = df.agg(*aggs).collect()[0]
        grid = (1 << zbits) - 1
        coord_exprs = []
        for i, c in enumerate(cols):
            lo, hi = row[2 * i], row[2 * i + 1]
            lo = lo if lo is not None else 0.0
            span = (hi - lo) if (hi is not None and hi > lo) else 1.0
            coord = F.least(
                F.lit(grid).cast("bigint"),
                F.floor(
                    (F.coalesce(as_double(c), F.lit(lo)) - F.lit(lo))
                    / F.lit(span)
                    * F.lit(grid)
                ).cast("bigint"),
            )
            coord_exprs.append(coord)
        z = F.lit(0).cast("bigint")
        for b in range(zbits):
            for i, coord in enumerate(coord_exprs):
                z = z + F.shiftleft(
                    F.shiftright(coord, b).bitwiseAND(F.lit(1)),
                    b * len(cols) + i,
                ).cast("bigint")
        return df.withColumn("__zval__", z)

    def cluster(
        self,
        files_per_partition: int = 4,
        timeout: float = 60.0,
        zorder_cols: list[str] | None = None,
    ) -> int:
        """Sort-clustering (Hudi clustering with sort columns analog):
        rewrite every partition's live rows ORDERED BY primary key into
        ~``files_per_partition`` files of contiguous key ranges.

        Why: commits append files whose key ranges overlap arbitrarily, so
        the manifest's pk min/max stats degrade toward whole-partition
        ranges and :meth:`lookup` stops pruning. Range-layout restores
        tight per-file ranges — a point probe then touches ~1 file per
        partition — and sorted parquet also serves range scans and
        merge-friendly compactions. Same commit mechanics as
        :meth:`compact` (readers on old manifests unaffected; changefeed
        clean because rows are rewritten verbatim).

        With ``zorder_cols`` (numeric/date columns), rows are laid out
        along a Z-ORDER curve instead of the pk: each column is scaled to
        a 2^{_Z_BITS} grid by its global [min, max] (one tiny agg — no
        global sort) and the grid coordinates' bits are interleaved into a
        single sort key, so EVERY listed column's per-file range stays
        tight simultaneously — the multi-dimensional layout Delta's
        OPTIMIZE ZORDER BY and Hudi's space-filling-curve clustering
        build, and what makes :meth:`scan_range` prune on any of the
        z-ordered columns, not just the pk.

        Scale notes: one ``repartitionByRange`` shuffle over the table
        (range boundaries from a sample job) then a sorted write — the
        layout job Hudi schedules as async clustering; run it per hot
        partition set in production rather than table-wide. Min/max
        scaling is two scans worst-case; a production run samples instead,
        changing boundaries, not the curve.
        """

        def mutate(m: _Manifest) -> list[dict]:
            if not m.files:
                return m.files
            n_parts = len({f["partition"] for f in m.files})
            total = max(1, n_parts * files_per_partition)
            rows = self._resolve(m, m.files) if m.mode == "mor" else (
                self._df_for_files(m, m.files)
            )
            if zorder_cols:
                rows = self._with_zvalue(rows, zorder_cols)
                out = rows.repartitionByRange(
                    total, F.col(m.partition_col), F.col("__zval__")
                ).sortWithinPartitions(m.partition_col, "__zval__").drop(
                    "__zval__"
                )
            else:
                out = rows.repartitionByRange(
                    total, F.col(m.partition_col), F.col(m.pk)
                ).sortWithinPartitions(m.partition_col, m.pk)
            if m.mode == "mor":
                return self._write_delta(
                    out, m, op="upsert", seq=m.version + 1, kind="base",
                    preserve_layout=True,
                )
            return self._write_data(out, m, preserve_layout=True)

        return self._commit(mutate, timeout, op="cluster")

    def vacuum(
        self,
        retain_versions: int = 10,
        timeout: float = 60.0,
        orphan_grace_seconds: float = 3600.0,
    ) -> dict:
        """Cleaner service (Hudi `hoodie.cleaner.commits.retained` analog):
        drop manifests older than the newest ``retain_versions`` and delete
        data files no retained manifest references — including orphans from
        crashed writers. Bounds storage growth and the time-travel window.

        Runs under the writer lock so no commit can concurrently publish a
        manifest referencing a file being deleted. Readers of retained
        versions are unaffected (their files stay); readers pinned to a
        vacuumed version fail fast on the missing manifest rather than
        silently reading a mix.

        ``orphan_grace_seconds``: unreferenced files YOUNGER than this are
        kept — an OPTIMISTIC writer's freshly written data is exactly an
        unreferenced file until its publish takes the lock, so deleting
        young orphans would destroy in-flight OCC commits (the same reason
        Delta's VACUUM has a file-retention duration and Hudi's cleaner a
        commits-retained horizon). Pass ``0`` for a cold table to reclaim
        crashed-writer debris immediately.
        """
        fd = self._acquire_lock(timeout)
        try:
            current = self._read_manifest().version
            cutoff = max(0, current - retain_versions + 1)
            # A prior vacuum with TIGHTER retention may already have dropped
            # v{cutoff}; clamp to the oldest manifest still on disk so the
            # checkpoint re-encode below never reads a vacuumed version
            # (a larger retain_versions can't resurrect dropped history).
            existing = [
                int(n[1:-5])
                for n in os.listdir(self._manifest_dir)
                if n.startswith("v") and n.endswith(".json")
            ]
            if existing:
                cutoff = max(cutoff, min(existing))
            # Log-tail compaction (Delta checkpoint analog): re-encode the
            # cutoff manifest as a FULL checkpoint so retained deltas above
            # it resolve without the chain below — which can then be
            # dropped. Atomic rename with identical resolved content, so a
            # concurrent reader sees either encoding, never a mix (and
            # _read_manifest retries once if the chain vanishes under it).
            if cutoff > 0:
                mc = self._read_manifest(version=cutoff)
                cpath = os.path.join(
                    self._manifest_dir, f"v{cutoff:012d}.json"
                )
                ctmp = cpath + f".tmp.{uuid.uuid4().hex}"
                with open(ctmp, "w") as f:
                    f.write(self._encode_full(mc))
                    f.flush()
                    os.fsync(f.fileno())
                os.rename(ctmp, cpath)
            live: set[str] = set()
            live_shards: set[str] = set()
            dropped_manifests = 0
            for name in sorted(os.listdir(self._manifest_dir)):
                if not (name.startswith("v") and name.endswith(".json")):
                    continue
                mv = int(name[1:-5])
                if mv < cutoff:
                    os.remove(os.path.join(self._manifest_dir, name))
                    dropped_manifests += 1
                else:
                    m = self._read_manifest(version=mv)
                    live.update(e["file"] for e in m.files)
                    with open(
                        os.path.join(self._manifest_dir, name)
                    ) as f:
                        raw = json.loads(f.read())
                    live_shards.update(
                        ref["name"] for ref in raw.get("shard_refs", [])
                    )
            # GC checkpoint shards no retained manifest references (same
            # orphan grace as data files: a shard just written by an
            # in-flight checkpoint encode is unreferenced until its
            # manifest swaps in)
            dropped_shards = 0
            if os.path.isdir(self._shard_dir):
                now_s = time.time()
                for sname in os.listdir(self._shard_dir):
                    # anything in shards/ that no retained manifest
                    # references is garbage — including `.tmp.` files a
                    # crashed writer left mid-rename
                    if sname in live_shards:
                        continue
                    spath = os.path.join(self._shard_dir, sname)
                    try:
                        if (
                            now_s - os.path.getmtime(spath)
                            < orphan_grace_seconds
                        ):
                            continue
                        os.remove(spath)
                        dropped_shards += 1
                    except OSError:
                        continue
            removed_files = 0
            now = time.time()
            for root, _dirs, files in os.walk(self._data_dir):
                for fn in files:
                    if not fn.endswith(".parquet"):
                        continue
                    full = os.path.join(root, fn)
                    rel = os.path.relpath(full, self._data_dir)
                    if rel in live:
                        continue
                    try:
                        if now - os.path.getmtime(full) < orphan_grace_seconds:
                            continue  # possibly an in-flight OCC write
                        os.remove(full)
                        removed_files += 1
                    except OSError:
                        continue
            return {
                "dropped_manifests": dropped_manifests,
                "removed_files": removed_files,
                "dropped_shards": dropped_shards,
                "retained_from_version": cutoff,
            }
        finally:
            self._release_lock(fd)

    def add_column(self, field: T.StructField, timeout: float = 60.0) -> int:
        """Additive schema evolution (the Hudi/parquet-safe kind): publish a
        manifest whose schema carries the new nullable column. Existing data
        files are untouched — parquet resolves columns by name, so readers
        see NULL for the new column in pre-evolution files; later commits
        write it. Non-nullable adds are rejected (old rows can't supply a
        value); drops/renames are intentionally unsupported (they break
        old-file resolution and time travel).
        """
        if not field.nullable:
            raise ValueError("added columns must be nullable")

        def make(m: _Manifest) -> _Manifest:
            if field.name in m.schema.names:
                raise ValueError(f"column {field.name!r} already exists")
            # same re-add hazard as evolve_schema: a live pre-drop file
            # would resurrect old values under name binding
            self._guard_readd(m, field.name)
            new_dropped = m.dropped
            if new_dropped is not None:
                new_dropped = [c for c in new_dropped if c != field.name]
            return _Manifest(
                m.version + 1,
                T.StructType(list(m.schema.fields) + [field]),
                m.pk, m.partition_col, m.precombine_col, m.files,
                m.mode, m.compact_every, dropped=new_dropped,
            )

        return self._commit_with(make, timeout, op="add_column")
