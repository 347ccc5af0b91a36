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
                                  [{file, partition}] live-file list
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
predicate pushdown over the manifest's file list. At cluster scale the
manifest would move from one JSON to partitioned metadata (an Iceberg-style
manifest list), but the protocol — immutable files + atomic pointer swap —
is unchanged.
"""

from __future__ import annotations

import fcntl
import json
import os
import time
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


class CommitConflictError(Exception):
    """Writer could not acquire the table lock within the timeout."""


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
    files: list[dict]  # {"file": rel_path, "partition": value}

    def to_json(self) -> str:
        return json.dumps(
            {
                "version": self.version,
                "schema": self.schema.jsonValue(),
                "pk": self.pk,
                "partition_col": self.partition_col,
                "precombine_col": self.precombine_col,
                "files": self.files,
                "created_at": time.time(),
            }
        )

    @staticmethod
    def from_json(text: str) -> "_Manifest":
        d = json.loads(text)
        return _Manifest(
            version=d["version"],
            schema=T.StructType.fromJson(d["schema"]),
            pk=d["pk"],
            partition_col=d["partition_col"],
            precombine_col=d.get("precombine_col"),
            files=d["files"],
        )


class AcidTable:
    """Keyed, partitioned, snapshot-isolated copy-on-write parquet table."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
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
    ) -> "AcidTable":
        """CREATE TABLE (TransactionManager.java:76-88 parity)."""
        t = cls(spark, path)
        if os.path.exists(t._latest_ptr):
            if if_not_exists:
                return t
            raise FileExistsError(f"AcidTable already exists at {path}")
        if pk not in schema.names or partition_col not in schema.names:
            raise ValueError("pk/partition_col must be schema columns")
        os.makedirs(t._manifest_dir, exist_ok=True)
        os.makedirs(t._data_dir, exist_ok=True)
        open(t._lock_path, "a").close()
        m = _Manifest(0, schema, pk, partition_col, precombine_col, [])
        t._write_manifest_and_swap(m)
        return t

    @staticmethod
    def drop(path: str) -> None:
        """DROP TABLE IF EXISTS (TransactionManager.java:75 parity)."""
        import shutil

        shutil.rmtree(path, ignore_errors=True)

    # ------------------------------------------------------------- snapshots

    def _read_manifest(self, version: int | None = None) -> _Manifest:
        if version is None:
            with open(self._latest_ptr) as f:
                name = f.read().strip()
        else:
            name = f"v{version:012d}.json"
        with open(os.path.join(self._manifest_dir, name)) as f:
            return _Manifest.from_json(f.read())

    def version(self) -> int:
        return self._read_manifest().version

    def snapshot(self, version: int | None = None) -> DataFrame:
        """Consistent snapshot DataFrame (ReaderThread.java:77-80 parity;
        ``version`` gives time travel over retained manifests)."""
        m = self._read_manifest(version)
        return self._df_for(m)

    def _df_for(self, m: _Manifest) -> DataFrame:
        if not m.files:
            return self.spark.createDataFrame([], m.schema)
        paths = [os.path.join(self._data_dir, f["file"]) for f in m.files]
        # basePath recovers the hive partition column from directory names;
        # Catalyst partition-prunes and pushes predicates into these files.
        df = (
            self.spark.read.option("basePath", self._data_dir)
            .schema(self._physical_schema(m))
            .parquet(*paths)
        )
        return df.select(*m.schema.names)

    def _physical_schema(self, m: _Manifest) -> T.StructType:
        # Partition column comes from the directory, but listing it in the
        # read schema keeps its type stable.
        return m.schema

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

    def _write_manifest_and_swap(self, m: _Manifest) -> None:
        mpath = os.path.join(self._manifest_dir, f"v{m.version:012d}.json")
        tmp = mpath + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(m.to_json())
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, mpath)
        ptr_tmp = self._latest_ptr + f".tmp.{uuid.uuid4().hex}"
        with open(ptr_tmp, "w") as f:
            f.write(os.path.basename(mpath))
            f.flush()
            os.fsync(f.fileno())
        os.rename(ptr_tmp, self._latest_ptr)  # atomic on POSIX

    def _write_data(self, df: DataFrame, m: _Manifest) -> list[dict]:
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
                os.rename(os.path.join(root, fn), os.path.join(dest_dir, final))
                entries.append({"file": os.path.join(seg, final), "partition": part})
        import shutil

        shutil.rmtree(staging, ignore_errors=True)
        return entries

    def _commit(self, mutate, timeout: float = 60.0) -> int:
        """Run ``mutate(manifest) -> new_files`` under the writer lock and
        atomically publish the next manifest version."""
        fd = self._acquire_lock(timeout)
        try:
            m = self._read_manifest()
            new_files = mutate(m)
            nm = _Manifest(
                m.version + 1, m.schema, m.pk, m.partition_col, m.precombine_col, new_files
            )
            self._write_manifest_and_swap(nm)
            return nm.version
        finally:
            self._release_lock(fd)

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
        self, m: _Manifest, changed: DataFrame, rewrite
    ) -> list[dict]:
        """COW scoped by partition: only files whose partition value appears
        in ``changed`` are rewritten; all other live files carry over.

        ``rewrite(old_rows_df) -> new_rows_df`` receives the current rows of
        the affected partitions only.
        """
        affected = {
            str(r[0])
            for r in changed.select(m.partition_col).distinct().collect()
        }
        keep = [f for f in m.files if f["partition"] not in affected]
        touch = [f for f in m.files if f["partition"] in affected]
        if touch:
            paths = [os.path.join(self._data_dir, f["file"]) for f in touch]
            old = (
                self.spark.read.option("basePath", self._data_dir)
                .schema(m.schema)
                .parquet(*paths)
                .select(*m.schema.names)
            )
        else:
            old = self.spark.createDataFrame([], m.schema)
        new_rows = rewrite(old)
        new_entries = self._write_data(new_rows.select(*m.schema.names), m)
        return keep + new_entries

    def upsert(self, df: DataFrame, timeout: float = 60.0) -> int:
        """Atomic multi-row upsert (INSERT path, TransactionWriter.java:121-141):
        incoming rows replace same-pk rows, new pks are appended."""

        def mutate(m: _Manifest) -> list[dict]:
            incoming = self._precombine(df.select(*m.schema.names), m)
            incoming.cache()
            try:
                return self._partition_scoped_rewrite(
                    m,
                    incoming,
                    lambda old: old.join(
                        incoming.select(m.pk), m.pk, "left_anti"
                    ).unionByName(incoming),
                )
            finally:
                incoming.unpersist()

        return self._commit(mutate, timeout)

    def merge(
        self,
        source: DataFrame,
        update_cols: list[str] | None = None,
        timeout: float = 60.0,
        partition_from_key: bool = False,
    ) -> int:
        """MERGE INTO rewrite (TransactionWriter.java:143-166): WHEN MATCHED
        update only ``update_cols`` (reference updates only dataValue), WHEN
        NOT MATCHED insert the full source row.

        Matched rows keep their target partition value (the reference's
        matched branch never moves a row across partitions), so the rewrite
        must touch both source partitions (inserts) and the partitions of
        matched target rows — by default we resolve the union of the two with
        a semi-join against the live snapshot.

        ``partition_from_key=True`` declares that the partition value is a
        pure function of the primary key (true for the harness workload,
        TransactionGenerator.java:75-78) — matched rows then necessarily
        live in the source's partitions, and the semi-join read is skipped:
        one fewer full-snapshot scan per commit.
        """

        def mutate(m: _Manifest) -> list[dict]:
            upd = update_cols if update_cols is not None else [
                c for c in m.schema.names if c not in (m.pk, m.partition_col)
            ]
            src = self._precombine(source.select(*m.schema.names), m)
            src.cache()
            try:
                if partition_from_key:
                    changed = src.select(m.partition_col)
                else:
                    live = self._df_for(m)
                    matched_parts = live.join(
                        src.select(m.pk), m.pk, "left_semi"
                    ).select(m.partition_col)
                    changed = src.select(m.partition_col).unionByName(matched_parts)

                def rewrite(old: DataFrame) -> DataFrame:
                    s = src.select(
                        F.col(m.pk).alias("__s_pk"),
                        *[F.col(c).alias(f"__s_{c}") for c in m.schema.names if c != m.pk],
                    )
                    joined = old.join(s, old[m.pk] == s["__s_pk"], "full_outer")
                    cols = []
                    for c in m.schema.names:
                        if c == m.pk:
                            cols.append(F.coalesce(old[m.pk], s["__s_pk"]).alias(c))
                        elif c in upd:
                            cols.append(F.coalesce(s[f"__s_{c}"], old[c]).alias(c))
                        else:
                            # non-updated col: keep target value; take source
                            # only for brand-new keys (insert branch)
                            cols.append(F.coalesce(old[c], s[f"__s_{c}"]).alias(c))
                    return joined.select(*cols)

                return self._partition_scoped_rewrite(m, changed, rewrite)
            finally:
                src.unpersist()

        return self._commit(mutate, timeout)

    def delete(self, keys, timeout: float = 60.0, partitions: list[str] | None = None) -> int:
        """DELETE WHERE pk IN (...) with the intended semantics
        (TransactionWriter.java:168-178, defect D2 fixed): left-anti join.

        ``partitions`` optionally names the partitions containing the keys
        (derivable when partition = f(pk)); when given, the semi-join scan
        that locates affected partitions is skipped.
        """

        def mutate(m: _Manifest) -> list[dict]:
            if isinstance(keys, DataFrame):
                kdf = keys.select(F.col(keys.columns[0]).alias(m.pk))
            else:
                kdf = self.spark.createDataFrame(
                    [(k,) for k in keys], T.StructType([m.schema[m.pk]])
                )
            kdf.cache()
            try:
                if partitions is not None:
                    changed = self.spark.createDataFrame(
                        [(p,) for p in partitions],
                        T.StructType([m.schema[m.partition_col]]),
                    )
                else:
                    live = self._df_for(m)
                    changed = live.join(kdf, m.pk, "left_semi").select(m.partition_col)
                return self._partition_scoped_rewrite(
                    m,
                    changed,
                    lambda old: old.join(F.broadcast(kdf), m.pk, "left_anti"),
                )
            finally:
                kdf.unpersist()

        return self._commit(mutate, timeout)

    # ------------------------------------------------- incremental / timeline

    def history(self) -> list[dict]:
        """Commit timeline (Hudi `.hoodie` timeline analog): one entry per
        retained manifest version with its live-file count per partition."""
        out = []
        for name in sorted(os.listdir(self._manifest_dir)):
            if not (name.startswith("v") and name.endswith(".json")):
                continue
            with open(os.path.join(self._manifest_dir, name)) as f:
                m = _Manifest.from_json(f.read())
            parts: dict[str, int] = {}
            for e in m.files:
                parts[e["partition"]] = parts.get(e["partition"], 0) + 1
            out.append(
                {"version": m.version, "n_files": len(m.files), "partitions": parts}
            )
        return out

    def read_incremental(
        self, begin_version: int, end_version: int | None = None
    ) -> DataFrame:
        """Post-image rows changed in ``(begin_version, end_version]`` —
        Hudi's incremental query (`hoodie.datasource.query.type=incremental`).

        File-pruned: only files ADDED since ``begin`` (candidate post-images)
        and files REMOVED since ``begin`` (prior images) are read; untouched
        partitions never scan. A rewritten partition carries its unchanged
        rows into new files, so the added-file rows are anti-joined
        (full-row ``exceptAll``) against the removed-file rows to keep only
        genuine inserts/updates. Deletes are exposed by
        :meth:`deleted_keys`.
        """
        mb = self._read_manifest(begin_version)
        me = self._read_manifest(end_version)
        before = {f["file"] for f in mb.files}
        after = {f["file"] for f in me.files}
        added = [f for f in me.files if f["file"] not in before]
        removed = [f for f in mb.files if f["file"] not in after]
        new_rows = self._df_for_files(me, added)
        old_rows = self._df_for_files(mb, removed)
        return new_rows.exceptAll(old_rows)

    def deleted_keys(
        self, begin_version: int, end_version: int | None = None
    ) -> DataFrame:
        """Primary keys removed in ``(begin_version, end_version]`` — the
        delete half of the incremental changefeed (same file pruning)."""
        mb = self._read_manifest(begin_version)
        me = self._read_manifest(end_version)
        before = {f["file"] for f in mb.files}
        after = {f["file"] for f in me.files}
        added = [f for f in me.files if f["file"] not in before]
        removed = [f for f in mb.files if f["file"] not in after]
        new_keys = self._df_for_files(me, added).select(me.pk)
        old_keys = self._df_for_files(mb, removed).select(mb.pk)
        return old_keys.join(new_keys, mb.pk, "left_anti").distinct()

    def _df_for_files(self, m: _Manifest, files: list[dict]) -> DataFrame:
        if not files:
            return self.spark.createDataFrame([], m.schema)
        paths = [os.path.join(self._data_dir, f["file"]) for f in files]
        return (
            self.spark.read.option("basePath", self._data_dir)
            .schema(self._physical_schema(m))
            .parquet(*paths)
            .select(*m.schema.names)
        )

    # ------------------------------------------------------------ maintenance

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
                p for p, fs in by_part.items() if len(fs) > max_files_per_partition
            }
            if not crowded:
                return m.files
            keep = [f for f in m.files if f["partition"] not in crowded]
            touch = [f for f in m.files if f["partition"] in crowded]
            rows = self._df_for_files(m, touch).repartition(
                len(crowded), F.col(m.partition_col)
            )
            return keep + self._write_data(rows, m)

        return self._commit(mutate, timeout)
