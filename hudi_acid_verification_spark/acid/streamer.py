"""IngestStreamer — incremental parquet-drop ingestion into an AcidTable.

The north-star approach names Hudi DeltaStreamer (continuous upsert of
arriving source files into a keyed table); this is that loop on the native
commit protocol: discover unprocessed source files, upsert their rows, and
atomically advance a checkpoint.

Delivery semantics: the checkpoint is written AFTER the table commit, so a
crash between the two replays the same files — at-least-once delivery, made
effectively exactly-once by the idempotent keyed upsert (re-upserting the
same rows yields the same table; precombine picks the same winner within a
batch, AcidTable.upsert replaces same-pk rows). This is the same contract
DeltaStreamer documents for its checkpointed sources.

Scale notes: file discovery is a listing + set difference, not a data scan;
each ``run_once`` commits one atomic multi-file batch (partition-scoped COW
inside AcidTable), and ``checkpoint`` keeps file names only — O(#files)
metadata, no row-level bookkeeping. On an object store the listing becomes a
manifest/notification feed; the loop is unchanged.
"""

from __future__ import annotations

import glob
import json
import os
import uuid

from pyspark.sql import SparkSession

from .table import AcidTable


class IngestStreamer:
    """Checkpointed incremental upsert of parquet source files."""

    def __init__(self, table: AcidTable, source_glob: str):
        self.table = table
        self.source_glob = source_glob
        self._ckpt_path = os.path.join(table.path, "_ingest_checkpoint.json")

    def _processed(self) -> set[str]:
        if not os.path.exists(self._ckpt_path):
            return set()
        with open(self._ckpt_path) as f:
            return set(json.load(f)["files"])

    def _save_processed(self, files: set[str]) -> None:
        tmp = self._ckpt_path + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump({"files": sorted(files)}, f)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, self._ckpt_path)  # atomic on POSIX

    def pending(self) -> list[str]:
        """Source files not yet checkpointed, oldest path first."""
        return sorted(set(glob.glob(self.source_glob)) - self._processed())

    def run_once(
        self,
        spark: SparkSession,
        max_files: int | None = None,
        op: str = "upsert",
        update_cols: list[str] | None = None,
    ) -> int:
        """Ingest up to ``max_files`` pending files as ONE atomic commit.

        ``op`` selects the DML applied to each batch:
        - ``"upsert"`` (default): whole-row keyed upsert.
        - ``"merge"``: MERGE semantics — with ``update_cols``, arriving rows
          override ONLY those columns on matched keys (partial-column
          payloads, Hudi PartialUpdateAvroPayload analog) and insert in full
          for new keys. On a MOR table this stays a pure delta append.

        Returns the number of files ingested (0 = caught up). Call in a loop
        (or from a scheduler) for continuous ingestion.
        """
        if op not in ("upsert", "merge"):
            raise ValueError(f"unknown ingest op: {op!r}")
        batch = self.pending()
        if max_files is not None:
            batch = batch[:max_files]
        if not batch:
            return 0
        df = spark.read.schema(
            self.table._read_manifest().schema
        ).parquet(*batch)
        if op == "merge":
            self.table.merge(df, update_cols=update_cols)
        else:
            self.table.upsert(df)
        self._save_processed(self._processed() | set(batch))
        return len(batch)


def stream_into_table(stream_df, table: AcidTable, checkpoint_dir: str):
    """Structured-Streaming sink into an AcidTable: every micro-batch is one
    atomic keyed upsert (DeltaStreamer's continuous mode on the native
    commit protocol). Returns the started StreamingQuery.

    Exactly-once table state: Spark's checkpoint gives at-least-once batch
    delivery; replaying a batch re-upserts the same keyed rows — idempotent,
    so the table converges to the same state. Readers see whole batches or
    nothing (manifest swap per commit), never partial micro-batches.
    """

    def sink(batch_df, _batch_id: int) -> None:
        table.upsert(batch_df)

    return (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def merge_stream_into_table(
    stream_df,
    table: AcidTable,
    checkpoint_dir: str,
    update_cols: list[str] | None = None,
):
    """Structured-Streaming MERGE sink: every micro-batch merges into the
    AcidTable — with ``update_cols``, each arriving row overrides only those
    columns on matched keys (partial-column payload) and inserts in full for
    new keys. Returns the started StreamingQuery.

    On a MOR table each micro-batch is ONE delta append (no read, no
    rewrite) — the lowest-latency continuous-upsert shape, with the cost
    moved to read-time resolution and periodic compaction. Replayed batches
    re-append the same payloads; resolution is newest-setter-wins per
    column, so the table converges to the same state (at-least-once
    delivery, effectively-once result — the DeltaStreamer contract).
    """

    def sink(batch_df, _batch_id: int) -> None:
        table.merge(batch_df, update_cols=update_cols)

    return (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
