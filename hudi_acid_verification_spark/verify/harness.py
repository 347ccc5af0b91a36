"""Concurrent read/verify harness over AcidTable.

Port (intent) of writer/TransactionManager.java:39-68 + TransactionWriter +
reader/ReaderThread, with defects fixed:
- D4: the retry loop actually retries — it catches the commit-conflict error
  our storage raises, with bounded attempts + jitter
  (reference: TransactionWriter.java:104-119 could never catch);
- D5: failure aggregation uses any() semantics
  (reference: `hasFailedWriters && exc != null` stuck false, :58,:65).

Each writer/reader thread gets its own Spark session (`spark.newSession()` —
the reference clones sessions, TransactionManager.java:95-101) and its own
AcidTable handle over the same path. Writers pull transactions from a shared
counter-guarded supplier (:133-141); readers run the two-cut verification
loop (ReaderThread.java:40-72) until the stop flag.
"""

from __future__ import annotations

import itertools
import logging
import random
import threading
import time
from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from hudi_acid_verification_spark.acid import AcidTable, CommitConflictError

from .expectations import InconsistentResultSetException, ResultSet
from .generator import TransactionGenerator
from .log import TransactionLog
from .model import ManipulationType, Record, Transaction
from .producer import ExpectationProducer

logger = logging.getLogger(__name__)

RECORD_SCHEMA = T.StructType(
    [
        T.StructField("primaryKeyValue", T.StringType(), False),
        T.StructField("partitionKeyValue", T.StringType(), False),
        T.StructField("dataValue", T.StringType(), True),
    ]
)


@dataclass
class HarnessConfig:
    """Mirrors writer/Configuration.java:9-64 defaults (writers narrowed to 2
    as in TransactionManagerTest.java:27-30)."""

    table_path: str
    number_of_writers: int = 2
    number_of_readers: int = 2
    total_transactions: int = 1000
    records_per_transaction: int = 3
    maximum_number_of_records: int = 100
    maximum_number_of_partitions: int = 4
    insert_probability: float = 0.25
    update_probability: float = 0.75
    seed: int = 1234
    retry_attempts: int = 100
    lock_timeout_seconds: float = 120.0
    table_mode: str = "cow"  # "cow" (reference config) | "mor"
    mor_compact_every: int = 20  # inline-compaction cadence when mode=mor
    # issue UPDATE/DELETE as the reference's literal SQL text
    # (TransactionWriter.java:143-178) through the acid.sql_dml shim instead
    # of the DataFrame API — API-parity mode; INSERT stays the write-path
    # upsert, as in the reference (:121-141)
    sql_mode: bool = False
    # writer-side optimistic concurrency (COW): data writes run lock-free,
    # conflicts surface as CommitConflictError and take the retry path —
    # exercises AcidTable's OCC rebase under the real concurrent workload
    occ: bool = False
    # readers additionally pin a version and compare the PARTITION-PRUNED
    # snapshot resolution (sharded-checkpoint shard pruning included)
    # against the full resolution of the same version, while writers keep
    # committing — exercises snapshot(partitions=[...]) under concurrency
    # (VERDICT r6 directive #7)
    partition_scoped_reads: bool = False


@dataclass
class HarnessReport:
    committed_transactions: int = 0
    failed_transactions: int = 0
    verification_runs: int = 0
    verification_failures: int = 0
    scoped_read_checks: int = 0
    writer_errors: list = field(default_factory=list)
    reader_errors: list = field(default_factory=list)
    failure_details: list = field(default_factory=list)
    write_seconds: list = field(default_factory=list)
    read_seconds: list = field(default_factory=list)
    final_row_count: int = 0

    @property
    def passed(self) -> bool:
        """The reference's *intended* assertion (TransactionManagerTest.java:
        44-49, D5 fixed): no verification failures, no dead threads."""
        return (
            not self.verification_failures
            and not self.writer_errors
            and not self.reader_errors
        )


class TransactionHarness:
    def __init__(self, spark: SparkSession, config: HarnessConfig):
        self.spark = spark
        self.config = config
        self.log = TransactionLog()
        self.producer = ExpectationProducer(self.log)
        self.generator = TransactionGenerator(
            maximum_number_of_records=config.maximum_number_of_records,
            maximum_number_of_partitions=config.maximum_number_of_partitions,
            records_per_transaction=config.records_per_transaction,
            insert_probability=config.insert_probability,
            update_probability=config.update_probability,
            seed=config.seed,
        )
        self.report = HarnessReport()
        self._stop = threading.Event()
        self._handed_out = 0
        self._counter_lock = threading.Lock()
        self._report_lock = threading.Lock()
        self._retry_rng = random.Random(config.seed ^ 0x5EED)
        # rotates the scoped-read partition across reader iterations
        # (itertools.count: single C-level step, safe across threads)
        self._scope_seq = itertools.count()

    # ------------------------------------------------------------ lifecycle

    def run(self) -> HarnessReport:
        cfg = self.config
        AcidTable.drop(cfg.table_path)
        AcidTable.create(
            self.spark,
            cfg.table_path,
            RECORD_SCHEMA,
            pk="primaryKeyValue",
            partition_col="partitionKeyValue",
            precombine_col="dataValue",
            mode=cfg.table_mode,
            compact_every=(
                cfg.mor_compact_every if cfg.table_mode == "mor" else None
            ),
        )

        writers = [
            threading.Thread(target=self._writer_loop, name=f"writer-{i}")
            for i in range(cfg.number_of_writers)
        ]
        readers = [
            threading.Thread(target=self._reader_loop, name=f"reader-{i}")
            for i in range(cfg.number_of_readers)
        ]
        for t in readers + writers:
            t.start()
        for t in writers:
            t.join()
        self._stop.set()  # writers done (or dead) → readers wind down
        for t in readers:
            t.join()

        table = AcidTable(self.spark, cfg.table_path)
        self.report.final_row_count = table.snapshot().count()
        return self.report

    # --------------------------------------------------------------- supply

    def _next_transaction(self) -> Transaction | None:
        """Counter-guarded handout (TransactionManager.java:133-141)."""
        with self._counter_lock:
            if self._handed_out >= self.config.total_transactions:
                return None
            self._handed_out += 1
        return self.generator.get_next_transaction()

    # -------------------------------------------------------------- writers

    def _apply(self, table: AcidTable, txn: Transaction) -> None:
        rows = [
            (dm.primary_key_value, dm.partition_key_value, dm.data_value)
            for dm in txn.data_manipulations
        ]
        df = table.spark.createDataFrame(rows, RECORD_SCHEMA)
        timeout = self.config.lock_timeout_seconds
        parts = sorted({r[1] for r in rows})
        if txn.manipulation_type is ManipulationType.INSERT:
            table.upsert(df, timeout=timeout, partitions=parts)
        elif self.config.sql_mode:
            self._apply_sql(table, txn, df, timeout)
        elif txn.manipulation_type is ManipulationType.UPDATE:
            # partition = f(pk) in this workload (generator.partition_for),
            # so the merge skips every partition-discovery job: the batch is
            # driver-built and its partition values are known for free
            table.merge(
                df, update_cols=["dataValue"], timeout=timeout,
                partitions=parts,
            )
        else:
            # (pk, partition) pairs serve both modes: cow prunes via
            # `partitions`, mor places tombstones without a lookup read
            table.delete(
                [(r[0], r[1]) for r in rows],
                timeout=timeout,
                partitions=sorted({r[1] for r in rows}),
            )

    def _apply_sql(self, table: AcidTable, txn, df, timeout: float) -> None:
        """Reference writer parity: issue the literal SQL statement text the
        reference emits (TransactionWriter.java:143-178) and let the
        ``acid.sql_dml`` shim parse + dispatch it. Loses the partition-hint
        fast paths (the SQL carries no partition list) — correctness
        identical, a bit more discovery work per commit."""
        from ..acid.sql_dml import execute_dml

        if txn.manipulation_type is ManipulationType.UPDATE:
            view = f"updates_{txn.transaction_id.replace('-', '_')}"
            df.createOrReplaceTempView(view)
            try:
                execute_dml(
                    table,
                    f"MERGE INTO acid USING (SELECT * FROM {view}) s "
                    "ON acid.primaryKeyValue = s.primaryKeyValue "
                    "WHEN MATCHED THEN UPDATE SET "
                    "acid.dataValue = s.dataValue "
                    "WHEN NOT MATCHED THEN INSERT "
                    "(primaryKeyValue, partitionKeyValue, dataValue) VALUES "
                    "(s.primaryKeyValue, s.partitionKeyValue, s.dataValue)",
                    timeout=timeout,
                )
            finally:
                table.spark.catalog.dropTempView(view)
        else:  # DELETE — comma-delimited quoted list (defect D2 fixed)
            quoted = ", ".join(
                "'" + dm.primary_key_value.replace("'", "''") + "'"
                for dm in txn.data_manipulations
            )
            execute_dml(
                table,
                f"DELETE FROM acid WHERE primaryKeyValue IN ({quoted})",
                timeout=timeout,
            )

    def _writer_loop(self) -> None:
        session = self.spark.newSession()
        # size shuffles to the workload: recordsPerTransaction-row batches
        # over a 4-partition table make 32-way shuffles pure task overhead
        session.conf.set("spark.sql.shuffle.partitions", "8")
        table = AcidTable(
            session, self.config.table_path, occ=self.config.occ
        )
        try:
            while not self._stop.is_set():
                txn = self._next_transaction()
                if txn is None:
                    return
                self.log.log_intent(txn)
                start = time.perf_counter()
                try:
                    self._with_retry(lambda: self._apply(table, txn))
                except Exception as exc:
                    self.generator.transaction_failed(txn)
                    with self._report_lock:
                        self.report.failed_transactions += 1
                        self.report.writer_errors.append(
                            f"{txn.manipulation_type.value} {txn.transaction_id}: {exc!r}"
                        )
                    logger.exception("transaction failed")
                    continue
                self.generator.transaction_committed(txn)
                self.log.log_commit(txn)
                elapsed = time.perf_counter() - start
                with self._report_lock:
                    self.report.committed_transactions += 1
                    self.report.write_seconds.append(elapsed)
                logger.info(
                    "write type=%s rows=%d duration=%.3fs",
                    txn.manipulation_type.value,
                    len(txn.data_manipulations),
                    elapsed,
                )
        except Exception as exc:  # noqa: BLE001 — thread boundary
            with self._report_lock:
                self.report.writer_errors.append(f"writer died: {exc!r}")
            self._stop.set()

    def _with_retry(self, action) -> None:
        """Bounded retry with jitter on commit conflicts (D4 fixed)."""
        attempts = self.config.retry_attempts
        for attempt in range(attempts):
            try:
                action()
                return
            except CommitConflictError:
                if attempt == attempts - 1:
                    raise
                time.sleep(self._retry_rng.uniform(0.01, 0.1) * (attempt + 1))

    # -------------------------------------------------------------- readers

    def _read_records(self, table: AcidTable) -> list[Record]:
        """Snapshot scan → typed rows (ReaderThread.java:74-83). The manifest
        protocol re-resolves `_latest` per snapshot, so no REFRESH/MSCK."""
        return [
            Record(r["primaryKeyValue"], r["partitionKeyValue"], r["dataValue"])
            for r in table.snapshot().collect()
        ]

    def _reader_loop(self) -> None:
        session = self.spark.newSession()
        table = AcidTable(session, self.config.table_path)
        try:
            while not self._stop.is_set():
                self._perform_verification(table)
        except Exception as exc:  # noqa: BLE001 — thread boundary
            with self._report_lock:
                self.report.reader_errors.append(f"reader died: {exc!r}")
            self._stop.set()

    def _perform_verification(self, table: AcidTable) -> None:
        """Two-cut verification (ReaderThread.java:52-72)."""
        cnt_before = self.log.get_event_count()
        start = time.perf_counter()
        records = self._read_records(table)
        elapsed = time.perf_counter() - start
        cnt_after = self.log.get_event_count()

        expectations = self.producer.create_result_set_expectations(
            cnt_before, cnt_after
        )
        rs = ResultSet(records)
        try:
            rs.assert_unique()
            ok, detail = expectations.is_satisfied(rs)
        except InconsistentResultSetException as exc:
            ok, detail = False, f"duplicate pk: {exc}"

        if ok and self.config.partition_scoped_reads:
            ok, detail = self._scoped_read_check(table)

        with self._report_lock:
            self.report.verification_runs += 1
            self.report.read_seconds.append(elapsed)
            if not ok:
                self.report.verification_failures += 1
                self.report.failure_details.append(detail)
        if not ok:
            logger.error("verification failed: %s", detail)
            self._stop.set()  # reference stops the run on failure
        logger.info(
            "read rows=%d events=[%d,%d] duration=%.3fs ok=%s",
            len(records), cnt_before, cnt_after, elapsed, ok,
        )

    def _scoped_read_check(self, table: AcidTable) -> tuple[bool, str]:
        """Pin the current version, then compare the PARTITION-PRUNED
        snapshot (manifest/shard resolution restricted to one rotating
        partition) against the full resolution of that same version
        filtered client-side. Any divergence means pruned resolution
        dropped or invented rows under concurrent commits — the defect
        class this mode exists to catch. The version pin makes the check
        race-free by construction: writers may commit between the two
        reads, but both reads resolve the identical immutable manifest."""
        version = table.current_version()
        part = (
            f"Partition{next(self._scope_seq) % self.config.maximum_number_of_partitions}"
        )
        full = {
            (r["primaryKeyValue"], r["partitionKeyValue"], r["dataValue"])
            for r in table.snapshot(version=version).collect()
            if r["partitionKeyValue"] == part
        }
        scoped = {
            (r["primaryKeyValue"], r["partitionKeyValue"], r["dataValue"])
            for r in table.snapshot(version=version, partitions=[part]).collect()
        }
        with self._report_lock:
            self.report.scoped_read_checks += 1
        if full != scoped:
            return False, (
                f"scoped-read mismatch v{version} {part}: "
                f"pruned-only={sorted(scoped - full)[:3]} "
                f"full-only={sorted(full - scoped)[:3]}"
            )
        return True, ""
