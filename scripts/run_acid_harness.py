"""Run the full reference-configuration ACID harness (BASELINE.md workload:
1000 transactions × 3 rows, 2 writers, 2 readers, 100 keys, 4 partitions,
seed 1234) against AcidTable and print a JSON report.

Usage: python scripts/run_acid_harness.py [total_transactions] [cow|mor] [--occ]

``--occ`` runs the writers under optimistic concurrency control (lock-free
data writes, conflict-and-retry publishes) instead of the default flock
mode — the full-scale twin of tests/test_harness_e2e.py's reduced OCC runs.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hudi_acid_verification_spark.session import get_spark
from hudi_acid_verification_spark.verify import HarnessConfig, TransactionHarness


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--occ"]
    occ = "--occ" in sys.argv[1:]
    total = int(args[0]) if args else 1000
    mode = args[1] if len(args) > 1 else "cow"
    spark = get_spark("acid-harness")
    cfg = HarnessConfig(
        table_path=os.path.join(
            tempfile.gettempdir(),
            f"acid_harness_tbl_{mode}{'_occ' if occ else ''}",
        ),
        number_of_writers=2,
        number_of_readers=2,
        total_transactions=total,
        records_per_transaction=3,
        maximum_number_of_records=100,
        maximum_number_of_partitions=4,
        seed=1234,
        table_mode=mode,
        occ=occ,
    )
    report = TransactionHarness(spark, cfg).run()
    print(
        json.dumps(
            {
                "mode": mode, "occ": occ,
                "passed": report.passed,
                "committed_transactions": report.committed_transactions,
                "failed_transactions": report.failed_transactions,
                "verification_runs": report.verification_runs,
                "verification_failures": report.verification_failures,
                "writer_errors": report.writer_errors[:5],
                "reader_errors": report.reader_errors[:5],
                "failure_details": report.failure_details[:5],
                "final_row_count": report.final_row_count,
                "median_write_seconds": round(
                    statistics.median(report.write_seconds), 4
                ) if report.write_seconds else None,
                "median_read_seconds": round(
                    statistics.median(report.read_seconds), 4
                ) if report.read_seconds else None,
            }
        )
    )
    spark.stop()
    sys.exit(0 if report.passed else 1)


if __name__ == "__main__":
    main()
