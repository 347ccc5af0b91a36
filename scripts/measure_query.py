"""Per-query measurement harness for optimization rounds (guide §1).

Times individual registered queries into the noop sink on an idle box and
captures ``explain("formatted")`` so plan claims in OPTIMIZATION_r*.md are
checkable. Usage:

    python scripts/measure_query.py q1_pricing_summary dedup_exact ...
    python scripts/measure_query.py --plans-out plans/r08 --suffix before q3_shipping_priority
    python scripts/measure_query.py --all            # every registered query

Prints one line per query: name, per-run seconds (N runs, first is cold),
and writes ``<plans-out>/<name>_<suffix>.txt`` when --plans-out is given.
Staging artifacts are pre-warmed exactly like bench.py so numbers are
marginal cost, comparable with bench_detail.json.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from hudi_acid_verification_spark import operators as ops  # noqa: E402
from hudi_acid_verification_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans-out", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--no-staging", action="store_true",
                    help="skip the staging pre-warm (for staging-cost work)")
    args = ap.parse_args()

    names = list(ops.QUERIES) if args.all else args.names
    unknown = [n for n in names if n not in ops.QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    spark = get_spark("measure", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")

    # Warm-up + staging pre-warm, mirroring bench.py.
    ops.QUERIES["q1_pricing_summary"](spark, args.sf_dir).write.format(
        "noop").mode("overwrite").save()
    from hudi_acid_verification_spark.operators import bucketed

    bucketed._bucketed_tables(spark, args.sf_dir)
    if not args.no_staging:
        for s_name, s_fn in ops.STAGING.items():
            t0 = time.perf_counter()
            s_fn(spark, args.sf_dir).write.format("noop").mode(
                "overwrite").save()
            print(f"staging {s_name}: {time.perf_counter() - t0:.3f}s",
                  flush=True)

    for name in names:
        times = []
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"{name} run{i}")
            t0 = time.perf_counter()
            ops.QUERIES[name](spark, args.sf_dir).write.format("noop").mode(
                "overwrite").save()
            times.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        if args.plans_out:
            os.makedirs(args.plans_out, exist_ok=True)
            df = ops.QUERIES[name](spark, args.sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(
                    args.plans_out, f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(plan)
        print(f"{name}: " + " ".join(f"{t:.3f}" for t in times), flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
