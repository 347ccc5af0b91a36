"""Scale-ratio bench: the same queries at 1x and 10x data (VERDICT r6 #1).

Runs the scale-sensitive operator set (dedup/LSH family, graph family,
PPJoin, heavy SQL shapes, stream-stream join) against the generated fixture
pair from ``scripts/gen_scale_fixture.py`` and records per-query times at
both sizes plus the 10x scaling ratio. Staged shared artifacts are
pre-warmed as their own timed lines at each scale (same discipline as
bench.py), so per-query ratios compare MARGINAL cost.

Reading the ratios: data grows 10x, so ratio =~ 10 is linear scaling,
=~ 10*log-factor (teens) is n log n (sorts/shuffles), and anything
approaching 100 is quadratic — the failure the plans are designed against.
Planted dup rates are held at ~5% per corpus so dedup OUTPUT volume grows
linearly and ratios measure plan shape, not fixture degeneracy.

Writes BENCH_SCALE.json at the repo root and prints one summary JSON line.

Usage: python scripts/bench_scale.py [--dir /tmp/spark_graft_scale]
       [--only a,b,c] [--budget 30]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from hudi_acid_verification_spark import operators as ops  # noqa: E402
from hudi_acid_verification_spark.session import get_spark  # noqa: E402

# The scale-sensitive set: every operator whose cost is driven by corpus /
# edge / pair volume (the acid_*/stream lifecycle demos are protocol-bound
# fixed-size workloads and stay out). Heaviest first so a timeout still
# covers the queries the verdict flagged.
SCALE_SET = [
    "dedup_prefix_filter_join",
    "graph_triangle_count",
    "dedup_components",
    "dedup_split_leakage",
    "stream_stream_join",
    "graph_pagerank_bipartite",
    "dedup_minhash_accuracy",
    "dedup_near_minhash",
    "dedup_ngram_jaccard",
    "dedup_shingle_containment",
    "dedup_embedding_lsh",
    "dedup_group_split",
    "dedup_semantic_cluster",
    "dedup_threshold_sweep",
    "dedup_exact",
    "dedup_simhash",
    "dedup_fuzzy_levenshtein",
    "similarity_knn_graph",
    "similarity_ivf_trained",
    "similarity_pq_adc",
    "similarity_topk",
    "graph_kcore_peel",
    "graph_label_propagation",
    "graph_common_neighbors",
    "graph_bfs_distance",
    "join_skew_salted",
    "agg_group",
    "q1_pricing_summary",
    "q9_profit_proxy",
    "text_tfidf_topterms",
    "search_bm25_topk",
    "pipeline_pretrain_e2e",
    # round-7 additions
    "dedup_incremental_minhash",
    "similarity_hnsw_beam",
    "multimodal_image_phash",
    "quality_margin_bins",
    "sample_weighted_reservoir",
    "text_zipf_head_share",
    "quality_lexicon_gate",
    "window_gap_interpolate",
    "dedup_cluster_stats",
    # round-9 additions: both corpus-volume-driven and both rewritten
    # (Arrow CDC kernel; packed-int gram keys) — in the set so their
    # scale shape is measured, not argued
    "dedup_cdc_chunks",
    "text_kgram_source_cosine",
    # round-8: the event/window family (VERDICT r7 #1 — the uncovered
    # regime; events replicate 10x with fixture-shaped per-user history,
    # so these measure window/shuffle scaling over 10x keys)
    "event_sessionize",
    "window_retention_cohorts",
    "window_active_users",
    "event_funnel_windowed",
    "sketch_window_distinct",
]


def bench_dir(spark, sf_dir: str, names: list[str], passes: int = 2):
    staging: dict[str, float] = {}
    for s_name, s_fn in ops.STAGING.items():
        t0 = time.perf_counter()
        s_fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        staging[s_name] = round(time.perf_counter() - t0, 3)
    samples: dict[str, list[float]] = {n: [] for n in names}
    errors: dict[str, str] = {}
    for _ in range(passes):
        for n in names:
            if n in errors:
                continue
            t0 = time.perf_counter()
            try:
                ops.QUERIES[n](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception as ex:  # record and keep benching the rest
                errors[n] = repr(ex)[:400]
                continue
            samples[n].append(round(time.perf_counter() - t0, 3))
    return staging, {n: min(xs) for n, xs in samples.items() if xs}, errors


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/spark_graft_scale")
    ap.add_argument("--only", default="")
    ap.add_argument(
        "--budget",
        type=float,
        default=30.0,
        help="flag ratio above this (10x data; 30 =~ generous n log n)",
    )
    ap.add_argument(
        "--spot-out",
        default="",
        help="with --only: write the subset run to this JSON artifact "
        "(per-round scale spot-check of rewritten plans)",
    )
    args = ap.parse_args()
    names = [
        n for n in SCALE_SET if not args.only or n in args.only.split(",")
    ]
    base, large = os.path.join(args.dir, "base"), os.path.join(args.dir, "large")

    spark = get_spark("bench-scale", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    # Warm codegen/JIT on the small tier first.
    ops.QUERIES["q1_pricing_summary"](spark, base).write.format("noop").mode(
        "overwrite"
    ).save()
    from hudi_acid_verification_spark.operators import bucketed

    bucketed._bucketed_tables(spark, base)
    stage_b, t_base, err_b = bench_dir(spark, base, names)
    bucketed._bucketed_tables(spark, large)
    stage_l, t_large, err_l = bench_dir(spark, large, names)

    ratios = {
        n: round(t_large[n] / t_base[n], 2)
        for n in names
        if n in t_base and n in t_large and t_base[n] > 0
    }
    flagged = {
        n: r for n, r in ratios.items() if r is not None and r > args.budget
    }
    out = {
        "data_ratio": 10,
        "base_dir": base,
        "large_dir": large,
        "staging_base_sec": stage_b,
        "staging_large_sec": stage_l,
        "base_sec": t_base,
        "large_sec": t_large,
        "ratio_10x": ratios,
        "budget": args.budget,
        "flagged_over_budget": flagged,
        "errors_base": err_b,
        "errors_large": err_l,
        "base_total_sec": round(sum(t_base.values()), 3),
        "large_total_sec": round(sum(t_large.values()), 3),
    }
    if not args.only:
        with open(os.path.join(REPO, "BENCH_SCALE.json"), "w") as f:
            json.dump(out, f, indent=1)
    elif args.spot_out:
        # per-round spot-check of REWRITTEN plans only (VERDICT r7 #7):
        # staged artifacts amortize, so re-measuring a handful of changed
        # operators is cheap — a fix can't reintroduce a cliff between
        # full tier runs.
        with open(args.spot_out, "w") as f:
            json.dump(out, f, indent=1)
    print(
        json.dumps(
            {
                "metric": "scale_ratio_10x",
                "n_queries": len(names),
                "base_total_sec": out["base_total_sec"],
                "large_total_sec": out["large_total_sec"],
                "suite_ratio": round(
                    out["large_total_sec"] / max(out["base_total_sec"], 1e-9), 2
                ),
                "flagged_over_budget": flagged,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
