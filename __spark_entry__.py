"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY.md §2B via the
registry in ``hudi_acid_verification_spark.operators``.
"""

from __future__ import annotations

import glob
import hashlib
import inspect
import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from hudi_acid_verification_spark import operators as ops
from hudi_acid_verification_spark.session import configure_existing

SF0001 = "/root/testdata/sf0.001"

# Certification order: the round-1 driver checked exactly the FIRST 50
# registry entries, so dict order decides which operators get a driver
# correctness row each round. Tiering (round 2):
#   1. the 17 queries that were red in CORRECTNESS_r01 (decimal/hugeint
#      output typing, fixed this round) — re-certify them green first;
#   2. 33 oracled operators the driver never reached (the ops a user hits
#      first: joins, windows, scans, scalars, set ops, sources, pivoting,
#      subqueries, remaining dedups, text_stats) — tiers 1+2 fill the
#      50-entry window exactly;
#   3. the remaining never-checked oracled ops (text, pipelines, batch-mode
#      streaming windows, UDTF/UDAF, multimodal rollup) — next round's
#      window;
#   4. rows-only demos (no SQL oracle by design);
#   5. the 25 queries already certified green in round 1;
#   6. the acid_* lifecycle demos (rows-only, certified by the harness).
_CERT_ORDER = [
    # tier 0 (round 5) — plans REWRITTEN in r3/r4 after their last driver
    # row (VERDICT r4 directive #2): re-queued for certification under the
    # new plans, ahead of the rest of the pending backlog. The three LSH
    # consumers were force-staled in cert_ledger.json (their green rows
    # predate the r4 banded-LSH rewrite); dedup_prefix_filter_join was
    # never driver-certified.
    "dedup_prefix_filter_join", "dedup_embedding_lsh", "dedup_components",
    "dedup_group_split",
    # tier 1 — round-1 red, fixed
    "q1_pricing_summary", "agg_group", "agg_rollup_cube", "agg_skew_salted",
    "agg_grouping_sets", "join_bucketed_colocated", "q3_shipping_priority",
    "q5_region_revenue", "q7_nation_volume", "q12_priority_by_flag",
    "q19_disjunctive_pred", "q10_returned_revenue", "q15_top_supplier",
    "q6_forecast_revenue", "q9_profit_proxy", "q11_important_value",
    "q2_min_cost_supplier",
    # tier 2 — never driver-checked, high-traffic
    "join_inner_equi", "join_left", "join_semi", "join_anti", "merge_upsert",
    "join_skew_salted", "join_null_safe",
    "window_latest_per_key", "window_rank_topk", "window_running",
    "sort_limit_topk", "window_lag_lead", "window_ntile_distribution",
    "window_range_frame",
    "scan_project", "filter_pred", "in_list_delete_semantics",
    "sample_stratified_hash",
    "scalar_string_date_math", "array_map_json", "scalar_regexp",
    "hof_vector_stats",
    "set_union_except_intersect",
    "source_csv_roundtrip", "source_json_roundtrip", "source_orc_roundtrip",
    "pivot_wide", "unpivot_stack",
    "q4_order_priority", "q17_small_qty_revenue",
    "dedup_simhash", "dedup_fuzzy_levenshtein",
    "text_stats",
    # tier 3 — round-2 additions (LLM-corpus pipeline, PQ ANN, streaming
    # dedup, partitioned source), then the remaining never-checked oracled
    "pipeline_token_pack", "text_pii_scrub", "pipeline_contamination_ngram",
    "pipeline_domain_mix", "text_heavy_hitters", "similarity_pq_adc",
    "stream_dedup_watermark", "source_partitioned_pruned",
    "stream_static_enrich", "pipeline_pretrain_e2e",
    "text_repetition_metrics", "text_seqlen_histogram",
    "pipeline_incremental_dedup", "pipeline_dataset_card",
    "scalar_url_parse", "sketch_countmin_topk", "sketch_bloom_membership",
    "dedup_semantic_cluster", "window_gap_fill",
    "dedup_url_canonical", "text_rare_token_score", "window_active_users",
    "join_interval_overlap", "dedup_shingle_containment",
    "dedup_repeated_ngrams", "pipeline_shard_assignment",
    "acid_bloom_lookup", "text_quality_model", "agg_weighted_median",
    "join_bloom_prefilter", "graph_pagerank_bipartite",
    "window_cumulative_users", "similarity_recall_eval",
    "embedding_quantize_int8", "dedup_split_leakage",
    "window_retention_cohorts", "join_asof_tolerance",
    "agg_bitmap_distinct", "agg_bitmap_overlap", "window_activity_streak",
    "search_hybrid_rrf", "sql_text_analytics", "audit_table_fingerprint",
    "event_time_to_convert", "pipeline_gate_ablation",
    "text_lang_id", "text_quality_score", "text_token_count",
    "text_fingerprint", "text_tfidf_topterms",
    "event_funnel", "pipeline_corpus_clean",
    "stream_tumbling", "stream_sliding", "stream_session",
    "stream_stream_join",
    "udtf_token_spans", "udaf_pandas_grouped",
    "multimodal_metadata_agg",
    # tier 3b — round-3 additions (oracled; queue behind the r2 backlog)
    "multimodal_container_decode", "event_sessionize", "event_anomaly_mad",
    "agg_corr_exact", "pipeline_mix_temperature", "text_ngram_novelty",
    "source_parquet_schema_merge", "pipeline_feature_denorm",
    "graph_triangle_count", "graph_degree_distribution",
    "sketch_histogram_quantile", "event_markov_transitions",
    "pipeline_epoch_shuffle", "window_ohlc_bars",
    "quality_null_profile", "similarity_range_search",
    "embedding_covariance_exact",
    "sketch_hll_merge", "agg_hierarchy_share",
    "source_dynamic_partition_pruning", "text_token_lift",
    "pipeline_quality_bucket_sample",
    "pipeline_passage_dedup", "event_attribution_last_touch",
    "window_percent_change_wow", "source_csv_malformed",
    "window_rolling_median", "event_inter_arrival_stats",
    "join_asof_nearest", "quality_benford_deviation",
    "dedup_canonical_pick",
    "event_funnel_windowed", "scalar_penny_allocation",
    "event_rfm_segmentation", "join_scd2_point_in_time",
    "agg_regression_exact", "agg_mode_exact", "quality_outlier_iqr",
    "pipeline_length_bucket_pack", "embedding_pca_power",
    "audit_sequence_gaps", "event_heatmap_dow_hour",
    "event_top_paths", "text_vocab_chi2_drift",
    "ml_tree_ensemble_score", "pipeline_epoch_mixture",
    "source_text_lines", "event_burst_zscore",
    "text_sentence_segment", "graph_common_neighbors",
    "multimodal_image_ahash", "event_ewma_daily", "graph_kcore_peel",
    "text_readability_fre", "agg_pareto_coverage",
    "event_ab_assignment_lift", "agg_gini_coefficient",
    "pipeline_chunk_overlap", "multimodal_audio_energy_gate",
    "event_seasonal_naive_eval", "event_cusum_changepoint",
    "event_concurrency_peak", "graph_bfs_distance",
    "pipeline_tokenizer_fertility", "dedup_prefix_boilerplate",
    "search_bm25_topk", "sql_recursive_spine", "scalar_variant_shred",
    "sql_pipe_syntax", "sql_scalar_udf", "ml_confusion_eval",
    "ml_calibration_bins", "pipeline_curriculum_phases",
    "quality_constraint_suite", "dedup_minhash_accuracy",
    "similarity_matryoshka_prefix",
    "agg_filter_clause", "agg_string_concat_ordered",
    "graph_label_propagation", "join_lateral_topn",
    "scalar_try_arith_ansi", "scalar_interval_arithmetic",
    "window_drawdown_max", "event_hazard_table",
    "warehouse_small_file_compaction",
    "quality_k_anonymity", "quality_lang_drift_tv", "join_strategy_hints",
    "source_xml_roundtrip", "sql_group_by_all",
    "pipeline_preference_pairs", "warehouse_column_stats",
    "pipeline_sft_masking", "similarity_knn_graph",
    "scalar_binary_codecs", "pipeline_tokenizer_oov_rate",
    # tier 3c — round-6 additions (registry unfrozen per VERDICT r5
    # directive #2; all oracled, queued behind the r5 backlog so the
    # never-certified names drain first)
    "sketch_quantile_merge", "sketch_theta_setops", "sketch_window_distinct",
    "dedup_fuzzy_jaro_winkler", "dedup_survivorship_merge",
    "ml_auc_roc", "event_trend_mann_kendall", "event_survival_km",
    "quality_simpson_diversity", "pipeline_bigram_coverage",
    "sample_weighted_systematic", "warehouse_incremental_mv",
    "warehouse_scd2_build", "window_bollinger_breach",
    "dedup_threshold_sweep",
    # tier 4 — rows-only by design
    "pipeline_bpe_merges", "pipeline_bpe_encode",
    "agg_approx_distinct", "multimodal_decode_features",
    "multimodal_frame_sample", "stream_watermark_late",
    "stream_stateful_fold", "stream_transform_with_state",
    "udf_cosine_pandas", "udf_state_fold", "source_binaryfile_ingest",
    "udf_quality_model_pandas", "acid_table_detail",
    "acid_ttl_retention",
    # tier 5 — green in CORRECTNESS_r01
    "agg_distinct", "agg_percentiles", "agg_stats_moments",
    "agg_arg_extremes", "similarity_topk", "similarity_ann_lsh",
    "dedup_embedding_cosine", "similarity_ivf", "similarity_ivf_trained",
    "similarity_kmeans_multi",
    "join_asof_carry", "join_range_band", "q18_large_orders",
    "q14_promo_revenue", "q21_sole_returner", "q22_idle_customers",
    "q13_custdist", "q8_market_share", "q16_supplier_cnt",
    "q20_excess_suppliers", "dedup_exact", "dedup_ngram_jaccard",
    "dedup_near_minhash",
    # tier 6 — acid lifecycle demos (harness-certified)
    "acid_snapshot_read", "acid_incremental_read", "acid_stream_ingest",
    "acid_stream_merge_mor", "acid_mor_lifecycle", "acid_cdc_restore",
    "acid_incremental_agg_maintenance", "acid_zorder_skipping",
    "acid_partition_evolution", "acid_clone_branching",
    "acid_schema_evolution",
    # tier 7 (round 7) — new operators, never driver-certified
    "sample_weighted_reservoir", "quality_margin_bins",
    "dedup_incremental_minhash", "multimodal_image_phash",
    "similarity_hnsw_beam", "text_zipf_head_share", "quality_lexicon_gate",
    "window_gap_interpolate", "dedup_cluster_stats",
    # tier 8 (round 8) — new operators, never driver-certified
    "dedup_cdc_chunks", "text_lang_segments", "dedup_dbscan_lsh",
    "audit_join_strategies", "graph_clustering_coefficient",
    "graph_neighborhood_jaccard", "sample_bootstrap_ci",
    "text_kgram_source_cosine", "event_decay_ltv",
    "graph_resource_allocation", "window_rsi_momentum",
    "ml_ks_separation", "agg_hhi_concentration", "agg_hoover_index",
    "pipeline_dedup_cascade",
]


def _collect_code_names(code) -> set[str]:
    """Global names referenced by a code object, including nested
    functions/lambdas/comprehensions (their code objects live in
    ``co_consts``)."""
    import types

    names = set(code.co_names)
    for const in code.co_consts:
        if isinstance(const, types.CodeType):
            names |= _collect_code_names(const)
    return names


def _hash_payload(name: str) -> str | None:
    """The staleness payload for one registered operator: its own source,
    the source of every SAME-MODULE helper (function or class) it references
    one level deep, every same-module scalar constant it references, and its
    oracle SQL.

    This closes the r5 helper blind spot (VERDICT r5 "What's wrong" #1):
    editing a private helper like ``graph._pair_edges`` now flips every
    registered consumer to stale automatically — no ``--force-stale`` honor
    system for one-level helpers. Cross-module helpers (``operators.load``,
    ``materialize_once``) and deeper transitive edits remain out of scope by
    design (they are infrastructure shared by ALL operators; hashing them
    would re-queue the whole registry on any touch) and still take the
    documented ``--force-stale`` path when a value-changing edit lands there.
    """
    fn = ops.QUERIES.get(name)
    if fn is None:
        return None
    try:
        src = inspect.getsource(fn)
    except (OSError, TypeError):
        return None
    parts = [src]
    mod = inspect.getmodule(fn)
    if mod is not None:
        fn_names = _collect_code_names(fn.__code__)
        const_names = set(fn_names)
        helpers: list[tuple[str, str]] = []
        for ref in sorted(fn_names):
            obj = getattr(mod, ref, None)
            if obj is None:
                continue
            if (inspect.isfunction(obj) or inspect.isclass(obj)) and getattr(
                obj, "__module__", None
            ) == mod.__name__:
                try:
                    helpers.append((ref, inspect.getsource(obj)))
                except (OSError, TypeError):
                    continue
                # module constants referenced by a level-1 helper are part of
                # the operator's behavior too (plan-invisible closure
                # constants like ann._DUP_TAU — ADVICE r5); hash their
                # VALUES, but do not recurse into level-2 functions.
                if inspect.isfunction(obj):
                    const_names |= _collect_code_names(obj.__code__)
        for ref, hsrc in helpers:
            parts.append(f"--helper:{ref}--\n{hsrc}")
        for ref in sorted(const_names):
            obj = getattr(mod, ref, None)
            if obj is not None and isinstance(
                obj, (bool, int, float, str, bytes, tuple, frozenset)
            ):
                # unordered collections repr in per-process-random order
                # (PYTHONHASHSEED) — canonicalize so the staleness hash
                # cannot flap between driver runs (ADVICE r6). Recursive
                # (ADVICE r7): a frozenset nested inside a tuple must
                # canonicalize too, not just the outermost type. The
                # formatting mirrors repr() exactly for scalars and plain
                # tuples so pre-existing ledger hashes are unchanged.
                parts.append(f"--const:{ref}={_canon_const(obj)}--")
    parts.append("--oracle--\n" + ops.ORACLES.get(name, ""))
    return "\n".join(parts)


def _canon_const(obj) -> str:
    """PYTHONHASHSEED-independent repr of a hashable constant: unordered
    collections (frozensets) sort their elements at EVERY nesting depth —
    a frozenset inside a tuple canonicalizes the same as a top-level one
    (ADVICE r7; the r6 fix only special-cased the outermost type). For
    scalars and plain tuples the output is byte-identical to ``repr``,
    so certified ledger hashes for such constants do not move."""
    if isinstance(obj, frozenset):
        inner = ", ".join(_canon_const(x) for x in sorted(obj, key=repr))
        return f"frozenset([{inner}])"
    if isinstance(obj, tuple):
        inner = ", ".join(_canon_const(x) for x in obj)
        if len(obj) == 1:
            inner += ","
        return f"({inner})"
    return repr(obj)


def _source_hash(name: str) -> str | None:
    """sha256 staleness key for the certification ledger: a driver row is
    only trusted while the code it certified is unchanged (VERDICT r4
    "What's wrong" #2; helper coverage per r5 #1 — see ``_hash_payload``)."""
    payload = _hash_payload(name)
    if payload is None:
        return None
    return hashlib.sha256(payload.encode()).hexdigest()


def _certified_names() -> set[str]:
    """Names already certified by the external gate, read from the driver's
    own CORRECTNESS_r*.json artifacts: a hash-green row, or a rows-only row
    that ran (``no_oracle`` with a row count). Red/crashed rows stay
    uncertified so they rotate back into the window.

    A certification is dropped (name re-queued) when ``cert_ledger.json``
    records a different source hash than the operator's current one — i.e.
    the plan was rewritten after its green row. Names absent from the
    ledger are trusted as-is (legacy bootstrap); ``scripts/
    update_cert_ledger.py`` (run at round start) keeps the ledger current.
    """
    done: set[str] = set()
    here = os.path.dirname(os.path.abspath(__file__))
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            if row.get("hash_match") is True or (
                row.get("err") == "no_oracle"
                and row.get("spark_rows") is not None
            ):
                done.add(name)
    try:
        with open(os.path.join(here, "cert_ledger.json")) as f:
            ledger = json.load(f)
    except (OSError, ValueError):
        ledger = {}
    stale = {
        name
        for name in done
        if name in ledger and ledger[name] != _source_hash(name)
    }
    return done - stale


# How the ~50-entry certification window splits between pending oracled
# queries and pending rows-only demos: rows-only demos queued strictly
# behind 100+ pending oracled entries would never reach the driver, so up
# to _WINDOW_ROWS_ONLY of them ride in every window, and pending oracled
# entries fill the REST of the 50 slots (round 5: five rows-only demos are
# pending — three never driver-run plus the two staled by the lifecycle
# memoization — so 45 oracled entries fit instead of a fixed 35).
_WINDOW_TOTAL = 50
_WINDOW_ROWS_ONLY = 15


def _ordered_names() -> list[str]:
    """Certification-priority order: the gate checks only the FIRST ~50
    entries each round, so rotate automatically — never-certified queries
    first, then everything already certified in a past round
    (re-certification is harmless). Each window interleaves pending
    rows-only demos after the first _WINDOW_ORACLED pending oracled
    entries so the demos' driver rows land within a round or two instead
    of queueing behind the whole oracled backlog. Within each class,
    _CERT_ORDER's hand-tuned order holds; registry names missing from
    _CERT_ORDER are appended so a new operator can never be silently
    dropped."""
    listed = [n for n in _CERT_ORDER if n in ops.QUERIES]
    base = listed + [n for n in ops.QUERIES if n not in set(listed)]
    done = _certified_names()
    pending_oracled = [n for n in base if n not in done and n in ops.ORACLES]
    pending_rows = [n for n in base if n not in done and n not in ops.ORACLES]
    certified = [n for n in base if n in done]
    n_rows = min(len(pending_rows), _WINDOW_ROWS_ONLY)
    n_oracled = _WINDOW_TOTAL - n_rows
    return (
        pending_oracled[:n_oracled]
        + pending_rows[:n_rows]
        + pending_oracled[n_oracled:]
        + pending_rows[n_rows:]
        + certified
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-style pricing summary) on /root/testdata/sf0.001."""
    configure_existing(spark)
    return ops.QUERIES["q1_pricing_summary"](spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2B."""

    def wrap(fn: ops.QueryFn) -> ops.QueryFn:
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            configure_existing(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(ops.QUERIES[name]) for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query name (rows-only ops are absent)."""
    return {n: ops.ORACLES[n] for n in _ordered_names() if n in ops.ORACLES}
