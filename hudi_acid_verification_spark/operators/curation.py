"""Corpus-curation operators, wave 2: passage-level dedup, marketing
attribution, trend deltas, and malformed-input quarantine.

These extend the LLM-data-pipeline surface (SURVEY §2B / north star)
beyond document-level dedup: production curation works at PASSAGE grain
(C4/RefinedWeb drop repeated paragraphs while keeping their documents),
attributes conversions inside event streams, tracks week-over-week drift
of arrival volumes, and quarantines rows that fail parsing instead of
aborting a 100 TB ingest.

Scale notes are per-operator; the shared discipline is the usual one —
inverted-index shuffles keyed by content hash, collapse-then-window for
calendar frames, and PERMISSIVE-mode reads so one bad byte doesn't kill
a week-long backfill.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import load, query

_PASSAGE_TOKENS = 10  # fixed passage span (tokens per chunk)


@query(
    "pipeline_passage_dedup",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    chunks AS (
        SELECT doc_id, g.i AS idx,
               array_to_string(
                   list_slice(t, g.i * {_PASSAGE_TOKENS} + 1,
                              g.i * {_PASSAGE_TOKENS} + {_PASSAGE_TOKENS}),
                   ' ') AS chunk
        FROM toks,
             LATERAL (
                SELECT unnest(generate_series(
                    0, CAST(ceil(len(t) / {_PASSAGE_TOKENS}.0) AS BIGINT) - 1
                )) AS i
             ) g
    ),
    ranked AS (
        SELECT doc_id, idx, chunk,
               row_number() OVER (
                   PARTITION BY chunk ORDER BY doc_id, idx
               ) AS rn
        FROM chunks
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept,
           string_agg(CASE WHEN rn = 1 THEN chunk END, ' ' ORDER BY idx)
               AS kept_text
    FROM ranked
    GROUP BY doc_id
    """,
)
def pipeline_passage_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passage-level (sub-document) deduplication — the C4/RefinedWeb
    move: a boilerplate passage repeated across the corpus is dropped
    from every document EXCEPT its first occurrence (by (doc_id,
    position) order), and each document is reassembled from its surviving
    passages. Document-level dedup can't do this: two documents sharing
    one boilerplate footer are not near-dups, yet the footer must go.

    Passages are fixed {N}-token spans (deterministic chunking of the
    token stream — the tokenizer-world analogue of paragraph splits).
    First-occurrence is a row_number over (passage → (doc, idx)) — the
    inverted-index shuffle keyed by passage content, the same exchange
    shape as exact dedup, so it scales exactly as far. Reassembly is a
    per-doc sorted fold (array_sort + concat) with NO second shuffle:
    the rollup groups by doc_id.
    """
    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("t"))
    n_chunks = F.ceil(F.size("t") / F.lit(float(_PASSAGE_TOKENS))).cast("int")
    chunks = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.struct(
                    i.alias("idx"),
                    F.array_join(
                        F.slice(
                            F.col("t"),
                            i * _PASSAGE_TOKENS + 1,
                            _PASSAGE_TOKENS,
                        ),
                        " ",
                    ).alias("chunk"),
                ),
            )
        ).alias("c"),
    ).select("doc_id", F.col("c.idx").alias("idx"), F.col("c.chunk").alias("chunk"))
    w = Window.partitionBy("chunk").orderBy("doc_id", "idx")
    ranked = chunks.withColumn("rn", F.row_number().over(w))
    return (
        ranked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
            F.sum(F.when(F.col("rn") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_kept"),
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("rn") == 1, F.struct("idx", "chunk")
                    )
                )
            ).alias("kept"),
        )
        .select(
            "doc_id",
            "n_chunks",
            "n_kept",
            F.when(
                F.col("n_kept") > 0,
                F.array_join(
                    F.transform(F.col("kept"), lambda s: s["chunk"]), " "
                ),
            ).alias("kept_text"),  # NULL (not '') when nothing survives,
            # matching string_agg-over-no-rows
        )
    )


@query(
    "event_attribution_last_touch",
    oracle="""
    WITH ord AS (
        SELECT user_id, event_type, ts, event_id,
               last_value(CASE WHEN event_type != 'purchase'
                               THEN event_type END IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS last_touch
        FROM events
    )
    SELECT COALESCE(last_touch, '(none)') AS channel,
           CAST(count(*) AS BIGINT) AS n_conversions
    FROM ord
    WHERE event_type = 'purchase'
    GROUP BY 1
    """,
)
def event_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch conversion attribution: each ``purchase`` is credited
    to the most recent PRECEDING non-purchase event of the same user —
    the default attribution model of every marketing/product funnel.
    The whole model is one ``lag(... IGNORE NULLS)`` window (Spark:
    ``last(..., ignorenulls)`` over a preceding-rows frame): no
    self-join, no per-user collect, single exchange keyed on user_id.
    Ties in ts break on event_id so credit assignment is deterministic.

    At 100 TB the plan is identical — attribution is embarrassingly
    parallel across users; the rollup collapses to |channels| rows.
    """
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_ns", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touched = e.withColumn(
        "last_touch",
        F.last(
            F.when(F.col("event_type") != "purchase", F.col("event_type")),
            ignorenulls=True,
        ).over(w),
    )
    return (
        touched.filter(F.col("event_type") == "purchase")
        .groupBy(
            F.coalesce(F.col("last_touch"), F.lit("(none)")).alias("channel")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_conversions"))
    )


@query(
    "window_percent_change_wow",
    oracle="""
    WITH daily AS (
        SELECT strftime(ts, '%Y-%m-%d') AS day,
               CAST(count(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1
    )
    SELECT day, n_events,
           lag(n_events, 7) OVER (ORDER BY day) AS n_week_ago,
           CAST(n_events - lag(n_events, 7) OVER (ORDER BY day) AS DOUBLE)
               / lag(n_events, 7) OVER (ORDER BY day) AS wow_change
    FROM daily
    """,
)
def window_percent_change_wow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week percent change of daily event volume — the drift
    monitor a data platform alerts on (a ±30% WoW jump on an ingest
    source usually means an upstream incident, not organic growth).

    Collapse-then-window: events collapse to one row per day FIRST (the
    only pass over raw volume, partial-aggregated); the 7-row lag then
    runs over the tiny calendar frame. The leading 7 days correctly
    report NULL (no baseline), which both engines agree on; the ratio is
    a single division of exact integers.
    """
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
    w = Window.partitionBy(F.lit(0)).orderBy("day")
    lag7 = F.lag("n_events", 7).over(w)
    return daily.select(
        "day",
        "n_events",
        lag7.alias("n_week_ago"),
        ((F.col("n_events") - lag7).cast("double") / lag7).alias(
            "wow_change"
        ),
    )


def _stage_dir(sf_dir: str, name: str) -> str:
    from .sources import _stage_dir as src_stage

    path = src_stage(sf_dir, name)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    return path


_BAD_LINES = 25  # malformed rows injected into the staged CSV


@query(
    "source_csv_malformed",
    oracle=f"""
    SELECT 'good' AS bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(n_regionkey) AS BIGINT) AS key_sum
    FROM nation
    UNION ALL
    SELECT 'corrupt' AS bucket,
           CAST({_BAD_LINES} AS BIGINT) AS n_rows,
           CAST(NULL AS BIGINT) AS key_sum
    """,
)
def source_csv_malformed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERMISSIVE-mode CSV ingestion with quarantine accounting: a staged
    CSV carries the nation fixture plus {B} deliberately malformed lines
    (wrong arity, non-numeric keys); the read captures each bad line in
    ``_corrupt_record`` instead of failing, and the operator reports the
    good/corrupt split with a checksum over the clean rows. This is the
    non-negotiable ingest posture at 100 TB: DROPMALFORMED silently
    loses data, FAILFAST kills a week-long backfill at byte five — the
    quarantine column is the only auditable option.

    The oracle states the expected outcome relationally (every fixture
    row parses; exactly the injected lines quarantine), which pins both
    the parser behavior and the staging integrity.
    """
    nat = load(spark, sf_dir, "nation")
    path = _stage_dir(sf_dir, "nation_malformed.csv")
    rows = nat.select("n_nationkey", "n_name", "n_regionkey").collect()
    with open(path, "w") as f:
        f.write("n_nationkey,n_name,n_regionkey\n")
        for r in rows:
            f.write(f"{r.n_nationkey},{r.n_name},{r.n_regionkey}\n")
        for i in range(_BAD_LINES):
            # wrong arity AND non-numeric key — unparseable under the schema
            f.write(f"bad_{i},x\n")
    schema = (
        "n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT, "
        "_corrupt_record STRING"
    )
    df = (
        spark.read.option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .schema(schema)
        .csv(path)
    )
    df = df.cache()  # one parse feeds both buckets (and _corrupt_record
    # is only visible when the row is materialized with it — a known
    # Spark requirement for referencing the corrupt column)
    good = df.filter(F.col("_corrupt_record").isNull()).agg(
        F.lit("good").alias("bucket"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("n_regionkey").cast("bigint").alias("key_sum"),
    )
    bad = df.filter(F.col("_corrupt_record").isNotNull()).agg(
        F.lit("corrupt").alias("bucket"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.lit(None).cast("bigint").alias("key_sum"),
    )
    return good.unionAll(bad)


# log10(1 + 1/d) precomputed once in Python so BOTH engines receive the
# identical double literal (IEEE log10 itself is not guaranteed
# correctly-rounded across implementations — the constant is)
_BENFORD = {
    1: 0.3010299956639812,
    2: 0.17609125905568124,
    3: 0.12493873660829992,
    4: 0.09691001300805642,
    5: 0.07918124604762482,
    6: 0.06694678963061322,
    7: 0.05799194697768673,
    8: 0.05115252244738129,
    9: 0.04575749056067514,
}


def _benford_case_sql() -> str:
    arms = " ".join(
        f"WHEN {d} THEN CAST({v!r} AS DOUBLE)" for d, v in _BENFORD.items()
    )
    return f"CASE first_digit {arms} END"


@query(
    "quality_benford_deviation",
    oracle=f"""
    WITH digits AS (
        SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                                AS VARCHAR), 1, 1) AS BIGINT) AS first_digit
        FROM orders WHERE o_totalprice >= 1
    ),
    counts AS (
        SELECT first_digit, CAST(count(*) AS BIGINT) AS n
        FROM digits GROUP BY 1
    ),
    total AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM counts)
    SELECT first_digit, n,
           CAST(n AS DOUBLE) / tot AS observed,
           {_benford_case_sql()} AS expected,
           CAST(n AS DOUBLE) / tot - {_benford_case_sql()} AS deviation
    FROM counts, total
    """,
)
def quality_benford_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-digit (Benford) distribution of order totals vs the expected
    log10(1+1/d) shares — the fabricated-data / unit-mixup detector (a
    price column that suddenly violates Benford usually means a currency
    or scaling bug upstream, not fraud — but either way you want the
    alarm). The expected shares are PRECOMPUTED double literals injected
    into both engines, so no runtime log10 enters the comparison;
    observed shares are single divisions of exact counts.

    Scale: one partial-aggregated pass collapsing to ≤ 9 rows; the digit
    extraction is string-on-int (exact, no float formatting ambiguity —
    floor to BIGINT first).
    """
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    digits = o.select(
        F.substring(
            F.floor(F.col("o_totalprice")).cast("bigint").cast("string"), 1, 1
        )
        .cast("bigint")
        .alias("first_digit")
    )
    counts = digits.groupBy("first_digit").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    total = counts.agg(F.sum("n").cast("bigint").alias("tot"))
    expected = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in _BENFORD.items() for x in kv]
        ),
        F.col("first_digit").cast("int"),
    )
    return counts.crossJoin(F.broadcast(total)).select(
        "first_digit",
        "n",
        (F.col("n").cast("double") / F.col("tot")).alias("observed"),
        expected.alias("expected"),
        (F.col("n").cast("double") / F.col("tot") - expected).alias(
            "deviation"
        ),
    )


@query(
    "dedup_canonical_pick",
    oracle="""
    WITH ranked AS (
        SELECT doc_id, source, lang, n_chars, md5(text) AS h,
               row_number() OVER (
                   PARTITION BY md5(text)
                   ORDER BY n_chars DESC, doc_id
               ) AS rnk,
               CAST(count(*) OVER (PARTITION BY md5(text)) AS BIGINT)
                   AS group_size
        FROM documents
    )
    SELECT doc_id, source, lang, n_chars, group_size
    FROM ranked WHERE rnk = 1
    """,
)
def dedup_canonical_pick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship / canonical-record selection: exact-duplicate groups
    (same text hash) keep their HIGHEST-QUALITY member — richest
    (n_chars) first, doc_id as the deterministic tiebreak — not merely
    the first-seen row. This is the master-data-management half of dedup
    that `dedup_exact` (keep-first) doesn't cover: when duplicates differ
    in metadata quality, keep-first discards the better record half the
    time.

    One window over the content-hash partition (the exact-dedup
    exchange) carries both the rank and the group size — no second
    aggregation, no join back. At 100 TB: identical shape to exact
    dedup; the quality ranking is free once the group is co-located.
    """
    d = load(spark, sf_dir, "documents")
    w = Window.partitionBy(F.md5("text")).orderBy(
        F.col("n_chars").desc(), "doc_id"
    )
    wg = Window.partitionBy(F.md5("text"))
    return (
        d.select(
            "doc_id",
            "source",
            "lang",
            "n_chars",
            F.row_number().over(w).alias("rnk"),
            F.count(F.lit(1)).over(wg).cast("bigint").alias("group_size"),
        )
        .filter(F.col("rnk") == 1)
        .select("doc_id", "source", "lang", "n_chars", "group_size")
    )


# Preference-pair margin floor: ×10⁴ lexical-diversity points the chosen
# document must clear the rejected one by for the pair to be trainable.
_PREF_MIN_MARGIN = 500


@query(
    "pipeline_preference_pairs",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, lang, source,
               CAST((len(list_distinct(string_split(text, ' '))) * 10000)
                    // len(string_split(text, ' ')) AS BIGINT) AS score
        FROM documents
    ),
    ranked AS (
        SELECT *,
               row_number() OVER (
                   PARTITION BY lang, source
                   ORDER BY score DESC, doc_id
               ) AS rb,
               row_number() OVER (
                   PARTITION BY lang, source
                   ORDER BY score ASC, doc_id DESC
               ) AS rw
        FROM scored
    )
    SELECT b.lang, b.source,
           b.doc_id AS chosen_id, w.doc_id AS rejected_id,
           b.score AS chosen_score, w.score AS rejected_score,
           b.score - w.score AS margin
    FROM (SELECT * FROM ranked WHERE rb = 1) b
    JOIN (SELECT * FROM ranked WHERE rw = 1) w
      ON b.lang = w.lang AND b.source = w.source
    WHERE b.doc_id <> w.doc_id
      AND b.score - w.score >= {_PREF_MIN_MARGIN}
    """,
)
def pipeline_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preference-pair construction — the DPO/RLHF data-prep step: within
    each comparable cohort (lang, source), pair the highest-scoring
    document (chosen) with the lowest-scoring one (rejected) and keep the
    pair only when the quality margin is decisive (≥ {_PREF_MIN_MARGIN}
    ×10⁻⁴). The score is a lexical-diversity proxy — distinct-token ratio
    in ×10⁴ integer arithmetic — so chosen/rejected/margin all hash
    bit-for-bit cross-engine (a learned reward model would slot into the
    same shape via the text_quality_model serving path).

    Scale shape: ONE window exchange on the cohort key carries both rank
    directions (best-first and worst-first are two row_numbers over the
    same partition — same shuffle), the two rank=1 extracts self-join on
    the cohort key (tiny frames: one row per cohort each side), and the
    margin gate is a post-join filter. No per-pair recompute, no
    all-pairs: at 100 TB the cost is the one groupBy-shaped exchange any
    cohort statistic already pays.
    """
    d = load(spark, sf_dir, "documents")
    # integer DIV end-to-end (no IEEE division) so scores hash cross-engine
    scored = d.select(
        "doc_id",
        "lang",
        "source",
        F.expr(
            "(CAST(size(array_distinct(split(text, ' '))) AS BIGINT)"
            " * 10000) DIV size(split(text, ' '))"
        ).alias("score"),
    )
    wb = Window.partitionBy("lang", "source").orderBy(
        F.col("score").desc(), "doc_id"
    )
    ww = Window.partitionBy("lang", "source").orderBy(
        F.col("score").asc(), F.col("doc_id").desc()
    )
    ranked = scored.select(
        "doc_id", "lang", "source", "score",
        F.row_number().over(wb).alias("rb"),
        F.row_number().over(ww).alias("rw"),
    )
    best = ranked.filter(F.col("rb") == 1).select(
        "lang", "source",
        F.col("doc_id").alias("chosen_id"),
        F.col("score").alias("chosen_score"),
    )
    worst = ranked.filter(F.col("rw") == 1).select(
        "lang", "source",
        F.col("doc_id").alias("rejected_id"),
        F.col("score").alias("rejected_score"),
    )
    return (
        best.join(worst, ["lang", "source"])
        .filter(F.col("chosen_id") != F.col("rejected_id"))
        .withColumn(
            "margin", F.col("chosen_score") - F.col("rejected_score")
        )
        .filter(F.col("margin") >= _PREF_MIN_MARGIN)
        .select(
            "lang", "source", "chosen_id", "rejected_id",
            "chosen_score", "rejected_score", "margin",
        )
    )


# ---- staged dedup-cascade attrition audit (round 8, batch 2) ----------------
_CAS_SHINGLE = 5        # token shingle width for the near gate
_CAS_LEV_MAX = 20       # edit-distance ceiling for the fuzzy gate
_CAS_LEN_BUCKET = 16    # fuzzy-gate blocking: chars DIV bucket


def _cascade_oracle() -> str:
    return f"""
    WITH d AS (
        SELECT doc_id, text, string_split(text, ' ') AS toks
        FROM documents
    ),
    keyed AS (
        SELECT doc_id,
               array_to_string(toks[1:3], ' ') AS k,
               text, toks
        FROM d
    ),
    s1 AS (
        SELECT min(doc_id) AS doc_id FROM keyed GROUP BY k
    ),
    sh AS (
        SELECT k.doc_id,
               array_to_string(k.toks[i:i+{_CAS_SHINGLE - 1}], ' ') AS g
        FROM keyed k JOIN s1 ON s1.doc_id = k.doc_id,
             LATERAL (SELECT unnest(generate_series(
                 1, len(k.toks) - {_CAS_SHINGLE} + 1)) AS i) u
        GROUP BY 1, 2
    ),
    sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
    cand AS (
        SELECT a.doc_id AS lo, b.doc_id AS hi, count(*) AS c
        FROM sh a JOIN sh b ON b.g = a.g AND b.doc_id > a.doc_id
        GROUP BY 1, 2
    ),
    near_pairs AS (
        SELECT c.lo, c.hi
        FROM cand c
        JOIN sz sa ON sa.doc_id = c.lo
        JOIN sz sb ON sb.doc_id = c.hi
        WHERE 3 * c.c >= sa.n + sb.n
    ),
    s2 AS (
        SELECT s1.doc_id FROM s1
        WHERE s1.doc_id NOT IN (SELECT hi FROM near_pairs)
    ),
    blocked AS (
        SELECT k.doc_id, k.toks[1] AS tok0,
               length(k.text) // {_CAS_LEN_BUCKET} AS lb, k.text
        FROM keyed k JOIN s2 ON s2.doc_id = k.doc_id
    ),
    fuzzy_pairs AS (
        SELECT a.doc_id AS lo, b.doc_id AS hi
        FROM blocked a
        JOIN blocked b ON b.tok0 = a.tok0 AND b.lb = a.lb
                       AND b.doc_id > a.doc_id
        WHERE levenshtein(a.text, b.text) <= {_CAS_LEV_MAX}
    ),
    n0 AS (SELECT count(*) AS c FROM d),
    n1 AS (SELECT count(*) AS c FROM s1),
    n2 AS (SELECT count(*) AS c FROM s2),
    n3 AS (SELECT count(DISTINCT hi) AS c FROM fuzzy_pairs)
    SELECT 'exact' AS stage, CAST(n0.c AS BIGINT) AS docs_in,
           CAST(n0.c - n1.c AS BIGINT) AS docs_removed,
           CAST(n1.c AS BIGINT) AS docs_out
    FROM n0, n1
    UNION ALL
    SELECT 'near', CAST(n1.c AS BIGINT), CAST(n1.c - n2.c AS BIGINT),
           CAST(n2.c AS BIGINT)
    FROM n1, n2
    UNION ALL
    SELECT 'fuzzy', CAST(n2.c AS BIGINT), CAST(n3.c AS BIGINT),
           CAST(n2.c - n3.c AS BIGINT)
    FROM n2, n3
    """


@query("pipeline_dedup_cascade", oracle=_cascade_oracle())
def pipeline_dedup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged DEDUP-CASCADE attrition audit — the cheap-to-expensive
    gate ordering every production corpus dedup runs (exact hash first,
    similarity second, edit-distance last, each stage seeing only the
    previous stage's survivors) — reported as the per-stage attrition
    table (stage, docs_in, docs_removed, docs_out) a dataset card
    publishes. Gates: (1) exact first-3-token key, keeper = min doc_id;
    (2) {_CAS_SHINGLE}-token shingle Jaccard ≥ ½ via the integer test
    3·|A∩B| ≥ |A|+|B|, remove the larger id of each pair; (3) blocked
    (first-token, length DIV {_CAS_LEN_BUCKET}) levenshtein ≤
    {_CAS_LEV_MAX}.

    The ORDER is the scale argument: the exact gate is one hash
    aggregate over everything; the shingle posting join runs only on
    stage-1 survivors (and inherits the module family's df-cap
    discipline at scale); the O(len²)-per-pair levenshtein touches only
    blocked stage-2 survivor pairs. Each stage's candidate generation is
    a posting/blocked equi-join — never all-pairs. Counts collapse to
    three 1-row aggregates unioned into the 3-row report.

    Optimization r8: the fuzzy gate uses the BOUNDED levenshtein
    (``levenshtein(ta, tb, {_CAS_LEV_MAX})``) — the banded DP computes
    O(len·k) per pair instead of O(len²) and returns −1 past the bound,
    so the filter is the sign test; survivors' distances are exact, so
    the emitted pair set is unchanged. The gate was 9.7 s of the
    operator's 11.5 s at sf0.1. (Stage-boundary localCheckpoints were
    tried and REVERTED: the single-plan formulation lets Spark reuse
    the shared exchanges and overlap independent stages inside one job,
    which beats sequential eager checkpoints here.)"""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", "text", F.split("text", " ").alias("toks")
    )
    keyed = d.select(
        "doc_id", "text", "toks",
        F.array_join(F.slice("toks", 1, 3), " ").alias("k"),
    )
    s1 = keyed.groupBy("k").agg(F.min("doc_id").alias("doc_id")).select("doc_id")
    surv1 = keyed.join(s1, "doc_id")
    sh = (
        surv1.select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(toks) - {_CAS_SHINGLE} + 1),"
                    f" i -> array_join(slice(toks, i, {_CAS_SHINGLE}), ' '))"
                )
            ).alias("g"),
        )
        .distinct()
    )
    sz = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("doc_id").alias("lo"), "g")
    b = sh.select(F.col("doc_id").alias("hi"), "g")
    cand = (
        a.join(b, "g")
        .filter(F.col("hi") > F.col("lo"))
        .groupBy("lo", "hi")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    near_dupes = (
        cand.join(sz.select(F.col("doc_id").alias("lo"), F.col("n").alias("na")), "lo")
        .join(sz.select(F.col("doc_id").alias("hi"), F.col("n").alias("nb")), "hi")
        .filter(3 * F.col("c") >= F.col("na") + F.col("nb"))
        .select("hi")
        .distinct()
    )
    s2 = s1.join(near_dupes.withColumnRenamed("hi", "doc_id"), "doc_id", "left_anti")
    blocked = keyed.join(s2, "doc_id").select(
        "doc_id",
        "text",
        F.element_at("toks", 1).alias("tok0"),
        F.expr(f"length(text) DIV {_CAS_LEN_BUCKET}").alias("lb"),
    )
    ba = blocked.select(
        F.col("tok0"), F.col("lb"),
        F.col("doc_id").alias("lo"), F.col("text").alias("ta"),
    )
    bb = blocked.select(
        F.col("tok0"), F.col("lb"),
        F.col("doc_id").alias("hi"), F.col("text").alias("tb"),
    )
    fuzzy_dupes = (
        ba.join(bb, ["tok0", "lb"])
        .filter(F.col("hi") > F.col("lo"))
        # bounded levenshtein: banded DP, O(len·k) per pair; returns −1
        # past the bound, so >= 0 ⇔ true distance <= _CAS_LEV_MAX
        .filter(F.levenshtein("ta", "tb", _CAS_LEV_MAX) >= 0)
        .select("hi")
        .distinct()
    )
    n0 = d.agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    n1 = s1.agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    n2 = s2.agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    n3 = fuzzy_dupes.agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    r1 = n0.crossJoin(n1.withColumnRenamed("c", "c1")).select(
        F.lit("exact").alias("stage"),
        F.col("c").alias("docs_in"),
        (F.col("c") - F.col("c1")).cast("bigint").alias("docs_removed"),
        F.col("c1").alias("docs_out"),
    )
    r2 = n1.crossJoin(n2.withColumnRenamed("c", "c2")).select(
        F.lit("near").alias("stage"),
        F.col("c").alias("docs_in"),
        (F.col("c") - F.col("c2")).cast("bigint").alias("docs_removed"),
        F.col("c2").alias("docs_out"),
    )
    r3 = n2.crossJoin(n3.withColumnRenamed("c", "c3")).select(
        F.lit("fuzzy").alias("stage"),
        F.col("c").alias("docs_in"),
        F.col("c3").alias("docs_removed"),
        (F.col("c") - F.col("c3")).cast("bigint").alias("docs_out"),
    )
    return r1.unionByName(r2).unionByName(r3)
