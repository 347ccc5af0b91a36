"""Corpus-quality and corpus-maintenance operators over ``documents``
(north-star LLM-data-pipeline surface, round-2 continuation): Gopher-style
repetition metrics, sequence-length histograms, incremental
new-batch-vs-corpus dedup, a per-(lang, source) dataset card, and URL
parsing/normalization.

The reference has no analytics surface (SURVEY.md §2A note); these are the
quality gates and bookkeeping a 100 TB pretraining pipeline runs alongside
dedup/decontamination. Everything stays in JVM expressions (explode /
groupBy / window / regexp) so whole-stage codegen covers the hot path and
each operator's only shuffles are on its natural keys (doc_id or the
rollup key).

Cross-engine determinism: counts are int64, every ratio is an exact integer
pair divided once as doubles, hash-derived values go through md5 (identical
in both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import load, query

_HIST_WIDTH = 8      # tokens per histogram bucket
_CORPUS_MOD = 3      # doc_id % 3 == 0 rows play the already-ingested corpus


@query(
    "text_repetition_metrics",
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents
    ),
    tc AS (
        SELECT doc_id, term, count(*) AS cnt FROM toks GROUP BY doc_id, term
    ),
    uni AS (
        SELECT doc_id,
               CAST(sum(cnt) AS BIGINT) AS n_tokens,
               CAST(max(cnt) AS BIGINT) AS top_token_cnt,
               CAST(sum(CASE WHEN cnt >= 2 THEN cnt ELSE 0 END) AS BIGINT)
                   AS repeated_tokens
        FROM tc GROUP BY doc_id
    ),
    big AS (
        SELECT d.doc_id,
               count(*) AS n_2grams,
               count(DISTINCT array_to_string(t.l[u.i:u.i+1], ' '))
                   AS n_distinct_2grams
        FROM documents d,
             LATERAL (SELECT string_split(d.text, ' ') AS l) t,
             LATERAL (SELECT unnest(generate_series(1, len(t.l) - 1)) AS i) u
        WHERE len(t.l) >= 2
        GROUP BY d.doc_id
    )
    SELECT u.doc_id, u.n_tokens,
           CAST(u.top_token_cnt AS DOUBLE) / u.n_tokens AS top_token_frac,
           CAST(u.repeated_tokens AS DOUBLE) / u.n_tokens AS repeated_token_frac,
           1.0 - CAST(b.n_distinct_2grams AS DOUBLE) / b.n_2grams
               AS dup_2gram_frac,
           (CAST(u.top_token_cnt AS DOUBLE) / u.n_tokens <= 0.1
            AND 1.0 - CAST(b.n_distinct_2grams AS DOUBLE) / b.n_2grams <= 0.25)
               AS passes_repetition_gate
    FROM uni u JOIN big b ON b.doc_id = u.doc_id
    """,
)
def text_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals per document: top-token fraction,
    fraction of tokens belonging to a term that repeats, duplicate-2-gram
    fraction, and the boolean repetition gate built from them. These are
    the rules production quality filters (Gopher §A.1.1, C4) apply to drop
    boilerplate and degenerate machine text before training.

    Shape (optimization r8): every signal is a PER-DOCUMENT function of
    the token array, so the whole operator is ONE in-row pass — a
    run-length fold over the doc's SORTED token array yields the unigram
    signals (max run = top-token count, tokens in runs ≥ 2 = repeated
    tokens) and ``array_distinct`` over the in-row 2-gram list yields the
    duplicate-bigram signal. Zero exchanges, zero joins (the r1-r3 shape
    paid three doc_id-keyed shuffles + a join for what per-row codegen
    computes in place); at 100 TB the work is proportional to token
    count with NO shuffle at all, the strictly better scale story. The
    arithmetic producing each output double is the identical
    operand sequence as before (exact integer counts cast to double,
    one divide), so results are bit-identical.
    """
    d = load(spark, sf_dir, "documents")
    # Materialize the token array as a column FIRST (optimization r8, same
    # lesson as dedup_repeated_ngrams): split(text) referenced inside the
    # bigram transform lambda re-tokenizes the document once per position;
    # a column reference splits once.
    toked = d.select("doc_id", F.split("text", " ").alias("toks")).filter(
        F.size("toks") >= 2  # same domain as the r1 join output: the
        # bigram arm required size >= 2, and the join was inner
    )
    # run-length fold over the sorted tokens: run = current equal-run
    # length, maxrun = top token count, rep = Σ tokens in runs ≥ 2 (a
    # run reaching 2 credits both members, each extension credits 1)
    uni_fold = F.expr(
        "aggregate(array_sort(toks), "
        "named_struct('prev', CAST(NULL AS STRING), 'run', 0L, "
        "'maxrun', 0L, 'rep', 0L), "
        "(a, t) -> IF(a.prev IS NOT NULL AND t = a.prev, "
        "named_struct('prev', t, 'run', a.run + 1L, "
        "'maxrun', greatest(a.maxrun, a.run + 1L), "
        "'rep', a.rep + IF(a.run = 1L, 2L, 1L)), "
        "named_struct('prev', t, 'run', 1L, "
        "'maxrun', greatest(a.maxrun, 1L), 'rep', a.rep)))"
    )
    grams_of = F.transform(
        F.sequence(F.lit(1), F.size("toks") - 1),
        lambda i: F.array_join(F.slice(F.col("toks"), i, 2), " "),
    )
    per_doc = (
        toked
        .select(
            "doc_id",
            F.size("toks").cast("bigint").alias("n_tokens"),
            uni_fold["maxrun"].cast("bigint").alias("top_token_cnt"),
            uni_fold["rep"].cast("bigint").alias("repeated_tokens"),
            F.size(grams_of).cast("bigint").alias("n_2grams"),
            F.size(F.array_distinct(grams_of))
            .cast("bigint")
            .alias("n_distinct_2grams"),
        )
    )
    top_frac = F.col("top_token_cnt").cast("double") / F.col("n_tokens")
    dup2 = F.lit(1.0) - F.col("n_distinct_2grams").cast("double") / F.col(
        "n_2grams"
    )
    return per_doc.select(
        "doc_id",
        "n_tokens",
        top_frac.alias("top_token_frac"),
        (F.col("repeated_tokens").cast("double") / F.col("n_tokens")).alias(
            "repeated_token_frac"
        ),
        dup2.alias("dup_2gram_frac"),
        ((top_frac <= 0.1) & (dup2 <= 0.25)).alias("passes_repetition_gate"),
    )


@query(
    "text_seqlen_histogram",
    oracle=f"""
    WITH sized AS (
        SELECT len(string_split(text, ' ')) AS n_tokens FROM documents
    ),
    hist AS (
        SELECT n_tokens // {_HIST_WIDTH} AS bucket,
               count(*) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS tokens_total,
               CAST(min(n_tokens) AS BIGINT) AS min_tokens,
               CAST(max(n_tokens) AS BIGINT) AS max_tokens
        FROM sized GROUP BY bucket
    )
    SELECT bucket * {_HIST_WIDTH} AS bucket_lo,
           n_docs, tokens_total, min_tokens, max_tokens,
           CAST(sum(n_docs) OVER (ORDER BY bucket) AS DOUBLE)
               / sum(n_docs) OVER () AS cum_doc_frac
    FROM hist
    """,
)
def text_seqlen_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length histogram of the corpus ({_HIST_WIDTH}-token buckets)
    with the cumulative document fraction — the distribution a pipeline
    inspects to pick packing budgets and truncation limits before
    tokenization.

    Shape: scan → map-side bucket assignment → one tiny aggregate on
    bucket (cardinality = max_len/width, a few hundred at most), then the
    cumulative window runs over that already-tiny frame on a single
    partition — the 100 TB cost is exactly one pass over the corpus.
    """
    sized = load(spark, sf_dir, "documents").select(
        F.size(F.split("text", " ")).alias("n_tokens")
    )
    hist = (
        sized.withColumn("bucket", F.expr(f"n_tokens DIV {_HIST_WIDTH}"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("tokens_total"),
            F.min("n_tokens").cast("bigint").alias("min_tokens"),
            F.max("n_tokens").cast("bigint").alias("max_tokens"),
        )
    )
    w_cum = Window.partitionBy(F.lit(0)).orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy(F.lit(0)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return hist.select(
        (F.col("bucket") * _HIST_WIDTH).alias("bucket_lo"),
        "n_docs",
        "tokens_total",
        "min_tokens",
        "max_tokens",
        (
            F.sum("n_docs").over(w_cum).cast("double")
            / F.sum("n_docs").over(w_all)
        ).alias("cum_doc_frac"),
    )


@query(
    "pipeline_incremental_dedup",
    oracle=f"""
    WITH corpus AS (
        SELECT DISTINCT md5(text) AS h FROM documents
        WHERE doc_id % {_CORPUS_MOD} = 0
    ),
    batch AS (
        SELECT doc_id, source, md5(text) AS h,
               row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM documents WHERE doc_id % {_CORPUS_MOD} != 0
    )
    SELECT b.source,
           count(*) AS n_batch,
           CAST(sum(CASE WHEN b.rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_within_dup,
           CAST(sum(CASE WHEN b.rn = 1 AND c.h IS NOT NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_already_ingested,
           CAST(sum(CASE WHEN b.rn = 1 AND c.h IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_new_kept,
           CAST(sum(CASE WHEN b.rn = 1 AND c.h IS NULL THEN b.doc_id ELSE 0 END)
               AS BIGINT) AS new_doc_sum
    FROM batch b LEFT JOIN corpus c ON c.h = b.h
    GROUP BY b.source
    """,
)
def pipeline_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental corpus update: dedup a NEW ingestion batch first within
    itself (min-doc_id survivor per identical text) and then against the
    already-ingested corpus (docs with doc_id % {_CORPUS_MOD} == 0 play the
    existing store), reporting per-source how many batch docs were
    batch-internal dups, already ingested, or genuinely new. This is the
    steady-state shape of a crawl pipeline — full-corpus re-dedup never
    runs again after bootstrap; every refresh is batch-vs-corpus.

    Shape: both sides key on md5(text); the within-batch window and the
    batch↔corpus hash join shuffle on that same 128-bit key, so one
    exchange of the (small) batch serves both steps, while the corpus side
    in production is a pre-bucketed hash index that never reshuffles —
    Spark's sort-merge join against a bucketed table reads it in place.
    The final rollup keys on source (tiny).
    """
    d = load(spark, sf_dir, "documents").withColumn("h", F.md5("text"))
    corpus = (
        d.filter(F.col("doc_id") % _CORPUS_MOD == 0)
        .select("h")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    batch = d.filter(F.col("doc_id") % _CORPUS_MOD != 0).withColumn(
        "rn", F.row_number().over(Window.partitionBy("h").orderBy("doc_id"))
    )
    kept_new = (F.col("rn") == 1) & F.col("hit").isNull()
    return (
        batch.join(corpus, "h", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_batch"),
            F.sum((F.col("rn") > 1).cast("int"))
            .cast("bigint")
            .alias("n_within_dup"),
            F.sum(((F.col("rn") == 1) & F.col("hit").isNotNull()).cast("int"))
            .cast("bigint")
            .alias("n_already_ingested"),
            F.sum(kept_new.cast("int")).cast("bigint").alias("n_new_kept"),
            F.sum(F.when(kept_new, F.col("doc_id")).otherwise(0))
            .cast("bigint")
            .alias("new_doc_sum"),
        )
    )


@query(
    "pipeline_dataset_card",
    oracle="""
    WITH per AS (
        SELECT lang, source,
               count(*) AS n_docs,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens_total,
               CAST(sum(n_chars) AS BIGINT) AS chars_total,
               count(DISTINCT md5(text)) AS n_distinct_texts
        FROM documents GROUP BY lang, source
    )
    SELECT lang, source, n_docs, tokens_total, chars_total,
           CAST(tokens_total AS DOUBLE) / n_docs AS mean_tokens,
           1.0 - CAST(n_distinct_texts AS DOUBLE) / n_docs AS dup_rate,
           CAST(n_docs AS DOUBLE) / sum(n_docs) OVER () AS corpus_share
    FROM per
    """,
)
def pipeline_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card rollup: the per-(lang, source) accounting block every
    released training corpus publishes — document/token/char volumes, mean
    document length, exact duplicate rate, and each cell's share of the
    corpus.

    Shape: one aggregate keyed on (lang, source) — map-side partials do
    ~all the work since the group cardinality is tiny — then the share
    window runs over the handful of rollup rows. One corpus pass at any
    scale; the exact distinct-count keys on the same group so it rides the
    same shuffle.
    """
    per = (
        load(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(F.split("text", " ")))
            .cast("bigint")
            .alias("tokens_total"),
            F.sum("n_chars").cast("bigint").alias("chars_total"),
            F.countDistinct(F.md5("text")).alias("n_distinct_texts"),
        )
    )
    w_all = Window.partitionBy(F.lit(0)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return per.select(
        "lang",
        "source",
        "n_docs",
        "tokens_total",
        "chars_total",
        (F.col("tokens_total").cast("double") / F.col("n_docs")).alias(
            "mean_tokens"
        ),
        (
            F.lit(1.0)
            - F.col("n_distinct_texts").cast("double") / F.col("n_docs")
        ).alias("dup_rate"),
        (F.col("n_docs").cast("double") / F.sum("n_docs").over(w_all)).alias(
            "corpus_share"
        ),
    )


@query(
    "scalar_url_parse",
    oracle="""
    WITH urls AS (
        SELECT doc_id,
               'https://' || source || '.example.com/' || lang || '/doc-'
                   || CAST(doc_id AS VARCHAR) || '?ref=' || source AS url
        FROM documents
    )
    SELECT doc_id, url,
           regexp_extract(url, '^https?://([^/]+)/', 1) AS host,
           regexp_extract(url, '^https?://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, 'ref=([^&]+)', 1) AS ref_param,
           regexp_extract(url, '^https?://[^/.]+\\.([^/]+)/', 1)
               AS registered_domain
    FROM urls
    """,
)
def scalar_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL synthesis + parsing: builds each document's canonical URL and
    decomposes it into host / path / query-param / registered domain with
    ``parse_url`` (the JVM built-in crawl pipelines use for host-level
    grouping, robots lookups, and per-domain caps). The oracle re-derives
    the same fields with regexes, pinning ``parse_url``'s semantics.

    Shape: pure per-row expressions in one codegen stage — no shuffle, no
    Python; scales with the scan.
    """
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/"),
        F.col("lang"),
        F.lit("/doc-"),
        F.col("doc_id").cast("string"),
        F.lit("?ref="),
        F.col("source"),
    )
    return load(spark, sf_dir, "documents").select(
        "doc_id",
        url.alias("url"),
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("ref")).alias("ref_param"),
        F.regexp_extract(url, r"^https?://[^/.]+\.([^/]+)/", 1).alias(
            "registered_domain"
        ),
    )


@query(
    "dedup_url_canonical",
    oracle="""
    WITH raw AS (
        SELECT doc_id,
               (CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'http://' END)
               || (CASE WHEN doc_id % 3 = 0 THEN upper(source) ELSE source END)
               || '.example.com/' || lang || '/doc-'
               || CAST(doc_id // 4 AS VARCHAR)
               || (CASE WHEN doc_id % 2 = 1 THEN '/' ELSE '' END)
               || (CASE WHEN doc_id % 5 = 0 THEN '?utm_source=feed' ELSE '' END)
                   AS url
        FROM documents
    ),
    canon AS (
        SELECT doc_id, url,
               'https://' || lower(
                   regexp_replace(
                       regexp_replace(
                           regexp_replace(url, '^https?://', ''),
                           '\\?utm_[a-z_]+=[^&]*$', ''),
                       '/$', '')
               ) AS canonical_url
        FROM raw
    )
    SELECT canonical_url,
           min(doc_id) AS keeper_doc_id,
           count(*) AS n_variants,
           count(DISTINCT url) AS n_distinct_raw
    FROM canon
    GROUP BY canonical_url
    """,
)
def dedup_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + dedup: each document's URL arrives in one of
    the messy forms crawlers actually see (http vs https, upper/lowercase
    host, trailing slash, utm tracking params); canonicalization folds all
    variants of the same page (scheme→https, host lowercased, tracking
    params and trailing slash stripped) and dedup keeps the min-doc_id
    keeper per canonical page. URL-level dedup is the cheapest first pass
    of a crawl pipeline — it collapses refetches before any content hash
    is computed.

    Shape: per-row canonicalization is pure codegen'd string ops; the
    dedup is one hash aggregate on the canonical key with map-side
    partials — the same one-shuffle shape as dedup_exact, at any scale.
    """
    url = F.concat(
        F.when(F.col("doc_id") % 2 == 0, F.lit("https://")).otherwise(
            F.lit("http://")
        ),
        F.when(F.col("doc_id") % 3 == 0, F.upper("source")).otherwise(
            F.col("source")
        ),
        F.lit(".example.com/"),
        F.col("lang"),
        F.lit("/doc-"),
        F.expr("doc_id DIV 4").cast("string"),
        F.when(F.col("doc_id") % 2 == 1, F.lit("/")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 5 == 0, F.lit("?utm_source=feed")).otherwise(
            F.lit("")
        ),
    )
    canonical = F.concat(
        F.lit("https://"),
        F.lower(
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(url, r"^https?://", ""),
                    r"\?utm_[a-z_]+=[^&]*$",
                    "",
                ),
                r"/$",
                "",
            )
        ),
    )
    return (
        load(spark, sf_dir, "documents")
        .select("doc_id", url.alias("url"), canonical.alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("n_variants"),
            F.countDistinct("url").alias("n_distinct_raw"),
        )
    )


@query(
    "text_rare_token_score",
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents
    ),
    freq AS (
        SELECT term, count(*) AS gf FROM toks GROUP BY term
    ),
    thresh AS (
        SELECT CAST(sum(gf) AS BIGINT) // 500 AS rare_cut FROM freq
    )
    SELECT t.doc_id,
           count(*) AS n_tokens,
           CAST(sum(f.gf) AS DOUBLE) / count(*) AS mean_token_freq,
           CAST(sum(CASE WHEN f.gf < th.rare_cut THEN 1 ELSE 0 END) AS DOUBLE)
               / count(*) AS rare_frac
    FROM toks t
    JOIN freq f ON f.term = t.term
    CROSS JOIN thresh th
    GROUP BY t.doc_id
    """,
)
def text_rare_token_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequency quality signal: per document, the mean global
    frequency of its tokens and the fraction of tokens rarer than a
    corpus-derived cutoff (total_tokens/500). High mean-frequency docs are
    boilerplate; high rare-frac docs are noise/code/garbled text — this
    integer-exact pair is the deterministic stand-in for LM-perplexity
    quality filters (same join shape, an n-gram LM table instead of
    unigram counts).

    Shape: the global frequency table is vocabulary-sized → BROADCAST to
    the token stream (no corpus shuffle), the scalar cutoff broadcasts as
    a 1-row cross join, and the per-doc rollup keys on doc_id with
    map-side partials. At 100 TB the token stream never shuffles except
    on doc_id — and that exchange carries one row per token only until
    partial aggregation collapses it.
    """
    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    freq = toks.groupBy("term").agg(F.count(F.lit(1)).alias("gf"))
    thresh = freq.agg(
        F.expr("CAST(sum(gf) AS BIGINT) DIV 500").alias("rare_cut")
    )
    return (
        toks.join(F.broadcast(freq), "term")
        .crossJoin(F.broadcast(thresh))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (F.sum("gf").cast("double") / F.count(F.lit(1))).alias(
                "mean_token_freq"
            ),
            (
                F.sum((F.col("gf") < F.col("rare_cut")).cast("int")).cast(
                    "double"
                )
                / F.count(F.lit(1))
            ).alias("rare_frac"),
        )
    )


_PROFILE_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
)


@query(
    "quality_null_profile",
    oracle="""
    SELECT * FROM (
    """
    + "\n    UNION ALL\n    ".join(
        f"""SELECT '{c}' AS column_name,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(*) - count({c}) AS BIGINT) AS n_null,
               CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct
        FROM orders"""
        for c in _PROFILE_COLS
    )
    + """
    )
    """,
)
def quality_null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational column profiler (the data-quality firewall every
    ingestion job runs before training export): per column of ``orders``,
    exact row/null/distinct counts. A null-ratio jump or distinct-count
    collapse is the classic upstream-schema-break signal.

    Shape: ONE pass — all 6 × (count, null-count, exact distinct) run in
    a single Aggregate (Catalyst plans multi-column DISTINCT via one
    Expand: rows replicate 6× pre-shuffle tagged by column, then two
    partial-aggregated exchanges — the distributed form of exact
    multi-distinct), and the 1×18 result row unpivots driver-side-free
    into (column, metrics) rows via stack(). The oracle states the same
    profile as 6 scans; at 100 TB the Expand form reads the table ONCE
    versus the oracle's six reads.
    """
    o = load(spark, sf_dir, "orders")
    aggs = []
    for c in _PROFILE_COLS:
        aggs.append(F.count(F.lit(1)).alias(f"{c}__rows"))
        aggs.append(
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"{c}__null")
        )
        aggs.append(F.countDistinct(F.col(c)).alias(f"{c}__distinct"))
    one = o.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__rows, {c}__null, {c}__distinct" for c in _PROFILE_COLS
    )
    return one.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack_args}) "
            "AS (column_name, n_rows, n_null, n_distinct)"
        )
    ).select(
        "column_name",
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.col("n_null").cast("bigint").alias("n_null"),
        F.col("n_distinct").cast("bigint").alias("n_distinct"),
    )


@query(
    "audit_sequence_gaps",
    oracle="""
    WITH ks AS (
        SELECT DISTINCT o_orderkey AS k FROM orders
    ),
    nxt AS (
        SELECT k, lead(k) OVER (ORDER BY k) AS next_k FROM ks
    )
    SELECT k + 1 AS gap_start,
           next_k - 1 AS gap_end,
           CAST(next_k - k - 1 AS BIGINT) AS gap_len
    FROM nxt
    WHERE next_k - k > 1
    """,
)
def audit_sequence_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surrogate-key continuity audit: every missing run in the orderkey
    sequence as a [gap_start, gap_end] range — the data-integrity probe
    that catches dropped ingestion batches and partial loads (a CDC
    pipeline that silently lost an hour shows up as one fat gap, not as
    anything a row count would flag).

    Gaps-as-ranges, not gaps-as-rows: the lead() window over DISTINCT
    keys emits one row per missing RUN, so a billion-key hole costs one
    output row, never a generate_series explosion. One distinct collapse
    (partial-aggregated) + one ordered window over the key frame.
    """
    o = load(spark, sf_dir, "orders")
    ks = o.select(F.col("o_orderkey").alias("k")).distinct()
    w = Window.partitionBy(F.lit(0)).orderBy("k")
    nxt = ks.withColumn("next_k", F.lead("k").over(w))
    return nxt.filter(F.col("next_k") - F.col("k") > 1).select(
        (F.col("k") + 1).alias("gap_start"),
        (F.col("next_k") - 1).alias("gap_end"),
        (F.col("next_k") - F.col("k") - 1).cast("bigint").alias("gap_len"),
    )


_K_ANON = 5  # groups smaller than this are re-identification risks


@query(
    "quality_k_anonymity",
    oracle=f"""
    WITH qi AS (
        SELECT event_type,
               CAST(extract(hour FROM ts) AS BIGINT) AS hour_of_day,
               CAST(floor(value / 50.0) AS BIGINT) AS value_band,
               user_id
        FROM events
    ),
    eq AS (
        SELECT event_type, hour_of_day, value_band,
               count(*) AS class_size,
               count(DISTINCT user_id) AS n_users
        FROM qi GROUP BY 1, 2, 3
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_classes,
           CAST(sum(CASE WHEN class_size < {_K_ANON}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_risky_classes,
           CAST(sum(CASE WHEN class_size < {_K_ANON}
                         THEN class_size ELSE 0 END) AS BIGINT)
               AS n_risky_rows,
           CAST(min(class_size) AS BIGINT) AS min_k,
           CAST(sum(class_size) AS BIGINT) AS n_rows,
           CAST(sum(n_users) AS BIGINT) AS sum_class_users
    FROM eq GROUP BY event_type
    """,
)
def quality_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over a quasi-identifier tuple — the privacy gate a
    training-data release runs before publishing event logs: bucket rows
    into equivalence classes by (event_type, hour-of-day, value band) and
    report, per event_type, how many classes fall below k={_K_ANON}
    members (re-identification risk), how many rows they expose, and the
    worst-case k.

    Scale shape: one partial-aggregated shuffle on the QI tuple (class
    sizes), then a rollup to |event_type| rows — both map-side combined.
    The distinct-user count per class rides the same first shuffle via
    count(DISTINCT) expanded per-class (class keys are already the
    shuffle key, so no second expand). All outputs exact int64.
    """
    e = load(spark, sf_dir, "events")
    qi = e.select(
        "event_type",
        F.hour("ts").cast("bigint").alias("hour_of_day"),
        F.floor(F.col("value") / 50.0).cast("bigint").alias("value_band"),
        "user_id",
    )
    eq = qi.groupBy("event_type", "hour_of_day", "value_band").agg(
        F.count(F.lit(1)).alias("class_size"),
        F.countDistinct("user_id").alias("n_users"),
    )
    risky = F.col("class_size") < _K_ANON
    return eq.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.sum(F.when(risky, 1).otherwise(0))
        .cast("bigint")
        .alias("n_risky_classes"),
        F.sum(F.when(risky, F.col("class_size")).otherwise(0))
        .cast("bigint")
        .alias("n_risky_rows"),
        F.min("class_size").cast("bigint").alias("min_k"),
        F.sum("class_size").cast("bigint").alias("n_rows"),
        F.sum("n_users").cast("bigint").alias("sum_class_users"),
    )


@query(
    "quality_lang_drift_tv",
    oracle="""
    WITH per AS (
        SELECT source, lang, count(*) AS n
        FROM documents GROUP BY 1, 2
    ),
    src AS (SELECT source, sum(n) AS n_src FROM per GROUP BY source),
    langm AS (SELECT lang, sum(n) AS n_lang FROM per GROUP BY lang),
    tot AS (SELECT sum(n) AS n_tot FROM per),
    full_grid AS (
        SELECT s.source, g.lang, s.n_src, g.n_lang, t.n_tot,
               coalesce(p.n, 0) AS n
        FROM src s CROSS JOIN langm g CROSS JOIN tot t
        LEFT JOIN per p ON p.source = s.source AND p.lang = g.lang
    )
    SELECT source,
           CAST(max(n_src) AS BIGINT) AS n_docs,
           CAST(sum(abs(n * n_tot - n_lang * n_src)) AS BIGINT)
               AS tv_numer_x2,
           CAST(max(n_src) * max(n_tot) AS BIGINT) AS tv_denom,
           CAST(sum(abs(n * n_tot - n_lang * n_src)) AS DOUBLE)
               / (2.0 * max(n_src) * max(n_tot)) AS tv_distance
    FROM full_grid
    GROUP BY source
    """,
)
def quality_lang_drift_tv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total-variation distance between each source's language mix and the
    corpus-global mix — the domain-drift gate of a multi-source ingest:
    TV(p_src, p_global) = 1/2 * sum_lang |p - q|, computed EXACTLY as
    integers (|n*N_tot - n_lang*N_src| summed, divided once at the end),
    so the drift ranking is bit-stable across engines and partitionings —
    unlike a KL divergence whose per-term logs would drift in the last
    ulp.

    Scale shape: one shuffle to (source, lang) counts (tiny domain), then
    broadcast-sized marginals cross-joined into the full grid so absent
    (source, lang) cells contribute their |0 - q| mass; the final rollup
    is |sources| rows. The fact table is touched exactly once.

    Precision: the cross products n·N_tot are computed in DECIMAL(38,0)
    (DuckDB widens to HUGEINT), so the arithmetic never wraps. The
    bigint OUTPUT columns tv_numer_x2/tv_denom bound the reportable
    corpus at n_src·n_tot < 2^63 (~3e9 docs in one source); beyond that,
    consume tv_distance (double) and drop the integer witnesses.
    """
    d = load(spark, sf_dir, "documents")
    per = d.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n"))
    per = per.cache()
    src = per.groupBy("source").agg(F.sum("n").alias("n_src"))
    glob = per.groupBy("lang").agg(F.sum("n").alias("n_lang"))
    tot = per.agg(F.sum("n").alias("n_tot"))
    grid = (
        F.broadcast(src)
        .crossJoin(F.broadcast(glob))
        .crossJoin(F.broadcast(tot))
        .join(per, ["source", "lang"], "left")
        .withColumn("n", F.coalesce(F.col("n"), F.lit(0)))
    )
    dec = "decimal(38,0)"
    numer = F.sum(
        F.abs(
            F.col("n").cast(dec) * F.col("n_tot").cast(dec)
            - F.col("n_lang").cast(dec) * F.col("n_src").cast(dec)
        )
    )
    return grid.groupBy("source").agg(
        F.max("n_src").cast("bigint").alias("n_docs"),
        numer.cast("bigint").alias("tv_numer_x2"),
        (F.max("n_src") * F.max("n_tot")).cast("bigint").alias("tv_denom"),
        (
            numer.cast("double")
            / (F.lit(2.0) * F.max("n_src") * F.max("n_tot"))
        ).alias("tv_distance"),
    )


@query(
    "quality_simpson_diversity",
    oracle="""
    WITH counts AS (
        SELECT source, lang, CAST(count(*) AS BIGINT) AS c
        FROM documents GROUP BY 1, 2
    )
    SELECT source,
           CAST(sum(c) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_langs,
           CAST(((sum(c) * (sum(c) - 1) - sum(c * (c - 1))) * 10000)
                // (sum(c) * (sum(c) - 1)) AS BIGINT) AS simpson_x10k,
           CAST(max(c) * 10000 // sum(c) AS BIGINT) AS berger_parker_x10k
    FROM counts GROUP BY source
    """,
)
def quality_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-diversity audit per source: the UNBIASED Gini-Simpson
    index 1 − Σc(c−1)/(n(n−1)) (probability two documents drawn without
    replacement differ in language) and the Berger-Parker dominance (top
    language's share) — the corpus-balance readout next to
    `pipeline_domain_mix`: a source whose diversity collapses round-over-
    round is silently becoming monolingual.

    Why Simpson and not Shannon entropy: entropy needs ln(), whose last
    bits differ across engines' libm — it can never hash-match. The
    Simpson family is RATIONAL in the category counts, so ×10⁴ integer
    cross-multiplication makes every emitted value exact (the same
    no-transcendentals rule as BM25's rational idf).

    Shape: one partial-aggregated groupBy(source, lang) — the only pass
    over the corpus — then a groupBy(source) over the tiny counts table.
    Both stages map-side combine; at 100 TB the exchange carries
    |sources|×|langs| rows.
    """
    counts = (
        load(spark, sf_dir, "documents")
        .groupBy("source", "lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    # integer DIV throughout (never double-divide-then-cast: the double
    # rounds to nearest before the cast truncates, which can disagree
    # with the oracle's floor division at quotient boundaries)
    return counts.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_langs"),
        F.expr(
            "CAST(((sum(c) * (sum(c) - 1) - sum(c * (c - 1))) * 10000)"
            " DIV (sum(c) * (sum(c) - 1)) AS BIGINT)"
        ).alias("simpson_x10k"),
        F.expr("CAST(max(c) * 10000 DIV sum(c) AS BIGINT)").alias(
            "berger_parker_x10k"
        ),
    )


# Deterministic blocklist lexicon (the fixture vocabulary's "undesirable"
# terms stand in for a real toxicity/spam list — swapping in a production
# lexicon changes this table, not the plan).
_LEX_TERMS = ("slow", "error", "drop")
_LEX_RATE_T_X10K = 500  # block a doc when hits exceed 5% of its tokens


@query(
    "quality_lexicon_gate",
    oracle=f"""
    WITH lex(term) AS (VALUES {", ".join(f"('{t}')" for t in _LEX_TERMS)}),
    toks AS (
        SELECT d.doc_id, d.source, u.tok
        FROM documents d,
             LATERAL (SELECT unnest(string_split(d.text, ' ')) AS tok) u
        WHERE u.tok <> ''
    ),
    per_doc AS (
        SELECT t.doc_id, t.source,
               CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(sum(CASE WHEN l.term IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_hits
        FROM toks t LEFT JOIN lex l ON l.term = t.tok
        GROUP BY 1, 2
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN n_hits * 10000 > {_LEX_RATE_T_X10K} * n_tokens
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_blocked,
           CAST(sum(n_hits) AS BIGINT) AS total_hits,
           CAST(max(n_hits * 10000 // n_tokens) AS BIGINT)
               AS max_hit_rate_x10k
    FROM per_doc GROUP BY source
    """,
)
def quality_lexicon_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocklist-lexicon gate — the term-table companion of the regex PII
    scrub and the hashing-trick quality model: per-token exact matches
    against a broadcast lexicon, a doc blocks when its hit RATE clears
    {_LEX_RATE_T_X10K / 100}% (integer cross-multiplied — no float rate),
    and the per-source rollup is what a curation dashboard shows. A real
    toxicity/spam/brand-safety list is this exact plan with a bigger
    VALUES table: term lists version like models, so they enter as DATA
    (a joinable table), not as code — the reason this is not another
    regex.

    Scale shape: the lexicon BROADCASTS (term lists are KBs–MBs); the
    token stream never shuffles on content — hits fold into per-doc
    partial aggregates inside the scan, then one groupBy(source). At
    100 TB this is one pass, same cost class as `text_token_count`.
    """
    lex = spark.createDataFrame(
        [(t,) for t in _LEX_TERMS], "term string"
    )
    toks = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "source", F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok") != "")
    )
    per_doc = (
        toks.join(F.broadcast(lex), toks.tok == lex.term, "left")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum(F.when(F.col("term").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_hits"),
        )
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(
            F.when(
                F.col("n_hits") * 10000 > _LEX_RATE_T_X10K * F.col("n_tokens"),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_blocked"),
        F.sum("n_hits").cast("bigint").alias("total_hits"),
        F.expr("CAST(max(n_hits * 10000 DIV n_tokens) AS BIGINT)").alias(
            "max_hit_rate_x10k"
        ),
    )
