"""Training-corpus preparation operators over ``documents`` (north-star
LLM-data-pipeline surface, round-2 additions): token-budget sequence
packing, PII scrubbing, benchmark-contamination screening, domain-mixture
resampling, corpus-level heavy hitters, and the end-to-end pretraining
pipeline composite (gate → dedup → decontaminate → mix → pack) that chains
them as one declarative plan.

The reference has no analytics surface (SURVEY.md §2A note); these are the
operations a 100 TB pretraining pipeline runs between raw ingestion and
tokenizer output. Everything is JVM-side expressions (split / higher-order
array functions / regexp / window) — no Python rows, so whole-stage codegen
covers the hot paths and each operator's shuffle is on its natural key.

Cross-engine determinism: counts are int64; token hashes are md5 (identical
in both engines); ratios are exact-integer counts divided once as doubles;
selection uses md5-ordered row_number with doc_id tie-break (total order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import load, query

_PACK_BUDGET = 512  # tokens per training sequence pack
_NGRAM = 5          # contamination shingle width
_BENCH_MOD = 17     # doc_id % 17 == 0 rows play the held-out benchmark set
_TOP_TERMS = 25

# Order matters: emails are scrubbed before digit runs (emails contain digits).
_EMAIL_RE = "[a-z0-9]+@[a-z0-9]+\\.[a-z]+"
_NUM_RE = "[0-9]+"


@query(
    "pipeline_token_pack",
    oracle=f"""
    WITH sized AS (
        SELECT doc_id, source,
               len(string_split(text, ' ')) AS n_tokens
        FROM documents
    ),
    offs AS (
        SELECT doc_id, source, n_tokens,
               CAST(sum(n_tokens) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) - n_tokens AS BIGINT) AS start_off
        FROM sized
    )
    SELECT source,
           start_off // {_PACK_BUDGET} AS pack_id,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
           CAST(min(doc_id) AS BIGINT) AS first_doc
    FROM offs
    GROUP BY source, pack_id
    """,
)
def pipeline_token_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sequence packing: documents are laid end-to-end per
    source in doc_id order and cut into ~512-token training packs (a doc
    belongs to the pack where its start offset falls — the contiguous
    packing rule LLM pipelines use to build fixed-length sequences without
    shuffling document order).

    One window (cumulative token sum partitioned by source) plus one
    aggregate on (source, pack_id). Partitioning by source keeps the sort
    local to each source's shard — there is no global order, so at 100 TB
    every source packs independently and the plan has exactly one shuffle
    on source. Pack ids are offsets, not row numbers, so the result is
    independent of physical row order.
    """
    d = load(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(F.split("text", " ")).alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offs = d.withColumn(
        "start_off",
        (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("bigint"),
    )
    return (
        offs.withColumn(
            "pack_id", F.expr(f"start_off DIV {_PACK_BUDGET}")
        )
        .groupBy("source", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("pack_tokens"),
            F.min("doc_id").cast("bigint").alias("first_doc"),
        )
    )


@query(
    "text_pii_scrub",
    oracle=f"""
    SELECT doc_id,
           len(regexp_extract_all(text, '{_EMAIL_RE}')) AS n_emails,
           len(regexp_extract_all(text, '{_NUM_RE}')) AS n_numbers,
           length(regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                                 '{_NUM_RE}', '<NUM>', 'g')) AS scrubbed_len,
           md5(regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                              '{_NUM_RE}', '<NUM>', 'g')) AS scrubbed_md5
    FROM documents
    """,
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex PII scrubbing: mask email-shaped tokens then digit runs,
    reporting per-document redaction counts and an md5 of the scrubbed
    text (so the oracle verifies the full rewritten string, not just
    counts). Pure regexp_replace/regexp_count — stays in codegen, scales
    with the scan, no shuffle at all.

    The two patterns here stand in for the production rule pack (emails,
    phones, SSNs, addresses); rule packs stay deterministic and auditable
    where ML-based PII models are not — the standard first pass.
    """
    scrubbed = F.regexp_replace(
        F.regexp_replace(F.col("text"), _EMAIL_RE, "<EMAIL>"),
        _NUM_RE,
        "<NUM>",
    )
    return load(spark, sf_dir, "documents").select(
        "doc_id",
        F.regexp_count("text", F.lit(_EMAIL_RE)).alias("n_emails"),
        F.regexp_count("text", F.lit(_NUM_RE)).alias("n_numbers"),
        F.length(scrubbed).alias("scrubbed_len"),
        F.md5(scrubbed).alias("scrubbed_md5"),
    )


@query(
    "pipeline_contamination_ngram",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    grams AS (
        SELECT doc_id, md5(array_to_string(t[u.i:u.i+{_NGRAM - 1}], ' ')) AS g
        FROM toks,
             LATERAL (SELECT unnest(generate_series(1, len(t) - {_NGRAM - 1})) AS i) u
        WHERE len(t) >= {_NGRAM}
    ),
    bench AS (
        SELECT DISTINCT g FROM grams WHERE doc_id % {_BENCH_MOD} = 0
    ),
    corpus AS (
        SELECT * FROM grams WHERE doc_id % {_BENCH_MOD} != 0
    )
    SELECT c.doc_id,
           count(*) AS n_grams,
           CAST(sum(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_contaminated,
           CAST(sum(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
               / count(*) AS contamination_ratio
    FROM corpus c LEFT JOIN bench b ON b.g = c.g
    GROUP BY c.doc_id
    """,
)
def pipeline_contamination_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination screening: every training document is scored
    by how many of its 5-gram token shingles appear in a held-out benchmark
    set (docs with doc_id % 17 == 0 stand in for the eval suite). The
    standard decontamination pass before pretraining.

    Shape: one pass shingles the benchmark docs into a DISTINCT gram-hash
    set — eval suites are tiny relative to the corpus, so that set
    BROADCASTS; the corpus-side shingle stream then left-joins it with no
    shuffle of the corpus (map-side hash probe) and aggregates per doc_id
    (map-side partial). At 100 TB this is scan + broadcast probe + one
    doc-keyed shuffle — the only scalable decontamination shape.
    """
    # Materialize the token array as a column FIRST (optimization r8, same
    # lesson as dedup_repeated_ngrams): referencing split(text) inside the
    # transform lambda re-tokenizes the document once per gram position —
    # O(tokens²) splits per doc; a column reference splits once.
    grams_of = F.transform(
        F.sequence(F.lit(1), F.size("toks") - (_NGRAM - 1)),
        lambda i: F.md5(F.array_join(F.slice(F.col("toks"), i, _NGRAM), " ")),
    )
    grams = (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.split("text", " ").alias("toks"))
        .filter(F.size("toks") >= _NGRAM)
        .select("doc_id", F.explode(grams_of).alias("g"))
    )
    bench = (
        grams.filter(F.col("doc_id") % _BENCH_MOD == 0)
        .select("g")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    corpus = grams.filter(F.col("doc_id") % _BENCH_MOD != 0)
    return (
        corpus.join(F.broadcast(bench), "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0)))
            .cast("bigint")
            .alias("n_contaminated"),
            (
                F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("double")
                / F.count(F.lit(1))
            ).alias("contamination_ratio"),
        )
    )


@query(
    "pipeline_domain_mix",
    oracle="""
    WITH weighted AS (
        SELECT source, count(*) AS n_docs,
               CAST(('0x' || substr(md5(source), 1, 8)) AS BIGINT) % 5 + 1 AS weight
        FROM documents GROUP BY source
    ),
    totals AS (
        SELECT CAST(sum(n_docs) AS BIGINT) // 2 AS sample_budget,
               CAST(sum(weight) AS BIGINT) AS total_weight
        FROM weighted
    ),
    quota AS (
        SELECT w.source, w.weight,
               (w.weight * t.sample_budget) // t.total_weight AS n_target
        FROM weighted w, totals t
    ),
    ranked AS (
        SELECT d.doc_id, d.source, q.weight, q.n_target,
               row_number() OVER (
                   PARTITION BY d.source
                   ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id
               ) AS rn
        FROM documents d JOIN quota q ON q.source = d.source
    )
    SELECT source, CAST(weight AS BIGINT) AS weight,
           CAST(n_target AS BIGINT) AS n_target,
           count(*) AS n_selected,
           CAST(sum(doc_id) AS BIGINT) AS sel_doc_sum
    FROM ranked
    WHERE rn <= n_target
    GROUP BY source, weight, n_target
    """,
)
def pipeline_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture resampling: each source (domain) gets a deterministic
    mixture weight (md5-derived 1..5, standing in for the tuned sampling
    weights of a data recipe); half the corpus is the sampling budget, split
    across sources proportionally to weight; each source then contributes
    its md5-ordered top n_target documents — a reproducible weighted
    downsample, the way pretraining mixes are actually materialized.

    Shape: per-source counts (tiny aggregate) → scalar budget (1 row,
    crossJoin broadcast) → quota join back (broadcast: #sources rows) →
    per-source md5-ordered window limit. The only corpus-wide shuffle is
    the window partitioned by source; the md5 sort key makes the selection
    independent of physical row order AND uniformly spread, unlike head-N.
    """
    d = load(spark, sf_dir, "documents")
    weight = (
        F.conv(F.substring(F.md5("source"), 1, 8), 16, 10).cast("bigint") % 5 + 1
    )
    weighted = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"), F.first(weight).alias("weight")
    )
    totals = weighted.agg(
        F.expr("CAST(sum(n_docs) AS BIGINT) DIV 2").alias("sample_budget"),
        F.sum("weight").cast("bigint").alias("total_weight"),
    )
    quota = (
        weighted.crossJoin(F.broadcast(totals))
        .select(
            "source",
            "weight",
            F.expr("(weight * sample_budget) DIV total_weight").alias("n_target"),
        )
    )
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    ranked = (
        d.join(F.broadcast(quota), "source")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= F.col("n_target"))
    )
    return ranked.groupBy("source", "weight", "n_target").agg(
        F.count(F.lit(1)).alias("n_selected"),
        F.sum("doc_id").cast("bigint").alias("sel_doc_sum"),
    )


@query(
    "text_heavy_hitters",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents
    ),
    counts AS (
        SELECT term, count(*) AS cnt, count(DISTINCT doc_id) AS n_docs
        FROM toks WHERE term <> '' GROUP BY term
    )
    SELECT term, cnt, n_docs,
           row_number() OVER (ORDER BY cnt DESC, term) AS rnk
    FROM counts
    ORDER BY cnt DESC, term
    LIMIT {_TOP_TERMS}
    """,
)
def text_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level heavy hitters: the 25 most frequent terms with their
    total count and document frequency, deterministic tie-break on the
    term itself. The exact two-level aggregate is the oracle baseline; at
    100 TB the same query runs with map-side partial aggregation doing
    almost all the work (term cardinality ≪ token count) and
    TakeOrderedAndProject merging per-partition top-k heaps — or swaps in
    a count-min sketch when the vocabulary itself stops fitting.
    """
    toks = (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .filter(F.col("term") != "")
    )
    counts = toks.groupBy("term").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.countDistinct("doc_id").alias("n_docs"),
    )
    top = counts.orderBy(F.col("cnt").desc(), "term").limit(_TOP_TERMS)
    w = Window.partitionBy(F.lit(0)).orderBy(F.col("cnt").desc(), "term")
    return top.withColumn("rnk", F.row_number().over(w))


@query(
    "pipeline_pretrain_e2e",
    oracle=f"""
    WITH gated AS (
        SELECT doc_id, text, source,
               len(string_split(text, ' ')) AS n_tokens
        FROM documents
        WHERE len(string_split(text, ' ')) >= 20
          AND CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
              / len(string_split(text, ' ')) >= 0.5
    ),
    deduped AS (
        SELECT doc_id, text, source, n_tokens FROM (
            SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
            FROM gated
        ) WHERE rn = 1
    ),
    grams AS (
        SELECT d.doc_id,
               md5(array_to_string(t.l[u.i:u.i+{_NGRAM - 1}], ' ')) AS g
        FROM deduped d,
             LATERAL (SELECT string_split(d.text, ' ') AS l) t,
             LATERAL (SELECT unnest(generate_series(1, len(t.l) - {_NGRAM - 1})) AS i) u
    ),
    bench AS (
        SELECT DISTINCT md5(array_to_string(t.l[u.i:u.i+{_NGRAM - 1}], ' ')) AS g
        FROM documents d,
             LATERAL (SELECT string_split(d.text, ' ') AS l) t,
             LATERAL (SELECT unnest(generate_series(1, len(t.l) - {_NGRAM - 1})) AS i) u
        WHERE d.doc_id % {_BENCH_MOD} = 0
    ),
    contam AS (
        SELECT c.doc_id,
               CAST(sum(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
                   / count(*) AS ratio
        FROM grams c LEFT JOIN bench b ON b.g = c.g
        GROUP BY c.doc_id
    ),
    clean AS (
        SELECT d.* FROM deduped d
        JOIN contam x ON x.doc_id = d.doc_id
        WHERE d.doc_id % {_BENCH_MOD} != 0 AND x.ratio < 0.3
    ),
    weighted AS (
        SELECT source, count(*) AS n_docs,
               CAST(('0x' || substr(md5(source), 1, 8)) AS BIGINT) % 5 + 1 AS weight
        FROM clean GROUP BY source
    ),
    totals AS (
        SELECT CAST(sum(n_docs) AS BIGINT) // 2 AS sample_budget,
               CAST(sum(weight) AS BIGINT) AS total_weight
        FROM weighted
    ),
    quota AS (
        SELECT w.source, w.weight,
               (w.weight * t.sample_budget) // t.total_weight AS n_target
        FROM weighted w, totals t
    ),
    selected AS (
        SELECT doc_id, source, weight, n_target, n_tokens FROM (
            SELECT c.doc_id, c.source, q.weight, q.n_target, c.n_tokens,
                   row_number() OVER (
                       PARTITION BY c.source
                       ORDER BY md5(CAST(c.doc_id AS VARCHAR)), c.doc_id
                   ) AS rn
            FROM clean c JOIN quota q ON q.source = c.source
        ) WHERE rn <= n_target
    ),
    packed AS (
        SELECT source, weight, n_target, doc_id, n_tokens,
               (CAST(sum(n_tokens) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) - n_tokens AS BIGINT)) // {_PACK_BUDGET} AS pack_id
        FROM selected
    )
    SELECT source, CAST(weight AS BIGINT) AS weight,
           CAST(n_target AS BIGINT) AS n_target,
           count(*) AS n_docs_kept,
           CAST(sum(n_tokens) AS BIGINT) AS tokens_total,
           CAST(count(DISTINCT pack_id) AS BIGINT) AS n_packs
    FROM packed
    GROUP BY source, weight, n_target
    """,
)
def pipeline_pretrain_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full pretraining-data mile as ONE declarative plan:
    quality gate (length + lexical diversity) → exact dedup (min-doc_id
    survivor per identical text) → benchmark decontamination (drop docs
    with ≥ 30% 5-gram overlap against the held-out set) → weighted
    domain-mixture selection (md5-deterministic quotas over the CLEANED
    per-source counts) → token-budget sequence packing → per-source
    accounting (docs kept, tokens, packs).

    Composes the five standalone operators end-to-end, which is how a real
    pipeline runs them — and Catalyst plans the whole chain at once:
    the gates fuse into the scan, the benchmark gram set and the quota
    frame broadcast, and the corpus shuffles only on its natural stage keys
    (dedup window on text, contamination rollup + join-back on doc_id,
    mixture/packing windows on source) regardless of how many logical
    stages the recipe has. That plan-level fusion across stage boundaries
    is the argument for expressing the pipeline declaratively instead of
    as five materialized intermediate datasets.
    """
    toks = F.split("text", " ")
    gated = (
        load(spark, sf_dir, "documents")
        .withColumn("n_tokens", F.size(toks))
        .filter(
            (F.col("n_tokens") >= 20)
            & (
                F.size(F.array_distinct(toks)).cast("double")
                / F.col("n_tokens")
                >= 0.5
            )
        )
        .select("doc_id", "text", "source", "n_tokens")
    )
    w_dedup = Window.partitionBy("text").orderBy("doc_id")
    deduped = (
        gated.withColumn("rn", F.row_number().over(w_dedup))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    grams_of = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (_NGRAM - 1)),
        lambda i: F.md5(F.array_join(F.slice(toks, i, _NGRAM), " ")),
    )
    bench = (
        load(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % _BENCH_MOD == 0) & (F.size(toks) >= _NGRAM))
        .select(F.explode(grams_of).alias("g"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    grams = deduped.select("doc_id", F.explode(grams_of).alias("g"))
    contam = (
        grams.join(F.broadcast(bench), "g", "left")
        .groupBy("doc_id")
        .agg(
            (
                F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("double")
                / F.count(F.lit(1))
            ).alias("ratio")
        )
    )
    clean = (
        deduped.join(contam, "doc_id")
        .filter((F.col("doc_id") % _BENCH_MOD != 0) & (F.col("ratio") < 0.3))
        .select("doc_id", "source", "n_tokens")
    )
    weight = (
        F.conv(F.substring(F.md5("source"), 1, 8), 16, 10).cast("bigint") % 5 + 1
    )
    weighted = clean.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"), F.first(weight).alias("weight")
    )
    totals = weighted.agg(
        F.expr("CAST(sum(n_docs) AS BIGINT) DIV 2").alias("sample_budget"),
        F.sum("weight").cast("bigint").alias("total_weight"),
    )
    quota = weighted.crossJoin(F.broadcast(totals)).select(
        "source",
        "weight",
        F.expr("(weight * sample_budget) DIV total_weight").alias("n_target"),
    )
    w_sel = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    selected = (
        clean.join(F.broadcast(quota), "source")
        .withColumn("rn", F.row_number().over(w_sel))
        .filter(F.col("rn") <= F.col("n_target"))
        .drop("rn")
    )
    w_pack = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = selected.withColumn(
        "start_off",
        (F.sum("n_tokens").over(w_pack) - F.col("n_tokens")).cast("bigint"),
    ).withColumn("pack_id", F.expr(f"start_off DIV {_PACK_BUDGET}"))
    return packed.groupBy("source", "weight", "n_target").agg(
        F.count(F.lit(1)).alias("n_docs_kept"),
        F.sum("n_tokens").cast("bigint").alias("tokens_total"),
        F.countDistinct("pack_id").cast("bigint").alias("n_packs"),
    )


_BPE_ROUNDS = 4
_BPE_SEP = "\x1f"   # unit separator: joins symbols INSIDE a merged symbol
_PAIR_SEP = "\x1e"  # record separator: joins the two symbols of a counted
                    # pair — distinct from _BPE_SEP so a pair whose halves
                    # are themselves merge products still splits in two


_BPE_CACHE: dict[str, tuple] = {}  # sf_dir -> (rows, merges): training is
# deterministic per corpus, so induce + encode share one training run


def _bpe_train(spark: SparkSession, sf_dir: str):
    """Run the merge-induction loop; return (per-round stat rows, ordered
    merge rules [(a, b, merged), ...]) — the rules feed pipeline_bpe_encode
    exactly as a trained tokenizer's merges.txt would.

    BPE-style merge induction over the token stream: for each of
    4 rounds, count all adjacent symbol pairs in the corpus, pick the most
    frequent (ties broken lexicographically on the pair), and rewrite
    every document by greedily merging that pair left-to-right — exactly
    the training loop of byte-pair-encoding tokenizers, lifted from
    characters to whitespace tokens so the fixture's vocabulary produces
    meaningful collocations. Output: one row per round with the merged
    pair, its raw adjacent count, the number of merges actually performed
    (≤ count: overlapping occurrences merge non-overlapping), and the
    corpus token total after the rewrite.

    Shape: pair counting is explode → groupBy(pair) with map-side partials
    (the pair key space is vocab², tiny next to the token stream) and the
    argmax is a 1-row TakeOrdered collect — the merge table is DRIVER
    state, like MLlib's k-means centroids. The rewrite is one corpus scan
    applying a JVM ``aggregate`` fold (greedy left-to-right merge as a
    pure higher-order expression — no Python in the loop); R rounds = R
    scans + R tiny shuffles, each round's corpus localCheckpoint'd so
    lineage stays flat. Production BPE trainers keep the corpus cached
    and update pair counts incrementally from each round's merge sites;
    the per-round plan — partial-agg count, broadcast merge rule, local
    rewrite — is the same, so the refinement changes constants, not
    shape. No SQL oracle (iterative argmax + rewrite is not
    single-pass-expressible); correctness is pinned by a pytest that
    replays the identical algorithm in pure Python on the collected
    corpus and compares every round bit-for-bit.
    """
    # The corpus arrives as one small file locally → one task would run
    # every round's rewrite fold; spread it across cores (at scale the
    # input splits already provide this, so the repartition is a no-op
    # cost-wise — one shuffle of the corpus before R in-place rounds).
    if sf_dir in _BPE_CACHE:
        return _BPE_CACHE[sf_dir]
    docs = (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.split("text", " ").alias("syms"))
        .repartition(spark.sparkContext.defaultParallelism)
        .localCheckpoint()
    )
    out_rows = []
    merge_rules: list[tuple[str, str, str]] = []
    total_before = docs.agg(
        F.sum(F.size("syms")).cast("bigint").alias("t")
    ).collect()[0]["t"]
    for rnd in range(1, _BPE_ROUNDS + 1):
        pairs = docs.select(
            F.explode(
                F.zip_with(
                    F.slice("syms", 1, F.size("syms") - 1),
                    F.slice("syms", 2, F.size("syms") - 1),
                    lambda x, y: F.concat(x, F.lit(_PAIR_SEP), y),
                )
            ).alias("pair")
        )
        top = (
            pairs.groupBy("pair")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy(F.col("cnt").desc(), "pair")
            .limit(1)
            .collect()
        )
        if not top:
            break
        pair, cnt = top[0]["pair"], top[0]["cnt"]
        a, b = pair.split(_PAIR_SEP)
        merged = f"{a}{_BPE_SEP}{b}"
        merge_rules.append((a, b, merged))
        # Greedy left-to-right merge as a JVM fold: append t, except when
        # the accumulator ends with `a` and t == b — then replace the tail
        # with the merged symbol. A fresh merge leaves `merged` (≠ a: the
        # separator char never appears inside a raw token) on top, giving
        # BPE's non-overlap rule.
        step = (
            "(acc, t) -> CASE WHEN size(acc) > 0"
            f" AND element_at(acc, -1) = '{a}' AND t = '{b}'"
            f" THEN concat(slice(acc, 1, size(acc) - 1), array('{merged}'))"
            " ELSE concat(acc, array(t)) END"
        )
        docs = docs.select(
            "doc_id",
            F.expr(
                f"aggregate(syms, CAST(array() AS ARRAY<STRING>), {step})"
            ).alias("syms"),
        ).localCheckpoint()
        total_after = docs.agg(
            F.sum(F.size("syms")).cast("bigint").alias("t")
        ).collect()[0]["t"]
        out_rows.append(
            (
                rnd,
                pair.replace(_PAIR_SEP, " ").replace(_BPE_SEP, " "),
                int(cnt),
                int(total_before - total_after),
                int(total_after),
            )
        )
        total_before = total_after  # next round's baseline, no extra agg
    _BPE_CACHE[sf_dir] = (out_rows, merge_rules)
    return out_rows, merge_rules


@query("pipeline_bpe_merges")  # iterative argmax+rewrite: no single-pass oracle
def pipeline_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-style merge induction over the token stream — see _bpe_train for
    the loop; this operator surfaces the per-round training statistics.
    (Docstring of record: the original full description lives on the module
    and in _bpe_train's body comments; correctness is pinned by the pure-
    Python replay test, tests/test_corpus_invariants.py.)
    """
    out_rows, _ = _bpe_train(spark, sf_dir)
    return spark.createDataFrame(
        out_rows,
        "merge_round int, merged_pair string, pair_count bigint, "
        "n_merges bigint, tokens_after bigint",
    )


def _jregex_quote(s: str) -> str:
    """Literal-quote a token for a Java regex: backslash-escape every
    non-alphanumeric char (escaping alphanumerics would create character
    classes like ``\\w``; a backslash before any other char is always the
    literal in Java regex)."""
    return "".join(ch if ch.isalnum() else "\\" + ch for ch in s)


@query("pipeline_bpe_encode")  # serves the trained merges: replay-tested
def pipeline_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE ENCODE — the serving half of the tokenizer: train the merge
    table with :func:`_bpe_train`, then encode the whole corpus by applying
    the merges in rank order and report per-source compression (docs, raw
    tokens, encoded tokens, saved fraction). This is the
    induce-merges → tokenize-corpus loop every pretraining pipeline runs;
    the merge list is exactly a tokenizer's ``merges.txt``.

    Shape — the deliberate contrast with training: induction needs R
    materialized rounds (each round's counts depend on the previous
    rewrite), but ENCODING is rank-ordered greedy rewriting with no data
    dependence between documents, so all R merge rules chain lazily into
    ONE corpus scan — R regexp_replace passes fused by codegen (O(len)
    per round per doc; see the in-body note for why replaceAll equals
    the greedy fold), zero shuffles until the final O(sources) rollup. At 100 TB: training
    cost is R passes once; encoding cost is one pass per corpus, which is
    why real pipelines train on a sample and encode everything. The merge
    rules are driver state (≤ R tiny rows) inlined into the expression —
    the broadcast-free analog of a broadcast join against merges.txt.

    No SQL oracle (the rules come from an iterative train); the pure-
    Python replay test encodes the collected corpus with the same rules
    and compares every per-source count bit-for-bit.
    """
    _, merges = _bpe_train(spark, sf_dir)
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        "text",
        F.size(F.split("text", " ")).alias("n_raw"),
    )
    # Optimization r8: each rank's greedy non-overlapping left-to-right
    # merge is EXACTLY Java regex replaceAll semantics (the matcher scans
    # the original string left to right and never rescans a replacement),
    # so the R nested array folds — each of which copied the accumulator
    # per token, O(len²) per doc per round — become R chained
    # regexp_replace passes over the space-joined text, O(len) each. The
    # fold's non-cascade rule (a fresh merge leaves `merged` ≠ a on top)
    # maps to the matcher resuming AFTER the match. Verified
    # token-for-token against the pure-Python fold replay
    # (tests/test_corpus_invariants.py::test_bpe_encode_matches_...).
    c = F.concat(F.lit(" "), F.col("text"), F.lit(" "))
    for a, b, merged in merges:
        pat = f"(?<= ){_jregex_quote(a)} {_jregex_quote(b)}(?= )"
        rep = merged.replace("\\", "\\\\").replace("$", "\\$")
        c = F.regexp_replace(c, pat, rep)
    enc = docs.select(
        "source",
        "n_raw",
        F.size(F.split(F.trim(c), " ")).alias("n_enc"),
    )
    return enc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_raw").cast("bigint").alias("tokens_raw"),
        F.sum("n_enc").cast("bigint").alias("tokens_encoded"),
        (
            (F.sum("n_raw") - F.sum("n_enc")).cast("double") / F.sum("n_raw")
        ).alias("saved_frac"),
    )


_MIX_TOKEN_BUDGET = 1_000_000  # target corpus size for the mixture


@query(
    "pipeline_mix_temperature",
    oracle=f"""
    WITH per_src AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        FROM documents GROUP BY 1
    ),
    total AS (
        SELECT list_sum(list(sqrt(n_tokens) ORDER BY source)) AS z
        FROM per_src
    )
    SELECT p.source, p.n_docs, p.n_tokens,
           sqrt(p.n_tokens) / (SELECT z FROM total) AS weight,
           CAST(floor({_MIX_TOKEN_BUDGET} * sqrt(p.n_tokens)
                      / (SELECT z FROM total)) AS BIGINT) AS target_tokens
    FROM per_src p
    """,
)
def pipeline_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled domain mixture (the multilingual/multi-domain
    sampling scheme from the mT5/XLM-R line of work, α = 0.5): each
    source's sampling weight is n_tokens^α / Σ n_tokens^α, flattening the
    natural distribution so head domains stop drowning the tail; the
    token budget then allocates floor(B·w) target tokens per source.

    Determinism: α = 0.5 makes the power an IEEE sqrt (exact, bit-equal
    cross-engine; arbitrary pow() is NOT). The normalizer Σ√n is a
    FIXED-ORDER fold — Spark F.aggregate over the source-sorted struct
    array, DuckDB list_sum over list(... ORDER BY source) — because a
    20-element double sum is already order-sensitive in the last ulp.
    Token counts are exact ints from one partial-agg scan.

    Scale: per-source rollup (20 groups) + a broadcast scalar — the full
    corpus is scanned once; the mixture math never touches row data.
    """
    d = load(spark, sf_dir, "documents")
    per_src = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("n_tokens"),
    )
    total = per_src.agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("source", "n_tokens"))),
            F.lit(0.0),
            lambda acc, s: acc + F.sqrt(s["n_tokens"]),
        ).alias("z")
    )
    return per_src.crossJoin(F.broadcast(total)).select(
        "source",
        "n_docs",
        "n_tokens",
        (F.sqrt("n_tokens") / F.col("z")).alias("weight"),
        F.floor(
            F.lit(_MIX_TOKEN_BUDGET) * F.sqrt("n_tokens") / F.col("z")
        ).cast("bigint").alias("target_tokens"),
    )


@query(
    "pipeline_epoch_mixture",
    oracle="""
    WITH cfg AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               100 + CAST(('0x' || substr(md5('mix' || source), 1, 8))
                          AS BIGINT) % 150 AS mult_x100
        FROM documents GROUP BY 1
    ),
    plan AS (
        SELECT source, n_docs, mult_x100,
               (n_docs * mult_x100) // 100 AS desired,
               ((n_docs * mult_x100) // 100) // n_docs AS epochs,
               ((n_docs * mult_x100) // 100) % n_docs AS rem
        FROM cfg
    ),
    ranked AS (
        SELECT d.doc_id, d.source,
               row_number() OVER (
                   PARTITION BY d.source
                   ORDER BY md5('e' || CAST(d.doc_id AS VARCHAR)), d.doc_id
               ) AS rn
        FROM documents d
    ),
    copies AS (
        SELECT r.source, r.doc_id,
               p.epochs + (CASE WHEN r.rn <= p.rem THEN 1 ELSE 0 END) AS c
        FROM ranked r JOIN plan p ON p.source = r.source
    )
    SELECT c.source,
           CAST(p.n_docs AS BIGINT) AS n_docs,
           CAST(p.mult_x100 AS BIGINT) AS mult_x100,
           CAST(sum(c.c) AS BIGINT) AS n_emitted,
           CAST(sum(c.doc_id * c.c) AS BIGINT) AS emit_checksum,
           (sum(c.c) = p.desired) AS budget_exact
    FROM copies c JOIN plan p ON p.source = c.source
    GROUP BY c.source, p.n_docs, p.mult_x100, p.desired
    """,
)
def pipeline_epoch_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-replicated domain mixture — the OTHER half of mixture
    sampling: when a domain's target share EXCEEDS its natural size, the
    pipeline repeats the domain for a whole number of epochs plus a
    deterministic fractional epoch (the standard up-sampling scheme for
    high-quality-but-small sources). Each source gets a multiplier
    (pseudo-config, md5-derived so both engines serve the identical plan;
    a real run reads it from the mixture config), docs replicate
    floor(multiplier) times, and the fractional remainder is filled by the
    docs with the smallest seeded hash — a seeded, order-free choice that
    is reproducible run-to-run and engine-to-engine. The emitted count per
    source hits the token-budget target EXACTLY (witnessed by
    ``budget_exact``), and ``emit_checksum`` (Σ doc_id·copies) pins WHICH
    docs won the fractional epoch, not just how many.

    Scale shape: the per-source plan is a tiny broadcast; replication is
    ``explode(sequence(1, copies))`` — a narrow map-side blowup with no
    shuffle beyond the final per-source aggregate; the remainder ranking
    is one window over (source, hash), the only full shuffle in the plan.
    At 100 TB epoch replication never materializes the repeats to storage
    — downstream stages consume the exploded iterator exactly as here.
    """
    d = load(spark, sf_dir, "documents").select("doc_id", "source")
    cfg = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs")).select(
        "source",
        "n_docs",
        (
            F.lit(100)
            + F.conv(
                F.substring(F.md5(F.concat(F.lit("mix"), F.col("source"))), 1, 8),
                16,
                10,
            ).cast("bigint")
            % 150
        ).alias("mult_x100"),
    )
    plan = cfg.select(
        "source", "n_docs", "mult_x100",
        F.expr("(n_docs * mult_x100) DIV 100").alias("desired"),
        F.expr("((n_docs * mult_x100) DIV 100) DIV n_docs").alias("epochs"),
        F.expr("((n_docs * mult_x100) DIV 100) % n_docs").alias("rem"),
    )
    w = Window.partitionBy("source").orderBy(
        F.md5(F.concat(F.lit("e"), F.col("doc_id").cast("string"))), "doc_id"
    )
    ranked = d.withColumn("rn", F.row_number().over(w))
    replicated = (
        ranked.join(F.broadcast(plan), "source")
        .withColumn(
            "copies",
            F.col("epochs") + F.when(F.col("rn") <= F.col("rem"), 1).otherwise(0),
        )
        .select(
            "source", "doc_id", "desired", "n_docs", "mult_x100",
            F.explode(F.expr("sequence(1, copies)")).alias("epoch_i"),
        )
    )
    return replicated.groupBy("source", "n_docs", "mult_x100", "desired").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_emitted"),
        F.sum("doc_id").cast("bigint").alias("emit_checksum"),
    ).select(
        "source",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("mult_x100").cast("bigint").alias("mult_x100"),
        "n_emitted",
        "emit_checksum",
        (F.col("n_emitted") == F.col("desired")).alias("budget_exact"),
    )


_CHUNK_W = 64   # context-window chunk size (tokens)
_CHUNK_S = 48   # stride (tokens); W - S = 16 tokens of overlap


@query(
    "pipeline_chunk_overlap",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, source,
               len(list_filter(string_split(text, ' '), t -> t <> ''))
                   AS n_tokens
        FROM documents
    ),
    chunked AS (
        SELECT doc_id, source, n_tokens,
               CASE WHEN n_tokens <= {_CHUNK_W} THEN 1
                    ELSE 1 + CAST(ceil(CAST(n_tokens - {_CHUNK_W} AS DOUBLE)
                                       / {_CHUNK_S}) AS BIGINT) END AS n_chunks
        FROM toks
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS corpus_tokens,
           CAST(sum(n_chunks) AS BIGINT) AS n_chunks,
           CAST(sum(CASE WHEN n_tokens <= {_CHUNK_W} THEN n_tokens
                         ELSE n_chunks * {_CHUNK_W}
                              - (n_chunks - 1) * ({_CHUNK_W} - {_CHUNK_S})
                    END) AS BIGINT) AS emitted_tokens_ub
    FROM chunked GROUP BY 1
    """,
)
def pipeline_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding context-window chunking — the RAG / long-context
    preprocessor: cut each document into windows of {W} tokens with a
    stride of {S} (16-token overlap keeps retrieval hits from losing
    their sentence boundary). Emits per-source chunk inventory: document
    count, corpus tokens, total chunks (1 + ceil((n−W)/S) for docs longer
    than one window), and an emitted-token upper bound accounting for the
    duplicated overlap — the storage/compute multiplier chunking costs.

    The ceil() is exact cross-engine: its argument is a ratio of int64s
    below 2^53, where double division is correctly rounded and both
    engines ceil the identical quotient. Everything else is pure integer
    arithmetic.

    Scale shape: a narrow per-row projection (split once into a column,
    count, arithmetic — no explode needed for the inventory; the actual
    chunk-emission explode is ``sequence(0, n_chunks-1)``, map-side and
    shuffle-free) followed by one partial-agg rollup.
    """
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "source",
        F.size(
            F.filter(F.split("text", " "), lambda t: t != "")
        ).cast("bigint").alias("n_tokens"),
    )
    n_chunks = F.when(F.col("n_tokens") <= _CHUNK_W, F.lit(1)).otherwise(
        1
        + F.ceil(
            (F.col("n_tokens") - _CHUNK_W).cast("double") / F.lit(_CHUNK_S)
        )
    )
    chunked = toks.withColumn("n_chunks", n_chunks.cast("bigint"))
    emitted = F.when(
        F.col("n_tokens") <= _CHUNK_W, F.col("n_tokens")
    ).otherwise(
        F.col("n_chunks") * _CHUNK_W
        - (F.col("n_chunks") - 1) * (_CHUNK_W - _CHUNK_S)
    )
    return chunked.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("corpus_tokens"),
        F.sum("n_chunks").cast("bigint").alias("n_chunks"),
        F.sum(emitted).cast("bigint").alias("emitted_tokens_ub"),
    )


@query(
    "pipeline_tokenizer_fertility",
    oracle="""
    WITH d AS (
        SELECT lang, source,
               CAST(strlen(text) AS BIGINT) AS nbytes,
               CAST(length(text) - length(replace(text, ' ', '')) + 1
                    AS BIGINT) AS ntok
        FROM documents
    )
    SELECT lang, source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(nbytes) AS BIGINT) AS total_bytes,
           CAST(sum(ntok) AS BIGINT) AS total_tokens,
           CAST((sum(nbytes) * 100) // sum(ntok) AS BIGINT)
               AS bytes_per_token_x100,
           CAST(sum(ntok) // count(*) AS BIGINT) AS tokens_per_doc
    FROM d GROUP BY lang, source
    """,
)
def pipeline_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-fertility audit: bytes-per-token by (language, source) —
    the compression diagnostic every tokenizer rollout ships with. A
    whitespace tokenizer stands in for the trained one (same plan shape:
    token counts come from string arithmetic inside the scan projection);
    languages/sources whose bytes-per-token runs hot are the ones a BPE
    vocabulary under-serves, and the per-slice token totals are exactly
    the numbers a token-budgeted mixture (pipeline_domain_mix) consumes.

    Exactness: byte counts are UTF-8 octet_length in both engines, token
    counts the shared length-difference identity, and both ratios are
    integer DIV — every output column hashes bit-for-bit.

    Scale shape: one scan, all arithmetic in the projection, one
    partial-agg shuffle keyed on the (lang, source) slice — the same
    single-pass profile regardless of corpus size; no tokenizer UDF in
    the hot path.
    """
    d = load(spark, sf_dir, "documents").select(
        "lang",
        "source",
        F.octet_length("text").cast("bigint").alias("nbytes"),
        F.expr(
            "CAST(length(text) - length(replace(text, ' ', '')) + 1"
            " AS BIGINT)"
        ).alias("ntok"),
    )
    return d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("nbytes").alias("total_bytes"),
        F.sum("ntok").alias("total_tokens"),
        F.expr("(sum(nbytes) * 100) DIV sum(ntok)").alias(
            "bytes_per_token_x100"
        ),
        F.expr("sum(ntok) DIV count(*)").alias("tokens_per_doc"),
    )


_CURR_PHASES = 3  # easy → medium → hard


@query(
    "pipeline_curriculum_phases",
    oracle=f"""
    WITH sized AS (
        SELECT doc_id,
               CAST(length(text) - length(replace(text, ' ', '')) + 1
                    AS BIGINT) AS n_tokens
        FROM documents
    ),
    by_len AS (
        SELECT n_tokens,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS grp_tokens
        FROM sized GROUP BY n_tokens
    ),
    walked AS (
        SELECT n_tokens, n_docs, grp_tokens,
               sum(grp_tokens) OVER (ORDER BY n_tokens) AS cum_tokens,
               sum(grp_tokens) OVER () AS total_tokens
        FROM by_len
    )
    SELECT CAST(((cum_tokens - 1) * {_CURR_PHASES}) // total_tokens
                AS BIGINT) AS phase,
           CAST(sum(n_docs) AS BIGINT) AS n_docs,
           CAST(sum(grp_tokens) AS BIGINT) AS phase_tokens,
           CAST(min(n_tokens) AS BIGINT) AS len_lo,
           CAST(max(n_tokens) AS BIGINT) AS len_hi
    FROM walked
    GROUP BY 1
    """,
)
def pipeline_curriculum_phases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum scheduling: split the corpus into {P} ordered training
    phases of ~equal TOKEN budget, easiest (shortest) documents first —
    the classic length-based curriculum. Phase boundaries land on
    length-group boundaries, so assignment is a pure function of a
    document's length, never its physical position.

    Scale discipline (the weighted-median idiom): documents collapse to
    the LENGTH VALUE DOMAIN first (one partial-agg groupBy — thousands of
    distinct lengths, regardless of corpus size); the cumulative token
    walk and the phase arithmetic run over that tiny frame. Phase id is
    ((cum −1)·{P}) DIV total — exact integers, so the per-phase budgets
    and length ranges hash cross-engine. At 100 TB the only corpus-sized
    work is the initial collapse; a naive per-doc global sort + cumsum
    would be the exact anti-pattern this avoids.
    """
    sized = load(spark, sf_dir, "documents").select(
        F.expr(
            "CAST(length(text) - length(replace(text, ' ', '')) + 1"
            " AS BIGINT)"
        ).alias("n_tokens"),
    )
    by_len = sized.groupBy("n_tokens").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("grp_tokens"),
    )
    cum = Window.orderBy("n_tokens").rowsBetween(
        Window.unboundedPreceding, 0
    )
    tot = Window.partitionBy()
    walked = by_len.withColumn(
        "cum_tokens", F.sum("grp_tokens").over(cum)
    ).withColumn("total_tokens", F.sum("grp_tokens").over(tot))
    phase = F.expr(
        f"CAST(((cum_tokens - 1) * {_CURR_PHASES}) DIV total_tokens"
        " AS BIGINT)"
    )
    return (
        walked.groupBy(phase.alias("phase"))
        .agg(
            F.sum("n_docs").alias("n_docs"),
            F.sum("grp_tokens").alias("phase_tokens"),
            F.min("n_tokens").alias("len_lo"),
            F.max("n_tokens").alias("len_hi"),
        )
    )


_BG_CORPUS_MOD = 3  # doc_id % 3 == 0 rows play the already-trained corpus


@query(
    "pipeline_bigram_coverage",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, source, string_split(text, ' ') AS t
        FROM documents
    ),
    bigrams AS (
        SELECT doc_id, source, t[i.i] || ' ' || t[i.i + 1] AS bg
        FROM toks, LATERAL (
            SELECT unnest(generate_series(1, len(t) - 1)) AS i
        ) i
    ),
    train AS (
        SELECT DISTINCT bg FROM bigrams WHERE doc_id % {_BG_CORPUS_MOD} = 0
    ),
    eval_bg AS (
        SELECT source, bg FROM bigrams WHERE doc_id % {_BG_CORPUS_MOD} != 0
    ),
    hits AS (
        SELECT e.source, e.bg, (t.bg IS NOT NULL) AS seen
        FROM eval_bg e LEFT JOIN train t ON t.bg = e.bg
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(sum(CASE WHEN seen THEN 1 ELSE 0 END) AS BIGINT)
               AS n_seen,
           CAST(sum(CASE WHEN seen THEN 1 ELSE 0 END) * 10000 // count(*)
                AS BIGINT) AS coverage_x10k,
           CAST(count(DISTINCT bg) AS BIGINT) AS n_distinct,
           CAST(count(DISTINCT CASE WHEN seen THEN bg END) AS BIGINT)
               AS n_distinct_seen,
           CAST(count(DISTINCT CASE WHEN seen THEN bg END) * 10000
                // count(DISTINCT bg) AS BIGINT) AS distinct_coverage_x10k
    FROM hits GROUP BY source
    """,
)
def pipeline_bigram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus bigram coverage: what fraction of each incoming
    source's word bigrams (token and distinct-type level) a reference
    corpus has already seen — the cheap distribution-shift / novelty
    readout between `pipeline_contamination_ngram` (exact long-n-gram
    screening) and a full LM perplexity pass (which needs ln() and can
    never hash cross-engine). Low coverage = genuinely novel text worth
    upweighting; suspiciously HIGH coverage = the source is near-dup of
    the training mix.

    Shape: bigrams come from one higher-order-function expansion per
    document (transform over the token array — no per-token UDF); the
    reference bigram VOCABULARY is a distinct projection; the coverage
    probe is one hash join on the bigram string. At 100 TB the join
    shuffles on bigram keys with map-side combine on (source, bg) first;
    the reference side prunes to distinct types (a small fraction of
    instances), and a bloom prefilter (join_bloom_prefilter's pattern)
    slots in front unchanged if the vocabulary outgrows the shuffle.
    """
    toks = load(spark, sf_dir, "documents").select(
        "doc_id", "source", F.split("text", " ").alias("t")
    )
    bigrams = toks.select(
        "doc_id",
        "source",
        # guard single-token/empty docs: sequence(0, -1) expands as
        # [0, -1] (step defaults to -1 when start > stop) and the
        # transform would then call element_at(t, 0) — a runtime error.
        # Empty array -> explode drops the row, matching the oracle's
        # empty generate_series for zero-bigram docs.
        F.explode(
            F.when(
                F.size("t") >= 2,
                F.transform(
                    F.sequence(F.lit(0), F.size("t") - 2),
                    lambda i: F.concat(
                        F.element_at(F.col("t"), i + 1),
                        F.lit(" "),
                        F.element_at(F.col("t"), i + 2),
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("bg"),
    )
    train = (
        bigrams.filter(F.col("doc_id") % _BG_CORPUS_MOD == 0)
        .select("bg")
        .distinct()
        .withColumn("seen", F.lit(True))
    )
    # collapse eval INSTANCES to (source, type) + count BEFORE the
    # coverage join: the join then shuffles distinct types (a small
    # fraction of token instances — the Heaps'-law gap), and the instance
    # tallies ride along as integer weights. Values identical to joining
    # raw instances; the oracle spells the plain instance join.
    eval_types = (
        bigrams.filter(F.col("doc_id") % _BG_CORPUS_MOD != 0)
        .groupBy("source", "bg")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_inst"))
    )
    hits = eval_types.join(train, "bg", "left").select(
        "source",
        "n_inst",
        F.coalesce(F.col("seen"), F.lit(False)).alias("seen"),
    )
    return hits.groupBy("source").agg(
        F.sum("n_inst").cast("bigint").alias("n_bigrams"),
        F.sum(F.when(F.col("seen"), F.col("n_inst")).otherwise(0))
        .cast("bigint")
        .alias("n_seen"),
        F.expr(
            "CAST(sum(CASE WHEN seen THEN n_inst ELSE 0 END) * 10000"
            " DIV sum(n_inst) AS BIGINT)"
        ).alias("coverage_x10k"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        F.sum(F.when(F.col("seen"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_distinct_seen"),
        F.expr(
            "CAST(sum(CASE WHEN seen THEN 1 ELSE 0 END) * 10000"
            " DIV count(*) AS BIGINT)"
        ).alias("distinct_coverage_x10k"),
    )
