"""Text-analysis operators over the ``documents`` table (north-star LLM-data-
pipeline surface: language ID, quality scoring, token counting, document
fingerprinting).

Everything is built from JVM-side expressions (split / higher-order array
functions / regexp) — no Python UDFs in these paths, so whole-stage codegen
covers them end-to-end and they scale with the scan.

Cross-engine determinism notes:
- token hashing uses md5 (identical in both engines) with the leading 8 hex
  digits parsed as an integer — 32 bits, so position-weighted sums over
  10^3-token documents stay far below int64 overflow;
- ratios are exact-integer counts divided once as doubles (deterministic);
- the fingerprint is an order-weighted commutative sum, so it is independent
  of row/partition order while still sensitive to token positions.
"""

from __future__ import annotations

import hashlib as _hashlib

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import load, query

# Tiny per-language stopword dictionaries for the n-gram/stopword heuristic.
# The fixture vocabulary is synthetic English-ish database words, so 'en'
# dominates — the point is the *mechanism* (score → deterministic argmax).
_LANG_STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "for"),
    "de": ("der", "die", "das", "und", "ist", "ein", "zu", "mit"),
    "es": ("el", "la", "de", "y", "es", "un", "en", "por"),
    "fr": ("le", "la", "et", "est", "un", "une", "dans", "pour"),
}

_TOKEN_REGEX = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


def _tokens(col: str = "text") -> F.Column:
    return F.split(F.col(col), " ")


def _stop_count(tokens: F.Column, words: tuple[str, ...]) -> F.Column:
    return F.size(F.filter(tokens, lambda x: x.isin(*words)))


@query(
    "text_stats",
    oracle="""
    SELECT
        doc_id,
        lang,
        n_chars,
        len(string_split(text, ' ')) AS n_tokens,
        len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens,
        CAST(list_sum(list_transform(string_split(text, ' '), x -> len(x))) AS BIGINT)
            AS sum_token_len,
        CAST(list_sum(list_transform(string_split(text, ' '), x -> len(x))) AS DOUBLE)
            / len(string_split(text, ' ')) AS avg_token_len,
        CAST(list_max(list_transform(string_split(text, ' '), x -> len(x))) AS INTEGER)
            AS max_token_len
    FROM documents
    """,
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token statistics (length profile of the corpus)."""
    toks = _tokens()
    tok_lens = F.transform(toks, lambda x: F.length(x))
    return load(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "n_chars",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.aggregate(tok_lens, F.lit(0).cast("bigint"), lambda a, x: a + x).alias(
            "sum_token_len"
        ),
        (
            F.aggregate(tok_lens, F.lit(0).cast("bigint"), lambda a, x: a + x).cast(
                "double"
            )
            / F.size(toks)
        ).alias("avg_token_len"),
        F.array_max(tok_lens).alias("max_token_len"),
    )


def _lang_id_oracle() -> str:
    score = {
        lang: (
            "len(list_filter(string_split(text, ' '), x -> x IN ("
            + ", ".join(f"'{w}'" for w in words)
            + ")))"
        )
        for lang, words in _LANG_STOPWORDS.items()
    }
    return f"""
    WITH scored AS (
        SELECT doc_id, lang,
               {score['en']} AS s_en, {score['de']} AS s_de,
               {score['es']} AS s_es, {score['fr']} AS s_fr
        FROM documents
    )
    SELECT doc_id, lang AS actual_lang, s_en, s_de, s_es, s_fr,
           CASE
               WHEN s_de > greatest(s_en, s_es, s_fr) THEN 'de'
               WHEN s_es > greatest(s_en, s_fr) THEN 'es'
               WHEN s_fr > s_en THEN 'fr'
               ELSE 'en'
           END AS predicted_lang
    FROM scored
    """


@query("text_lang_id", oracle=_lang_id_oracle())
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-dictionary language ID with a deterministic argmax
    (priority-ordered CASE — ties resolve identically in both engines)."""
    toks = _tokens()
    df = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("lang").alias("actual_lang"),
        _stop_count(toks, _LANG_STOPWORDS["en"]).alias("s_en"),
        _stop_count(toks, _LANG_STOPWORDS["de"]).alias("s_de"),
        _stop_count(toks, _LANG_STOPWORDS["es"]).alias("s_es"),
        _stop_count(toks, _LANG_STOPWORDS["fr"]).alias("s_fr"),
    )
    return df.withColumn(
        "predicted_lang",
        F.when(
            F.col("s_de") > F.greatest("s_en", "s_es", "s_fr"), F.lit("de")
        )
        .when(F.col("s_es") > F.greatest("s_en", "s_fr"), F.lit("es"))
        .when(F.col("s_fr") > F.col("s_en"), F.lit("fr"))
        .otherwise(F.lit("en")),
    )


@query(
    "text_quality_score",
    oracle=f"""
    WITH feats AS (
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_tokens,
               len(list_distinct(string_split(text, ' '))) AS n_distinct,
               len(list_filter(string_split(text, ' '),
                   x -> x IN ({", ".join(f"'{w}'" for w in _LANG_STOPWORDS['en'])})))
                   AS n_stop,
               n_chars
        FROM documents
    )
    SELECT doc_id, n_tokens,
           CAST(n_distinct AS DOUBLE) / n_tokens AS distinct_ratio,
           CAST(n_stop AS DOUBLE) / n_tokens AS stopword_ratio,
           CAST(n_tokens >= 20 AND n_tokens <= 80 AS INTEGER) AS len_ok,
           0.5 * (CAST(n_distinct AS DOUBLE) / n_tokens)
             + 0.3 * (CAST(n_stop AS DOUBLE) / n_tokens)
             + 0.2 * CAST(n_tokens >= 20 AND n_tokens <= 80 AS INTEGER)
             AS quality_score
    FROM feats
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style composite quality score: lexical diversity + stopword
    density + length window, combined with fixed weights."""
    toks = _tokens()
    feats = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        _stop_count(toks, _LANG_STOPWORDS["en"]).alias("n_stop"),
    )
    distinct_ratio = F.col("n_distinct").cast("double") / F.col("n_tokens")
    stop_ratio = F.col("n_stop").cast("double") / F.col("n_tokens")
    len_ok = (
        (F.col("n_tokens") >= 20) & (F.col("n_tokens") <= 80)
    ).cast("int")
    return feats.select(
        "doc_id",
        "n_tokens",
        distinct_ratio.alias("distinct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        len_ok.alias("len_ok"),
        (0.5 * distinct_ratio + 0.3 * stop_ratio + 0.2 * len_ok).alias(
            "quality_score"
        ),
    )


@query(
    "text_token_count",
    oracle=f"""
    SELECT doc_id,
           len(string_split(text, ' ')) AS ws_tokens,
           len(regexp_extract_all(text, '{_TOKEN_REGEX}')) AS regex_tokens,
           CAST(ceil(len(text) / 4.0) AS BIGINT) AS byte_pair_estimate
    FROM documents
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting three ways: whitespace split, a BPE-ish regex
    (letter runs / digit runs / single punctuation), and the chars/4
    heuristic LLM pipelines use for budget estimates."""
    return load(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(_tokens()).alias("ws_tokens"),
        F.regexp_count("text", F.lit(_TOKEN_REGEX)).alias("regex_tokens"),
        F.ceil(F.length("text") / 4.0).cast("bigint").alias("byte_pair_estimate"),
    )


@query(
    "text_fingerprint",
    oracle="""
    WITH toks AS (
        SELECT doc_id, u.tok, u.pos
        FROM documents d,
             LATERAL (
                SELECT unnest(string_split(d.text, ' ')) AS tok,
                       unnest(generate_series(1, len(string_split(d.text, ' ')))) AS pos
             ) u
    )
    SELECT doc_id,
           CAST(sum(pos * CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT))
               % 1000000007 AS BIGINT) AS fingerprint,
           count(*) AS n_tokens
    FROM toks
    GROUP BY doc_id
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-weighted rolling document fingerprint.

    fp(doc) = Σ position_i · md5_32(token_i)  (mod 1e9+7): order-sensitive
    like a rolling hash, yet a commutative exact-integer sum — identical
    under any Spark partitioning and in DuckDB. posexplode + hash aggregate;
    at 100 TB this is a map-side partial agg keyed by doc_id.
    """
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.posexplode(_tokens()).alias("pos0", "tok")
    ).select(
        "doc_id",
        (F.col("pos0") + 1).alias("pos"),
        F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("bigint").alias("h32"),
    )
    return tok.groupBy("doc_id").agg(
        (F.sum(F.col("pos") * F.col("h32")) % F.lit(1000000007)).alias("fingerprint"),
        F.count(F.lit(1)).alias("n_tokens"),
    )


_TFIDF_TOP_K = 3


@query(
    "text_tfidf_topterms",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents
    ),
    tf AS (
        SELECT doc_id, term, count(*) AS tf
        FROM toks WHERE term <> '' GROUP BY doc_id, term
    ),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    n AS (SELECT count(*) AS n FROM documents)
    SELECT doc_id, term, tf, df, tfidf, rnk FROM (
        SELECT tf.doc_id, tf.term, tf.tf, df.df,
               CAST(tf.tf * n.n AS DOUBLE) / df.df AS tfidf,
               row_number() OVER (
                   PARTITION BY tf.doc_id
                   ORDER BY CAST(tf.tf * n.n AS DOUBLE) / df.df DESC, tf.term
               ) AS rnk
        FROM tf, n
        JOIN df ON df.term = tf.term
    ) WHERE rnk <= {_TFIDF_TOP_K}
    """,
)
def text_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting by TF-IDF: the top-3 most characteristic
    terms per document. Uses the LINEAR idf variant tfidf = tf · N / df
    (monotone in the classic tf·log(N/df) for fixed tf) so the score is
    exact-integer arithmetic plus ONE IEEE divide — bit-identical across
    engines, where ln() would not be.

    Scale notes: tf is one shuffle on (doc_id, term); df aggregates tf
    (vocabulary-sized result) and BROADCASTS back for the idf join, as does
    the single-row corpus count; the top-k window shuffles on doc_id. At
    100 TB the df/vocabulary table is the only global state and it is tiny
    relative to the corpus — the classic two-pass scheme.
    """
    docs = load(spark, sf_dir, "documents")
    n_docs = docs.agg(F.count(F.lit(1)).alias("n"))
    tf = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    score = (F.col("tf") * F.col("n")).cast("double") / F.col("df")
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "term")
    return (
        tf.crossJoin(F.broadcast(n_docs))
        .join(F.broadcast(df), "term")
        .select("doc_id", "term", "tf", "df", score.alias("tfidf"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _TFIDF_TOP_K)
    )


_QM_BUCKETS = 256      # hashing-trick feature space
_QM_BIAS = -3          # model bias term (pseudo-trained, deterministic)

# The pseudo-trained weight table, precomputed at import: weight(b) =
# md5-derived int % 41 - 20, exactly the expression the oracle (and the
# pre-r8 Spark weights frame) evaluates — pinned by
# tests/test_quality_model_inrow.py against the SQL formulation. 256 small
# ints fold into ONE constant array literal in the plan, so serving the
# model costs zero joins (guide §2.4): the score is an in-row fold over
# the token array.
_QM_WEIGHTS = [
    int(_hashlib.md5(f"w{b}".encode()).hexdigest()[:8], 16) % 41 - 20
    for b in range(_QM_BUCKETS)
]


def _qm_score_cols(d: DataFrame, *extra: str) -> DataFrame:
    """Per-document quality-model columns computed IN-ROW (optimization
    r8): tokens = filtered split array; each token's bucket weight comes
    from `element_at` on the constant-folded weight-array literal; the
    score is one integer `aggregate` fold. Replaces the explode →
    groupBy(doc_id, bucket) → broadcast-join(weights) → groupBy(doc_id)
    shape — the scores are a pure function of the row, so the classifier
    pays ZERO exchanges (the old plan paid two corpus-keyed hash
    aggregations). Summation order differs (token order vs bucket
    order) but all operands are int64 — bit-identical results.

    Keeps docs with ≥1 non-empty token, matching the oracle's inner
    feature join (zero-token and NULL-text docs are absent either way).
    """
    wlit = "array({})".format(
        ",".join(f"{w}L" for w in _QM_WEIGHTS)
    )
    raw = (
        F.expr(
            f"aggregate(__qm_toks, 0L, (acc, t) -> acc + element_at({wlit},"
            f" CAST(CAST(conv(substring(md5(t), 1, 8), 16, 10) AS BIGINT)"
            f" % {_QM_BUCKETS} AS INT) + 1))"
        )
        + F.lit(_QM_BIAS)
    )
    return (
        d.filter(F.col("text").isNotNull())
        .select(
            "doc_id",
            *extra,
            F.filter(F.split("text", " "), lambda t: t != F.lit("")).alias(
                "__qm_toks"
            ),
        )
        .filter(F.size("__qm_toks") > 0)
        .select(
            "doc_id",
            *extra,
            F.size("__qm_toks").cast("bigint").alias("n_tokens"),
            raw.cast("bigint").alias("score_sum"),
            (raw.cast("double") / F.size("__qm_toks")).alias("mean_margin"),
            (raw >= 0).alias("keep"),
        )
    )


@query(
    "text_quality_model",
    oracle=f"""
    WITH weights AS (
        SELECT b.bucket,
               (CAST(('0x' || substr(md5('w' || CAST(b.bucket AS VARCHAR)), 1, 8))
                     AS BIGINT) % 41) - 20 AS weight
        FROM (SELECT unnest(generate_series(0, {_QM_BUCKETS - 1})) AS bucket) b
    ),
    feats AS (
        SELECT d.doc_id,
               CAST(('0x' || substr(md5(u.tok), 1, 8)) AS BIGINT)
                   % {_QM_BUCKETS} AS bucket,
               count(*) AS tf
        FROM documents d,
             LATERAL (SELECT unnest(string_split(d.text, ' ')) AS tok) u
        WHERE u.tok <> ''
        GROUP BY 1, 2
    )
    SELECT f.doc_id,
           CAST(sum(f.tf) AS BIGINT) AS n_tokens,
           CAST(sum(f.tf * w.weight) + {_QM_BIAS} AS BIGINT) AS score_sum,
           CAST(sum(f.tf * w.weight) + {_QM_BIAS} AS DOUBLE) / sum(f.tf)
               AS mean_margin,
           (sum(f.tf * w.weight) + {_QM_BIAS} >= 0) AS keep
    FROM feats f JOIN weights w ON w.bucket = f.bucket
    GROUP BY 1
    """,
)
def text_quality_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear quality-classifier serving via the hashing trick — the
    fastText-style "does this page look like reference text" filter every
    pretraining pipeline runs. Tokens hash into a fixed {B}-bucket feature
    space (no vocabulary dictionary — the property that makes the model
    servable on an unbounded corpus), each bucket carries a weight from the
    model table, a doc's score is Σ tf·w + bias and the keep/drop label is
    its sign. Weights here are pseudo-trained (derived deterministically
    from the bucket id) so both engines serve the identical model; swapping
    in real trained weights changes one small table, not the plan.

    Scale shape (optimization r8): the score is a pure per-document
    function of the token array, so it is computed IN-ROW — the weight
    table folds into a constant array literal in the plan and each token
    pays one md5 + one `element_at`, with ZERO exchanges and zero joins
    (the earlier shape exploded tokens through a (doc, bucket) hash
    aggregation, a broadcast weight join, and a second doc-keyed
    aggregation). Integer sums in any order are exact, so every output
    value is bit-identical; see `_qm_score_cols`. This is how a
    logistic-regression-style gate actually runs inside Spark at 100 TB:
    proportional map work, NO shuffle at all (the sigmoid is monotone, so
    thresholding the raw margin is the same decision boundary).
    """
    return _qm_score_cols(load(spark, sf_dir, "documents"))


@query(
    "text_ngram_novelty",
    oracle="""
    WITH toks AS (
        SELECT doc_id, u.tok, u.pos
        FROM documents d,
             LATERAL (
                SELECT unnest(string_split(d.text, ' ')) AS tok,
                       unnest(generate_series(
                           1, len(string_split(d.text, ' ')))) AS pos
             ) u
    ),
    shingles AS (
        SELECT DISTINCT t1.doc_id, t1.tok || ' ' || t2.tok AS sh
        FROM toks t1
        JOIN toks t2 ON t2.doc_id = t1.doc_id AND t2.pos = t1.pos + 1
    ),
    firsts AS (SELECT sh, min(doc_id) AS first_doc FROM shingles GROUP BY sh)
    SELECT s.doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           CAST(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
                AS DOUBLE) / count(*) AS novelty
    FROM shingles s JOIN firsts f ON f.sh = s.sh
    GROUP BY s.doc_id
    """,
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram NOVELTY: the fraction of a document's distinct
    bigrams whose FIRST appearance (by doc_id order) is in this document —
    the streaming-corpus diversity signal curation pipelines track to
    detect when a crawl stops contributing new content (novelty decays
    toward 0 as the corpus saturates).

    Shape: distinct (doc, bigram) pairs → one groupBy(bigram) min to get
    each bigram's first document → join back on the bigram and a per-doc
    rollup. Two shuffles, both keyed on the bigram/doc hash, fully
    partial-aggregated; the novelty ratio is an exact integer division.
    At 100 TB the min-by-bigram frame is the same inverted index the dedup
    family shuffles — and the stop-shingle cap composes here unchanged if
    hot bigrams dominate.
    """
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    bigrams = F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    sh = (
        d.select("doc_id", F.explode(bigrams).alias("sh"))
        .distinct()
    )
    firsts = sh.groupBy("sh").agg(F.min("doc_id").alias("first_doc"))
    return (
        sh.join(firsts, "sh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            ).cast("bigint").alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_novel",
            (F.col("n_novel").cast("double") / F.col("n_shingles")).alias(
                "novelty"
            ),
        )
    )


_LIFT_TOP_TOKENS = 50   # co-occurrence vocabulary cap (df-ranked)
_LIFT_MIN_PAIR = 5      # minimum co-occurrence support


@query(
    "text_token_lift",
    oracle=f"""
    WITH toks AS (
        SELECT DISTINCT doc_id, u.tok
        FROM documents d,
             LATERAL (SELECT unnest(string_split(d.text, ' ')) AS tok) u
        WHERE u.tok != ''
    ),
    df AS (
        SELECT tok, CAST(count(*) AS BIGINT) AS n
        FROM toks GROUP BY tok
    ),
    top AS (
        SELECT tok, n FROM (
            SELECT tok, n, row_number() OVER (
                ORDER BY n DESC, tok) AS rnk
            FROM df
        ) WHERE rnk <= {_LIFT_TOP_TOKENS}
    ),
    tt AS (
        SELECT t.doc_id, t.tok, p.n
        FROM toks t JOIN top p ON p.tok = t.tok
    ),
    pairs AS (
        SELECT a.tok AS tok_a, b.tok AS tok_b,
               CAST(max(a.n) AS BIGINT) AS n_a,
               CAST(max(b.n) AS BIGINT) AS n_b,
               CAST(count(*) AS BIGINT) AS n_ab
        FROM tt a JOIN tt b ON b.doc_id = a.doc_id AND b.tok > a.tok
        GROUP BY 1, 2
        HAVING count(*) >= {_LIFT_MIN_PAIR}
    ),
    total AS (
        SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs FROM toks
    )
    SELECT tok_a, tok_b, n_a, n_b, n_ab,
           CAST(n_docs AS DOUBLE) * n_ab / (n_a * n_b) AS lift
    FROM pairs, total
    """,
)
def text_token_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token co-occurrence LIFT (market-basket association over document
    vocabularies): for pairs of high-frequency tokens, how much more
    often they co-occur in a document than independence predicts —
    P(a,b)/(P(a)·P(b)) — the collocation/topic-coupling signal behind
    phrase mining and template detection.

    The pair join is CAPPED BY CONSTRUCTION: only the top-{_LIFT_TOP_TOKENS}
    tokens by document frequency (deterministic (df, token) ranking)
    enter it, so each document contributes at most C(50,2) pairs no
    matter how hot the vocabulary is — the stop-shingle lesson from the
    dedup family applied up front, not as an afterthought. Lift is one
    double expression over exact integer supports.

    Scale (optimization r8): per-doc DISTINCT tokens are computed IN-ROW
    (``array_distinct`` of the split — the earlier shape paid an
    explode+distinct shuffle of the full (doc, token) stream, recomputed
    once per consumer); the df ranking is then one partial-aggregated
    token rollup to |vocab| rows; and the pair set is generated IN-ROW
    from each doc's sorted top-token RANK list (the co-purchase
    combination pattern from graph._pair_edges_plan) instead of a doc_id
    self-join — one doc-keyed shuffle of ≤{_LIFT_TOP_TOKENS} ints/doc
    replaces two string-row shuffles plus the join fan-out. The hot pair
    stream carries ONE packed bigint (rank_a·1024 + rank_b; ranks are
    tok-ascending, so rank order == the original tok_a < tok_b order) and
    partial-aggregates to ≤ C(50,2) rows; token text and df re-attach
    over that tiny result. Same pairs, same counts — bit-identical
    output (sf0.1 row-checksum verified against the previous shape).
    """
    d = load(spark, sf_dir, "documents")
    # in-row distinct token set; empty-token filter inside the array
    base = d.select(
        "doc_id",
        F.array_distinct(
            F.filter(F.split("text", " "), lambda t: t != "")
        ).alias("ts"),
    )
    toks = base.select("doc_id", F.explode("ts").alias("tok"))
    df_counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy(F.col("n").desc(), "tok")
    top = (
        df_counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _LIFT_TOP_TOKENS)
        .select("tok", "n")
    )
    # per-doc sorted list of surviving token RANK ids (ints, not strings —
    # the pair stream is the hot volume, so it carries packed-int keys
    # only; token text and df re-attach over the ≤C(50,2) result rows)
    topr = top.withColumn(
        "rnk", F.row_number().over(Window.orderBy("tok"))
    )
    tt = (
        toks.join(F.broadcast(topr.select("tok", "rnk")), "tok")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("rnk")).alias("rs"))
        # explicit spread (the _pair_edges_plan lesson): AQE coalesces the
        # small per-doc aggregate to ~1 partition, which would run the
        # C(50,2)-per-doc combination explode single-task
        .repartition(32, "doc_id")
    )
    # rs is sorted by rnk == token order (rnk is the tok-ascending rank),
    # so x < y in the combos means tok_x < tok_y — the original pair order
    combos = F.flatten(
        F.transform(
            F.col("rs"),
            lambda x, i: F.transform(
                F.slice(F.col("rs"), i + F.lit(2), F.size(F.col("rs"))),
                lambda y: x.cast("bigint") * 1024 + y,
            ),
        )
    )
    pk = (
        tt.select(F.explode(combos).alias("pk"))
        .groupBy("pk")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ab"))
        .filter(F.col("n_ab") >= _LIFT_MIN_PAIR)
    )
    ta = topr.select(
        F.col("rnk").alias("ra"), F.col("tok").alias("tok_a"),
        F.col("n").alias("na"),
    )
    tb = topr.select(
        F.col("rnk").alias("rb"), F.col("tok").alias("tok_b"),
        F.col("n").alias("nb"),
    )
    pairs = (
        pk.withColumn("ra", F.expr("pk DIV 1024").cast("int"))
        .withColumn("rb", (F.col("pk") % 1024).cast("int"))
        .join(F.broadcast(ta), "ra")
        .join(F.broadcast(tb), "rb")
        .select(
            "tok_a", "tok_b",
            F.col("na").cast("bigint").alias("n_a"),
            F.col("nb").cast("bigint").alias("n_b"),
            "n_ab",
        )
    )
    total = base.filter(F.size("ts") > 0).agg(
        F.countDistinct("doc_id").cast("bigint").alias("n_docs")
    )
    return pairs.crossJoin(F.broadcast(total)).select(
        "tok_a",
        "tok_b",
        "n_a",
        "n_b",
        "n_ab",
        (
            F.col("n_docs").cast("double")
            * F.col("n_ab")
            / (F.col("n_a") * F.col("n_b"))
        ).alias("lift"),
    )


_CHI2_TOP_VOCAB = 100  # chi-square over the corpus's top-K tokens


@query(
    "text_vocab_chi2_drift",
    oracle=f"""
    WITH toks AS (
        SELECT source, u.tok
        FROM documents d,
             LATERAL (SELECT unnest(string_split(d.text, ' ')) AS tok) u
        WHERE u.tok != ''
    ),
    corpus AS (
        SELECT tok, CAST(count(*) AS BIGINT) AS n
        FROM toks GROUP BY tok
    ),
    top AS (
        SELECT tok, n FROM (
            SELECT tok, n,
                   row_number() OVER (ORDER BY n DESC, tok) AS rnk
            FROM corpus
        ) WHERE rnk <= {_CHI2_TOP_VOCAB}
    ),
    corpus_total AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM top),
    per_src AS (
        SELECT t.source, t.tok, CAST(count(*) AS BIGINT) AS o
        FROM toks t JOIN top ON top.tok = t.tok
        GROUP BY 1, 2
    ),
    src_total AS (
        SELECT source, CAST(sum(o) AS BIGINT) AS stot
        FROM per_src GROUP BY source
    ),
    terms AS (
        SELECT p.source,
               (CAST(p.o AS DOUBLE)
                - CAST(s.stot AS DOUBLE) * t.n / ct.tot)
               * (CAST(p.o AS DOUBLE)
                  - CAST(s.stot AS DOUBLE) * t.n / ct.tot)
               / (CAST(s.stot AS DOUBLE) * t.n / ct.tot) AS term,
               p.tok
        FROM per_src p
        JOIN top t ON t.tok = p.tok
        JOIN src_total s ON s.source = p.source
        CROSS JOIN corpus_total ct
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_tokens_compared,
           CAST(list_sum(list(term ORDER BY tok)) AS DOUBLE) AS chi2
    FROM terms
    GROUP BY source
    """,
)
def text_vocab_chi2_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary drift per source: the chi-square statistic of each
    source's top-token distribution against the corpus-wide expectation —
    the domain-shift detector a curation pipeline runs when a new crawl
    snapshot lands (a chi² jump on one source means its content changed,
    not just its volume). Chi-square instead of KL/JS divergence is a
    DELIBERATE determinism choice: (O−E)²/E needs no logarithm, so every
    term is a few IEEE mul/divs from exact integer counts, and the
    per-source sum folds in fixed token order — bit-identical
    cross-engine, where any log-based divergence would drift in the
    last ulp.

    Shape: one token scan builds corpus counts; the top-{_CHI2_TOP_VOCAB}
    vocabulary broadcasts into the per-source recount; the chi² fold runs
    over ≤ |sources|×{_CHI2_TOP_VOCAB} collapsed rows.
    """
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "source", F.explode(F.split("text", " ")).alias("tok")
    ).filter(F.col("tok") != "")
    corpus = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy(F.col("n").desc(), "tok")
    top = (
        corpus.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _CHI2_TOP_VOCAB)
        .select("tok", "n")
    )
    corpus_total = top.agg(F.sum("n").cast("bigint").alias("tot"))
    per_src = (
        toks.join(F.broadcast(top.select("tok")), "tok")
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("o"))
    )
    src_total = per_src.groupBy("source").agg(
        F.sum("o").cast("bigint").alias("stot")
    )
    exp = (
        F.col("stot").cast("double") * F.col("n") / F.col("tot")
    )
    terms = (
        per_src.join(F.broadcast(top), "tok")
        .join(F.broadcast(src_total), "source")
        .crossJoin(F.broadcast(corpus_total))
        .select(
            "source",
            "tok",
            (
                (F.col("o").cast("double") - exp)
                * (F.col("o").cast("double") - exp)
                / exp
            ).alias("term"),
        )
    )
    return terms.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens_compared"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("tok", "term"))),
            F.lit(0.0),
            lambda acc, s: acc + s["term"],
        ).alias("chi2"),
    )


@query(
    "text_sentence_segment",
    oracle="""
    WITH seg AS (
        SELECT doc_id, lang,
               list_filter(
                   list_transform(regexp_split_to_array(text, '[.!?]+'),
                                  s -> trim(s)),
                   s -> s <> ''
               ) AS sents
        FROM documents
    )
    SELECT doc_id, lang,
           CAST(len(sents) AS BIGINT) AS n_sentences,
           CAST(coalesce(list_max(list_transform(sents, s -> length(s))), 0)
                AS BIGINT) AS max_sent_chars,
           CAST(coalesce(list_sum(list_transform(sents, s -> length(s))), 0)
                AS BIGINT) AS total_sent_chars
    FROM seg
    """,
)
def text_sentence_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence segmentation statistics — the unit-of-text preprocessor
    under sentence-level dedup, chunking-for-RAG, and readability scoring:
    split each document on terminal punctuation runs ([.!?]+), trim, drop
    empties, and report per-doc sentence count plus max/total sentence
    length. Both engines run the SAME regex split + lambda pipeline
    (Spark ``split``/``transform``/``filter`` HOFs ↔ DuckDB
    ``regexp_split_to_array``/``list_transform``/``list_filter``), so the
    segmentation itself — not just row counts — is hash-verified.

    Scale shape: entirely narrow per-row array work inside whole-stage
    codegen; no shuffle at all (the output is per-document). The array
    materializes ONCE per row into a column before the per-sentence
    lambdas touch it — re-evaluating split() inside a lambda is the
    documented O(n²) trap (operators/__init__ lesson).
    """
    d = load(spark, sf_dir, "documents")
    sents = F.filter(
        F.transform(F.split("text", r"[.!?]+"), lambda s: F.trim(s)),
        lambda s: s != "",
    )
    seg = d.select("doc_id", "lang", sents.alias("sents"))
    lens = F.transform("sents", lambda s: F.length(s))
    return seg.select(
        "doc_id",
        "lang",
        F.size("sents").cast("bigint").alias("n_sentences"),
        F.coalesce(F.array_max(lens), F.lit(0))
        .cast("bigint")
        .alias("max_sent_chars"),
        F.coalesce(
            F.aggregate(lens, F.lit(0), lambda acc, x: acc + x), F.lit(0)
        )
        .cast("bigint")
        .alias("total_sent_chars"),
    )


@query(
    "text_readability_fre",
    oracle="""
    WITH feats AS (
        SELECT doc_id,
               greatest(len(list_filter(
                   list_transform(regexp_split_to_array(text, '[.!?]+'),
                                  s -> trim(s)),
                   s -> s <> '')), 1) AS n_sent,
               length(text) - length(replace(text, ' ', '')) + 1 AS n_words,
               length(regexp_replace(lower(text), '[aeiou]+', '#', 'g'))
                 - length(regexp_replace(lower(text), '[aeiou]+', '', 'g'))
                 AS n_syll
        FROM documents
    )
    SELECT doc_id,
           CAST(n_words AS BIGINT) AS n_words,
           CAST(n_sent AS BIGINT) AS n_sentences,
           CAST(n_syll AS BIGINT) AS n_syllables,
           CAST(206835 - (1015 * n_words) // n_sent
                       - (84600 * n_syll) // greatest(n_words, 1)
                AS BIGINT) AS fre_x1000,
           CASE WHEN 206835 - (1015 * n_words) // n_sent
                       - (84600 * n_syll) // greatest(n_words, 1) >= 90000
                THEN 'very_easy'
                WHEN 206835 - (1015 * n_words) // n_sent
                       - (84600 * n_syll) // greatest(n_words, 1) >= 60000
                THEN 'standard'
                WHEN 206835 - (1015 * n_words) // n_sent
                       - (84600 * n_syll) // greatest(n_words, 1) >= 30000
                THEN 'difficult'
                ELSE 'very_difficult' END AS band
    FROM feats
    """,
)
def text_readability_fre(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease scoring in exact fixed-point arithmetic — the
    classic readability gate corpus pipelines bucket documents by
    (text simplification targets, grade-level routing, child-safety
    tiers). Syllables use the standard vowel-group proxy, counted exactly
    as (length after collapsing each [aeiou]+ run to one char) − (length
    after deleting the runs) — one run ⇒ one count, no per-word loop. The
    formula 206.835 − 1.015·(words/sentence) − 84.6·(syllables/word) is
    served ×1000 with integer DIVs, so scores and bands are bit-identical
    across engines (the float formula would disagree in the last ulp).

    Scale shape: three regexp passes per row, zero shuffles, all inside
    one WholeStageCodegen projection — readability of a 100 TB corpus
    costs exactly one scan.
    """
    d = load(spark, sf_dir, "documents")
    n_sent = F.greatest(
        F.size(
            F.filter(
                F.transform(F.split("text", r"[.!?]+"), lambda s: F.trim(s)),
                lambda s: s != "",
            )
        ),
        F.lit(1),
    )
    n_words = (
        F.length("text") - F.length(F.replace(F.col("text"), F.lit(" ")))
        + F.lit(1)
    )
    lowered = F.lower(F.col("text"))
    n_syll = F.length(
        F.regexp_replace(lowered, "[aeiou]+", "#")
    ) - F.length(F.regexp_replace(lowered, "[aeiou]+", ""))
    feats = d.select(
        "doc_id",
        n_words.cast("bigint").alias("n_words"),
        n_sent.cast("bigint").alias("n_sentences"),
        n_syll.cast("bigint").alias("n_syllables"),
    )
    fre = (
        F.lit(206835)
        - F.expr("(1015 * n_words) DIV n_sentences")
        - F.expr("(84600 * n_syllables) DIV greatest(n_words, 1)")
    )
    return feats.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        fre.cast("bigint").alias("fre_x1000"),
        F.when(fre >= 90000, "very_easy")
        .when(fre >= 60000, "standard")
        .when(fre >= 30000, "difficult")
        .otherwise("very_difficult")
        .alias("band"),
    )


_QB_OFF = 30  # per-token margin offset making the scaled quotient nonnegative


@query(
    "quality_margin_bins",
    oracle=f"""
    WITH weights AS (
        SELECT b.bucket,
               (CAST(('0x' || substr(md5('w' || CAST(b.bucket AS VARCHAR)), 1, 8))
                     AS BIGINT) % 41) - 20 AS weight
        FROM (SELECT unnest(generate_series(0, {_QM_BUCKETS - 1})) AS bucket) b
    ),
    feats AS (
        SELECT d.doc_id,
               CAST(('0x' || substr(md5(u.tok), 1, 8)) AS BIGINT)
                   % {_QM_BUCKETS} AS bucket,
               count(*) AS tf
        FROM documents d,
             LATERAL (SELECT unnest(string_split(d.text, ' ')) AS tok) u
        WHERE u.tok <> ''
        GROUP BY 1, 2
    ),
    scored AS (
        SELECT f.doc_id,
               CAST(sum(f.tf) AS BIGINT) AS n_tokens,
               CAST(sum(f.tf * w.weight) + {_QM_BIAS} AS BIGINT) AS score_sum,
               (sum(f.tf * w.weight) + {_QM_BIAS} >= 0) AS keep
        FROM feats f JOIN weights w ON w.bucket = f.bucket
        GROUP BY 1
    ),
    m AS (
        SELECT s.doc_id, d.source, s.n_tokens, s.keep,
               CAST((s.score_sum + {_QB_OFF} * s.n_tokens) * 1000000
                    // s.n_tokens - {_QB_OFF} * 1000000 AS BIGINT)
                   AS margin_x1e6
        FROM scored s JOIN documents d ON d.doc_id = s.doc_id
    ),
    dom AS (
        SELECT source, margin_x1e6 AS mg, count(*) AS c FROM m GROUP BY 1, 2
    ),
    cumd AS (
        SELECT source, mg, c,
               CAST(sum(c) OVER (PARTITION BY source ORDER BY mg) AS BIGINT)
                   AS cum
        FROM dom
    ),
    tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM dom GROUP BY 1),
    thr AS (
        SELECT c.source,
               min(CASE WHEN c.cum * 4 >= t.n THEN c.mg END) AS t1,
               min(CASE WHEN c.cum * 2 >= t.n THEN c.mg END) AS t2,
               min(CASE WHEN c.cum * 4 >= 3 * t.n THEN c.mg END) AS t3
        FROM cumd c JOIN tot t ON t.source = c.source
        GROUP BY 1
    ),
    binned AS (
        SELECT m.source, m.n_tokens, m.keep, m.margin_x1e6,
               1 + CASE WHEN m.margin_x1e6 > t.t1 THEN 1 ELSE 0 END
                 + CASE WHEN m.margin_x1e6 > t.t2 THEN 1 ELSE 0 END
                 + CASE WHEN m.margin_x1e6 > t.t3 THEN 1 ELSE 0 END AS bin
        FROM m JOIN thr t ON t.source = m.source
    )
    SELECT source, CAST(bin AS INT) AS bin,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
           min(margin_x1e6) AS margin_min_x1e6,
           max(margin_x1e6) AS margin_max_x1e6
    FROM binned GROUP BY 1, 2
    """,
)
def quality_margin_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain quality binning over the hashing-trick model margins —
    the perplexity-proxy curriculum table (VERDICT r6 #5): for each source
    domain, split its documents into four quality quartiles by
    mean-per-token margin and report each bin's doc/token mass, the table
    a data-mixing pass reads to upsample high-quality tails per domain
    (a real perplexity needs ln() and can never hash cross-engine; the
    linear model's margin is the standard servable proxy).

    Integer exactness: the per-token margin is
    (score_sum + {_QB_OFF}·n_tokens)·1e6 DIV n_tokens − {_QB_OFF}e6 —
    the {_QB_OFF}-per-token shift keeps the numerator nonnegative (weights
    are ≥ −20/token, bias −3), so Spark's truncate-toward-zero DIV and
    DuckDB's floor // agree. Quartile THRESHOLDS come from the collapsed
    per-(source, margin) value domain (cum·4 ≥ N ⇔ cum ≥ N/4 in exact
    integers), and bin = 1 + #(thresholds strictly below) — value-based,
    tie-stable, no per-doc ntile.

    Scale shape: margins are one shuffle-free corpus scan (the quality
    model's in-row fold, `_qm_score_cols`, with `source` carried in the
    same projection — no re-join), checkpointed narrow (numbers only) for
    the two consumers; the threshold spine works on the COLLAPSED
    (source, margin) domain — orders of magnitude smaller than the corpus
    — and broadcasts ≤ #sources rows back; the final rollup is one
    partial-agg groupBy. No global sort, no per-source single-reducer pass
    over raw docs (the window runs on the collapsed domain only).
    Zero-token docs never enter the model's feature join and are absent
    here too, matching the oracle's inner joins.
    """
    # Optimization r8: the quality scores are computed IN-ROW with
    # `source` carried in the same scan projection (see _qm_score_cols),
    # so the old qm ⋈ documents re-join on doc_id is gone. The narrow
    # doc-level margin frame feeds TWO consumers (the threshold spine and
    # the final binning), and with no exchange left upstream to reuse, an
    # un-checkpointed plan would run the md5-per-token scan twice — the
    # lazy localCheckpoint materializes the 4-narrow-column frame once
    # (numbers only, ~30 B/doc at any scale: the standard staged-margins
    # shape, 1000× smaller than the text it summarizes).
    qm = _qm_score_cols(
        load(spark, sf_dir, "documents"), "source"
    )
    m = qm.select(
        "source",
        "n_tokens",
        "keep",
        (
            (F.col("score_sum") + _QB_OFF * F.col("n_tokens"))
            * F.lit(1000000)
        )
        .cast("bigint")
        .alias("num"),
    ).select(
        "source",
        "n_tokens",
        "keep",
        (
            F.expr("num DIV n_tokens") - F.lit(_QB_OFF * 1000000)
        ).cast("bigint").alias("margin_x1e6"),
    ).localCheckpoint(eager=False)
    dom = m.groupBy("source", F.col("margin_x1e6").alias("mg")).agg(
        F.count(F.lit(1)).alias("c")
    )
    w_cum = Window.partitionBy("source").orderBy("mg")
    cumd = dom.withColumn("cum", F.sum("c").over(w_cum).cast("bigint"))
    tot = dom.groupBy("source").agg(F.sum("c").cast("bigint").alias("n"))
    thr = (
        cumd.join(tot, "source")
        .groupBy("source")
        .agg(
            F.min(F.when(F.col("cum") * 4 >= F.col("n"), F.col("mg"))).alias("t1"),
            F.min(F.when(F.col("cum") * 2 >= F.col("n"), F.col("mg"))).alias("t2"),
            F.min(
                F.when(F.col("cum") * 4 >= 3 * F.col("n"), F.col("mg"))
            ).alias("t3"),
        )
    )
    binned = m.join(F.broadcast(thr), "source").select(
        "source",
        "n_tokens",
        "keep",
        "margin_x1e6",
        (
            F.lit(1)
            + (F.col("margin_x1e6") > F.col("t1")).cast("int")
            + (F.col("margin_x1e6") > F.col("t2")).cast("int")
            + (F.col("margin_x1e6") > F.col("t3")).cast("int")
        ).alias("bin"),
    )
    return binned.groupBy("source", "bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_keep"),
        F.min("margin_x1e6").alias("margin_min_x1e6"),
        F.max("margin_x1e6").alias("margin_max_x1e6"),
    )


_ZIPF_HEAD_K = 10  # "head" = the K most frequent types per source


@query(
    "text_zipf_head_share",
    oracle=f"""
    WITH toks AS (
        SELECT d.source, u.tok
        FROM documents d,
             LATERAL (SELECT unnest(string_split(d.text, ' ')) AS tok) u
        WHERE u.tok <> ''
    ),
    dom AS (
        SELECT source, tok, CAST(count(*) AS BIGINT) AS c
        FROM toks GROUP BY 1, 2
    ),
    ranked AS (
        SELECT source, tok, c,
               row_number() OVER (
                   PARTITION BY source ORDER BY c DESC, tok
               ) AS rnk
        FROM dom
    )
    SELECT source,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_types,
           CAST(sum(CASE WHEN rnk <= {_ZIPF_HEAD_K} THEN c ELSE 0 END)
                * 10000 // sum(c) AS BIGINT) AS head_share_x10k,
           CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS hapax_types,
           CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 10000
                // count(*) AS BIGINT) AS hapax_share_x10k
    FROM ranked GROUP BY source
    """,
)
def text_zipf_head_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf head/tail diagnostics per source — the rank-frequency shape
    check a corpus curator runs before trusting similarity joins and
    df-capped indexes on a new slice: the top-{_ZIPF_HEAD_K} type share
    (a heavy head means stop-shingle ceilings and prefix filters have
    little tail to prune on — the exact regime the 10x scale bench showed
    turning blocked joins quadratic) and the hapax-legomena type share
    (a thin tail means OCR noise / template spam; a fat one, healthy
    Heaps growth). All ratios are integer cross-multiplied (x10k) — a
    log-log Zipf slope fit would need ln() and can never hash
    cross-engine; the head/hapax masses carry the same signal exactly.

    Scale shape: one corpus scan collapses to the (source, type) domain
    with map-side partial counts; the rank window runs on the COLLAPSED
    domain (vocabulary-sized, orders of magnitude under the token
    stream); the rollup is one partial-agg groupBy. No global sort.
    """
    toks = (
        load(spark, sf_dir, "documents")
        .select("source", F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok") != "")
    )
    dom = toks.groupBy("source", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    w = Window.partitionBy("source").orderBy(F.col("c").desc(), "tok")
    ranked = dom.withColumn("rnk", F.row_number().over(w))
    return ranked.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        F.expr(
            f"CAST(sum(CASE WHEN rnk <= {_ZIPF_HEAD_K} THEN c ELSE 0 END)"
            " * 10000 DIV sum(c) AS BIGINT)"
        ).alias("head_share_x10k"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("hapax_types"),
        F.expr(
            "CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 10000"
            " DIV count(*) AS BIGINT)"
        ).alias("hapax_share_x10k"),
    )


# ---- per-document language-segment splitting (VERDICT r7 #5) ----------------
_SEG_BLOCK = 8  # tokens per detection window (disjoint blocks)
# tiny per-language stopword dictionaries — deterministic, shared verbatim
# with the oracle. Overlaps ('de'/'la' across de/fr/es) are resolved by the
# fixed preference order in _SEG_LABEL_CASE.
_SEG_EN = ("the", "a", "of", "and", "to", "in", "is")
_SEG_DE = ("der", "die", "das", "und", "ist", "von", "mit")
_SEG_ES = ("el", "los", "las", "y", "por", "un", "es")
_SEG_FR = ("le", "les", "et", "dans", "une", "est", "du")


def _seg_hits(col: str) -> dict[str, str]:
    """SQL CASE fragments counting stopword hits per language for token
    column ``col`` — identical text in both engines."""
    return {
        lang: "sum(CASE WHEN " + col + " IN ("
        + ", ".join(f"'{w}'" for w in words)
        + ") THEN 1 ELSE 0 END)"
        for lang, words in (
            ("de", _SEG_DE),
            ("en", _SEG_EN),
            ("es", _SEG_ES),
            ("fr", _SEG_FR),
        )
    }


# deterministic argmax: greatest hit count wins; ties break by the fixed
# order de < en < es < fr; all-zero blocks label 'und'
_SEG_LABEL_CASE = (
    "CASE WHEN greatest(h_de, h_en, h_es, h_fr) = 0 THEN 'und' "
    "WHEN h_de = greatest(h_de, h_en, h_es, h_fr) THEN 'de' "
    "WHEN h_en = greatest(h_de, h_en, h_es, h_fr) THEN 'en' "
    "WHEN h_es = greatest(h_de, h_en, h_es, h_fr) THEN 'es' "
    "ELSE 'fr' END"
)


def _lang_segments_oracle() -> str:
    hits = _seg_hits("t")
    return f"""
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    tok AS (
        SELECT doc_id, (i - 1) // {_SEG_BLOCK} AS blk, toks[i] AS t
        FROM d, LATERAL (
            SELECT unnest(generate_series(1, len(toks))) AS i
        ) u
    ),
    blocks AS (
        SELECT doc_id, blk,
               {hits['de']} AS h_de, {hits['en']} AS h_en,
               {hits['es']} AS h_es, {hits['fr']} AS h_fr
        FROM tok GROUP BY doc_id, blk
    ),
    labeled AS (
        SELECT doc_id, blk, {_SEG_LABEL_CASE} AS label FROM blocks
    ),
    runs AS (
        SELECT doc_id, blk, label,
               blk - row_number() OVER (
                   PARTITION BY doc_id, label ORDER BY blk
               ) AS grp
        FROM labeled
    )
    SELECT doc_id,
           CAST(min(blk) AS BIGINT) AS start_block,
           CAST(count(*) AS BIGINT) AS n_blocks,
           label
    FROM runs GROUP BY doc_id, label, grp
    """


@query("text_lang_segments", oracle=_lang_segments_oracle())
def text_lang_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document LANGUAGE-SEGMENT splitting (VERDICT r7 #5) — the
    multilingual-document gate: label every disjoint {_SEG_BLOCK}-token
    window by stopword-dictionary argmax (deterministic tie-break, 'und'
    when no dictionary hits), then collapse consecutive same-label
    windows into runs. Each output row is one segment (doc_id,
    start_block, n_blocks, label) — the spans a curation pipeline feeds
    to per-language downstream gates, or uses to split mixed documents
    before packing.

    Scale shape: one token explode collapsed immediately by a partial-agg
    groupBy to the (doc, block) domain (≈ tokens/{_SEG_BLOCK} rows); the
    run-collapse is the gaps-and-islands window on the per-doc block
    spine, partitioned by doc — no joins, no self-join, nothing
    quadratic. Dictionaries live in the expression (IN-lists), so the
    scan stays whole-stage codegen with zero broadcast.
    """
    hits = _seg_hits("tok")
    toks = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos", "tok"),
    )
    blocks = (
        toks.withColumn("blk", F.expr(f"pos DIV {_SEG_BLOCK}"))
        .groupBy("doc_id", "blk")
        .agg(
            F.expr(hits["de"]).alias("h_de"),
            F.expr(hits["en"]).alias("h_en"),
            F.expr(hits["es"]).alias("h_es"),
            F.expr(hits["fr"]).alias("h_fr"),
        )
    )
    labeled = blocks.select(
        "doc_id", "blk", F.expr(_SEG_LABEL_CASE).alias("label")
    )
    w = Window.partitionBy("doc_id", "label").orderBy("blk")
    runs = labeled.withColumn(
        "grp", F.col("blk") - F.row_number().over(w)
    )
    return runs.groupBy("doc_id", "label", "grp").agg(
        F.min("blk").cast("bigint").alias("start_block"),
        F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
    ).select("doc_id", "start_block", "n_blocks", "label")


# ---- char-trigram source style profiles (text.py append) --------------------
_KGRAM_N = 3  # character n-gram width


def _kgram_cosine_oracle() -> str:
    return f"""
    WITH d AS (SELECT source, text, length(text) AS n FROM documents),
    grams AS (
        SELECT source, substr(text, i, {_KGRAM_N}) AS g
        FROM d, LATERAL (
            SELECT unnest(generate_series(1, n - {_KGRAM_N} + 1)) AS i
        ) u
        WHERE n >= {_KGRAM_N}
    ),
    prof AS (SELECT source, g, count(*) AS c FROM grams GROUP BY source, g),
    nrm AS (
        SELECT source, sqrt(CAST(sum(c * c) AS DOUBLE)) AS nr
        FROM prof GROUP BY source
    ),
    dots AS (
        SELECT a.source AS src_a, b.source AS src_b, sum(a.c * b.c) AS dot
        FROM prof a JOIN prof b ON b.g = a.g AND b.source > a.source
        GROUP BY 1, 2
    )
    SELECT d.src_a, d.src_b,
           CAST(d.dot AS BIGINT) AS dot,
           CAST(floor(CAST(d.dot * 1000000 AS DOUBLE) / (na.nr * nb.nr))
                AS BIGINT) AS cosine_x1e6
    FROM dots d
    JOIN nrm na ON na.source = d.src_a
    JOIN nrm nb ON nb.source = d.src_b
    """


@query("text_kgram_source_cosine", oracle=_kgram_cosine_oracle())
def text_kgram_source_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise SOURCE style similarity via character-{_KGRAM_N}-gram
    profiles: each source's texts collapse to one n-gram count vector,
    and every source pair gets the exact cosine between profiles — the
    classic authorship/style fingerprint (character n-grams are the
    strongest single stylometry feature) and the dedup-adjacent signal
    for "these two crawls mirror each other".

    Exactness: integer dot products over int64 counts; norms are IEEE
    sqrt of exact integers, and the final floor((dot·1e6)/(na·nb))
    performs the identical operation sequence in both engines — the
    module's bit-identical-cosine discipline applied to count vectors.

    Scale shape: the n-gram explode collapses IMMEDIATELY to the
    (source, gram) domain by a partial-agg groupBy (profile size ≈
    distinct grams, Heaps-bounded ≪ corpus chars); the pair join runs on
    the gram key over profiles (posting-list join, output bounded by
    sources² which is tiny); norms are per-source scalars joined back.
    The corpus is scanned once; nothing pairwise touches documents.

    Optimization r8: grams come from a per-char split array via O(1)
    ``element_at`` instead of ``substring(text, i, k)`` — the latter
    re-walks the UTF8 string from its head on every call (O(i) per
    position, O(len²) per document).

    Optimization r9 (guide §2.3 "narrower types"): the gram key is the
    {_KGRAM_N} code points PACKED into one bigint (each code point <
    2^21, so the packing is bijective — grouping and joining on the
    packed key is exactly grouping/joining on the gram string, while
    the exploded stream carries an int64 instead of an allocated
    {_KGRAM_N}-char string and the profile aggregations hash ints)."""
    d = load(spark, sf_dir, "documents").select(
        "source", "text", F.length("text").alias("n")
    )
    gram_expr = " + ".join(
        f"ascii(element_at(ca, i + {k})) * {1 << (21 * (_KGRAM_N - 1 - k))}"
        for k in range(_KGRAM_N)
    )
    grams = (
        d.filter(F.col("n") >= _KGRAM_N)
        .withColumn("ca", F.expr("split(text, '')"))
        .select(
            "source",
            F.explode(
                F.expr(
                    f"transform(sequence(1, n - {_KGRAM_N} + 1),"
                    f" i -> CAST({gram_expr} AS BIGINT))"
                )
            ).alias("g"),
        )
    )
    prof = grams.groupBy("source", "g").agg(F.count(F.lit(1)).alias("c"))
    nrm = prof.groupBy("source").agg(
        F.sqrt(F.sum(F.col("c") * F.col("c")).cast("double")).alias("nr")
    )
    a = prof.select(F.col("source").alias("src_a"), "g", F.col("c").alias("ca"))
    b = prof.select(F.col("source").alias("src_b"), "g", F.col("c").alias("cb"))
    dots = (
        a.join(b, "g")
        .filter(F.col("src_b") > F.col("src_a"))
        .groupBy("src_a", "src_b")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("dot"))
    )
    na = nrm.select(F.col("source").alias("src_a"), F.col("nr").alias("na"))
    nb = nrm.select(F.col("source").alias("src_b"), F.col("nr").alias("nb"))
    return (
        dots.join(F.broadcast(na), "src_a")
        .join(F.broadcast(nb), "src_b")
        .select(
            "src_a",
            "src_b",
            F.col("dot").cast("bigint").alias("dot"),
            F.expr(
                "CAST(floor(CAST(dot * 1000000 AS DOUBLE) / (na * nb))"
                " AS BIGINT)"
            ).alias("cosine_x1e6"),
        )
    )
