"""Hybrid retrieval (RAG-serving surface): lexical + vector arms fused by
reciprocal-rank fusion — the ranking shape modern retrieval stacks
(BM25 ∪ ANN → RRF) run for every query, expressed as two declarative arms
over the aligned ``documents``/``embeddings`` fixtures (doc_id == vec_id).

Cross-engine exactness: the vector arm scores with the quantized-int dot
machinery (similarity.py); the lexical arm scores by EXACT distinct shared
tokens; both arm ranks are integers, and the RRF sum
``1/(K+r_vec) + 1/(K+r_lex)`` is two correctly-rounded IEEE divisions and
one addition in a fixed order — bit-identical in DuckDB, so even the fused
scores hash-match.

Scale notes (100 TB): the lexical arm is an inverted-index join (shuffle on
token, partial-agg pair counts) — at scale the posting lists come from a
search index, but the join shape is identical; the vector arm is the
broadcast-queries × corpus scan whose production form swaps in the IVF/LSH
probe (similarity_ivf / similarity_ann_lsh — same interface, cheaper scan).
Fusion itself touches only the two arms' top-N shortlists: O(queries × N),
negligible forever. Query batches beat per-query loops in every arm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import load, query
from .similarity import _N_QUERIES, _ORACLE_ELEMS, _dot_q, _quant

_RRF_K = 60
_ARM_TOP = 20
_FINAL_TOP = 5


@query(
    "search_hybrid_rrf",
    oracle=f"""
    WITH {_ORACLE_ELEMS},
    dots AS (
        SELECT q.vec_id AS query_id, v.vec_id AS doc_id,
               sum(q.x * v.x) AS dot
        FROM elems q
        JOIN elems v ON v.i = q.i
        WHERE q.vec_id < {_N_QUERIES} AND v.vec_id != q.vec_id
        GROUP BY 1, 2
    ),
    vec_ranked AS (
        SELECT query_id, doc_id,
               row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY CAST(d.dot AS DOUBLE) / (nq.nrm * nv.nrm) DESC,
                            doc_id
               ) AS r_vec
        FROM dots d
        JOIN norms nq ON nq.vec_id = d.query_id
        JOIN norms nv ON nv.vec_id = d.doc_id
    ),
    vec_top AS (SELECT * FROM vec_ranked WHERE r_vec <= {_ARM_TOP}),
    toks AS (
        SELECT DISTINCT doc_id, u.tok
        FROM documents d,
             LATERAL (SELECT unnest(string_split(d.text, ' ')) AS tok) u
        WHERE u.tok <> ''
    ),
    shared AS (
        SELECT q.doc_id AS query_id, c.doc_id AS doc_id,
               count(*) AS n_shared
        FROM toks q
        JOIN toks c ON c.tok = q.tok AND c.doc_id != q.doc_id
        WHERE q.doc_id < {_N_QUERIES}
        GROUP BY 1, 2
    ),
    lex_ranked AS (
        SELECT query_id, doc_id,
               row_number() OVER (
                   PARTITION BY query_id ORDER BY n_shared DESC, doc_id
               ) AS r_lex
        FROM shared
    ),
    lex_top AS (SELECT * FROM lex_ranked WHERE r_lex <= {_ARM_TOP}),
    fused AS (
        SELECT coalesce(v.query_id, l.query_id) AS query_id,
               coalesce(v.doc_id, l.doc_id) AS doc_id,
               v.r_vec, l.r_lex,
               coalesce(1.0 / ({_RRF_K} + v.r_vec), 0)
                   + coalesce(1.0 / ({_RRF_K} + l.r_lex), 0) AS rrf
        FROM vec_top v
        FULL OUTER JOIN lex_top l
          ON l.query_id = v.query_id AND l.doc_id = v.doc_id
    )
    SELECT query_id, doc_id,
           CAST(r_vec AS BIGINT) AS r_vec,
           CAST(r_lex AS BIGINT) AS r_lex,
           rrf, CAST(final_rank AS BIGINT) AS final_rank
    FROM (
        SELECT f.*,
               row_number() OVER (
                   PARTITION BY query_id ORDER BY rrf DESC, doc_id
               ) AS final_rank
        FROM fused f
    ) WHERE final_rank <= {_FINAL_TOP}
    """,
)
def search_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search: per query, rank candidates by exact-int cosine
    (vector arm) AND by distinct shared tokens (lexical arm), keep each
    arm's top-{_ARM_TOP}, fuse with reciprocal-rank fusion
    (Σ 1/({_RRF_K}+rank)), and return the fused top-{_FINAL_TOP} with both
    arm ranks for attribution. A doc found by only one arm still fuses
    (its other term is 0) — RRF's robustness property.
    """
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", _quant(F.col("embedding")).alias("qv")
    )
    emb = emb.withColumn(
        "nrm", F.sqrt(_dot_q(F.col("qv"), F.col("qv")).cast("double"))
    )
    queries = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("qv").alias("qq"),
        F.col("nrm").alias("qn"),
    )
    corpus = emb.select(
        F.col("vec_id").alias("doc_id"),
        F.col("qv").alias("vq"),
        F.col("nrm").alias("vn"),
    )
    w_vec = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), "doc_id"
    )
    vec_top = (
        F.broadcast(queries)
        .join(corpus, F.col("query_id") != F.col("doc_id"))
        .select(
            "query_id",
            "doc_id",
            (
                _dot_q(F.col("qq"), F.col("vq")).cast("double")
                / (F.col("qn") * F.col("vn"))
            ).alias("cosine"),
        )
        .withColumn("r_vec", F.row_number().over(w_vec))
        .filter(F.col("r_vec") <= _ARM_TOP)
        .select("query_id", "doc_id", "r_vec")
    )

    toks = (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .distinct()
    )
    qt = toks.filter(F.col("doc_id") < _N_QUERIES).select(
        F.col("doc_id").alias("query_id"), "tok"
    )
    shared = (
        qt.join(toks, "tok")
        .filter(F.col("doc_id") != F.col("query_id"))
        .groupBy("query_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    w_lex = Window.partitionBy("query_id").orderBy(
        F.col("n_shared").desc(), "doc_id"
    )
    lex_top = (
        shared.withColumn("r_lex", F.row_number().over(w_lex))
        .filter(F.col("r_lex") <= _ARM_TOP)
        .select("query_id", "doc_id", "r_lex")
    )

    fused = vec_top.join(lex_top, ["query_id", "doc_id"], "full_outer")
    rrf = F.coalesce(
        F.lit(1.0) / (F.lit(_RRF_K) + F.col("r_vec")), F.lit(0.0)
    ) + F.coalesce(
        F.lit(1.0) / (F.lit(_RRF_K) + F.col("r_lex")), F.lit(0.0)
    )
    w_fin = Window.partitionBy("query_id").orderBy(
        F.col("rrf").desc(), "doc_id"
    )
    return (
        fused.withColumn("rrf", rrf)
        .withColumn("final_rank", F.row_number().over(w_fin))
        .filter(F.col("final_rank") <= _FINAL_TOP)
        .select(
            "query_id",
            "doc_id",
            F.col("r_vec").cast("bigint").alias("r_vec"),
            F.col("r_lex").cast("bigint").alias("r_lex"),
            "rrf",
            F.col("final_rank").cast("bigint").alias("final_rank"),
        )
    )


_BM25_TERMS = ("merge", "stream", "window")  # fixed query, present in vocab
_BM25_TOP = 20
# k1 = 1.2 and b = 0.75 as the rationals 12/10 and 75/100; clearing all
# fractions from tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)) with
# avgdl = T/N gives the integer form   22·T·tf / (10·T·tf + 3·T + 9·dl·N).
_BM25_SCALE = 10_000


def _bm25_oracle() -> str:
    terms = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    return f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term,
               CAST(length(text) - length(replace(text, ' ', '')) + 1
                    AS BIGINT) AS dl
        FROM documents
    ),
    tf AS (
        SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf, min(dl) AS dl
        FROM toks WHERE term IN ({terms})
        GROUP BY doc_id, term
    ),
    stats AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(length(text) - length(replace(text, ' ', '')) + 1)
                    AS BIGINT) AS t
        FROM documents
    ),
    df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
    scored AS (
        SELECT tf.doc_id,
               CAST(sum(
                   ((s.n - df.df + 1) * 22 * s.t * tf.tf * {_BM25_SCALE})
                   // ((df.df + 1)
                       * (10 * s.t * tf.tf + 3 * s.t + 9 * tf.dl * s.n))
               ) AS BIGINT) AS score_x10k,
               CAST(count(*) AS BIGINT) AS n_terms_hit
        FROM tf, stats s
        JOIN df ON df.term = tf.term
        GROUP BY tf.doc_id
    )
    SELECT doc_id, score_x10k, n_terms_hit FROM (
        SELECT *, row_number() OVER (
            ORDER BY score_x10k DESC, doc_id
        ) AS rnk FROM scored
    ) WHERE rnk <= {_BM25_TOP}
    """


@query("search_bm25_topk", oracle=_bm25_oracle())
def search_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 lexical retrieval — the reference ranking function of every
    search/RAG stack — for a fixed {Q}-term query, top-{K} documents, in
    EXACT integer arithmetic. The classic score
    idf · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)) with k1=1.2, b=0.75 is
    cleared of fractions (avgdl = T/N stays the rational T/N, never a
    rounded float): per-term partial score =
    (N−df+1)·22·T·tf·SCALE DIV ((df+1)·(10·T·tf + 3·T + 9·dl·N)),
    using the rational idf (N−df+1)/(df+1) — monotone in the classic
    log-idf, standard in exact-arithmetic engines. Integer DIV per term,
    integer SUM across terms: bit-identical cross-engine, no ln(), no
    float accumulation order to disagree on.

    Scale shape: term postings come from one scan filtered to the query's
    terms (predicate pushdown keeps it cheap); df and the (N, T) corpus
    stats are broadcast-size frames joined back; the final top-{K} is
    TakeOrdered. At 100 TB the posting-list filter is the inverted-index
    probe a search index would serve — the join shape is identical.
    """
    docs = load(spark, sf_dir, "documents")
    dl = F.expr(
        "CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)"
    )
    tf = (
        docs.select("doc_id", dl.alias("dl"),
                    F.explode(F.split("text", " ")).alias("term"))
        .filter(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.min("dl").alias("dl"))
    )
    stats = docs.agg(
        F.count(F.lit(1)).alias("n"), F.sum(dl).alias("t")
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    part = F.expr(
        f"((n - df + 1) * 22 * t * tf * {_BM25_SCALE})"
        " DIV ((df + 1) * (10 * t * tf + 3 * t + 9 * dl * n))"
    )
    scored = (
        tf.crossJoin(F.broadcast(stats))
        .join(F.broadcast(df), "term")
        .select("doc_id", part.alias("part"))
        .groupBy("doc_id")
        .agg(
            F.sum("part").alias("score_x10k"),
            F.count(F.lit(1)).alias("n_terms_hit"),
        )
    )
    return scored.orderBy(
        F.col("score_x10k").desc(), "doc_id"
    ).limit(_BM25_TOP)
