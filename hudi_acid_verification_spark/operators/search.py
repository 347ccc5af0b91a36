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
