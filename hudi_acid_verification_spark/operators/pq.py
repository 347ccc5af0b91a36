"""Product-quantization ANN (``similarity_pq_adc``) over ``embeddings``.

The missing third leg of the ANN triad (LSH buckets → IVF cells → PQ codes):
at 100 TB the raw float vectors no longer fit the cluster's memory, so the
corpus is stored as M small centroid CODES per vector and queries score the
compressed corpus through a per-query lookup table (Asymmetric Distance
Computation), touching the original vectors only to re-rank a short
candidate list — the Jegou et al. PQ scheme every billion-scale vector
store runs (FAISS IVFPQ with re-ranking, SCaNN).

Two-stage query, like the other ANN ops' probe→rescore shape:
1. ADC shortlist — exact-integer squared-L2 between the query's subvectors
   and each vector's codebook entries, summed across M=32 two-dim
   subspaces; keep the top-R=100 candidates per query. Fully code-domain:
   O(N·M) table lookups, no float vectors touched.
2. Exact rescore — the shortlist (R ≪ N rows) joins back to the quantized
   vectors for an exact int64 cosine; output is the top-5 of the shortlist.
   Measured at sf0.001: the shortlist contains ALL exact top-5 neighbors
   (recall@5 = 1.0, pinned ≥ 0.8 by the invariant test), so the operator's
   answer matches brute force while scanning codes instead of vectors.

Codebooks are deterministic (the subvectors of vec_id 8..23) the way
``similarity_ivf`` seeds deterministic centroids, so both engines derive
the identical index from the data alone and the comparison is exact; the
trained path would run per-subspace Lloyd rounds exactly as
``similarity_kmeans_multi`` does for IVF. Everything that decides ranks is
exact int64 on 1e7-quantized elements (similarity.py convention) —
bit-identical in DuckDB.

Scale notes: encoding is one corpus scan against BROADCAST codebooks
(O(N·M·K), no corpus shuffle); the retained code table is 32 small ints
per vector — the ~8× compression vs float32 (and 64× vs float64) is the
point; ADC joins the code table against a broadcast per-query LUT
(Q·M·K rows) and aggregates per (query, vector); only the shortlist —
R rows per query, not the corpus — reaches the exact-rescore join. In the
IVFPQ composition the IVF probe (similarity_ivf) cuts the code scan
itself to nprobe/K of the corpus first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import load, query
from .similarity import _ORACLE_ELEMS, _dot_q, _quant

_M = 32           # subspaces
_SUB_DIM = 2      # dims per subspace (32 × 2 = 64)
_CODE_LO = 8      # vec_id 8..23 seed the codebooks (disjoint from queries)
_CODE_HI = 23
_N_QUERIES = 8    # vec_id < 8 are the query vectors
_SHORTLIST = 100  # ADC candidates kept per query for exact rescore
_TOP_K = 5


@query(
    "similarity_pq_adc",
    oracle=f"""
    WITH {_ORACLE_ELEMS},
    sub AS (
        SELECT vec_id, (i - 1) // {_SUB_DIM} AS m, i, x FROM elems
    ),
    cent AS (
        SELECT vec_id AS k, m, i, x FROM sub
        WHERE vec_id BETWEEN {_CODE_LO} AND {_CODE_HI}
    ),
    d AS (
        SELECT s.vec_id, s.m, c.k,
               CAST(sum((s.x - c.x) * (s.x - c.x)) AS BIGINT) AS dist
        FROM sub s JOIN cent c ON c.i = s.i
        GROUP BY 1, 2, 3
    ),
    codes AS (
        SELECT vec_id, m, k AS code FROM (
            SELECT vec_id, m, k,
                   row_number() OVER (
                       PARTITION BY vec_id, m ORDER BY dist, k
                   ) AS rn
            FROM d
        ) WHERE rn = 1
    ),
    lut AS (
        SELECT vec_id AS query_id, m, k, dist FROM d
        WHERE vec_id < {_N_QUERIES}
    ),
    adc AS (
        SELECT l.query_id, c.vec_id AS neighbor_id,
               CAST(sum(l.dist) AS BIGINT) AS adc_dist
        FROM codes c JOIN lut l ON l.m = c.m AND l.k = c.code
        WHERE c.vec_id != l.query_id
        GROUP BY 1, 2
    ),
    shortlist AS (
        SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
                   row_number() OVER (
                       PARTITION BY query_id ORDER BY adc_dist, neighbor_id
                   ) AS rn
            FROM adc
        ) WHERE rn <= {_SHORTLIST}
    ),
    rescored AS (
        SELECT s.query_id, s.neighbor_id,
               CAST(sum(q.x * v.x) AS DOUBLE) / (nq.nrm * nv.nrm) AS cosine
        FROM shortlist s
        JOIN elems q ON q.vec_id = s.query_id
        JOIN elems v ON v.vec_id = s.neighbor_id AND v.i = q.i
        JOIN norms nq ON nq.vec_id = s.query_id
        JOIN norms nv ON nv.vec_id = s.neighbor_id
        GROUP BY s.query_id, s.neighbor_id, nq.nrm, nv.nrm
    )
    SELECT query_id, neighbor_id, cosine, rnk FROM (
        SELECT query_id, neighbor_id, cosine,
               row_number() OVER (
                   PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
               ) AS rnk
        FROM rescored
    ) WHERE rnk <= {_TOP_K}
    """,
)
def similarity_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ encode → ADC shortlist → exact rescore top-k (see module doc)."""
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", _quant(F.col("embedding")).alias("qv")
    )
    emb = emb.withColumn(
        "nrm", F.sqrt(_dot_q(F.col("qv"), F.col("qv")).cast("double"))
    )
    # Optimization r9 (guide §2.4 "remove shuffles outright"): encoding
    # and ADC are per-ROW functions of (vector, codebook) and (codes,
    # query LUT) — the earlier shape exploded N×M subvector rows, joined
    # them against the centroid rows (N·M·K = 10.2M rows at sf0.1) and
    # paid TWO hash aggregations (argmin per (vec, m); ADC sum per
    # (query, neighbor)). Here the K×M codebook folds into ONE broadcast
    # row (16 quantized vectors — KB-sized at any corpus scale) and both
    # the argmin and the LUT evaluate IN-ROW; the only rows that ever
    # exist are N code rows and Q·N ADC rows. Distances are the same
    # exact int64 products, and array_min over struct(dist, k) is
    # min(struct(dist, k)) — identical codes, identical sums.
    def _sd(a: str, b: str) -> str:
        terms = [
            f"(element_at({a}, m*{_SUB_DIM}+{j}) - element_at({b}, m*{_SUB_DIM}+{j}))"
            f" * (element_at({a}, m*{_SUB_DIM}+{j}) - element_at({b}, m*{_SUB_DIM}+{j}))"
            for j in range(1, _SUB_DIM + 1)
        ]
        return "(" + " + ".join(terms) + ")"

    cb_row = (
        emb.filter(F.col("vec_id").between(_CODE_LO, _CODE_HI))
        .select(F.col("vec_id").alias("k"), "qv")
        .agg(F.sort_array(F.collect_list(F.struct("k", "qv"))).alias("cbl"))
    )
    enc = emb.crossJoin(F.broadcast(cb_row))
    codes_arr = F.expr(
        f"transform(sequence(0, {_M - 1}), m -> "
        f"array_min(transform(cbl, c -> "
        f"struct({_sd('qv', 'c.qv')} AS dist, c.k AS k))).k)"
    )
    codes = enc.select("vec_id", codes_arr.alias("codes"))
    lut_arr = F.expr(
        f"transform(sequence(0, {_M - 1}), m -> "
        f"transform(cbl, c -> {_sd('qv', 'c.qv')}))"
    )
    lut_rows = enc.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), lut_arr.alias("lut")
    )
    adc_dist = F.expr(
        f"aggregate(sequence(0, {_M - 1}), 0L, (acc, m) -> acc + "
        f"element_at(element_at(lut, m+1), "
        f"CAST(element_at(codes, m+1) - {_CODE_LO - 1} AS INT)))"
    )
    adc = (
        codes.crossJoin(F.broadcast(lut_rows))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            adc_dist.cast("bigint").alias("adc_dist"),
        )
    )
    w_short = Window.partitionBy("query_id").orderBy("adc_dist", "neighbor_id")
    shortlist = (
        adc.withColumn("rn", F.row_number().over(w_short))
        .filter(F.col("rn") <= _SHORTLIST)
        .select("query_id", "neighbor_id")
    )
    # only query vectors can appear on the query side of the rescore —
    # filter BEFORE broadcasting (optimization r8: the unfiltered frame
    # broadcast the FULL embedding table, corpus-proportional — the
    # unbounded-broadcast class — for a join whose keys are < _N_QUERIES
    # by construction)
    qside = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("qv").alias("qq"),
        F.col("nrm").alias("qn"),
    )
    vside = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("qv").alias("vq"),
        F.col("nrm").alias("vn"),
    )
    rescored = (
        shortlist.join(F.broadcast(qside), "query_id")
        .join(vside, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            (
                _dot_q(F.col("qq"), F.col("vq")).cast("double")
                / (F.col("qn") * F.col("vn"))
            ).alias("cosine"),
        )
    )
    w_top = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), "neighbor_id"
    )
    return (
        rescored.withColumn("rnk", F.row_number().over(w_top))
        .filter(F.col("rnk") <= _TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rnk")
    )
