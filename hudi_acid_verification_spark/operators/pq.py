"""Product-quantization ANN (``similarity_pq_adc``) over ``embeddings``.

The missing third leg of the ANN triad (LSH buckets → IVF cells → PQ codes):
at 100 TB the raw float vectors no longer fit the cluster's memory, so the
corpus is stored as M small centroid CODES per vector (here 4 bytes instead
of 256) and queries score candidates through a per-query lookup table
(Asymmetric Distance Computation) without ever touching the original
vectors — the Jegou et al. PQ scheme every billion-scale vector store uses
(FAISS IVFPQ, SCaNN). Codebook training is k-means per subspace; this
operator uses deterministic codebooks (the subvectors of vec_id 8..15) the
way ``similarity_ivf`` uses deterministic centroids, so both engines derive
the identical index from the data alone and the comparison is exact.

Everything is exact int64 arithmetic on 1e7-quantized elements (the
similarity.py convention): subspace distances, codes (argmin with smallest-k
tie-break), and ADC scores are integers — bit-identical in DuckDB.

Scale notes: encoding is one corpus scan against BROADCAST codebooks
(O(N·M·K) work, no shuffle of the corpus); the code table is the only thing
retained (4 small ints per vector — the 64× compression is the point); ADC
scoring joins the code table against a broadcast per-query LUT (Q·M·K rows)
and aggregates per (query, vector) — shuffle width is the candidate
shortlist, and in the IVFPQ composition that shortlist is first cut by the
IVF probe (similarity_ivf) before PQ rescoring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import load, query
from .similarity import _ORACLE_ELEMS, _quant

_M = 4            # subspaces
_SUB_DIM = 16     # dims per subspace (4 × 16 = 64)
_CODE_LO = 8      # vec_id 8..15 seed the codebooks (disjoint from queries)
_CODE_HI = 15
_N_QUERIES = 8    # vec_id < 8 are the query vectors
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
    )
    SELECT query_id, neighbor_id, adc_dist, rnk FROM (
        SELECT query_id, neighbor_id, adc_dist,
               row_number() OVER (
                   PARTITION BY query_id ORDER BY adc_dist, neighbor_id
               ) AS rnk
        FROM adc
    ) WHERE rnk <= {_TOP_K}
    """,
)
def similarity_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ encode + ADC top-k: quantize → slice into M=4 subspaces → code
    each subvector as its nearest codebook entry (exact integer squared
    distance, smallest-k tie-break) → score every (query, vector) pair as
    the sum of the query's per-subspace LUT distances at the vector's
    codes → per-query top-5 by ADC distance.

    The corpus is touched exactly once (encode); everything downstream
    runs on the 4-int code table. Both joins broadcast the small side
    (codebooks: M·K rows; LUT: Q·M·K rows), so the only corpus-wide
    shuffle is the final per-query top-k window over the scored pairs.
    """
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", _quant(F.col("embedding")).alias("qv")
    )
    subspaces = F.array(
        *[F.slice("qv", m * _SUB_DIM + 1, _SUB_DIM) for m in range(_M)]
    )
    subs = emb.select(
        "vec_id", F.posexplode(subspaces).alias("m", "sub")
    )
    cents = subs.filter(F.col("vec_id").between(_CODE_LO, _CODE_HI)).select(
        F.col("vec_id").alias("k"), "m", F.col("sub").alias("csub")
    )
    sqdist = F.aggregate(
        F.zip_with("sub", "csub", lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"),
        lambda acc, z: acc + z,
    )
    dists = subs.join(F.broadcast(cents), "m").select(
        "vec_id", "m", "k", sqdist.alias("dist")
    )
    codes = (
        dists.groupBy("vec_id", "m")
        .agg(F.min(F.struct("dist", "k")).alias("mn"))
        .select("vec_id", "m", F.col("mn.k").alias("code"))
    )
    lut = dists.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("m").alias("lut_m"),
        F.col("k").alias("lut_k"),
        "dist",
    )
    adc = (
        codes.join(
            F.broadcast(lut),
            (F.col("m") == F.col("lut_m")) & (F.col("code") == F.col("lut_k")),
        )
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("dist").cast("bigint").alias("adc_dist"))
    )
    w = Window.partitionBy("query_id").orderBy("adc_dist", "neighbor_id")
    return (
        adc.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _TOP_K)
        .select("query_id", "neighbor_id", "adc_dist", "rnk")
    )
