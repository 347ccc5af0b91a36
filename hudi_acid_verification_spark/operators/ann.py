"""Embedding-space dedup and IVF-style ANN (north-star training-data ops).

- ``dedup_embedding_cosine``: near-duplicate detection by pairwise cosine —
  a vector is a duplicate if some LOWER vec_id is within the threshold; the
  survivor (canonical) is the smallest such id. Brute-force O(N²) pairing is
  the sf-scale oracle baseline; at 100 TB the pair generation is replaced by
  the LSH bucket join (similarity.py) so only same-bucket pairs are scored —
  the scoring + canonicalization below is unchanged.
- ``similarity_ivf``: inverted-file ANN — corpus vectors are assigned to
  their nearest centroid (the "cells"); a query probes only its ``nprobe``
  nearest cells and exact-rescores that shortlist. Centroids here are a
  deterministic subset of the corpus (vec_id % 31 == 0) standing in for
  k-means output, so both engines share the "trained" index exactly.

Determinism: all dots/norms use the 1e7 integer quantization from
similarity.py — exact int64 sums, order-independent, bit-identical across
Spark and DuckDB.

Scale notes (IVF): the centroid table is tiny → broadcast; assignment is one
corpus scan × broadcast (no shuffle); the probe join shuffles only the
candidate shortlist (~nprobe/K of the corpus per query), which is the whole
point of IVF at 1000-executor scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import load, query
from .similarity import _dot_int, _ORACLE_ELEMS

_DUP_TAU = 0.35      # cosine threshold for near-duplicate
_CENT_MOD = 31       # vec_id % 31 == 0 → centroid (deterministic "k-means")
_N_QUERIES = 8       # vec_id < 8 are the query vectors
_NPROBE = 2
_TOP_K = 5


@query(
    "dedup_embedding_cosine",
    oracle=f"""
    WITH {_ORACLE_ELEMS},
    dots AS (
        SELECT a.vec_id AS lo, b.vec_id AS hi, sum(a.x * b.x) AS dot
        FROM elems a
        JOIN elems b ON b.i = a.i AND b.vec_id > a.vec_id
        GROUP BY 1, 2
    )
    SELECT d.hi AS vec_id, min(d.lo) AS dup_of,
           max(CAST(d.dot AS DOUBLE) / (na.nrm * nb.nrm)) AS max_cosine
    FROM dots d
    JOIN norms na ON na.vec_id = d.lo
    JOIN norms nb ON nb.vec_id = d.hi
    WHERE CAST(d.dot AS DOUBLE) / (na.nrm * nb.nrm) >= {_DUP_TAU}
    GROUP BY d.hi
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: each duplicate vector with its canonical
    survivor (smallest lower id within the threshold) and its closest match.
    """
    emb = load(spark, sf_dir, "embeddings")
    lo = emb.select(F.col("vec_id").alias("lo"), F.col("embedding").alias("lvec"))
    hi = emb.select(F.col("vec_id").alias("hi"), F.col("embedding").alias("hvec"))
    nl = F.sqrt(_dot_int(F.col("lvec"), F.col("lvec")).cast("double"))
    nh = F.sqrt(_dot_int(F.col("hvec"), F.col("hvec")).cast("double"))
    cosine = _dot_int(F.col("lvec"), F.col("hvec")).cast("double") / (nl * nh)
    return (
        lo.join(hi, F.col("hi") > F.col("lo"))
        .select("lo", "hi", cosine.alias("cosine"))
        .filter(F.col("cosine") >= _DUP_TAU)
        .groupBy(F.col("hi").alias("vec_id"))
        .agg(
            F.min("lo").alias("dup_of"),
            F.max("cosine").alias("max_cosine"),
        )
    )


def _ivf_oracle() -> str:
    cos = "CAST(d.dot AS DOUBLE) / (nv.nrm * nc.nrm)"
    return f"""
    WITH {_ORACLE_ELEMS},
    cdots AS (
        SELECT a.vec_id, b.vec_id AS cent_id, sum(a.x * b.x) AS dot
        FROM elems a
        JOIN elems b ON b.i = a.i AND b.vec_id % {_CENT_MOD} = 0
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT d.vec_id, d.cent_id,
               row_number() OVER (
                   PARTITION BY d.vec_id
                   ORDER BY {cos} DESC, d.cent_id
               ) AS rn
        FROM cdots d
        JOIN norms nv ON nv.vec_id = d.vec_id
        JOIN norms nc ON nc.vec_id = d.cent_id
    ),
    assign AS (SELECT vec_id, cent_id FROM ranked WHERE rn = 1),
    probes AS (
        SELECT vec_id AS query_id, cent_id FROM ranked
        WHERE rn <= {_NPROBE} AND vec_id < {_N_QUERIES}
    ),
    cands AS (
        SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id
        FROM probes p
        JOIN assign a ON a.cent_id = p.cent_id AND a.vec_id != p.query_id
    ),
    rescored AS (
        SELECT c.query_id, c.neighbor_id, sum(q.x * v.x) AS dot
        FROM cands c
        JOIN elems q ON q.vec_id = c.query_id
        JOIN elems v ON v.vec_id = c.neighbor_id AND v.i = q.i
        GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id, cosine, rnk FROM (
        SELECT r.query_id, r.neighbor_id,
               CAST(r.dot AS DOUBLE) / (nq.nrm * nn.nrm) AS cosine,
               row_number() OVER (
                   PARTITION BY r.query_id
                   ORDER BY CAST(r.dot AS DOUBLE) / (nq.nrm * nn.nrm) DESC,
                            r.neighbor_id
               ) AS rnk
        FROM rescored r
        JOIN norms nq ON nq.vec_id = r.query_id
        JOIN norms nn ON nn.vec_id = r.neighbor_id
    ) WHERE rnk <= {_TOP_K}
    """


@query("similarity_ivf", oracle=_ivf_oracle())
def similarity_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: assign → probe nprobe cells → exact rescore → top-k.

    Assignment and probing are one corpus scan against a BROADCAST centroid
    table; only the per-query candidate shortlist is rescored.
    """
    emb = load(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") % _CENT_MOD == 0).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cvec")
    )

    nv = F.sqrt(_dot_int(F.col("embedding"), F.col("embedding")).cast("double"))
    nc = F.sqrt(_dot_int(F.col("cvec"), F.col("cvec")).cast("double"))
    cos_vc = _dot_int(F.col("embedding"), F.col("cvec")).cast("double") / (nv * nc)

    ranked = (
        emb.join(F.broadcast(cents))
        .select("vec_id", "embedding", "cent_id", cos_vc.alias("cos"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(
                    F.col("cos").desc(), F.col("cent_id")
                )
            ),
        )
    )
    assign = ranked.filter(F.col("rn") == 1).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("nvec"),
        "cent_id",
    )
    probes = ranked.filter(
        (F.col("rn") <= _NPROBE) & (F.col("vec_id") < _N_QUERIES)
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qvec"),
        "cent_id",
    )

    nq = F.sqrt(_dot_int(F.col("qvec"), F.col("qvec")).cast("double"))
    nn = F.sqrt(_dot_int(F.col("nvec"), F.col("nvec")).cast("double"))
    rescore = _dot_int(F.col("qvec"), F.col("nvec")).cast("double") / (nq * nn)

    cands = (
        F.broadcast(probes)
        .join(assign, "cent_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "qvec", "neighbor_id", "nvec")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        cands.select("query_id", "neighbor_id", rescore.alias("cosine"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rnk")
    )
