"""UDF surface demos (SURVEY.md §2B footnote): one vectorized @pandas_udf
(cosine scoring) and one applyInPandas per-key state fold mirroring the
verification algebra's expectation fold (producer.py).

Both rows-only: they exist to prove the Arrow-batched Python escape hatch
carries real semantics, not to beat the JVM paths (which the oracled
similarity/dedup operators already cover).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import load, query


@query("udf_cosine_pandas")  # rows-only: pandas-UDF demo
def udf_cosine_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized cosine-vs-centroid scoring with a @pandas_udf.

    The label-5 centroid is computed in Spark (exact aggregate), broadcast
    into the UDF closure, and each Arrow batch is scored with one numpy
    matmul — the ~10-100× path over row-at-a-time Python.
    """
    import numpy as np

    emb = load(spark, sf_dir, "embeddings")
    centroid_rows = (
        emb.filter(F.col("label") == 5)
        .select(F.posexplode("embedding").alias("i", "x"))
        .groupBy("i")
        .agg(F.avg("x").alias("m"))
        .orderBy("i")
        .collect()
    )
    centroid = np.array([r["m"] for r in centroid_rows], dtype=np.float64)
    cnorm = float(np.linalg.norm(centroid))

    @F.pandas_udf(T.DoubleType())
    def cos_to_centroid(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy()).astype(np.float64)
        dots = mat @ centroid
        norms = np.linalg.norm(mat, axis=1) * cnorm
        return pd.Series(np.where(norms > 0, dots / norms, 0.0))

    return (
        emb.select(
            "vec_id", "label", cos_to_centroid("embedding").alias("cos_to_label5")
        )
        .orderBy(F.col("cos_to_label5").desc(), "vec_id")
        .limit(50)
    )


@query("udf_state_fold")  # rows-only: applyInPandas stateful-fold demo
def udf_state_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key ordered state fold via applyInPandas — the same fold shape as
    the verification algebra (verify/producer.py): walk a key's events in
    order, thread a state machine, emit the final state.

    State per user: running balance (sum of purchase values − refunds),
    current streak of same-type events, and max streak seen.
    """
    e = load(spark, sf_dir, "events").select("user_id", "ts_ns", "event_type", "value")

    out_schema = (
        "user_id bigint, n_events long, balance double, max_streak int, "
        "last_event string"
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts_ns")
        balance, streak, max_streak, prev = 0.0, 0, 0, None
        for etype, value in zip(pdf["event_type"], pdf["value"]):
            if etype == "purchase":
                balance += value
            elif etype == "refund":
                balance -= value
            streak = streak + 1 if etype == prev else 1
            max_streak = max(max_streak, streak)
            prev = etype
        return pd.DataFrame(
            [
                (
                    pdf["user_id"].iloc[0],
                    len(pdf),
                    round(balance, 4),
                    max_streak,
                    prev,
                )
            ],
            columns=["user_id", "n_events", "balance", "max_streak", "last_event"],
        )

    return e.groupBy("user_id").applyInPandas(fold, schema=out_schema)


@query(
    "udtf_token_spans",
    oracle="""
    SELECT doc_id,
           unnest(generate_series(1, len(string_split(text, ' ')))) AS pos,
           unnest(string_split(text, ' ')) AS token,
           unnest(list_transform(string_split(text, ' '), t -> len(t)))
               AS tok_len
    FROM documents
    WHERE doc_id % 20 = 0
    """,
)
def udtf_token_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function) surface: one input row → N output rows
    via a LATERAL join — the user-extensible generator the reference's
    stack delegates to Spark (§2A lists UDTF as absent from the reference
    itself). Tokenizes each sampled document into (position, token, length)
    rows; being pure and deterministic, the expansion is DuckDB-oracled
    exactly (zipped unnest), unlike the rows-only UDF demos.

    Arrow-batched (``useArrow=True``): rows cross the JVM↔Python boundary
    in columnar batches, not one pickled row at a time. Still the slow
    path versus the built-in ``posexplode(split(...))`` that expresses this
    exact query JVM-side — a UDTF earns its cost only when the expansion
    logic can't be written as SQL/HOF expressions (parsers, decoders,
    tokenizers with real vocabularies).

    Scale notes: a UDTF is per-row map work — no shuffle, parallel across
    partitions; output cardinality (~tokens per doc) multiplies the frame,
    so the doc_id sample gate runs BEFORE the lateral join (pushed to the
    scan) rather than after the blow-up.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, token string, tok_len int", useArrow=True)
    class TokenSpans:
        def eval(self, text: str):
            if text is None:
                return
            for i, tok in enumerate(text.split(" ")):
                yield i + 1, tok, len(tok)

    spark.udtf.register("token_spans", TokenSpans)
    load(spark, sf_dir, "documents").filter(F.col("doc_id") % 20 == 0).select(
        "doc_id", "text"
    ).createOrReplaceTempView("udtf_docs_v")
    return spark.sql(
        "SELECT d.doc_id, s.pos, s.token, s.tok_len "
        "FROM udtf_docs_v d, LATERAL token_spans(d.text) s"
    )


@query(
    "udaf_pandas_grouped",
    oracle="""
    SELECT c_mktsegment,
           CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS balance_cents,
           count(*) AS n_customers
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def udaf_pandas_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF (the UDAF surface): a custom Arrow-
    batched aggregate — integer-cent balance sum — plugged directly into
    ``groupBy().agg(...)`` beside built-ins. §2A lists UDAF as absent from
    the reference; this is the Spark-native form (no JVM Aggregator class
    needed from Python).

    Exactness: the UDF quantizes to int64 cents INSIDE the aggregate
    (floor(x·100 + 0.5) — IEEE-identical in numpy and both engines), so the
    sum is order-independent integer math and oracles exactly despite
    crossing the Python boundary.

    Scale notes: grouped-agg pandas UDFs receive each group's column as one
    Arrow series — no partial aggregation map-side, so the full group
    shuffles (the documented trade vs built-in aggregates, which combine).
    Keep groups bounded (here: 5 segments × ~N/5 rows); for unbounded
    groups, pre-reduce with a built-in partial first.
    """
    import numpy as np

    @F.pandas_udf("long")
    def cents_sum(bal: pd.Series) -> int:
        return int(np.floor(bal.to_numpy(dtype=np.float64) * 100 + 0.5).sum())

    @F.pandas_udf("long")
    def n_rows(bal: pd.Series) -> int:
        # Spark refuses to mix grouped-agg pandas UDFs with built-in
        # aggregates in one agg() (INVALID_PANDAS_UDF_PLACEMENT), so the
        # count is a pandas aggregate too.
        return len(bal)

    return (
        load(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            cents_sum("c_acctbal").alias("balance_cents"),
            n_rows("c_acctbal").alias("n_customers"),
        )
    )


@query("udf_quality_model_pandas")  # rows-only: pandas-UDF serving twin —
# exact-parity invariant test vs the JVM text_quality_model instead
def udf_quality_model_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch model inference through the Arrow/pandas path: the SAME
    hashing-trick linear classifier as ``text_quality_model``, but served
    by a ``mapInPandas`` batch scorer instead of JVM expressions — the
    plumbing a real model (sklearn/torch) rides: weights materialized
    once per task (stand-in for loading a checkpoint), whole Arrow
    batches scored vectorized, schema declared up front. A pytest pins
    EXACT output parity with the JVM twin, which is the property you want
    before swapping a fast JVM approximation for a Python model or vice
    versa.

    Scale notes: mapInPandas streams batches at constant memory; the
    weight table is built per task from the deterministic formula (a real
    model would arrive via SparkFiles/broadcast once per executor, not
    per batch). The JVM twin is ~the same speed here (tiny model) but
    needs no Python workers — mapInPandas earns its cost only when the
    per-batch work is a real model forward pass.
    """
    import hashlib
    from collections.abc import Iterator

    from .text import _QM_BIAS, _QM_BUCKETS

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    out_schema = (
        "doc_id bigint, n_tokens bigint, score_sum bigint, "
        "mean_margin double, keep boolean"
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        weights = [
            int(hashlib.md5(f"w{b}".encode()).hexdigest()[:8], 16) % 41 - 20
            for b in range(_QM_BUCKETS)
        ]

        def doc_score(text: str) -> tuple:
            toks = [t for t in text.split(" ") if t]
            s = _QM_BIAS
            for t in toks:
                h = int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
                s += weights[h % _QM_BUCKETS]
            n = len(toks)
            return n, s, s / n if n else 0.0, s >= 0

        for pdf in batches:
            scored = [doc_score(t) for t in pdf["text"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_tokens": [x[0] for x in scored],
                    "score_sum": [x[1] for x in scored],
                    "mean_margin": [x[2] for x in scored],
                    "keep": [x[3] for x in scored],
                }
            )

    return d.mapInPandas(score, schema=out_schema)
