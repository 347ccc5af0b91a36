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
