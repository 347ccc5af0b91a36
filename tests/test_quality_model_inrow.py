"""The in-row quality model's precomputed weight table must equal the
oracle's SQL formulation exactly — the r8 rewrite moved the weights from a
Spark-evaluated frame into a Python-precomputed array literal, and this
pin is what makes that move safe against drift in either formulation."""

import duckdb

from hudi_acid_verification_spark.operators.text import (
    _QM_BUCKETS,
    _QM_WEIGHTS,
)


def test_weight_literal_matches_sql_formulation():
    rows = duckdb.connect().execute(
        f"""
        SELECT (CAST(('0x' || substr(md5('w' || CAST(b.bucket AS VARCHAR)),
                      1, 8)) AS BIGINT) % 41) - 20 AS weight
        FROM (SELECT unnest(generate_series(0, {_QM_BUCKETS - 1}))
              AS bucket) b
        ORDER BY b.bucket
        """
    ).fetchall()
    assert [r[0] for r in rows] == _QM_WEIGHTS
    assert len(_QM_WEIGHTS) == _QM_BUCKETS
