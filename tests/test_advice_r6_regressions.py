"""Regressions for the round-6 ADVICE findings: data-dependent edge cases
the sf fixtures never hit, pinned on synthetic degenerate fixtures so they
can never silently return.

- `pipeline_bigram_coverage`: a single-token or empty-text document made
  F.sequence(0, size-2) expand as [0, -1] (step defaults to -1 when
  start > stop) and element_at(t, 0) then threw INVALID_INDEX_OF_ZERO,
  while the DuckDB oracle's generate_series(1, len-1) cleanly emitted no
  bigrams for the same doc.
- `sketch_theta_setops`: an empty sample intersection collapsed the whole
  chained-crossJoin result to 0 rows (groupBy over zero rows) while the
  oracle's scalar subquery returned one row with NULL est_intersect.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import duckdb
import pytest
from pyspark.sql import functions as F

import hudi_acid_verification_spark.operators as ops
from tests.oracle_check import normalize


def _mini_oracle(sql: str, sf_dir: str, tables: tuple[str, ...]):
    """tests.oracle_check.run_oracle registers every fixture table; the
    degenerate dirs here only carry the tables the operator reads."""
    con = duckdb.connect()
    for t in tables:
        # Spark writes {t}.parquet as a DIRECTORY of part files (the
        # driver fixtures are single files) — glob inside it.
        con.execute(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM read_parquet('{sf_dir}/{t}.parquet/*.parquet')"
        )
    tbl = con.execute(sql).arrow()
    con.close()
    cols = list(tbl.schema.names)
    rows = [tuple(d.values()) for d in tbl.to_pylist()]
    return cols, rows


@pytest.fixture(scope="module")
def degenerate_dir(spark):
    base = os.path.join(
        tempfile.gettempdir(), "hudi_acid_verification_spark", "advice_r6"
    )
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base, exist_ok=True)

    # documents: doc_id % 3 == 0 is the "trained corpus" side; include
    # degenerate docs on BOTH sides of the split (single-token, empty).
    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma alpha beta", "en", "webA", 0),
            (1, "alpha beta delta", "en", "webA", 0),
            (2, "solo", "en", "webA", 0),  # single token: zero bigrams
            (3, "", "en", "webB", 0),  # empty: split -> [""], zero bigrams
            (4, "beta gamma", "en", "webB", 0),
            (5, "epsilon", "en", "webB", 0),  # single token, eval side
        ],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    docs.write.mode("overwrite").parquet(os.path.join(base, "documents.parquet"))

    # events: click and purchase user sets fully DISJOINT, so the theta
    # sample intersection below min-theta is empty.
    ev = spark.range(200).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id") * 60).alias("ts"),
        F.when(F.col("id") < 100, F.col("id") + 1)
        .otherwise(F.col("id") + 100_001)
        .cast("bigint")
        .alias("user_id"),
        F.when(F.col("id") < 100, F.lit("click"))
        .otherwise(F.lit("purchase"))
        .alias("event_type"),
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    ev.write.mode("overwrite").parquet(os.path.join(base, "events.parquet"))
    yield base
    shutil.rmtree(base, ignore_errors=True)


def test_bigram_coverage_survives_degenerate_docs(spark, degenerate_dir):
    """Single-token / empty docs must emit zero bigrams (not crash), and
    the result must still match the oracle on the same fixture."""
    sdf = ops.QUERIES["pipeline_bigram_coverage"](spark, degenerate_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    d_cols, d_rows = _mini_oracle(
        ops.ORACLES["pipeline_bigram_coverage"], degenerate_dir, ("documents",)
    )
    assert sorted(s_cols) == sorted(d_cols)
    assert normalize(s_cols, s_rows) == normalize(d_cols, d_rows)
    # the degenerate docs contributed no eval bigrams: webB's only eval
    # bigrams come from doc 4 ("beta gamma") — doc 3 and 5 vanish cleanly
    by_src = {r["source"]: r for r in (row.asDict() for row in sdf.collect())}
    assert by_src["webB"]["n_bigrams"] == 1


def test_theta_setops_empty_intersection_keeps_one_row(spark, degenerate_dir):
    """Disjoint click/purchase audiences: the sample intersection is empty;
    the operator must still return exactly ONE row (NULL est_intersect),
    matching the oracle's scalar-subquery semantics — not zero rows."""
    sdf = ops.QUERIES["sketch_theta_setops"](spark, degenerate_dir)
    s_rows = sdf.collect()
    assert len(s_rows) == 1
    row = s_rows[0].asDict()
    assert row["est_intersect"] is None
    assert row["exact_intersect"] == 0
    d_cols, d_rows = _mini_oracle(
        ops.ORACLES["sketch_theta_setops"], degenerate_dir, ("events",)
    )
    assert normalize(sdf.columns, [tuple(r) for r in s_rows]) == normalize(
        d_cols, d_rows
    )
