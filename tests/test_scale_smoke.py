"""Scale-smoke tests: drive the >fixture-scale code paths END TO END on
synthetically enlarged inputs, so the levers the 100 TB design notes claim
(wide LSH signatures, bucket-cap salting, prefix-join pruning on a realistic
vocabulary) are exercised by real execution, not only by unit monkeypatches.

The synthetic tables are written as parquet into a temp dir shaped like a
fixture sf_dir, so the operators run through their normal load() path.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from hudi_acid_verification_spark.operators import ann, dedup


@pytest.fixture(scope="module")
def scale_dir(spark):
    """A synthetic sf_dir: 120k random embeddings (past the _LSH_SMALL_N
    wide-signature threshold) and 20k documents over a 5k-token vocabulary
    (a realistic df distribution, unlike the fixtures' 31-word corpus)."""
    base = os.path.join(
        tempfile.gettempdir(), "hudi_acid_verification_spark", "scale_smoke"
    )
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base, exist_ok=True)

    n_vec = 120_000
    emb = spark.range(n_vec).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[
                (F.rand(seed=7 + i) * 2 - 1).cast("float")
                for i in range(64)
            ]
        ).alias("embedding"),
        F.lit(0).alias("label"),
    )
    emb.write.mode("overwrite").parquet(os.path.join(base, "embeddings.parquet"))

    n_doc, vocab = 20_000, 5_000
    docs = spark.range(n_doc).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.concat(
                    F.lit("w"),
                    F.pmod(F.xxhash64(F.col("id") * 31 + F.lit(i)), F.lit(vocab)),
                )
                for i in range(30)
            ],
        ).alias("text"),
        F.lit("en").alias("lang"),
        F.lit("synthetic").alias("source"),
        F.lit(0).cast("bigint").alias("n_chars"),
    )
    docs.write.mode("overwrite").parquet(os.path.join(base, "documents.parquet"))
    yield base
    shutil.rmtree(base, ignore_errors=True)


def test_wide_lsh_engages_and_completes_at_120k_vectors(spark, scale_dir):
    """Past _LSH_SMALL_N the banding must AUTO-select the 64-plane / 8-bit
    parameterization (band keys widen to 8 bits) and the whole candidate +
    rescore pipeline must complete on 120k vectors — the regime where the
    old 2-bit bands were all-pairs-in-disguise."""
    assert 120_000 > ann._LSH_SMALL_N
    bands = ann._salted_bands(spark, scale_dir)
    one = bands.select(F.length("band_key").alias("w")).first()
    assert one["w"] == ann._LSH_LARGE_BAND_BITS, (
        "wide signature did not engage past _LSH_SMALL_N"
    )
    sizes = (
        bands.groupBy("band_id", "band_key", "g1", "g2")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.max("c").alias("m"))
        .first()["m"]
    )
    assert sizes <= 3 * ann._LSH_BUCKET_CAP
    # end-to-end: rescore runs; random 64-dim vectors concentrate near
    # cosine 0, so >=tau pairs are rare — the point is completion, not count
    n_pairs = ann._lsh_band_pairs(spark, scale_dir).count()
    assert n_pairs >= 0


def test_prefix_join_prunes_on_realistic_vocabulary(spark, scale_dir):
    """On a 5k-token vocabulary the prefix emission guard must stay far
    below its ceiling and the operator must complete on 20k docs — the
    regime the fixtures' 31-word corpus cannot exercise (there the cost is
    output-bound by 41% true-pair density)."""
    out = dedup.dedup_prefix_filter_join(spark, scale_dir)
    n = out.count()
    # hash-sampled 30-token docs over 5k tokens: expected Jaccard between
    # distinct docs ~ 30²/5000 / 60 ≈ 0.003 — essentially no >=0.7 pairs
    assert n < 1_000
