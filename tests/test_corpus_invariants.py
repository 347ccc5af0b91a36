"""Semantic invariants of the round-2 corpus/ANN operators.

The DuckDB oracle pins cross-engine EQUALITY; these tests pin that the
shared specification itself means what it claims (conservation, bounds,
determinism, retrieval quality) — the properties a wrong-but-consistent
spec would still violate.
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from hudi_acid_verification_spark import operators as ops
from hudi_acid_verification_spark.operators import load
from tests.conftest import SF_SMALL


def test_token_pack_conserves_documents_and_tokens(spark):
    """Packing is a partition: every document lands in exactly one pack and
    the pack token sums add up to the corpus total."""
    packs = ops.QUERIES["pipeline_token_pack"](spark, SF_SMALL).collect()
    docs = (
        load(spark, SF_SMALL, "documents")
        .select(F.size(F.split("text", " ")).alias("n"))
        .agg(F.sum("n").alias("total"), F.count(F.lit(1)).alias("n_docs"))
        .collect()[0]
    )
    assert sum(p["n_docs"] for p in packs) == docs["n_docs"]
    assert sum(p["pack_tokens"] for p in packs) == docs["total"]
    # packs are budget-shaped: every non-final pack of a source starts
    # within budget of the previous one (pack ids are contiguous per source)
    by_source = defaultdict(list)
    for p in packs:
        by_source[p["source"]].append(p["pack_id"])
    for source, ids in by_source.items():
        ids = sorted(ids)
        assert ids == list(range(ids[0], ids[0] + len(ids))), (
            f"{source}: pack ids not contiguous: {ids}"
        )


def test_contamination_excludes_benchmark_and_bounds_ratio(spark):
    rows = ops.QUERIES["pipeline_contamination_ngram"](spark, SF_SMALL).collect()
    assert rows, "no corpus docs scored"
    for r in rows:
        assert r["doc_id"] % 17 != 0, "benchmark doc leaked into corpus scores"
        assert 0 <= r["n_contaminated"] <= r["n_grams"]
        assert 0.0 <= r["contamination_ratio"] <= 1.0
    # the fixture corpus contains exact duplicates, so contamination of a
    # duplicated benchmark doc must be detected (some doc fully flagged)
    assert any(r["n_contaminated"] > 0 for r in rows)


def test_domain_mix_respects_quotas_and_is_deterministic(spark):
    sel1 = ops.QUERIES["pipeline_domain_mix"](spark, SF_SMALL).collect()
    sel2 = ops.QUERIES["pipeline_domain_mix"](spark, SF_SMALL).collect()
    key = lambda r: (r["source"],)
    assert sorted(map(tuple, sel1)) == sorted(map(tuple, sel2)), (
        "selection not deterministic across runs"
    )
    counts = {
        r["source"]: r["n_docs"]
        for r in load(spark, SF_SMALL, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .collect()
    }
    for r in sel1:
        assert 1 <= r["weight"] <= 5
        assert r["n_selected"] == min(r["n_target"], counts[r["source"]])


def test_pii_scrub_masks_all_digit_runs(spark):
    out = ops.QUERIES["text_pii_scrub"](spark, SF_SMALL)
    # after scrubbing, re-scrubbing is a fixed point: no digits remain
    docs = load(spark, SF_SMALL, "documents").select("doc_id", "text")
    scrubbed = docs.select(
        F.regexp_replace(
            F.regexp_replace("text", "[a-z0-9]+@[a-z0-9]+\\.[a-z]+", "<EMAIL>"),
            "[0-9]+",
            "<NUM>",
        ).alias("s")
    )
    leftover = scrubbed.filter(F.col("s").rlike("[0-9]")).count()
    assert leftover == 0
    assert out.count() == docs.count()


def test_heavy_hitters_are_the_true_maxima(spark):
    top = ops.QUERIES["text_heavy_hitters"](spark, SF_SMALL).collect()
    assert len(top) == 25
    full = (
        load(spark, SF_SMALL, "documents")
        .select(F.explode(F.split("text", " ")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    floor = min(r["cnt"] for r in top)
    above = [r for r in full if r["cnt"] > floor]
    # every term strictly more frequent than the reported floor is reported
    assert {r["term"] for r in above} <= {r["term"] for r in top}


def test_pq_adc_rescore_recall_vs_exact(spark):
    """The ADC shortlist + exact rescore must recover the brute-force
    cosine top-5 (measured 1.0 at this scale; pinned ≥ 0.8 so codebook
    tweaks can't silently degrade retrieval to noise)."""
    exact = defaultdict(set)
    for r in ops.QUERIES["similarity_topk"](spark, SF_SMALL).collect():
        exact[r["query_id"]].add(r["neighbor_id"])
    approx = defaultdict(set)
    for r in ops.QUERIES["similarity_pq_adc"](spark, SF_SMALL).collect():
        approx[r["query_id"]].add(r["neighbor_id"])
    assert set(approx) == set(exact)
    recalls = [
        len(exact[q] & approx[q]) / len(exact[q]) for q in exact
    ]
    assert sum(recalls) / len(recalls) >= 0.8, f"recall collapsed: {recalls}"


def test_countmin_never_undercounts(spark):
    """CM guarantee: estimate >= exact for every reported term."""
    from hudi_acid_verification_spark import operators as ops

    rows = ops.QUERIES["sketch_countmin_topk"](spark, SF_SMALL).collect()
    assert rows
    assert all(r["overcount"] >= 0 for r in rows)


def test_bloom_no_false_negatives(spark):
    """Bloom guarantee: every truly-present probe is bloom-positive, and
    false positives are the only divergence."""
    from hudi_acid_verification_spark import operators as ops

    rows = ops.QUERIES["sketch_bloom_membership"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r["n_bloom_positive"] >= r["n_true_present"]
        assert r["n_false_positive"] == r["n_bloom_positive"] - r["n_true_present"]


def test_bpe_merges_match_pure_python_replay(spark):
    """pipeline_bpe_merges has no SQL oracle (iterative argmax + rewrite);
    replay the identical algorithm in pure Python on the collected corpus
    and compare every round bit-for-bit."""
    from hudi_acid_verification_spark.operators.corpus import (
        _BPE_ROUNDS,
        _BPE_SEP,
        _PAIR_SEP,
    )

    got = [
        (r["merge_round"], r["merged_pair"], r["pair_count"], r["n_merges"],
         r["tokens_after"])
        for r in ops.QUERIES["pipeline_bpe_merges"](spark, SF_SMALL)
        .orderBy("merge_round")
        .collect()
    ]

    docs = [
        r["text"].split(" ")
        for r in load(spark, SF_SMALL, "documents").select("text").collect()
    ]
    expected = []
    for rnd in range(1, _BPE_ROUNDS + 1):
        counts: dict[tuple[str, str], int] = defaultdict(int)
        for syms in docs:
            for x, y in zip(syms, syms[1:]):
                counts[(x, y)] += 1
        if not counts:
            break
        # argmax with (count DESC, pair ASC) tie-break — pair compared as
        # the joined string, exactly like the operator's ORDER BY
        (a, b), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0] + _PAIR_SEP + kv[0][1])
        )
        merged = a + _BPE_SEP + b
        before = sum(len(s) for s in docs)
        new_docs = []
        for syms in docs:
            acc: list[str] = []
            for t in syms:
                if acc and acc[-1] == a and t == b:
                    acc[-1] = merged
                else:
                    acc.append(t)
            new_docs.append(acc)
        docs = new_docs
        after = sum(len(s) for s in docs)
        expected.append(
            (rnd, (a + " " + b).replace(_BPE_SEP, " "), cnt, before - after, after)
        )
    assert got == expected


def test_bpe_encode_matches_pure_python_replay(spark):
    """pipeline_bpe_encode serves the trained merges; replay train + encode
    in pure Python and compare every per-source rollup bit-for-bit."""
    from hudi_acid_verification_spark.operators.corpus import (
        _bpe_train,
    )

    got = {
        r["source"]: (
            r["n_docs"], r["tokens_raw"], r["tokens_encoded"], r["saved_frac"]
        )
        for r in ops.QUERIES["pipeline_bpe_encode"](spark, SF_SMALL).collect()
    }
    _, merges = _bpe_train(spark, SF_SMALL)

    rows = (
        load(spark, SF_SMALL, "documents").select("source", "text").collect()
    )
    agg: dict[str, list[int]] = {}
    for r in rows:
        syms = r["text"].split(" ")
        enc = list(syms)
        for a, b, merged in merges:
            acc: list[str] = []
            for t in enc:
                if acc and acc[-1] == a and t == b:
                    acc[-1] = merged
                else:
                    acc.append(t)
            enc = acc
        st = agg.setdefault(r["source"], [0, 0, 0])
        st[0] += 1
        st[1] += len(syms)
        st[2] += len(enc)
    expected = {
        src: (n, raw, e, (raw - e) / raw) for src, (n, raw, e) in agg.items()
    }
    assert got == expected


def test_binaryfile_ingest_matches_duckdb_read_blob(spark):
    """source_binaryfile_ingest has no driver oracle (the fixed view set
    can't template file paths); pin it locally byte-exactly against
    DuckDB's read_blob over the same directory — name, size, and the
    md5-over-uppercase-hex content fingerprint must all agree."""
    import duckdb

    got = {
        r["file_name"]: (r["n_bytes"], r["content_md5"])
        for r in ops.QUERIES["source_binaryfile_ingest"](
            spark, SF_SMALL
        ).collect()
    }
    con = duckdb.connect()
    exp = {
        row[0]: (row[1], row[2])
        for row in con.execute(
            "SELECT regexp_extract(filename, '[^/]+$') AS f, "
            "CAST(octet_length(content) AS BIGINT), md5(hex(content)) "
            f"FROM read_blob('{SF_SMALL}/*.parquet')"
        ).fetchall()
    }
    assert got == exp


def test_pandas_quality_model_matches_jvm_twin(spark):
    """The Arrow/pandas serving path must produce EXACTLY the JVM
    expression path's classifications — the swap-safety property."""
    jvm = {
        r["doc_id"]: (
            r["n_tokens"], r["score_sum"], r["mean_margin"], r["keep"]
        )
        for r in ops.QUERIES["text_quality_model"](spark, SF_SMALL).collect()
    }
    py = {
        r["doc_id"]: (
            r["n_tokens"], r["score_sum"], r["mean_margin"], r["keep"]
        )
        for r in ops.QUERIES["udf_quality_model_pandas"](
            spark, SF_SMALL
        ).collect()
    }
    assert jvm == py
