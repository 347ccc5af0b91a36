"""Content-defined chunking (CDC) dedup — sub-document dedup at byte
granularity (VERDICT r7 #5, first suggested candidate).

The passage/prefix dedup family splits on TOKEN windows anchored to token
positions, so an insertion near the head shifts every downstream passage
and the duplication disappears. CDC is the storage-dedup answer (LBFS /
rsync / restic lineage): chunk boundaries are decided by the CONTENT
itself — a rolling Rabin-Karp hash over a fixed character window cuts
whenever ``h % modulus == 0`` — so identical byte runs produce identical
chunks no matter where they sit in a document. Chunk-level exact dedup
then prices how much of each document is literal shared content.

Spark-first shape (the part worth reading): the naive formulation
explodes one row per character position and CARRIES THE TEXT on every
row — O(len²) bytes per document, a scale cliff by construction. Here
the whole rolling-hash scan happens IN-ROW with higher-order functions
(``transform`` over ``sequence`` + ``filter``), so the scan is
compute-bound JVM codegen with zero byte amplification; only the O(1)
boundary list and the O(chunks) chunk rows ever leave the row. The only
shuffles are the chunk-content groupBy (the irreducible exact-dedup
shuffle) and the per-doc rollup. The DuckDB oracle uses the explicit
position-explode formulation of the SAME recurrence — two independent
constructions agreeing on every hash.

No reference counterpart (the reference has no analytics engine at all:
its core is the ACID harness, TransactionManager.java:70-101); this is
part of the LLM-training-data surface the rebuild adds on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load, query

_CDC_W = 8            # rolling window width (chars)
_CDC_B = 257          # Rabin-Karp base
_CDC_P = 1_000_003    # modulus keeping every partial sum < 2^63
_CDC_CUT = 64         # cut when h % 64 == 0 → ~64-char expected chunks
# precomputed B^(W-1-k) mod P — the per-offset multipliers of the window
_CDC_POW = tuple(pow(_CDC_B, _CDC_W - 1 - k, _CDC_P) for k in range(_CDC_W))


def _hash_terms(pos_expr: str) -> str:
    """The window hash at 1-based position ``pos_expr`` as a SQL
    expression — identical text in both engines (ascii() is the code
    point of the first char in Spark and DuckDB alike)."""
    return (
        "("
        + " + ".join(
            f"ascii(substring(text, ({pos_expr}) + {k}, 1)) * {m}"
            for k, m in enumerate(_CDC_POW)
        )
        + f") % {_CDC_P}"
    )


def _hash_terms_arr(pos_expr: str) -> str:
    """Spark-side window hash over a precomputed per-char code-point
    array ``ca`` (optimization r8): ``substring(text, i, 1)`` walks the
    UTF8 string from the start to find char ``i`` — O(i) per call, which
    made the whole in-row scan O(len²·W) per document (26 s at sf0.1).
    ``element_at(ca, i)`` is an O(1) array index, restoring the O(len·W)
    scan the docstring promises. ``ascii`` of the split-out single char
    equals ``ascii(substring(text, i, 1))`` for every code point, so the
    hash value — and therefore every cut — is bit-identical."""
    return (
        "("
        + " + ".join(
            f"element_at(ca, ({pos_expr}) + {k}) * {m}"
            for k, m in enumerate(_CDC_POW)
        )
        + f") % {_CDC_P}"
    )


def _chunk_batches(batches):
    """mapInArrow kernel (optimization r9, guide §4.2): the rolling
    Rabin-Karp scan as EIGHT NumPy vector ops per document instead of
    8 multiply-adds per position through JVM higher-order-function
    codegen — measured ~2× on the scan stage. Exactness: code points
    come from a UTF-32-LE reinterpretation of the text (== ascii() of
    each split-out char in Spark AND DuckDB), every partial product fits
    int64 (max code point 0x10FFFF × max multiplier < 2^41, eight terms
    < 2^44), and Python slicing is code-point addressed exactly like
    ``substring`` — so hashes, cuts and chunks are bit-identical to the
    JVM/_hash_terms formulation the oracle replays. The decoder state
    (POW vector) is built once per task, before the batch loop."""
    import numpy as np
    import pyarrow as pa

    pow_v = np.array(_CDC_POW, dtype=np.int64)
    w = _CDC_W
    for batch in batches:
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_ids: list[int] = []
        out_chunks: list[str] = []
        for did, txt in zip(doc_ids, texts):
            n = len(txt)
            if n >= w:
                codes = np.frombuffer(
                    txt.encode("utf-32-le"), dtype=np.uint32
                ).astype(np.int64)
                m = n - w + 1
                acc = np.zeros(m, dtype=np.int64)
                for k in range(w):
                    acc += codes[k : k + m] * pow_v[k]
                acc %= _CDC_P
                # 1-based position i cuts at i+w-1; index0 i-1 → cut idx0+w
                cut_arr = np.nonzero(acc % _CDC_CUT == 0)[0] + w
                bounds = sorted({int(c) for c in cut_arr} | {n})
            else:
                bounds = [n]
            prev = 0
            for c in bounds:
                out_ids.append(did)
                out_chunks.append(txt[prev:c])
                prev = c
        yield pa.RecordBatch.from_arrays(
            [pa.array(out_ids, type=pa.int64()), pa.array(out_chunks)],
            names=["doc_id", "chunk"],
        )


def _chunk_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The (doc_id, chunk) kernel frame pre-checkpoint — factored out so
    plan tests can pin the Arrow-boundary shape (one MapInArrow over the
    2-column projection) that the operator's checkpoint hides behind an
    ExistingRDD scan."""
    return (
        load(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .mapInArrow(_chunk_batches, "doc_id bigint, chunk string")
    )


def _cdc_oracle() -> str:
    return f"""
    WITH d AS (
        SELECT doc_id, text, length(text) AS n FROM documents
    ),
    pos AS (
        SELECT doc_id, text, n, unnest(generate_series(1, n - {_CDC_W} + 1)) AS i
        FROM d WHERE n >= {_CDC_W}
    ),
    cuts AS (
        SELECT doc_id, i + {_CDC_W} - 1 AS cut
        FROM pos WHERE ({_hash_terms('i')}) % {_CDC_CUT} = 0
    ),
    bounds AS (
        SELECT DISTINCT doc_id, cut FROM (
            SELECT doc_id, cut FROM cuts
            UNION ALL
            SELECT doc_id, n AS cut FROM d
        )
    ),
    chunks AS (
        SELECT b.doc_id,
               substr(d.text,
                      coalesce(lag(b.cut) OVER w, 0) + 1,
                      b.cut - coalesce(lag(b.cut) OVER w, 0)) AS chunk
        FROM bounds b JOIN d ON d.doc_id = b.doc_id
        WINDOW w AS (PARTITION BY b.doc_id ORDER BY b.cut)
    ),
    freq AS (
        SELECT chunk, count(DISTINCT doc_id) AS nd
        FROM chunks GROUP BY chunk
    )
    SELECT c.doc_id,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(CASE WHEN f.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_chunks,
           CAST(sum(CASE WHEN f.nd >= 2 THEN length(c.chunk) ELSE 0 END)
                AS BIGINT) AS dup_chars,
           CAST(sum(CASE WHEN f.nd >= 2 THEN length(c.chunk) ELSE 0 END)
                * 1000000 // sum(length(c.chunk)) AS BIGINT)
               AS dup_ratio_x1e6
    FROM chunks c JOIN freq f ON f.chunk = c.chunk
    GROUP BY c.doc_id
    """


@query("dedup_cdc_chunks", oracle=_cdc_oracle())
def dedup_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking dedup: cut each document into chunks at
    rolling-hash boundaries (Rabin-Karp over {_CDC_W}-char windows, cut
    where h % {_CDC_CUT} == 0, so chunks average ~{_CDC_CUT} chars and
    identical byte runs chunk identically regardless of position), then
    exact-dedup the chunks corpus-wide and report per document how many
    of its chunks — and what share of its characters — are literal
    duplicates of content in OTHER documents.

    Scale shape: the rolling scan is IN-ROW (transform/filter over a
    sequence — higher-order functions inside whole-stage codegen), so no
    position explode ever materializes and per-row work is O(len·W) with
    zero byte amplification. Rows leaving the scan are O(chunks) ≈
    len/{_CDC_CUT}. The chunk-content groupBy is the standard exact-dedup
    shuffle (same class as `dedup_exact`), and the per-doc rollup
    shuffles O(chunks) rows on doc_id. Nothing is quadratic in either
    document length or corpus size; no broadcast of unbounded sides.
    """
    # The boundary scan + chunk extraction run as a NumPy batch kernel
    # inside mapInArrow (optimization r9, guide §4.2): only the two
    # needed columns cross the Arrow boundary, the rolling hash is eight
    # vector multiply-adds per DOCUMENT (not per position), and chunks
    # come back as O(len/{_CDC_CUT}) rows — the JVM higher-order-function
    # formulation this replaces (see git history / _hash_terms_arr) was
    # ~2× slower on the same scan. Cut positions and chunk bytes are
    # bit-identical (see _chunk_batches docstring); the DuckDB oracle
    # still replays the explicit position-explode recurrence.
    # The chunk rows feed two lineage branches (freq + join-back); the
    # lazy checkpoint runs the Arrow kernel once per execution instead
    # of once per branch (measured ~15% on top of the kernel win).
    chunks = _chunk_rows(spark, sf_dir).localCheckpoint(eager=False)
    freq = chunks.groupBy("chunk").agg(
        F.count_distinct("doc_id").alias("nd")
    )
    per_chunk = chunks.join(freq, "chunk").select(
        "doc_id",
        F.length("chunk").alias("clen"),
        (F.col("nd") >= 2).alias("is_dup"),
    )
    agg = per_chunk.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(F.when(F.col("is_dup"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_dup_chunks"),
        F.sum(F.when(F.col("is_dup"), F.col("clen")).otherwise(0))
        .cast("bigint")
        .alias("dup_chars"),
        F.sum("clen").cast("bigint").alias("total_chars"),
    )
    # all-nonnegative, so DIV (truncate) == floor == DuckDB //
    return agg.select(
        "doc_id",
        "n_chunks",
        "n_dup_chunks",
        "dup_chars",
        F.expr("CAST(dup_chars * 1000000 DIV total_chars AS BIGINT)").alias(
            "dup_ratio_x1e6"
        ),
    )
