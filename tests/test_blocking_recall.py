"""Price the blocked-dedup recall knob (VERDICT r7 #4 / "What's wrong" #2).

`dedup_fuzzy_levenshtein` blocks candidates on (lang, tok0, tok1) — the
round-7 fix that took a Zipf-head 54x scale cliff down to ~6x — and
`dedup_fuzzy_jaro_winkler` blocks on (lang, tok0). Both docstrings state
the trade ("twins differing inside the leading block tokens are forgone
recall"), but until this test the price was asserted, never measured.

Instrument (the `dedup_minhash_accuracy` pattern applied to blocking):
build a corpus with PLANTED twins whose edits land at uniformly-random
token positions — so a known fraction of true duplicate pairs differ
inside the blocking tokens — then compute, in DuckDB (C++ metrics, exact):

    recall = |{true pairs that share the block key}| / |{true pairs}|

where the "true pair" universe is the UNBLOCKED pair set inside the
lossless length band (the judge-specified baseline: every same-lang pair
within the band, metric past threshold; no token-block applied).

Natural-fixture note: on sf0.001 the measured recall is 7/7 = 1.0 — the
fixture's organic dups preserve the leading bigram, which is exactly why
a planted instrument is needed to see the knob's real price.

Pinned measurements (seeded, deterministic):
- levenshtein (lang, tok0, tok1) block, 5 char-edits per twin over 20-40
  token docs: recall = 94/127 = 0.740 (analytically ~ (1-2/T)^5 kept).
- jaro-winkler (lang, tok0) block, 2 char-edits per twin over 4-8 token
  identifier-like docs: recall = 85/114 = 0.746.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

ALPHA = "abcdefghijklmnopqrstuvwxyz"


def _lev_corpus() -> list[tuple[int, str]]:
    """200 base docs (20-40 tokens, 300-word vocab) + 100 twins with 5
    single-char substitutions at uniformly-random token positions."""
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(300)]
    docs = []
    for _ in range(200):
        t = int(rng.integers(20, 41))
        docs.append(" ".join(vocab[int(rng.integers(0, 300))] for _ in range(t)))
    twins = []
    for j in range(100):
        src = int(rng.integers(0, 200))
        toks = docs[src].split(" ")
        for _ in range(5):
            ti = int(rng.integers(0, len(toks)))
            w = list(toks[ti])
            w[int(rng.integers(0, len(w)))] = ALPHA[int(rng.integers(0, 26))]
            toks[ti] = "".join(w)
        twins.append((200 + j, " ".join(toks)))
    return [(i, d) for i, d in enumerate(docs)] + twins


def _jw_corpus() -> list[tuple[int, str]]:
    """250 base identifier-like docs (4-8 tokens, 4000 distinct random
    words — large vocab so unrelated pairs stay under tau) + 100 twins
    with 2 char substitutions at uniformly-random token positions."""
    rng = np.random.default_rng(11)

    def word() -> str:
        return "".join(
            ALPHA[int(rng.integers(0, 26))]
            for _ in range(int(rng.integers(5, 11)))
        )

    vocab = [word() for _ in range(4000)]
    docs = []
    for _ in range(250):
        t = int(rng.integers(4, 9))
        docs.append(" ".join(vocab[int(rng.integers(0, 4000))] for _ in range(t)))
    twins = []
    for j in range(100):
        src = int(rng.integers(0, 250))
        toks = docs[src].split(" ")
        for _ in range(2):
            ti = int(rng.integers(0, len(toks)))
            w = list(toks[ti])
            w[int(rng.integers(0, len(w)))] = ALPHA[int(rng.integers(0, 26))]
            toks[ti] = "".join(w)
        twins.append((250 + j, " ".join(toks)))
    return [(i, d) for i, d in enumerate(docs)] + twins


def _load(rows: list[tuple[int, str]]) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE d AS SELECT * FROM (VALUES "
        + ",".join(f"({i}, ?)" for i, _ in rows)
        + ") t(doc_id, text)",
        [t for _, t in rows],
    )
    return con


def test_levenshtein_block_recall_measured():
    from hudi_acid_verification_spark.operators.dedup import (
        _LEV_LEN_BAND,
        _LEV_MAX_DIST,
    )

    con = _load(_lev_corpus())
    total, kept = con.execute(
        f"""
        WITH dd AS (
            SELECT doc_id, text, length(text) n_chars,
                   string_split(text,' ')[1] tok0,
                   coalesce(string_split(text,' ')[2],'') tok1
            FROM d
        ),
        truth AS (
            SELECT (a.tok0 = b.tok0 AND a.tok1 = b.tok1) AS blocked
            FROM dd a JOIN dd b ON b.doc_id > a.doc_id
             AND abs(a.n_chars - b.n_chars) <= {_LEV_LEN_BAND}
            WHERE levenshtein(a.text, b.text) <= {_LEV_MAX_DIST}
        )
        SELECT count(*), sum(CASE WHEN blocked THEN 1 ELSE 0 END) FROM truth
        """
    ).fetchone()
    con.close()
    assert (total, kept) == (127, 94), (
        f"planted-twin universe moved: total={total} kept={kept} — "
        "re-measure and re-pin the docstring recall number"
    )
    recall = kept / total
    assert recall >= 0.70, f"(lang, tok0, tok1) block recall {recall:.3f}"


def test_jaro_winkler_block_recall_measured():
    from hudi_acid_verification_spark.operators.linkage import (
        _JW_KEY_LEN,
        _JW_LEN_BAND,
        _JW_TAU_X1E6,
    )

    con = _load(_jw_corpus())
    total, kept = con.execute(
        f"""
        WITH dd AS (
            SELECT doc_id, text, length(text) n_chars,
                   string_split(text,' ')[1] tok0,
                   substr(text, 1, {_JW_KEY_LEN}) k
            FROM d
        ),
        truth AS (
            SELECT (a.tok0 = b.tok0) AS blocked
            FROM dd a JOIN dd b ON b.doc_id > a.doc_id
             AND abs(a.n_chars - b.n_chars) <= {_JW_LEN_BAND}
            WHERE floor(jaro_winkler_similarity(a.k, b.k) * 1000000 + 0.5)
                  >= {_JW_TAU_X1E6}
        )
        SELECT count(*), sum(CASE WHEN blocked THEN 1 ELSE 0 END) FROM truth
        """
    ).fetchone()
    con.close()
    assert (total, kept) == (114, 85), (
        f"planted-twin universe moved: total={total} kept={kept} — "
        "re-measure and re-pin the docstring recall number"
    )
    recall = kept / total
    assert recall >= 0.70, f"(lang, tok0) JW block recall {recall:.3f}"


def test_natural_fixture_block_is_lossless_at_sf0001():
    """On the sf0.001 fixture the (lang, tok0, tok1) block keeps ALL 7
    true pairs (recall 1.0): organic fixture dups preserve the leading
    bigram. Pinned so a fixture or block change that starts dropping
    REAL fixture pairs fails loudly rather than silently."""
    from hudi_acid_verification_spark.operators.dedup import (
        _LEV_LEN_BAND,
        _LEV_MAX_DIST,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    total, kept = con.execute(
        f"""
        WITH dd AS (
            SELECT doc_id, text, lang, n_chars,
                   string_split(text,' ')[1] tok0,
                   coalesce(string_split(text,' ')[2],'') tok1
            FROM documents
        ),
        truth AS (
            SELECT (a.tok0 = b.tok0 AND a.tok1 = b.tok1) AS blocked
            FROM dd a JOIN dd b ON b.lang = a.lang AND b.doc_id > a.doc_id
             AND abs(a.n_chars - b.n_chars) <= {_LEV_LEN_BAND}
            WHERE levenshtein(a.text, b.text) <= {_LEV_MAX_DIST}
        )
        SELECT count(*), sum(CASE WHEN blocked THEN 1 ELSE 0 END) FROM truth
        """
    ).fetchone()
    con.close()
    assert total == 7 and kept == 7
