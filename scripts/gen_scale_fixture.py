"""Generate the sfL (10x sf0.1) scale-bench fixture pair (VERDICT r6 #1).

The full operator suite had only ever been benched at sf0.1 (~600k-row
lineitem); every "scales sub-quadratically" claim in the design notes was a
plan read, not a measurement. This script builds a measured basis:

- ``base`` dir (1x): the sf0.1 TPC-H tables + events COPIED VERBATIM, plus
  documents/embeddings re-generated synthetically at fixture size (5k docs /
  2k vectors) by the same generator as the 10x tier — so the doc/vector
  ratios compare one generator at two sizes, not two generators.
- ``large`` dir (10x): TPC-H tables + events replicated 10x with per-replica
  KEY OFFSETS (custkey/suppkey/partkey/orderkey/event_id/user_id shift by
  replica * (max_key+1)), so PK uniqueness and every join relationship hold
  and per-key distributions (lineitems per order, events per user) stay
  exactly fixture-shaped — EXCEPT ~10% of lineitem partkeys, which rewire
  into a different replica's key space so the co-purchase graph is
  organically connected instead of 10 disjoint copies (VERDICT r7 #1:
  disjoint replicas under-stress triangle/k-core/LPA density behavior); documents 50k over a Heaps-grown vocabulary
  (31 -> 98 =~ 31 * sqrt(10) types) and embeddings 20k, both with a planted
  ~5% near-dup rate so dedup/ANN output volume grows LINEARLY with the
  corpus (a frozen vocabulary would force O(n^2) true pairs and turn every
  ratio output-bound — measuring the fixture's degeneracy, not the plans).

Deterministic: numpy default_rng(42) + DuckDB replication SQL. Writes
single-file parquet per table (the fixture layout operators' load() expects).

Usage: python scripts/gen_scale_fixture.py [--out /tmp/spark_graft_scale]
"""

from __future__ import annotations

import argparse
import os
import shutil

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
REPLICAS = 10

# (table, [(column, offset_base)]) — offset_base = max_key + 1 at sf0.1
TPCH_OFFSETS = {
    "customer": [("c_custkey", 15_000)],
    "supplier": [("s_suppkey", 1_000)],
    "part": [("p_partkey", 20_000)],
    "orders": [("o_orderkey", 150_000), ("o_custkey", 15_000)],
    "lineitem": [
        ("l_orderkey", 150_000),
        ("l_partkey", 20_000),
        ("l_suppkey", 1_000),
    ],
    "events": [("event_id", 100_000), ("user_id", 1_500)],
}
COPY_AS_IS = ["region", "nation"]

LANGS = ["en", "zh", "de", "fr", "es"]
N_SOURCES = 20
DUP_RATE = 0.05  # planted near-dup fraction (docs and vectors)


REWIRE_RATE_MOD = 10  # 1-in-10 lineitem rows get a cross-replica partkey


def _replicate(con: duckdb.DuckDBPyConnection, table: str, out_dir: str) -> None:
    src = f"{SRC}/{table}.parquet"
    cols = [r[0] for r in con.execute(f"DESCRIBE SELECT * FROM '{src}'").fetchall()]
    offsets = dict(TPCH_OFFSETS[table])
    proj = ", ".join(
        f"t.{c} + r.r * {offsets[c]} AS {c}" if c in offsets else f"t.{c}"
        for c in cols
    )
    if table == "lineitem":
        # ORGANIC cross-replica edges (VERDICT r7 #1): pure key-offset
        # replication makes the co-purchase graph 10 DISJOINT copies of
        # the 1x graph, so triangle/k-core/LPA ratios measured per-round
        # overhead, not density growth. Rewire ~1/{REWIRE_RATE_MOD} of
        # lineitem partkeys into a DIFFERENT replica's key space
        # (seed-free deterministic: the destination replica derives from
        # the row's own keys), so orders span replicas at fixture-shaped
        # rates, the graph is globally connected, and wedge counts grow
        # with real density — while FK validity holds (every offset
        # partkey exists in the replicated part table) and PK uniqueness
        # is untouched (orderkeys offset normally).
        rewire = (
            f"(t.l_orderkey + t.l_partkey) % {REWIRE_RATE_MOD} = 0"
        )
        dest = f"((r.r + 1 + (t.l_partkey % {REPLICAS - 1})) % {REPLICAS})"
        proj = ", ".join(
            (
                f"t.l_partkey + (CASE WHEN {rewire} THEN {dest} ELSE r.r END)"
                f" * {offsets['l_partkey']} AS l_partkey"
            )
            if c == "l_partkey"
            else (f"t.{c} + r.r * {offsets[c]} AS {c}" if c in offsets else f"t.{c}")
            for c in cols
        )
    con.execute(
        f"""
        COPY (
          SELECT {proj}
          FROM read_parquet('{src}') t
          CROSS JOIN (SELECT unnest(range({REPLICAS})) AS r) r
          ORDER BY r.r
        ) TO '{out_dir}/{table}.parquet' (FORMAT PARQUET)
        """
    )


def _gen_documents(n_docs: int, vocab: int, path: str, rng: np.random.Generator) -> None:
    # ZIPF token distribution (s=1.07): real corpora have a hot head and a
    # long rare tail — prefix-filtered similarity joins PRUNE on the rare
    # tail, so a uniform vocabulary (first cut of this generator) made
    # PPJoin's candidate bound explode to near-all-pairs and its guard
    # rightly refused to run. Zipf restores the df shape the plans are
    # designed for.
    words = np.array([f"w{i}" for i in range(vocab)])
    p = 1.0 / np.arange(1, vocab + 1) ** 1.07
    p /= p.sum()
    lengths = rng.integers(10, 101, size=n_docs)
    # one vectorized Zipf draw for the whole corpus (per-doc rng.choice
    # with an explicit p is O(vocab) per call — 1e9 ops at the 10x tier)
    pool = rng.choice(vocab, size=int(lengths.sum()) + n_docs * 8, p=p)
    pos = 0
    texts: list[str] = []
    for i in range(n_docs):
        if i > 0 and rng.random() < DUP_RATE:
            # planted near-dup: mutate ~5% of an earlier doc's tokens
            src_toks = texts[int(rng.integers(0, i))].split(" ")
            toks = []
            for t in src_toks:
                if rng.random() < 0.05:
                    toks.append(words[pool[pos]])
                    pos += 1
                else:
                    toks.append(t)
        else:
            k = int(lengths[i])
            toks = list(words[pool[pos : pos + k]])
            pos += k
        texts.append(" ".join(toks))
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(
                [LANGS[int(x)] for x in rng.integers(0, len(LANGS), n_docs)]
            ),
            "source": pa.array(
                [f"src{int(x)}" for x in rng.integers(0, N_SOURCES, n_docs)]
            ),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, path)


def _gen_embeddings(n_vec: int, path: str, rng: np.random.Generator) -> None:
    dim, n_clusters = 64, 10
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, n_clusters, size=n_vec)
    vecs = centers[labels] * 0.8 + rng.standard_normal((n_vec, dim)) * 0.35
    # plant ~5% near-dups of earlier vectors (cosine >= ~0.99)
    for i in range(1, n_vec):
        if rng.random() < DUP_RATE:
            j = int(rng.integers(0, i))
            vecs[i] = vecs[j] + rng.standard_normal(dim) * 0.01
            labels[i] = labels[j]
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n_vec), pa.int64()),
            "embedding": pa.array(
                [v.astype(np.float32) for v in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array([int(x) for x in labels], pa.int32()),
        }
    )
    pq.write_table(tbl, path)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/spark_graft_scale")
    args = ap.parse_args()
    base, large = os.path.join(args.out, "base"), os.path.join(args.out, "large")
    for d in (base, large):
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d, exist_ok=True)

    con = duckdb.connect()
    for t in COPY_AS_IS:
        for d in (base, large):
            shutil.copy(f"{SRC}/{t}.parquet", f"{d}/{t}.parquet")
    for t in TPCH_OFFSETS:
        shutil.copy(f"{SRC}/{t}.parquet", f"{base}/{t}.parquet")
        _replicate(con, t, large)
    con.close()

    rng = np.random.default_rng(42)
    _gen_documents(5_000, 2_000, f"{base}/documents.parquet", rng)
    _gen_embeddings(2_000, f"{base}/embeddings.parquet", rng)
    rng = np.random.default_rng(43)
    # Heaps-grown vocabulary: types grow ~linearly with corpus size at
    # this scale under Zipf draws (the observed-type count saturates the
    # nominal vocab slowly; 10x docs -> 10x nominal vocab)
    _gen_documents(50_000, 20_000, f"{large}/documents.parquet", rng)
    _gen_embeddings(20_000, f"{large}/embeddings.parquet", rng)

    for d in (base, large):
        sizes = {
            t: os.path.getsize(os.path.join(d, f"{t}.parquet")) // 1024
            for t in sorted(os.listdir(d))
            for t in [t.removesuffix(".parquet")]
        }
        print(d, {k: f"{v}K" for k, v in sizes.items()})


if __name__ == "__main__":
    main()
