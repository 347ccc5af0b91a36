"""Multimodal-column operators (north-star surface): opaque binary payloads
with typed metadata, processed by Arrow-batched pandas UDFs via mapInPandas.

The container has no image/audio codecs, so the *decode* step is a
deterministic fake (byte statistics standing in for pixel statistics) and
the real-codec path raises NotImplementedError behind a flag — but the
Spark-side plumbing is real and tested: binary column construction, schema
declaration, Arrow batch iteration, per-batch vectorized numpy work, and
partition-preserving output.

Scale notes: mapInPandas streams Arrow record batches — constant memory per
task regardless of partition size; binary payloads never materialize on the
driver. For real media at 100 TB: keep payloads in object storage, carry
(uri, byte_range, metadata) columns, and let the UDF fetch+decode per batch;
frame-sampling then becomes an explode of (uri, frame_idx) BEFORE decode so
work distributes per frame, not per video.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load, query

_REAL_CODECS_AVAILABLE = False  # no image/audio libs in this container


def decode_media(payload: bytes) -> dict:  # pragma: no cover - stub
    """Real decode path (PIL/librosa/pyav) — unavailable in this env."""
    raise NotImplementedError(
        "media codecs are not installed; use the deterministic fake decoder"
    )


def _fake_decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic fake 'decode': byte-level statistics that exercise the
    same batch shape a real decoder would (bytes in → numeric features out).
    """
    import numpy as np

    n_bytes, checksum, mean_byte, fake_w, fake_h = [], [], [], [], []
    for payload in pdf["payload"]:
        arr = np.frombuffer(payload, dtype=np.uint8)
        n_bytes.append(len(arr))
        checksum.append(int(arr.astype(np.int64).sum() % 2147483647))
        mean_byte.append(float(arr.mean()) if len(arr) else 0.0)
        # "dimensions" derived from content length — stable stand-ins
        fake_w.append(int(len(arr) % 640) + 1)
        fake_h.append(int(len(arr) % 480) + 1)
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "media_type": pdf["media_type"],
            "n_bytes": n_bytes,
            "checksum": checksum,
            "mean_byte": mean_byte,
            "width": fake_w,
            "height": fake_h,
        }
    )


@query("multimodal_decode_features")  # rows-only: pandas-UDF path, no SQL oracle
def multimodal_decode_features(
    spark: SparkSession, sf_dir: str, ascii_only: bool = False
) -> DataFrame:
    """binary payload + metadata → per-item features via mapInPandas.

    Payloads are synthesized from document text (CAST to BINARY) with a typed
    metadata struct, mimicking an ingested media table; the decode UDF runs
    per Arrow batch. Deterministic: same fixture in → same features out.
    ``ascii_only`` restricts to ASCII documents (used by the oracled rollup,
    where byte-sum/code-point-sum equivalence requires it).
    """
    d = load(spark, sf_dir, "documents")
    if ascii_only:
        d = d.filter(~F.col("text").rlike("[^\\x00-\\x7F]"))
    media = d.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        F.struct(
            F.col("n_chars").alias("declared_size"),
            F.col("source").alias("origin"),
            F.col("lang").alias("lang"),
        ).alias("meta"),
    )

    out_schema = (
        "doc_id bigint, media_type string, n_bytes int, checksum bigint, "
        "mean_byte double, width int, height int"
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if _REAL_CODECS_AVAILABLE:  # pragma: no cover
                raise NotImplementedError("real codec path not wired")
            yield _fake_decode_batch(pdf)

    return media.mapInPandas(decode, schema=out_schema)


@query("multimodal_frame_sample")  # rows-only: pandas-UDF path, no SQL oracle
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing: explode (item × frame_idx) BEFORE decode so
    per-frame work distributes across the cluster, then batch-'decode' each
    frame slice. Frames are deterministic byte windows of the payload."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 2)  # "videos"
    n_frames = 4
    frames = d.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.explode(F.sequence(F.lit(0), F.lit(n_frames - 1))).alias("frame_idx"),
    )

    out_schema = "doc_id bigint, frame_idx int, frame_bytes int, frame_checksum bigint"

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, payload, idx in zip(
                pdf["doc_id"], pdf["payload"], pdf["frame_idx"]
            ):
                arr = np.frombuffer(payload, dtype=np.uint8)
                step = max(len(arr) // n_frames, 1)
                frame = arr[idx * step : (idx + 1) * step]
                rows.append(
                    (
                        doc_id,
                        idx,
                        len(frame),
                        int(frame.astype(np.int64).sum() % 2147483647),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_bytes", "frame_checksum"]
            )

    return frames.mapInPandas(sample, schema=out_schema)


@query(
    "multimodal_metadata_agg",
    oracle="""
    WITH feats AS (
        SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
                    WHEN doc_id % 3 = 1 THEN 'audio'
                    ELSE 'video' END AS media_type,
               strlen(text) AS n_bytes,
               list_sum(list_transform(string_split(text, ''),
                                       c -> ord(c))) % 2147483647 AS checksum,
               (strlen(text) % 640) + 1 AS width,
               (strlen(text) % 480) + 1 AS height
        FROM documents
        WHERE NOT regexp_matches(text, '[^\\x00-\\x7F]')
    )
    SELECT media_type,
           count(*) AS n_items,
           CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
           CAST(sum(checksum) AS BIGINT) AS checksum_sum,
           min(width) AS min_width,
           max(height) AS max_height
    FROM feats GROUP BY media_type
    """,
)
def multimodal_metadata_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-media-type rollup of the DECODED features — the query that makes
    the mapInPandas decode plumbing exactly verifiable: payloads are
    UTF-8-encoded fixture text, so the byte statistics the fake decoder
    emits are re-derivable in pure SQL, and the whole binary → Arrow batch
    → numpy → aggregate path gets a DuckDB oracle instead of a rows-only
    count.

    The equivalence `utf8-byte sums == per-character code sums` holds only
    for ASCII text, so BOTH sides gate on ASCII-only documents (the
    fixtures are all-ASCII today, making the gate a no-op — it exists so a
    regenerated fixture with real de/fr accents narrows the comparison
    instead of silently breaking parity). All aggregated measures are
    integers (byte counts, mod-2^31-1 checksums, min/max dims) — no float
    accumulation, so parity is exact regardless of partitioning.

    Scale notes: decode is per-row map work (no shuffle); the rollup
    shuffles 3 groups. For real media the same shape holds — decode emits
    compact features, aggregation never touches payload bytes again.
    """
    feats = multimodal_decode_features(
        spark, sf_dir, ascii_only=True
    )
    return feats.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("n_bytes").cast("bigint").alias("total_bytes"),
        F.sum("checksum").cast("bigint").alias("checksum_sum"),
        F.min("width").alias("min_width"),
        F.max("height").alias("max_height"),
    )
