"""Multimodal-column operators (north-star surface): opaque binary payloads
with typed metadata, processed by Arrow-batched pandas UDFs via mapInPandas.

The decode path is REAL for every format parseable without native codec
libraries: RIFF/WAVE integer PCM, netpbm P5/P6, and full PNG (stdlib zlib
inflate + spec scanline unfiltering) — see ``media_codecs``;
``multimodal_container_decode`` runs genuine container bytes through it
under a DuckDB oracle. NotImplementedError remains only for formats that
genuinely need native codecs here (JPEG, MP4, …). The byte-statistics
decoder below stays as the oracled baseline for arbitrary payloads.

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

from .media_codecs import decode_media  # noqa: F401  (public re-export)


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


@query(
    "multimodal_container_decode",
    oracle="""
    WITH ascii_docs AS (
        SELECT doc_id, strlen(text) AS len,
               list_transform(string_split(text, ''), c -> ord(c)) AS ords
        FROM documents
        WHERE NOT regexp_matches(text, '[^\\x00-\\x7F]') AND strlen(text) >= 3
    )
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'wav' ELSE 'ppm' END AS container,
           CAST(CASE WHEN doc_id % 2 = 0 THEN len
                     ELSE len // 3 END AS BIGINT) AS n_units,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 16000 ELSE 0 END
                AS INTEGER) AS sample_rate,
           CAST(CASE WHEN doc_id % 2 = 0
                     THEN 256 * list_max(list_transform(ords,
                                                        o -> abs(o - 128)))
                     ELSE list_max(ords[1:3 * (len // 3)])
                END AS BIGINT) AS peak,
           CAST(CASE WHEN doc_id % 2 = 0
                     THEN 256 * (list_sum(ords) - 128 * len)
                     ELSE list_sum(ords[1:3 * (len // 3)])
                END AS BIGINT) AS unit_sum
    FROM ascii_docs
    """,
)
def multimodal_container_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL container decode under an exact oracle: synthesize genuine
    RIFF/WAVE PCM16 and binary PPM payloads from fixture text (audio
    samples = (byte-128)*256 at 16 kHz; image raster = leading bytes as a
    1-row RGB strip), then parse them back with ``media_codecs.decode_media``
    — header walk, chunk alignment, PCM/raster extraction — all inside
    Arrow-batched mapInPandas stages.

    Because the synthesized containers are pure functions of the text, every
    decoded statistic (frame count, peak amplitude, sample sum, pixel sum)
    is re-derivable in DuckDB SQL over code points — so the codec path is
    hash-verified end-to-end, not rows-only. ASCII-gated for byte==codepoint
    equivalence (fixtures are all-ASCII; the gate future-proofs).

    Scale shape: encode and decode are per-row map work over Arrow batches
    — no shuffle, no driver materialization; payloads live only inside
    executor batches, exactly how a real (uri → fetch → decode) pipeline
    distributes at 100 TB.
    """
    import numpy as np

    from .media_codecs import decode_media as _decode
    from .media_codecs import encode_ppm, encode_wav_pcm16

    d = (
        load(spark, sf_dir, "documents")
        .filter(~F.col("text").rlike("[^\\x00-\\x7F]"))
        .filter(F.length("text") >= 3)
        .select("doc_id", "text")
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
                if doc_id % 2 == 0:
                    samples = (b.astype(np.int64) - 128) * 256
                    payloads.append(
                        encode_wav_pcm16(samples, sample_rate=16000)
                    )
                else:
                    w = len(b) // 3
                    payloads.append(
                        encode_ppm(b[: 3 * w].tobytes(), width=w, height=1)
                    )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    containers = d.mapInPandas(encode, schema="doc_id bigint, payload binary")

    out_schema = (
        "doc_id bigint, container string, n_units bigint, "
        "sample_rate int, peak bigint, unit_sum bigint"
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                f = _decode(bytes(payload))
                rows.append(
                    (
                        doc_id,
                        f["container"],
                        f["n_units"],
                        f.get("sample_rate", 0),
                        f["peak"],
                        f["unit_sum"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "container", "n_units", "sample_rate",
                    "peak", "unit_sum",
                ],
            )

    return containers.mapInPandas(decode, schema=out_schema)
