"""Pure-Python media container codecs for the multimodal operators.

The container image has no native codec libraries (PIL/libav/libsndfile), but
several real formats are fully parseable with the standard library alone:

- WAV (RIFF) with integer PCM: header walk + sample decode via numpy.
- PPM/PGM (netpbm P6/P5 binary): ASCII header + raw raster.
- PNG (non-interlaced, 8-bit gray/RGB/RGBA/gray+alpha): zlib IDAT inflate
  (zlib IS stdlib) + the five scanline filters from the PNG spec — a real,
  complete decode, not a header sniff.

``decode_media`` dispatches on magic bytes and raises NotImplementedError
only for formats that genuinely require native codecs here (JPEG, MP4, …).
Everything returns plain ints/floats so downstream DataFrame aggregation is
exactly reproducible cross-engine.

Scale notes: these decoders run inside Arrow-batched mapInPandas tasks —
payload bytes stay executor-side, one decode per row, no shuffle. At 100 TB
the dispatch layer is unchanged; only the per-format branch swaps to a
native library when available.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MOD = 2147483647  # checksums folded mod 2^31-1 (exact cross-engine int)


# --------------------------------------------------------------------- WAV


def encode_wav_pcm16(
    samples: np.ndarray, sample_rate: int = 16000
) -> bytes:
    """Minimal mono PCM16 RIFF/WAVE writer (the canonical 44-byte header)."""
    pcm = samples.astype("<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(pcm), b"WAVE",
        b"fmt ", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16,
        b"data", len(pcm),
    )
    return hdr + pcm


def decode_wav(payload: bytes) -> dict:
    """RIFF chunk walk + PCM16/PCM8 sample decode (mono or interleaved)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = payload[pos : pos + 4], struct.unpack(
            "<I", payload[pos + 4 : pos + 8]
        )[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _, _, bits = fmt
    if audio_format != 1 or bits not in (8, 16):
        raise NotImplementedError(
            f"only integer PCM 8/16-bit WAV supported (fmt={audio_format}, "
            f"bits={bits})"
        )
    if bits == 16:
        arr = np.frombuffer(data[: len(data) // 2 * 2], dtype="<i2").astype(
            np.int64
        )
    else:  # PCM8 is unsigned, centered at 128
        arr = np.frombuffer(data, dtype=np.uint8).astype(np.int64) - 128
    n = int(len(arr) // n_channels)
    return {
        "container": "wav",
        "n_units": n,  # frames
        "sample_rate": int(sample_rate),
        "n_channels": int(n_channels),
        "bits": int(bits),
        "duration_ms": int(n * 1000 // sample_rate) if sample_rate else 0,
        "peak": int(np.abs(arr).max()) if len(arr) else 0,
        "unit_sum": int(arr.sum()),
        "checksum": int(arr.sum() % _MOD),
        "samples": arr,
    }


# ------------------------------------------------------------------ netpbm


def encode_ppm(raster: bytes, width: int, height: int) -> bytes:
    """Binary PPM (P6, maxval 255); raster must be width*height*3 bytes."""
    if len(raster) != width * height * 3:
        raise ValueError("raster size != w*h*3")
    return b"P6\n%d %d\n255\n" % (width, height) + raster


def decode_netpbm(payload: bytes) -> dict:
    """P6 (RGB) / P5 (gray) binary netpbm: whitespace-token header, then
    the raw raster."""
    magic = payload[:2]
    if magic not in (b"P6", b"P5"):
        raise ValueError("not a binary netpbm payload")
    # header = magic + 3 whitespace-separated ints, '#' comments allowed
    tokens, pos = [], 2
    while len(tokens) < 3 and pos < len(payload):
        c = payload[pos : pos + 1]
        if c == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
        elif c.isspace():
            pos += 1
        else:
            start = pos
            while pos < len(payload) and not payload[pos : pos + 1].isspace():
                pos += 1
            tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval, then raster
    width, height, maxval = tokens
    depth = 3 if magic == b"P6" else 1
    raster = np.frombuffer(
        payload[pos : pos + width * height * depth], dtype=np.uint8
    ).astype(np.int64)
    return {
        "container": "ppm" if magic == b"P6" else "pgm",
        "n_units": width * height,  # pixels
        "width": width,
        "height": height,
        "maxval": maxval,
        "depth": depth,
        "peak": int(raster.max()) if len(raster) else 0,
        "unit_sum": int(raster.sum()),
        "checksum": int(raster.sum() % _MOD),
        "raster": payload[pos : pos + width * height * depth],
    }


# --------------------------------------------------------------------- PNG

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # gray, RGB, gray+A, RGBA


def _png_unfilter(raw: bytes, width: int, height: int, bpp: int) -> np.ndarray:
    """Apply the five PNG scanline filters (spec §9): each scanline is
    1 filter byte + width*bpp data bytes, reconstructed against the
    previous scanline."""
    stride = width * bpp
    out = np.zeros((height, stride), dtype=np.uint8)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        line = np.frombuffer(raw[pos + 1 : pos + 1 + stride], dtype=np.uint8)
        pos += 1 + stride
        cur = line.astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if ftype == 0:  # None
            rec = cur
        elif ftype == 2:  # Up
            rec = (cur + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth: sequential in x
            rec = np.zeros(stride, np.int32)
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                b = prev[x]
                if ftype == 1:
                    rec[x] = (cur[x] + a) & 0xFF
                elif ftype == 3:
                    rec[x] = (cur[x] + (a + b) // 2) & 0xFF
                else:
                    c = prev[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pr = a if (pa <= pb and pa <= pc) else (
                        b if pb <= pc else c
                    )
                    rec[x] = (cur[x] + pr) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {ftype}")
        out[y] = rec.astype(np.uint8)
    return out


def decode_png(payload: bytes) -> dict:
    """Full PNG decode for 8-bit non-interlaced gray/RGB/gray+A/RGBA:
    chunk walk, zlib-inflate the IDAT stream, unfilter scanlines."""
    if payload[: len(_PNG_MAGIC)] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat = len(_PNG_MAGIC), None, b""
    while pos + 8 <= len(payload):
        size = struct.unpack(">I", payload[pos : pos + 4])[0]
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + size]
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + size  # size + type + crc
    if ihdr is None:
        raise ValueError("missing IHDR")
    width, height, bit_depth, color_type, _, _, interlace = ihdr
    if bit_depth != 8 or interlace != 0 or color_type not in _PNG_CHANNELS:
        raise NotImplementedError(
            f"PNG bit_depth={bit_depth} color_type={color_type} "
            f"interlace={interlace} needs a native codec"
        )
    bpp = _PNG_CHANNELS[color_type]
    pixels = _png_unfilter(zlib.decompress(idat), width, height, bpp).astype(
        np.int64
    )
    return {
        "container": "png",
        "n_units": width * height,
        "width": width,
        "height": height,
        "depth": bpp,
        "peak": int(pixels.max()) if pixels.size else 0,
        "unit_sum": int(pixels.sum()),
        "checksum": int(pixels.sum() % _MOD),
    }


def encode_png_gray(pixels: np.ndarray) -> bytes:
    """Minimal 8-bit grayscale PNG writer (filter 0 scanlines) — fixture
    builder for the decoder tests; pixels is (h, w) uint8."""
    h, w = pixels.shape
    raw = b"".join(b"\x00" + pixels[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------- dispatch


def decode_media(payload: bytes) -> dict:
    """Parse a real media container. Supported pure-Python: RIFF/WAVE PCM,
    netpbm P5/P6, PNG (8-bit non-interlaced). Anything else — JPEG, MP4,
    Vorbis, … — genuinely requires native codecs absent from this
    container and raises NotImplementedError."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return decode_wav(payload)
    if payload[:2] in (b"P6", b"P5"):
        return decode_netpbm(payload)
    if payload[: len(_PNG_MAGIC)] == _PNG_MAGIC:
        return decode_png(payload)
    raise NotImplementedError(
        f"no pure-Python decoder for payload magic {payload[:4]!r}; "
        "JPEG/MP4/etc need native codec libraries"
    )
