"""Pure-Python media codec tests (operators/media_codecs.py).

The decoders must parse REAL container bytes: WAV fixtures come from the
stdlib ``wave`` writer (independent of our encoder), PNG fixtures exercise
all five spec scanline filters, and unsupported formats (JPEG magic) must
raise NotImplementedError — the only honest branch left.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np
import pytest

from hudi_acid_verification_spark.operators.media_codecs import (
    _PNG_MAGIC,
    decode_media,
    decode_netpbm,
    decode_png,
    decode_wav,
    encode_png_gray,
    encode_ppm,
    encode_wav_pcm16,
)


def test_wav_decode_stdlib_interop():
    """Decode a WAV produced by the stdlib wave module — proves the RIFF
    walk against an independent writer, not our own encoder."""
    rng = np.random.default_rng(7)
    samples = rng.integers(-30000, 30000, size=441, dtype=np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(44100)
        w.writeframes(samples.tobytes())
    f = decode_wav(buf.getvalue())
    assert f["container"] == "wav"
    assert f["n_units"] == 441
    assert f["sample_rate"] == 44100
    assert f["bits"] == 16 and f["n_channels"] == 1
    assert f["peak"] == int(np.abs(samples.astype(np.int64)).max())
    assert f["unit_sum"] == int(samples.astype(np.int64).sum())
    assert f["duration_ms"] == 441 * 1000 // 44100


def test_wav_roundtrip_own_encoder_stereo_stdlib():
    samples = np.arange(-500, 500, dtype=np.int64)
    f = decode_wav(encode_wav_pcm16(samples, sample_rate=16000))
    assert f["n_units"] == 1000
    assert f["unit_sum"] == int(samples.sum())
    # stereo via stdlib: frames = samples / channels
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(np.ones(64, dtype="<i2").tobytes())
    f2 = decode_wav(buf.getvalue())
    assert f2["n_units"] == 32 and f2["n_channels"] == 2


def test_ppm_decode_with_comment_header():
    raster = bytes(range(12))  # 2x2 RGB
    payload = b"P6\n# a comment\n2 2\n255\n" + raster
    f = decode_netpbm(payload)
    assert (f["container"], f["width"], f["height"]) == ("ppm", 2, 2)
    assert f["n_units"] == 4 and f["depth"] == 3
    assert f["unit_sum"] == sum(range(12)) and f["peak"] == 11
    f2 = decode_netpbm(b"P5\n3 1\n255\n" + bytes([9, 8, 7]))
    assert (f2["container"], f2["n_units"], f2["unit_sum"]) == ("pgm", 3, 24)
    # our encoder round-trips through the same decoder
    f3 = decode_netpbm(encode_ppm(raster, width=4, height=1))
    assert f3["width"] == 4 and f3["unit_sum"] == f["unit_sum"]


def test_png_gray_roundtrip():
    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(5, 7), dtype=np.uint8)
    f = decode_png(encode_png_gray(px))
    assert (f["width"], f["height"], f["depth"]) == (7, 5, 1)
    assert f["unit_sum"] == int(px.astype(np.int64).sum())
    assert f["peak"] == int(px.max())


def _png_rgb_with_filters(px: np.ndarray, filters: list[int]) -> bytes:
    """Build an RGB PNG applying a CHOSEN filter per scanline (forward
    transform per the spec) — exercises the decoder's unfilter paths."""
    h, w, _ = px.shape
    bpp, raw = 3, b""
    flat = px.reshape(h, w * bpp).astype(np.int32)
    for y, ftype in enumerate(filters):
        cur = flat[y]
        prev = flat[y - 1] if y else np.zeros(w * bpp, np.int32)
        line = np.zeros(w * bpp, np.int32)
        for x in range(w * bpp):
            a = cur[x - bpp] if x >= bpp else 0
            b = prev[x]
            c = prev[x - bpp] if x >= bpp else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            line[x] = (cur[x] - pred) & 0xFF
        raw += bytes([ftype]) + line.astype(np.uint8).tobytes()

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_MAGIC + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    )


def test_png_rgb_all_five_filters():
    rng = np.random.default_rng(13)
    px = rng.integers(0, 256, size=(5, 4, 3), dtype=np.uint8)
    payload = _png_rgb_with_filters(px, filters=[0, 1, 2, 3, 4])
    f = decode_png(payload)
    assert (f["width"], f["height"], f["depth"]) == (4, 5, 3)
    assert f["unit_sum"] == int(px.astype(np.int64).sum())
    assert f["peak"] == int(px.max())


def test_dispatch_unsupported_raises():
    with pytest.raises(NotImplementedError, match="native codec"):
        decode_media(b"\xff\xd8\xff\xe0" + b"\x00" * 16)  # JPEG magic
    with pytest.raises(NotImplementedError):
        decode_media(b"\x00\x00\x00\x20ftypisom")  # MP4 ftyp box
    # interlaced PNG (Adam7) is honestly unsupported
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 1)
    payload = (
        _PNG_MAGIC
        + struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    )
    with pytest.raises(NotImplementedError, match="interlace"):
        decode_png(payload)


def test_dispatch_routes_all_supported():
    assert decode_media(encode_wav_pcm16(np.array([1, 2])))["container"] == "wav"
    assert decode_media(encode_ppm(b"abc", 1, 1))["container"] == "ppm"
    gray = encode_png_gray(np.zeros((2, 2), dtype=np.uint8))
    assert decode_media(gray)["container"] == "png"
