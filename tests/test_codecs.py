"""Dependency-free media codec roundtrips (operators/codecs.py).

Pure NumPy/stdlib — no SparkSession needed. The PNG decoder is tested
against an independently-built encoder exercising all five filter
types, not just our own filter-0 output.
"""

import io
import struct
import wave as wave_mod
import zlib

import numpy as np
import pytest

from scrappy_spark.operators.codecs import (
    PNG_MAGIC,
    decode_image_bytes,
    decode_wav_bytes,
    encode_png,
    nearest_resize,
    sniff_format,
)

rng = np.random.default_rng(42)


def _chunk(tag: bytes, payload: bytes) -> bytes:
    body = tag + payload
    return struct.pack(">I", len(payload)) + body + struct.pack(
        ">I", zlib.crc32(body) & 0xFFFFFFFF
    )


@pytest.mark.parametrize("shape", [(13, 7, 3), (5, 9, 4), (8, 6)])
def test_png_roundtrip(shape):
    a = rng.integers(0, 256, size=shape, dtype=np.uint8)
    b = decode_image_bytes(encode_png(a))
    expect = a[:, :, None] if a.ndim == 2 else a
    assert b.shape == expect.shape and (b == expect).all()


def test_png_all_five_filters():
    """Decode a PNG whose rows use filters 0..4 (independently encoded
    here) — proves the unfilter path, not just the filter-0 roundtrip."""
    w, h, nch = 6, 5, 3
    pix = rng.integers(0, 256, size=(h, w, nch), dtype=np.uint8)
    flat = pix.reshape(h, w * nch).astype(np.int64)
    enc_rows = []
    for y in range(h):
        f = y % 5
        row = flat[y]
        prev = flat[y - 1] if y else np.zeros(w * nch, dtype=np.int64)
        out = np.zeros(w * nch, dtype=np.int64)
        for x in range(w * nch):
            left = row[x - nch] if x >= nch else 0
            up = prev[x]
            ul = prev[x - nch] if x >= nch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = left
            elif f == 2:
                pred = up
            elif f == 3:
                pred = (left + up) >> 1
            else:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if pa <= pb and pa <= pc else (up if pb <= pc else ul)
            out[x] = (row[x] - pred) & 0xFF
        enc_rows.append(bytes([f]) + bytes(out.astype(np.uint8)))
    png = (
        PNG_MAGIC
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(b"".join(enc_rows)))
        + _chunk(b"IEND", b"")
    )
    assert (decode_image_bytes(png) == pix).all()


def test_png_palette():
    plte = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, size=(4, 4), dtype=np.uint8)
    scan = np.zeros((4, 5), dtype=np.uint8)
    scan[:, 1:] = idx
    png = (
        PNG_MAGIC
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 3, 0, 0, 0))
        + _chunk(b"PLTE", plte.tobytes())
        + _chunk(b"IDAT", zlib.compress(scan.tobytes()))
        + _chunk(b"IEND", b"")
    )
    assert (decode_image_bytes(png) == plte[idx]).all()


def test_bmp_bottom_up_with_padding():
    w, h = 3, 2
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    row_bytes = (w * 3 + 3) & ~3
    body = b""
    for y in range(h - 1, -1, -1):  # bottom-up storage
        row = px[y][:, [2, 1, 0]].tobytes()  # BGR on disk
        body += row + b"\x00" * (row_bytes - len(row))
    hdr = (
        b"BM"
        + struct.pack("<IHHI", 14 + 40 + len(body), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    )
    assert (decode_image_bytes(hdr + body) == px).all()


def test_ppm_with_comment():
    px = rng.integers(0, 256, size=(2, 3, 3), dtype=np.uint8)
    ppm = b"P6\n# comment\n3 2\n255\n" + px.tobytes()
    assert (decode_image_bytes(ppm) == px).all()
    assert sniff_format(ppm) == "ppm"


def test_unknown_format_raises():
    with pytest.raises(ValueError, match="unsupported image format"):
        decode_image_bytes(b"FAKEnot an image")


def test_truncated_and_corrupt_payloads_raise_named_errors():
    """Bounds/CRC validation: damaged inputs must fail with a ValueError
    naming the sniffed format, not a cryptic numpy/zlib/struct error."""
    from scrappy_spark.operators.codecs import _decode_bmp, _decode_png, _decode_ppm

    # PNG: truncated mid-chunk
    good = encode_png(rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8))
    with pytest.raises(ValueError, match="PNG truncated"):
        _decode_png(good[: len(good) - 20])
    # PNG: single flipped payload byte caught by the chunk CRC
    corrupt = bytearray(good)
    corrupt[len(PNG_MAGIC) + 8 + 13 + 4 + 8] ^= 0xFF  # first IDAT payload byte
    with pytest.raises(ValueError, match="CRC mismatch"):
        _decode_png(bytes(corrupt))
    # BMP: headers promise more pixels than the payload carries
    w, h = 3, 2
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    row_bytes = (w * 3 + 3) & ~3
    body = b"".join(
        px[y][:, [2, 1, 0]].tobytes() + b"\x00" * (row_bytes - w * 3)
        for y in range(h - 1, -1, -1)
    )
    hdr = (
        b"BM"
        + struct.pack("<IHHI", 14 + 40 + len(body), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    )
    with pytest.raises(ValueError, match="BMP truncated"):
        _decode_bmp(hdr + body[: len(body) // 2])
    with pytest.raises(ValueError, match="BMP truncated"):
        _decode_bmp(hdr[:20])
    # PPM: raster shorter than width*height*3, and header cut mid-field
    with pytest.raises(ValueError, match="PPM truncated"):
        _decode_ppm(b"P6\n3 2\n255\n" + b"\x00" * 5)
    with pytest.raises(ValueError, match="PPM truncated"):
        _decode_ppm(b"P6\n3 ")


def test_nearest_resize_identity_and_shape():
    px = rng.integers(0, 256, size=(2, 3, 3), dtype=np.uint8)
    assert (nearest_resize(px, 3, 2) == px).all()
    assert nearest_resize(px, 6, 4).shape == (4, 6, 3)
    assert nearest_resize(px, 1, 1).shape == (1, 1, 3)


def test_wav_decode_rms():
    buf = io.BytesIO()
    t = np.arange(8000)
    sig = (np.sin(2 * np.pi * 440 * t / 8000) * 32000).astype("<i2")
    with wave_mod.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(sig.tobytes())
    rate, mono = decode_wav_bytes(buf.getvalue())
    assert rate == 8000 and len(mono) == 8000
    assert abs(np.sqrt((mono**2).mean()) - (32000 / 32768) / np.sqrt(2)) < 1e-3
    assert sniff_format(buf.getvalue()) == "wav"


def test_wav_stereo_downmix():
    buf = io.BytesIO()
    left = np.full(100, 10000, dtype="<i2")
    right = np.full(100, -10000, dtype="<i2")
    inter = np.empty(200, dtype="<i2")
    inter[0::2], inter[1::2] = left, right
    with wave_mod.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(inter.tobytes())
    _, mono = decode_wav_bytes(buf.getvalue())
    assert len(mono) == 100 and np.allclose(mono, 0.0)
