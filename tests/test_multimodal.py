"""Multimodal binary-column plumbing: payload attach, metadata probe,
stubbed decode gate, frame-sampling expansion."""

import pytest

from pyspark.sql import functions as F

from scrappy_spark.operators.multimodal import (
    attach_fake_payload,
    decode_image,
    extract_meta,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "x" * 200)], ["doc_id", "text"]
    )
    return attach_fake_payload(df)


def test_payload_and_meta_struct(media):
    row = media.filter(F.col("doc_id") == 1).first()
    assert bytes(row.payload) == b"FAKEhello world"
    assert row.media_meta.byte_len == len(b"FAKEhello world")
    assert row.media_meta.media_type == "image"


def test_extract_meta(media):
    out = {r.doc_id: r for r in extract_meta(media).collect()}
    assert out[1].magic_hex == "46414B45"  # 'FAKE'
    assert out[1].byte_len == 15
    assert len(out[1].checksum) == 32


def test_decode_rejects_non_image_unless_fake(media):
    # fake payloads are not images: the real path must name the problem
    with pytest.raises(Exception) as exc_info:
        decode_image(media, fake=False).collect()
    assert "unsupported image format" in str(exc_info.value)
    out = {r.doc_id: r for r in decode_image(media, fake=True).collect()}
    assert sum(out[1].hist) == 15  # every byte counted once
    assert out[2].width == 204


def test_frame_sampling_expansion(media):
    frames = sample_frames(media, every_n_bytes=64, fake=True).collect()
    by_doc = {}
    for f in frames:
        by_doc.setdefault(f.doc_id, []).append(f)
    assert len(by_doc[1]) == 1          # 15 bytes -> 1 frame
    assert len(by_doc[2]) == 4          # 204 bytes -> 4 frames of <=64
    assert bytes(by_doc[2][0].frame_bytes) == b"FAKE" + b"x" * 60


def test_resize_plumbing_and_gate(media):
    from scrappy_spark.operators.multimodal import resize_image

    with pytest.raises(Exception) as exc_info:
        resize_image(media, fake=False).collect()
    assert "unsupported image format" in str(exc_info.value)
    out = {r.doc_id: r for r in resize_image(media, target=(8, 4), fake=True).collect()}
    assert all(r.width == 8 and r.height == 4 for r in out.values())
    assert all(len(bytes(r.resized)) == 32 for r in out.values())
    # deterministic: cycled payload bytes
    assert bytes(out[1].resized)[:4] == b"FAKE"


def test_audio_features_math(media):
    import numpy as np

    from scrappy_spark.operators.multimodal import audio_features

    with pytest.raises(Exception):  # fake payloads are not RIFF/WAVE
        audio_features(media, fake=False).collect()
    out = {r.doc_id: r for r in audio_features(media, frame_len=64, fake=True).collect()}
    # doc 1: payload = b"FAKEhello world" (15 bytes -> 15 samples, 1 frame)
    r = out[1]
    assert r.n_samples == 15 and r.n_frames == 1
    wave = np.frombuffer(b"FAKEhello world", dtype=np.int8).astype(np.float64)
    assert abs(r.rms - float(np.sqrt(np.mean(wave**2)))) < 1e-4
    assert 0.0 <= r.zcr <= 1.0
    assert out[2].n_samples == 204 and out[2].n_frames == 4


# ----------------------- real codec paths (dependency-free, codecs.py)


@pytest.fixture(scope="module")
def real_media(spark):
    """Payloads that are REAL media: a PNG gradient, a PPM, and a WAV
    sine — generated with the engine's own encoder + stdlib wave."""
    import io
    import wave as wave_mod

    import numpy as np

    from scrappy_spark.operators.codecs import encode_png

    rng = np.random.default_rng(11)
    png = encode_png(rng.integers(0, 256, size=(20, 30, 3), dtype=np.uint8))
    ppm_px = rng.integers(0, 256, size=(6, 8, 3), dtype=np.uint8)
    ppm = b"P6\n8 6\n255\n" + ppm_px.tobytes()
    buf = io.BytesIO()
    t = np.arange(4000)
    sig = (np.sin(2 * np.pi * 220 * t / 8000) * 30000).astype("<i2")
    with wave_mod.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(sig.tobytes())
    rows = [(1, bytearray(png)), (2, bytearray(ppm)), (3, bytearray(buf.getvalue()))]
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def test_real_decode_image(real_media):
    imgs = real_media.filter(F.col("doc_id") < 3)
    out = {r.doc_id: r for r in decode_image(imgs, fake=False).collect()}
    assert (out[1].width, out[1].height) == (30, 20)
    assert (out[2].width, out[2].height) == (8, 6)
    assert sum(out[1].hist) == 20 * 30 * 3  # every subpixel counted
    assert sum(out[2].hist) == 6 * 8 * 3


def test_real_resize_roundtrip(real_media):
    from scrappy_spark.operators.codecs import decode_image_bytes
    from scrappy_spark.operators.multimodal import resize_image

    imgs = real_media.filter(F.col("doc_id") < 3)
    out = {
        r.doc_id: r
        for r in resize_image(imgs, target=(16, 12), fake=False).collect()
    }
    for r in out.values():
        pixels = decode_image_bytes(bytes(r.resized))  # resized IS an image
        assert pixels.shape[:2] == (12, 16)


def test_real_audio_features(real_media):
    import numpy as np

    from scrappy_spark.operators.multimodal import audio_features

    clip = real_media.filter(F.col("doc_id") == 3)
    r = audio_features(clip, frame_len=256, fake=False).first()
    assert r.n_samples == 4000 and r.n_frames == 16
    # sine RMS = amplitude/sqrt(2); amplitude = 30000/32768
    assert abs(r.rms - (30000 / 32768) / np.sqrt(2)) < 1e-3
    # 220 Hz at 8 kHz → 2 crossings/cycle → zcr ≈ 2*220/8000
    assert abs(r.zcr - 2 * 220 / 8000) < 0.01


def test_real_frame_sampling_y4m_and_avi(spark):
    """The REAL video path: hand-built Y4M and AVI clips decode through
    sample_frames, every emitted frame is a decodable PNG whose pixels
    match the source frames, and frame_stride keeps source indices."""
    import numpy as np

    from scrappy_spark.operators.codecs import (
        decode_image_bytes,
        encode_avi,
        encode_y4m,
    )

    rng = np.random.default_rng(7)
    y4m_frames = [rng.integers(0, 256, size=(6, 8), dtype=np.uint8) for _ in range(5)]
    avi_frames = [rng.integers(0, 256, size=(4, 5, 3), dtype=np.uint8) for _ in range(3)]
    rows = [
        (1, bytearray(encode_y4m(y4m_frames, colorspace="mono"))),
        (2, bytearray(encode_avi(avi_frames))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {}
    for r in sample_frames(df, fake=False, frame_stride=2).collect():
        out.setdefault(r.doc_id, {})[r.frame_idx] = bytes(r.frame_bytes)
    assert sorted(out[1]) == [0, 2, 4]  # stride 2 over 5 frames, source idx kept
    assert sorted(out[2]) == [0, 2]
    for k, png in out[1].items():
        assert (decode_image_bytes(png)[:, :, 0] == y4m_frames[k]).all()
    for k, png in out[2].items():
        assert (decode_image_bytes(png) == avi_frames[k]).all()


def test_y4m_color_and_truncation():
    """C444 converts BT.601 full-range YCbCr→RGB; C420 upsamples chroma
    nearest; damaged streams raise named errors."""
    import numpy as np

    from scrappy_spark.operators.codecs import decode_y4m, decode_video_frames, encode_y4m

    rng = np.random.default_rng(3)
    ycc = rng.integers(0, 256, size=(4, 6, 3), dtype=np.uint8)
    w, h, frames = decode_y4m(encode_y4m([ycc], colorspace="444"))
    assert (w, h) == (6, 4) and len(frames) == 1
    yf = ycc[:, :, 0].astype(np.float64)
    uf = ycc[:, :, 1].astype(np.float64) - 128.0
    vf = ycc[:, :, 2].astype(np.float64) - 128.0
    expect = np.clip(
        np.round(
            np.stack(
                [yf + 1.402 * vf, yf - 0.344136 * uf - 0.714136 * vf, yf + 1.772 * uf],
                axis=-1,
            )
        ),
        0,
        255,
    ).astype(np.uint8)
    assert (frames[0] == expect).all()
    # C420: half-res chroma planes, nearest-upsampled
    y = np.arange(16, dtype=np.uint8).reshape(4, 4)
    u = np.full((2, 2), 128, np.uint8)
    v = np.full((2, 2), 128, np.uint8)
    clip420 = (
        b"YUV4MPEG2 W4 H4 C420jpeg\nFRAME\n" + y.tobytes() + u.tobytes() + v.tobytes()
    )
    _, _, f420 = decode_video_frames(clip420)
    assert (f420[0][:, :, 0] == y).all()  # neutral chroma → R=G=B=Y
    import pytest as _pytest

    good = encode_y4m([np.zeros((4, 4), np.uint8)] * 2, colorspace="mono")
    with _pytest.raises(ValueError, match="Y4M truncated"):
        decode_y4m(good[:-5])
    with _pytest.raises(ValueError, match="unsupported video format"):
        decode_video_frames(b"NOTAVIDEO")


def test_frame_sample_audit_null_text_no_crash(spark):
    """A doc whose text is NULL must yield a frame verdict row (or no
    row), never an AttributeError inside the audit task (ADVICE r7)."""
    from scrappy_spark.operators.multimodal import frame_sample_audit

    docs = spark.createDataFrame(
        [(1, "hello frame audit"), (2, None)], "doc_id long, text string"
    )
    rows = frame_sample_audit(docs).collect()
    ok = {r.doc_id: r.frame_ok for r in rows}
    assert ok.get(1) == 1                      # real path still green
    assert all(v in (0, 1) for v in ok.values())
