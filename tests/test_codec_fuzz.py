"""Fuzz the dependency-free codecs: arbitrary and truncated bytes must
either decode or raise a NAMED ValueError — never an IndexError,
struct.error, zlib.error, or numpy shape error (the module's
'never a silent wrong answer, never a cryptic one' contract)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from scrappy_spark.operators.codecs import (
    decode_image_bytes,
    decode_video_frames,
    decode_wav_bytes,
    encode_avi,
    encode_png,
    encode_wav,
    encode_y4m,
)

FUZZ = settings(
    max_examples=150, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)

MAGICS = [
    b"\x89PNG\r\n\x1a\n",
    b"BM",
    b"P6",
    b"RIFF\x00\x00\x00\x00WAVE",
    b"YUV4MPEG2",
    b"RIFF\x00\x00\x00\x00AVI ",
]


@FUZZ
@given(st.binary(min_size=0, max_size=400))
def test_image_decode_random_bytes_never_cryptic(data):
    try:
        decode_image_bytes(data)
    except ValueError:
        pass  # the contract: a named, diagnosable error


@FUZZ
@given(
    st.sampled_from(MAGICS),
    st.binary(min_size=0, max_size=300),
)
def test_magic_prefixed_garbage_never_cryptic(magic, tail):
    data = magic + tail
    for dec in (decode_image_bytes, decode_wav_bytes, decode_video_frames):
        try:
            dec(data)
        except ValueError:
            pass
        except Exception as e:  # noqa: BLE001 - the assertion itself
            # stdlib wave raises wave.Error (an Exception subclass) —
            # anything else cryptic is a contract violation
            import wave

            assert isinstance(e, (wave.Error, EOFError)), (
                f"{dec.__name__} leaked {type(e).__name__}: {e}"
            )


@FUZZ
@given(st.binary(min_size=8, max_size=200))
def test_truncated_real_png_never_cryptic(tail):
    rng = np.random.default_rng(1)
    full = encode_png(rng.integers(0, 256, (8, 8), dtype=np.uint8))
    cut = len(tail) % (len(full) - 1) + 1  # 1..len-1
    try:
        decode_image_bytes(full[:cut])
    except ValueError:
        pass


@FUZZ
@given(st.integers(min_value=1, max_value=400))
def test_truncated_real_wav_and_y4m_never_cryptic(cut):
    import wave as wave_mod

    samples = np.arange(256, dtype=np.uint8)
    wav = encode_wav(samples)
    try:
        decode_wav_bytes(wav[: min(cut, len(wav) - 1)])
    except (ValueError, wave_mod.Error, EOFError):
        pass

    frames = [samples.reshape(16, 16)]
    y4m = encode_y4m(frames, "mono")
    try:
        decode_video_frames(y4m[: min(cut, len(y4m) - 1)])
    except ValueError:
        pass


@FUZZ
@given(st.integers(min_value=1, max_value=400))
def test_truncated_real_avi_never_cryptic(cut):
    frames = [
        np.arange(256 * 3, dtype=np.uint8).reshape(16, 16, 3)
    ]  # AVI path is BI_RGB — HxWx3
    avi = encode_avi(frames)
    try:
        decode_video_frames(avi[: min(cut, len(avi) - 1)])
    except ValueError:
        pass


def test_roundtrips_survive_fuzz_seeds():
    rng = np.random.default_rng(42)
    for _ in range(10):
        img = rng.integers(0, 256, (5, 7), dtype=np.uint8)
        # gray decodes as HxWx1 (channel dim always present)
        assert np.array_equal(decode_image_bytes(encode_png(img))[:, :, 0], img)
        wav_samples = rng.integers(0, 256, 64, dtype=np.uint8)
        _, wave_out = decode_wav_bytes(encode_wav(wav_samples))
        assert np.array_equal(
            np.rint(wave_out * 128 + 128).astype(np.uint8), wav_samples
        )
