"""Multimodal columns: image/audio/video as opaque binary + typed
metadata (north-star extension; no counterpart in the reference).

Pattern for 100 TB media pipelines: the payload is an opaque
``binary`` column ingested as-is; all interpretation happens in
Arrow-batched ``mapInPandas`` stages so bytes never round-trip through
Python row objects. Image decode/resize, audio features, AND video
frame sampling all do REAL work via the dependency-free codecs in
``codecs.py`` (PNG/BMP/PPM images, WAV audio, Y4M / uncompressed-AVI
video; Pillow preferred for images when importable). Compressed video
(H.264 etc.) is out of scope without a codec library — those payloads
raise a named ``ValueError``; each operator also retains ``fake=True``
for non-media payloads (the text-derived test fixtures).

Scale notes: media rows are huge (MBs) — ``files.maxPartitionBytes``
should shrink so a partition holds tens of rows, not thousands;
metadata extraction is scan-only (no shuffle); frame sampling is a
one-to-many ``mapInPandas`` expansion (UDTF shape).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

#: typed metadata carried next to every payload
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),   # image|audio|video
        T.StructField("format", T.StringType()),       # png|wav|mp4|...
        T.StructField("byte_len", T.LongType()),
        T.StructField("checksum", T.StringType()),     # md5 hex
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_bytes", T.BinaryType()),
    ]
)


def attach_fake_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    media_type: str = "image", fmt: str = "png",
) -> DataFrame:
    """Deterministic fake media: payload = utf-8 bytes of the text with
    a 4-byte magic prefix. Stands in for ``spark.read.format('binaryFile')``
    ingestion in environments with real media files."""
    payload = F.concat(
        F.encode(F.lit("FAKE"), "utf-8"), F.encode(F.col(text_col), "utf-8")
    )
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).alias("format"),
            F.length(payload).cast("long").alias("byte_len"),
            F.md5(payload).alias("checksum"),
        ).alias("media_meta"),
    )


def extract_meta(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Metadata extraction over raw payloads via mapInPandas (the shape
    a real probe — magic sniffing, EXIF, container headers — runs in).
    Scan-only; emits (id, byte_len, magic_hex, checksum)."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("byte_len", T.LongType()),
            T.StructField("magic_hex", T.StringType()),
            T.StructField("checksum", T.StringType()),
        ]
    )

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "byte_len": payloads.map(len).astype("int64"),
                    "magic_hex": payloads.map(lambda b: bytes(b[:4]).hex().upper()),
                    "checksum": payloads.map(lambda b: hashlib.md5(bytes(b)).hexdigest()),
                }
            )

    return df.select(id_col, "payload").mapInPandas(probe, schema=out_schema)


def decode_image(df: DataFrame, id_col: str = "doc_id", fake: bool = False) -> DataFrame:
    """Decode payloads to pixel features: (width, height, 16-bin pixel
    histogram). The REAL path decodes PNG/BMP/PPM with the
    dependency-free codecs in ``operators/codecs.py`` (Pillow preferred
    when importable — the soft-import contract); ``fake=True`` keeps the
    deterministic byte-histogram stand-in for payloads that are not
    images (the test fixtures)."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("hist", T.ArrayType(T.LongType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from .codecs import decode_image_bytes

        for pdf in batches:
            rows = []
            for i, b in zip(pdf[id_col], pdf["payload"]):
                data = bytes(b)
                if fake:
                    hist = [0] * 16
                    for byte in data:
                        hist[byte >> 4] += 1
                    rows.append((i, len(data), 1, hist))
                else:
                    pixels = decode_image_bytes(data)
                    hist = np.bincount(
                        pixels.reshape(-1) >> 4, minlength=16
                    ).astype("int64")
                    rows.append(
                        (i, pixels.shape[1], pixels.shape[0], hist.tolist())
                    )
            yield pd.DataFrame(rows, columns=[id_col, "width", "height", "hist"])

    return df.select(id_col, "payload").mapInPandas(run, schema=out_schema)


def resize_image(
    df: DataFrame,
    target: tuple[int, int] = (224, 224),
    id_col: str = "doc_id",
    fake: bool = False,
) -> DataFrame:
    """Resize payloads to ``target`` (the training-input normalization
    step). The REAL path decodes (PNG/BMP/PPM via codecs.py),
    nearest-neighbor resamples, and re-encodes as PNG — ``resized`` is
    a decodable image. ``fake=True`` keeps the deterministic
    truncated/cycled-bytes stand-in for non-image payloads through the
    identical Arrow plumbing."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("resized", T.BinaryType()),
        ]
    )
    w, h = target

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .codecs import decode_image_bytes, encode_png, nearest_resize

        n = w * h
        for pdf in batches:
            rows = []
            for i, b in zip(pdf[id_col], pdf["payload"]):
                data = bytes(b)
                if fake:
                    reps = (n // max(len(data), 1)) + 1
                    rows.append((i, w, h, (data * reps)[:n]))
                else:
                    small = nearest_resize(decode_image_bytes(data), w, h)
                    if small.shape[2] == 1:
                        small = small[:, :, 0]  # encode_png gray form
                    elif small.shape[2] == 2:
                        small = small[:, :, 0]  # gray+alpha → gray
                    rows.append((i, w, h, encode_png(small)))
            yield pd.DataFrame(rows, columns=[id_col, "width", "height", "resized"])

    return df.select(id_col, "payload").mapInPandas(run, schema=out_schema)


def audio_features(
    df: DataFrame, frame_len: int = 256, id_col: str = "doc_id", fake: bool = False
) -> DataFrame:
    """Per-clip audio features (duration, RMS energy, zero-crossing
    rate per frame → clip aggregates). The REAL path decodes WAV
    (PCM 8/16/32-bit) with the stdlib ``wave`` module via codecs.py;
    ``fake=True`` interprets the raw bytes as a centered int8 waveform
    for non-audio payloads. The feature MATH (framing, RMS, ZCR) is
    shared between both paths."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("n_frames", T.IntegerType()),
            T.StructField("rms", T.DoubleType()),
            T.StructField("zcr", T.DoubleType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from .codecs import decode_wav_bytes

        def features(wave: "np.ndarray", i) -> tuple:
            n = len(wave)
            n_frames = max((n + frame_len - 1) // frame_len, 0)
            rms = float(np.sqrt(np.mean(wave**2))) if n else 0.0
            zcr = (
                float(np.mean(np.signbit(wave[1:]) != np.signbit(wave[:-1])))
                if n > 1
                else 0.0
            )
            return (i, n, n_frames, round(rms, 6), round(zcr, 6))

        for pdf in batches:
            rows = []
            for i, b in zip(pdf[id_col], pdf["payload"]):
                if fake:
                    wave = np.frombuffer(bytes(b), dtype=np.int8).astype(np.float64)
                else:
                    _, wave = decode_wav_bytes(bytes(b))
                rows.append(features(wave, i))
            yield pd.DataFrame(
                rows, columns=[id_col, "n_samples", "n_frames", "rms", "zcr"]
            )

    return df.select(id_col, "payload").mapInPandas(run, schema=out_schema)


def attach_synthetic_video(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    width: int = 16,
    height: int = 16,
) -> DataFrame:
    """Deterministic REAL video per row: the utf-8 text bytes, chunked
    into ``width*height`` luma frames (last frame space-padded), wrapped
    as a mono Y4M clip — a decodable stream the frame-sampling kernel
    can exercise end-to-end without media files in the container.
    Stands in for ``binaryFile`` ingestion, like ``attach_fake_payload``."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("media_meta", MEDIA_META_SCHEMA),
        ]
    )
    fsize = width * height

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from .codecs import encode_y4m

        for pdf in batches:
            rows = []
            for i, text in zip(pdf[id_col], pdf[text_col]):
                # NULL text -> one blank frame, same as empty text (the
                # audit side coalesces identically, so its verdict stays
                # a comparison, never an AttributeError — ADVICE r7)
                data = (text or "").encode("utf-8") or b" "
                n_frames = (len(data) + fsize - 1) // fsize
                data = data.ljust(n_frames * fsize, b" ")
                frames = [
                    np.frombuffer(
                        data[k * fsize : (k + 1) * fsize], dtype=np.uint8
                    ).reshape(height, width)
                    for k in range(n_frames)
                ]
                clip = encode_y4m(frames, colorspace="mono")
                rows.append(
                    (
                        i,
                        clip,
                        ("video", "y4m", len(clip), hashlib.md5(clip).hexdigest()),
                    )
                )
            yield pd.DataFrame(rows, columns=[id_col, "payload", "media_meta"])

    return df.select(id_col, text_col).mapInPandas(build, schema=out_schema)


def sample_frames(
    df: DataFrame,
    every_n_bytes: int = 64,
    id_col: str = "doc_id",
    fake: bool = False,
    frame_stride: int = 1,
    as_png: bool = True,
) -> DataFrame:
    """Frame sampling (video → N frames): one-to-many mapInPandas
    expansion. The REAL path decodes Y4M / uncompressed AVI containers
    with the dependency-free parsers in ``codecs.py``, keeps every
    ``frame_stride``-th frame (``frame_idx`` stays the index in the
    SOURCE clip), and emits each as PNG (``as_png=True``, a decodable
    image for downstream vision kernels) or raw C-order pixel bytes.
    ``fake=True`` keeps the byte-slicer stand-in (every
    ``every_n_bytes``) for non-video payloads through the identical
    Arrow plumbing."""
    if frame_stride < 1:
        raise ValueError(f"frame_stride must be >= 1, got {frame_stride}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .codecs import decode_video_frames, encode_png

        for pdf in batches:
            out = []
            for i, b in zip(pdf[id_col], pdf["payload"]):
                data = bytes(b)
                if fake:
                    for k, off in enumerate(range(0, len(data), every_n_bytes)):
                        out.append((i, k, data[off : off + every_n_bytes]))
                    continue
                _, _, frames = decode_video_frames(data)
                for k in range(0, len(frames), frame_stride):
                    arr = frames[k]
                    if as_png:
                        img = arr[:, :, 0] if arr.shape[2] == 1 else arr
                        out.append((i, k, encode_png(img)))
                    else:
                        out.append((i, k, arr.tobytes()))
            yield pd.DataFrame(out, columns=[id_col, "frame_idx", "frame_bytes"])

    return df.select(id_col, "payload").mapInPandas(run, schema=FRAME_SCHEMA)


FRAME_AUDIT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_ok", T.LongType()),
    ]
)


def frame_sample_audit(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    width: int = 16,
    height: int = 16,
) -> DataFrame:
    """Banded-flag audit of the REAL video frame-sampling path
    (``attach_synthetic_video`` → ``sample_frames``), the promotion
    that moves ``q_frame_sample`` from rows-only to the value-hash
    gate: PNG bytes aren't SQL-reproducible, but the frame GRID is
    (``ceil(utf8_bytes/frame_size)`` frames per doc), and whether each
    decoded frame's pixels equal the text bytes that built it is a
    0/1 invariant a SQL oracle pins to 1.

    Per emitted frame: ``frame_ok`` = 1 iff decoding the sampled PNG
    reproduces exactly the corresponding ``width·height``-byte slice
    of the doc's space-padded utf-8 text — one flag covering the whole
    encode → Y4M container → parse → sample → PNG encode → PNG decode
    chain. The raw per-frame md5 surface stays available from
    ``sample_frames`` and stays pixel-pinned in tests.
    """
    fsize = width * height
    frames = sample_frames(
        attach_synthetic_video(
            docs, text_col=text_col, id_col=id_col, width=width, height=height
        ),
        fake=False,
    )
    joined = frames.join(
        docs.select(F.col(id_col), F.col(text_col)), id_col
    ).select(id_col, "frame_idx", "frame_bytes", text_col)

    def check(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .codecs import decode_image_bytes

        for pdf in batches:
            rows = []
            for i, k, fb, text in zip(
                pdf[id_col], pdf["frame_idx"], pdf["frame_bytes"], pdf[text_col]
            ):
                # a NULL text must surface as frame_ok=0 (expected
                # bytes can't match), never crash the audit task with
                # AttributeError (ADVICE r7)
                data = (text or "").encode("utf-8") or b" "
                n_frames = (len(data) + fsize - 1) // fsize
                data = data.ljust(n_frames * fsize, b" ")
                expect = data[int(k) * fsize : (int(k) + 1) * fsize]
                arr = decode_image_bytes(bytes(fb))
                got = (arr[:, :, 0] if arr.ndim == 3 else arr).tobytes()
                rows.append((int(i), int(k), int(got == expect)))
            yield pd.DataFrame(
                rows, columns=[id_col, "frame_idx", "frame_ok"]
            )

    # build the output schema from id_col — the pandas frames above
    # name their first column id_col, so a hardcoded schema would only
    # ever work for the default name
    schema = T.StructType(
        [T.StructField(id_col, FRAME_AUDIT_SCHEMA[0].dataType)]
        + list(FRAME_AUDIT_SCHEMA.fields[1:])
    )
    return joined.mapInPandas(check, schema=schema)
