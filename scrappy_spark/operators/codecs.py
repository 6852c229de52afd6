"""Dependency-free media codecs for the multimodal kernels.

The container has no imaging/audio library, but real decode does not
need one for the bread-and-butter formats: PNG is zlib (stdlib) plus
per-row unfiltering, BMP and PPM are raw pixels, WAV is stdlib
``wave``. These codecs make ``decode_image`` / ``resize_image`` /
``audio_features`` (operators/multimodal.py) do REAL work on real
payloads; if Pillow IS importable it is preferred (more formats,
C-speed), keeping the soft-import contract.

Everything here runs inside Arrow-batched ``mapInPandas`` workers —
per-image Python cost is the accepted trade for a codec; the Spark
plumbing around it stays columnar.

Scope (documented, enforced): PNG 8-bit depth, color types
0/2/3/4/6, non-interlaced; BMP uncompressed 24/32-bit; PPM P6
maxval 255; WAV PCM 8/16/32-bit; video Y4M (YUV4MPEG2 — mono, 444,
420 colorspaces, BT.601 full-range to RGB) and uncompressed AVI
(BI_RGB 24/32-bit DIB frames, the BMP row logic per frame). Other
inputs raise ``ValueError`` with the sniffed format named — never a
silent wrong answer.
"""

from __future__ import annotations

import io
import struct
import zlib

import numpy as np

try:  # soft import: prefer Pillow when the environment has it
    from PIL import Image as _PIL_Image  # type: ignore
except Exception:  # pragma: no cover - container has no Pillow
    _PIL_Image = None

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def have_pil() -> bool:
    return _PIL_Image is not None


def sniff_format(data: bytes) -> str:
    if data[:8] == PNG_MAGIC:
        return "png"
    if data[:2] == b"BM":
        return "bmp"
    if data[:2] == b"P6":
        return "ppm"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    if data[:9] == b"YUV4MPEG2":
        return "y4m"
    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        return "avi"
    return "unknown"


# ---------------------------------------------------------------- images


def decode_image_bytes(data: bytes) -> np.ndarray:
    """bytes → HxWxC uint8 array (C ∈ {1,2,3,4}). Pillow when present,
    else the stdlib decoders below."""
    if _PIL_Image is not None:
        img = _PIL_Image.open(io.BytesIO(data))
        # palette images expand to RGB so both decode paths agree (the
        # stdlib PNG decoder maps PLTE indices to RGB); other modes keep
        # their native channel count
        if img.mode == "P":
            img = img.convert("RGB")
        arr = np.asarray(img)
        if arr.dtype != np.uint8:
            # 16-bit and float inputs would silently wrap under astype;
            # the stdlib path rejects them too — never a silent answer
            raise ValueError(f"unsupported image bit depth (mode {img.mode!r})")
        return arr[:, :, None] if arr.ndim == 2 else arr
    fmt = sniff_format(data)
    if fmt == "png":
        return _decode_png(data)
    if fmt == "bmp":
        return _decode_bmp(data)
    if fmt == "ppm":
        return _decode_ppm(data)
    raise ValueError(f"unsupported image format {fmt!r} (supported: png/bmp/ppm)")


def _png_chunks(data: bytes):
    pos = 8
    saw_iend = False
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        if pos + 12 + length > len(data):
            raise ValueError(
                f"PNG truncated: chunk {ctype!r} declares {length} payload bytes "
                f"but only {len(data) - pos - 12} remain"
            )
        payload = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(ctype + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch (corrupt payload)")
        yield ctype, payload
        pos += 12 + length  # len + type + payload + crc
        if ctype == b"IEND":
            saw_iend = True
            break
    if not saw_iend:
        raise ValueError("PNG truncated: no IEND chunk")


_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _decode_png(data: bytes) -> np.ndarray:
    ihdr = plte = None
    idat = bytearray()
    for ctype, payload in _png_chunks(data):
        if ctype == b"IHDR":
            if len(payload) != 13:
                raise ValueError(f"PNG IHDR length {len(payload)} (expected 13)")
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif ctype == b"PLTE":
            if len(payload) % 3:
                raise ValueError(f"PNG PLTE length {len(payload)} not a multiple of 3")
            plte = np.frombuffer(payload, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(payload)
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    width, height, depth, ctype_id, comp, filt, interlace = ihdr
    if depth != 8 or interlace != 0 or comp != 0 or filt != 0:
        raise ValueError(
            f"PNG variant unsupported (depth={depth}, interlace={interlace}); "
            "supported: 8-bit non-interlaced"
        )
    nch = _PNG_CHANNELS.get(ctype_id)
    if nch is None:
        raise ValueError(f"PNG color type {ctype_id} unsupported")
    raw = zlib.decompress(bytes(idat))
    stride = width * nch
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG IDAT length mismatch")
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    filters, rows = raw[:, 0], raw[:, 1:].astype(np.int64)
    out = np.zeros((height, stride), dtype=np.int64)
    bpp = nch
    for y in range(height):
        f, row = int(filters[y]), rows[y].copy()
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.int64)
        if f == 0:
            out[y] = row
        elif f == 2:  # Up — fully vectorizable
            out[y] = (row + prev) & 0xFF
        elif f in (1, 3, 4):  # Sub / Average / Paeth carry a left dependency
            cur = out[y]
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                up = prev[x]
                ul = prev[x - bpp] if x >= bpp else 0
                if f == 1:
                    pred = left
                elif f == 3:
                    pred = (left + up) >> 1
                else:
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = left if pa <= pb and pa <= pc else (up if pb <= pc else ul)
                cur[x] = (row[x] + pred) & 0xFF
        else:
            raise ValueError(f"PNG filter {f} invalid")
    pixels = out.astype(np.uint8).reshape(height, width, nch)
    if ctype_id == 3:
        if plte is None:
            raise ValueError("paletted PNG missing PLTE")
        pixels = plte[pixels[:, :, 0]]
    return pixels


def _decode_bmp(data: bytes) -> np.ndarray:
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    if len(data) < 34:
        raise ValueError(f"BMP truncated: {len(data)} bytes is too short for the headers")
    (pixel_off,) = struct.unpack("<I", data[10:14])
    width, height = struct.unpack("<ii", data[18:26])
    (bpp,) = struct.unpack("<H", data[28:30])
    (compression,) = struct.unpack("<I", data[30:34])
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"BMP variant unsupported (bpp={bpp}, compression={compression})")
    if width <= 0 or height == 0:
        raise ValueError(f"BMP dimensions invalid ({width}x{height})")
    top_down = height < 0
    height = abs(height)
    nch = bpp // 8
    row_bytes = (width * nch + 3) & ~3
    need = pixel_off + (height - 1) * row_bytes + width * nch
    if need > len(data):
        raise ValueError(
            f"BMP truncated: {width}x{height}@{bpp}bpp needs {need} bytes, have {len(data)}"
        )
    rows = []
    for y in range(height):
        off = pixel_off + y * row_bytes
        row = np.frombuffer(data[off : off + width * nch], dtype=np.uint8)
        rows.append(row.reshape(width, nch))
    arr = np.stack(rows if top_down else rows[::-1])
    return arr[:, :, [2, 1, 0]] if nch == 3 else arr[:, :, [2, 1, 0, 3]]  # BGR(A)→RGB(A)


def _decode_ppm(data: bytes) -> np.ndarray:
    # header: P6 <ws> width <ws> height <ws> maxval <single ws> raster
    fields: list[bytes] = []
    pos = 2
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if pos >= len(data):
            raise ValueError("PPM truncated: header ends before width/height/maxval")
        if data[pos : pos + 1] == b"#":  # comment to EOL
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(data[start:pos])
    pos += 1  # the single whitespace before the raster
    if not all(f.isdigit() for f in fields):
        raise ValueError(f"PPM header fields not numeric: {fields!r}")
    width, height, maxval = (int(f) for f in fields)
    if maxval != 255:
        raise ValueError(f"PPM maxval {maxval} unsupported (only 255)")
    need = width * height * 3
    if pos + need > len(data):
        raise ValueError(
            f"PPM truncated: {width}x{height} raster needs {need} bytes, "
            f"have {len(data) - pos}"
        )
    raster = np.frombuffer(data[pos : pos + need], dtype=np.uint8)
    return raster.reshape(height, width, 3)


def encode_png(arr: np.ndarray) -> bytes:
    """HxW (gray) or HxWx{3,4} uint8 → PNG bytes (filter 0, one IDAT)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        ctype, nch = 0, 1
        flat = arr[:, :, None]
    elif arr.ndim == 3 and arr.shape[2] in (3, 4):
        ctype, nch = (2, 3) if arr.shape[2] == 3 else (6, 4)
        flat = arr
    else:
        raise ValueError(f"encode_png expects HxW or HxWx3/4, got {arr.shape}")
    height, width = flat.shape[:2]
    scan = np.zeros((height, width * nch + 1), dtype=np.uint8)
    scan[:, 1:] = flat.reshape(height, width * nch)

    def chunk(ctag: bytes, payload: bytes) -> bytes:
        body = ctag + payload
        return struct.pack(">I", len(payload)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, ctype, 0, 0, 0)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scan.tobytes(), 6))
        + chunk(b"IEND", b"")
    )


def nearest_resize(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample of HxWxC to height×width — the
    deterministic, seam-free choice for training-input normalization."""
    src_h, src_w = arr.shape[:2]
    ys = np.minimum((np.arange(height) * src_h) // height, src_h - 1)
    xs = np.minimum((np.arange(width) * src_w) // width, src_w - 1)
    return arr[ys][:, xs]


# ----------------------------------------------------------------- audio

_WAV_DTYPES = {1: np.uint8, 2: np.dtype("<i2"), 4: np.dtype("<i4")}


def encode_wav(samples_u8: np.ndarray, rate: int = 8000) -> bytes:
    """uint8 mono samples (unsigned 8-bit PCM, centered at 128) → WAV
    bytes via the stdlib ``wave`` module — the encode twin of
    ``decode_wav_bytes``'s 1-byte path."""
    import wave

    samples_u8 = np.ascontiguousarray(samples_u8, dtype=np.uint8)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(rate)
        w.writeframes(samples_u8.tobytes())
    return buf.getvalue()


def decode_wav_bytes(data: bytes) -> tuple[int, np.ndarray]:
    """WAV bytes → (sample_rate, float64 mono waveform in [-1, 1])
    via the stdlib ``wave`` module (PCM 8/16/32-bit)."""
    import wave

    with wave.open(io.BytesIO(data), "rb") as w:
        nch, sw, rate, nframes = (
            w.getnchannels(),
            w.getsampwidth(),
            w.getframerate(),
            w.getnframes(),
        )
        raw = w.readframes(nframes)
    dtype = _WAV_DTYPES.get(sw)
    if dtype is None:
        raise ValueError(f"WAV sample width {sw} unsupported (1/2/4 bytes)")
    samples = np.frombuffer(raw, dtype=dtype).astype(np.float64)
    if sw == 1:  # 8-bit WAV is unsigned, centered at 128
        samples = samples - 128.0
        scale = 128.0
    else:
        scale = float(2 ** (8 * sw - 1))
    if nch > 1:
        samples = samples.reshape(-1, nch).mean(axis=1)
    return rate, samples / scale


# ----------------------------------------------------------------- video
#
# Two uncompressed containers cover real frame sampling without a codec
# library: Y4M (YUV4MPEG2 — an ASCII header line, then "FRAME\n" +
# raw planar YUV per frame; the interchange format every ffmpeg
# pipeline can emit) and AVI restricted to BI_RGB DIB streams (each
# '..db' chunk is a BMP pixel array — same bottom-up BGR row logic as
# ``_decode_bmp``).


def _yuv_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Full-range BT.601 YCbCr → RGB (the JPEG/C420jpeg convention —
    deterministic, no studio-swing scaling), uint8 in/out."""
    yf, uf, vf = (p.astype(np.float64) for p in (y, u - 128.0, v - 128.0))
    rgb = np.stack(
        [
            yf + 1.402 * vf,
            yf - 0.344136 * uf - 0.714136 * vf,
            yf + 1.772 * uf,
        ],
        axis=-1,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def decode_y4m(data: bytes) -> tuple[int, int, list[np.ndarray]]:
    """Y4M bytes → (width, height, frames). Frames are HxWx1 uint8 for
    ``Cmono`` streams, HxWx3 RGB (BT.601 full-range) for ``C444`` and
    ``C420*`` (chroma upsampled nearest — deterministic, seam-free,
    same rationale as ``nearest_resize``)."""
    if not data.startswith(b"YUV4MPEG2"):
        raise ValueError("not a Y4M stream")
    nl = data.find(b"\n")
    if nl < 0:
        raise ValueError("Y4M truncated: header line has no newline")
    cs = "420jpeg"  # spec default when no C tag
    width = height = None
    for tok in data[9:nl].split():
        tag, val = tok[:1], tok[1:]
        if tag == b"W":
            width = int(val)
        elif tag == b"H":
            height = int(val)
        elif tag == b"C":
            cs = val.decode("ascii")
    if not width or not height:
        raise ValueError("Y4M header missing W/H")
    if cs == "mono":
        plane_sizes = [(height, width)]
    elif cs == "444":
        plane_sizes = [(height, width)] * 3
    elif cs.startswith("420"):
        if width % 2 or height % 2:
            raise ValueError(f"Y4M C{cs} needs even dimensions, got {width}x{height}")
        plane_sizes = [(height, width), (height // 2, width // 2), (height // 2, width // 2)]
    else:
        raise ValueError(f"Y4M colorspace C{cs} unsupported (mono/444/420*)")
    fsize = sum(h * w for h, w in plane_sizes)
    frames: list[np.ndarray] = []
    pos = nl + 1
    while pos < len(data):
        fnl = data.find(b"\n", pos)
        if fnl < 0 or not data[pos:fnl].startswith(b"FRAME"):
            raise ValueError(
                f"Y4M corrupt: frame {len(frames)} marker missing or truncated"
            )
        pos = fnl + 1
        if pos + fsize > len(data):
            raise ValueError(
                f"Y4M truncated: frame {len(frames)} needs {fsize} bytes, "
                f"have {len(data) - pos}"
            )
        planes = []
        for h, w in plane_sizes:
            planes.append(
                np.frombuffer(data[pos : pos + h * w], dtype=np.uint8).reshape(h, w)
            )
            pos += h * w
        if cs == "mono":
            frames.append(planes[0][:, :, None])
        else:
            y, u, v = planes
            if cs.startswith("420"):
                u = u.repeat(2, axis=0).repeat(2, axis=1)
                v = v.repeat(2, axis=0).repeat(2, axis=1)
            frames.append(_yuv_to_rgb(y, u, v))
    return width, height, frames


def encode_y4m(frames: list[np.ndarray], colorspace: str = "mono") -> bytes:
    """Frames → Y4M bytes. ``mono``: HxW (or HxWx1) uint8 luma.
    ``444``: HxWx3 uint8 **YCbCr** planes (pre-converted — this encoder
    does not do RGB→YCbCr, keeping fixture bytes exact)."""
    if not frames:
        raise ValueError("encode_y4m needs at least one frame")
    first = np.asarray(frames[0])
    h, w = first.shape[:2]
    if colorspace not in ("mono", "444"):
        raise ValueError(f"encode_y4m colorspace {colorspace!r} unsupported")
    out = bytearray(b"YUV4MPEG2 W%d H%d F25:1 Ip A1:1 C%s\n" % (w, h, colorspace.encode()))
    for f in frames:
        arr = np.ascontiguousarray(np.asarray(f, dtype=np.uint8))
        if arr.shape[:2] != (h, w):
            raise ValueError("encode_y4m frames must share one shape")
        out += b"FRAME\n"
        if colorspace == "mono":
            out += arr.reshape(h, w).tobytes()
        else:
            for c in range(3):  # planar Y, Cb, Cr
                out += arr[:, :, c].tobytes()
    return bytes(out)


def _riff_chunks(data: bytes, start: int, end: int):
    """Yield (fourcc, payload_offset, payload_size) for RIFF sub-chunks
    in data[start:end); chunks are word-aligned."""
    pos = start
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if pos + 8 + size > end:
            raise ValueError(
                f"AVI truncated: chunk {cid!r} declares {size} bytes, "
                f"only {end - pos - 8} remain"
            )
        yield cid, pos + 8, size
        pos += 8 + size + (size & 1)


def decode_avi(data: bytes) -> tuple[int, int, list[np.ndarray]]:
    """Uncompressed AVI bytes → (width, height, frames as HxWxC RGB(A)).

    Scope: single 'vids' stream, BI_RGB (biCompression=0) 24/32-bit
    DIB frames in '..db'/'..dc' movi chunks — each frame decodes with
    the BMP convention (bottom-up BGR rows, 4-byte stride padding)."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI")
    (riff_size,) = struct.unpack("<I", data[4:8])
    end = min(8 + riff_size, len(data))
    width = height = bpp = None
    frame_payloads: list[bytes] = []

    def walk(start: int, stop: int) -> None:
        nonlocal width, height, bpp
        for cid, off, size in _riff_chunks(data, start, stop):
            if cid == b"LIST":
                walk(off + 4, off + size)  # skip the list-type fourcc
            elif cid == b"strf" and width is None:
                if size < 20:
                    raise ValueError(f"AVI strf header truncated ({size} bytes)")
                w, h = struct.unpack("<ii", data[off + 4 : off + 12])
                (bits,) = struct.unpack("<H", data[off + 14 : off + 16])
                (compression,) = struct.unpack("<I", data[off + 16 : off + 20])
                if compression != 0 or bits not in (24, 32):
                    raise ValueError(
                        f"AVI variant unsupported (bpp={bits}, "
                        f"compression={compression}); supported: BI_RGB 24/32-bit"
                    )
                width, height, bpp = w, abs(h), bits
            elif cid[2:4] in (b"db", b"dc") and size:
                frame_payloads.append(data[off : off + size])

    walk(12, end)
    if width is None:
        raise ValueError("AVI missing a BI_RGB 'strf' stream format header")
    nch = bpp // 8
    row_bytes = (width * nch + 3) & ~3
    frames = []
    for k, payload in enumerate(frame_payloads):
        if len(payload) < row_bytes * (height - 1) + width * nch:
            raise ValueError(
                f"AVI frame {k} truncated: {width}x{height}@{bpp}bpp needs "
                f"{row_bytes * height} bytes, have {len(payload)}"
            )
        rows = [
            np.frombuffer(
                payload[y * row_bytes : y * row_bytes + width * nch], dtype=np.uint8
            ).reshape(width, nch)
            for y in range(height)
        ]
        arr = np.stack(rows[::-1])  # bottom-up storage
        frames.append(arr[:, :, [2, 1, 0]] if nch == 3 else arr[:, :, [2, 1, 0, 3]])
    return width, height, frames


def encode_avi(frames: list[np.ndarray], fps: int = 25) -> bytes:
    """HxWx3 uint8 RGB frames → minimal uncompressed AVI (BI_RGB 24-bit,
    one 'vids' stream, no index). Exact inverse of ``decode_avi``."""
    if not frames:
        raise ValueError("encode_avi needs at least one frame")
    h, w = np.asarray(frames[0]).shape[:2]
    nch = 3
    row_bytes = (w * nch + 3) & ~3
    frame_size = row_bytes * h

    def chunk(cid: bytes, payload: bytes) -> bytes:
        return cid + struct.pack("<I", len(payload)) + payload + (b"\x00" * (len(payload) & 1))

    def lst(four: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", four + payload)

    dibs = []
    for f in frames:
        arr = np.ascontiguousarray(np.asarray(f, dtype=np.uint8))
        if arr.shape != (h, w, nch):
            raise ValueError("encode_avi frames must share one HxWx3 shape")
        body = bytearray()
        for y in range(h - 1, -1, -1):  # bottom-up BGR with stride pad
            row = arr[y][:, [2, 1, 0]].tobytes()
            body += row + b"\x00" * (row_bytes - len(row))
        dibs.append(chunk(b"00db", bytes(body)))
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps, frame_size * fps, 0, 0, len(frames), 0, 1, frame_size,
        w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"DIB ", 0, 0, 0, 0, 1, fps, 0, len(frames), frame_size, 0, 0,
        0, 0, w, h,
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_size, 0, 0, 0, 0)
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(dibs))
    return chunk(b"RIFF", b"AVI " + hdrl + movi)


def decode_video_frames(data: bytes) -> tuple[int, int, list[np.ndarray]]:
    """bytes → (width, height, frames): Y4M or uncompressed AVI by
    sniffed magic; anything else raises with the format named."""
    fmt = sniff_format(data)
    if fmt == "y4m":
        return decode_y4m(data)
    if fmt == "avi":
        return decode_avi(data)
    raise ValueError(f"unsupported video format {fmt!r} (supported: y4m/avi)")
