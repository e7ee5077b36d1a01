"""Multimodal (image/audio/video) column plumbing for training-data
pipelines.

Media payloads are opaque `binary` columns with a typed metadata struct —
the same pattern the engine already uses for `html: binary` (BASELINE.json
input_hint; reference analog: `raw_html` carried per record,
/root/reference/src/fetcher/html_fetcher.rs:57-66).

The Spark-side plumbing (schema, Arrow batch shape, `mapInPandas`
partition-wise processing, deterministic frame sampling) is real and tested.
The codec step is real for uncompressed containers — pure-stdlib decoders
for BMP (struct), binary PPM, and PCM WAV (wave) — and for the two
compressed web-image formats: PNG (round 4 — DEFLATE via zlib + the five
spec filters, `png_pixels`) and baseline-sequential JPEG (round 5 —
huffman + IDCT from the T.81 spec, `operators/jpeg.py::jpeg_pixels`). All
dispatch on magic bytes in `real_decode`. The remaining compressed formats
(progressive JPEG, MP3, H.264) still raise a clearly-marked
`NotImplementedError` (ffmpeg-class codecs are not in this container).
`fake_decode` — a deterministic md5-seeded stand-in with the same signature
and output schema — remains for shape-only tests. Swapping in a library
decoder is a one-argument change; no plan/schema/partitioning changes.
"""

from __future__ import annotations

import array
import hashlib
import io
import math
import struct
import sys
import wave
import zlib
from collections.abc import Callable, Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

MEDIA_META_DDL = (
    "struct<media_type:string, width:int, height:int, n_frames:int, "
    "sample_rate:int, duration_ms:long>"
)

MEDIA_SCHEMA_DDL = f"media_id long, content binary, meta {MEDIA_META_DDL}"

FEATURE_DIM = 8

DECODED_DDL = (
    "media_id long, media_type string, byte_len long, content_hash string, "
    f"features array<float>"
)


def media_meta_cols(content: F.Column, media_type: str) -> F.Column:
    """Typed metadata struct for an opaque binary payload (plumbing only —
    real width/height/etc. come from the decoder)."""
    return F.struct(
        F.lit(media_type).alias("media_type"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("n_frames"),
        F.lit(None).cast("int").alias("sample_rate"),
        F.length(content).cast("long").alias("duration_ms"),
    )


def decode_bmp(content: bytes) -> list[float]:
    """Pure-stdlib decoder for uncompressed 24/32-bpp BMP (BITMAPINFOHEADER).

    Returns FEATURE_DIM floats in [0,1]: decoded flag, width/4096,
    height/4096, mean R, mean G, mean B, aspect ratio (w/(w+h)), bpp/32.
    """
    if len(content) < 54 or content[:2] != b"BM":
        raise ValueError("not a BMP payload")
    pix_off = struct.unpack_from("<I", content, 10)[0]
    hdr_size = struct.unpack_from("<I", content, 14)[0]
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMP not supported")
    width, height = struct.unpack_from("<ii", content, 18)
    bpp = struct.unpack_from("<H", content, 28)[0]
    compression = struct.unpack_from("<I", content, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise NotImplementedError(f"compressed/{bpp}-bpp BMP not supported")
    height = abs(height)
    if width <= 0 or height <= 0:
        raise ValueError("BMP header declares non-positive dimensions")
    nbytes = bpp // 8
    row_stride = (width * nbytes + 3) & ~3  # rows pad to 4-byte boundary
    if pix_off + height * row_stride > len(content):
        # Truncated payload: header promises more pixels than exist. A
        # ValueError keeps the corrupt-media contract (callers map decode
        # errors to the undecoded feature row) instead of an IndexError
        # killing the task.
        raise ValueError("truncated BMP: pixel data shorter than header claims")
    tot = [0, 0, 0]
    npix = max(width * height, 1)
    for y in range(height):
        row = content[pix_off + y * row_stride : pix_off + y * row_stride + width * nbytes]
        for x in range(width):
            b, g, r = row[x * nbytes], row[x * nbytes + 1], row[x * nbytes + 2]
            tot[0] += r
            tot[1] += g
            tot[2] += b
    return [
        1.0,
        min(width / 4096.0, 1.0),
        min(height / 4096.0, 1.0),
        tot[0] / (npix * 255.0),
        tot[1] / (npix * 255.0),
        tot[2] / (npix * 255.0),
        width / max(width + height, 1),
        bpp / 32.0,
    ]


def decode_ppm(content: bytes) -> list[float]:
    """Pure-stdlib decoder for binary PPM (P6, maxval ≤ 255). Same feature
    layout as `decode_bmp` (bpp slot fixed at 24/32)."""
    if not content.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # Header: "P6" <ws> width <ws> height <ws> maxval <single ws> pixels
    fields, i, n = [], 2, len(content)
    while len(fields) < 3 and i < n:
        while i < n and content[i : i + 1].isspace():
            i += 1
        if content[i : i + 1] == b"#":  # comment to end of line
            while i < n and content[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < n and not content[j : j + 1].isspace():
            j += 1
        fields.append(int(content[i:j]))
        i = j
    i += 1  # the single whitespace after maxval
    width, height, maxval = fields
    if maxval > 255:
        raise NotImplementedError("16-bit PPM not supported")
    pix = content[i : i + width * height * 3]
    tot = [0, 0, 0]
    for p in range(0, len(pix) - 2, 3):
        tot[0] += pix[p]
        tot[1] += pix[p + 1]
        tot[2] += pix[p + 2]
    npix = max(width * height, 1)
    return [
        1.0,
        min(width / 4096.0, 1.0),
        min(height / 4096.0, 1.0),
        tot[0] / (npix * maxval),
        tot[1] / (npix * maxval),
        tot[2] / (npix * maxval),
        width / max(width + height, 1),
        24 / 32.0,
    ]


def png_pixels(content: bytes):
    """Pure-stdlib PNG decode to an (H, W, C) uint8 numpy array.

    PNG is the one compressed web-image format whose codec IS in the
    standard library: DEFLATE via ``zlib`` plus the five per-row byte
    filters (None/Sub/Up/Average/Paeth) from the PNG spec, reconstructed
    here directly. Supported: bit depth 8, color types 0 (gray),
    2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA), non-interlaced —
    i.e. what encoders actually emit for web images. 16-bit and Adam7
    raise ``NotImplementedError``; structural corruption raises
    ``ValueError`` (the corrupt-media contract: callers map decode
    errors to NULL/undecoded rows, never task death).

    Filter reconstruction is numpy row-at-a-time: Up is fully
    vectorized; Sub/Average/Paeth need the already-reconstructed left
    neighbour so they walk the row in C-order — still bounded by row
    width, not image size, per step.
    """
    import numpy as np

    if content[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos, n = 8, len(content)
    ihdr, plte, idat = None, None, []
    while pos + 8 <= n:
        (length,) = struct.unpack_from(">I", content, pos)
        ctype = content[pos + 4 : pos + 8]
        data = content[pos + 8 : pos + 8 + length]
        if len(data) < length:
            raise ValueError("truncated PNG chunk")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError("PNG with non-standard compression/filter method")
    if depth != 8:
        raise NotImplementedError(f"{depth}-bit PNG not supported")
    if interlace != 0:
        raise NotImplementedError("Adam7-interlaced PNG not supported")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if channels is None:
        raise ValueError(f"unknown PNG color type {color}")
    if w <= 0 or h <= 0:
        raise ValueError("PNG header declares non-positive dimensions")
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        raise ValueError(f"corrupt PNG stream: {e}") from None
    stride = w * channels
    if len(raw) < h * (stride + 1):
        raise ValueError("truncated PNG: fewer scanlines than header claims")
    out = np.zeros((h, stride), dtype=np.uint8)
    bpp = channels  # bytes per pixel at depth 8
    for y in range(h):
        off = y * (stride + 1)
        ft = raw[off]
        row = np.frombuffer(raw, np.uint8, stride, offset=off + 1).astype(
            np.int32
        )
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if ft == 0:  # None
            cur = row
        elif ft == 2:  # Up
            cur = (row + prev) & 0xFF
        elif ft == 1:  # Sub
            cur = row.copy()
            for x in range(bpp, stride):
                cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
        elif ft == 3:  # Average
            cur = row.copy()
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            cur = row.copy()
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp and y else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        out[y] = cur.astype(np.uint8)
    px = out.reshape(h, w, channels)
    if color == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE chunk")
        idxs = px[:, :, 0]
        if int(idxs.max(initial=0)) >= len(plte):
            raise ValueError("PNG palette index out of range")
        px = plte[idxs]
    return px


def decode_png(content: bytes) -> list[float]:
    """Feature row for a PNG payload — same layout as `decode_bmp`
    (decoded flag, w/4096, h/4096, mean R/G/B, aspect, bpp/32), over the
    real `png_pixels` decode. Gray/gray-alpha replicate the single
    channel into the RGB means; alpha never contributes."""
    import numpy as np

    px = png_pixels(content)
    h, w, c = px.shape
    rgb = px[:, :, :3] if c >= 3 else np.repeat(px[:, :, :1], 3, axis=2)
    means = rgb.reshape(-1, 3).mean(axis=0) / 255.0
    return [
        1.0,
        min(w / 4096.0, 1.0),
        min(h / 4096.0, 1.0),
        float(means[0]),
        float(means[1]),
        float(means[2]),
        w / max(w + h, 1),
        (c * 8) / 32.0,
    ]


def decode_wav(content: bytes) -> list[float]:
    """Pure-stdlib decoder for PCM WAV (8/16-bit) via the `wave` module.

    Returns FEATURE_DIM floats in [0,1]: decoded flag, sample_rate/96k,
    n_channels/8, duration_s/3600, RMS amplitude, peak amplitude,
    mean amplitude, sample_width/4.
    """
    with wave.open(io.BytesIO(content)) as w:
        nch, sw, rate, nframes = (
            w.getnchannels(),
            w.getsampwidth(),
            w.getframerate(),
            w.getnframes(),
        )
        raw = w.readframes(nframes)
    if sw == 1:  # unsigned 8-bit: shift the midpoint to 0 (signed).
        # array('b') accepts negative ints directly; bytes() would not.
        samples = array.array("b", [b - 128 for b in raw])
        full = 128.0
    elif sw == 2:  # signed 16-bit little-endian
        samples = array.array("h")
        samples.frombytes(raw[: len(raw) - len(raw) % 2])
        if sys.byteorder == "big":
            samples.byteswap()
        full = 32768.0
    else:
        raise NotImplementedError(f"{sw * 8}-bit WAV not supported")
    n = max(len(samples), 1)
    rms = math.sqrt(sum((s / full) ** 2 for s in samples) / n)
    peak = max((abs(s) / full for s in samples), default=0.0)
    mean = sum(abs(s) / full for s in samples) / n
    return [
        1.0,
        min(rate / 96000.0, 1.0),
        min(nch / 8.0, 1.0),
        min(nframes / max(rate, 1) / 3600.0, 1.0),
        min(rms, 1.0),
        min(peak, 1.0),
        min(mean, 1.0),
        sw / 4.0,
    ]


def decode_jpeg(content: bytes) -> list[float]:
    """Feature row for a baseline JPEG payload — same layout as
    `decode_bmp`/`decode_png` (decoded flag, w/4096, h/4096, mean R/G/B,
    aspect, bpp/32), over the real `operators.jpeg.jpeg_pixels` decode
    (round 5). Grayscale replicates the single channel into the RGB
    means."""
    import numpy as np

    from .jpeg import jpeg_pixels

    px = jpeg_pixels(content)
    h, w, c = px.shape
    rgb = px if c >= 3 else np.repeat(px[:, :, :1], 3, axis=2)
    means = rgb.reshape(-1, 3).mean(axis=0) / 255.0
    return [
        1.0,
        min(w / 4096.0, 1.0),
        min(h / 4096.0, 1.0),
        float(means[0]),
        float(means[1]),
        float(means[2]),
        w / max(w + h, 1),
        (c * 8) / 32.0,
    ]


def real_decode(content: bytes, media_type: str) -> list[float]:
    """Real decoder: dispatches on the payload's magic bytes to a pure-stdlib
    codec (uncompressed BMP, binary PPM, PCM WAV, DEFLATE PNG, baseline
    JPEG). The remaining compressed formats (MP3/H.264) still raise —
    those libraries (ffmpeg) are not in this container; plug them in here
    in production. The Spark plumbing (schema, Arrow batching,
    partitioning) is identical either way.
    """
    content = content or b""
    if content[:2] == b"BM":
        return decode_bmp(content)
    if content[:2] == b"P6":
        return decode_ppm(content)
    if content[:8] == b"\x89PNG\r\n\x1a\n":
        return decode_png(content)
    if content[:3] == b"\xff\xd8\xff":
        return decode_jpeg(content)
    if content[:4] == b"RIFF" and content[8:12] == b"WAVE":
        return decode_wav(content)
    raise NotImplementedError(
        f"no pure-stdlib codec for {media_type!r} (magic {content[:4]!r}); "
        "MP3/H.264 need ffmpeg — inject a decode_fn"
    )


def fake_decode(content: bytes, media_type: str) -> list[float]:
    """Deterministic decoder stand-in: FEATURE_DIM floats derived from the
    md5 of the payload. Same signature/shape as a real embedding extractor,
    so the Spark plumbing is exercised end-to-end."""
    h = hashlib.md5(content or b"").digest()
    return [h[i] / 255.0 for i in range(FEATURE_DIM)]


def decode_features(
    df: DataFrame,
    decode_fn: Callable[[bytes, str], list[float]] = real_decode,
    content_col: str = "content",
    id_col: str = "media_id",
    meta_col: str = "meta",
    null_on_error: bool = True,
) -> DataFrame:
    """binary media → per-item feature vector via `mapInPandas`.

    Arrow-batched: the iterator yields whole pandas batches, the decode loop
    runs per batch (vectorizable when the real decoder accepts batch input).
    Partitioning is preserved — no shuffle; at scale, repartition upstream by
    size so decode work balances.

    ``null_on_error`` (round 4) applies the corrupt-media contract at the
    plumbing level, matching the dHash path (imagedup.image_dhash): a
    payload the decoder rejects yields a NULL feature row instead of
    killing the task — at 10^10 media rows SOME payloads are always
    corrupt, and one bad byte-string must never fail a 100-GB partition.
    Pass ``null_on_error=False`` to surface decoder bugs in tests.
    """

    def decode_one(c, t):
        if not null_on_error:
            return decode_fn(c, t)
        try:
            return decode_fn(c, t)
        except Exception:  # noqa: BLE001 — corrupt-media contract
            return None

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf[content_col]
            mtype = pdf[meta_col].map(
                lambda m: (m or {}).get("media_type", "unknown")
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "media_type": mtype,
                    "byte_len": content.map(lambda b: len(b or b"")).astype("int64"),
                    "content_hash": content.map(
                        lambda b: hashlib.md5(b or b"").hexdigest()
                    ),
                    "features": [
                        decode_one(c, t) for c, t in zip(content, mtype)
                    ],
                }
            )

    return df.mapInPandas(run, schema=DECODED_DDL)


def sample_frames(
    df: DataFrame,
    every_n: int = 10,
    id_col: str = "media_id",
    content_col: str = "content",
    frame_bytes: int = 64,
) -> DataFrame:
    """Deterministic frame sampling for video-like payloads: treat the
    binary as fixed-size frames, keep every n-th. Pure plumbing (`posexplode`
    over a native `split`-free byte slicing in mapInPandas) — the real codec
    would replace the byte slicing, the sampling/shuffle shape stays."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frames, idxs = [], [], []
            for mid, blob in zip(pdf[id_col], pdf[content_col]):
                blob = blob or b""
                n = max(len(blob) // frame_bytes, 0)
                for fi in range(0, n, every_n):
                    ids.append(mid)
                    idxs.append(fi)
                    frames.append(blob[fi * frame_bytes : (fi + 1) * frame_bytes])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return df.mapInPandas(run, schema="media_id long, frame_idx int, frame binary")
