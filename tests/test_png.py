"""Pure-stdlib PNG decode (round 4): zlib DEFLATE + the five spec
filters, exactness against a reference encoder that can emit ANY filter
per row, palette/gray/alpha color types, corrupt-media contract, and
the dHash/near-dup path treating a PNG re-encode as the same image."""

import struct
import zlib

import numpy as np
import pytest

from data_pipeline_spark.operators.multimodal import (
    decode_png,
    png_pixels,
    real_decode,
)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data))
    )


def encode_png(px: np.ndarray, filters=None, color=None, palette=None) -> bytes:
    """Minimal spec-correct PNG encoder (test-only): 8-bit, color type
    from channel count (or explicit for palette), per-row filter types
    as given (default 0)."""
    h, w, c = px.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c] if color is None else color
    filters = filters or [0] * h
    bpp = c
    raw = bytearray()
    prev = np.zeros(w * c, np.int32)
    for y in range(h):
        row = px[y].reshape(-1).astype(np.int32)
        ft = filters[y]
        out = row.copy()
        if ft == 1:
            for x in range(w * c - 1, bpp - 1, -1):
                out[x] = (row[x] - row[x - bpp]) & 0xFF
        elif ft == 2:
            out = (row - prev) & 0xFF
        elif ft == 3:
            for x in range(w * c - 1, -1, -1):
                a = row[x - bpp] if x >= bpp else 0
                out[x] = (row[x] - ((a + prev[x]) >> 1)) & 0xFF
        elif ft == 4:
            for x in range(w * c - 1, -1, -1):
                a = int(row[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                cc = int(prev[x - bpp]) if x >= bpp and y else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                out[x] = (row[x] - pred) & 0xFF
        raw.append(ft)
        raw.extend(int(v) & 0xFF for v in out)
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    body = _chunk(b"IHDR", ihdr)
    if palette is not None:
        body += _chunk(b"PLTE", palette.astype(np.uint8).tobytes())
    body += _chunk(b"IDAT", zlib.compress(bytes(raw)))
    body += _chunk(b"IEND", b"")
    return b"\x89PNG\r\n\x1a\n" + body


def _rand_px(h, w, c, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, c)).astype(np.uint8)


@pytest.mark.parametrize("c", [1, 2, 3, 4])
def test_roundtrip_all_filters(c):
    px = _rand_px(10, 7, c, seed=c)
    filters = [0, 1, 2, 3, 4, 4, 3, 2, 1, 0]
    got = png_pixels(encode_png(px, filters=filters))
    assert got.shape == (10, 7, c)
    assert np.array_equal(got, px)


def test_palette_roundtrip():
    palette = _rand_px(1, 5, 3, seed=9).reshape(5, 3)
    idx = _rand_px(6, 6, 1, seed=10) % 5
    png = encode_png(idx, filters=[0, 1, 2, 3, 4, 0], color=3, palette=palette)
    got = png_pixels(png)
    assert got.shape == (6, 6, 3)
    assert np.array_equal(got, palette[idx[:, :, 0]])


def test_decode_png_features_and_dispatch():
    px = np.zeros((8, 16, 3), np.uint8)
    px[:, :, 0] = 255  # pure red
    feats = decode_png(encode_png(px))
    assert feats[0] == 1.0
    assert feats[3] == 1.0 and feats[4] == 0.0 and feats[5] == 0.0  # RGB means
    assert feats[6] == 16 / 24  # aspect w/(w+h)
    # magic-byte dispatch through the generic decoder
    assert real_decode(encode_png(px), "image/png") == feats


def test_corrupt_media_contract():
    px = _rand_px(6, 6, 3)
    good = encode_png(px)
    with pytest.raises(ValueError):
        png_pixels(b"\x89PNG\r\n\x1a\nnot-chunks")
    with pytest.raises(ValueError):  # corrupt DEFLATE stream
        png_pixels(good[:60] + b"\x00" * (len(good) - 60))
    with pytest.raises(ValueError):  # truncated scanlines
        h, w = 6, 6
        short = zlib.compress(b"\x00" * (3 * (w * 3 + 1)))  # 3 of 6 rows
        png_pixels(
            b"\x89PNG\r\n\x1a\n"
            + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
            + _chunk(b"IDAT", short)
            + _chunk(b"IEND", b"")
        )
    with pytest.raises(NotImplementedError):  # 16-bit depth
        png_pixels(
            b"\x89PNG\r\n\x1a\n"
            + _chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 16, 2, 0, 0, 0))
            + _chunk(b"IDAT", zlib.compress(b"\x00" * 100))
        )


def test_png_reencode_joins_neardup_cluster(spark):
    """A PNG re-encode of an image shipped as BMP/PPM lands in the SAME
    near-dup cluster through the full media_dedup stage."""
    from data_pipeline_spark.operators.imagedup import dhash64, media_dedup
    from tests.test_imagedup import _encode_ppm, _gradient, hamming
    from tests.test_multimodal import _encode_bmp

    g = _gradient(64, 48)
    arr = np.array(g, dtype=np.uint8)
    png = encode_png(arr, filters=[i % 5 for i in range(48)])
    h_png = dhash64(png, "image/png")
    h_bmp = dhash64(_encode_bmp(64, 48, g), "image/bmp")
    assert hamming(h_png, h_bmp) <= 2  # same pixels, two codecs
    rows = [
        (1, _encode_bmp(64, 48, g), "image/bmp"),
        (2, png, "image/png"),
        (3, _encode_ppm(64, 48, [[(255 - r, 255 - g2, 255 - b)
                                  for (r, g2, b) in row] for row in g]),
         "image/x-portable-pixmap"),
    ]
    media = spark.createDataFrame(
        rows, "media_id long, content binary, media_type string"
    )
    out = {r["media_id"]: r for r in media_dedup(media, max_hamming=8).collect()}
    assert out[1]["component"] == out[2]["component"] == 1
    assert out[2]["is_survivor"] is False
    assert out[3]["component"] == 3 and out[3]["is_survivor"]
