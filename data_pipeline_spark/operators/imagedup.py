"""Perceptual image near-dup: dHash over the REAL decode path +
hamming banding (X121).

A web-scale multimodal corpus holds the same image re-encoded, resized
and re-hosted thousands of times; byte-level dedup catches none of it.
The standard cheap answer is a difference hash (dHash): downsample the
luma plane to a 9×8 grid of block means and emit one bit per
horizontal neighbour comparison — 64 bits that survive resizing,
mild noise and re-encoding, with hamming distance as the similarity.
This module computes it over the engine's REAL pure-stdlib decoders
(the X26 BMP/PPM payloads — same corrupt-media contract: a payload
that fails to decode hashes to NULL, never kills the task) and finds
near-dup pairs with the SAME pigeonhole machinery the text SimHash
uses (operators/textdedup.py::simhash_pairs): split the signature
into max_hamming+1 chunks, candidates share an exact chunk
(equi-join, never all-pairs), verify with bit_count(xor).

Scale shape: hashing is ``mapInPandas`` over the binary column —
partition-preserving, no shuffle, numpy block-means per row (the 9×8
reduction is `np.add.reduceat` on the decoded luma, not a Python pixel
loop); pairing is chunk equi-joins on 64-bit keys. No SQL twin (the
decode is a binary-payload pandas UDF — the non-SQL-expressible class
the driver records as rows-only), so correctness is pinned by pytest:
planted noisy/rescaled copies hash within distance, distinct images
don't, and the banding finds exactly the verified pairs.

Reference: no counterpart (the Rust pipeline stores no media).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = ["dhash64", "image_dhash", "dhash_pairs", "media_dedup",
           "hash_component_dedup"]

DHASH_BITS = 64
_TH, _TW = 8, 9  # target grid: 8 rows x 9 cols -> 8x8 neighbour bits


def _gray_bmp(content: bytes) -> np.ndarray:
    """Luma plane of an uncompressed 24/32-bpp BMP (same header rules as
    multimodal.decode_bmp; bottom-up row order normalized to top-down)."""
    if len(content) < 54 or content[:2] != b"BM":
        raise ValueError("not a BMP payload")
    pix_off = struct.unpack_from("<I", content, 10)[0]
    hdr_size = struct.unpack_from("<I", content, 14)[0]
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMP not supported")
    width, height_raw = struct.unpack_from("<ii", content, 18)
    bpp = struct.unpack_from("<H", content, 28)[0]
    compression = struct.unpack_from("<I", content, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise NotImplementedError(f"compressed/{bpp}-bpp BMP not supported")
    topdown = height_raw < 0
    height = abs(height_raw)
    if width <= 0 or height <= 0:
        raise ValueError("BMP header declares non-positive dimensions")
    nbytes = bpp // 8
    stride = (width * nbytes + 3) & ~3
    if pix_off + height * stride > len(content):
        raise ValueError("truncated BMP: pixel data shorter than header claims")
    raw = np.frombuffer(
        content, dtype=np.uint8, count=height * stride, offset=pix_off
    ).reshape(height, stride)[:, : width * nbytes]
    px = raw.reshape(height, width, nbytes)[:, :, :3].astype(np.float64)
    # BMP channel order is BGR; BMP rows are bottom-up unless height < 0
    gray = 0.114 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.299 * px[:, :, 2]
    return gray if topdown else gray[::-1]


def _gray_ppm(content: bytes) -> np.ndarray:
    """Luma plane of a binary P6 PPM (maxval ≤ 255)."""
    if not content.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    fields, i, n = [], 2, len(content)
    while len(fields) < 3 and i < n:
        while i < n and content[i : i + 1].isspace():
            i += 1
        if content[i : i + 1] == b"#":
            while i < n and content[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < n and not content[j : j + 1].isspace():
            j += 1
        fields.append(int(content[i:j]))
        i = j
    i += 1
    width, height, maxval = fields
    if maxval > 255:
        raise NotImplementedError("16-bit PPM not supported")
    need = width * height * 3
    if i + need > n:
        raise ValueError("truncated PPM payload")
    px = (
        np.frombuffer(content, dtype=np.uint8, count=need, offset=i)
        .reshape(height, width, 3)
        .astype(np.float64)
        * (255.0 / maxval)
    )
    return 0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]


def _gray_png(content: bytes) -> np.ndarray:
    """Luma plane of an 8-bit PNG (decode via multimodal.png_pixels —
    pure stdlib zlib + spec filters; gray/palette/alpha handled there)."""
    from .multimodal import png_pixels

    px = png_pixels(content).astype(np.float64)
    if px.shape[2] >= 3:
        return 0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]
    return px[:, :, 0]


def _gray_jpeg(content: bytes) -> np.ndarray:
    """Luma plane of a baseline JPEG (decode via operators.jpeg — pure
    stdlib huffman + IDCT; round 5). Unsupported variants (progressive,
    arithmetic) raise and become NULL hashes like any corrupt payload."""
    from .jpeg import jpeg_pixels

    px = jpeg_pixels(content).astype(np.float64)
    if px.shape[2] >= 3:
        return 0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]
    return px[:, :, 0]


def _block_means(gray: np.ndarray, th: int, tw: int) -> np.ndarray:
    h, w = gray.shape
    if h < th or w < tw:
        raise ValueError(f"image {w}x{h} too small for a {tw}x{th} dHash grid")
    ys = (np.arange(th + 1) * h) // th
    xs = (np.arange(tw + 1) * w) // tw
    rows = np.add.reduceat(gray, ys[:-1], axis=0)
    cells = np.add.reduceat(rows, xs[:-1], axis=1)
    areas = np.outer(np.diff(ys), np.diff(xs))
    return cells / areas


def dhash64(content: bytes, media_type: str | None) -> int:
    """64-bit difference hash of one decoded payload (BMP, binary PPM, or
    PNG); raises on undecodable/too-small input (callers map errors to
    NULL — the corrupt-media contract). The payload's MAGIC BYTES pick
    the codec first — on a real crawl the declared content-type is
    routinely missing or wrong — with the declared type as fallback for
    magic-less payloads."""
    head = (content or b"")[:8]
    if head[:2] == b"BM":
        gray = _gray_bmp(content)
    elif head[:2] == b"P6":
        gray = _gray_ppm(content)
    elif head == b"\x89PNG\r\n\x1a\n":
        gray = _gray_png(content)
    elif head[:3] == b"\xff\xd8\xff":
        gray = _gray_jpeg(content)
    elif media_type == "image/bmp":
        gray = _gray_bmp(content)
    elif media_type in ("image/x-portable-pixmap", "image/ppm"):
        gray = _gray_ppm(content)
    elif media_type == "image/png":
        gray = _gray_png(content)
    elif media_type in ("image/jpeg", "image/jpg"):
        gray = _gray_jpeg(content)
    else:
        raise NotImplementedError(f"no dHash decoder for {media_type}")
    cells = _block_means(gray, _TH, _TW)
    bits = (cells[:, :-1] > cells[:, 1:]).astype(np.uint64).ravel()
    h = np.uint64(0)
    for b in bits:
        h = (h << np.uint64(1)) | b
    # two's-complement wrap into Spark's signed long
    return int(np.uint64(h).astype(np.int64))


def image_dhash(
    df: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
    type_col: str = "media_type",
) -> DataFrame:
    """``(id, dhash long)`` per media row — NULL for payloads that fail
    to decode or are smaller than the hash grid. ``mapInPandas``,
    partition-preserving, Arrow batch transfer of the binary column."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                try:
                    out.append(dhash64(bytes(row[content_col]), row[type_col]))
                except Exception:  # noqa: BLE001 — corrupt-media contract
                    out.append(None)
            yield pd.DataFrame(
                {id_col: pdf[id_col], "dhash": pd.array(out, dtype="Int64")}
            )

    schema = f"{df.schema[id_col].dataType.simpleString()}"
    return df.mapInPandas(
        run, schema=f"{id_col} {schema}, dhash long"
    )


def dhash_pairs(
    hashes: DataFrame,
    id_col: str = "media_id",
    hash_col: str = "dhash",
    max_hamming: int = 6,
) -> DataFrame:
    """Near-dup image pairs with hamming distance ≤ max_hamming —
    pigeonhole banding over max_hamming+1 chunks (any pair within the
    distance shares one exact chunk), chunk equi-joins, exact
    bit_count(xor) verify. NULL hashes (undecodable media) never pair."""
    n_chunks = max_hamming + 1
    if n_chunks > DHASH_BITS:
        raise ValueError("max_hamming too large for a 64-bit hash")
    # chunk widths cover all 64 bits disjointly (sizes differ by <= 1)
    widths = [
        DHASH_BITS // n_chunks + (1 if i < DHASH_BITS % n_chunks else 0)
        for i in range(n_chunks)
    ]
    offs = [sum(widths[:i]) for i in range(n_chunks)]
    base = hashes.where(F.col(hash_col).isNotNull()).select(
        F.col(id_col).alias("doc"), F.col(hash_col).alias("sig")
    )
    chunks = base.select(
        "doc",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(ci).alias("chunk"),
                        (
                            F.shiftrightunsigned(F.col("sig"), offs[ci])
                            % (2 ** widths[ci])
                        ).alias("ckey"),
                    )
                    for ci in range(n_chunks)
                ]
            )
        ).alias("c"),
    ).select("doc", "sig", "c.chunk", "c.ckey")
    cand = (
        chunks.alias("x")
        .join(chunks.alias("y"), on=["chunk", "ckey"])
        .where(F.col("x.doc") < F.col("y.doc"))
        .select(
            F.col("x.doc").alias("id_a"),
            F.col("y.doc").alias("id_b"),
            F.col("x.sig").alias("sig_a"),
            F.col("y.sig").alias("sig_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        cand.withColumn("hamming", ham.cast("integer"))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def media_dedup(
    media: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
    type_col: str = "media_type",
    max_hamming: int = 6,
) -> DataFrame:
    """End-to-end perceptual image dedup (VERDICT r3 stretch #7): decode →
    dHash → pigeonhole near-dup pairs → connected components
    (large-star/small-star, operators/components.py) → canonical survivor
    per cluster.

    Returns ``(id_col, component, is_survivor)`` for EVERY input row:
    ``component`` is the cluster's minimum id (the near-dup group label),
    ``is_survivor`` marks the one row per cluster a curation pipeline
    keeps. Undecodable payloads (NULL dHash — the corrupt-media contract)
    cannot be compared, so each is its own singleton component and
    survives; dropping them is a quality-gate decision, not a dedup one.

    Scale shape: the only non-native step is the Arrow-batched decode
    (``mapInPandas``); pairing is chunk equi-joins (never all-pairs) and
    the component closure is O(log n) rounds of star operations — the
    same machinery the text near-dup stage rides, so a 1000-executor run
    shares one tuned code path for text and images.
    """
    hashes = image_dhash(
        media, id_col=id_col, content_col=content_col, type_col=type_col
    )
    return hash_component_dedup(
        hashes, id_col=id_col, hash_col="dhash", max_hamming=max_hamming
    )


def hash_component_dedup(
    hashes: DataFrame,
    id_col: str,
    hash_col: str,
    max_hamming: int = 6,
) -> DataFrame:
    """Shared tail of every perceptual-hash dedup stage: banded pairs →
    connected components → canonical survivor. Works for ANY 64-bit
    signature family (image dHash, audio band-energy fingerprint) — the
    pigeonhole pairing and the star-operation closure are hash-agnostic.
    NULL signatures (undecodable payloads) become singleton survivors."""
    from .components import connected_components

    hashes = hashes.localCheckpoint(
        eager=True
    )  # the component loop iterates actions on it
    pairs = dhash_pairs(
        hashes, id_col=id_col, hash_col=hash_col, max_hamming=max_hamming
    )
    nodes = hashes.select(id_col)
    comp = connected_components(nodes, pairs, "id_a", "id_b", id_col)
    return comp.select(
        id_col,
        "component",
        (F.col(id_col) == F.col("component")).alias("is_survivor"),
    )
