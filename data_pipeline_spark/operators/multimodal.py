"""Multimodal (image/audio/video) column plumbing for training-data
pipelines.

Media payloads are opaque `binary` columns with a typed metadata struct —
the same pattern the engine already uses for `html: binary` (BASELINE.json
input_hint; reference analog: `raw_html` carried per record,
/root/reference/src/fetcher/html_fetcher.rs:57-66).

The Spark-side plumbing (schema, Arrow batch shape, `mapInPandas`
partition-wise processing, deterministic frame sampling) is real and tested.
The *codec* step (actual JPEG/PNG/audio decode) is stubbed: the decode
libraries (PIL/cv2/ffmpeg) are not in this container, so `decode_fn`
defaults to a clearly-marked `NotImplementedError`, and tests inject
`fake_decode` — a deterministic md5-seeded stand-in with the same signature
and output schema. Swapping in a real decoder is a one-argument change; no
plan/schema/partitioning changes.
"""

from __future__ import annotations

import hashlib
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


def real_decode(content: bytes, media_type: str) -> list[float]:
    """Real decoder hook — STUB. Image/audio libraries are not available in
    this sandbox; plug PIL/librosa/cv2 here in production."""
    raise NotImplementedError(
        "media decode requires PIL/cv2/librosa — not available in this "
        "container; inject a decode_fn (tests use fake_decode)"
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
) -> DataFrame:
    """binary media → per-item feature vector via `mapInPandas`.

    Arrow-batched: the iterator yields whole pandas batches, the decode loop
    runs per batch (vectorizable when the real decoder accepts batch input).
    Partitioning is preserved — no shuffle; at scale, repartition upstream by
    size so decode work balances.
    """

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
                        decode_fn(c, t) for c, t in zip(content, mtype)
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
