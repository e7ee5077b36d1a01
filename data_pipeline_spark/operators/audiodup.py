"""Perceptual audio near-dup: a Haitsma-Kalker-style fingerprint over
the real WAV decode path (X122).

The audio analog of the image dHash (operators/imagedup.py): the same
clip re-encoded, re-sampled in amplitude, or lightly noised appears
many times in a crawled corpus, and byte dedup misses every copy. The
classic robust-hash recipe (Haitsma & Kalker 2002) fingerprints the
SIGN of band-energy differences — invariant to volume, robust to
noise — and this module compresses it to one 64-bit signature per
clip so the pigeonhole pairing machinery is shared verbatim with the
image path (``imagedup.dhash_pairs`` takes any (id, 64-bit hash)
frame):

- decode: pure-stdlib ``wave`` (8/16-bit PCM, the engine's real codec
  class; corrupt payloads hash to NULL — the corrupt-media contract);
- frame the mono signal into 4 equal time quarters; per quarter, one
  numpy rFFT → energies in 17 log-spaced bands (300-3000 Hz);
- bits: each of the first 16 bands compared against the quarter's PEAK
  band energy / 1024 (≈ −30 dB). The classic recipe differences
  ADJACENT bands, which is a coin flip wherever two neighbouring bands
  are both empty (sparse spectra — tones, speech pauses), and a median
  threshold sits inside the noise cloud for the same signals; the
  peak-relative gate puts occupied bands decisively above and noise
  floors decisively below, and volume scaling moves energies and the
  peak by the same factor — invariance survives requantization.

No SQL twin (FFT is not closed-form in the oracle's dialect), so the
correctness pins are pytest laws: exact invariance under amplitude
scaling, stability under added noise, discrimination between different
tones, NULL on corrupt/short payloads, and Spark-path parity with the
driver-side function.

Reference: no counterpart (the Rust pipeline stores no media).
"""

from __future__ import annotations

import io
import wave
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F  # noqa: F401 (kept for API symmetry)
from pyspark.sql import DataFrame

__all__ = ["audio_fingerprint64", "audio_fingerprint", "afp_pairs"]

_N_BANDS = 17  # 16 difference bits per quarter
_N_QUARTERS = 4
_F_LO, _F_HI = 300.0, 3000.0


def _pcm_mono(content: bytes) -> tuple[np.ndarray, int]:
    with wave.open(io.BytesIO(content), "rb") as w:
        rate = w.getframerate()
        n = w.getnframes()
        sw = w.getsampwidth()
        ch = w.getnchannels()
        raw = w.readframes(n)
    if sw == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64)
    elif sw == 1:
        x = np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0
    else:
        raise NotImplementedError(f"{sw * 8}-bit WAV not supported")
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    return x, rate


def audio_fingerprint64(content: bytes) -> int:
    """64-bit band-energy-difference fingerprint of one PCM WAV payload;
    raises on undecodable/too-short input (callers map errors to NULL)."""
    x, rate = _pcm_mono(content)
    if len(x) < 4 * _N_BANDS * 2 or rate <= 0:
        raise ValueError("clip too short to fingerprint")
    edges = np.geomspace(_F_LO, min(_F_HI, rate / 2.0 - 1), _N_BANDS + 1)
    q = len(x) // _N_QUARTERS
    h = np.uint64(0)
    for qi in range(_N_QUARTERS):
        seg = x[qi * q : (qi + 1) * q]
        spec = np.abs(np.fft.rfft(seg)) ** 2
        freqs = np.fft.rfftfreq(len(seg), d=1.0 / rate)
        idx = np.searchsorted(freqs, edges)
        energies = np.array(
            [
                spec[idx[b] : max(idx[b + 1], idx[b] + 1)].sum()
                for b in range(_N_BANDS)
            ]
        )
        gate = energies.max() / 1024.0
        bits = (energies[:-1] > gate).astype(np.uint64)
        for b in bits:
            h = (h << np.uint64(1)) | b
    return int(np.uint64(h).astype(np.int64))


def audio_fingerprint(
    df: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """``(id, afp long)`` per clip — NULL for payloads that fail to
    decode. ``mapInPandas``, partition-preserving."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                try:
                    out.append(audio_fingerprint64(bytes(row[content_col])))
                except Exception:  # noqa: BLE001 — corrupt-media contract
                    out.append(None)
            yield pd.DataFrame(
                {id_col: pdf[id_col], "afp": pd.array(out, dtype="Int64")}
            )

    schema = df.schema[id_col].dataType.simpleString()
    return df.mapInPandas(run, schema=f"{id_col} {schema}, afp long")


def afp_pairs(
    fingerprints: DataFrame,
    id_col: str = "media_id",
    max_hamming: int = 6,
) -> DataFrame:
    """Near-dup clip pairs — the image path's pigeonhole banding reused
    verbatim over the audio signatures."""
    from .imagedup import dhash_pairs

    return dhash_pairs(
        fingerprints, id_col=id_col, hash_col="afp", max_hamming=max_hamming
    )


def audio_dedup(
    media: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
    max_hamming: int = 6,
) -> DataFrame:
    """End-to-end perceptual AUDIO dedup (round 4): decode → band-energy
    fingerprint → the shared banded-pairs/components/survivor tail
    (imagedup.hash_component_dedup) — one tuned closure for image and
    audio alike. Returns ``(id_col, component, is_survivor)``;
    undecodable clips are singleton survivors (a quality-gate decision,
    not a dedup one)."""
    from .imagedup import hash_component_dedup

    fps = audio_fingerprint(media, id_col=id_col, content_col=content_col)
    return hash_component_dedup(
        fps, id_col=id_col, hash_col="afp", max_hamming=max_hamming
    )


def mixed_media_dedup(
    media: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
    type_col: str = "media_type",
    image_hamming: int = 6,
    audio_hamming: int = 6,
) -> DataFrame:
    """Perceptual dedup over a MIXED media frame (round 4): rows split by
    ``media_type`` family — ``audio/*`` through the band-energy
    fingerprint, everything else through the image dHash — each family
    deduped with the shared component tail, labels unioned. Families are
    deduped SEPARATELY by construction: a dHash and an audio fingerprint
    are unrelated 64-bit spaces, so a cross-family banding join could
    pair an image with a clip on a numeric coincidence; the split makes
    that impossible rather than unlikely. Returns the same
    ``(id_col, component, is_survivor)`` shape as the per-family stages.
    """
    import pyspark.sql.functions as F

    from .imagedup import media_dedup

    # NULL-typed payloads make startswith NULL — coalesce so the three
    # predicates partition the frame exactly (a NULL predicate in where()
    # would silently drop the row from every family).
    is_audio = F.coalesce(
        F.col(type_col).startswith("audio/"), F.lit(False)
    )
    # untyped payloads go through the image path (its decoder sniffs
    # magic bytes); typed NON-image, NON-audio payloads (video/*,
    # application/*, ...) have no 64-bit fingerprint family here, so they
    # are labeled singleton survivors EXPLICITLY rather than being pushed
    # through the image decoder to fail one by one (round-5 ADVICE: they
    # were silently dHash-routed).
    is_image = ~is_audio & F.coalesce(
        F.col(type_col).startswith("image/"), F.lit(True)
    )
    other = media.where(~is_audio & ~is_image).select(
        F.col(id_col),
        F.col(id_col).alias("component"),
        F.lit(True).alias("is_survivor"),
    )
    # Every branch is built unconditionally: dedup of an empty family
    # frame is a cheap no-op, whereas the previous emptiness probe
    # (take(1) per family) cost a driver action over the raw binary
    # frame and then recomputed the same filtered frames inside the
    # dedup passes (round-5 ADVICE).
    image_labels = media_dedup(
        media.where(is_image), id_col=id_col, content_col=content_col,
        type_col=type_col, max_hamming=image_hamming,
    )
    audio_labels = audio_dedup(
        media.where(is_audio), id_col=id_col, content_col=content_col,
        max_hamming=audio_hamming,
    )
    return image_labels.unionByName(audio_labels).unionByName(other)
