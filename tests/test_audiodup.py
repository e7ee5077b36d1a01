"""Perceptual audio near-dup (X122): exact amplitude invariance, noise
robustness, tone discrimination, corrupt-media NULLs, Spark-path parity,
banding == brute force via the shared pigeonhole machinery."""

import math
import random

import pytest

from data_pipeline_spark.operators.audiodup import (
    afp_pairs,
    audio_fingerprint,
    audio_fingerprint64,
)
from tests.test_multimodal import _encode_wav

RATE = 8000


def _tone(freqs, seconds=1.0, amp=8000, noise=0, seed=0):
    rng = random.Random(seed)
    n = int(RATE * seconds)
    out = []
    for i in range(n):
        v = sum(amp * math.sin(2 * math.pi * f * i / RATE) for f in freqs)
        v /= max(len(freqs), 1)
        if noise:
            v += rng.gauss(0, noise)
        out.append(max(-32767, min(32767, int(v))))
    return _encode_wav(RATE, out)


def hamming(a, b):
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_amplitude_invariance_up_to_requantization():
    a = audio_fingerprint64(_tone([440, 1200], amp=8000))
    b = audio_fingerprint64(_tone([440, 1200], amp=800))
    # volume scales every band energy equally; only requantization noise
    # in empty bands can flip near-tie comparisons
    assert hamming(a, b) <= 6


def test_noise_robust_and_tones_discriminate():
    clean = audio_fingerprint64(_tone([440, 1200]))
    noisy = audio_fingerprint64(_tone([440, 1200], noise=300, seed=7))
    other = audio_fingerprint64(_tone([900, 2400]))
    assert hamming(clean, noisy) <= 6
    assert hamming(clean, other) > 10


def test_corrupt_and_short_clips():
    with pytest.raises(Exception):
        audio_fingerprint64(b"RIFFnot-really-a-wav")
    with pytest.raises(ValueError):
        audio_fingerprint64(_encode_wav(RATE, [0] * 10))


def test_spark_path_and_pairs(spark):
    rows = []
    base_freqs = [(300 + 150 * i, 900 + 220 * i) for i in range(8)]
    for i, (f1, f2) in enumerate(base_freqs):
        rows.append((f"a{i}", bytearray(_tone([f1, f2], seed=i))))
    rows.append(("a0_quiet", bytearray(_tone([300, 900], amp=500))))
    rows.append(("a0_noisy", bytearray(_tone([300, 900], noise=250, seed=9))))
    rows.append(("broken", bytearray(b"RIFFgarbage")))
    df = spark.createDataFrame(rows, "media_id string, content binary")
    fps = audio_fingerprint(df)
    got = {r["media_id"]: r["afp"] for r in fps.collect()}
    assert got["broken"] is None
    want = {}
    for mid, content in rows:
        try:
            want[mid] = audio_fingerprint64(bytes(content))
        except Exception:
            want[mid] = None
    assert got == want  # Spark path == driver-side function
    pairs = {
        tuple(sorted((r["id_a"], r["id_b"])))
        for r in afp_pairs(fps, max_hamming=6).collect()
    }
    ok = {k: v for k, v in want.items() if v is not None}
    brute = {
        tuple(sorted((a, b)))
        for a in ok for b in ok
        if a < b and hamming(ok[a], ok[b]) <= 6
    }
    assert pairs == brute
    assert ("a0", "a0_quiet") in pairs  # exact-invariance copy found
    assert ("a0", "a0_noisy") in pairs  # noisy copy found


def test_audio_dedup_e2e_planted_reencodes(spark):
    """Round-4 e2e: requantized/noisy copies of one clip collapse to a
    single survivor through the shared banded-pairs/components tail; a
    different tone and a corrupt clip survive as singletons."""
    from data_pipeline_spark.operators.audiodup import audio_dedup

    rows = [
        (1, _tone([440, 1200], amp=8000)),
        (2, _tone([440, 1200], amp=800)),              # volume change
        (3, _tone([440, 1200], noise=300, seed=5)),    # noisy copy
        (4, _tone([900, 2400])),                       # different content
        (5, b"RIFFgarbageWAVE"),
    ]
    media = spark.createDataFrame(rows, "media_id long, content binary")
    out = {r["media_id"]: r for r in audio_dedup(media, max_hamming=8).collect()}
    assert set(out) == {1, 2, 3, 4, 5}
    assert out[1]["component"] == out[2]["component"] == out[3]["component"] == 1
    assert [out[i]["is_survivor"] for i in (1, 2, 3)] == [True, False, False]
    for i in (4, 5):
        assert out[i]["component"] == i and out[i]["is_survivor"]


def test_mixed_media_dedup_families_never_cross(spark):
    """Images and clips dedup inside their own signature family; a clip
    can never pair with an image even if the 64-bit values collide."""
    from data_pipeline_spark.operators.audiodup import mixed_media_dedup
    from tests.test_imagedup import _gradient
    from tests.test_multimodal import _encode_bmp

    g = _gradient(64, 48)
    rows = [
        (1, _encode_bmp(64, 48, g), "image/bmp"),
        (2, _encode_bmp(96, 72, _gradient(96, 72, seed=1, noise=8)),
         "image/bmp"),                                   # image near-dup of 1
        (10, _tone([440, 1200], amp=8000), "audio/wav"),
        (11, _tone([440, 1200], amp=800), "audio/wav"),  # clip near-dup of 10
        (12, _tone([900, 2400]), "audio/wav"),           # distinct clip
    ]
    media = spark.createDataFrame(
        rows, "media_id long, content binary, media_type string"
    )
    out = {r["media_id"]: r for r in
           mixed_media_dedup(media, image_hamming=8, audio_hamming=8).collect()}
    assert set(out) == {1, 2, 10, 11, 12}
    assert out[1]["component"] == out[2]["component"] == 1
    assert out[10]["component"] == out[11]["component"] == 10
    assert out[12]["component"] == 12 and out[12]["is_survivor"]
    assert out[2]["is_survivor"] is False and out[11]["is_survivor"] is False


def test_mixed_media_non_av_payloads_are_flagged_singletons(spark):
    """Round-5 ADVICE: typed non-image, non-audio payloads (video/*,
    application/*) get explicit singleton labels instead of being routed
    through the image decoder; untyped payloads still go through the
    image path (magic-byte sniff); no emptiness probe — an all-'other'
    frame works with both family branches built on empty input."""
    from data_pipeline_spark.operators.audiodup import mixed_media_dedup
    from tests.test_imagedup import _gradient
    from tests.test_multimodal import _encode_bmp

    g = _gradient(64, 48)
    rows = [
        (1, _encode_bmp(64, 48, g), "image/bmp"),
        (2, _encode_bmp(64, 48, g), None),  # untyped -> sniffed as image
        (3, b"\x00\x01videobytes", "video/mp4"),
        (4, b"%PDF-1.7 ...", "application/pdf"),
    ]
    media = spark.createDataFrame(
        rows, "media_id long, content binary, media_type string"
    )
    out = {r["media_id"]: r for r in mixed_media_dedup(media).collect()}
    assert set(out) == {1, 2, 3, 4}
    # the untyped BMP paired with the typed identical image
    assert out[1]["component"] == out[2]["component"] == 1
    # video/pdf: their own singleton components, always survivors
    for i in (3, 4):
        assert out[i]["component"] == i and out[i]["is_survivor"]

    only_other = spark.createDataFrame(
        [(7, b"x", "video/webm")],
        "media_id long, content binary, media_type string",
    )
    got = mixed_media_dedup(only_other).collect()
    assert len(got) == 1 and got[0]["is_survivor"]
