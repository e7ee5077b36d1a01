"""Perceptual image near-dup (X121): dHash invariance under noise and
rescaling, BMP/PPM cross-format agreement, corrupt-media NULLs, banding
== brute-force pairs, no all-pairs plan."""

import random

import numpy as np
import pytest

from data_pipeline_spark.operators.imagedup import (
    dhash64,
    dhash_pairs,
    image_dhash,
)
from tests.test_multimodal import _encode_bmp


def _encode_ppm(width, height, rgb_rows):
    pix = b"".join(
        bytes((r, g, b)) for row in rgb_rows for (r, g, b) in row
    )
    return f"P6\n{width} {height}\n255\n".encode() + pix


def _gradient(width, height, seed=0, noise=0):
    rng = random.Random(seed)
    rows = []
    for y in range(height):
        row = []
        for x in range(width):
            v = (x * 255 // max(width - 1, 1), y * 255 // max(height - 1, 1),
                 (x + y) * 255 // max(width + height - 2, 1))
            if noise:
                v = tuple(
                    min(255, max(0, c + rng.randint(-noise, noise))) for c in v
                )
            row.append(v)
        rows.append(row)
    return rows


def _checker(width, height, cell=8):
    return [
        [((255, 255, 255) if ((x // cell + y // cell) % 2) else (0, 0, 0))
         for x in range(width)]
        for y in range(height)
    ]


def hamming(a, b):
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_dhash_invariance_and_discrimination():
    base = dhash64(_encode_bmp(64, 48, _gradient(64, 48)), "image/bmp")
    noisy = dhash64(
        _encode_bmp(64, 48, _gradient(64, 48, seed=1, noise=12)), "image/bmp"
    )
    rescaled = dhash64(_encode_bmp(96, 72, _gradient(96, 72)), "image/bmp")
    other = dhash64(_encode_bmp(64, 48, _checker(64, 48)), "image/bmp")
    assert hamming(base, noisy) <= 6       # noise survives
    assert hamming(base, rescaled) <= 6    # resizing survives
    assert hamming(base, other) > 16       # different content separates


def test_cross_format_agreement():
    g = _gradient(40, 32)
    bmp = dhash64(_encode_bmp(40, 32, g), "image/bmp")
    ppm = dhash64(_encode_ppm(40, 32, g), "image/x-portable-pixmap")
    # identical pixels through two container parsers: near-identical luma
    # (BT.601 weights applied in both) -> hashes agree
    assert hamming(bmp, ppm) <= 2


def test_corrupt_and_tiny_media():
    with pytest.raises(ValueError):
        dhash64(b"BMgarbage", "image/bmp")
    with pytest.raises(ValueError):
        dhash64(_encode_bmp(4, 4, _gradient(4, 4)), "image/bmp")  # < grid
    with pytest.raises(ValueError):
        dhash64(b"xx", "image/png")  # decodable type, corrupt payload
    with pytest.raises(ValueError):
        dhash64(b"xx", "image/jpeg")  # decodable since round 5 — corrupt
    with pytest.raises(NotImplementedError):
        dhash64(b"xx", "image/webp")  # genuinely no codec


def test_image_dhash_and_pairs(spark):
    rows = []
    # 10 distinct images + 2 near-dup copies of image 0
    for i in range(10):
        rows.append(
            (f"m{i}", _encode_bmp(64, 48, _gradient(64, 48, seed=100 + i,
                                                    noise=60)),
             "image/bmp")
        )
    rows.append(("m0_noisy",
                 _encode_bmp(64, 48, _gradient(64, 48, seed=100, noise=60)),
                 "image/bmp"))
    rows[-1] = ("m0_noisy",
                _encode_bmp(64, 48, _gradient(64, 48, seed=1, noise=10)),
                "image/bmp")
    rows.append(("m0_base", _encode_bmp(64, 48, _gradient(64, 48)),
                 "image/bmp"))
    rows.append(("m0_big", _encode_bmp(128, 96, _gradient(128, 96)),
                 "image/bmp"))
    rows.append(("broken", b"BMnope", "image/bmp"))
    df = spark.createDataFrame(
        rows, "media_id string, content binary, media_type string"
    )
    hashes = image_dhash(df)
    got = {r["media_id"]: r["dhash"] for r in hashes.collect()}
    assert got["broken"] is None
    # driver-side truth via dhash64 on every decodable payload
    want = {}
    for mid, content, mt in rows:
        try:
            want[mid] = dhash64(bytes(content), mt)
        except Exception:
            want[mid] = None
    assert got == want
    # banding pairs == brute force over the hashes
    pairs = {
        (r["id_a"], r["id_b"])
        for r in dhash_pairs(hashes, max_hamming=6).collect()
    }
    ok = {k: v for k, v in want.items() if v is not None}
    brute = {
        tuple(sorted((a, b)))
        for a in ok for b in ok
        if a < b and hamming(ok[a], ok[b]) <= 6
    }
    assert pairs == brute
    # the planted near-dups are found
    assert ("m0_base", "m0_big") in pairs or ("m0_big", "m0_base") in pairs
    assert ("m0_base", "m0_noisy") in pairs
    # the plan is chunk equi-joins, never a cartesian product
    plan = dhash_pairs(hashes)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_media_dedup_e2e_planted_reencodes(spark):
    """VERDICT r3 stretch #7: the full curation stage — decode → dHash →
    banded pairs → connected components → canonical survivor — on a
    corpus with PLANTED re-encoded copies: the same image shipped as BMP
    and PPM, a noisy rescale of it, two genuinely different images, and
    one corrupt payload. The three re-encodes collapse to one cluster
    with one survivor; distinct images and the corrupt row survive as
    singletons."""
    from data_pipeline_spark.operators.imagedup import media_dedup

    g = _gradient(64, 48)
    rows = [
        (1, _encode_bmp(64, 48, g), "image/bmp"),                      # original
        (2, _encode_ppm(64, 48, g), "image/x-portable-pixmap"),        # re-container
        (3, _encode_bmp(96, 72, _gradient(96, 72, seed=1, noise=8)),
         "image/bmp"),                                                 # noisy rescale
        (4, _encode_bmp(64, 48, _checker(64, 48)), "image/bmp"),       # different
        (5, _encode_ppm(64, 48, [[(255 - r, 255 - g, 255 - b)
                                  for (r, g, b) in row]
                                 for row in g]),
         "image/x-portable-pixmap"),                                   # different
        (6, b"BMgarbage", "image/bmp"),                                # corrupt
    ]
    media = spark.createDataFrame(
        rows, "media_id long, content binary, media_type string"
    )
    out = {r["media_id"]: r for r in media_dedup(media, max_hamming=8).collect()}
    assert set(out) == {1, 2, 3, 4, 5, 6}
    # planted copies form ONE cluster labeled by the min id, one survivor
    assert out[1]["component"] == out[2]["component"] == out[3]["component"] == 1
    assert [out[i]["is_survivor"] for i in (1, 2, 3)] == [True, False, False]
    # distinct content + the undecodable row are their own survivors
    for i in (4, 5, 6):
        assert out[i]["component"] == i and out[i]["is_survivor"]
    # different images never share a cluster
    assert out[4]["component"] != out[5]["component"]
