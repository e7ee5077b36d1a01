"""Multimodal plumbing tests: binary payload schema, mapInPandas decode
(stubbed codec), frame sampling."""

import hashlib

import pyspark.sql.functions as F
import pytest

from data_pipeline_spark.operators import multimodal as MM


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, b"x" * 200, "image/png"),
        (2, b"frame-data-" * 40, "video/fake"),
        (3, b"", "image/png"),
        (4, None, "audio/wav"),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary, mt string")
    return df.select(
        "media_id", "content", MM.media_meta_cols(F.col("content"), "image/fake").alias("meta")
    )


def test_real_decode_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        MM.real_decode(b"abc", "image/png")


def test_decode_features_plumbing(media):
    out = {r["media_id"]: r for r in MM.decode_features(media, MM.fake_decode).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert out[1]["byte_len"] == 200
    assert out[1]["content_hash"] == hashlib.md5(b"x" * 200).hexdigest()
    assert out[4]["byte_len"] == 0  # null content → empty payload
    for r in out.values():
        assert len(r["features"]) == MM.FEATURE_DIM
        assert all(0.0 <= f <= 1.0 for f in r["features"])
    # Deterministic: same content → same features.
    assert out[1]["features"] == [
        pytest.approx(b / 255.0) for b in hashlib.md5(b"x" * 200).digest()[: MM.FEATURE_DIM]
    ]


def test_sample_frames(media):
    rows = MM.sample_frames(media, every_n=2, frame_bytes=64).collect()
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    # media 2: 440 bytes → 6 full frames → sampled idx 0,2,4
    assert sorted(r["frame_idx"] for r in by_media[2]) == [0, 2, 4]
    blob = b"frame-data-" * 40
    for r in by_media[2]:
        start = r["frame_idx"] * 64
        assert bytes(r["frame"]) == blob[start : start + 64]
    # media 1: 200 bytes → 3 frames → idx 0, 2; short/empty media → none
    assert sorted(r["frame_idx"] for r in by_media[1]) == [0, 2]
    assert 3 not in by_media and 4 not in by_media
