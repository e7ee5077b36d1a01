"""Pure-stdlib baseline JPEG codec (round 5, VERDICT r4 "Next round #5"):
encode→decode roundtrip accuracy on real on-disk bytes across color /
subsampling / restart variants, the corrupt-media and unsupported-variant
contracts, and the dHash/near-dup path treating a JPEG re-encode of a BMP
as the same image (the planted-JPEG-near-dup scenario for the media dedup
stage — kept in pytest rather than the SQL-oracled media_dedup_e2e
contract because that oracle needs closed-form EXACT hashes and JPEG is
lossy by construction)."""

import numpy as np
import pytest

from data_pipeline_spark.operators.jpeg import encode_baseline, jpeg_pixels
from data_pipeline_spark.operators.multimodal import real_decode


def _img(h=48, w=64, seed=0, noise=2):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack(
        [xx * 255 / w, yy * 255 / h, (xx + yy) * 255 / (w + h)], axis=2
    )
    return np.clip(base + rng.normal(0, noise, base.shape), 0, 255).astype(
        np.uint8
    )


def test_roundtrip_accuracy_and_on_disk_bytes(tmp_path):
    """Encode → write to disk → read back → decode: shape-exact, small
    mean error, across quality / 4:2:0 / restart markers / odd dims."""
    img = _img(45, 61, seed=3)
    for q, sub, ri, tol in [
        (95, False, 0, 4), (85, False, 0, 5), (85, True, 0, 6),
        (70, True, 4, 9), (88, False, 2, 5),
    ]:
        p = tmp_path / f"t{q}{int(sub)}{ri}.jpg"
        p.write_bytes(
            encode_baseline(img, quality=q, subsample=sub,
                            restart_interval=ri)
        )
        dec = jpeg_pixels(p.read_bytes())
        assert dec.shape == (45, 61, 3)
        err = np.abs(dec.astype(int) - img.astype(int)).mean()
        assert err < tol, (q, sub, ri, err)


def test_restart_segments_decode_identically():
    """RSTn markers only re-segment the entropy stream; pixel output must
    be bit-identical to the marker-free encoding."""
    img = _img(37, 53, seed=1)
    base = jpeg_pixels(encode_baseline(img, quality=88))
    for ri in (1, 3, 7):
        got = jpeg_pixels(encode_baseline(img, quality=88,
                                          restart_interval=ri))
        assert np.array_equal(got, base)


def test_grayscale_and_feature_row():
    g = _img(40, 40, seed=2)[:, :, 0]
    enc = encode_baseline(g, quality=90)
    dec = jpeg_pixels(enc)
    assert dec.shape == (40, 40, 1)
    assert np.abs(dec[:, :, 0].astype(int) - g.astype(int)).mean() < 5
    feats = real_decode(enc, "image/jpeg")
    assert feats[0] == 1.0 and len(feats) == 8
    # gray replicated into the three channel means
    assert feats[3] == feats[4] == feats[5]


def test_corrupt_and_unsupported_contract():
    enc = encode_baseline(_img(24, 24), quality=85)
    with pytest.raises(ValueError):
        jpeg_pixels(b"nope")
    with pytest.raises(ValueError):
        jpeg_pixels(b"\xff\xd8\xff\xe0")          # SOI then truncated
    with pytest.raises(ValueError):
        jpeg_pixels(enc[: len(enc) // 2])          # truncated entropy data
    prog = bytearray(enc)
    prog[prog.find(b"\xff\xc0") + 1] = 0xC2        # flip SOF0 -> SOF2
    with pytest.raises(NotImplementedError, match="progressive"):
        jpeg_pixels(bytes(prog))
    arith = bytearray(enc)
    arith[arith.find(b"\xff\xc0") + 1] = 0xC9      # SOF9 arithmetic
    with pytest.raises(NotImplementedError):
        jpeg_pixels(bytes(arith))


def test_dhash_pairs_jpeg_reencode_of_bmp(spark):
    """The planted-JPEG-near-dup e2e: a BMP original, its JPEG re-encode
    (identity content, different container+loss), and a distinct image
    through the REAL media dedup stage — the re-encode must land in the
    original's component and lose survivorship; the distinct image stays
    its own survivor. Corrupt JPEG bytes become a NULL-hash singleton."""
    from data_pipeline_spark.operators.imagedup import media_dedup
    from tests.test_imagedup import _gradient
    from tests.test_multimodal import _encode_bmp

    g = _gradient(64, 48)
    jpeg_bytes = encode_baseline(np.array(g, dtype=np.uint8), quality=90)
    inv = [[(255 - r, 255 - gg, 255 - b) for (r, gg, b) in row] for row in g]
    rows = [
        (1, _encode_bmp(64, 48, g), "image/bmp"),
        (2, jpeg_bytes, "image/jpeg"),          # JPEG re-encode of 1
        (3, _encode_bmp(64, 48, inv), "image/bmp"),  # distinct image
        (4, jpeg_bytes[:40], "image/jpeg"),     # corrupt -> singleton
    ]
    media = spark.createDataFrame(
        rows, "media_id long, content binary, media_type string"
    )
    out = {r["media_id"]: r for r in
           media_dedup(media, max_hamming=8).collect()}
    assert out[1]["component"] == out[2]["component"] == 1
    assert out[1]["is_survivor"] and not out[2]["is_survivor"]
    assert out[3]["component"] == 3 and out[3]["is_survivor"]
    assert out[4]["component"] == 4 and out[4]["is_survivor"]


def test_grayscale_with_declared_sampling_factors():
    """T.81 A.2: a single-component scan is non-interleaved — sampling
    factors are ignored. Some encoders write 2x2 on grayscale; the
    decode must be identical to the 1x1 declaration, not a 4x-grid
    mislay."""
    g = _img(40, 56, seed=4)[:, :, 0]
    enc = bytearray(encode_baseline(g, quality=90))
    i = enc.find(b"\xff\xc0")
    # SOF payload: len(2) prec(1) h(2) w(2) nc(1) then [id, hv, tq]
    hv_off = i + 4 + 6 + 1  # the hv byte of component 1
    assert enc[hv_off] == 0x11
    ref = jpeg_pixels(bytes(enc))
    enc[hv_off] = 0x22  # declare 2x2 sampling on the only component
    got = jpeg_pixels(bytes(enc))
    assert np.array_equal(got, ref)


def test_large_image_codec_is_linear_not_quadratic():
    """Round-5 review fix: the bit reader/writer accumulators are masked
    to their live bits — without that, every shift is O(stream) and a
    512x512 image took minutes (measured 158s decode / 93s encode); with
    the mask both run in ~a second. Generous wall bound so a slow CI
    host never flakes, but a quadratic regression blows it by 10x+."""
    import time

    img = _img(512, 512, seed=9, noise=40)
    t0 = time.monotonic()
    enc = encode_baseline(img, quality=85, subsample=True)
    enc_s = time.monotonic() - t0
    t0 = time.monotonic()
    dec = jpeg_pixels(enc)
    dec_s = time.monotonic() - t0
    assert dec.shape == (512, 512, 3)
    assert enc_s < 20 and dec_s < 20, (enc_s, dec_s)


def test_dqt_emitted_in_zigzag_order():
    """T.81 B.2.4.1: DQT entries are stored in zigzag order. At quality
    50 the Annex K luma table is emitted unscaled, so the DQT payload
    must equal the NATURAL table permuted by the zigzag scan — e.g. the
    3rd zigzag entry is natural (1,0)=12, not the natural-order 3rd
    entry 16 the pre-fix encoder wrote."""
    from data_pipeline_spark.operators.jpeg import _STD_LUMA_Q, _ZZ

    enc = encode_baseline(_img(16, 16, seed=2), quality=50)
    i = enc.find(b"\xff\xdb")
    payload = enc[i + 5 : i + 5 + 64]  # after marker, length, pq/tq byte
    assert list(payload) == list(_STD_LUMA_Q[_ZZ])


def test_fill_bytes_and_standalone_markers_in_header():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker,
    and TEM/RSTn are standalone (no length field). Both are spec-legal
    in real encoder output and must not desync the header parse."""
    img = _img(24, 24, seed=5)
    enc = encode_baseline(img, quality=88)
    ref = jpeg_pixels(enc)
    i = enc.find(b"\xff\xdb")
    padded = enc[:i] + b"\xff\xff\xff" + enc[i:]       # fill bytes
    assert np.array_equal(jpeg_pixels(padded), ref)
    padded = enc[:i] + b"\xff\x01" + enc[i:]           # TEM standalone
    assert np.array_equal(jpeg_pixels(padded), ref)
