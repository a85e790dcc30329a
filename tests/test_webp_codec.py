"""WebP-lossless (VP8L) codec (multimodal/webp.py): decoder vs the
INDEPENDENT minimal encoder (the codecs.py test-pin pattern), covering
every bitstream feature — all four transforms, color cache, LZ77,
meta-huffman groups, sub-byte palette packing — plus the shared
MediaDecodeError corruption contract and the Spark image_features
integration."""

from __future__ import annotations

import numpy as np
import pytest

from valkey_search_spark.multimodal.codecs import MediaDecodeError
from valkey_search_spark.multimodal.webp import (
    _DIST_MAP, decode_webp, encode_webp_lossless)

RNG = np.random.RandomState(42)


def _img(h=11, w=13):
    return RNG.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("kw", [
    {},
    {"subtract_green": True},
    {"cache_bits": 4},
    {"cache_bits": 11},
    {"lz77": True},
    {"two_groups": True},
    {"color_transform": (16, -9, 5)},
    {"color_transform": (-30, 127, -128)},
    {"subtract_green": True, "cache_bits": 3, "lz77": True,
     "two_groups": True},
])
def test_roundtrip_features(kw):
    img = _img()
    assert np.array_equal(decode_webp(encode_webp_lossless(img, **kw)),
                          img)


@pytest.mark.parametrize("mode", list(range(14)))
def test_roundtrip_every_predictor_mode(mode):
    img = _img(9, 18)
    out = decode_webp(encode_webp_lossless(img, predictor_mode=mode))
    assert np.array_equal(out, img)


@pytest.mark.parametrize("n_colors,shape", [
    (2, (6, 19)),     # 1-bit packing, 8 px/byte
    (4, (9, 10)),     # 2-bit packing
    (16, (7, 30)),    # 4-bit packing
    (17, (5, 5)),     # first unpacked size
    (200, (16, 16)),  # wide palette
])
def test_palette_packing(n_colors, shape):
    vals = RNG.randint(0, 256, size=(n_colors, 3), dtype=np.uint8)
    # force all colors present so the palette size is exact
    idx = np.arange(shape[0] * shape[1]) % n_colors
    RNG.shuffle(idx)
    img = vals[idx.reshape(shape)]
    out = decode_webp(encode_webp_lossless(img, palette=True))
    assert np.array_equal(out, img)


def test_lz77_runs_compress_and_roundtrip():
    runs = np.repeat(RNG.randint(0, 256, size=(6, 8, 3), dtype=np.uint8),
                     5, axis=1)
    with_lz = encode_webp_lossless(runs, lz77=True)
    without = encode_webp_lossless(runs, lz77=False)
    assert np.array_equal(decode_webp(with_lz), runs)
    assert len(with_lz) < len(without)


@pytest.mark.parametrize("shape", [(1, 1, 3), (1, 7, 3), (7, 1, 3),
                                   (2, 2, 3), (64, 3, 3)])
def test_degenerate_geometries(shape):
    img = RNG.randint(0, 256, size=shape, dtype=np.uint8)
    assert np.array_equal(decode_webp(encode_webp_lossless(img)), img)
    assert np.array_equal(
        decode_webp(encode_webp_lossless(img, predictor_mode=10)), img)


def test_constant_image_simple_codes():
    # every channel constant -> all five codes take the 1-symbol
    # simple/trivial form (zero bits per pixel)
    img = np.full((20, 20, 3), 77, dtype=np.uint8)
    payload = encode_webp_lossless(img)
    assert np.array_equal(decode_webp(payload), img)
    assert len(payload) < 80


def test_distance_map_matches_spec_prefix():
    # the generator rule must reproduce the spec's table; first 22
    # entries transcribed from the published distance-mapping table
    assert _DIST_MAP[:22] == [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2),
        (-1, 2), (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0),
        (1, 3), (-1, 3), (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2),
        (-3, 2)]
    assert len(_DIST_MAP) == 120
    assert len(set(_DIST_MAP)) == 120
    # every entry must be encodable as the plane-code byte
    # (yoffset << 4) | (8 - xoffset): y in 0..7, x in -7..8
    for x, y in _DIST_MAP:
        assert 0 <= y <= 7 and -7 <= x <= 8, (x, y)
        assert not (y == 0 and x <= 0), (x, y)


def test_corruption_contract():
    img = _img(8, 8)
    good = encode_webp_lossless(img, cache_bits=3)
    # truncation fuzz: every prefix must raise MediaDecodeError, never
    # IndexError/ValueError (the shared codecs contract)
    for cut in range(12, len(good) - 1, 7):
        with pytest.raises(MediaDecodeError):
            decode_webp(good[:cut])
    # flipped container magic
    with pytest.raises(MediaDecodeError):
        decode_webp(b"RIFX" + good[4:])
    # garbage body of the right container shape
    bad = good[:20] + bytes(reversed(good[20:]))
    with pytest.raises(MediaDecodeError):
        decode_webp(bad)


def test_lossy_vp8_points_at_seam():
    body = b"VP8 " + (8).to_bytes(4, "little") + b"\x00" * 8
    riff = b"WEBP" + body
    payload = b"RIFF" + len(riff).to_bytes(4, "little") + riff
    with pytest.raises(MediaDecodeError, match="decode_fn"):
        decode_webp(payload)


def test_image_features_real_decode(spark):
    # the Spark surface: real (fake=False) decode of VP8L payloads
    # through image_features — means must match the numpy source
    from valkey_search_spark.multimodal.columns import image_features

    imgs = [_img(6, 9) for _ in range(4)]
    rows = [(i, bytearray(encode_webp_lossless(im, subtract_green=True)))
            for i, im in enumerate(imgs)]
    df = spark.createDataFrame(rows, "doc_id int, image binary")
    got = {r["doc_id"]: r for r in
           image_features(df, fake=False).collect()}
    for i, im in enumerate(imgs):
        want = [float(im[..., c].mean()) for c in range(3)]
        assert list(got[i]["img_mean"]) == pytest.approx(want, abs=1e-4)


def test_image_features_corrupt_webp_nulls(spark):
    from valkey_search_spark.multimodal.columns import image_features

    ok = encode_webp_lossless(_img(5, 5))
    rows = [(0, bytearray(ok)), (1, bytearray(ok[:30]))]
    df = spark.createDataFrame(rows, "doc_id int, image binary")
    got = {r["doc_id"]: r for r in
           image_features(df, fake=False, on_error="null").collect()}
    assert got[0]["decode_error"] is None
    assert got[1]["img_mean"] is None
    assert "webp" in (got[1]["decode_error"] or "").lower() or \
        "truncated" in (got[1]["decode_error"] or "").lower() or \
        got[1]["decode_error"]


@pytest.mark.parametrize("kw", [
    {"subtract_green": True, "predictor_mode": 7},
    {"subtract_green": True, "color_transform": (12, -7, 3)},
    {"color_transform": (12, -7, 3), "predictor_mode": 2},
    {"subtract_green": True, "color_transform": (5, 9, -4),
     "predictor_mode": 11, "cache_bits": 4, "lz77": True},
])
def test_stacked_transforms_order(kw):
    # multi-transform streams: headers in forward application order,
    # inverses applied reverse-read — the ordering contract that a
    # single-transform round-trip can never catch
    img = _img(10, 14)
    assert np.array_equal(decode_webp(encode_webp_lossless(img, **kw)),
                          img)


@pytest.mark.parametrize("kw", [
    {"palette": True, "predictor_mode": 1},
    {"palette": True, "subtract_green": True},
    {"palette": True, "predictor_mode": 8, "subtract_green": True},
])
def test_transforms_on_packed_palette_image(kw):
    # transforms applied AFTER color-indexing operate at the PACKED
    # width: the decoder must size their block grids and inverse loops
    # at the current (packed) dims, not the final image dims
    vals = RNG.randint(0, 256, size=(4, 3), dtype=np.uint8)  # 2-bit pack
    idx = RNG.randint(0, 4, size=(9, 22))
    img = vals[idx]
    assert np.array_equal(decode_webp(encode_webp_lossless(img, **kw)),
                          img)


def test_vp8x_wrapped_lossless_decodes():
    # cwebp wraps VP8L in a VP8X extended container when metadata rides
    # along; the decoder must skip VP8X/EXIF chunks and find the frame
    img = _img(5, 6)
    plain = encode_webp_lossless(img)
    vp8l_chunk_at = plain.index(b"VP8L")
    inner = plain[vp8l_chunk_at:]
    vp8x = b"VP8X" + (10).to_bytes(4, "little") + bytes(10)
    exif = b"EXIF" + (3).to_bytes(4, "little") + b"abc\x00"  # odd->pad
    body = b"WEBP" + vp8x + exif + inner
    wrapped = b"RIFF" + len(body).to_bytes(4, "little") + body
    assert np.array_equal(decode_webp(wrapped), img)
    from valkey_search_spark.multimodal.webp import has_vp8l
    assert has_vp8l(wrapped) and has_vp8l(plain)
    assert not has_vp8l(b"RIFF\x00\x00\x00\x00WEBPVP8 ")
    # dispatch routes the wrapped payload too
    from valkey_search_spark.multimodal.columns import _decode_image
    assert np.array_equal(_decode_image(wrapped, fake=False), img)


def test_encoder_rejects_oversized_dims():
    img = np.zeros((1, 3, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="14-bit"):
        encode_webp_lossless(np.zeros((1, 20000, 3), dtype=np.uint8))
    assert decode_webp(encode_webp_lossless(img)).shape == (1, 3, 3)
