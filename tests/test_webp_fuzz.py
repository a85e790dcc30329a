"""Property fuzz for the VP8L codec: random images x random encoder
option stacks must round-trip bit-exact, and random byte corruption
must never escape MediaDecodeError."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from valkey_search_spark.multimodal.codecs import MediaDecodeError
from valkey_search_spark.multimodal.webp import (
    decode_webp, encode_webp_lossless)


@st.composite
def _image(draw):
    h = draw(st.integers(1, 24))
    w = draw(st.integers(1, 24))
    seed = draw(st.integers(0, 2**31 - 1))
    palette = draw(st.booleans())
    rng = np.random.RandomState(seed)
    if palette:
        n_colors = draw(st.sampled_from([2, 3, 5, 11, 29]))
        vals = rng.randint(0, 256, size=(n_colors, 3), dtype=np.uint8)
        img = vals[rng.randint(0, n_colors, size=(h, w))]
    else:
        img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    return img, palette


@st.composite
def _options(draw, palette: bool):
    kw = {}
    if palette and draw(st.booleans()):
        kw["palette"] = True
    if draw(st.booleans()):
        kw["subtract_green"] = True
    if draw(st.booleans()):
        kw["color_transform"] = (draw(st.integers(-128, 127)),
                                 draw(st.integers(-128, 127)),
                                 draw(st.integers(-128, 127)))
    if draw(st.booleans()):
        kw["predictor_mode"] = draw(st.integers(0, 13))
    if draw(st.booleans()):
        kw["cache_bits"] = draw(st.integers(1, 8))
    if draw(st.booleans()):
        kw["lz77"] = True
    if draw(st.booleans()):
        kw["two_groups"] = True
    return kw


@given(st.data())
@settings(max_examples=60, deadline=None)
def test_random_option_stacks_roundtrip(data):
    img, palette = data.draw(_image())
    kw = data.draw(_options(palette))
    payload = encode_webp_lossless(img, **kw)
    out = decode_webp(payload)
    assert out.shape == img.shape
    assert np.array_equal(out, img), kw


@given(st.data())
@settings(max_examples=40, deadline=None)
def test_byte_corruption_never_escapes_decode_error(data):
    rng = np.random.RandomState(data.draw(st.integers(0, 999)))
    img = rng.randint(0, 256, size=(6, 7, 3), dtype=np.uint8)
    payload = bytearray(encode_webp_lossless(img, cache_bits=3))
    pos = data.draw(st.integers(12, len(payload) - 1))
    payload[pos] ^= 1 << data.draw(st.integers(0, 7))
    try:
        out = decode_webp(bytes(payload))
        # a flipped bit may still decode (it only changed pixel data);
        # the contract is just: no foreign exception, sane shape
        assert out.dtype == np.uint8 and out.ndim == 3
    except MediaDecodeError:
        pass
