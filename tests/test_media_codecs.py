"""Golden tests for the vendored BMP/WAV codecs and the real-decode path.

Independence of implementations: the BMP fixtures are hand-packed with
struct in this file (not via encode_bmp), and the WAV fixtures are
written with the stdlib ``wave`` module while the decoder parses RIFF
manually — each decode is checked against a second implementation.
"""

import io
import struct
import wave as stdlib_wave

import numpy as np
import pytest
from pyspark.sql import Row

from valkey_search_spark.multimodal.codecs import (
    MediaDecodeError, decode_bmp, decode_wav, encode_bmp, encode_wav,
)
from valkey_search_spark.multimodal.columns import (
    audio_features, image_features, image_resize,
)


def _pack_bmp_24(pixels_rgb, top_down=False):
    """Hand-packed 24-bit BI_RGB BMP, independent of encode_bmp."""
    arr = np.asarray(pixels_rgb, dtype=np.uint8)
    h, w = arr.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = arr if top_down else arr[::-1]
    body = b""
    for r in rows:
        line = bytes(int(v) for px in r for v in px[::-1])   # BGR
        body += line + b"\0" * (stride - len(line))
    off = 54
    hdr = struct.pack("<2sIHHI", b"BM", off + len(body), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, (-h if top_down else h),
                       1, 24, 0, len(body), 0, 0, 0, 0)
    return hdr + info + body


PIXELS = [[[255, 0, 0], [0, 255, 0], [0, 0, 255]],
          [[10, 20, 30], [200, 100, 50], [0, 0, 0]]]     # 2 rows x 3 cols


def test_decode_bmp_bottom_up_with_padding():
    got = decode_bmp(_pack_bmp_24(PIXELS))
    assert got.shape == (2, 3, 3)
    assert got.tolist() == PIXELS


def test_decode_bmp_top_down():
    got = decode_bmp(_pack_bmp_24(PIXELS, top_down=True))
    assert got.tolist() == PIXELS


def test_decode_bmp_32bit():
    arr = np.asarray(PIXELS, dtype=np.uint8)
    h, w = arr.shape[:2]
    body = b""
    for r in arr[::-1]:
        body += bytes(int(v) for px in r for v in (px[2], px[1], px[0], 255))
    hdr = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 32, 0, len(body), 0, 0, 0, 0)
    assert decode_bmp(hdr + info + body).tolist() == PIXELS


def test_encode_decode_bmp_roundtrip():
    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)   # odd width pads
    assert np.array_equal(decode_bmp(encode_bmp(arr)), arr)


@pytest.mark.parametrize("payload", [
    b"",
    b"PNG not a bmp",
    _pack_bmp_24(PIXELS)[:30],                       # truncated header
    _pack_bmp_24(PIXELS)[:-4],                       # truncated pixels
])
def test_decode_bmp_rejects_malformed(payload):
    with pytest.raises(MediaDecodeError):
        decode_bmp(payload)


# ---------------------------------------------------------------------------
def _stdlib_wav(samples: np.ndarray, rate: int, channels: int) -> bytes:
    """Fixture writer using the stdlib wave module (independent of codecs)."""
    buf = io.BytesIO()
    w = stdlib_wave.open(buf, "wb")
    w.setnchannels(channels)
    w.setsampwidth(2)
    w.setframerate(rate)
    w.writeframes(np.clip(samples * 32767.0, -32768, 32767)
                  .astype("<i2").tobytes())
    w.close()
    return buf.getvalue()


def test_decode_wav_mono_16bit():
    t = np.arange(800) / 8000.0
    sig = 0.5 * np.sin(2 * np.pi * 440 * t)
    frames, rate, ch = decode_wav(_stdlib_wav(sig[:, None], 8000, 1))
    assert (rate, ch) == (8000, 1)
    assert frames.shape == (800, 1)
    np.testing.assert_allclose(frames[:, 0], sig, atol=3.0 / 32768)


def test_decode_wav_stereo():
    rng = np.random.default_rng(3)
    sig = rng.uniform(-0.9, 0.9, size=(100, 2))
    frames, rate, ch = decode_wav(_stdlib_wav(sig, 16000, 2))
    assert (rate, ch) == (16000, 2)
    np.testing.assert_allclose(frames, sig, atol=3.0 / 32768)


def test_encode_decode_wav_roundtrip():
    rng = np.random.default_rng(5)
    sig = rng.uniform(-1, 1, size=(64, 2)).astype(np.float32)
    frames, rate, ch = decode_wav(encode_wav(sig, 22050))
    assert (rate, ch) == (22050, 2)
    np.testing.assert_allclose(frames, sig, atol=3.0 / 32768)


def test_decode_wav_rejects_malformed():
    with pytest.raises(MediaDecodeError):
        decode_wav(b"RIFFxxxxNOPE")
    with pytest.raises(MediaDecodeError):
        decode_wav(b"plain bytes")


# ---------------------------------------------------------------------------
# real-decode path through the Spark operators


def test_image_features_real_bmp_vs_numpy(spark):
    rng = np.random.default_rng(11)
    arrs = [rng.integers(0, 256, size=(6, 9, 3), dtype=np.uint8)
            for _ in range(3)]
    df = spark.createDataFrame(
        [Row(id=i, image=bytearray(_pack_bmp_24(a.tolist())))
         for i, a in enumerate(arrs)])
    out = {r["id"]: r for r in
           image_features(df, fake=False).collect()}
    for i, a in enumerate(arrs):
        np.testing.assert_allclose(out[i]["img_mean"], a.mean(axis=(0, 1)),
                                   rtol=1e-9)
        np.testing.assert_allclose(out[i]["img_std"], a.std(axis=(0, 1)),
                                   rtol=1e-9)
        gray = a.mean(axis=2)
        ridx = np.linspace(0, gray.shape[0] - 1, 8).astype(int)
        cidx = np.linspace(0, gray.shape[1] - 1, 8).astype(int)
        thumb = gray[ridx][:, cidx]
        bits = (thumb > thumb.mean()).flatten()
        expect = int(np.int64(np.packbits(bits).view(">u8")[0].astype(np.int64)))
        assert out[i]["img_phash"] == expect


def test_image_resize_real_bmp_non_square(spark):
    rng = np.random.default_rng(13)
    a = rng.integers(0, 256, size=(4, 12, 3), dtype=np.uint8)
    df = spark.createDataFrame([Row(id=0, image=bytearray(_pack_bmp_24(a.tolist())))])
    r = image_resize(df, size=8, fake=False).first()
    assert r["image_resized_meta"]["format"] == "bmp"
    resized = decode_bmp(bytes(r["image_resized"]))
    assert resized.shape == (8, 8, 3)
    # nearest-neighbor reference computed independently
    ridx = np.linspace(0, 3, 8).astype(int)
    cidx = np.linspace(0, 11, 8).astype(int)
    assert np.array_equal(resized, a[ridx][:, cidx])


def test_audio_features_real_wav_vs_numpy(spark):
    t = np.arange(1600) / 16000.0
    sig = 0.25 * np.sin(2 * np.pi * 220 * t)
    df = spark.createDataFrame(
        [Row(id=0, audio=bytearray(_stdlib_wav(sig[:, None], 16000, 1)))])
    r = audio_features(df, fake=False).first()
    wave16 = np.clip(sig * 32767.0, -32768, 32767).astype("<i2") / 32768.0
    assert r["audio_seconds"] == pytest.approx(0.1)
    assert r["audio_rms"] == pytest.approx(
        float(np.sqrt((wave16 ** 2).mean())), rel=1e-6)
    assert r["audio_zcr"] == pytest.approx(
        float((np.diff(np.sign(wave16)) != 0).mean()), rel=1e-6)


def test_non_bmp_payload_still_raises_without_fake():
    from valkey_search_spark.multimodal.columns import _decode_image
    with pytest.raises(NotImplementedError):
        _decode_image(b"\x89PNG\r\n...", fake=False)


# ---------------------------------------------------------------------------
# property-based roundtrips

from hypothesis import given, settings, strategies as st


@settings(max_examples=40, deadline=None)
@given(h=st.integers(1, 24), w=st.integers(1, 24), seed=st.integers(0, 2**31))
def test_bmp_roundtrip_any_shape(h, w, seed):
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(arr)), arr)


@settings(max_examples=40, deadline=None)
@given(n=st.integers(1, 500), ch=st.integers(1, 4),
       rate=st.sampled_from([8000, 16000, 44100]), seed=st.integers(0, 2**31))
def test_wav_roundtrip_any_shape(n, ch, rate, seed):
    rng = np.random.default_rng(seed)
    sig = rng.uniform(-1, 1, size=(n, ch)).astype(np.float32)
    frames, r, c = decode_wav(encode_wav(sig, rate))
    assert (r, c) == (rate, ch)
    assert frames.shape == (n, ch)
    np.testing.assert_allclose(frames, sig, atol=3.0 / 32768)


# ---------------------------------------------------------------------------
# PNG: the test implements the FORWARD filter direction + chunk packing
# independently (struct + zlib here), so decode_png's unfilter path is
# pinned by a second implementation, same strategy as BMP/WAV above.

import zlib

from valkey_search_spark.multimodal.codecs import decode_png, encode_png

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(ctype, data):
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data)))


def _filter_forward(img2d, bpp, ftypes):
    """Apply PNG filters in the ENCODE direction (spec 'Filter Algorithms'
    section), row by row, pure int math — independent of the codec."""
    h, stride = img2d.shape
    out = b""
    prev = [0] * stride
    for y in range(h):
        cur = [int(v) for v in img2d[y]]
        f = ftypes[y % len(ftypes)]
        line = []
        for i in range(stride):
            a = cur[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:                                 # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            line.append((cur[i] - pred) & 0xFF)
        out += bytes([f]) + bytes(line)
        prev = cur
    return out


def _pack_png(arr, color, ftypes, plte=None, depth=8, interlace=0):
    """Hand-packed PNG, independent of encode_png."""
    arr = np.asarray(arr, dtype=np.uint8)
    h = arr.shape[0]
    nch = 1 if arr.ndim == 2 else arr.shape[2]
    w = arr.shape[1]
    flat = arr.reshape(h, w * nch)
    raw = _filter_forward(flat, nch, ftypes)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace)
    body = PNG_SIG + _chunk(b"IHDR", ihdr)
    if plte is not None:
        body += _chunk(b"PLTE", bytes(plte))
    return body + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")


@pytest.mark.parametrize("ftypes", [[0], [1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_png_rgb_all_filters(ftypes):
    rng = np.random.default_rng(42)
    src = rng.integers(0, 256, size=(7, 5, 3), dtype=np.uint8)
    got = decode_png(_pack_png(src, color=2, ftypes=ftypes))
    assert got.shape == (7, 5, 3)
    assert np.array_equal(got, src), f"filters {ftypes}"


def test_png_grayscale_replicates_channels():
    src = np.arange(24, dtype=np.uint8).reshape(4, 6)
    got = decode_png(_pack_png(src, color=0, ftypes=[2, 4]))
    assert got.shape == (4, 6, 3)
    assert np.array_equal(got, np.repeat(src[:, :, None], 3, axis=2))


def test_png_palette():
    pal = [255, 0, 0, 0, 255, 0, 0, 0, 255, 7, 8, 9]      # 4 RGB entries
    idx = np.array([[0, 1], [2, 3], [3, 0]], dtype=np.uint8)
    got = decode_png(_pack_png(idx, color=3, ftypes=[0, 1], plte=pal))
    want = np.array(pal, dtype=np.uint8).reshape(4, 3)[idx]
    assert np.array_equal(got, want)


def test_png_alpha_channels_dropped():
    rng = np.random.default_rng(7)
    rgba = rng.integers(0, 256, size=(5, 4, 4), dtype=np.uint8)
    got = decode_png(_pack_png(rgba, color=6, ftypes=[4]))
    assert np.array_equal(got, rgba[:, :, :3])
    ga = rng.integers(0, 256, size=(3, 3, 2), dtype=np.uint8)
    got = decode_png(_pack_png(ga, color=4, ftypes=[3]))
    assert np.array_equal(got, np.repeat(ga[:, :, :1], 3, axis=2))


def test_png_error_paths():
    src = np.zeros((2, 2, 3), dtype=np.uint8)
    with pytest.raises(MediaDecodeError, match="not a PNG"):
        decode_png(b"JFIF....")
    with pytest.raises(MediaDecodeError, match="interlaced"):
        decode_png(_pack_png(src, color=2, ftypes=[0], interlace=1))
    with pytest.raises(MediaDecodeError, match="bit depth"):
        decode_png(_pack_png(src, color=2, ftypes=[0], depth=16))
    with pytest.raises(MediaDecodeError, match="filter type"):
        decode_png(_pack_png(src, color=2, ftypes=[9]))
    with pytest.raises(MediaDecodeError, match="palette index"):
        decode_png(_pack_png(np.array([[3]], dtype=np.uint8), color=3,
                             ftypes=[0], plte=[1, 2, 3]))
    ok = _pack_png(src, color=2, ftypes=[0])
    with pytest.raises(MediaDecodeError):
        decode_png(ok[:30])                       # truncated chunk
    with pytest.raises(MediaDecodeError, match="zlib"):
        bad = _pack_png(src, color=2, ftypes=[0])
        # corrupt the IDAT payload bytes in place
        i = bad.index(b"IDAT") + 4
        decode_png(bad[:i] + bytes([bad[i] ^ 0xFF]) + bad[i + 1:])


def test_png_encode_decode_round_trip():
    rng = np.random.default_rng(3)
    src = rng.integers(0, 256, size=(11, 9, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(src)), src)


def test_image_features_real_png(spark):
    """image_features(fake=False) over PNG payloads: means/stds match
    numpy computed directly on the source arrays."""
    rng = np.random.default_rng(11)
    arrs = [rng.integers(0, 256, size=(6, 8, 3), dtype=np.uint8)
            for _ in range(3)]
    rows = [Row(id=i, image=bytearray(_pack_png(a, color=2,
                                                ftypes=[0, 1, 2, 3, 4])))
            for i, a in enumerate(arrs)]
    df = spark.createDataFrame(rows)
    got = {r["id"]: r for r in
           image_features(df, fake=False).collect()}
    for i, a in enumerate(arrs):
        want = a.mean(axis=(0, 1))
        np.testing.assert_allclose(got[i]["img_mean"], want, rtol=1e-9)
        np.testing.assert_allclose(got[i]["img_std"], a.std(axis=(0, 1)),
                                   rtol=1e-9)


def test_image_features_mixed_bmp_png(spark):
    """The real decode seam routes per-payload by signature: BMP and PNG
    rows in the SAME column both decode."""
    a = np.full((4, 4, 3), 9, dtype=np.uint8)
    rows = [Row(id=0, image=bytearray(_pack_bmp_24(a))),
            Row(id=1, image=bytearray(_pack_png(a, color=2, ftypes=[1])))]
    got = image_features(spark.createDataFrame(rows), fake=False).collect()
    for r in got:
        np.testing.assert_allclose(r["img_mean"], [9.0, 9.0, 9.0])
