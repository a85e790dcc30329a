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
    # interlace flag set but sequential-layout data: pass sizes disagree
    with pytest.raises(MediaDecodeError, match="data size"):
        decode_png(_pack_png(src, color=2, ftypes=[0], interlace=1))
    with pytest.raises(MediaDecodeError, match="interlace method"):
        decode_png(_pack_png(src, color=2, ftypes=[0], interlace=2))
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


# ---------------------------------------------------------------------------
# JPEG: the test implements the FORWARD pipeline (RGB->YCbCr, optional
# 2x2 subsampling, FDCT, quantization, run-length + canonical Huffman
# encoding, byte stuffing, restart markers) independently of the codec,
# which implements only the inverse. Huffman tables are generated
# fixed-length canonical tables carried in DHT — table CONTENTS need not
# match Annex K for a valid stream, which keeps this encoder fully
# self-contained.

from valkey_search_spark.multimodal.codecs import decode_jpeg

_QL = np.array([  # luminance quant (spec Annex K.1)
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)
_QC = np.array([  # chrominance quant (Annex K.2)
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)

_ZZ = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63])

_C = np.array([[(np.sqrt(0.5) if u == 0 else 1.0) / 2.0
                * np.cos((2 * x + 1) * u * np.pi / 16.0)
                for x in range(8)] for u in range(8)])


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code, length):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)        # byte stuffing
                self.acc = 0
                self.n = 0

    def align(self):
        while self.n:
            self.put(1, 1)                       # pad with 1s


def _mag(v):
    """(category, code-bits) for a DC diff / AC coefficient."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    return s, (v if v > 0 else v + (1 << s) - 1)


def _huff(symbols):
    """Fixed-length canonical table: (bits16, vals, {sym: (len, code)})."""
    syms = sorted(set(symbols))
    length = 2
    while (1 << length) <= len(syms):
        length += 1
    bits = [0] * 16
    bits[length - 1] = len(syms)
    return (bytes(bits), bytes(syms),
            {s: (length, i) for i, s in enumerate(syms)})


def _blocks(plane):
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    p = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    for y in range(0, ph, 8):
        for x in range(0, pw, 8):
            yield p[y:y + 8, x:x + 8]


def _encode_jpeg(rgb=None, gray=None, subsample=False, restart=0,
                 color="ycbcr"):
    """Forward baseline-JPEG pipeline, independent of codecs.decode_jpeg.
    ``color="rgb"`` stores the R,G,B planes directly as the three
    components (no BT.601) — the TIFF photometric-2 stream shape."""
    if gray is not None:
        planes = [gray.astype(np.float64)]
        qts = [(_QL, 0)]
        comp_hv = [(1, 1)]
    elif color == "rgb":
        planes = [rgb[:, :, i].astype(np.float64) for i in range(3)]
        qts = [(_QL, 0)] * 3
        comp_hv = [(1, 1)] * 3
    else:
        r, g, b = [rgb[:, :, i].astype(np.float64) for i in range(3)]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            h2 = (cb.shape[0] // 2) * 2
            w2 = (cb.shape[1] // 2) * 2
            cb = cb[:h2, :w2].reshape(h2 // 2, 2, w2 // 2, 2).mean((1, 3))
            cr = cr[:h2, :w2].reshape(h2 // 2, 2, w2 // 2, 2).mean((1, 3))
            comp_hv = [(2, 2), (1, 1), (1, 1)]
        else:
            comp_hv = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qts = [(_QL, 0), (_QC, 1), (_QC, 1)]

    # quantized zigzag blocks per component, in MCU interleave order
    h, w = planes[0].shape
    hmax = max(hh for hh, _ in comp_hv)
    vmax = max(vv for _, vv in comp_hv)
    mcus_x, mcus_y = -(-w // (8 * hmax)), -(-h // (8 * vmax))

    padded = []
    for p, (hh, vv) in zip(planes, comp_hv):
        ph, pw = mcus_y * vv * 8, mcus_x * hh * 8
        padded.append(np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
                             mode="edge"))

    def quantize(block, q):
        coef = _C @ (block - 128.0) @ _C.T
        return np.round(coef / q).astype(np.int64).reshape(64)[_ZZ]

    # first pass: gather symbols (to build the tables), second: emit
    mcu_units = []                        # [(comp_idx, zigzag_coeffs)]
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, (hh, vv) in enumerate(comp_hv):
                for by in range(vv):
                    for bx in range(hh):
                        yb = (my * vv + by) * 8
                        xb = (mx * hh + bx) * 8
                        block = padded[ci][yb:yb + 8, xb:xb + 8]
                        mcu_units.append(
                            (ci, quantize(block, qts[ci][0])))

    def unit_symbols(units, restart):
        dc_syms, ac_syms = [[], []], [[], []]
        pred = [0] * len(comp_hv)
        per_mcu = sum(hh * vv for hh, vv in comp_hv)
        for i, (ci, zz) in enumerate(units):
            if restart and i and (i // per_mcu) % restart == 0 \
                    and i % per_mcu == 0:
                pred = [0] * len(comp_hv)
            t = min(ci, 1)
            s, _ = _mag(int(zz[0]) - pred[ci])
            pred[ci] = int(zz[0])
            dc_syms[t].append(s)
            run = 0
            for k in range(1, 64):
                if zz[k] == 0:
                    run += 1
                    continue
                while run > 15:
                    ac_syms[t].append(0xF0)
                    run -= 16
                s, _ = _mag(int(zz[k]))
                ac_syms[t].append((run << 4) | s)
                run = 0
            if run:
                ac_syms[t].append(0x00)
        return dc_syms, ac_syms

    dc_syms, ac_syms = unit_symbols(mcu_units, restart)
    ntab = 1 if gray is not None else 2
    dc_tabs = [_huff(dc_syms[t] or [0]) for t in range(ntab)]
    ac_tabs = [_huff(ac_syms[t] or [0]) for t in range(ntab)]

    bw = _BitWriter()
    pred = [0] * len(comp_hv)
    per_mcu = sum(hh * vv for hh, vv in comp_hv)
    body = bytearray()
    rst = 0
    for i, (ci, zz) in enumerate(mcu_units):
        if restart and i and (i // per_mcu) % restart == 0 \
                and i % per_mcu == 0:
            bw.align()
            body += bw.out
            body += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            bw = _BitWriter()
            pred = [0] * len(comp_hv)
        t = min(ci, 1)
        s, code = _mag(int(zz[0]) - pred[ci])
        pred[ci] = int(zz[0])
        ln, c = dc_tabs[t][2][s]
        bw.put(c, ln)
        bw.put(code, s)
        run = 0
        for k in range(1, 64):
            if zz[k] == 0:
                run += 1
                continue
            while run > 15:
                ln, c = ac_tabs[t][2][0xF0]
                bw.put(c, ln)
                run -= 16
            s, code = _mag(int(zz[k]))
            ln, c = ac_tabs[t][2][(run << 4) | s]
            bw.put(c, ln)
            bw.put(code, s)
            run = 0
        if run:
            ln, c = ac_tabs[t][2][0x00]
            bw.put(c, ln)
    bw.align()
    body += bw.out

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) \
            + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0]) + bytes(_QL.reshape(64)[_ZZ].astype(np.uint8)))
    if gray is None:
        out += seg(0xDB, bytes([1]) + bytes(_QC.reshape(64)[_ZZ].astype(np.uint8)))
    ncomp = 1 if gray is not None else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci, (hh, vv) in enumerate(comp_hv):
        sof += bytes([ci + 1, (hh << 4) | vv, qts[ci][1]])
    out += seg(0xC0, sof)
    for t in range(ntab):
        out += seg(0xC4, bytes([t]) + dc_tabs[t][0] + dc_tabs[t][1])
        out += seg(0xC4, bytes([0x10 | t]) + ac_tabs[t][0] + ac_tabs[t][1])
    if restart:
        out += seg(0xDD, struct.pack(">H", restart))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        t = min(ci, 1)
        sos += bytes([ci + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += body
    out += b"\xff\xd9"
    return bytes(out)


def test_jpeg_constant_blocks_near_exact():
    """Block-constant images are DC-only: quantization error bounds the
    round-trip to ~1 intensity level."""
    src = np.zeros((16, 24, 3), dtype=np.uint8)
    src[:8, :, :] = [200, 40, 90]
    src[8:, :, :] = [10, 180, 60]
    got = decode_jpeg(_encode_jpeg(rgb=src))
    assert got.shape == src.shape
    assert np.abs(got.astype(int) - src.astype(int)).max() <= 3


def test_jpeg_smooth_gradient_444():
    yy, xx = np.mgrid[0:32, 0:32]
    src = np.stack([(yy * 4) % 256, (xx * 4) % 256,
                    ((yy + xx) * 2) % 256], axis=2).astype(np.uint8)
    got = decode_jpeg(_encode_jpeg(rgb=src))
    diff = np.abs(got.astype(int) - src.astype(int))
    assert diff.mean() < 4 and diff.max() <= 40


def test_jpeg_420_subsampled():
    yy, xx = np.mgrid[0:24, 0:40]
    src = np.stack([100 + yy * 2, 80 + xx, 120 + yy], axis=2
                   ).astype(np.uint8)
    got = decode_jpeg(_encode_jpeg(rgb=src, subsample=True))
    assert got.shape == src.shape
    diff = np.abs(got.astype(int) - src.astype(int))
    assert diff.mean() < 6 and diff.max() <= 60


def test_jpeg_grayscale():
    g = np.tile(np.arange(0, 256, 8, dtype=np.uint8), (16, 1))
    got = decode_jpeg(_encode_jpeg(gray=g))
    assert got.shape == (16, 32, 3)
    assert np.abs(got[:, :, 0].astype(int) - g.astype(int)).mean() < 4
    assert np.array_equal(got[:, :, 0], got[:, :, 1])


def test_jpeg_restart_markers():
    rng = np.random.default_rng(5)
    src = rng.integers(60, 200, size=(16, 64, 3), dtype=np.uint8)
    plain = decode_jpeg(_encode_jpeg(rgb=src))
    with_rst = decode_jpeg(_encode_jpeg(rgb=src, restart=2))
    assert np.array_equal(plain, with_rst)   # restarts change framing only


def test_jpeg_odd_dimensions_cropped():
    src = np.full((9, 13, 3), 77, dtype=np.uint8)
    got = decode_jpeg(_encode_jpeg(rgb=src))
    assert got.shape == (9, 13, 3)
    assert np.abs(got.astype(int) - 77).max() <= 2


def test_jpeg_error_paths():
    with pytest.raises(MediaDecodeError, match="not a JPEG"):
        decode_jpeg(b"\x89PNG....")
    ok = bytearray(_encode_jpeg(rgb=np.zeros((8, 8, 3), dtype=np.uint8)))
    with pytest.raises(MediaDecodeError):
        decode_jpeg(bytes(ok[:40]))          # truncated before SOS
    i = bytes(ok).index(bytes([0xFF, 0xC0]))
    prog = ok.copy()
    prog[i + 1] = 0xC2      # SOF2 flag with a baseline-shaped scan header
    with pytest.raises(MediaDecodeError, match="Se != 0"):
        decode_jpeg(bytes(prog))            # Ss=0/Se=63 is not a DC scan
    arith = ok.copy()
    arith[i + 1] = 0xC9                      # arithmetic-coded: still raises
    with pytest.raises(MediaDecodeError, match="frame type"):
        decode_jpeg(bytes(arith))


def test_image_features_real_jpeg(spark):
    src = np.full((8, 8, 3), 99, dtype=np.uint8)
    rows = [Row(id=0, image=bytearray(_encode_jpeg(rgb=src)))]
    got = image_features(spark.createDataFrame(rows), fake=False).collect()
    np.testing.assert_allclose(got[0]["img_mean"], [99.0] * 3, atol=2)


# ---------------------------------------------------------------------------
# GIF: decoder pinned by an INDEPENDENT forward LZW compressor (the
# canonical unix-compress scheme: emit with current width, then add the
# new string and widen when the next free code would not fit — matching
# the decoder's read-side widening one code later)

from valkey_search_spark.multimodal.codecs import decode_gif, decode_tiff


class _BitPackerLSB:
    def __init__(self):
        self.bits = []

    def put(self, code, width):
        for b in range(width):
            self.bits.append((code >> b) & 1)

    def tobytes(self):
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            byte = 0
            for j, bit in enumerate(self.bits[i:i + 8]):
                byte |= bit << j
            out.append(byte)
        return bytes(out)


def _lzw_encode(indices, min_code_size, clear_every=None):
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    pk = _BitPackerLSB()

    def reset():
        return ({bytes([i]): i for i in range(clear)}, end + 1,
                min_code_size + 1)

    table, next_code, width = reset()
    pk.put(clear, width)
    prev = b""
    emitted = 0
    for px in indices:
        cur = prev + bytes([int(px)])
        if cur in table:
            prev = cur
            continue
        pk.put(table[prev], width)
        emitted += 1
        if next_code < 4096:
            table[cur] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        prev = bytes([int(px)])
        if clear_every and emitted % clear_every == 0:
            pk.put(clear, width)
            table, next_code, width = reset()
    if prev:
        pk.put(table[prev], width)
    pk.put(end, width)
    return pk.tobytes()


def _subblocks(data):
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _pack_gif(img_rgb, palette, interlaced=False, local_table=False,
              min_code_size=None, clear_every=None, extensions=True):
    """img_rgb: (H, W, 3); palette: (N, 3) covering every pixel value."""
    h, w = img_rgb.shape[:2]
    pal = np.asarray(palette, dtype=np.uint8)
    lut = {tuple(c): i for i, c in enumerate(pal)}
    idx = np.array([lut[tuple(px)] for px in img_rgb.reshape(-1, 3)],
                   dtype=np.uint8)
    if interlaced:
        order = [r for start, step in ((0, 8), (4, 8), (2, 4), (1, 2))
                 for r in range(start, h, step)]
        idx = idx.reshape(h, w)[order].reshape(-1)
    size_field = max(1, int(np.ceil(np.log2(len(pal)))) ) - 1 \
        if len(pal) > 2 else 0
    while (2 << size_field) < len(pal):
        size_field += 1
    n_entries = 2 << size_field
    table_bytes = np.vstack([pal, np.zeros((n_entries - len(pal), 3),
                                           np.uint8)]).tobytes()
    mcs = min_code_size or max(2, size_field + 1)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    if local_table:
        out += bytes([0x00, 0, 0])             # no global table
    else:
        out += bytes([0x80 | size_field, 0, 0])
        out += table_bytes
    if extensions:
        # graphic control extension + a comment, both skippable
        out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"
        out += b"\x21\xfe\x05hello\x00"
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h)
    out += bytes([(0x80 | size_field if local_table else 0)
                  | (0x40 if interlaced else 0)])
    if local_table:
        out += table_bytes
    out += bytes([mcs])
    out += _subblocks(_lzw_encode(idx, mcs, clear_every=clear_every))
    out += b"\x3b"
    return bytes(out)


_PAL8 = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255],
                  [255, 255, 0], [0, 255, 255], [255, 0, 255],
                  [255, 255, 255]], dtype=np.uint8)


def test_decode_gif_simple_roundtrip():
    rng = np.random.default_rng(7)
    img = _PAL8[rng.integers(0, 8, size=(11, 13))]
    got = decode_gif(_pack_gif(img, _PAL8))
    np.testing.assert_array_equal(got, img)


def test_decode_gif_interlaced_and_local_table():
    rng = np.random.default_rng(8)
    img = _PAL8[rng.integers(0, 8, size=(17, 9))]
    np.testing.assert_array_equal(
        decode_gif(_pack_gif(img, _PAL8, interlaced=True)), img)
    np.testing.assert_array_equal(
        decode_gif(_pack_gif(img, _PAL8, local_table=True)), img)


def test_decode_gif_midstream_clear_codes():
    rng = np.random.default_rng(9)
    img = _PAL8[rng.integers(0, 8, size=(16, 16))]
    np.testing.assert_array_equal(
        decode_gif(_pack_gif(img, _PAL8, clear_every=40)), img)


def test_decode_gif_code_width_growth():
    # 64x64 random over a 256-color palette forces the code width well
    # past its initial value (hundreds of table entries)
    rng = np.random.default_rng(10)
    pal = rng.integers(0, 256, size=(256, 3), dtype=np.uint8)
    pal = np.unique(pal, axis=0)
    img = pal[rng.integers(0, len(pal), size=(64, 64))]
    np.testing.assert_array_equal(decode_gif(_pack_gif(img, pal)), img)


def test_decode_gif_rejects_malformed():
    for payload in (b"GIF89a", b"NOTGIF" + b"\0" * 20,
                    b"GIF89a" + struct.pack("<HH", 2, 2) + b"\0\0\0\x3b"):
        with pytest.raises(ValueError):
            decode_gif(payload)


@given(st.integers(1, 24), st.integers(1, 24), st.integers(0, 2**32 - 1))
@settings(max_examples=20, deadline=None)
def test_gif_roundtrip_any_shape(h, w, seed):
    rng = np.random.default_rng(seed)
    img = _PAL8[rng.integers(0, 8, size=(h, w))]
    np.testing.assert_array_equal(decode_gif(_pack_gif(img, _PAL8)), img)


# ---------------------------------------------------------------------------
# TIFF: hand-packed IFDs, both byte orders, strip splits, photometric


def _pack_tiff(img, bo="<", strips=1, photometric=None, compression=1):
    """img: (H, W) gray or (H, W, C); 8-bit chunky baseline TIFF."""
    h, w = img.shape[:2]
    spp = 1 if img.ndim == 2 else img.shape[2]
    if photometric is None:
        photometric = 2 if spp >= 3 else 1
    data = (255 - img if photometric == 0 else img).astype(np.uint8).tobytes()
    rows_per_strip = -(-h // strips)
    strip_bytes = rows_per_strip * w * spp
    chunks = [data[i:i + strip_bytes] for i in range(0, len(data), strip_bytes)]

    entries = []                     # (tag, type, count, value-or-bytes)
    def short(tag, v):
        entries.append((tag, 3, 1, struct.pack(bo + "HH", v, 0)))

    short(256, w); short(257, h)
    if spp * 2 <= 4:
        entries.append((258, 3, spp,
                        struct.pack(bo + "H" * spp + "H" * (2 - spp % 2) if spp == 1
                                    else bo + "HH", *( [8] * spp + [0] if spp == 1 else [8, 8]))))
    short(259, compression); short(262, photometric); short(277, spp)
    short(278, rows_per_strip)

    # layout: header(8) + IFD + external arrays + strip data
    n_ext = []                       # (tag, type, count, payload bytes)
    if spp > 2:
        n_ext.append((258, 3, spp, struct.pack(bo + "H" * spp, *([8] * spp))))
    ifd_entries = len(entries) + 2 + len(n_ext)
    ifd_size = 2 + ifd_entries * 12 + 4
    ext_off = 8 + ifd_size
    ext_blob = bytearray()
    ext_offsets = {}
    for tag, typ, cnt, payload in n_ext:
        ext_offsets[tag] = ext_off + len(ext_blob)
        ext_blob += payload
    # strip offset/count arrays (after ext blob)
    arr_off = ext_off + len(ext_blob)
    n = len(chunks)
    so_bytes = struct.pack(bo + "I" * n, *[0] * n)   # placeholder
    sc_bytes = struct.pack(bo + "I" * n, *[len(c) for c in chunks])
    if n == 1:
        data_off = arr_off
    else:
        data_off = arr_off + len(so_bytes) + len(sc_bytes)
    offs = []
    cur = data_off
    for c in chunks:
        offs.append(cur)
        cur += len(c)
    so_bytes = struct.pack(bo + "I" * n, *offs)

    all_entries = list(entries)
    for tag, typ, cnt, payload in n_ext:
        all_entries.append((tag, typ, cnt,
                            struct.pack(bo + "I", ext_offsets[tag])))
    if n == 1:
        all_entries.append((273, 4, 1, struct.pack(bo + "I", offs[0])))
        all_entries.append((279, 4, 1, struct.pack(bo + "I", len(chunks[0]))))
    else:
        all_entries.append((273, 4, n, struct.pack(bo + "I", arr_off)))
        all_entries.append((279, 4, n,
                            struct.pack(bo + "I", arr_off + len(so_bytes))))
    all_entries.sort()

    out = bytearray()
    out += (b"II" if bo == "<" else b"MM") + struct.pack(bo + "H", 42)
    out += struct.pack(bo + "I", 8)
    out += struct.pack(bo + "H", len(all_entries))
    for tag, typ, cnt, val in all_entries:
        out += struct.pack(bo + "HHI", tag, typ, cnt) + val[:4].ljust(4, b"\0")
    out += struct.pack(bo + "I", 0)
    out += ext_blob
    if n > 1:
        out += so_bytes + sc_bytes
    for c in chunks:
        out += c
    return bytes(out)


def test_decode_tiff_rgb_both_endiannesses():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(5, 4, 3), dtype=np.uint8)
    for bo in ("<", ">"):
        np.testing.assert_array_equal(decode_tiff(_pack_tiff(img, bo=bo)), img)


def test_decode_tiff_multi_strip():
    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, size=(9, 6, 3), dtype=np.uint8)
    np.testing.assert_array_equal(
        decode_tiff(_pack_tiff(img, strips=3)), img)


def test_decode_tiff_gray_and_miniswhite():
    rng = np.random.default_rng(13)
    gray = rng.integers(0, 256, size=(7, 5), dtype=np.uint8)
    got = decode_tiff(_pack_tiff(gray, photometric=1))
    np.testing.assert_array_equal(got, np.repeat(gray[:, :, None], 3, axis=2))
    got_w = decode_tiff(_pack_tiff(gray, photometric=0))
    np.testing.assert_array_equal(got_w, got)     # inversion round-trips


def test_decode_tiff_rejects_compressed_and_malformed():
    img = np.zeros((3, 3, 3), dtype=np.uint8)
    with pytest.raises(ValueError):
        decode_tiff(_pack_tiff(img, compression=5))      # LZW: the PIL seam
    with pytest.raises(ValueError):
        decode_tiff(b"II*\x00\x08\x00\x00")               # truncated
    with pytest.raises(ValueError):
        decode_tiff(b"XX\x2a\x00" + b"\0" * 16)


def test_image_features_real_gif_tiff(spark):
    """The Spark real-decode path handles GIF and TIFF payloads."""
    rng = np.random.default_rng(14)
    img = _PAL8[rng.integers(0, 8, size=(6, 6))]
    timg = rng.integers(0, 256, size=(6, 6, 3), dtype=np.uint8)
    df = spark.createDataFrame([
        Row(id=1, image=bytearray(_pack_gif(img, _PAL8))),
        Row(id=2, image=bytearray(_pack_tiff(timg))),
    ])
    out = {r["id"]: r for r in image_features(df, fake=False).collect()}
    np.testing.assert_allclose(out[1]["img_mean"], img.mean(axis=(0, 1)))
    np.testing.assert_allclose(out[2]["img_mean"], timg.mean(axis=(0, 1)))


# ---------------------------------------------------------------------------
# compressed TIFF: PackBits + TIFF-LZW, pinned by independent FORWARD
# encoders (MSB-first packing, spec early-change width growth)


def _packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        # find run length at i
        j = i
        while j + 1 < n and data[j + 1] == data[i] and j - i < 127:
            j += 1
        run = j - i + 1
        if run >= 2:
            out += bytes([257 - run, data[i]])
            i = j + 1
        else:
            # literal stretch until next >=3 run (2-runs inside literals
            # are legal and exercise the decoder's literal path)
            k = i
            while (k + 2 < n and not (data[k + 1] == data[k + 2] == data[k])
                   and k - i < 126):
                k += 1
            lit = data[i:k + 1]
            out += bytes([len(lit) - 1]) + lit
            i = k + 1
    return bytes(out)


def _tiff_lzw_encode(data: bytes) -> bytes:
    CLEAR, EOI = 256, 257
    bits = []

    def put(code, width):
        for b in range(width - 1, -1, -1):       # MSB first
            bits.append((code >> b) & 1)

    def reset():
        return {bytes([i]): i for i in range(256)}, EOI + 1, 9

    table, next_code, width = reset()
    put(CLEAR, width)
    prev = b""
    for byte in data:
        cur = prev + bytes([byte])
        if cur in table:
            prev = cur
            continue
        put(table[prev], width)
        if next_code < 4096:
            table[cur] = next_code
            next_code += 1
            if next_code == (1 << width) and width < 12:   # early change
                width += 1
        prev = bytes([byte])
    if prev:
        put(table[prev], width)
    put(EOI, width)
    out = bytearray()
    for i in range(0, len(bits), 8):
        byte = 0
        for j, bit in enumerate(bits[i:i + 8]):
            byte |= bit << (7 - j)
        out.append(byte)
    return bytes(out)


def _pack_tiff_compressed(img, compression, strips=1, predictor=1, bo="<"):
    """Reuses _pack_tiff's IFD layout by post-hoc strip compression is
    fiddly; build directly with per-strip compressed payloads."""
    h, w = img.shape[:2]
    spp = 1 if img.ndim == 2 else img.shape[2]
    work = img.reshape(h, w, spp).astype(np.uint8)
    if predictor == 2:
        d = work.astype(np.int64)
        d[:, 1:] = (d[:, 1:] - d[:, :-1]) % 256
        work = d.astype(np.uint8)
    rows_per_strip = -(-h // strips)
    enc = {5: _tiff_lzw_encode, 32773: _packbits_encode, 1: bytes}[compression]
    chunks = [enc(work[r:r + rows_per_strip].tobytes())
              for r in range(0, h, rows_per_strip)]

    entries = []
    def short(tag, v):
        entries.append((tag, 3, 1, struct.pack(bo + "HH", v, 0)))
    short(256, w); short(257, h); short(259, compression)
    short(262, 2 if spp >= 3 else 1); short(277, spp)
    short(278, rows_per_strip)
    if predictor != 1:
        short(317, predictor)
    if spp == 1:
        entries.append((258, 3, 1, struct.pack(bo + "HH", 8, 0)))

    n = len(chunks)
    ext = bytearray()
    ifd_n = len(entries) + 2 + (1 if spp > 2 else 0)
    base = 8 + 2 + ifd_n * 12 + 4
    if spp > 2:
        entries.append((258, 3, spp, struct.pack(bo + "I", base + len(ext))))
        ext += struct.pack(bo + "H" * spp, *([8] * spp))
    if n == 1:
        data_off = base + len(ext)
        entries.append((273, 4, 1, struct.pack(bo + "I", data_off)))
        entries.append((279, 4, 1, struct.pack(bo + "I", len(chunks[0]))))
    else:
        so_off = base + len(ext)
        sc_off = so_off + 4 * n
        data_off = sc_off + 4 * n
        offs = []
        cur = data_off
        for c in chunks:
            offs.append(cur); cur += len(c)
        ext += struct.pack(bo + "I" * n, *offs)
        ext += struct.pack(bo + "I" * n, *[len(c) for c in chunks])
        entries.append((273, 4, n, struct.pack(bo + "I", so_off)))
        entries.append((279, 4, n, struct.pack(bo + "I", sc_off)))
    entries.sort()
    out = bytearray()
    out += (b"II" if bo == "<" else b"MM") + struct.pack(bo + "H", 42)
    out += struct.pack(bo + "I", 8)
    out += struct.pack(bo + "H", len(entries))
    for tag, typ, cnt, val in entries:
        out += struct.pack(bo + "HHI", tag, typ, cnt) + val[:4].ljust(4, b"\0")
    out += struct.pack(bo + "I", 0)
    out += ext
    for c in chunks:
        out += c
    return bytes(out)


def test_decode_tiff_packbits():
    rng = np.random.default_rng(20)
    # runs + literals: low-entropy image exercises both packet kinds
    img = (rng.integers(0, 4, size=(9, 7, 3)) * 80).astype(np.uint8)
    got = decode_tiff(_pack_tiff_compressed(img, 32773, strips=2))
    np.testing.assert_array_equal(got, img)


def test_decode_tiff_lzw():
    rng = np.random.default_rng(21)
    img = rng.integers(0, 256, size=(12, 11, 3), dtype=np.uint8)
    for strips in (1, 3):
        got = decode_tiff(_pack_tiff_compressed(img, 5, strips=strips))
        np.testing.assert_array_equal(got, img, err_msg=f"strips={strips}")


def test_decode_tiff_lzw_width_growth():
    # enough distinct strings to push the code width past 9/10 bits and
    # cross the EARLY-CHANGE boundaries (510/1022)
    rng = np.random.default_rng(22)
    img = rng.integers(0, 256, size=(48, 40, 3), dtype=np.uint8)
    np.testing.assert_array_equal(
        decode_tiff(_pack_tiff_compressed(img, 5)), img)


def test_decode_tiff_lzw_predictor():
    rng = np.random.default_rng(23)
    # smooth gradient: the case horizontal differencing exists for
    base = np.linspace(0, 200, 15, dtype=np.uint8)
    img = (base[None, :, None] + rng.integers(0, 3, (10, 15, 3))).astype(np.uint8)
    got = decode_tiff(_pack_tiff_compressed(img, 5, predictor=2))
    np.testing.assert_array_equal(got, img)
    gray = rng.integers(0, 256, size=(6, 9), dtype=np.uint8)
    got = decode_tiff(_pack_tiff_compressed(gray, 5, predictor=2))
    np.testing.assert_array_equal(got, np.repeat(gray[:, :, None], 3, 2))


@given(st.integers(1, 16), st.integers(1, 16), st.integers(0, 2**32 - 1),
       st.sampled_from([1, 5, 32773]))
@settings(max_examples=20, deadline=None)
def test_tiff_roundtrip_any_shape_any_compression(h, w, seed, comp):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    np.testing.assert_array_equal(
        decode_tiff(_pack_tiff_compressed(img, comp)), img)


# ---------------------------------------------------------------------------
# Adam7 interlaced PNG: forward interlacer + per-pass filtering written
# here independently of the codec

_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _pack_png_adam7(arr, color, ftypes, plte=None):
    arr = np.asarray(arr, dtype=np.uint8)
    h = arr.shape[0]
    nch = 1 if arr.ndim == 2 else arr.shape[2]
    w = arr.shape[1]
    grid = arr.reshape(h, w, nch)
    raw = b""
    for x0, y0, dx, dy in _ADAM7:
        sub = grid[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        ph, pw = sub.shape[:2]
        raw += _filter_forward(sub.reshape(ph, pw * nch), nch, ftypes)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 1)
    body = PNG_SIG + _chunk(b"IHDR", ihdr)
    if plte is not None:
        body += _chunk(b"PLTE", bytes(plte))
    return body + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")


@pytest.mark.parametrize("ftypes", [[0], [4], [0, 1, 2, 3, 4]])
def test_png_adam7_rgb(ftypes):
    rng = np.random.default_rng(30)
    src = rng.integers(0, 256, size=(13, 11, 3), dtype=np.uint8)
    np.testing.assert_array_equal(
        decode_png(_pack_png_adam7(src, color=2, ftypes=ftypes)), src)


def test_png_adam7_small_and_odd_shapes():
    # shapes where several passes are EMPTY (w or h below the pass grid)
    rng = np.random.default_rng(31)
    for h, w in [(1, 1), (2, 3), (5, 1), (8, 8), (9, 17), (3, 4)]:
        src = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        np.testing.assert_array_equal(
            decode_png(_pack_png_adam7(src, color=2, ftypes=[2])), src,
            err_msg=f"{h}x{w}")


def test_png_adam7_palette_and_gray():
    rng = np.random.default_rng(32)
    pal = bytes(range(48))                        # 16 RGB entries
    idx = rng.integers(0, 16, size=(10, 7), dtype=np.uint8)
    got = decode_png(_pack_png_adam7(idx, color=3, ftypes=[1], plte=pal))
    want = np.frombuffer(pal, np.uint8).reshape(16, 3)[idx]
    np.testing.assert_array_equal(got, want)
    gray = rng.integers(0, 256, size=(6, 9), dtype=np.uint8)
    got = decode_png(_pack_png_adam7(gray, color=0, ftypes=[3]))
    np.testing.assert_array_equal(got, np.repeat(gray[:, :, None], 3, 2))


@given(st.integers(1, 20), st.integers(1, 20), st.integers(0, 2**32 - 1))
@settings(max_examples=20, deadline=None)
def test_png_adam7_roundtrip_any_shape(h, w, seed):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    np.testing.assert_array_equal(
        decode_png(_pack_png_adam7(src, color=2, ftypes=[0, 4])), src)


# ---------------------------------------------------------------------------
# progressive JPEG: independent FORWARD progressive encoder (spectral
# selection + successive approximation + EOB runs, structured after the
# spec's encode procedures) pinning codecs' multi-scan decoder


def _prog_planes(rgb, gray, subsample):
    """Plane prep + quantized zigzag block grids (mirrors _encode_jpeg)."""
    if gray is not None:
        planes, qts, comp_hv = [gray.astype(np.float64)], [(_QL, 0)], [(1, 1)]
    else:
        r, g, b = [rgb[:, :, i].astype(np.float64) for i in range(3)]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            h2, w2 = (cb.shape[0] // 2) * 2, (cb.shape[1] // 2) * 2
            cb = cb[:h2, :w2].reshape(h2 // 2, 2, w2 // 2, 2).mean((1, 3))
            cr = cr[:h2, :w2].reshape(h2 // 2, 2, w2 // 2, 2).mean((1, 3))
            comp_hv = [(2, 2), (1, 1), (1, 1)]
        else:
            comp_hv = [(1, 1)] * 3
        planes, qts = [y, cb, cr], [(_QL, 0), (_QC, 1), (_QC, 1)]
    h, w = planes[0].shape
    hmax = max(hh for hh, _ in comp_hv)
    vmax = max(vv for _, vv in comp_hv)
    mcus_x, mcus_y = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    grids = []
    for p, (hh, vv) in zip(planes, comp_hv):
        ph, pw = mcus_y * vv * 8, mcus_x * hh * 8
        pad = np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
                     mode="edge")
        g = np.zeros((mcus_y * vv, mcus_x * hh, 64), dtype=np.int64)
        q = qts[len(grids)][0]
        for by in range(g.shape[0]):
            for bx in range(g.shape[1]):
                blk = pad[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
                coefq = _C @ (blk - 128.0) @ _C.T
                g[by, bx] = np.round(coefq / q).astype(np.int64
                                                       ).reshape(64)[_ZZ]
        grids.append(g)
    return h, w, comp_hv, qts, hmax, vmax, mcus_x, mcus_y, grids


class _ScanWriter:
    """Collect symbols (pass 1) or emit bits (pass 2) for one scan."""

    def __init__(self, table=None):
        self.syms = []
        self.table = table
        self.bw = _BitWriter() if table is not None else None

    def sym(self, s):
        self.syms.append(s)
        if self.table is not None:
            ln, c = self.table[2][s]
            self.bw.put(c, ln)

    def bits(self, v, n):
        if self.table is not None and n:
            self.bw.put(v, n)


def _ac_first_scan(blocks, lo, hi, al, writer):
    eobrun = 0

    def flush():
        nonlocal eobrun
        if eobrun:
            r = eobrun.bit_length() - 1
            writer.sym(r << 4)
            writer.bits(eobrun - (1 << r), r)
            eobrun = 0

    for zz in blocks:
        av = [(1 if v > 0 else -1) * (abs(int(v)) >> al)
              for v in zz[lo:hi + 1]]
        if not any(av):
            eobrun += 1
            if eobrun == 0x7FFF:
                flush()
            continue
        flush()
        run = 0
        for v in av:
            if v == 0:
                run += 1
                continue
            while run > 15:
                writer.sym(0xF0)
                run -= 16
            s, code = _mag(v)
            writer.sym((run << 4) | s)
            writer.bits(code, s)
            run = 0
        if run:
            eobrun = 1
    flush()


def _ac_refine_scan(blocks, lo, hi, al, writer):
    """Refinement encoding after the spec's G.1.2.3 procedure (ZRLs not
    emitted when foldable into the EOB, correction bits buffered and
    flushed with the symbol the decoder reads them after)."""
    eobrun = 0
    eob_bits = []

    def flush():
        nonlocal eobrun, eob_bits
        if eobrun:
            r = eobrun.bit_length() - 1
            writer.sym(r << 4)
            writer.bits(eobrun - (1 << r), r)
            for b in eob_bits:
                writer.bits(b, 1)
            eob_bits = []
            eobrun = 0

    for zz in blocks:
        av = [(1 if v > 0 else -1) * (abs(int(v)) >> al)
              for v in zz[lo:hi + 1]]
        kend = max((i for i, v in enumerate(av) if abs(v) == 1), default=-1)
        r, br = 0, []
        for i, v in enumerate(av):
            t = abs(v)
            if t == 0:
                r += 1
                continue
            while r > 15 and i <= kend:
                flush()
                writer.sym(0xF0)
                r -= 16
                for b in br:
                    writer.bits(b, 1)
                br = []
            if t > 1:
                br.append(t & 1)
                continue
            flush()
            writer.sym((r << 4) | 1)
            writer.bits(1 if v > 0 else 0, 1)
            for b in br:
                writer.bits(b, 1)
            br = []
            r = 0
        if r > 0 or br:
            eobrun += 1
            eob_bits += br
            if eobrun == 0x7FFF:
                flush()
    flush()


def _encode_jpeg_progressive(rgb=None, gray=None, subsample=False,
                             dc_al=1, ac_al=1,
                             bands=((1, 5), (6, 63)), restart=0):
    (h, w, comp_hv, qts, hmax, vmax, mcus_x, mcus_y,
     grids) = _prog_planes(rgb, gray, subsample)
    ncomp = len(comp_hv)

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) \
            + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0]) + bytes(_QL.reshape(64)[_ZZ].astype(np.uint8)))
    if gray is None:
        out += seg(0xDB, bytes([1]) + bytes(_QC.reshape(64)[_ZZ].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci, (hh, vv) in enumerate(comp_hv):
        sof += bytes([ci + 1, (hh << 4) | vv, qts[ci][1]])
    out += seg(0xC2, sof)                     # SOF2: progressive
    if restart:
        out += seg(0xDD, struct.pack(">H", restart))

    # MCU-interleaved DC unit order (comp idx, by, bx)
    dc_units = []
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, (hh, vv) in enumerate(comp_hv):
                for by in range(vv):
                    for bx in range(hh):
                        dc_units.append((ci, my * vv + by, mx * hh + bx))

    def sos_header(comp_sel, ss, se, ah, al):
        sos = bytes([len(comp_sel)])
        for ci, tdc, tac in comp_sel:
            sos += bytes([ci + 1, (tdc << 4) | tac])
        return sos + bytes([ss, se, (ah << 4) | al])

    def dc_first_body(writer):
        pred = [0] * ncomp
        rst = 0
        parts = []
        for i, (ci, by, bx) in enumerate(dc_units):
            per_mcu = sum(hh * vv for hh, vv in comp_hv)
            if restart and i and (i // per_mcu) % restart == 0 \
                    and i % per_mcu == 0:
                if writer.bw is not None:
                    writer.bw.align()
                    parts.append(bytes(writer.bw.out)
                                 + bytes([0xFF, 0xD0 + rst % 8]))
                    writer.bw = _BitWriter()
                rst += 1
                pred = [0] * ncomp
            v = int(grids[ci][by, bx, 0]) >> dc_al    # arithmetic shift
            s, code = _mag(v - pred[ci])
            pred[ci] = v
            writer.sym(s)
            writer.bits(code, s)
        if writer.bw is not None:
            writer.bw.align()
            parts.append(bytes(writer.bw.out))
        return b"".join(parts)

    # DC first scan: collect symbols, build table, emit
    trial = _ScanWriter()
    dc_first_body(trial)
    tab = _huff(trial.syms or [0])
    emitter = _ScanWriter(tab)
    body = dc_first_body(emitter)
    out += seg(0xC4, bytes([0]) + tab[0] + tab[1])
    out += seg(0xDA, sos_header([(ci, 0, 0) for ci in range(ncomp)],
                                0, 0, 0, dc_al))
    out += body
    if restart:
        # DRI persists across scans; this encoder only places RST
        # markers in the DC-first scan, so disable it afterwards
        # (redefining DRI between scans is itself a decoder test)
        out += seg(0xDD, struct.pack(">H", 0))

    # AC first scans (per component, per band)
    comp_dims = []
    for ci, (hh, vv) in enumerate(comp_hv):
        cw, chh = -(-w * hh // hmax), -(-h * vv // vmax)
        comp_dims.append((-(-chh // 8), -(-cw // 8)))
    ac_scans = []                              # (ci, lo, hi, al, refine?)
    for ci in range(ncomp):
        for lo, hi in bands:
            ac_scans.append((ci, lo, hi, ac_al, False))
    # DC refinement scans (no Huffman data)
    dc_refines = list(range(dc_al - 1, -1, -1))
    # AC refinement scans
    for al in range(ac_al - 1, -1, -1):
        for ci in range(ncomp):
            for lo, hi in bands:
                ac_scans.append((ci, lo, hi, al, True))

    def emit_ac(ci, lo, hi, al, refine):
        nonlocal out
        nby, nbx = comp_dims[ci]
        blocks = [grids[ci][by, bx]
                  for by in range(nby) for bx in range(nbx)]
        fn = _ac_refine_scan if refine else _ac_first_scan
        trial = _ScanWriter()
        fn(blocks, lo, hi, al, trial)
        tab = _huff(trial.syms or [0])
        emitter = _ScanWriter(tab)
        fn(blocks, lo, hi, al, emitter)
        emitter.bw.align()
        out += seg(0xC4, bytes([0x10]) + tab[0] + tab[1])
        out += seg(0xDA, sos_header([(ci, 0, 0)], lo, hi,
                                    al + 1 if refine else 0, al))
        out += bytes(emitter.bw.out)

    # interleave orders: all AC-first, then DC refines, then AC refines
    for ci, lo, hi, al, refine in [s for s in ac_scans if not s[4]]:
        emit_ac(ci, lo, hi, al, refine)
    for al in dc_refines:
        bw = _BitWriter()
        for ci, by, bx in dc_units:
            bw.put((int(grids[ci][by, bx, 0]) >> al) & 1, 1)
        bw.align()
        out += seg(0xDA, sos_header([(ci, 0, 0) for ci in range(ncomp)],
                                    0, 0, al + 1, al))
        out += bytes(bw.out)
    for ci, lo, hi, al, refine in [s for s in ac_scans if s[4]]:
        emit_ac(ci, lo, hi, al, refine)

    out += b"\xff\xd9"
    return bytes(out)


def test_jpeg_progressive_matches_baseline_444():
    rng = np.random.default_rng(40)
    base = np.linspace(40, 215, 24, dtype=np.uint8)
    src = (base[None, :, None] + rng.integers(-20, 20, (16, 24, 3))
           ).clip(0, 255).astype(np.uint8)
    want = decode_jpeg(_encode_jpeg(rgb=src))
    got = decode_jpeg(_encode_jpeg_progressive(rgb=src))
    # identical quantized coefficients -> identical reconstruction up to
    # the last-ulp of two IDCT summation orders
    assert int(np.abs(got.astype(int) - want.astype(int)).max()) <= 1
    assert (got != want).mean() < 0.01


def test_jpeg_progressive_gray_and_420():
    rng = np.random.default_rng(41)
    g = rng.integers(0, 256, size=(17, 13), dtype=np.uint8)
    want = decode_jpeg(_encode_jpeg(gray=g))
    got = decode_jpeg(_encode_jpeg_progressive(gray=g))
    assert int(np.abs(got.astype(int) - want.astype(int)).max()) <= 1
    src = rng.integers(0, 256, size=(20, 28, 3), dtype=np.uint8)
    want = decode_jpeg(_encode_jpeg(rgb=src, subsample=True))
    got = decode_jpeg(_encode_jpeg_progressive(rgb=src, subsample=True))
    assert int(np.abs(got.astype(int) - want.astype(int)).max()) <= 1


def test_jpeg_progressive_deep_approximation_and_bands():
    rng = np.random.default_rng(42)
    src = rng.integers(0, 256, size=(15, 9, 3), dtype=np.uint8)
    want = decode_jpeg(_encode_jpeg(rgb=src))
    got = decode_jpeg(_encode_jpeg_progressive(
        rgb=src, dc_al=3, ac_al=2,
        bands=((1, 2), (3, 9), (10, 35), (36, 63))))
    assert int(np.abs(got.astype(int) - want.astype(int)).max()) <= 1


def test_jpeg_progressive_dc_restart():
    rng = np.random.default_rng(43)
    src = rng.integers(0, 256, size=(16, 40, 3), dtype=np.uint8)
    want = decode_jpeg(_encode_jpeg(rgb=src))
    got = decode_jpeg(_encode_jpeg_progressive(rgb=src, restart=2))
    assert int(np.abs(got.astype(int) - want.astype(int)).max()) <= 1


@given(st.integers(4, 20), st.integers(4, 20), st.integers(0, 2**32 - 1),
       st.integers(1, 3), st.integers(1, 2))
@settings(max_examples=15, deadline=None)
def test_jpeg_progressive_roundtrip_any_shape(h, w, seed, dc_al, ac_al):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    want = decode_jpeg(_encode_jpeg(rgb=src))
    got = decode_jpeg(_encode_jpeg_progressive(
        rgb=src, dc_al=dc_al, ac_al=ac_al, bands=((1, 20), (21, 63))))
    assert int(np.abs(got.astype(int) - want.astype(int)).max()) <= 1


def test_image_features_real_progressive_jpeg(spark):
    src = np.full((16, 16, 3), 120, dtype=np.uint8)
    src[:8] = 60
    rows = [Row(id=0, image=bytearray(_encode_jpeg_progressive(rgb=src)))]
    got = image_features(spark.createDataFrame(rows), fake=False).collect()
    np.testing.assert_allclose(got[0]["img_mean"], src.mean(axis=(0, 1)),
                               atol=2)


# ---------------------------------------------------------------------------
# error-contract fuzz: any truncation or corruption of a valid payload
# must either decode (a flip can land in pixel data) or raise
# MediaDecodeError — never an IndexError/struct.error/numpy error


def _fuzz_payloads():
    rng = np.random.default_rng(50)
    img = rng.integers(0, 256, size=(9, 7, 3), dtype=np.uint8)
    pal_img = _PAL8[rng.integers(0, 8, size=(9, 7))]
    return {
        "bmp": encode_bmp(img),
        "png": _pack_png_adam7(img, color=2, ftypes=[0, 4]),
        "jpeg": _encode_jpeg(rgb=img),
        "jpeg_prog": _encode_jpeg_progressive(rgb=img),
        "gif": _pack_gif(pal_img, _PAL8, interlaced=True),
        "tiff": _pack_tiff_compressed(img, 5, strips=2, predictor=2),
    }


def test_decoders_raise_only_media_error_on_truncation():
    from valkey_search_spark.multimodal.codecs import (
        decode_bmp, decode_gif, decode_jpeg, decode_png, decode_tiff,
    )

    decoders = {"bmp": decode_bmp, "png": decode_png, "jpeg": decode_jpeg,
                "jpeg_prog": decode_jpeg, "gif": decode_gif,
                "tiff": decode_tiff}
    for kind, payload in _fuzz_payloads().items():
        fn = decoders[kind]
        np.asarray(fn(payload))                      # full payload decodes
        for cut in range(0, len(payload), max(1, len(payload) // 40)):
            try:
                fn(payload[:cut])
            except MediaDecodeError:
                pass                                 # the contract
            # nothing else may escape


def test_decoders_raise_only_media_error_on_bit_flips():
    rng = np.random.default_rng(51)
    from valkey_search_spark.multimodal.codecs import (
        decode_bmp, decode_gif, decode_jpeg, decode_png, decode_tiff,
    )

    decoders = {"bmp": decode_bmp, "png": decode_png, "jpeg": decode_jpeg,
                "jpeg_prog": decode_jpeg, "gif": decode_gif,
                "tiff": decode_tiff}
    for kind, payload in _fuzz_payloads().items():
        fn = decoders[kind]
        for _ in range(60):
            mut = bytearray(payload)
            for _ in range(rng.integers(1, 4)):
                mut[rng.integers(0, len(mut))] ^= 1 << rng.integers(0, 8)
            try:
                fn(bytes(mut))                       # decode or raise...
            except MediaDecodeError:
                pass                                 # ...only this


# ---------------------------------------------------------------------------
# FLAC: decoder pinned by an independent FORWARD encoder (frames,
# subframe types, Rice partitions, stereo decorrelation — all per the
# public spec, written against the encode direction)

from valkey_search_spark.multimodal.codecs import decode_flac


class _FlacW:
    def __init__(self):
        self.bits = []

    def put(self, v, n):
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def sput(self, v, n):
        self.put(v & ((1 << n) - 1), n)

    def align(self):
        while len(self.bits) % 8:
            self.bits.append(0)

    def tobytes(self):
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for j, bit in enumerate(self.bits[i:i + 8]):
                b |= bit << (7 - j)
            out.append(b)
        return bytes(out)


def _flac_rice(bw, resid, param, escape_raw=None):
    if escape_raw is not None:
        bw.put((1 << 4) - 1, 4)             # escape code (rice method 0)
        bw.put(escape_raw, 5)
        for x in resid:
            if escape_raw:
                bw.sput(int(x), escape_raw)
        return
    bw.put(param, 4)
    for x in resid:
        x = int(x)
        u = (x << 1) if x >= 0 else ((-x) << 1) - 1
        bw.put(0, u >> param) if False else None
        for _ in range(u >> param):
            bw.put(0, 1)
        bw.put(1, 1)
        bw.put(u & ((1 << param) - 1), param)


def _flac_residual_w(bw, resid, order, blocksize, porder, escape_raw=None):
    bw.put(0, 2)                             # method 0 (4-bit rice)
    bw.put(porder, 4)
    nparts = 1 << porder
    at = 0
    for p in range(nparts):
        n = (blocksize >> porder) - (order if p == 0 else 0)
        part = resid[at:at + n]
        if escape_raw is not None:
            _flac_rice(bw, part, 0, escape_raw=escape_raw)
        else:
            u = [(int(x) << 1) if x >= 0 else ((-int(x)) << 1) - 1
                 for x in part]
            param = min(14, max((max(u).bit_length() - 1) if u and max(u)
                                else 0, 0))
            _flac_rice(bw, part, param)
        at += n


_FIXED_CO = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _flac_subframe_w(bw, x, bps, mode, porder=0, escape_raw=None,
                     wasted=0, lpc=None):
    blocksize = len(x)
    bw.put(0, 1)                             # sync
    x = np.asarray(x, dtype=np.int64)
    if wasted:
        assert not np.any(x & ((1 << wasted) - 1))
        x = x >> wasted
        bps -= wasted
    if mode == "constant":
        bw.put(0, 6)
    elif mode == "verbatim":
        bw.put(1, 6)
    elif mode.startswith("fixed"):
        bw.put(8 + int(mode[5]), 6)
    else:                                    # lpc
        order = len(lpc[0])
        bw.put(32 + order - 1, 6)
    if wasted:
        bw.put(1, 1)                         # wasted flag
        for _ in range(wasted - 1):
            bw.put(0, 1)
        bw.put(1, 1)                         # unary terminator
    else:
        bw.put(0, 1)
    if mode == "constant":
        assert len(set(x.tolist())) == 1
        bw.sput(int(x[0]), bps)
    elif mode == "verbatim":
        for v in x:
            bw.sput(int(v), bps)
    elif mode.startswith("fixed"):
        order = int(mode[5])
        for v in x[:order]:
            bw.sput(int(v), bps)
        co = _FIXED_CO[order]
        resid = [int(x[i]) - sum(c * int(x[i - 1 - j])
                                 for j, c in enumerate(co))
                 for i in range(order, blocksize)]
        _flac_residual_w(bw, resid, order, blocksize, porder, escape_raw)
    else:
        coefs, shift, prec = lpc
        order = len(coefs)
        for v in x[:order]:
            bw.sput(int(v), bps)
        bw.put(prec - 1, 4)
        bw.sput(shift, 5)
        for c in coefs:
            bw.sput(c, prec)
        resid = [int(x[i]) - (sum(coefs[j] * int(x[i - 1 - j])
                                  for j in range(order)) >> shift)
                 for i in range(order, blocksize)]
        _flac_residual_w(bw, resid, order, blocksize, porder, escape_raw)


def _pack_flac(samples, rate=8000, bps=16, blocksize=64, mode="fixed2",
               stereo=None, porder=0, escape_raw=None, wasted=0, lpc=None):
    """samples: (n, ch) int array. stereo: None|'ls'|'rs'|'ms'."""
    samples = np.asarray(samples, dtype=np.int64)
    n, ch = samples.shape
    si = _FlacW()
    si.put(blocksize, 16); si.put(blocksize, 16)    # min/max blocksize
    si.put(0, 24); si.put(0, 24)                    # min/max framesize
    si.put(rate, 20); si.put(ch - 1, 3); si.put(bps - 1, 5)
    si.put(n, 36)
    streaminfo = si.tobytes() + b"\0" * 16          # + dummy MD5
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo
    for fno, at in enumerate(range(0, n, blocksize)):
        frame = samples[at:at + blocksize]
        fb = len(frame)
        bw = _FlacW()
        bw.put(0b11111111111110, 14)
        bw.put(0, 1); bw.put(0, 1)                  # reserved, fixed-block
        bw.put(6, 4)                                 # blocksize: 8-bit follows
        bw.put(0, 4)                                 # rate: from STREAMINFO
        chan_code = {None: ch - 1, "ls": 8, "rs": 9, "ms": 10}[stereo]
        bw.put(chan_code, 4)
        bw.put(4, 3)                                 # 16-bit sample size
        bw.put(0, 1)
        assert fno < 0x80
        bw.put(fno, 8)                               # UTF-8 number (1 byte)
        bw.put(fb - 1, 8)                            # blocksize-1
        bw.put(0, 8)                                 # CRC-8 (unchecked)
        if stereo is None:
            for c in range(ch):
                _flac_subframe_w(bw, frame[:, c], bps, mode, porder,
                                 escape_raw, wasted, lpc)
        else:
            L, R = frame[:, 0], frame[:, 1]
            side = L - R
            if stereo == "ls":
                chans = [(L, bps), (side, bps + 1)]
            elif stereo == "rs":
                chans = [(side, bps + 1), (R, bps)]
            else:
                chans = [((L + R) >> 1, bps), (side, bps + 1)]
            for cx, cbps in chans:
                _flac_subframe_w(bw, cx, cbps, mode, porder,
                                 escape_raw, wasted, lpc)
        bw.align()
        bw.put(0, 16)                                # CRC-16 (unchecked)
        out += bw.tobytes()
    return bytes(out)


def _flac_ints(payload, bps=16):
    frames, rate, ch = decode_flac(payload)
    return np.round(frames * (1 << (bps - 1))).astype(np.int64), rate, ch


@pytest.mark.parametrize("mode", ["verbatim", "fixed0", "fixed1", "fixed2",
                                  "fixed3", "fixed4"])
def test_flac_subframe_modes_roundtrip(mode):
    rng = np.random.default_rng(60)
    x = rng.integers(-2000, 2000, size=(200, 1), dtype=np.int64)
    got, rate, ch = _flac_ints(_pack_flac(x, mode=mode))
    assert (rate, ch) == (8000, 1)
    np.testing.assert_array_equal(got, x)


def test_flac_constant_and_lpc():
    x = np.full((100, 1), -321, dtype=np.int64)
    got, _, _ = _flac_ints(_pack_flac(x, mode="constant"))
    np.testing.assert_array_equal(got, x)
    rng = np.random.default_rng(61)
    y = rng.integers(-3000, 3000, size=(128, 1), dtype=np.int64)
    got, _, _ = _flac_ints(_pack_flac(y, mode="lpc",
                                      lpc=([3, -2, 1], 2, 6)))
    np.testing.assert_array_equal(got, y)


@pytest.mark.parametrize("stereo", ["ls", "rs", "ms"])
def test_flac_stereo_decorrelation(stereo):
    rng = np.random.default_rng(62)
    x = rng.integers(-5000, 5000, size=(192, 2), dtype=np.int64)
    got, _, ch = _flac_ints(_pack_flac(x, stereo=stereo))
    assert ch == 2
    np.testing.assert_array_equal(got, x)


def test_flac_partitions_escape_wasted_and_tail_frame():
    rng = np.random.default_rng(63)
    x = rng.integers(-999, 999, size=(150, 1), dtype=np.int64)  # 64+64+22
    got, _, _ = _flac_ints(_pack_flac(x, mode="fixed1", porder=1))
    np.testing.assert_array_equal(got, x)
    got, _, _ = _flac_ints(_pack_flac(x, mode="fixed2", escape_raw=14))
    np.testing.assert_array_equal(got, x)
    w = (rng.integers(-500, 500, size=(96, 1), dtype=np.int64)) << 2
    got, _, _ = _flac_ints(_pack_flac(w, mode="verbatim", wasted=2))
    np.testing.assert_array_equal(got, w)


def test_flac_malformed_raises_media_error_only():
    payload = _pack_flac(np.zeros((64, 1), dtype=np.int64), mode="constant")
    for cut in range(0, len(payload), 7):
        try:
            decode_flac(payload[:cut])
        except MediaDecodeError:
            pass


def test_audio_features_real_flac(spark):
    t = np.arange(800) / 8000.0
    sig = np.round(0.25 * np.sin(2 * np.pi * 330 * t) * 32767).astype(np.int64)
    payload = _pack_flac(sig[:, None], mode="fixed2", blocksize=200)
    df = spark.createDataFrame([Row(id=0, audio=bytearray(payload))])
    r = audio_features(df, fake=False).first()
    wave = sig / 32768.0
    assert r["audio_seconds"] == pytest.approx(0.1)
    assert r["audio_rms"] == pytest.approx(float(np.sqrt((wave**2).mean())),
                                           rel=1e-4)


def test_decoders_reject_absurd_declared_dimensions():
    """Header-declared huge dimensions over tiny bodies must raise
    MediaDecodeError (pixel budget) BEFORE any allocation — never
    MemoryError (which would escape on_error='null')."""
    # PNG: 60000x60000 interlaced header, 10-byte body
    ihdr = struct.pack(">IIBBBBB", 60000, 60000, 8, 2, 0, 0, 1)
    png = (PNG_SIG + _chunk(b"IHDR", ihdr)
           + _chunk(b"IDAT", zlib.compress(b"\0" * 10)) + _chunk(b"IEND", b""))
    with pytest.raises(MediaDecodeError, match="pixel budget"):
        decode_png(png)
    # GIF: huge frame descriptor
    gif = (b"GIF89a" + struct.pack("<HH", 60000, 60000) + bytes([0x80, 0, 0])
           + b"\0" * 6 + b"\x2c" + struct.pack("<HHHH", 0, 0, 60000, 60000)
           + b"\x00\x02\x01\x00\x00\x3b")
    with pytest.raises(MediaDecodeError, match="pixel budget"):
        decode_gif(gif)
    # TIFF: minimal hand-built IFD declaring huge dims
    out = bytearray(b"II" + struct.pack("<H", 42) + struct.pack("<I", 8))
    entries = [(256, 3, 1, struct.pack("<HH", 60000, 0)),
               (257, 3, 1, struct.pack("<HH", 60000, 0))]
    out += struct.pack("<H", len(entries))
    for tag, typ, cnt, val in entries:
        out += struct.pack("<HHI", tag, typ, cnt) + val[:4].ljust(4, b"\0")
    out += struct.pack("<I", 0)
    with pytest.raises(MediaDecodeError, match="pixel budget"):
        decode_tiff(bytes(out))


def test_tiff_rejects_spp_zero_and_alien_value_types():
    """SamplesPerPixel=0 must not produce a silent (H, W, 0) result, and
    non-SHORT/LONG field types must not be mis-parsed as LONG."""
    base = _pack_tiff(np.zeros((4, 4, 3), np.uint8))
    b = bytearray(base)
    # find the 277 (spp) entry and zero its value
    n = struct.unpack_from("<H", b, 8)[0]
    for e in range(n):
        off = 10 + e * 12
        tag, typ = struct.unpack_from("<HH", b, off)
        if tag == 277:
            struct.pack_into("<H", b, off + 8, 0)
    with pytest.raises(MediaDecodeError, match="samples-per-pixel"):
        decode_tiff(bytes(b))
    b = bytearray(base)
    for e in range(n):
        off = 10 + e * 12
        tag, typ = struct.unpack_from("<HH", b, off)
        if tag == 256:
            struct.pack_into("<H", b, off + 2, 1)    # type BYTE
    with pytest.raises(MediaDecodeError, match="value type"):
        decode_tiff(bytes(b))


def test_flac_unknown_total_tolerates_trailing_bytes():
    """STREAMINFO total=0 (legal for streamed encodes) + appended tag
    bytes: the decoded frames are returned, not discarded."""
    rng = np.random.default_rng(70)
    x = rng.integers(-500, 500, size=(128, 1), dtype=np.int64)
    payload = bytearray(_pack_flac(x, mode="fixed1"))
    # zero the 36-bit total_samples field: last 36 bits of the 18-byte
    # core are the low 4 bits of byte 13 + bytes 14-17 (offset in SI)
    si_off = 8
    payload[si_off + 13] &= 0xF0
    for i in range(14, 18):
        payload[si_off + i] = 0
    payload += b"TAG" + b"\0" * 125            # ID3v1-style trailer
    frames, rate, ch = decode_flac(bytes(payload))
    np.testing.assert_array_equal(
        np.round(np.asarray(frames) * 32768).astype(np.int64), x)


def test_flac_midstream_corruption_raises_even_with_unknown_total():
    """total=0 tolerance is for trailing tags only: a flipped byte at a
    frame boundary (with real frames after it) must still raise, not
    silently return truncated audio."""
    rng = np.random.default_rng(71)
    x = rng.integers(-500, 500, size=(128, 1), dtype=np.int64)
    payload = bytearray(_pack_flac(x, mode="fixed1",
                                   blocksize=32))        # 4 frames of 32
    si_off = 8
    payload[si_off + 13] &= 0xF0                          # total := 0
    for i in range(14, 18):
        payload[si_off + i] = 0
    # corrupt the SECOND frame's sync (frames 3-4 remain in the tail,
    # proving this is mid-stream corruption, not a trailing tag)
    syncs = []
    i = payload.find(b"\xff", 42)
    while i != -1:
        if i + 1 < len(payload) and payload[i + 1] & 0xFC == 0xF8:
            syncs.append(i)
        i = payload.find(b"\xff", i + 1)
    assert len(syncs) >= 4
    payload[syncs[1] + 1] = 0x00
    with pytest.raises(MediaDecodeError):
        decode_flac(bytes(payload))


def test_tiff_budget_covers_samples_and_predictor():
    """The TIFF budget bounds width*spp x height, so a 2^28-pixel spp=8
    declaration is rejected before any strip expansion."""
    out = bytearray(b"II" + struct.pack("<H", 42) + struct.pack("<I", 8))
    entries = [(256, 3, 1, struct.pack("<HH", 16384, 0)),
               (257, 3, 1, struct.pack("<HH", 16384, 0)),
               (277, 3, 1, struct.pack("<HH", 8, 0))]
    out += struct.pack("<H", len(entries))
    for tag, typ, cnt, val in entries:
        out += struct.pack("<HHI", tag, typ, cnt) + val[:4].ljust(4, b"\0")
    out += struct.pack("<I", 0)
    with pytest.raises(MediaDecodeError, match="pixel budget"):
        decode_tiff(bytes(out))


# ---------------------------------------------------------------------------
# palettized BMP (8-bit + RLE8), pinned by an independent forward RLE8
# encoder


def _pack_bmp8(idx, palette, rle=False, top_down=False):
    """idx: (H, W) uint8 palette indices; palette: (N, 3) RGB."""
    idx = np.asarray(idx, dtype=np.uint8)
    h, w = idx.shape
    pal = np.asarray(palette, dtype=np.uint8)
    pal_bytes = b"".join(bytes([b, g, r, 0]) for r, g, b in pal)
    if rle:
        body = bytearray()
        for row in idx[::-1]:                  # stored bottom-up
            x = 0
            while x < w:
                run = 1
                while x + run < w and row[x + run] == row[x] and run < 255:
                    run += 1
                if run >= 2:
                    body += bytes([run, row[x]])
                    x += run
                else:
                    # absolute stretch of non-run bytes (>=3) or tiny run
                    k = x
                    while (k + 1 < w and k - x < 254
                           and not (k + 2 < w and row[k] == row[k + 1]
                                    == row[k + 2])):
                        k += 1
                    lit = row[x:k + 1]
                    if len(lit) >= 3:
                        body += bytes([0, len(lit)]) + lit.tobytes()
                        if len(lit) & 1:
                            body += b"\0"      # word alignment
                    else:
                        for v in lit:
                            body += bytes([1, int(v)])
                    x = k + 1
            body += b"\x00\x00"                # end of line
        body += b"\x00\x01"                    # end of bitmap
        body = bytes(body)
        comp = 1
    else:
        stride = (w + 3) & ~3
        rows = idx if top_down else idx[::-1]
        body = b"".join(bytes(r) + b"\0" * (stride - w) for r in rows)
        comp = 0
    off = 14 + 40 + len(pal_bytes)
    hdr = struct.pack("<2sIHHI", b"BM", off + len(body), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w,
                       (-h if top_down else h), 1, 8, comp, len(body),
                       0, 0, len(pal), 0)
    return hdr + info + pal_bytes + body


_BPAL = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255],
                  [200, 100, 50], [1, 2, 3]], dtype=np.uint8)


def test_decode_bmp_palettized_uncompressed():
    rng = np.random.default_rng(80)
    idx = rng.integers(0, 6, size=(7, 5), dtype=np.uint8)
    np.testing.assert_array_equal(
        decode_bmp(_pack_bmp8(idx, _BPAL)), _BPAL[idx])
    np.testing.assert_array_equal(
        decode_bmp(_pack_bmp8(idx, _BPAL, top_down=True)), _BPAL[idx])


def test_decode_bmp_rle8():
    rng = np.random.default_rng(81)
    # runs + literal stretches: low-entropy rows exercise both modes
    idx = (rng.integers(0, 3, size=(9, 17)) * rng.integers(
        0, 2, size=(9, 17))).astype(np.uint8) + rng.integers(
        0, 2, size=(9, 17)).astype(np.uint8)
    np.testing.assert_array_equal(
        decode_bmp(_pack_bmp8(idx, _BPAL, rle=True)), _BPAL[idx])


def test_decode_bmp_rle8_any_shape():
    rng = np.random.default_rng(82)
    for h, w in [(1, 1), (3, 4), (8, 31), (16, 3)]:
        idx = rng.integers(0, 6, size=(h, w), dtype=np.uint8)
        np.testing.assert_array_equal(
            decode_bmp(_pack_bmp8(idx, _BPAL, rle=True)), _BPAL[idx],
            err_msg=f"{h}x{w}")


def test_decode_bmp_palettized_rejects_malformed():
    idx = np.zeros((4, 4), dtype=np.uint8)
    good = _pack_bmp8(idx, _BPAL)
    with pytest.raises(MediaDecodeError):
        decode_bmp(good[:60])                  # truncated color table
    bad = bytearray(_pack_bmp8(np.full((2, 2), 7, np.uint8), _BPAL))
    with pytest.raises(MediaDecodeError, match="palette index"):
        decode_bmp(bytes(bad))                 # index beyond palette


# ---------------------------------------------------------------------------
# animated GIF: composited frames pinned by an independent scalar
# compositor over a forward multi-frame encoder

from valkey_search_spark.multimodal.codecs import decode_gif_frames


def _pack_gif_anim(screen, palette, frames, bg=0):
    """frames: list of dicts {idx (h,w), left, top, disposal, tindex,
    delay_cs}. Builds GIF89a with a GCE before every frame."""
    w, h = screen
    pal = np.asarray(palette, dtype=np.uint8)
    size_field = 0
    while (2 << size_field) < len(pal):
        size_field += 1
    n_entries = 2 << size_field
    table = np.vstack([pal, np.zeros((n_entries - len(pal), 3),
                                     np.uint8)]).tobytes()
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | size_field, bg, 0])
    out += table
    mcs = max(2, size_field + 1)
    for f in frames:
        gpacked = (f.get("disposal", 0) << 2) | (
            1 if f.get("tindex") is not None else 0)
        out += bytes([0x21, 0xF9, 4, gpacked])
        out += struct.pack("<H", f.get("delay_cs", 0))
        out += bytes([f.get("tindex") or 0, 0])
        idx = np.asarray(f["idx"], dtype=np.uint8)
        ih, iw = idx.shape
        out += b"\x2c" + struct.pack("<HHHH", f.get("left", 0),
                                     f.get("top", 0), iw, ih)
        out += bytes([0])                      # no local table
        out += bytes([mcs])
        out += _subblocks(_lzw_encode(idx.reshape(-1), mcs))
    out += b"\x3b"
    return bytes(out)


def _scalar_composite(screen, palette, frames, bg=0):
    """Independent reference compositor (plain numpy, no shared code)."""
    w, h = screen
    pal = np.asarray(palette, dtype=np.uint8)
    canvas = np.tile(pal[bg], (h, w, 1)).astype(np.uint8)
    out = []
    for f in frames:
        idx = np.asarray(f["idx"], dtype=np.uint8)
        ih, iw = idx.shape
        x0, y0 = f.get("left", 0), f.get("top", 0)
        before = canvas[y0:y0 + ih, x0:x0 + iw].copy()
        for yy in range(ih):
            for xx in range(iw):
                if f.get("tindex") is None or idx[yy, xx] != f["tindex"]:
                    canvas[y0 + yy, x0 + xx] = pal[idx[yy, xx]]
        out.append(canvas.copy())
        d = f.get("disposal", 0)
        if d == 2:
            canvas[y0:y0 + ih, x0:x0 + iw] = pal[bg]
        elif d == 3:
            canvas[y0:y0 + ih, x0:x0 + iw] = before
    return out


def test_gif_frames_composition_disposal_transparency():
    rng = np.random.default_rng(90)
    frames = [
        {"idx": rng.integers(0, 8, (10, 12)), "delay_cs": 10},
        # partial frame with transparency, keep disposal
        {"idx": rng.integers(0, 8, (4, 5)), "left": 3, "top": 2,
         "tindex": 2, "delay_cs": 5},
        # restore-to-background after render
        {"idx": rng.integers(0, 8, (6, 6)), "left": 6, "top": 4,
         "disposal": 2},
        # restore-to-previous after render
        {"idx": rng.integers(0, 8, (5, 7)), "left": 0, "top": 0,
         "disposal": 3, "tindex": 7},
        {"idx": rng.integers(0, 8, (3, 3)), "left": 9, "top": 7},
    ]
    payload = _pack_gif_anim((12, 10), _PAL8, frames, bg=1)
    got, delays = decode_gif_frames(payload)
    want = _scalar_composite((12, 10), _PAL8, frames, bg=1)
    assert len(got) == len(want) == 5
    assert delays[:2] == [0.1, 0.05]
    for i, (g, w_) in enumerate(zip(got, want)):
        np.testing.assert_array_equal(g, w_, err_msg=f"frame {i}")
    # max_frames bounds the decode
    got2, _ = decode_gif_frames(payload, max_frames=2)
    assert len(got2) == 2


def test_gif_frames_rejects_out_of_bounds_frame():
    frames = [{"idx": np.zeros((5, 5), np.uint8), "left": 10, "top": 0}]
    payload = _pack_gif_anim((12, 4), _PAL8, frames)
    with pytest.raises(MediaDecodeError):
        decode_gif_frames(payload)


def test_video_frame_sample_real_gif(spark):
    """video_frame_sample(fake=False) REALLY decodes animated GIFs —
    sampled composited frames round-trip through the BMP re-encode."""
    from valkey_search_spark.multimodal.columns import video_frame_sample

    rng = np.random.default_rng(91)
    frames = [{"idx": rng.integers(0, 8, (6, 8)), "delay_cs": 4}
              for _ in range(7)]
    payload = _pack_gif_anim((8, 6), _PAL8, frames)
    want = _scalar_composite((8, 6), _PAL8, frames)
    df = spark.createDataFrame([Row(id=1, video=bytearray(payload))])
    out = video_frame_sample(df, every_n=3, fake=False).collect()
    assert [r["frame_no"] for r in out] == [0, 3, 6]
    for r in out:
        np.testing.assert_array_equal(decode_bmp(bytes(r["frame"])),
                                      want[r["frame_no"]])
    # non-GIF video still raises (the ffmpeg seam)
    df2 = spark.createDataFrame([Row(id=1, video=bytearray(b"\x00mp4junk"))])
    with pytest.raises(Exception, match="NotImplementedError|ffmpeg|GIF"):
        video_frame_sample(df2, fake=False).collect()


def test_gif_frames_cumulative_pixel_budget():
    """Frames x canvas amplification bomb: a tiny payload declaring a
    budget-sized screen plus many small frames must raise
    MediaDecodeError before allocating frames beyond the budget."""
    side = 16384                                # side*side == 1 << 28
    frames = [{"idx": np.zeros((1, 1), np.uint8)} for _ in range(4)]
    payload = _pack_gif_anim((side, side), _PAL8, frames)
    with pytest.raises(MediaDecodeError, match="pixel budget"):
        decode_gif_frames(payload)


# ---------------------------------------------------------------------------
# JPEG-in-TIFF (compression 7, TIFF Technical Note #2)

def _pack_tiff_jpeg(chunks, w, h, rows_per_strip, bo="<", spp=3,
                    photometric=6, tables=None, compression=7):
    """Independent writer for new-style JPEG TIFFs: `chunks` are
    pre-encoded JPEG interchange streams, one per strip; `tables`
    (optional) becomes the JPEGTables (347) abbreviated stream."""
    entries = []

    def short(tag, v):
        entries.append((tag, 3, 1, struct.pack(bo + "HH", v, 0)))

    short(256, w); short(257, h)
    short(259, compression); short(262, photometric); short(277, spp)
    short(278, rows_per_strip)
    n = len(chunks)
    ext = []                                 # (tag, typ, cnt, payload)
    if spp >= 3:
        ext.append((258, 3, spp, struct.pack(bo + "H" * spp, *[8] * spp)))
    else:
        short(258, 8)
    if tables is not None:
        ext.append((347, 7, len(tables), tables))
    n_entries = len(entries) + len(ext) + 2
    ifd_size = 2 + n_entries * 12 + 4
    ext_off = 8 + ifd_size
    ext_blob = bytearray()
    ext_entries = []
    for tag, typ, cnt, payload in ext:
        if len(payload) <= 4:
            ext_entries.append((tag, typ, cnt, payload))
        else:
            ext_entries.append((tag, typ, cnt,
                                struct.pack(bo + "I", ext_off + len(ext_blob))))
            ext_blob += payload
    arr_off = ext_off + len(ext_blob)
    data_off = arr_off if n == 1 else arr_off + 8 * n
    offs, cur = [], data_off
    for c in chunks:
        offs.append(cur)
        cur += len(c)
    alle = list(entries) + ext_entries
    if n == 1:
        alle.append((273, 4, 1, struct.pack(bo + "I", offs[0])))
        alle.append((279, 4, 1, struct.pack(bo + "I", len(chunks[0]))))
    else:
        alle.append((273, 4, n, struct.pack(bo + "I", arr_off)))
        alle.append((279, 4, n, struct.pack(bo + "I", arr_off + 4 * n)))
    alle.sort()
    out = bytearray()
    out += (b"II" if bo == "<" else b"MM") + struct.pack(bo + "H", 42)
    out += struct.pack(bo + "I", 8)
    out += struct.pack(bo + "H", len(alle))
    for tag, typ, cnt, val in alle:
        out += struct.pack(bo + "HHI", tag, typ, cnt) + val[:4].ljust(4, b"\0")
    out += struct.pack(bo + "I", 0)
    out += ext_blob
    if n > 1:
        out += struct.pack(bo + "I" * n, *offs)
        out += struct.pack(bo + "I" * n, *[len(c) for c in chunks])
    for c in chunks:
        out += c
    return bytes(out)


def _split_jpeg_tables(stream):
    """Split a full interchange stream into (tables_stream, lean_strip):
    DQT/DHT segments move to an abbreviated SOI..EOI tables stream, the
    rest keeps frame+scan — the TTN2 JPEGTables layout."""
    assert stream[:2] == b"\xff\xd8"
    i, tables, rest = 2, bytearray(), bytearray()
    while i < len(stream):
        assert stream[i] == 0xFF
        marker = stream[i + 1]
        if marker == 0xD9:                   # EOI
            break
        (seglen,) = struct.unpack(">H", stream[i + 2:i + 4])
        seg = stream[i:i + 2 + seglen]
        if marker in (0xDB, 0xC4):           # DQT / DHT
            tables += seg
        else:
            rest += seg
        i += 2 + seglen
        if marker == 0xDA:                   # SOS: entropy data to EOI
            rest += stream[i:len(stream) - 2]
            break
    return (b"\xff\xd8" + bytes(tables) + b"\xff\xd9",
            b"\xff\xd8" + bytes(rest) + b"\xff\xd9")


def _blocky(h, w, seed=3):
    """8x8-constant-block image: survives quantization ~exactly."""
    rng = np.random.default_rng(seed)
    blocks = rng.integers(30, 220, size=(-(-h // 8), -(-w // 8), 3),
                          dtype=np.uint8)
    return np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)[:h, :w]


def test_decode_tiff_jpeg_single_strip():
    img = _blocky(16, 16)
    stream = _encode_jpeg(rgb=img)
    got = decode_tiff(_pack_tiff_jpeg([stream], 16, 16, 16))
    # the TIFF path must yield EXACTLY the plain JPEG decode
    np.testing.assert_array_equal(got, decode_jpeg(stream))
    assert np.abs(got.astype(int) - img.astype(int)).mean() < 4


def test_decode_tiff_jpeg_multi_strip():
    img = _blocky(32, 16, seed=9)
    strips = [img[0:16], img[16:32]]
    streams = [_encode_jpeg(rgb=s) for s in strips]
    got = decode_tiff(_pack_tiff_jpeg(streams, 16, 32, 16))
    want = np.concatenate([decode_jpeg(s) for s in streams], axis=0)
    np.testing.assert_array_equal(got, want)


def test_decode_tiff_jpeg_shared_tables():
    img = _blocky(16, 16, seed=5)
    full = _encode_jpeg(rgb=img)
    tables, lean = _split_jpeg_tables(full)
    got = decode_tiff(_pack_tiff_jpeg([lean], 16, 16, 16, tables=tables))
    np.testing.assert_array_equal(got, decode_jpeg(full))


def test_decode_tiff_jpeg_photometric2_rgb():
    # TIFF TechNote 2 allows PhotometricInterpretation=2: the JPEG
    # stream's three components ARE R,G,B (no BT.601). The round-8
    # ADVICE bug: decode_jpeg applied the YCbCr transform anyway,
    # silently corrupting colors.
    img = _blocky(16, 16, seed=3)
    stream = _encode_jpeg(rgb=img, color="rgb")
    got = decode_tiff(_pack_tiff_jpeg([stream], 16, 16, 16,
                                      photometric=2))
    assert np.abs(got.astype(int) - img.astype(int)).mean() < 4
    # and it differs from the (wrong) YCbCr interpretation
    wrong = decode_jpeg(stream, color_transform="ycbcr")
    assert np.abs(wrong.astype(int) - img.astype(int)).mean() > 10
    # explicit kwarg path agrees with the TIFF path
    np.testing.assert_array_equal(
        got, decode_jpeg(stream, color_transform="rgb"))


def test_decode_jpeg_adobe_app14_transform0_auto_rgb():
    # an Adobe APP14 segment with transform byte 0 declares the
    # 3-component stream is RGB; "auto" must pick that up
    img = _blocky(16, 16, seed=8)
    stream = _encode_jpeg(rgb=img, color="rgb")
    app14 = b"\xff\xee" + struct.pack(">H", 14) + b"Adobe" \
        + b"\x00\x65\x00\x00\x00\x00\x00"
    tagged = stream[:2] + app14 + stream[2:]
    got = decode_jpeg(tagged)
    assert np.abs(got.astype(int) - img.astype(int)).mean() < 4
    # without the tag, auto stays YCbCr (JFIF default)
    plain = decode_jpeg(stream)
    assert np.abs(plain.astype(int) - img.astype(int)).mean() > 10
    with pytest.raises(ValueError):
        decode_jpeg(stream, color_transform="bgr")


def test_decode_tiff_jpeg_errors():
    img = _blocky(16, 16)
    stream = _encode_jpeg(rgb=img)
    # strip that is not a JPEG stream
    with pytest.raises(MediaDecodeError, match="SOI"):
        decode_tiff(_pack_tiff_jpeg([b"\x00" * 32], 16, 16, 16))
    # malformed JPEGTables (no SOI/EOI wrapper)
    with pytest.raises(MediaDecodeError, match="JPEGTables"):
        decode_tiff(_pack_tiff_jpeg([stream], 16, 16, 16,
                                    tables=b"\xff\xdb\x00\x02"))
    # strip smaller than the declared layout
    small = _encode_jpeg(rgb=_blocky(8, 8))
    with pytest.raises(MediaDecodeError, match="smaller than"):
        decode_tiff(_pack_tiff_jpeg([small], 16, 16, 16))
    # old-style JPEG (6) stays the declared seam
    with pytest.raises(MediaDecodeError, match="compression 6"):
        decode_tiff(_pack_tiff_jpeg([stream], 16, 16, 16, compression=6))


def _pack_tiff_oldjpeg(stream, w, h, bo="<", photometric=6,
                       with_length=True):
    """Independent writer for OLD-style JPEG TIFFs (compression 6,
    TIFF 6.0 Section 22): one full interchange stream pointed at by
    JPEGInterchangeFormat (513) [+ length (514)] — no strip tags."""
    entries = []

    def short(tag, v):
        entries.append((tag, 3, 1, struct.pack(bo + "HH", v, 0)))

    def long_(tag, v):
        entries.append((tag, 4, 1, struct.pack(bo + "I", v)))

    short(256, w); short(257, h); short(259, 6); short(262, photometric)
    short(277, 3); short(258, 8)
    n_entries = len(entries) + (2 if with_length else 1)
    data_off = 8 + 2 + n_entries * 12 + 4
    long_(513, data_off)
    if with_length:
        long_(514, len(stream))
    entries.sort()
    out = bytearray((b"II" if bo == "<" else b"MM")
                    + struct.pack(bo + "H", 42) + struct.pack(bo + "I", 8))
    out += struct.pack(bo + "H", len(entries))
    for tag, typ, cnt, val in entries:
        out += struct.pack(bo + "HHI", tag, typ, cnt) + val[:4].ljust(4, b"\0")
    out += struct.pack(bo + "I", 0)
    out += stream
    return bytes(out)


def test_decode_tiff_oldstyle_jpeg_interchange():
    # the common compression-6 form: full interchange stream at tag 513
    img = _blocky(16, 16, seed=4)
    stream = _encode_jpeg(rgb=img)
    got = decode_tiff(_pack_tiff_oldjpeg(stream, 16, 16))
    np.testing.assert_array_equal(got, decode_jpeg(stream))
    # missing length tag (514) defaults to rest-of-payload
    got2 = decode_tiff(_pack_tiff_oldjpeg(stream, 16, 16,
                                          with_length=False))
    np.testing.assert_array_equal(got2, decode_jpeg(stream))
    # big-endian IFD too
    got3 = decode_tiff(_pack_tiff_oldjpeg(stream, 16, 16, bo=">"))
    np.testing.assert_array_equal(got3, decode_jpeg(stream))


def test_decode_tiff_oldstyle_jpeg_photometric2_and_seam():
    img = _blocky(16, 16, seed=6)
    rgb_stream = _encode_jpeg(rgb=img, color="rgb")
    got = decode_tiff(_pack_tiff_oldjpeg(rgb_stream, 16, 16,
                                         photometric=2))
    assert np.abs(got.astype(int) - img.astype(int)).mean() < 4
    # tables-split variant (no 513) stays the NAMED seam
    ycc = _encode_jpeg(rgb=img)
    with pytest.raises(MediaDecodeError, match="tables-split"):
        decode_tiff(_pack_tiff_jpeg([ycc], 16, 16, 16, compression=6))
    # garbage at the 513 offset
    with pytest.raises(MediaDecodeError, match="SOI"):
        decode_tiff(_pack_tiff_oldjpeg(b"\x00" * 40, 16, 16))


def test_image_features_real_decode_jpeg_tiff(spark):
    """Operator-level: a compression-7 TIFF payload decodes on the
    image_features real path and lands near the source channel means."""
    from pyspark.sql import Row

    from valkey_search_spark.multimodal.columns import image_features

    src = _blocky(16, 16, seed=21)
    payload = _pack_tiff_jpeg([_encode_jpeg(rgb=src)], 16, 16, 16)
    df = spark.createDataFrame([Row(id=0, image=bytearray(payload))])
    row = image_features(df, fake=False).collect()[0]
    want = src.reshape(-1, 3).mean(axis=0)
    for got, exp in zip(row["img_mean"], want):
        assert abs(got - exp) < 4.0
