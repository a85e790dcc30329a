"""JPEG encoder + AVI container codec tests.

The JPEG DECODER is pinned by the independent forward pipeline in
test_media_codecs.py; here the engine's own ``encode_jpeg`` is pinned
against that decoder (round-trip bounds) and against the independent
test encoder (both streams must decode to the same pixels for the same
quantization tables). The AVI reader is pinned by a HAND-PACKED
container built with raw struct writes, independent of ``encode_avi``.
"""
from __future__ import annotations

import struct

import numpy as np
import pytest

from valkey_search_spark.multimodal.codecs import (
    MediaDecodeError,
    decode_avi_frames,
    decode_jpeg,
    encode_avi,
    encode_jpeg,
)
from valkey_search_spark.multimodal.metadata import sniff_media

rng = np.random.default_rng(20260814)


# ---------------------------------------------------------------------------
# encode_jpeg

def test_jpeg_encode_block_constant_near_exact():
    # 8x8-constant blocks are DC-only: error bounded by DC quantization
    src = np.repeat(np.repeat(
        rng.integers(0, 256, (3, 4, 3), dtype=np.uint8), 8, 0), 8, 1)
    for q, tol in ((95, 1), (85, 2), (50, 4)):
        out = decode_jpeg(encode_jpeg(src, quality=q))
        assert np.abs(out.astype(int) - src.astype(int)).max() <= tol


def test_jpeg_encode_subsampled_16px_blocks_near_exact():
    # 16x16-constant blocks stay constant under 2x2 chroma subsampling
    src = np.repeat(np.repeat(
        rng.integers(0, 256, (2, 3, 3), dtype=np.uint8), 16, 0), 16, 1)
    out = decode_jpeg(encode_jpeg(src, quality=95, subsample=True))
    assert np.abs(out.astype(int) - src.astype(int)).max() <= 2


def test_jpeg_encode_gradient_tight():
    xx, yy = np.meshgrid(np.arange(40), np.arange(24))
    src = np.stack([xx * 3 % 256, yy * 5 % 256, (xx + yy) * 2 % 256],
                   -1).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(src, quality=95))
    assert np.abs(out.astype(int) - src.astype(int)).max() <= 4


def test_jpeg_encode_gray_and_odd_dims():
    # smooth ramp (no modulo wrap: a wrap is a sharp edge that rings)
    g = np.add.outer(np.arange(17) * 3, np.arange(23) * 5).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(g, quality=92))
    assert out.shape == (17, 23, 3)
    assert np.abs(out[:, :, 0].astype(int) - g.astype(int)).max() <= 6
    assert (out[:, :, 0] == out[:, :, 1]).all()


def test_jpeg_encode_noise_bounded_and_quality_monotone():
    src = rng.integers(0, 256, (33, 29, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(src, quality=95))
    assert out.shape == src.shape
    assert np.abs(out.astype(int) - src.astype(int)).max() <= 48
    sizes = [len(encode_jpeg(src, quality=q)) for q in (20, 50, 85, 95)]
    assert sizes == sorted(sizes)


def test_jpeg_encode_matches_independent_encoder_pixels():
    # Same Annex K tables (quality=50 scale factor is exactly 1.0), no
    # subsampling: the engine encoder and the INDEPENDENT test-suite
    # encoder must decode to (near-)identical pixels — the entropy
    # layers differ (optimal vs fixed-length Huffman) but the quantized
    # coefficients are the same up to FDCT float rounding.
    from tests.test_media_codecs import _encode_jpeg as independent_encode

    src = np.repeat(np.repeat(
        rng.integers(0, 256, (4, 5, 3), dtype=np.uint8), 4, 0), 4, 1)
    mine = decode_jpeg(encode_jpeg(src, quality=50))
    theirs = decode_jpeg(independent_encode(rgb=src))
    assert np.abs(mine.astype(int) - theirs.astype(int)).max() <= 1
    # and optimal Huffman should not be larger than fixed-length codes
    assert len(encode_jpeg(src, quality=50)) <= len(independent_encode(rgb=src))


def test_jpeg_encode_rejects_bad_input():
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((4, 4, 3), dtype=np.float32))
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((4, 4, 2), dtype=np.uint8))
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((0, 4, 3), dtype=np.uint8))


# ---------------------------------------------------------------------------
# AVI round trips

def _frames(n, h=16, w=24):
    return [rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            for _ in range(n)]


def test_avi_dib_round_trip_exact():
    frames = _frames(5)
    out, fps = decode_avi_frames(encode_avi(frames, fps=12.5, codec="DIB "))
    assert fps == pytest.approx(12.5, rel=1e-3)
    assert len(out) == 5
    for a, b in zip(frames, out):
        assert (a == b).all()


def test_avi_mjpg_round_trip_bounded():
    frames = [np.repeat(np.repeat(
        rng.integers(0, 256, (2, 3, 3), dtype=np.uint8), 8, 0), 8, 1)
        for _ in range(4)]
    out, fps = decode_avi_frames(
        encode_avi(frames, fps=30, codec="MJPG", quality=95))
    assert fps == pytest.approx(30.0, rel=1e-3)
    assert len(out) == 4
    for a, b in zip(frames, out):
        assert np.abs(a.astype(int) - b.astype(int)).max() <= 1


def test_avi_max_frames_bounds_decode():
    out, _ = decode_avi_frames(encode_avi(_frames(6), codec="DIB "),
                               max_frames=2)
    assert len(out) == 2


def test_avi_odd_payload_word_alignment():
    # MJPG payload lengths are arbitrary (odd sizes force pad bytes);
    # every frame must still be found after an odd-sized predecessor
    frames = [np.full((8, 8, 3), 17 * i % 256, dtype=np.uint8)
              for i in range(7)]
    blob = encode_avi(frames, codec="MJPG", quality=40)
    out, _ = decode_avi_frames(blob)
    assert len(out) == 7


def test_avi_rejects_malformed():
    with pytest.raises(MediaDecodeError):
        decode_avi_frames(b"RIFF\x00\x00\x00\x00WAVE")
    with pytest.raises(MediaDecodeError):
        decode_avi_frames(b"\x00" * 32)
    # valid RIFF/AVI but no movi list
    body = b"AVI "
    with pytest.raises(MediaDecodeError):
        decode_avi_frames(b"RIFF" + struct.pack("<I", len(body)) + body)


def test_avi_unsupported_compression_raises():
    blob = bytearray(encode_avi(_frames(1), codec="MJPG"))
    i = blob.find(b"MJPG", 12)          # strh handler fourcc
    j = blob.find(b"MJPG", i + 4)       # strf biCompression
    blob[i:i + 4] = b"H264"
    blob[j:j + 4] = b"H264"
    with pytest.raises(MediaDecodeError, match="ffmpeg seam"):
        decode_avi_frames(bytes(blob))


# ---------------------------------------------------------------------------
# hand-packed AVI: pins the reader independently of encode_avi

def _hand_packed_avi(frame: np.ndarray, wrap_rec: bool = False) -> bytes:
    h, w = frame.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :w * 3] = frame[::-1, :, ::-1].reshape(h, w * 3)
    dib = rows.tobytes()

    def ck(ckid, data):
        return ckid + struct.pack("<I", len(data)) + data \
            + (b"\0" if len(data) & 1 else b"")

    avih = struct.pack("<14I", 40000, 0, 0, 0, 1, 0, 1, len(dib),
                       w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"DIB " + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0,
                                            1, 25, 0, 1, len(dib), 0, 0)
            + struct.pack("<4h", 0, 0, w, h))
    strf = (struct.pack("<IiiHH", 40, w, h, 1, 24) + b"\0\0\0\0"
            + struct.pack("<IiiII", len(dib), 0, 0, 0, 0))
    hdrl = ck(b"LIST", b"hdrl" + ck(b"avih", avih)
              + ck(b"LIST", b"strl" + ck(b"strh", strh) + ck(b"strf", strf)))
    frame_ck = ck(b"00db", dib)          # 'db' = uncompressed chunk id
    if wrap_rec:
        frame_ck = ck(b"LIST", b"rec " + frame_ck)
    movi = ck(b"LIST", b"movi" + frame_ck)
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


@pytest.mark.parametrize("wrap_rec", [False, True])
def test_avi_hand_packed_decodes(wrap_rec):
    frame = rng.integers(0, 256, (6, 10, 3), dtype=np.uint8)
    out, fps = decode_avi_frames(_hand_packed_avi(frame, wrap_rec))
    assert fps == pytest.approx(25.0)
    assert len(out) == 1
    assert (out[0] == frame).all()


# ---------------------------------------------------------------------------
# metadata sniffer

def test_sniff_avi_geometry_and_duration():
    blob = encode_avi(_frames(10, h=32, w=48), fps=20.0, codec="DIB ")
    meta = sniff_media(blob[:65536], len(blob))
    assert meta["format"] == "avi" and meta["kind"] == "video"
    assert (meta["width"], meta["height"]) == (48, 32)
    assert meta["duration_sec"] == pytest.approx(0.5, rel=1e-3)
    assert meta["payload_bytes"] == len(blob)


def test_sniff_avi_headerless_still_classifies():
    meta = sniff_media(b"RIFF\x10\x00\x00\x00AVI LIST", 24)
    assert meta["format"] == "avi" and meta["width"] is None


# ---------------------------------------------------------------------------
# Spark: the real video_frame_sample path over AVI payloads

def test_video_frame_sample_real_avi(spark):
    import pandas as pd
    from pyspark.sql import functions as F, types as T

    from valkey_search_spark.multimodal.codecs import decode_bmp
    from valkey_search_spark.multimodal.columns import video_frame_sample

    def make_clip(vid: int) -> bytes:
        frames = [np.full((8, 8, 3), (vid * 31 + i * 7) % 256,
                          dtype=np.uint8) for i in range(5)]
        return encode_avi(frames, fps=10, codec="DIB ")

    pdf = pd.DataFrame({"vid": [1, 2, 3]})
    df = spark.createDataFrame(pdf).withColumn(
        "video",
        F.udf(lambda v: make_clip(v), T.BinaryType())(F.col("vid")))
    out = video_frame_sample(df, binary_col="video", every_n=2,
                             fake=False).toPandas()
    # 5 frames sampled every 2 -> frames 0, 2, 4 per clip
    assert sorted(out["frame_no"].unique()) == [0, 2, 4]
    assert len(out) == 9
    row = out[(out.vid == 2) & (out.frame_no == 2)].iloc[0]
    px = decode_bmp(bytes(row["frame"]))
    assert (px == (2 * 31 + 2 * 7) % 256).all()


def test_avi_corruption_fuzz_raises_cleanly():
    # error contract: any truncation or byte corruption either decodes
    # (harmless flip in pixel data) or raises exactly MediaDecodeError —
    # never MemoryError/IndexError/struct.error
    base = encode_avi(_frames(3, h=8, w=8), codec="MJPG", quality=60)
    frng = np.random.default_rng(4)
    for cut in (10, 40, len(base) // 2, len(base) - 3):
        try:
            decode_avi_frames(base[:cut])
        except MediaDecodeError:
            pass
    for _ in range(60):
        blob = bytearray(base)
        for _ in range(frng.integers(1, 4)):
            blob[frng.integers(0, len(blob))] = frng.integers(0, 256)
        try:
            decode_avi_frames(bytes(blob), max_frames=8)
        except MediaDecodeError:
            pass
        except NotImplementedError:
            pass   # a flipped fourcc can look like an unknown codec


def test_jpeg_encoder_dimension_bomb_guard():
    # the decoder's pixel budget must also bound what our encoder's
    # payloads can claim — craft a huge-dims header on a tiny body
    import struct as _s

    blob = bytearray(encode_jpeg(np.zeros((8, 8, 3), dtype=np.uint8)))
    i = blob.find(b"\xff\xc0")
    # SOF0 payload: len(2) prec(1) h(2) w(2) — overwrite h/w with 30000
    _s.pack_into(">HH", blob, i + 5, 30000, 30000)
    with pytest.raises(MediaDecodeError):
        decode_jpeg(bytes(blob))


def test_image_resize_formats_round_trip(spark):
    import pandas as pd
    from pyspark.sql import functions as F, types as T

    from valkey_search_spark.multimodal.codecs import (
        decode_bmp, decode_png, encode_bmp,
    )
    from valkey_search_spark.multimodal.columns import image_resize

    src = np.repeat(np.repeat(
        rng.integers(0, 256, (4, 4, 3), dtype=np.uint8), 8, 0), 8, 1)
    blob = encode_bmp(src)
    df = spark.createDataFrame(pd.DataFrame({"i": [1]})).withColumn(
        "image", F.udf(lambda _: blob, T.BinaryType())("i"))
    decoders = {"bmp": decode_bmp, "png": decode_png, "jpeg": decode_jpeg}
    sizes = {}
    for fmt, dec in decoders.items():
        row = image_resize(df, size=16, fake=False, out_format=fmt,
                           quality=95).collect()[0]
        assert row["image_resized_meta"]["format"] == fmt
        px = dec(bytes(row["image_resized"]))
        assert px.shape == (16, 16, 3)
        # nearest-neighbor of block-constant input stays near-constant
        want = src[np.linspace(0, 31, 16).astype(int)][
            :, np.linspace(0, 31, 16).astype(int)]
        tol = 0 if fmt in ("bmp", "png") else 12
        assert np.abs(px.astype(int) - want.astype(int)).max() <= tol
        sizes[fmt] = len(bytes(row["image_resized"]))
    assert sizes["jpeg"] < sizes["bmp"]
    with pytest.raises(ValueError, match="out_format"):
        image_resize(df, out_format="webp")
