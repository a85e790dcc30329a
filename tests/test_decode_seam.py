"""Decoder-injection seam (round-6 verdict item 6): a caller-supplied
``decode_fn(format, bytes)`` closes the lossy-media gap (WebP/MP4/MP3…)
without forking — the vendored codecs stay the default path and are
never bypassed, and absent a decode_fn the declared seams still raise.
"""
from __future__ import annotations

import numpy as np
import pytest

from valkey_search_spark.multimodal.codecs import decode_bmp, encode_bmp
from valkey_search_spark.multimodal.columns import (
    audio_features, image_features, image_resize, sniff_format,
    video_frame_sample,
)

# payloads with real container signatures the vendored codecs do NOT
# decode — exactly the seam formats
WEBP = b"RIFF\x10\x00\x00\x00WEBPVP8 " + bytes(range(32))
MP4 = b"\x00\x00\x00\x18ftypisom" + bytes(16)
MP3 = b"ID3\x04\x00" + bytes(40)


def test_sniff_format_tags():
    assert sniff_format(WEBP) == "webp"
    assert sniff_format(MP4) == "mp4"
    assert sniff_format(MP3) == "mp3"
    assert sniff_format(b"\x1aE\xdf\xa3xx") == "webm"
    assert sniff_format(b"OggSxxxx") == "ogg"
    assert sniff_format(b"\xff\xfb\x90\x00") == "mp3"
    assert sniff_format(b"garbage") == "unknown"
    assert sniff_format(None) == "unknown"


def _img_stub(fmt, payload):
    # deterministic 4x4 gradient keyed by the payload's last byte
    if fmt != "webp":
        return None
    base = payload[-1]
    return (np.arange(48, dtype=np.int64).reshape(4, 4, 3)
            + base).astype(np.uint8) % 256


def test_image_features_injected_decoder(spark):
    df = spark.createDataFrame([(1, bytearray(WEBP))],
                               "id long, image binary")
    r = image_features(df, fake=False, decode_fn=_img_stub).collect()[0]
    want = _img_stub("webp", WEBP)
    assert r.img_mean == pytest.approx(
        [float(x) for x in want.mean(axis=(0, 1))])
    # vendored formats never reach the injected decoder
    calls = []

    def spy(fmt, payload):
        calls.append(fmt)
        return _img_stub("webp", WEBP)

    bmp = encode_bmp(np.full((4, 4, 3), 7, dtype=np.uint8))
    df2 = spark.createDataFrame([(1, bytearray(bmp))],
                                "id long, image binary")
    r2 = image_features(df2, fake=False, decode_fn=spy).collect()[0]
    assert r2.img_mean == [7.0, 7.0, 7.0]
    # (spy list mutates in the driver only under local mode's in-process
    # python workers; assert via the VALUE instead: vendored bytes won)


def test_image_features_still_raises_without_decode_fn(spark):
    df = spark.createDataFrame([(1, bytearray(WEBP))],
                               "id long, image binary")
    with pytest.raises(Exception, match="decode_fn|NotImplemented|only BMP"):
        image_features(df, fake=False).collect()
    # and a decode_fn that declines (returns None) preserves the raise
    with pytest.raises(Exception, match="decode_fn|NotImplemented|only BMP"):
        image_features(df, fake=False,
                       decode_fn=lambda f, p: None).collect()


def test_image_resize_injected_decoder(spark):
    df = spark.createDataFrame([(1, bytearray(WEBP))],
                               "id long, image binary")
    out = image_resize(df, fake=False, size=8,
                       decode_fn=_img_stub).collect()[0]
    dec = decode_bmp(bytes(out.image_resized))
    assert dec.shape == (8, 8, 3)
    assert out.image_resized_meta["format"] == "bmp"


def test_audio_features_injected_decoder(spark):
    def stub(fmt, payload):
        if fmt != "mp3":
            return None
        return np.ones(8000, dtype=np.float32) * 0.5, 8000

    df = spark.createDataFrame([(1, bytearray(MP3))],
                               "id long, audio binary")
    r = audio_features(df, fake=False, decode_fn=stub).collect()[0]
    assert r.audio_rms == pytest.approx(0.5)
    assert r.audio_seconds == pytest.approx(1.0)


def test_video_frame_sample_injected_decoder(spark):
    def stub(fmt, payload):
        if fmt != "mp4":
            return None
        return [np.full((2, 2, 3), i, dtype=np.uint8) for i in range(5)]

    df = spark.createDataFrame([(1, bytearray(MP4))],
                               "id long, video binary")
    rows = video_frame_sample(df, fake=False, every_n=2,
                              decode_fn=stub).collect()
    assert sorted(r.frame_no for r in rows) == [0, 2, 4]
    for r in rows:
        dec = decode_bmp(bytes(r.frame))
        assert int(dec[0, 0, 0]) == r.frame_no
    # non-matching payloads still raise through the seam
    bad = spark.createDataFrame([(1, bytearray(b"garbage1234"))],
                                "id long, video binary")
    with pytest.raises(Exception, match="ffmpeg|NotImplemented"):
        video_frame_sample(bad, fake=False, decode_fn=stub).collect()


def test_video_decode_fn_max_frames_cap(spark):
    def stub(fmt, payload):
        return [np.zeros((2, 2, 3), dtype=np.uint8)] * 100

    df = spark.createDataFrame([(1, bytearray(MP4))],
                               "id long, video binary")
    rows = video_frame_sample(df, fake=False, every_n=1, max_frames=10,
                              decode_fn=stub).collect()
    assert len(rows) == 10


def test_seam_end_to_end_all_modalities_through_webdataset(spark, tmp_path):
    """R9 verdict item 5: drive all three lossy modalities (WebP image,
    MP3 audio, MP4 video) through the WebDataset loop AND the decode
    seam in one flow — write shards, read them back, decode with
    injected decoders — and pin that the result equals the direct
    (non-WebDataset) path byte-for-byte, while vendored-codec payloads
    in the same corpus decode without touching the injected decoder."""
    from pyspark.sql import functions as F

    from valkey_search_spark.multimodal.codecs import encode_bmp, encode_wav
    from valkey_search_spark.sources.webdataset import (
        pivot_samples, read_webdataset, write_webdataset)

    bmp = encode_bmp(np.full((4, 4, 3), 9, dtype=np.uint8))
    wav = encode_wav(np.full(4000, 0.25, dtype=np.float32), 8000)
    # row 1 carries lossy payloads on every modality, row 2 vendored
    df = spark.createDataFrame(
        [("s1", bytearray(WEBP), bytearray(MP3), bytearray(MP4)),
         ("s2", bytearray(bmp), bytearray(wav), None)],
        "k string, image binary, audio binary, video binary")
    path = str(tmp_path / "lossy_wds")
    write_webdataset(df, path, "k",
                     {"image": "img", "audio": "aud", "video": "vid"},
                     n_shards=1)
    wide = (pivot_samples(read_webdataset(spark, path),
                          ["img", "aud", "vid"], within_shard=False)
            .select(F.col("key").alias("k"),
                    F.col("img").alias("image"),
                    F.col("aud").alias("audio"),
                    F.col("vid").alias("video")))

    def img_fn(fmt, payload):
        return _img_stub(fmt, payload)

    def aud_fn(fmt, payload):
        if fmt != "mp3":
            return None
        return np.ones(8000, dtype=np.float32) * 0.5, 8000

    def vid_fn(fmt, payload):
        if fmt != "mp4":
            return None
        return [np.full((2, 2, 3), i, dtype=np.uint8) for i in range(4)]

    def by_key(rows, *fields):
        return {r["k"]: tuple(
            tuple(r[f]) if isinstance(r[f], list) else r[f]
            for f in fields) for r in rows}

    for src in (df, wide):
        imgs = by_key(image_features(src.select("k", "image"),
                                     fake=False, decode_fn=img_fn)
                      .collect(), "img_mean", "img_phash")
        auds = by_key(audio_features(src.select("k", "audio"),
                                     fake=False, decode_fn=aud_fn)
                      .collect(), "audio_rms", "audio_seconds")
        vids = sorted(
            (r["k"], r["frame_no"], bytes(r["frame"])) for r in
            video_frame_sample(src.select("k", "video").dropna(),
                               fake=False, every_n=2,
                               decode_fn=vid_fn).collect())
        if src is df:
            direct = (imgs, auds, vids)
    assert (imgs, auds, vids) == direct
    # injected outputs flowed: lossy row decoded via the stubs
    want = _img_stub("webp", WEBP)
    assert list(imgs["s1"][0]) == pytest.approx(
        [float(x) for x in want.mean(axis=(0, 1))])
    assert auds["s1"][0] == pytest.approx(0.5)
    assert [f for k, f, _ in vids if k == "s1"] == [0, 2]
    # vendored payloads decoded by the in-repo codecs (stubs declined)
    assert list(imgs["s2"][0]) == [9.0, 9.0, 9.0]
    assert auds["s2"][0] == pytest.approx(0.25, abs=1e-3)  # int16 WAV quantization
