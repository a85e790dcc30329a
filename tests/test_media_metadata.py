"""Tests for header-sniffing media metadata and the G.711/ADPCM WAV
decode extensions.

Independence of implementations: image/audio fixtures are hand-packed
with struct from the public format layouts (not via this repo's
encoders, except where an encoder round-trip is itself the thing under
test); the G.711 expansions are cross-checked against the stdlib
``audioop`` tables, and the IMA ADPCM vector kernel against a scalar
per-nibble reference implementation written here from the published
algorithm.
"""

import struct

import numpy as np
import pytest
from pyspark.sql import Row, functions as F

from valkey_search_spark.multimodal.codecs import (
    decode_wav, encode_bmp, encode_png, encode_wav,
)
from valkey_search_spark.multimodal.metadata import (
    media_metadata, sniff_media,
)

audioop = pytest.importorskip("audioop")


# ---------------------------------------------------------------------------
# fixture packers (independent of the sniffer, from the public specs)

def _jpeg_with_sof(marker: int, w: int, h: int, ncomp: int = 3,
                   pad_before_sof: int = 0) -> bytes:
    """SOI + optional APP padding + DQT stub + SOFn; no scan data (the
    sniffer never needs entropy-coded bytes)."""
    out = b"\xff\xd8"
    if pad_before_sof:
        body = b"\0" * pad_before_sof
        out += b"\xff\xe1" + struct.pack(">H", 2 + len(body)) + body
    comp = b"".join(struct.pack("BBB", i + 1, 0x11, 0) for i in range(ncomp))
    sof = struct.pack(">BHHB", 8, h, w, ncomp) + comp
    out += bytes([0xFF, marker]) + struct.pack(">H", 2 + len(sof)) + sof
    return out


def _flac(rate: int, ch: int, bits: int, total_samples: int) -> bytes:
    packed = (rate << 44) | ((ch - 1) << 41) | ((bits - 1) << 36) | total_samples
    streaminfo = (struct.pack(">HH", 16, 16) + b"\0" * 6
                  + packed.to_bytes(8, "big") + b"\0" * 16)
    return b"fLaC" + bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo


def _mp3_frame_header(stereo: bool = True) -> bytes:
    # MPEG1 Layer III, bitrate index 9 (128 kbps), 44100 Hz
    mode = 0x00 if stereo else 0xC0
    return bytes([0xFF, 0xFB, 0x90, mode])


def _webp_vp8l(w: int, h: int) -> bytes:
    bits = (w - 1) | ((h - 1) << 14)
    payload = bytes([0x2F]) + struct.pack("<I", bits)
    return (b"RIFF" + struct.pack("<I", 4 + 8 + len(payload)) + b"WEBP"
            + b"VP8L" + struct.pack("<I", len(payload)) + payload)


def _webp_vp8(w: int, h: int) -> bytes:
    payload = (b"\0\0\0" + b"\x9d\x01\x2a"
               + struct.pack("<HH", w & 0x3FFF, h & 0x3FFF))
    return (b"RIFF" + struct.pack("<I", 4 + 8 + len(payload)) + b"WEBP"
            + b"VP8 " + struct.pack("<I", len(payload)) + payload)


def _ogg_vorbis(rate: int, ch: int) -> bytes:
    ident = b"\x01vorbis" + struct.pack("<IB I", 0, ch, rate)
    return b"OggS" + b"\0" * 22 + ident


# ---------------------------------------------------------------------------
# sniff_media

def test_sniff_bmp_png_roundtrip_dims():
    arr = np.arange(5 * 7 * 3, dtype=np.uint8).reshape(5, 7, 3)
    m = sniff_media(encode_bmp(arr), 999)
    assert (m["format"], m["kind"]) == ("bmp", "image")
    assert (m["width"], m["height"], m["channels"]) == (7, 5, 3)
    assert m["payload_bytes"] == 999
    m = sniff_media(encode_png(arr), 1)
    assert (m["format"], m["width"], m["height"], m["channels"],
            m["bit_depth"]) == ("png", 7, 5, 3, 8)


def test_sniff_bmp_core_header_and_unknown_dib():
    # OS/2 BITMAPCOREHEADER: 12-byte DIB header, uint16 dims at 18/20
    core = (b"BM" + struct.pack("<IHHI", 26, 0, 0, 26)
            + struct.pack("<IHHHH", 12, 100, 50, 1, 24))
    m = sniff_media(core, 26)
    assert (m["format"], m["width"], m["height"], m["channels"]) == (
        "bmp", 100, 50, 3)
    # unknown DIB header size: format-only, never garbage dims
    weird = (b"BM" + struct.pack("<IHHI", 40, 0, 0, 40)
             + struct.pack("<I", 16) + b"\xff" * 24)
    m = sniff_media(weird, 40)
    assert m["format"] == "bmp" and m["width"] is None


def test_sniff_jpeg_baseline_and_progressive():
    for marker in (0xC0, 0xC2):              # baseline, progressive
        m = sniff_media(_jpeg_with_sof(marker, w=640, h=480), 100)
        assert (m["format"], m["width"], m["height"], m["channels"]) == (
            "jpeg", 640, 480, 3)


def test_sniff_jpeg_sof_past_prefix_degrades_to_format_only():
    payload = _jpeg_with_sof(0xC0, w=9, h=9, pad_before_sof=5000)
    m = sniff_media(payload[:1024], len(payload))
    assert m["format"] == "jpeg"
    assert m["width"] is None and m["height"] is None


def test_sniff_gif_and_webp():
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\0\0"
    m = sniff_media(gif, 10)
    assert (m["format"], m["width"], m["height"]) == ("gif", 320, 200)
    m = sniff_media(_webp_vp8l(33, 17), 0)
    assert (m["format"], m["width"], m["height"]) == ("webp", 33, 17)
    m = sniff_media(_webp_vp8(64, 48), 0)
    assert (m["format"], m["width"], m["height"]) == ("webp", 64, 48)


def test_sniff_wav_duration_from_byte_rate():
    wav = encode_wav(np.zeros(44100, dtype=np.float32), 44100)
    m = sniff_media(wav, len(wav))
    assert (m["format"], m["kind"]) == ("wav", "audio")
    assert (m["sample_rate"], m["channels"], m["bit_depth"]) == (44100, 1, 16)
    assert m["duration_sec"] == pytest.approx(1.0)


def test_sniff_flac_streaminfo():
    m = sniff_media(_flac(48000, 2, 24, 96000), 5)
    assert (m["format"], m["sample_rate"], m["channels"],
            m["bit_depth"]) == ("flac", 48000, 2, 24)
    assert m["duration_sec"] == pytest.approx(2.0)


def test_sniff_mp3_cbr_estimate():
    total = 16000 + 4                         # 1 s at 128 kbps
    m = sniff_media(_mp3_frame_header(), total)
    assert (m["format"], m["sample_rate"], m["channels"]) == ("mp3", 44100, 2)
    assert m["duration_sec"] == pytest.approx(total * 8 / 128000, rel=1e-3)


def test_sniff_mp3_xing_frame_count_and_id3_skip():
    frame = bytearray(_mp3_frame_header(stereo=True)) + b"\0" * 200
    # MPEG1 stereo: Xing at frame start + 36
    frame[36:48] = b"Xing" + struct.pack(">II", 1, 100)
    id3 = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 10]) + b"\0" * 10
    m = sniff_media(bytes(id3 + frame), 10_000_000)
    assert m["duration_sec"] == pytest.approx(100 * 1152 / 44100)


def test_sniff_ogg_vorbis():
    m = sniff_media(_ogg_vorbis(22050, 1), 7)
    assert (m["format"], m["sample_rate"], m["channels"]) == ("ogg", 22050, 1)
    assert m["duration_sec"] is None          # no closing page in prefix


def _ogg_page(granule: int) -> bytes:
    # OggS + version + header_type + granule(8 LE) + serial/seq/crc + nsegs
    return (b"OggS" + b"\x00\x04" + struct.pack("<q", granule)
            + b"\0" * 13)


def test_sniff_ogg_duration_from_last_page_granule():
    payload = _ogg_vorbis(22050, 1) + b"\0" * 50 + _ogg_page(44100)
    m = sniff_media(payload[:64], len(payload), suffix=payload[-32:])
    assert m["duration_sec"] == pytest.approx(44100 / 22050)
    # opus granules tick at 48 kHz regardless of input rate
    opus = (b"OggS" + b"\0" * 22 + b"OpusHead" + b"\x01" + bytes([2])
            + b"\0\0" + struct.pack("<I", 16000) + b"\0" * 3
            + _ogg_page(96000))
    m = sniff_media(opus, len(opus), suffix=opus)
    assert (m["sample_rate"], m["channels"]) == (16000, 2)
    assert m["duration_sec"] == pytest.approx(2.0)


def _box(tag: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + tag + body


def _mp4(moov_first: bool, ver: int = 0) -> bytes:
    ftyp = _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    if ver == 0:
        mvhd = _box(b"mvhd", bytes([0, 0, 0, 0])
                    + struct.pack(">IIII", 0, 0, 1000, 7500) + b"\0" * 80)
        tkhd_body = (bytes([0, 0, 0, 0])
                     + struct.pack(">IIIII", 0, 0, 1, 0, 7500)
                     + b"\0" * 8 + b"\0" * 8 + b"\0" * 36
                     + struct.pack(">II", 640 << 16, 360 << 16))
    else:
        mvhd = _box(b"mvhd", bytes([1, 0, 0, 0])
                    + struct.pack(">QQIQ", 0, 0, 1000, 7500) + b"\0" * 80)
        tkhd_body = (bytes([1, 0, 0, 0])
                     + struct.pack(">QQII", 0, 0, 1, 0)
                     + struct.pack(">Q", 7500)
                     + b"\0" * 8 + b"\0" * 8 + b"\0" * 36
                     + struct.pack(">II", 640 << 16, 360 << 16))
    moov = _box(b"moov", mvhd + _box(b"trak", _box(b"tkhd", tkhd_body)))
    mdat = _box(b"mdat", b"\xab" * 4000)
    return (ftyp + moov + mdat) if moov_first else (ftyp + mdat + moov)


def test_sniff_mp4_faststart_and_trailing_moov():
    for ver in (0, 1):
        fast = _mp4(moov_first=True, ver=ver)
        m = sniff_media(fast[:1024], len(fast))
        assert (m["format"], m["kind"]) == ("mp4", "video")
        assert (m["width"], m["height"]) == (640, 360)
        assert m["duration_sec"] == pytest.approx(7.5)
    # trailing moov: found only via the tail slice
    trail = _mp4(moov_first=False)
    m = sniff_media(trail[:256], len(trail), suffix=trail[-512:])
    assert (m["width"], m["height"], m["duration_sec"]) == (
        640, 360, pytest.approx(7.5))
    m2 = sniff_media(trail[:256], len(trail))   # no tail: format only
    assert m2["format"] == "mp4" and m2["width"] is None


def test_sniff_mp4_audio_track_dims_skipped():
    # a 0x0 (audio) tkhd before the video track must not win
    audio_tkhd = _box(b"tkhd", bytes([0, 0, 0, 0])
                      + struct.pack(">IIIII", 0, 0, 2, 0, 7500)
                      + b"\0" * 8 + b"\0" * 8 + b"\0" * 36
                      + struct.pack(">II", 0, 0))
    video = _mp4(moov_first=True)
    ftyp_len = len(_box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2"))
    payload = video[:ftyp_len] + _box(b"moov", audio_tkhd) + video[ftyp_len:]
    m = sniff_media(payload, len(payload))
    assert (m["width"], m["height"]) == (640, 360)


def _tiff(big_endian: bool, w: int, h: int) -> bytes:
    bo = ">" if big_endian else "<"
    hdr = (b"MM\x00*" if big_endian else b"II*\x00") + struct.pack(bo + "I", 8)
    entries = [
        (256, 4, 1, w),                       # ImageWidth LONG
        (257, 3, 1, h),                       # ImageLength SHORT
        (258, 3, 1, 8),                       # BitsPerSample
        (277, 3, 1, 3),                       # SamplesPerPixel
    ]
    ifd = struct.pack(bo + "H", len(entries))
    for tag, typ, cnt, v in entries:
        val = struct.pack(bo + "I", v) if typ == 4 else \
            struct.pack(bo + "H", v) + b"\0\0"
        ifd += struct.pack(bo + "HHI", tag, typ, cnt) + val
    return hdr + ifd + struct.pack(bo + "I", 0)


def test_sniff_tiff_both_endians():
    for be in (False, True):
        m = sniff_media(_tiff(be, 1200, 900), 64)
        assert (m["format"], m["kind"]) == ("tiff", "image")
        assert (m["width"], m["height"], m["channels"],
                m["bit_depth"]) == (1200, 900, 3, 8)
    m = sniff_media(b"II*\x00" + b"\xff" * 4, 8)   # truncated: format only
    assert m["format"] == "tiff" and m["width"] is None


def test_sniff_aiff_comm():
    # 80-bit extended 44100.0: biased exp 16398, mantissa 0xAC44 << 48
    # (0xAC44 * 2^48 * 2^(16398-16383-63) = 44100)
    rate80 = struct.pack(">H", 16398) + struct.pack(">Q", 0xAC44 << 48)
    comm = b"COMM" + struct.pack(">I", 18) + struct.pack(
        ">HI H", 2, 88200, 16) + rate80
    payload = b"FORM" + struct.pack(">I", 4 + len(comm)) + b"AIFF" + comm
    m = sniff_media(payload, len(payload))
    assert (m["format"], m["kind"]) == ("aiff", "audio")
    assert (m["sample_rate"], m["channels"], m["bit_depth"]) == (44100, 2, 16)
    assert m["duration_sec"] == pytest.approx(2.0)


def test_sniff_aiff_malformed_rate_degrades():
    """Overflowing exponents, infinities, and negative rates in the
    80-bit field degrade to null metadata — never raise, never emit a
    negative sample rate."""
    for se in (0xFFFE, 16383 + 64 + 1000, 0x8000 | 16398):
        rate80 = struct.pack(">H", se) + struct.pack(">Q", 0xAC44 << 48)
        comm = b"COMM" + struct.pack(">I", 18) + struct.pack(
            ">HIH", 2, 88200, 16) + rate80
        payload = b"FORM" + struct.pack(">I", 4 + len(comm)) + b"AIFF" + comm
        m = sniff_media(payload, len(payload))
        assert m["format"] == "aiff"
        assert m["sample_rate"] is None and m["duration_sec"] is None


def test_sniff_mp4_random_tag_collision_rejected():
    """A bare 'mvhd'/'tkhd' byte string inside mdat data (no valid box
    size/version) must not produce metadata."""
    ftyp = _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    mdat = _box(b"mdat", b"xx" + b"mvhd" + b"\x07" + b"\xff" * 40
                + b"tkhd" + b"\x02" + b"\xee" * 100)
    payload = ftyp + mdat
    m = sniff_media(payload, len(payload))
    assert m["format"] == "mp4"
    assert m["duration_sec"] is None and m["width"] is None


def test_sniff_matroska_webm():
    mkv = b"\x1a\x45\xdf\xa3" + b"\x42\x82\x88matroska" + b"\0" * 16
    webm = b"\x1a\x45\xdf\xa3" + b"\x42\x82\x84webm" + b"\0" * 16
    assert sniff_media(mkv, 99)["format"] == "mkv"
    m = sniff_media(webm, 99)
    assert (m["format"], m["kind"]) == ("webm", "video")


def test_sniff_unknown_payload():
    m = sniff_media(b"not a media file at all", 23)
    assert m["format"] is None and m["kind"] is None
    assert m["payload_bytes"] == 23


# ---------------------------------------------------------------------------
# G.711 / ADPCM WAV decode

def _wav_container(fmt_code: int, ch: int, rate: int, bits: int,
                   block_align: int, data: bytes) -> bytes:
    fmt = struct.pack("<HHIIHH", fmt_code, ch, rate,
                      rate * max(1, block_align), block_align, bits)
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def test_g711_ulaw_matches_audioop():
    codes = bytes(range(256))
    frames, rate, ch = decode_wav(_wav_container(7, 1, 8000, 8, 1, codes))
    assert (rate, ch) == (8000, 1)
    expect = np.frombuffer(audioop.ulaw2lin(codes, 2), dtype="<i2")
    np.testing.assert_array_equal(
        np.round(frames[:, 0] * 32768.0).astype(np.int16), expect)


def test_g711_alaw_matches_audioop():
    codes = bytes(range(256))
    frames, rate, ch = decode_wav(_wav_container(6, 2, 8000, 8, 2, codes))
    assert ch == 2
    expect = np.frombuffer(audioop.alaw2lin(codes, 2), dtype="<i2")
    np.testing.assert_array_equal(
        np.round(frames.reshape(-1) * 32768.0).astype(np.int16), expect)


_STEPS = [7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
          37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
          157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
          544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
          1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
          4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
          12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
          29794, 32767]
_IDX = [-1, -1, -1, -1, 2, 4, 6, 8]


def _adpcm_scalar_decode(nibbles, predictor, index):
    """Scalar reference decoder, straight from the published algorithm."""
    out = [predictor]
    for nib in nibbles:
        step = _STEPS[index]
        diff = step >> 3
        if nib & 1:
            diff += step >> 2
        if nib & 2:
            diff += step >> 1
        if nib & 4:
            diff += step
        predictor = predictor - diff if nib & 8 else predictor + diff
        predictor = max(-32768, min(32767, predictor))
        index = max(0, min(88, index + _IDX[nib & 7]))
        out.append(predictor)
    return out


def test_ima_adpcm_mono_matches_scalar_reference():
    rng = np.random.default_rng(7)
    nibbles = rng.integers(0, 16, size=120).astype(int).tolist()
    body = bytes(nibbles[i] | (nibbles[i + 1] << 4)
                 for i in range(0, 120, 2))
    predictor, index = -1234, 30
    block = struct.pack("<hBB", predictor, index, 0) + body
    payload = _wav_container(0x11, 1, 8000, 4, len(block), block)
    frames, rate, ch = decode_wav(payload)
    assert (rate, ch) == (8000, 1)
    expect = _adpcm_scalar_decode(nibbles, predictor, index)
    np.testing.assert_array_equal(
        np.round(frames[:, 0] * 32768.0).astype(int), expect)


def test_ima_adpcm_bad_stereo_block_align_raises_media_error():
    from valkey_search_spark.multimodal.codecs import MediaDecodeError

    # block_align=12 passes a naive %4 check but cannot hold stereo
    # 4-byte-per-channel words after the two 4-byte headers
    payload = _wav_container(0x11, 2, 8000, 4, 12, b"\0" * 12)
    with pytest.raises(MediaDecodeError):
        decode_wav(payload)


def test_ima_adpcm_stereo_interleave_and_multi_block():
    rng = np.random.default_rng(11)
    blocks = b""
    expect = {0: [], 1: []}
    for _ in range(3):                        # multiple blocks
        headers, bodies = [], {0: b"", 1: b""}
        nibs = {0: [], 1: []}
        for c in (0, 1):
            pred = int(rng.integers(-3000, 3000))
            idx = int(rng.integers(0, 89))
            headers.append(struct.pack("<hBB", pred, idx, 0))
            n = rng.integers(0, 16, size=8).astype(int).tolist()
            nibs[c] = n
            bodies[c] = bytes(n[i] | (n[i + 1] << 4) for i in range(0, 8, 2))
            expect[c].extend(_adpcm_scalar_decode(n, pred, idx))
        # 4 data bytes ch0, then 4 bytes ch1
        blocks += headers[0] + headers[1] + bodies[0] + bodies[1]
    block_align = 4 * 2 + 4 * 2
    payload = _wav_container(0x11, 2, 16000, 4, block_align, blocks)
    frames, rate, ch = decode_wav(payload)
    assert ch == 2
    got = np.round(frames * 32768.0).astype(int)
    np.testing.assert_array_equal(got[:, 0], expect[0])
    np.testing.assert_array_equal(got[:, 1], expect[1])


# ---------------------------------------------------------------------------
# the DataFrame operator

def test_media_metadata_mixed_column(spark):
    arr = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    wav = encode_wav(np.zeros(8000, dtype=np.float32), 8000)
    rows = [
        Row(id=1, payload=bytearray(encode_bmp(arr))),
        Row(id=2, payload=bytearray(encode_png(arr))),
        Row(id=3, payload=bytearray(wav)),
        Row(id=4, payload=bytearray(b"garbage")),
        Row(id=5, payload=None),
    ]
    df = spark.createDataFrame(rows)
    out = {r["id"]: r["payload_meta"]
           for r in media_metadata(df, "payload").collect()}
    assert out[1]["format"] == "bmp" and out[1]["width"] == 4
    assert out[2]["format"] == "png" and out[2]["height"] == 4
    assert out[3]["format"] == "wav"
    assert out[3]["duration_sec"] == pytest.approx(1.0)
    assert out[3]["payload_bytes"] == len(wav)
    assert out[4]["format"] is None
    assert out[4]["payload_bytes"] == 7
    assert out[5] is None


def test_media_metadata_prefix_bound(spark):
    """Payload larger than the prefix: format still detected, fields
    whose header lies past the prefix are null, and payload_bytes is the
    FULL length (computed JVM-side, not from the prefix)."""
    payload = _jpeg_with_sof(0xC0, w=11, h=12, pad_before_sof=3000)
    df = spark.createDataFrame([Row(id=1, payload=bytearray(payload))])
    r = media_metadata(df, "payload", prefix_bytes=512).collect()[0]
    m = r["payload_meta"]
    assert m["format"] == "jpeg"
    assert m["width"] is None
    assert m["payload_bytes"] == len(payload)
    r2 = media_metadata(df, "payload", prefix_bytes=65536).collect()[0]
    assert r2["payload_meta"]["width"] == 11


def test_sniff_media_never_raises_on_malformed_input():
    """Robustness contract: sniff_media classifies or degrades, never
    raises — truncations of valid headers, bit flips, and random bytes
    all produce a well-formed dict."""
    import random

    rnd = random.Random(42)
    arr = np.arange(6 * 6 * 3, dtype=np.uint8).reshape(6, 6, 3)
    rate80 = struct.pack(">H", 16398) + struct.pack(">Q", 0xAC44 << 48)
    aiff = (b"FORM" + struct.pack(">I", 30) + b"AIFF" + b"COMM"
            + struct.pack(">I", 18) + struct.pack(">HIH", 1, 100, 16)
            + rate80)
    seeds = [
        encode_bmp(arr), encode_png(arr),
        encode_wav(np.zeros(100, dtype=np.float32), 8000),
        _jpeg_with_sof(0xC0, 9, 9), _flac(44100, 2, 16, 1000),
        _mp3_frame_header() + b"\0" * 64, _ogg_vorbis(8000, 1),
        _webp_vp8l(5, 5), b"GIF89a" + b"\0" * 20,
        _mp4(moov_first=True), _mp4(moov_first=False), aiff,
        b"\x1a\x45\xdf\xa3" + b"\x42\x82\x84webm" + b"\0" * 16,
        _tiff(False, 100, 50), _tiff(True, 100, 50),
    ]
    keys = {f.name for f in
            __import__("valkey_search_spark.multimodal.metadata",
                       fromlist=["MEDIA_META_FIELDS"]).MEDIA_META_FIELDS}
    for payload in seeds:
        for cut in range(0, len(payload), max(1, len(payload) // 17)):
            m = sniff_media(payload[:cut], len(payload))
            assert set(m) == keys
        for _ in range(30):                   # random single-byte flips
            b = bytearray(payload)
            b[rnd.randrange(len(b))] ^= 1 << rnd.randrange(8)
            m = sniff_media(bytes(b), len(b))
            assert set(m) == keys
    for _ in range(200):                      # pure noise
        blob = bytes(rnd.getrandbits(8) for _ in range(rnd.randrange(0, 64)))
        m = sniff_media(blob, len(blob))
        assert set(m) == keys


def test_decode_wav_malformed_raises_only_media_error():
    """decode_wav's error contract: malformed RIFF payloads raise
    MediaDecodeError (or decode), never a raw struct/numpy error."""
    import random

    from valkey_search_spark.multimodal.codecs import MediaDecodeError

    rnd = random.Random(7)
    seeds = [
        encode_wav(np.zeros(50, dtype=np.float32), 8000),
        _wav_container(7, 1, 8000, 8, 1, bytes(range(64))),
        _wav_container(0x11, 2, 8000, 4, 16,
                       struct.pack("<hBBhBB", 0, 0, 0, 0, 0, 0) + b"\0" * 8),
    ]
    for payload in seeds:
        for cut in range(12, len(payload), max(1, len(payload) // 23)):
            try:
                decode_wav(payload[:cut])
            except MediaDecodeError:
                pass
        for _ in range(40):
            b = bytearray(payload)
            b[rnd.randrange(len(b))] ^= 0xFF
            try:
                decode_wav(bytes(b))
            except MediaDecodeError:
                pass


def test_media_metadata_ogg_tail_slice(spark):
    """Ogg duration comes from the LAST page granule, sliced JVM-side as
    a bounded tail — the middle of the payload never crosses Arrow."""
    payload = (_ogg_vorbis(44100, 2) + b"\0" * 20000 + _ogg_page(88200))
    df = spark.createDataFrame([Row(id=1, payload=bytearray(payload))])
    r = media_metadata(df, "payload", prefix_bytes=256,
                       suffix_bytes=64).collect()[0]
    m = r["payload_meta"]
    assert (m["format"], m["sample_rate"], m["channels"]) == ("ogg", 44100, 2)
    assert m["duration_sec"] == pytest.approx(2.0)
    assert m["payload_bytes"] == len(payload)


def test_sniff_ogg_rejects_fake_page_header_collisions():
    """A bare 'OggS' byte collision inside compressed data must not be
    trusted as a page header: the candidate's stream_structure_version
    must be 0 and header_type must use only the three defined flag bits.
    A later REAL page still wins."""
    fake = b"OggS" + b"\x07\xff" + struct.pack("<q", 10**9) + b"\0" * 13
    payload = _ogg_vorbis(22050, 1) + b"\0" * 20 + _ogg_page(44100) \
        + b"\0" * 8 + fake
    m = sniff_media(payload[:64], len(payload), suffix=payload[-96:])
    # the fake trailing header (version 7) is skipped; the real page's
    # granule (44100 samples at 22050 Hz) supplies the duration
    assert m["duration_sec"] == pytest.approx(2.0)
    only_fake = _ogg_vorbis(22050, 1) + b"\0" * 20 + fake
    m = sniff_media(only_fake[:64], len(only_fake), suffix=only_fake[-64:])
    assert m["duration_sec"] is None


def test_sniff_bmp_depth_follows_bpp():
    """Palettized and 16-bit BMPs report per-channel depth from the bpp
    field — not a hardcoded 8 (1/4-bit: single channel at that depth;
    16-bit 5-6-5: three channels, no uniform depth)."""
    def bmp_with_bpp(bpp: int) -> bytes:
        dib = struct.pack("<IiiHH", 40, 10, 20, 1, bpp) + b"\0" * 20
        return b"BM" + struct.pack("<IHHI", 54, 0, 0, 54) + dib

    for bpp, want in [(1, (1, 1)), (4, (1, 4)), (8, (1, 8)),
                      (16, (3, None)), (24, (3, 8)), (32, (4, 8))]:
        m = sniff_media(bmp_with_bpp(bpp), 0)
        assert (m["channels"], m["bit_depth"]) == want, bpp


def _exif_app1(orient: int, bo="<") -> bytes:
    """Hand-packed APP1 Exif segment: embedded TIFF header + one-entry
    IFD carrying orientation tag 274."""
    t = (b"II" if bo == "<" else b"MM") + struct.pack(bo + "H", 42)
    t += struct.pack(bo + "I", 8)
    t += struct.pack(bo + "H", 1)
    t += struct.pack(bo + "HHI", 274, 3, 1)
    t += struct.pack(bo + "HH", orient, 0)
    t += struct.pack(bo + "I", 0)
    body = b"Exif\x00\x00" + t
    return b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body


def test_sniff_jpeg_exif_orientation_both_endiannesses():
    sof = (b"\xff\xc0" + struct.pack(">H", 11)
           + bytes([8]) + struct.pack(">HH", 20, 30) + bytes([3, 0, 0, 0]))
    for bo in ("<", ">"):
        payload = b"\xff\xd8" + _exif_app1(6, bo) + sof
        m = sniff_media(payload, len(payload))
        assert (m["format"], m["width"], m["height"]) == ("jpeg", 30, 20)
        assert m["orientation"] == 6, bo
    # no APP1 -> null; out-of-range value -> null
    m = sniff_media(b"\xff\xd8" + sof, 0)
    assert m["orientation"] is None
    m = sniff_media(b"\xff\xd8" + _exif_app1(9) + sof, 0)
    assert m["orientation"] is None


def test_sniff_tiff_orientation_tag():
    # extend the minimal TIFF IFD with tag 274 = 8 (rotate 270)
    bo = "<"
    out = bytearray(b"II" + struct.pack(bo + "H", 42) + struct.pack(bo + "I", 8))
    entries = [(256, 3, 1, struct.pack(bo + "HH", 10, 0)),
               (257, 3, 1, struct.pack(bo + "HH", 20, 0)),
               (274, 3, 1, struct.pack(bo + "HH", 8, 0))]
    out += struct.pack(bo + "H", len(entries))
    for tag, typ, cnt, val in entries:
        out += struct.pack(bo + "HHI", tag, typ, cnt) + val[:4].ljust(4, b"\0")
    out += struct.pack(bo + "I", 0)
    m = sniff_media(bytes(out), 0)
    assert (m["format"], m["width"], m["height"], m["orientation"]) == \
        ("tiff", 10, 20, 8)


def test_vp8l_alpha_hint_drives_channels():
    from valkey_search_spark.multimodal.metadata import _sniff_webp

    def vp8l(alpha):
        bits = (9 - 1) | ((7 - 1) << 14) | (int(alpha) << 28)
        payload = bytes([0x2F]) + struct.pack("<I", bits)
        return (b"RIFF" + struct.pack("<I", 4 + 8 + len(payload))
                + b"WEBP" + b"VP8L" + struct.pack("<I", len(payload))
                + payload)

    assert _sniff_webp(vp8l(False))["channels"] == 3
    assert _sniff_webp(vp8l(True))["channels"] == 4
    # and the in-repo encoder's (alpha-less) output sniffs as 3-channel
    import numpy as np

    from valkey_search_spark.multimodal.webp import encode_webp_lossless

    p = encode_webp_lossless(np.zeros((7, 9, 3), dtype=np.uint8))
    m = _sniff_webp(p)
    assert (m["width"], m["height"], m["channels"]) == (9, 7, 3)
