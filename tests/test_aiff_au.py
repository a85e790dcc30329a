"""AIFF and Sun AU decoders, pinned by the stdlib aifc/sunau modules
as INDEPENDENT forward implementations (the WAV-vs-`wave` pattern)."""
from __future__ import annotations

import os
import struct
import warnings

import numpy as np
import pytest

from valkey_search_spark.multimodal.codecs import (
    MediaDecodeError,
    decode_aiff,
    decode_au,
)

warnings.filterwarnings("ignore", category=DeprecationWarning)

rng = np.random.default_rng(8)


def _sig(n=2000, ch=1):
    base = np.sin(np.linspace(0, 40, n))[:, None]
    mix = base * (0.5 * (-1.0) ** np.arange(ch))
    return (mix * 32767).astype(">i2")


def _write_aifc(path, frames, rate, ch, width=2):
    import aifc

    w = aifc.open(path, "wb")
    w.setnchannels(ch)
    w.setsampwidth(width)
    w.setframerate(rate)
    w.aiff()                               # classic AIFF container
    w.writeframes(frames.tobytes())
    w.close()


def test_aiff_16bit_matches_stdlib(tmp_path):
    for ch, rate in ((1, 8000), (2, 44100)):
        p = str(tmp_path / f"a{ch}.aiff")
        sig = _sig(ch=ch)
        _write_aifc(p, sig, rate, ch)
        fr, got_rate, got_ch = decode_aiff(open(p, "rb").read())
        assert (got_rate, got_ch) == (rate, ch)
        assert np.abs(fr - sig.astype(np.float32) / 32768.0).max() < 1e-6


def test_aiff_8bit_signed(tmp_path):
    p = str(tmp_path / "a8.aiff")
    sig8 = (np.sin(np.linspace(0, 20, 500)) * 120).astype(np.int8)
    _write_aifc(p, sig8, 8000, 1, width=1)
    fr, rate, ch = decode_aiff(open(p, "rb").read())
    assert np.abs(fr[:, 0] - sig8.astype(np.float32) / 128.0).max() < 1e-6


def test_aiff_24_and_32bit_hand_packed():
    # stdlib aifc only writes 8/16; pin 24/32 with hand-packed chunks
    def pack(bits, data, ch=1, rate=8000):
        frames = len(data) // (ch * bits // 8)
        comm = struct.pack(">HIH", ch, frames, bits) + _ext80(rate)
        ssnd = struct.pack(">II", 0, 0) + data

        def ck(cid, body):
            return cid + struct.pack(">I", len(body)) + body \
                + (b"\0" if len(body) & 1 else b"")

        body = b"AIFF" + ck(b"COMM", comm) + ck(b"SSND", ssnd)
        return b"FORM" + struct.pack(">I", len(body)) + body

    def _ext80(rate):
        # normalized 80-bit float for integer rates
        e = 0
        m = rate
        while m < (1 << 63):
            m <<= 1
            e += 1
        return struct.pack(">H", 16383 + 63 - e + 0) + m.to_bytes(8, "big")

    vals = np.asarray([0, 1 << 20, -(1 << 20), (1 << 23) - 1], np.int64)
    data24 = b"".join(int(v & 0xFFFFFF).to_bytes(3, "big") for v in vals)
    fr, rate, ch = decode_aiff(pack(24, data24))
    assert rate == 8000
    assert np.allclose(fr[:, 0] * 8388608.0, vals, atol=1)
    data32 = np.asarray(vals << 8, dtype=">i4").tobytes()
    fr32, _, _ = decode_aiff(pack(32, data32))
    assert np.allclose(fr32[:, 0] * 2147483648.0, vals << 8, atol=1)


def test_aifc_sowt_little_endian(tmp_path):
    import aifc

    p = str(tmp_path / "sowt.aifc")
    sig = _sig(n=300)
    w = aifc.open(p, "wb")
    w.setnchannels(1)
    w.setsampwidth(2)
    w.setframerate(8000)
    w.setcomptype(b"sowt", b"little endian")
    w.writeframes(sig.tobytes())          # aifc byteswaps for sowt
    w.close()
    fr, rate, ch = decode_aiff(open(p, "rb").read())
    assert np.abs(fr - sig.astype(np.float32) / 32768.0).max() < 1e-6


def test_aiff_malformed():
    with pytest.raises(MediaDecodeError):
        decode_aiff(b"FORM\x00\x00\x00\x04WAVE")
    with pytest.raises(MediaDecodeError):
        decode_aiff(b"FORM\x00\x00\x00\x04AIFF")      # no COMM/SSND
    with pytest.raises(MediaDecodeError, match="ffmpeg seam"):
        # AIFC with a compressed type
        comm = struct.pack(">HIH", 1, 0, 16) + b"\x40\x0c" + b"\0" * 8 \
            + b"ima4" + b"\x00"
        body = b"AIFC" + b"COMM" + struct.pack(">I", len(comm)) + comm
        decode_aiff(b"FORM" + struct.pack(">I", len(body)) + body)


def _write_au(path, frames, rate, ch, comptype="NONE"):
    import sunau

    s = sunau.open(path, "wb")
    s.setnchannels(ch)
    s.setsampwidth(2)
    s.setframerate(rate)
    s.setcomptype(comptype, "")
    s.writeframes(frames.tobytes())
    s.close()


def test_au_linear16_matches_stdlib(tmp_path):
    p = str(tmp_path / "l16.au")
    sig = _sig(ch=2)
    _write_au(p, sig, 16000, 2)
    fr, rate, ch = decode_au(open(p, "rb").read())
    assert (rate, ch) == (16000, 2)
    assert np.abs(fr - sig.astype(np.float32) / 32768.0).max() < 1e-6


def test_au_ulaw_via_stdlib_transcode(tmp_path):
    # sunau's ULAW comptype transcodes through audioop, which expects
    # NATIVE-endian linear input (unlike the NONE path, which writes
    # the caller's big-endian frames verbatim): decoding back must land
    # within mu-law quantization error
    p = str(tmp_path / "ul.au")
    lin = _sig()[:, 0].astype(np.int16)          # native endianness
    _write_au(p, lin, 8000, 1, comptype="ULAW")
    fr, rate, ch = decode_au(open(p, "rb").read())
    assert np.abs(fr[:, 0] - lin.astype(np.float32) / 32768.0).max() < 0.04


def test_au_float32_hand_packed():
    vals = np.asarray([0.0, 0.5, -1.0, 0.25], dtype=">f4")
    hdr = b".snd" + struct.pack(">IIIII", 24, len(vals) * 4, 6, 8000, 1)
    fr, rate, ch = decode_au(hdr + vals.tobytes())
    assert np.allclose(fr[:, 0], vals.astype(np.float32))


def test_au_unknown_size_field():
    # dsize = 0xFFFFFFFF means 'unknown, read to EOF' per the spec
    vals = np.asarray([1000, -1000], dtype=">i2")
    hdr = b".snd" + struct.pack(">IIIII", 24, 0xFFFFFFFF, 3, 8000, 1)
    fr, _, _ = decode_au(hdr + vals.tobytes())
    assert len(fr) == 2


def test_au_malformed():
    with pytest.raises(MediaDecodeError):
        decode_au(b"RIFF" + b"\0" * 24)
    with pytest.raises(MediaDecodeError):
        decode_au(b".snd" + struct.pack(">IIIII", 24, 0, 99, 8000, 1) + b"\0")
    with pytest.raises(MediaDecodeError):
        decode_au(b".snd" + struct.pack(">IIIII", 12, 0, 3, 8000, 1))


# ---------------------------------------------------------------------------
# sniffer + Spark real-decode path

def test_sniff_au_and_aiff(tmp_path):
    from valkey_search_spark.multimodal.metadata import sniff_media

    p = str(tmp_path / "s.au")
    _write_au(p, _sig(n=16000, ch=2), 16000, 2)
    blob = open(p, "rb").read()
    m = sniff_media(blob[:65536], len(blob))
    assert (m["format"], m["kind"]) == ("au", "audio")
    assert (m["sample_rate"], m["channels"], m["bit_depth"]) == (16000, 2, 16)
    assert m["duration_sec"] == pytest.approx(1.0, rel=1e-3)

    p2 = str(tmp_path / "s.aiff")
    _write_aifc(p2, _sig(n=8000), 8000, 1)
    blob2 = open(p2, "rb").read()
    m2 = sniff_media(blob2[:65536], len(blob2))
    assert (m2["format"], m2["sample_rate"]) == ("aiff", 8000)
    assert m2["duration_sec"] == pytest.approx(1.0, rel=1e-3)


def test_audio_features_real_aiff_au(spark, tmp_path):
    import pandas as pd

    from pyspark.sql import functions as F, types as T

    from valkey_search_spark.multimodal.columns import audio_features

    pa = str(tmp_path / "a.aiff")
    _write_aifc(pa, _sig(n=500), 8000, 1)
    pu = str(tmp_path / "a.au")
    _write_au(pu, _sig(n=500), 8000, 1)
    blobs = {1: open(pa, "rb").read(), 2: open(pu, "rb").read()}
    df = spark.createDataFrame(pd.DataFrame({"aid": [1, 2]})).withColumn(
        "audio", F.udf(lambda a: blobs[a], T.BinaryType())(F.col("aid")))
    out = audio_features(df, fake=False).toPandas()
    ref = _sig(n=500)[:, 0].astype(np.float32) / 32768.0
    want_rms = float(np.sqrt((ref ** 2).mean()))
    for _, r in out.iterrows():
        assert r["audio_rms"] == pytest.approx(want_rms, rel=1e-3)


def test_error_contract_corruption_fuzz(tmp_path):
    """Parity with the other decoders' pinned contract: truncation/
    bit-flips raise exactly MediaDecodeError (or decode harmlessly) —
    never a raw numpy/struct error."""
    p = str(tmp_path / "c.aiff")
    _write_aifc(p, _sig(n=40), 8000, 1)
    aiff = open(p, "rb").read()
    p2 = str(tmp_path / "c.au")
    _write_au(p2, _sig(n=40), 8000, 1)
    au = open(p2, "rb").read()
    frng = np.random.default_rng(12)
    for base, dec in ((aiff, decode_aiff), (au, decode_au)):
        for cut in (5, 13, 27, len(base) - 1):    # odd byte counts too
            try:
                dec(base[:cut])
            except MediaDecodeError:
                pass
        for _ in range(60):
            blob = bytearray(base)
            for _ in range(frng.integers(1, 4)):
                blob[frng.integers(0, len(blob))] = frng.integers(0, 256)
            try:
                dec(bytes(blob))
            except MediaDecodeError:
                pass
