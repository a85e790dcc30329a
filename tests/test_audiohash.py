"""Spectral audio fingerprint + banded Hamming audio-dup pairs:
gain/format invariance, discrimination, error contract, brute parity."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from valkey_search_spark.multimodal.audiohash import (
    _audio_hash_bits, audio_dup_pairs, audio_hash,
)
from valkey_search_spark.multimodal.codecs import encode_wav
from valkey_search_spark.multimodal.imagehash import _pack64


def _tone_mix(freqs, rate=8000, secs=1.0, amp=0.3):
    t = np.arange(int(rate * secs)) / rate
    w = sum(np.sin(2 * np.pi * f * t) * amp / len(freqs) for f in freqs)
    return w.astype(np.float32)


def _wav(wave, rate=8000):
    return encode_wav((wave * 32767).astype(np.int16)[:, None], rate)


def _ham(a, b):
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_fingerprint_is_gain_invariant_and_discriminative():
    base = _tone_mix([220, 880, 1760])
    h0 = _pack64(_audio_hash_bits(base))
    assert _ham(h0, _pack64(_audio_hash_bits(base * 0.3))) == 0   # gain
    assert _ham(h0, _pack64(_audio_hash_bits(base * 2.0))) == 0
    # 16-bit quantization round-trip stays near
    quant = (base * 32767).astype(np.int16).astype(np.float32) / 32767
    assert _ham(h0, _pack64(_audio_hash_bits(quant))) <= 3
    other = _tone_mix([330, 990, 2500])
    assert _ham(h0, _pack64(_audio_hash_bits(other))) > 10


def test_wav_flac_same_content_same_hash(spark):
    import sys

    sys.path.insert(0, "tests")
    from test_media_codecs import _pack_flac

    base = _tone_mix([220, 880, 1760], rate=8000)
    pcm = (base * 20000).astype(np.int16)
    rows = [(0, _wav(base)),
            (1, _pack_flac(pcm[:, None], rate=8000)),
            (2, _wav(_tone_mix([500, 1500], rate=8000))),
            (3, None),
            (4, b"RIFFgarbage")]
    df = spark.createDataFrame(rows, "doc_id long, audio binary")
    out = {r["doc_id"]: r for r in
           audio_hash(df, on_error="null").collect()}
    assert _ham(out[0]["audio_hash"], out[1]["audio_hash"]) <= 3
    assert out[3]["audio_hash"] is None
    assert out[4]["audio_hash"] is None and out[4]["decode_error"]
    pairs = {(r["a"], r["b"]) for r in
             audio_dup_pairs(df, "doc_id", max_hamming=5).collect()}
    assert (0, 1) in pairs
    assert not any(2 in p or 3 in p or 4 in p for p in pairs)


def test_banded_matches_brute_force(spark):
    rng = np.random.default_rng(3)
    rows = []
    for i in range(12):
        freqs = rng.choice([200, 400, 700, 1100, 1900, 2700], size=3,
                           replace=False)
        rows.append((i, _wav(_tone_mix(list(freqs)))))
    df = spark.createDataFrame(rows, "doc_id long, audio binary")
    hs = {r["doc_id"]: r["audio_hash"] for r in audio_hash(df).collect()}
    for mh in (3, 8):
        want = {(a, b, _ham(hs[a], hs[b]))
                for a in hs for b in hs
                if a < b and _ham(hs[a], hs[b]) <= mh}
        got = {(r["a"], r["b"], r["hamming"]) for r in
               audio_dup_pairs(df, "doc_id", max_hamming=mh).collect()}
        assert got == want


def test_error_contract(spark):
    df = spark.createDataFrame([(0, b"not audio")], "doc_id long, audio binary")
    with pytest.raises(Exception):
        audio_hash(df, on_error="raise").collect()
    with pytest.raises(ValueError, match="on_error"):
        audio_hash(df, on_error="bogus")
