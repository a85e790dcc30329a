"""audio_resample: scalar-replay parity of the linear-interpolation
kernel on real WAV payloads (stdlib `wave` as the independent fixture
writer), identity pass-through, frequency preservation, and the shared
decode_error contract."""
from __future__ import annotations

import io
import wave as stdlib_wave

import numpy as np
import pytest

from valkey_search_spark.multimodal.columns import audio_resample


def _wav(samples: np.ndarray, rate: int, channels: int = 1) -> bytes:
    buf = io.BytesIO()
    w = stdlib_wave.open(buf, "wb")
    w.setnchannels(channels)
    w.setsampwidth(2)
    w.setframerate(rate)
    w.writeframes(np.clip(samples * 32767.0, -32768, 32767)
                  .astype("<i2").tobytes())
    w.close()
    return buf.getvalue()


def _mono_int16(samples: np.ndarray) -> np.ndarray:
    """What the repo's WAV decoder yields for a 16-bit mono fixture."""
    return (np.clip(samples * 32767.0, -32768, 32767).astype("<i2")
            .astype(np.float32) / 32768.0)


def _scalar_resample(wave_f32: np.ndarray, sr: int, target: int):
    n_out = max(1, round(wave_f32.size * target / sr))
    pos = np.arange(n_out, dtype=np.float64) * (sr / target)
    return np.interp(pos, np.arange(wave_f32.size, dtype=np.float64),
                     wave_f32.astype(np.float64)).astype(np.float32)


def _frame(spark, payloads):
    return spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)], "id int, audio binary")


def test_upsample_matches_scalar_replay(spark):
    t = np.arange(800) / 8000.0
    sig = np.sin(2 * np.pi * 440.0 * t) * 0.5
    df = _frame(spark, [_wav(sig, 8000)])
    row = audio_resample(df, target_rate=16000, fake=False).collect()[0]
    got = np.frombuffer(row["audio_resampled"], dtype="<f4")
    want = _scalar_resample(_mono_int16(sig), 8000, 16000)
    np.testing.assert_array_equal(got, want)
    meta = row["audio_resample_meta"]
    assert meta["sample_rate"] == 16000
    assert meta["n_samples"] == got.size == 1600
    assert meta["seconds"] == pytest.approx(0.1)


def test_identity_rate_passes_samples_through(spark):
    sig = np.linspace(-0.9, 0.9, 500)
    df = _frame(spark, [_wav(sig, 16000)])
    row = audio_resample(df, target_rate=16000, fake=False).collect()[0]
    got = np.frombuffer(row["audio_resampled"], dtype="<f4")
    np.testing.assert_array_equal(got, _mono_int16(sig))


def test_constant_signal_stays_constant_downsampling(spark):
    sig = np.full(1600, 0.25)
    df = _frame(spark, [_wav(sig, 16000)])
    row = audio_resample(df, target_rate=8000, fake=False).collect()[0]
    got = np.frombuffer(row["audio_resampled"], dtype="<f4")
    assert got.size == 800
    assert np.allclose(got, got[0])
    assert got[0] == pytest.approx(0.25, abs=1e-4)


def test_sine_frequency_preserved(spark):
    # a 200 Hz tone has the same zero-crossing count per second at any
    # adequate sample rate
    t = np.arange(4000) / 8000.0
    sig = np.sin(2 * np.pi * 200.0 * t) * 0.8
    df = _frame(spark, [_wav(sig, 8000)])
    row = audio_resample(df, target_rate=16000, fake=False).collect()[0]
    got = np.frombuffer(row["audio_resampled"], dtype="<f4")
    zc_src = int((np.diff(np.sign(_mono_int16(sig))) != 0).sum())
    zc_out = int((np.diff(np.sign(got)) != 0).sum())
    assert abs(zc_out - zc_src) <= 2
    assert got.size == 8000


def test_stereo_downmixes_then_resamples(spark):
    left = np.full(400, 0.5)
    right = np.full(400, -0.1)
    inter = np.empty(800)
    inter[0::2], inter[1::2] = left, right
    df = _frame(spark, [_wav(inter, 8000, channels=2)])
    row = audio_resample(df, target_rate=4000, fake=False).collect()[0]
    got = np.frombuffer(row["audio_resampled"], dtype="<f4")
    assert got.size == 200
    assert np.allclose(got, 0.2, atol=1e-3)  # (0.5 + -0.1) / 2


def test_error_contract_and_null_passthrough(spark):
    good = _wav(np.zeros(80), 8000)
    df = _frame(spark, [good, b"not audio at all", None])
    out = {r["id"]: r for r in
           audio_resample(df, target_rate=16000, fake=False,
                          on_error="null").collect()}
    assert out[0]["audio_resampled"] is not None
    assert out[0]["decode_error"] is None
    assert out[1]["audio_resampled"] is None
    assert out[1]["decode_error"]
    assert out[2]["audio_resampled"] is None
    assert out[2]["decode_error"] is None
    with pytest.raises(ValueError, match="on_error"):
        audio_resample(df, on_error="quarantine")
    with pytest.raises(ValueError, match="target_rate"):
        audio_resample(df, target_rate=0)


def test_fake_path_shapes(spark):
    # the deterministic test decode yields 1600 samples @ 16 kHz; any
    # payload works and the plumbing (schema, meta, bytes) is real
    df = _frame(spark, [b"\x01\x02"])
    row = audio_resample(df, target_rate=8000, fake=True).collect()[0]
    got = np.frombuffer(row["audio_resampled"], dtype="<f4")
    assert got.size == 800
    assert row["audio_resample_meta"]["seconds"] == pytest.approx(0.1)
