"""Perceptual audio fingerprinting + audio near-dup pairs.

The audio analogue of ``imagehash``: a 64-bit spectral fingerprint in
the spirit of the published Haitsma-Kalker scheme (sign of band-energy
differences — robust because RATIOS between adjacent bands survive
gain changes, re-encoding, and mild resampling), shaped like dHash:

- decode to mono float (vendored PCM-WAV/FLAC codecs);
- 64 time-normalized frames -> rfft magnitude -> 9 log-spaced band
  energies per frame (64x9 grid, duration-invariant by construction);
- resample time to 8 -> 8x9 grid -> bit = E[t, f] < E[t, f+1] -> 64
  bits.

Pairs go through the same banded Hamming machinery as text SimHash and
image dHash (``operators.dedup.hamming_code_pairs``): after the one
Arrow decode pass, each clip is 8 bytes and candidates shuffle
(key, band, chunk) — never samples.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

_FRAMES, _BANDS = 64, 9


def _audio_hash_bits(wave: np.ndarray) -> np.ndarray:
    w = np.asarray(wave, dtype=np.float64)
    if len(w) < _FRAMES:
        w = np.pad(w, (0, _FRAMES - len(w)))
    n = len(w) // _FRAMES
    frames = w[:n * _FRAMES].reshape(_FRAMES, n)
    mag = np.abs(np.fft.rfft(frames, axis=1))        # (64, n//2+1)
    nbin = mag.shape[1]
    # log-spaced band edges over bins 1..nbin (skip DC)
    edges = np.unique(np.round(np.geomspace(1, max(nbin - 1, 2),
                                            _BANDS + 1)).astype(int))
    while len(edges) < _BANDS + 1:                   # tiny clips: pad edges
        edges = np.append(edges, edges[-1] + 1)
    energy = np.stack([
        (mag[:, edges[b]:max(edges[b + 1], edges[b] + 1)] ** 2).sum(axis=1)
        for b in range(_BANDS)], axis=1)             # (64, 9)
    tidx = np.linspace(0, _FRAMES - 1, 8).astype(int)
    grid = energy[tidx]                              # (8, 9)
    return (grid[:, :-1] < grid[:, 1:]).flatten()    # 8*8 = 64 bits


def audio_hash(df: DataFrame, binary_col: str = "audio",
               fake: bool = False, on_error: str = "raise",
               out_col: str = "audio_hash") -> DataFrame:
    """``df`` + a 64-bit spectral-fingerprint long column (null for null
    or — under ``on_error="null"`` — undecodable payloads); same error
    contract as the other media operators."""
    from .columns import _decode_audio
    from .imagehash import _pack64

    if on_error not in ("raise", "null"):
        raise ValueError(f"on_error must be raise|null, got {on_error!r}")
    extra = [T.StructField(out_col, T.LongType())]
    has_prev_err = "decode_error" in df.columns
    if on_error == "null" and not has_prev_err:
        extra.append(T.StructField("decode_error", T.StringType()))
    out_schema = T.StructType(df.schema.fields + extra)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes, errs = [], []
            for payload in pdf[binary_col]:
                if payload is None:
                    hashes.append(None); errs.append(None)
                    continue
                try:
                    wave, _rate = _decode_audio(bytes(payload), fake)
                except (ValueError, NotImplementedError) as e:
                    if on_error == "raise":
                        raise
                    hashes.append(None); errs.append(str(e))
                    continue
                errs.append(None)
                hashes.append(_pack64(_audio_hash_bits(wave)))
            out = pdf.copy()
            out[out_col] = pd.array(hashes, dtype="Int64")
            if on_error == "null":
                if has_prev_err:
                    out["decode_error"] = [
                        old_e if old_e is not None else new_e
                        for old_e, new_e in zip(pdf["decode_error"], errs)]
                else:
                    out["decode_error"] = errs
            yield out

    return df.mapInPandas(run, schema=out_schema)


def audio_dup_pairs(df: DataFrame, key: str, binary_col: str = "audio",
                    max_hamming: int = 5, bands: int | None = None,
                    fake: bool = False,
                    new_col: str | None = None) -> DataFrame:
    """Near-duplicate audio pairs ``(a, b, hamming)`` through the banded
    Hamming join; undecodable/null payloads produce no pairs."""
    from ..operators.dedup import hamming_code_pairs

    carry = [new_col] if new_col else []
    hashed = audio_hash(df.select(key, binary_col, *carry),
                        binary_col=binary_col, fake=fake, on_error="null")
    coded = (hashed.select(F.col(key).alias("k"),
                           F.col("audio_hash").alias("code"), *carry)
             .where(F.col("code").isNotNull()))
    return hamming_code_pairs(coded, max_hamming=max_hamming, bands=bands,
                              nbits=64, new_col=new_col)
