"""Perceptual image hashing + image near-dup pairs.

Multimodal training corpora carry the same image re-encoded, resized,
brightness-shifted, or format-converted thousands of times; exact byte
dedup misses all of it. The standard cheap answer is a 64-bit
perceptual hash over a tiny grayscale thumbnail:

- **dHash** (default): 9x8 luma thumbnail, bit = left<right per
  adjacent pair — gradient-based, so uniform brightness/contrast shifts
  don't flip bits; the most robust of the cheap hashes.
- **aHash**: 8x8 thumbnail, bit = pixel > mean — the same construction
  ``image_features`` exposes as ``img_phash``.

Near-dup PAIRS then reuse the engine's banded Hamming machinery
(``operators.dedup.hamming_code_pairs`` — pigeonhole banding, exact
``bit_count(xor)`` verify, incremental new-vs-all mode), so the 100 TB
shape is identical to text SimHash: candidates shuffle only
(key, band, chunk), never pixels.

Decode runs through the vendored pure-Python codecs
(BMP/PNG/JPEG/GIF/TIFF — `multimodal/codecs.py`); ``on_error="null"``
turns undecodable payloads into null hashes (excluded from pairs) plus
the shared ``decode_error`` column, same contract as image_features.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T


def _luma_thumb(arr: np.ndarray, h: int, w: int) -> np.ndarray:
    """ITU-R 601 luma + nearest-neighbor resample to (h, w)."""
    gray = (0.299 * arr[..., 0] + 0.587 * arr[..., 1]
            + 0.114 * arr[..., 2]) if arr.ndim == 3 else arr.astype(float)
    ridx = np.linspace(0, gray.shape[0] - 1, h).astype(int)
    cidx = np.linspace(0, gray.shape[1] - 1, w).astype(int)
    return gray[ridx][:, cidx]


def _hash_bits(arr: np.ndarray, method: str) -> np.ndarray:
    if method == "dhash":
        thumb = _luma_thumb(arr, 8, 9)
        return (thumb[:, 1:] > thumb[:, :-1]).flatten()
    thumb = _luma_thumb(arr, 8, 8)                  # ahash
    return (thumb > thumb.mean()).flatten()


def _pack64(bits: np.ndarray) -> int:
    return int(np.int64(np.packbits(bits).view(">u8")[0].astype(np.int64)))


def image_hash(df: DataFrame, binary_col: str = "image",
               method: str = "dhash", fake: bool = False,
               on_error: str = "raise", batch_size: int = 256,
               out_col: str = "img_hash") -> DataFrame:
    """``df`` + a 64-bit perceptual-hash long column (null for null or —
    under ``on_error="null"`` — undecodable payloads)."""
    from .columns import _decode_image

    if method not in ("dhash", "ahash"):
        raise ValueError(f"method must be dhash|ahash, got {method!r}")
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
                    arr = _decode_image(bytes(payload), fake)
                except (ValueError, NotImplementedError) as e:
                    if on_error == "raise":
                        raise
                    hashes.append(None); errs.append(str(e))
                    continue
                errs.append(None)
                hashes.append(_pack64(_hash_bits(arr, method)))
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


def image_dup_pairs(df: DataFrame, key: str, binary_col: str = "image",
                    max_hamming: int = 5, bands: int | None = None,
                    method: str = "dhash", fake: bool = False,
                    new_col: str | None = None) -> DataFrame:
    """Near-duplicate image pairs ``(a, b, hamming)`` — perceptual hash
    (one Arrow decode pass, 8 bytes/image after it) into the banded
    Hamming join. Undecodable/null payloads simply produce no pairs.
    ``new_col`` enables the incremental new-batch-vs-corpus mode."""
    from ..operators.dedup import hamming_code_pairs

    carry = [new_col] if new_col else []
    hashed = image_hash(df.select(key, binary_col, *carry),
                        binary_col=binary_col, method=method, fake=fake,
                        on_error="null")
    coded = (hashed.select(F.col(key).alias("k"),
                           F.col("img_hash").alias("code"), *carry)
             .where(F.col("code").isNotNull()))
    return hamming_code_pairs(coded, max_hamming=max_hamming, bands=bands,
                              nbits=64, new_col=new_col)
