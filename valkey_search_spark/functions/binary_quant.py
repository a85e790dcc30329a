"""Binary (sign-bit) vector quantization — the 1-bit storage tier.

One bit per dimension, packed into ``array<bigint>`` words: 32x less
scan/broadcast bytes than float32 (768-dim: 3 KB -> 96 B). Hamming
distance between sign codes is a monotone estimator of angular
distance, so a Hamming scan + exact float rerank of a small
oversampled candidate set recovers near-exact top-k at a fraction of
the I/O — the tier between int8 (``functions/quantize.py``, 4x) and
PQ (``functions/pq.py``, typically 32x but with a trained codebook).
Resolution scales with DIMENSION (one Hamming level per dim): at
512-768 dims recall ~1.0 at oversample 8 (measured); at 64 dims the
code has only 64 levels and the same recall needs oversample ~64 —
size ``oversample`` to the embedding width.
Sign codes need NO training; per-dimension thresholds (``
fit_binary_thresholds``, one Summarizer job) recenter skewed data.

Encoding is a pure JVM expression (whole-stage codegen, no Python), so
codes can be written at ingest and scanned without ever touching the
float column; ``hamming_expr`` is likewise pure JVM (`bit_count(xor)`)
for SQL-side verification and banded pre-filters.

The reference keeps float32 in RAM (src/indexes/vector_base.h) and
offers no compressed tier; this is a beyond-reference storage path
(SURVEY §2.10). Oracle: scalar bit-packing + popcount references and
an exact-equivalence pin in tests/test_binary_quant.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def binary_code_expr(vec: Column, dim: int,
                     thresholds: list[float] | None = None) -> Column:
    """``array<bigint>`` of ceil(dim/64) words; bit i of word w is set
    when ``vec[64w + i] > thresholds[64w + i]`` (0.0 when untrained).
    Null vectors encode to null; null/absent elements encode to 0 bits.
    Pure expression — no Python, no shuffle."""
    if dim <= 0:
        raise ValueError("dim must be positive")
    n_words = (dim + 63) // 64
    thr = (F.array(*[F.lit(float(t)) for t in thresholds])
           if thresholds is not None else None)
    if thresholds is not None and len(thresholds) != dim:
        raise ValueError(f"need {dim} thresholds, got {len(thresholds)}")

    def word(w: Column) -> Column:
        # each 64-bit word is two 32-bit halves built by an arithmetic
        # high->low fold (acc*2 + bit; a half never exceeds 2^32 so the
        # fold cannot overflow under ANSI, which a full-64 fold would
        # when bit 63 is set), combined with overflow-free bitwise ops
        def half(lo_bit: int) -> Column:
            def step(acc: Column, i: Column) -> Column:
                j = w * 64 + i
                t = F.get(thr, j) if thr is not None else F.lit(0.0)
                bit = F.when(F.get(vec, j).cast("double") > t,
                             F.lit(1).cast("long")) \
                    .otherwise(F.lit(0).cast("long"))
                return acc * 2 + bit

            return F.aggregate(
                F.sequence(F.lit(lo_bit + 31), F.lit(lo_bit), F.lit(-1)),
                F.lit(0).cast("long"), step)

        return F.shiftleft(half(32), 32).bitwiseOR(half(0))

    codes = F.transform(
        F.sequence(F.lit(0), F.lit(n_words - 1)), word)
    return F.when(vec.isNotNull(), codes)


def binary_codes(df: DataFrame, vec_col: str = "embedding",
                 dim: int | None = None,
                 thresholds: list[float] | None = None,
                 out_col: str = "bq_code") -> DataFrame:
    """Append the packed sign-code column. ``dim=None`` probes the first
    non-null vector (one eager job — pass ``dim`` to stay lazy)."""
    if dim is None:
        first = df.select(vec_col).where(F.col(vec_col).isNotNull()).first()
        if first is None:
            raise ValueError(f"no non-null {vec_col} rows to infer dim")
        dim = len(first[0])
    return df.withColumn(
        out_col, binary_code_expr(F.col(vec_col), dim, thresholds))


def fit_binary_thresholds(df: DataFrame,
                          vec_col: str = "embedding") -> list[float]:
    """Per-dimension means (ONE treeAggregate via MLlib Summarizer) —
    thresholding at the mean centers each bit at ~50% occupancy, which
    maximizes the information the code carries on shifted data."""
    from pyspark.ml.functions import array_to_vector
    from pyspark.ml.stat import Summarizer

    row = (df.where(F.col(vec_col).isNotNull())
           .select(array_to_vector(F.col(vec_col)).alias("__v"))
           .select(Summarizer.mean(F.col("__v")).alias("m"))
           .first())
    if row is None:
        raise ValueError(f"no non-null {vec_col} rows")
    return [float(x) for x in row["m"]]


def hamming_expr(a: Column, b: Column) -> Column:
    """Hamming distance between two packed code arrays — pure JVM
    (`bit_count(xor)` per word, one fold)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.bit_count(x.bitwiseXOR(y))),
        F.lit(0), lambda acc, x: acc + x.cast("int"))


def popcount_words(arr):
    """numpy popcount for an (n, n_words) int64/uint64 array -> (n,)
    int64 (no np.bitwise_count before numpy 2)."""
    import numpy as np

    lut = popcount_words._lut
    if lut is None:
        lut = np.array([bin(i).count("1") for i in range(256)],
                       dtype=np.uint8)
        popcount_words._lut = lut
    b = np.ascontiguousarray(arr).view(np.uint8)
    return lut[b].reshape(arr.shape[0], -1).sum(axis=1, dtype=np.int64)


popcount_words._lut = None
