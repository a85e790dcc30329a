"""DSIR — Data Selection with Importance Resampling (Xie et al. 2023).

Selects raw-corpus documents whose hashed-n-gram distribution looks
like a TARGET corpus: fit bag-of-hashed-ngrams unigram models p
(target) and q (raw), score each document by its importance log-ratio
sum, and resample with Gumbel top-k. The published recipe, re-expressed
Spark-first:

- FIT is two corpus aggregations: Arrow-batched hashed-gram extraction
  -> explode -> groupBy bucket count. Map-side combine collapses each
  partition to <= n_buckets rows before the shuffle, so the driver
  materializes exactly the two bounded bucket tables (the model), never
  the corpus.
- SCORE is one Arrow-batched map per document (hash grams, sum the
  broadcast log-ratio vector) — zero shuffle, embarrassingly parallel.
- SELECT is Gumbel top-k: per-key deterministic uniform (seeded hash ->
  inverse CDF, the same derandomization as quality_model's pareto
  acceptance) -> TakeOrderedAndProject bounded top-k. No driver-side
  weighted sampling loop.

Reference analogue: none (beyond-reference training-pipeline operator
per SURVEY.md §2.10).
"""
from __future__ import annotations

import zlib

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

_TOKEN_SPLIT = None  # simple whitespace tokens; grams hash word n-grams


def _bucket_ids(text: str, n_buckets: int, ngram: int) -> np.ndarray:
    """Hashed word-n-gram bucket ids (all orders 1..ngram), crc32-based
    so the mapping is deterministic across processes and sessions."""
    toks = text.split()
    ids = []
    for n in range(1, ngram + 1):
        for i in range(len(toks) - n + 1):
            g = " ".join(toks[i:i + n])
            ids.append(zlib.crc32(g.encode("utf-8")) % n_buckets)
    return np.asarray(ids, dtype=np.int64)


def _bucket_udf(n_buckets: int, ngram: int):
    @F.pandas_udf(T.ArrayType(T.LongType()))
    def udf(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: _bucket_ids(t, n_buckets, ngram)
            if isinstance(t, str) else None)
    return udf


def _bucket_counts(df: DataFrame, text_col: str, n_buckets: int,
                   ngram: int) -> np.ndarray:
    rows = (df.select(F.explode(_bucket_udf(n_buckets, ngram)(
        F.col(text_col))).alias("b"))
        .groupBy("b").count().collect())
    counts = np.zeros(n_buckets, dtype=np.float64)
    for r in rows:
        counts[int(r["b"])] = float(r["count"])
    return counts


def dsir_fit(target: DataFrame, raw: DataFrame, text_col: str = "text",
             n_buckets: int = 10_000, ngram: int = 2,
             smoothing: float = 1.0) -> np.ndarray:
    """Fit the importance log-ratio vector log(p/q) over hashed n-gram
    buckets from the target and raw corpora (two aggregations; the
    model is the returned ``n_buckets``-float vector)."""
    p = _bucket_counts(target, text_col, n_buckets, ngram) + smoothing
    q = _bucket_counts(raw, text_col, n_buckets, ngram) + smoothing
    return np.log(p / p.sum()) - np.log(q / q.sum())


def dsir_score(df: DataFrame, log_ratio: np.ndarray,
               text_col: str = "text", ngram: int = 2,
               out_col: str = "dsir_logratio") -> DataFrame:
    """Add the per-document importance log-ratio: sum of log(p/q) over
    the document's hashed n-grams. One Arrow map, no shuffle; the model
    vector ships once per executor via a Spark broadcast."""
    n_buckets = len(log_ratio)
    bc = df.sparkSession.sparkContext.broadcast(
        np.asarray(log_ratio, dtype=np.float64))

    @F.pandas_udf(T.DoubleType())
    def score(texts: pd.Series) -> pd.Series:
        w = bc.value

        def one(t):
            if not isinstance(t, str):
                return None
            ids = _bucket_ids(t, n_buckets, ngram)
            return float(w[ids].sum()) if len(ids) else 0.0

        return texts.map(one)

    return df.withColumn(out_col, score(F.col(text_col)))


def dsir_sample(df: DataFrame, log_ratio: np.ndarray, n: int,
                key_col: str, text_col: str = "text", ngram: int = 2,
                temperature: float = 1.0, seed: int = 0) -> DataFrame:
    """Gumbel top-k importance resampling: keep the ``n`` documents with
    the highest ``score/temperature + Gumbel(u_key)`` where ``u_key`` is
    a deterministic per-(key, seed) uniform — same seed, same selection,
    on any cluster layout. ``temperature -> 0`` degenerates to plain
    top-k by score (pinned in tests). Bounded global top-k
    (TakeOrderedAndProject), no full sort, no driver loop."""
    scored = dsir_score(df, log_ratio, text_col, ngram)
    # u in (0,1): seeded 63-bit hash of the key; gumbel = -log(-log u)
    u = (F.abs(F.xxhash64(F.col(key_col), F.lit(seed))) + F.lit(1.0)) \
        / F.lit(float(2 ** 63 + 1))
    gumbel = -F.log(-F.log(u))
    if temperature > 0:
        key = (F.col("dsir_logratio") / F.lit(float(temperature))) + gumbel
    else:
        key = F.col("dsir_logratio")
    return (scored.where(F.col("dsir_logratio").isNotNull())
            .orderBy(F.desc(F.coalesce(key, F.lit(float("-inf")))))
            .limit(n))
