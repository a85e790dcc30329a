"""DSIR importance resampling: the fitted log-ratio vector is pinned by
a scalar recomputation of the hashed-gram counts; selection behavior by
construction (target-like docs must dominate the resample)."""
from __future__ import annotations

import zlib

import numpy as np
import pytest

from valkey_search_spark.operators.dsir import (
    _bucket_ids,
    dsir_fit,
    dsir_sample,
    dsir_score,
)

B = 512


def _scalar_counts(texts, n_buckets=B, ngram=2):
    counts = np.zeros(n_buckets)
    for t in texts:
        toks = t.split()
        for n in range(1, ngram + 1):
            for i in range(len(toks) - n + 1):
                g = " ".join(toks[i:i + n])
                counts[zlib.crc32(g.encode()) % n_buckets] += 1
    return counts


TARGET = ["clean scientific prose about physics",
          "careful scientific writing about chemistry",
          "scientific method and careful measurement"] * 3
RAW_GOOD = ["scientific prose about careful physics measurement"] * 5
RAW_SPAM = ["buy cheap pills now click here win money"] * 5


def _dfs(spark):
    t = spark.createDataFrame([(x,) for x in TARGET], ["text"])
    r = spark.createDataFrame(
        [(i, x) for i, x in enumerate(RAW_GOOD + RAW_SPAM)],
        ["doc_id", "text"])
    return t, r


def test_fit_matches_scalar_recomputation(spark):
    t, r = _dfs(spark)
    logw = dsir_fit(t, r, n_buckets=B, smoothing=1.0)
    p = _scalar_counts(TARGET) + 1.0
    q = _scalar_counts(RAW_GOOD + RAW_SPAM) + 1.0
    want = np.log(p / p.sum()) - np.log(q / q.sum())
    assert np.allclose(logw, want)


def test_score_separates_target_like_docs(spark):
    t, r = _dfs(spark)
    logw = dsir_fit(t, r, n_buckets=B)
    rows = {row["doc_id"]: row["dsir_logratio"]
            for row in dsir_score(r, logw).collect()}
    good = [rows[i] for i in range(5)]
    spam = [rows[i] for i in range(5, 10)]
    assert min(good) > max(spam)


def test_score_matches_scalar_sum(spark):
    t, r = _dfs(spark)
    logw = dsir_fit(t, r, n_buckets=B)
    row = dsir_score(r, logw).where("doc_id = 0").collect()[0]
    want = float(logw[_bucket_ids(RAW_GOOD[0], B, 2)].sum())
    assert row["dsir_logratio"] == pytest.approx(want)


def test_score_null_and_empty_text(spark):
    t, r = _dfs(spark)
    logw = dsir_fit(t, r, n_buckets=B)
    df = spark.createDataFrame([(1, None), (2, "")],
                               "doc_id int, text string")
    rows = {x["doc_id"]: x["dsir_logratio"]
            for x in dsir_score(df, logw).collect()}
    assert rows[1] is None
    assert rows[2] == 0.0


def test_sample_zero_temperature_is_topk(spark):
    t, r = _dfs(spark)
    logw = dsir_fit(t, r, n_buckets=B)
    got = {x["doc_id"] for x in
           dsir_sample(r, logw, n=5, key_col="doc_id",
                       temperature=0.0).collect()}
    assert got == {0, 1, 2, 3, 4}


def test_sample_deterministic_per_seed(spark):
    t, r = _dfs(spark)
    logw = dsir_fit(t, r, n_buckets=B)

    def pick(seed):
        return {x["doc_id"] for x in
                dsir_sample(r, logw, n=4, key_col="doc_id",
                            temperature=5.0, seed=seed).collect()}

    assert pick(1) == pick(1)
    assert any(pick(s) != pick(1) for s in range(2, 8))


def test_sample_prefers_target_like_under_noise(spark):
    t, r = _dfs(spark)
    logw = dsir_fit(t, r, n_buckets=B)
    got = [x["doc_id"] for x in
           dsir_sample(r, logw, n=5, key_col="doc_id",
                       temperature=1.0, seed=3).collect()]
    # at temperature 1 the good/spam gap dwarfs Gumbel noise
    assert set(got) == {0, 1, 2, 3, 4}
