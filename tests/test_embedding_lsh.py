"""Embedding near-dup: threshold-aware physical strategy — OR-amplified
hyperplane LSH at selective thresholds, exact block-matrix BLAS in the
bulk — both verified against brute force."""

import numpy as np
import pytest
from pyspark.sql import Row

from valkey_search_spark.operators import dedup as dd

SF = "/root/testdata/sf0.001"


def _pairs(df):
    return {(r["a"], r["b"]) for r in df.collect()}


def test_low_threshold_takes_block_path_and_is_exact(spark):
    """cosine 0.4 sits in the bulk — no sign-hash family prunes there, so
    the planner picks the distributed block-BLAS plan; results must equal
    brute force exactly."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    assert not dd.lsh_is_selective(0.4)
    default = dd.embedding_cosine_pairs(emb, "vec_id", threshold=0.4)
    forced = dd.embedding_cosine_pairs(emb, "vec_id", threshold=0.4,
                                       exact=True)
    assert _pairs(default) == _pairs(forced) and len(_pairs(forced)) > 0


def test_high_threshold_takes_lsh_and_matches_exact(spark):
    """Planted near-duplicates at cosine ~0.97: the auto-tuned LSH path
    (selective at 0.92) must recover every exact pair (1e-4 miss target,
    deterministic for the fixed seed)."""
    assert dd.lsh_is_selective(0.92)
    rng = np.random.default_rng(7)
    base = rng.standard_normal((120, 32))
    rows = [Row(vec_id=i, embedding=[float(x) for x in v])
            for i, v in enumerate(base)]
    # 40 near-duplicates: tiny perturbation keeps cosine ~0.97+
    for i in range(40):
        v = base[i] + 0.1 * rng.standard_normal(32)
        rows.append(Row(vec_id=1000 + i, embedding=[float(x) for x in v]))
    emb = spark.createDataFrame(rows)
    exact = _pairs(dd.embedding_cosine_pairs(emb, "vec_id", threshold=0.92,
                                             exact=True))
    lsh_df = dd.embedding_cosine_pairs(emb, "vec_id", threshold=0.92)
    assert len(exact) >= 30            # the planted dups are really there
    assert _pairs(lsh_df) == exact
    dd.release(lsh_df)


def test_undersized_lsh_recall_and_precision(spark):
    """With deliberately small forced k/L the s-curve still gives >=0.9
    recall, and the exact verify step guarantees zero false pairs."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    exact = _pairs(dd.embedding_cosine_pairs(emb, "vec_id", threshold=0.4,
                                             exact=True))
    lsh = _pairs(dd.embedding_cosine_pairs(emb, "vec_id", threshold=0.4,
                                           lsh_planes=3, lsh_tables=12))
    assert lsh <= exact                       # exact verify: no false pairs
    assert len(lsh & exact) / max(len(exact), 1) >= 0.9   # OR-amplified recall


def test_auto_params_follow_threshold():
    k_tight, l_tight = dd.auto_lsh_params(0.95)
    k_loose, l_loose = dd.auto_lsh_params(0.4)
    assert k_tight > k_loose            # high threshold -> deeper tables
    assert k_loose >= 2 and l_loose >= 8
    # bulk pruning at the tight threshold: candidate rate for cosine~0
    # pairs is L/2^k — must be well under 1%
    assert l_tight / 2 ** k_tight < 0.01
    assert dd.lsh_is_selective(0.95) and not dd.lsh_is_selective(0.6)


def test_release_unpersists(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    out = dd.embedding_cosine_pairs(emb, "vec_id", threshold=0.4,
                                    lsh_planes=3, lsh_tables=12)
    out.count()
    assert getattr(out, "_vss_cached")
    dd.release(out, blocking=True)
    assert not out._vss_cached


def test_auto_params_endpoint_thresholds_do_not_crash():
    """threshold=1.0 gives collision prob p=1.0 and -1.0 gives p=0.0;
    both previously blew up in log() — the clamp keeps them finite and
    embedding_cosine_pairs(threshold=1.0) stays callable (it calls
    auto_lsh_params unconditionally, even when exact or lsh_planes is
    forced)."""
    k1, l1 = dd.auto_lsh_params(1.0)
    assert 1 <= k1 <= 24 and 1 <= l1 <= 64
    k0, l0 = dd.auto_lsh_params(-1.0)
    assert 1 <= k0 <= 24 and 1 <= l0 <= 64
    assert dd.auto_lsh_params(0.0)  # midpoint still fine


def test_find_exact_duplicates_threshold_one(spark):
    """End-to-end: a find-exact-duplicates threshold of 1.0 runs (the
    round-2 code raised ZeroDivisionError before any job started)."""
    from pyspark.sql import Row

    rows = [Row(k=1, v=[1.0, 0.0]), Row(k=2, v=[1.0, 0.0]),
            Row(k=3, v=[0.0, 1.0])]
    df = spark.createDataFrame(rows)
    out = dd.embedding_cosine_pairs(df, "k", vec_col="v", threshold=1.0)
    pairs = {(r.a, r.b) for r in out.collect()}
    assert pairs == {(1, 2)}
    dd.release(out)
