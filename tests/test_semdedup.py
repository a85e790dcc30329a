"""SemDeDup semantic dedup: greedy-leader kernel vs a scalar reference,
keep-policy semantics, cluster splitting, and real-corpus invariants."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from valkey_search_spark.operators.semdedup import (
    _greedy_leaders, semantic_dedup, semantic_dedup_flags,
)

SF = "/root/testdata/sf0.001"


def _scalar_greedy(unit, threshold):
    kept, verdicts = [], []
    for i, v in enumerate(unit):
        best, best_j = -2.0, -1
        for j in kept:
            s = float(v @ unit[j])
            if s > best:
                best, best_j = s, j
        if best >= threshold:
            verdicts.append((False, best_j))
        else:
            kept.append(i)
            verdicts.append((True, -1))
    return verdicts


@pytest.mark.parametrize("chunk", [3, 7, 1024])
def test_greedy_kernel_matches_scalar(chunk):
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(40, 8))
    # plant duplicates: rows 5..9 are jittered copies of rows 0..4
    vecs[5:10] = vecs[0:5] + rng.normal(scale=1e-3, size=(5, 8))
    unit = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    keep, rep = _greedy_leaders(unit, threshold=0.95, chunk=chunk)
    want = _scalar_greedy(unit, 0.95)
    assert [(bool(k), int(r)) for k, r in zip(keep, rep)] == want
    assert keep.sum() < 40          # the planted dups actually collapsed


def _toy(spark, policy, **kw):
    # three far-apart groups of mutually-near vectors; key order scrambled
    base = np.eye(3, 16)
    rows = []
    for g in range(3):
        for j in range(4):
            v = base[g] + 1e-3 * np.arange(16) * (j + 1)
            rows.append((g * 10 + (3 - j), [float(x) for x in v]))
    df = spark.createDataFrame(rows, "doc_id long, embedding array<float>")
    return semantic_dedup_flags(df, threshold=0.9, n_clusters=3,
                                keep=policy, seed=1, **kw)


def test_one_leader_per_group_min_key(spark):
    flags = _toy(spark, "min_key").collect()
    assert len(flags) == 12
    kept = sorted(r["doc_id"] for r in flags if r["__keep"])
    assert kept == [10 * g + 0 for g in range(3)]     # min key of each group
    for r in flags:
        if not r["__keep"]:
            assert r["__rep"] == (r["doc_id"] // 10) * 10
        else:
            assert r["__rep"] is None


def test_centroid_far_keeps_least_prototypical(spark):
    """The paper's retention rule: the kept row of each dup group is the
    one FARTHEST from its centroid (here: the largest jitter, j=1 ->
    key g*10+... largest perturbation is j+1=4 -> key g*10+(3-3)=g*10)."""
    flags = _toy(spark, "centroid_far").collect()
    kept = {r["doc_id"] for r in flags if r["__keep"]}
    assert len(kept) == 3
    # per-group leader = member with max perturbation scale (j=3 -> key g*10)
    # independent scalar recompute of the farthest member per group:
    base = np.eye(3, 16)
    for g in range(3):
        members = {}
        for j in range(4):
            v = base[g] + 1e-3 * np.arange(16) * (j + 1)
            members[g * 10 + (3 - j)] = v
        cent = np.mean(list(members.values()), axis=0)
        sim = {k: float((v / np.linalg.norm(v))
                        @ (cent / np.linalg.norm(cent)))
               for k, v in members.items()}
        far = min(sim, key=lambda k: (sim[k], k))
        assert far in kept


def test_semantic_dedup_filters_corpus(spark):
    base = np.eye(2, 8)
    rows = [(i, [float(x) for x in base[i % 2] + 1e-4 * i]) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, embedding array<float>")
    out = semantic_dedup(df, threshold=0.9, n_clusters=2, seed=3)
    assert out.count() == 2
    assert set(out.columns) == {"doc_id", "embedding"}


def test_real_corpus_invariants(spark):
    emb = (spark.read.parquet(f"{SF}/embeddings.parquet")
           .select(F.col("vec_id").alias("doc_id"), "embedding"))
    flags = semantic_dedup_flags(emb, threshold=0.99, n_clusters=8, seed=42)
    rows = flags.collect()
    assert len(rows) == emb.count()                  # verdict per input row
    kept = {r["doc_id"] for r in rows if r["__keep"]}
    for r in rows:
        if not r["__keep"]:
            assert r["__rep"] in kept                # rep is a kept leader
    # deterministic under re-run
    again = {(r["doc_id"], r["__keep"])
             for r in semantic_dedup_flags(emb, threshold=0.99, n_clusters=8,
                                           seed=42).collect()}
    assert again == {(r["doc_id"], r["__keep"]) for r in rows}


def test_max_cluster_rows_bounds_tasks(spark):
    emb = (spark.read.parquet(f"{SF}/embeddings.parquet")
           .select(F.col("vec_id").alias("doc_id"), "embedding"))
    cap = 60
    flags = semantic_dedup_flags(emb, threshold=0.95, n_clusters=4,
                                 max_cluster_rows=cap, seed=42)
    sizes = {r["__cluster"]: r["n"] for r in
             flags.groupBy("__cluster").agg(F.count("*").alias("n")).collect()}
    assert max(sizes.values()) <= cap
    assert len(sizes) > 4                            # splitting happened


def test_null_embeddings_pass_through_kept(spark):
    base = np.eye(2, 8)
    rows = [(i, [float(x) for x in base[i % 2] + 1e-4 * i]) for i in range(6)]
    rows += [(100, None), (101, None)]
    df = spark.createDataFrame(rows, "doc_id long, embedding array<float>")
    flags = semantic_dedup_flags(df, threshold=0.9, n_clusters=2, seed=3)
    got = {r["doc_id"]: r for r in flags.collect()}
    assert len(got) == 8                       # verdict for EVERY input row
    assert got[100]["__keep"] and got[100]["__cluster"] is None
    out = semantic_dedup(df, threshold=0.9, n_clusters=2, seed=3,
                         max_iter=5)           # max_iter forwards
    ids = {r["doc_id"] for r in out.collect()}
    assert {100, 101} <= ids and len(ids) == 4   # 2 leaders + 2 nulls
