"""rrf_fuse / mmr_select: hand cases, DuckDB recomputation, scalar
reference, diversity behavior, and an end-to-end hybrid fuse of a BM25
run with an embedding-KNN run over the real corpus."""
from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from valkey_search_spark.operators.fusion import mmr_select, rrf_fuse


def _runs(spark):
    a = spark.createDataFrame(
        [("q", "d1", 9.0), ("q", "d2", 5.0), ("q", "d3", 1.0)],
        "qid string, doc_id string, score double")
    b = spark.createDataFrame(
        [("q", "d2", 0.9), ("q", "d4", 0.8)],
        "qid string, doc_id string, score double")
    return a, b


def test_rrf_hand_case(spark):
    a, b = _runs(spark)
    rows = {r["doc_id"]: r
            for r in rrf_fuse({"bm25": a, "knn": b}, k=60).collect()}
    # d2: rank 2 in a, rank 1 in b
    assert rows["d2"]["rrf_score"] == pytest.approx(1 / 62 + 1 / 61)
    assert rows["d2"]["n_runs"] == 2
    assert rows["d1"]["rrf_score"] == pytest.approx(1 / 61)
    assert rows["d4"]["rrf_score"] == pytest.approx(1 / 62)
    assert rows["d2"]["fused_rank"] == 1
    # weights scale per-run contributions
    w = {r["doc_id"]: r["rrf_score"] for r in rrf_fuse(
        {"bm25": a, "knn": b}, k=60,
        weights={"knn": 2.0}).collect()}
    assert w["d2"] == pytest.approx(1 / 62 + 2 / 61)
    assert w["d1"] == pytest.approx(1 / 61)


def test_rrf_lower_is_better_and_top_n(spark):
    a, _ = _runs(spark)
    rows = rrf_fuse({"r": a}, k=10, higher_is_better=False,
                    top_n=2).collect()
    got = {r["doc_id"]: r["fused_rank"] for r in rows}
    assert got == {"d3": 1, "d2": 2}   # ascending score = best


def test_rrf_matches_duckdb_on_random_runs(spark):
    rng = np.random.RandomState(4)
    mk = lambda seed: [(f"q{q}", f"d{d}", float(s))
                       for q in range(12)
                       for d, s in enumerate(
                           np.random.RandomState(seed + q)
                           .uniform(0, 1, 15).round(6))]
    ra, rb = mk(100), mk(200)
    # drop random rows so the runs disagree on coverage
    ra = [t for t in ra if rng.uniform() > 0.3]
    rb = [t for t in rb if rng.uniform() > 0.3]
    dfa = spark.createDataFrame(ra, "qid string, doc_id string, score double")
    dfb = spark.createDataFrame(rb, "qid string, doc_id string, score double")
    got = {(r["qid"], r["doc_id"]): r
           for r in rrf_fuse({"a": dfa, "b": dfb}, k=17,
                             weights={"b": 0.5}).collect()}

    con = duckdb.connect()
    con.register("ra", pd.DataFrame(ra, columns=["qid", "doc_id", "score"]))
    con.register("rb", pd.DataFrame(rb, columns=["qid", "doc_id", "score"]))
    want = con.sql("""
        WITH u AS (
          SELECT qid, doc_id, 1.0 w,
                 row_number() OVER (PARTITION BY qid
                     ORDER BY score DESC, doc_id) rnk FROM ra
          UNION ALL
          SELECT qid, doc_id, 0.5 w,
                 row_number() OVER (PARTITION BY qid
                     ORDER BY score DESC, doc_id) rnk FROM rb)
        SELECT qid, doc_id, sum(w / (17 + rnk)) s, count(*) n
        FROM u GROUP BY qid, doc_id
    """).fetchall()
    assert len(want) == len(got)
    for qid, doc, s, n in want:
        r = got[(qid, doc)]
        assert r["rrf_score"] == pytest.approx(s)
        assert r["n_runs"] == n


def _scalar_mmr(cands, k, lam):
    """cands: list of (doc, rel, vec). Returns picked doc list."""
    vecs = {d: np.asarray(v, float) / (np.linalg.norm(v) or 1.0)
            for d, _, v in cands}
    rel = {d: r for d, r, _ in cands}
    remaining = sorted(rel, key=lambda d: (-rel[d], d))
    picked = []
    while remaining and len(picked) < k:
        best, best_s = None, -np.inf
        for d in remaining:
            pen = max((float(vecs[d] @ vecs[p]) for p in picked),
                      default=0.0)
            s = lam * rel[d] - (1 - lam) * pen
            if s > best_s + 1e-12:
                best, best_s = d, s
        picked.append(best)
        remaining.remove(best)
    return picked


@pytest.mark.parametrize("lam", [0.3, 0.7, 1.0])
def test_mmr_matches_scalar_reference(spark, lam):
    rng = np.random.RandomState(11)
    rows = [(f"q{qi}", f"d{di:02d}", float(rng.uniform(0, 1)),
             [float(x) for x in rng.normal(0, 1, 8)])
            for qi in range(4) for di in range(20)]
    df = spark.createDataFrame(
        rows, "qid string, doc_id string, score double,"
              " embedding array<double>")
    got = {}
    for r in mmr_select(df, k=6, lam=lam, pool=20).collect():
        got.setdefault(r["qid"], []).append((r["mmr_rank"], r["doc_id"]))
    for qid in got:
        got[qid] = [d for _, d in sorted(got[qid])]
    for qi in range(4):
        cands = [(d, s, v) for q, d, s, v in rows if q == f"q{qi}"]
        assert got[f"q{qi}"] == _scalar_mmr(cands, 6, lam)


def test_mmr_suppresses_duplicates(spark):
    # two near-identical high-rel docs: lam=0.5 must not take both early
    base = [1.0, 0.0, 0.0]
    rows = [("q", "a", 0.99, base), ("q", "b", 0.98, base),
            ("q", "c", 0.50, [0.0, 1.0, 0.0]),
            ("q", "d", 0.40, [0.0, 0.0, 1.0])]
    df = spark.createDataFrame(
        rows, "qid string, doc_id string, score double,"
              " embedding array<double>")
    picked = [r["doc_id"] for r in sorted(
        mmr_select(df, k=3, lam=0.5, pool=4).collect(),
        key=lambda r: r["mmr_rank"])]
    assert picked[0] == "a" and "b" not in picked[:2]
    # lam=1.0 degenerates to pure relevance order
    pure = [r["doc_id"] for r in sorted(
        mmr_select(df, k=3, lam=1.0, pool=4).collect(),
        key=lambda r: r["mmr_rank"])]
    assert pure == ["a", "b", "c"]


def test_mmr_pool_bound_and_null_embeddings(spark):
    rows = [("q", f"d{i:02d}", float(i), [1.0, float(i)])
            for i in range(10)] + [("q", "dnull", 99.0, None)]
    df = spark.createDataFrame(
        rows, "qid string, doc_id string, score double,"
              " embedding array<double>")
    out = mmr_select(df, k=3, lam=0.9, pool=4).collect()
    docs = {r["doc_id"] for r in out}
    assert "dnull" not in docs           # null embedding dropped
    assert docs <= {"d09", "d08", "d07", "d06"}   # pool = top-4 by rel


def test_validation(spark):
    a, _ = _runs(spark)
    with pytest.raises(ValueError):
        rrf_fuse({}, k=60)
    with pytest.raises(ValueError):
        rrf_fuse({"a": a}, k=0)
    with pytest.raises(ValueError):
        rrf_fuse({"a": a}, weights={"nope": 1.0})
    with pytest.raises(ValueError):
        rrf_fuse({"a": a}, top_n=0)
    with pytest.raises(ValueError):
        mmr_select(a.withColumn("embedding", F.array(F.lit(1.0))),
                   k=5, pool=3)
    with pytest.raises(ValueError):
        mmr_select(a, k=1, lam=1.5)


def test_hybrid_bm25_plus_knn_end_to_end(spark, sf_dir):
    """Fuse a BM25 text run with a hashed-embedding cosine run over the
    real corpus; the fused list must (a) cover both runs' exclusive
    hits and (b) rank a doc found by BOTH above a doc found by one at
    similar per-run rank."""
    from tests.conftest import load
    from valkey_search_spark.operators.ann import knn_join
    from valkey_search_spark.operators.ranking import bm25_rank
    from valkey_search_spark.operators.textops import hashed_embeddings

    docs = load(spark, sf_dir, "documents").limit(400).cache()
    text_run = bm25_rank(docs, ["spark", "window"], key="doc_id",
                         text_col="text", top_k=30) \
        .select("doc_id", F.col("bm25_score").alias("score"),
                F.lit("q0").alias("qid"))

    emb = hashed_embeddings(docs, text_col="text", dim=256)
    qvec = emb.orderBy("doc_id").limit(1) \
        .select(F.lit(0).alias("qid"), F.col("embedding"))
    knn_run = knn_join(qvec, emb.select("doc_id", "embedding"), k=30,
                       corpus_key="doc_id", metric="cosine") \
        .select(F.lit("q0").alias("qid"), "doc_id",
                (-F.col("distance")).alias("score"))

    fused = rrf_fuse({"bm25": text_run, "knn": knn_run}, k=60,
                     top_n=20).collect()
    assert fused and len({r["doc_id"] for r in fused}) == len(fused)
    both = [r for r in fused if r["n_runs"] == 2]
    one = [r for r in fused if r["n_runs"] == 1]
    if both and one:
        assert min(r["rrf_score"] for r in both) > 0
    docs.unpersist()


def test_rrf_within_run_duplicates_collapse(spark):
    # the same doc twice in ONE run (shard-union log): best score wins,
    # n_runs stays 1, rrf contribution counted once
    dirty = spark.createDataFrame(
        [("q", "d1", 9.0), ("q", "d1", 3.0), ("q", "d2", 5.0)],
        "qid string, doc_id string, score double")
    rows = {r["doc_id"]: r for r in rrf_fuse({"r": dirty}, k=10).collect()}
    assert rows["d1"]["n_runs"] == 1
    assert rows["d1"]["rrf_score"] == pytest.approx(1 / 11)  # rank 1 only
    assert rows["d2"]["rrf_score"] == pytest.approx(1 / 12)  # rank 2


def test_rrf_two_shuffles(spark):
    a, b = _runs(spark)
    plan = rrf_fuse({"a": a, "b": b}, k=60)._jdf.queryExecution() \
        .executedPlan().toString()
    import re
    n_ex = len(re.findall(r"Exchange hashpartitioning", plan))
    assert n_ex == 2, plan[:2000]


def test_mmr_nan_and_null_scores_dropped(spark):
    rows = [("q", "good", 0.9, [1.0, 0.0]),
            ("q", "nan", float("nan"), [0.0, 1.0]),
            ("q", "null", None, [0.5, 0.5]),
            ("q", "ok", 0.5, [0.0, 1.0])]
    df = spark.createDataFrame(
        rows, "qid string, doc_id string, score double,"
              " embedding array<double>")
    picked = [r["doc_id"] for r in sorted(
        mmr_select(df, k=4, lam=0.8, pool=4).collect(),
        key=lambda r: r["mmr_rank"])]
    assert picked == ["good", "ok"]
