"""ir_metrics / ir_summary: hand-computed cases, DuckDB recomputation
on generated logs, end-to-end over the engine's own KNN results."""
from __future__ import annotations

import math

import duckdb
import numpy as np
import pytest

from pyspark.sql import functions as F

from valkey_search_spark.operators.evaluation import ir_metrics, ir_summary


def test_hand_computed_case(spark):
    # q1: docs ranked a(3.0) b(2.0) c(1.0); relevant: b (grade 1), d (2)
    results = spark.createDataFrame(
        [("q1", "a", 3.0), ("q1", "b", 2.0), ("q1", "c", 1.0)],
        "qid string, doc_id string, score double")
    qrels = spark.createDataFrame(
        [("q1", "b", 1), ("q1", "d", 2)],
        "qid string, doc_id string, grade int")
    r = ir_metrics(results, qrels, k=2).collect()[0]
    assert r["n_results"] == 3 and r["n_relevant"] == 2
    assert r["precision_at_k"] == pytest.approx(0.5)   # b in top-2
    assert r["recall_at_k"] == pytest.approx(0.5)
    assert r["mrr"] == pytest.approx(1 / 2)            # first rel at rank 2
    dcg = (2 ** 1 - 1) / math.log2(2 + 1)              # b at rank 2
    idcg = (2 ** 2 - 1) / math.log2(1 + 1) + (2 ** 1 - 1) / math.log2(2 + 1)
    assert r["ndcg_at_k"] == pytest.approx(dcg / idcg)


def test_no_results_and_unjudged_queries(spark):
    results = spark.createDataFrame(
        [("q_unjudged", "x", 1.0)], "qid string, doc_id string, score double")
    qrels = spark.createDataFrame(
        [("q_empty", "y", 1)], "qid string, doc_id string, grade int")
    rows = {r["qid"]: r for r in ir_metrics(results, qrels, k=5).collect()}
    assert set(rows) == {"q_empty"}        # unjudged excluded
    r = rows["q_empty"]                     # judged-but-no-results: zeros
    assert (r["n_results"], r["mrr"], r["ndcg_at_k"]) == (0, 0.0, 0.0)
    assert r["recall_at_k"] == 0.0


def test_matches_duckdb_on_random_log(spark):
    rng = np.random.RandomState(9)
    res = [(f"q{q}", f"d{d}", float(s)) for q in range(30)
           for d, s in enumerate(rng.uniform(0, 1, 25).round(6))]
    rel = [(f"q{q}", f"d{d}", int(g)) for q in range(30)
           for d, g in enumerate(rng.randint(0, 3, 25)) if g > 0]
    results = spark.createDataFrame(
        res, "qid string, doc_id string, score double")
    qrels = spark.createDataFrame(
        rel, "qid string, doc_id string, grade int")
    k = 10
    got = {r["qid"]: r for r in ir_metrics(results, qrels, k=k).collect()}

    con = duckdb.connect()
    con.register("res", __import__("pandas").DataFrame(
        res, columns=["qid", "doc_id", "score"]))
    con.register("rel", __import__("pandas").DataFrame(
        rel, columns=["qid", "doc_id", "grade"]))
    want = con.sql(f"""
        WITH ranked AS (
          SELECT qid, doc_id,
                 row_number() OVER (PARTITION BY qid
                                    ORDER BY score DESC, doc_id) AS rnk
          FROM res),
        hits AS (SELECT r.qid, r.rnk, l.grade FROM ranked r
                 JOIN rel l USING (qid, doc_id)),
        perq AS (SELECT qid,
                        sum(CASE WHEN rnk <= {k} THEN 1 ELSE 0 END) relk,
                        min(rnk) frst,
                        sum(CASE WHEN rnk <= {k} THEN
                            (pow(2, grade) - 1) / log2(rnk + 1)
                            ELSE 0 END) dcg
                 FROM hits GROUP BY qid),
        ideal AS (SELECT qid, sum((pow(2, grade) - 1) / log2(irank + 1))
                         idcg
                  FROM (SELECT qid, grade,
                               row_number() OVER (PARTITION BY qid
                                   ORDER BY grade DESC, doc_id) irank
                        FROM rel)
                  WHERE irank <= {k} GROUP BY qid),
        nrel AS (SELECT qid, count(*) nr FROM rel GROUP BY qid)
        SELECT n.qid, coalesce(p.relk, 0) / {k}.0,
               coalesce(p.relk, 0) / CAST(n.nr AS DOUBLE),
               coalesce(1.0 / p.frst, 0.0),
               coalesce(p.dcg / i.idcg, 0.0)
        FROM nrel n JOIN ideal i USING (qid)
        LEFT JOIN perq p USING (qid)
    """).fetchall()
    assert len(want) == len(got) == 30
    for qid, pk, rk, mrr, ndcg in want:
        g = got[qid]
        assert g["precision_at_k"] == pytest.approx(pk)
        assert g["recall_at_k"] == pytest.approx(rk)
        assert g["mrr"] == pytest.approx(mrr)
        assert g["ndcg_at_k"] == pytest.approx(ndcg)


def test_summary_is_mean_and_engine_knn_perfect_self_recall(spark, sf_dir):
    # engine-level: exact KNN's top-k judged against itself -> all 1.0
    from tests.conftest import load
    from valkey_search_spark.operators.ann import knn_join

    emb = load(spark, sf_dir, "embeddings").limit(300)
    q = emb.limit(12).select(F.col("vec_id").alias("qid"), "embedding")
    res = knn_join(q, emb.select("vec_id", "embedding"), k=5,
                   corpus_key="vec_id") \
        .select("qid", F.col("vec_id").alias("doc_id"),
                (-F.col("distance")).alias("score"))
    qrels = res.select("qid", "doc_id", F.lit(1).alias("grade"))
    s = ir_summary(res, qrels, k=5).collect()[0]
    assert s["n_queries"] == 12
    for m in ("precision_at_k", "recall_at_k", "mrr", "ndcg_at_k"):
        assert s[m] == pytest.approx(1.0), m


def test_validation(spark):
    df = spark.createDataFrame([("q", "d", 1.0)],
                               "qid string, doc_id string, score double")
    with pytest.raises(ValueError):
        ir_metrics(df, df.withColumnsRenamed({"score": "grade"}), k=0)


def test_duplicate_results_and_qrels_collapse(spark):
    # doc b returned twice + judged twice: metrics must match the
    # deduplicated log (recall/NDCG can never exceed 1.0)
    results = spark.createDataFrame(
        [("q", "a", 3.0), ("q", "b", 2.0), ("q", "b", 0.5)],
        "qid string, doc_id string, score double")
    qrels = spark.createDataFrame(
        [("q", "b", 1), ("q", "b", 2)],
        "qid string, doc_id string, grade int")
    r = ir_metrics(results, qrels, k=2).collect()[0]
    assert r["n_results"] == 2          # distinct docs
    assert r["n_relevant"] == 1
    assert r["recall_at_k"] == pytest.approx(1.0)
    assert r["mrr"] == pytest.approx(1 / 2)
    # grade 2 kept (max); b actually at rank 2, ideally rank 1
    want = ((2 ** 2 - 1) / math.log2(3)) / ((2 ** 2 - 1) / math.log2(2))
    assert r["ndcg_at_k"] == pytest.approx(want)


# -- paired bootstrap significance ----------------------------------------

def _sig_fixture(spark, n_q=60, b_wins=48):
    """qrels: one relevant doc per query. Run A ranks it 3rd for every
    query; run B ranks it 1st for the first `b_wins` queries and 3rd
    for the rest — a large, known effect."""
    qrels = spark.createDataFrame(
        [(q, f"rel{q}", 1) for q in range(n_q)], ["qid", "doc_id", "grade"])
    def run(first_rel_queries):
        rows = []
        for q in range(n_q):
            rel_rank = 1 if q < first_rel_queries else 3
            docs = ["x1", "x2", "x3"]
            docs.insert(rel_rank - 1, f"rel{q}")
            for i, dd in enumerate(docs[:3]):
                rows.append((q, dd, 10.0 - i))
        return spark.createDataFrame(rows, ["qid", "doc_id", "score"])
    return run(0), run(b_wins), qrels


def test_paired_bootstrap_detects_real_effect(spark):
    from valkey_search_spark.operators.evaluation import (
        ir_summary, paired_bootstrap)

    a, b, qrels = _sig_fixture(spark)
    r = paired_bootstrap(a, b, qrels, metric="mrr", k=10)
    assert r["n_queries"] == 60
    assert r["delta"] > 0.4                      # 48/60 * (1 - 1/3)
    assert r["p_value"] <= 0.01
    assert r["ci_lo"] <= r["delta"] <= r["ci_hi"]
    assert r["ci_lo"] > 0
    # means cross-pin against the (DuckDB-pinned) ir_summary operator
    sa = ir_summary(a, qrels, k=10).collect()[0]
    sb = ir_summary(b, qrels, k=10).collect()[0]
    assert r["mean_a"] == pytest.approx(sa["mrr"], abs=1e-12)
    assert r["mean_b"] == pytest.approx(sb["mrr"], abs=1e-12)


def test_paired_bootstrap_null_effect_and_symmetry(spark):
    from valkey_search_spark.operators.evaluation import paired_bootstrap

    a, b, qrels = _sig_fixture(spark)
    same = paired_bootstrap(a, a, qrels, metric="ndcg_at_k")
    assert same["delta"] == 0.0
    assert same["p_value"] == 1.0
    assert same["mean_a"] == same["mean_b"]
    ab = paired_bootstrap(a, b, qrels, metric="mrr")
    ba = paired_bootstrap(b, a, qrels, metric="mrr")
    assert ab["p_value"] == ba["p_value"]        # two-sided symmetry
    assert ab["delta"] == -ba["delta"]


def test_paired_bootstrap_deterministic_and_contracts(spark):
    from valkey_search_spark.operators.evaluation import paired_bootstrap

    a, b, qrels = _sig_fixture(spark)
    r1 = paired_bootstrap(a, b, qrels, metric="mrr", seed=11)
    r2 = paired_bootstrap(a, b, qrels, metric="mrr", seed=11)
    assert r1 == r2
    with pytest.raises(ValueError, match="metric"):
        paired_bootstrap(a, b, qrels, metric="f1")
    with pytest.raises(ValueError, match="n_boot"):
        paired_bootstrap(a, b, qrels, n_boot=10)
    empty = qrels.where("qid < 0")
    with pytest.raises(ValueError, match="judged"):
        paired_bootstrap(a, b, empty)
