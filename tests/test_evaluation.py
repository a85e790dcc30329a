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
