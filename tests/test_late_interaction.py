"""MaxSim late-interaction retrieval (operators/late_interaction.py)
vs a numpy scalar reference and a DuckDB unnest/cross-join oracle."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from pyspark.sql import functions as F

from valkey_search_spark.operators.late_interaction import (
    maxsim_join, maxsim_score)

from .conftest import SF_DIR, load

EMB = f"{SF_DIR}/embeddings.parquet"


def _frames(spark, sf_dir):
    """Multi-vector frames from the real embeddings table: docs = one
    bag per label, queries = one bag per vec_id % 8 (vec_id < 40)."""
    emb = load(spark, sf_dir, "embeddings")
    docs = (emb.groupBy(F.col("label").alias("did"))
            .agg(F.sort_array(F.collect_list(F.struct("vec_id", "embedding")))
                 .alias("s"))
            .select("did", F.col("s.embedding").alias("vecs")))
    queries = (emb.where(F.col("vec_id") < 40)
               .groupBy((F.col("vec_id") % 8).alias("qid"))
               .agg(F.sort_array(F.collect_list(
                   F.struct("vec_id", "embedding"))).alias("s"))
               .select("qid", F.col("s.embedding").alias("vecs")))
    return queries, docs


def _scalar_maxsim(emb_rows, metric="ip"):
    """(qid, did) -> score via plain numpy."""
    import collections
    qbags = collections.defaultdict(list)
    dbags = collections.defaultdict(list)
    for r in emb_rows:
        v = np.asarray(r["embedding"], dtype=np.float64)
        if metric == "cosine":
            n = np.linalg.norm(v)
            v = v / n if n > 0 else v
        dbags[r["label"]].append(v)
        if r["vec_id"] < 40:
            qbags[r["vec_id"] % 8].append(v)
    out = {}
    for qid, qm in qbags.items():
        for did, dm in dbags.items():
            s = (np.asarray(qm) @ np.asarray(dm).T).max(axis=1).sum()
            out[(qid, did)] = float(s)
    return out


def test_maxsim_join_matches_scalar(spark, sf_dir):
    queries, docs = _frames(spark, sf_dir)
    res = maxsim_join(queries, docs, k=3, doc_key="did")
    want = _scalar_maxsim(load(spark, sf_dir, "embeddings").collect())
    got = {(r["qid"], r["did"]): (r["score"], r["rank"])
           for r in res.collect()}
    # every (qid, rank) must be the scalar reference's rank-th doc
    import collections
    byq = collections.defaultdict(list)
    for (qid, did), s in want.items():
        byq[qid].append((-s, did))
    for qid, lst in byq.items():
        for rank, (negs, did) in enumerate(sorted(lst)[:3], 1):
            assert got[(qid, did)][1] == rank
            assert got[(qid, did)][0] == pytest.approx(-negs, rel=1e-12)


def test_maxsim_join_matches_duckdb(spark, sf_dir):
    queries, docs = _frames(spark, sf_dir)
    res = maxsim_join(queries, docs, k=3, doc_key="did")
    got = sorted((r["qid"], r["did"], round(r["score"], 6), r["rank"])
                 for r in res.collect())
    want = sorted(tuple(r) for r in duckdb.sql(f"""
        WITH qt AS (SELECT vec_id % 8 AS qid, vec_id AS qtok, embedding
                    FROM '{EMB}' WHERE vec_id < 40),
         dt AS (SELECT label AS did, embedding FROM '{EMB}'),
         dots AS (SELECT qid, qtok, did,
                    max(list_inner_product(qt.embedding::DOUBLE[],
                                           dt.embedding::DOUBLE[])) AS m
                  FROM qt CROSS JOIN dt GROUP BY qid, qtok, did),
         score AS (SELECT qid, did, sum(m) AS s FROM dots
                   GROUP BY qid, did),
         ranked AS (SELECT qid, did, s,
                      row_number() OVER (PARTITION BY qid
                        ORDER BY s DESC, did) AS rank FROM score)
        SELECT CAST(qid AS BIGINT), CAST(did AS BIGINT),
               ROUND(s, 6) + 0.0, CAST(rank AS INT)
        FROM ranked WHERE rank <= 3""").fetchall())
    assert got == want


def test_maxsim_cosine_normalizes_both_sides(spark, sf_dir):
    queries, docs = _frames(spark, sf_dir)
    res = maxsim_join(queries, docs, k=2, doc_key="did", metric="cosine")
    want = _scalar_maxsim(load(spark, sf_dir, "embeddings").collect(),
                          metric="cosine")
    for r in res.collect():
        assert r["score"] == pytest.approx(
            want[(r["qid"], r["did"])], rel=1e-12)
        # cosine per-token max is <= 1, so score <= token count
        assert r["score"] <= 40 / 8 + 1e-9


def test_maxsim_score_pairs_reranks_join_candidates(spark, sf_dir):
    queries, docs = _frames(spark, sf_dir)
    top = maxsim_join(queries, docs, k=3, doc_key="did")
    rescored = maxsim_score(queries, docs, pairs=top.select("qid", "did"),
                            doc_key="did")
    a = {(r["qid"], r["did"]): r["score"] for r in top.collect()}
    b = {(r["qid"], r["did"]): r["score"] for r in rescored.collect()}
    assert a.keys() == b.keys()
    for key in a:
        assert a[key] == pytest.approx(b[key], rel=1e-12)


def test_empty_bags_never_match(spark):
    queries = spark.createDataFrame(
        [(1, [[1.0, 0.0]]), (2, [])],
        "qid int, vecs array<array<float>>")
    docs = spark.createDataFrame(
        [(10, [[1.0, 0.0], [0.0, 1.0]]), (11, []), (12, None)],
        "doc_id int, vecs array<array<float>>")
    rows = maxsim_join(queries, docs, k=5).collect()
    assert {(r["qid"], r["doc_id"]) for r in rows} == {(1, 10)}
    assert rows[0]["score"] == pytest.approx(1.0)


def test_maxsim_join_plan_one_python_node(spark, sf_dir):
    queries, docs = _frames(spark, sf_dir)
    plan = maxsim_join(queries, docs, k=3, doc_key="did") \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") == 1
    assert "BatchEvalPython" not in plan
    assert "WindowGroupLimit" in plan


def test_bad_metric_rejected(spark, sf_dir):
    queries, docs = _frames(spark, sf_dir)
    with pytest.raises(ValueError):
        maxsim_join(queries, docs, metric="l2")


def test_all_empty_query_bags_return_no_rows(spark):
    queries = spark.createDataFrame(
        [(1, []), (2, None)], "qid int, vecs array<array<float>>")
    docs = spark.createDataFrame(
        [(10, [[1.0, 0.0]])], "doc_id int, vecs array<array<float>>")
    assert maxsim_join(queries, docs, k=3).collect() == []


def test_score_ties_keep_smallest_doc_keys(spark):
    # four docs with IDENTICAL score in one partition; k=3 must keep the
    # three smallest keys (score desc, key asc) regardless of arrival
    # order — the per-partition heap's eviction contract
    queries = spark.createDataFrame(
        [(1, [[1.0, 0.0]])], "qid int, vecs array<array<float>>")
    docs = spark.createDataFrame(
        [(40, [[1.0, 0.0]]), (30, [[1.0, 0.0]]),
         (20, [[1.0, 0.0]]), (10, [[1.0, 0.0]])],
        "doc_id int, vecs array<array<float>>").coalesce(1)
    got = [(r["doc_id"], r["rank"]) for r in
           maxsim_join(queries, docs, k=3).orderBy("rank").collect()]
    assert got == [(10, 1), (20, 2), (30, 3)]


def test_query_broadcast_size_guard_raises_before_collect(spark):
    # 3 queries x 2 tokens x 2 dims x 8B = 96 bytes stacked; a 64-byte
    # cap must raise with chunking guidance BEFORE any driver collect
    queries = spark.createDataFrame(
        [(i, [[1.0, 0.0], [0.0, 1.0]]) for i in range(3)],
        "qid int, vecs array<array<float>>")
    docs = spark.createDataFrame(
        [(10, [[1.0, 0.0]])], "doc_id int, vecs array<array<float>>")
    with pytest.raises(ValueError, match="max_broadcast_bytes"):
        maxsim_join(queries, docs, k=3, max_broadcast_bytes=64)
    # explicit opt-out still runs
    rows = maxsim_join(queries, docs, k=3,
                       max_broadcast_bytes=None).collect()
    assert len(rows) == 3


def test_ragged_query_bag_raises_with_key(spark):
    queries = spark.createDataFrame(
        [(7, [[1.0, 0.0], [0.5]])], "qid int, vecs array<array<float>>")
    docs = spark.createDataFrame(
        [(10, [[1.0, 0.0]])], "doc_id int, vecs array<array<float>>")
    with pytest.raises(ValueError, match="ragged token bag.*query key 7"):
        maxsim_join(queries, docs, k=3)


def test_ragged_doc_bag_raises_with_key(spark):
    from pyspark.errors.exceptions.captured import PythonException

    queries = spark.createDataFrame(
        [(1, [[1.0, 0.0]])], "qid int, vecs array<array<float>>")
    docs = spark.createDataFrame(
        [(99, [[1.0, 0.0], [0.5]])], "doc_id int, vecs array<array<float>>")
    with pytest.raises(PythonException, match="ragged token bag.*doc key 99"):
        maxsim_join(queries, docs, k=3).collect()


def test_maxsim_score_empty_bag_scores_null_not_nan(spark):
    # empty bags score NULL so a `score desc` rerank (default
    # desc_nulls_last) puts them LAST — NaN would sort them FIRST
    queries = spark.createDataFrame(
        [(1, [[1.0, 0.0]])], "qid int, vecs array<array<float>>")
    docs = spark.createDataFrame(
        [(10, [[1.0, 0.0]]), (11, [])],
        "doc_id int, vecs array<array<float>>")
    pairs = spark.createDataFrame([(1, 10), (1, 11)], "qid int, doc_id int")
    res = maxsim_score(queries, docs, pairs=pairs)
    got = {r["doc_id"]: r["score"] for r in res.collect()}
    assert got[10] == pytest.approx(1.0)
    assert got[11] is None
    ranked = [r["doc_id"] for r in
              res.orderBy(F.col("score").desc()).collect()]
    assert ranked == [10, 11]


def test_query_size_hint_skips_probe_but_keeps_guard(spark):
    queries = spark.createDataFrame(
        [(1, [[1.0, 0.0], [0.0, 1.0]])],
        "qid int, vecs array<array<float>>")
    docs = spark.createDataFrame(
        [(10, [[1.0, 0.0]])], "doc_id int, vecs array<array<float>>")
    # hint exceeding the cap raises WITHOUT running the probe job
    with pytest.raises(ValueError, match="max_broadcast_bytes"):
        maxsim_join(queries, docs, k=2, max_broadcast_bytes=64,
                    query_size_hint=(1_000_000, 2))
    # accurate hint under the cap runs and matches the unhinted result
    a = sorted(map(tuple, maxsim_join(
        queries, docs, k=2, query_size_hint=(2, 2)).collect()))
    b = sorted(map(tuple, maxsim_join(queries, docs, k=2).collect()))
    assert a == b and len(a) == 1
