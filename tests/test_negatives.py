"""mine_hard_negatives vs a DuckDB brute-force replay on the real
embeddings table, plus margin/exclusion edge cases."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from valkey_search_spark.operators.negatives import (
    mine_hard_negatives, positive_distances)

from .conftest import SF_DIR, load

EMB = f"{SF_DIR}/embeddings.parquet"
COS = ("1 - list_cosine_similarity(q.embedding::DOUBLE[],"
       " c.embedding::DOUBLE[])")


def _frames(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 30).select(
        F.col("vec_id").alias("qid"), "embedding")
    corpus = emb.select(F.col("vec_id").alias("cid"), "embedding")
    # labeled positives: same-label nearest ids by construction rule
    positives = emb.where(F.col("vec_id") < 30).select(
        F.col("vec_id").alias("qid"),
        F.col("vec_id").alias("cid"))           # self is always positive
    return queries, corpus, positives


def _oracle(margin=None, k=5):
    margin_sql = ""
    if margin is not None:
        margin_sql = f"""
          AND d >= (SELECT min({COS}) FROM '{EMB}' q JOIN '{EMB}' c
                    ON c.vec_id = q.vec_id WHERE q.vec_id = qid) + {margin}"""
    return duckdb.sql(f"""
        WITH scored AS (
          SELECT q.vec_id AS qid, c.vec_id AS cid, {COS} AS d
          FROM '{EMB}' q CROSS JOIN '{EMB}' c WHERE q.vec_id < 30),
        kept AS (
          SELECT qid, cid, d FROM scored
          WHERE cid != qid {margin_sql}),
        ranked AS (
          SELECT qid, cid, d,
                 row_number() OVER (PARTITION BY qid ORDER BY d, cid) rnk
          FROM kept)
        SELECT qid, cid, ROUND(d, 6), rnk FROM ranked WHERE rnk <= {k}
    """).fetchall()


def test_matches_duckdb_no_margin(spark, sf_dir):
    queries, corpus, positives = _frames(spark, sf_dir)
    out = mine_hard_negatives(queries, corpus, positives, k=5,
                              fetch_factor=200)   # exact regime
    got = sorted((r["qid"], r["cid"], round(r["distance"], 6), r["rank"])
                 for r in out.collect())
    assert got == sorted(tuple(r) for r in _oracle(k=5))


def test_margin_drops_near_positives(spark, sf_dir):
    queries, corpus, positives = _frames(spark, sf_dir)
    # pick a margin just past the closest unfiltered negative so the
    # rule provably filters at least one row on this data (positives
    # are self-pairs, so the anchor distance is 0 for every query)
    plain = mine_hard_negatives(queries, corpus, positives, k=5,
                                fetch_factor=200)
    d_plain = min(r["distance"] for r in plain.collect())
    margin = round(d_plain + 0.05, 6)
    out = mine_hard_negatives(queries, corpus, positives, k=5,
                              margin=margin, fetch_factor=200)
    got = sorted((r["qid"], r["cid"], round(r["distance"], 6), r["rank"])
                 for r in out.collect())
    assert got == sorted(tuple(r) for r in _oracle(margin=margin, k=5))
    assert min(r[2] for r in got) >= margin - 1e-9   # rule enforced
    assert d_plain < margin                          # and it filtered


def test_positives_always_excluded_even_at_rank_one(spark, sf_dir):
    queries, corpus, positives = _frames(spark, sf_dir)
    out = mine_hard_negatives(queries, corpus, positives, k=3,
                              fetch_factor=3)
    for r in out.collect():
        assert r["cid"] != r["qid"]               # self = the positive


def test_positive_distances_anchor(spark, sf_dir):
    queries, corpus, positives = _frames(spark, sf_dir)
    anchors = {r["qid"]: r["__pos_dist"] for r in positive_distances(
        positives, queries, corpus).collect()}
    # self-positive: cosine distance 0 for every query
    assert len(anchors) == 30
    for v in anchors.values():
        assert v == pytest.approx(0.0, abs=1e-9)


def test_fetch_factor_validation(spark, sf_dir):
    queries, corpus, positives = _frames(spark, sf_dir)
    with pytest.raises(ValueError):
        mine_hard_negatives(queries, corpus, positives, fetch_factor=0)
