"""KMV sketches: exact-regime DuckDB oracle, filtered-regime invariant,
estimator error bounds, corpus overlap composition."""
from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from tests.conftest import SF_DIR, load
from valkey_search_spark.operators.sketches import (
    corpus_gram_overlap, kmv_distinct, kmv_jaccard, kmv_merge,
    kmv_overlap, kmv_sketch, kmv_stderr,
)


def _oracle(sql):
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/documents.parquet')")
    return con.sql(sql).fetchall()


def _words(spark, sf_dir):
    return (load(spark, sf_dir, "documents")
            .select("source", F.explode(
                F.split(F.regexp_replace("text", r"^\s+|\s+$", ""),
                        r"\s+")).alias("w")))


def test_exact_regime_distinct_matches_oracle(spark, sf_dir):
    # k far above the corpus' distinct word count -> exact sketches
    rows = kmv_sketch(_words(spark, sf_dir), "w", "source",
                      k=100_000).collect()
    want = dict(_oracle(
        "SELECT source, count(DISTINCT w) FROM (SELECT source,"
        " unnest(regexp_split_to_array(trim(text), '\\s+')) AS w"
        " FROM documents) GROUP BY source"))
    assert want and len(rows) == len(want)
    for r in rows:
        assert not r["filtered"] and not r["underfull"]
        assert kmv_distinct(list(r["kmv"]), 100_000) == want[r["source"]]


def test_exact_regime_jaccard_matches_oracle(spark, sf_dir):
    # word-set Jaccard between even/odd doc halves, k >= union size
    docs = load(spark, sf_dir, "documents")
    halves = []
    for p in (0, 1):
        w = (docs.where(F.col("doc_id") % 2 == p)
             .select(F.explode(F.split(F.trim("text"), r"\s+")).alias("w")))
        row = kmv_sketch(w, "w", None, k=100_000).collect()[0]
        assert not row["filtered"]
        halves.append(list(row["kmv"]))
    (j_exact,), = _oracle("""
        WITH w AS (SELECT doc_id % 2 AS p,
                          unnest(regexp_split_to_array(trim(text), '\\s+'))
                          AS w FROM documents),
        a AS (SELECT DISTINCT w FROM w WHERE p = 0),
        b AS (SELECT DISTINCT w FROM w WHERE p = 1)
        SELECT (SELECT count(*) FROM a JOIN b USING (w))
               / (SELECT count(*) FROM (SELECT w FROM a UNION
                                        SELECT w FROM b))""")
    got = kmv_jaccard(halves[0], halves[1], 100_000)
    assert got == pytest.approx(float(j_exact), abs=1e-12)


def test_filtered_sketch_equals_true_bottom_k(spark):
    # 50k distinct ints, k=64, margin=2 -> the filter MUST engage, and
    # the surviving bottom-k must equal the true global bottom-k
    df = spark.range(50_000).select(F.col("id").alias("v"))
    row = kmv_sketch(df, "v", None, k=64, margin=2).collect()[0]
    assert row["filtered"] and not row["underfull"]
    true_k = sorted(
        r["h"] for r in df.select(F.xxhash64("v").alias("h")).collect())
    assert list(row["kmv"]) == true_k[:64]


def test_estimator_error_within_bounds(spark):
    # known cardinalities: |A|=30k, |B|=20k, |A ∩ B|=10k
    a = spark.range(0, 30_000).select(F.col("id").cast("string").alias("v"))
    b = spark.range(20_000, 40_000) \
        .select(F.col("id").cast("string").alias("v"))
    k = 512
    ska = list(kmv_sketch(a, "v", k=k).collect()[0]["kmv"])
    skb = list(kmv_sketch(b, "v", k=k).collect()[0]["kmv"])
    rep = kmv_overlap(ska, skb, k)
    tol = 6 * kmv_stderr(k)  # ~27% at k=512; generous, deterministic seed
    assert rep["distinct_a"] == pytest.approx(30_000, rel=tol)
    assert rep["distinct_b"] == pytest.approx(20_000, rel=tol)
    assert rep["union"] == pytest.approx(40_000, rel=tol)
    assert rep["jaccard"] == pytest.approx(0.25, abs=0.05)
    assert rep["intersection"] == pytest.approx(10_000, rel=2 * tol)


def test_merge_of_exact_sketches_is_union_bottom_k(spark):
    a = [1, 5, 9]
    b = [2, 5, 11]
    assert kmv_merge(a, b, 4) == [1, 2, 5, 9]
    assert kmv_distinct(kmv_merge(a, b, 100), 100) == 5.0


def test_corpus_gram_overlap_self_and_disjoint(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").where("n_chars > 200") \
        .limit(60).cache()
    self_rep = corpus_gram_overlap(docs, docs, n=5, k=8192)
    assert self_rep["jaccard"] == 1.0
    assert self_rep["containment_a_in_b"] == 1.0
    assert not self_rep["underfull"]
    # disjoint halves of a shuffled id space share almost no 5-grams
    a = docs.where(F.col("doc_id") % 2 == 0)
    b = docs.where(F.col("doc_id") % 2 == 1)
    dis = corpus_gram_overlap(a, b, n=5, k=8192)
    assert dis["jaccard"] < 0.05
    docs.unpersist()


def test_plan_broadcasts_bounds_no_sort_merge(spark, sf_dir):
    out = kmv_sketch(_words(spark, sf_dir), "w", "source", k=64)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "Broadcast" in plan  # pass-1 bounds broadcast to the scan


def test_validation(spark):
    df = spark.range(3).select(F.col("id").alias("v"))
    with pytest.raises(ValueError):
        kmv_sketch(df, "v", k=2)
