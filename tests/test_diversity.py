"""diversity_metrics (operators/textops.py) vs a DuckDB n-gram replay
on real documents, plus the mode-collapse signature on planted
duplicates and the one-shuffle plan shape."""

from __future__ import annotations

import math

import duckdb
import pytest

from pyspark.sql import functions as F

from valkey_search_spark.operators.textops import diversity_metrics

from .conftest import SF_DIR, load

DOCS = f"{SF_DIR}/documents.parquet"


def test_matches_duckdb_on_real_documents(spark, sf_dir):
    out = {r["n"]: r for r in
           diversity_metrics(load(spark, sf_dir, "documents"))
           .collect()}
    for n in (1, 2, 3):
        row = duckdb.sql(f"""
            WITH toks AS (SELECT doc_id,
                     list_filter(string_split(regexp_replace(
                         lower(text), '[^a-z0-9]+', ' ', 'g'), ' '),
                         x -> x <> '') AS t
                   FROM '{DOCS}'),
             grams AS (SELECT doc_id,
                 unnest(list_transform(range(1, len(t) - {n} + 2),
                        i -> array_to_string(list_slice(t, i, i + {n} - 1),
                                             ' '))) AS g
               FROM toks WHERE len(t) >= {n}),
             per AS (SELECT g, count(*) AS occ,
                            count(DISTINCT doc_id) AS docs
                     FROM grams GROUP BY g)
            SELECT sum(occ) AS total, count(*) AS dist,
                   sum(CASE WHEN docs > 1 THEN 1 ELSE 0 END) AS cross_g,
                   log2(sum(occ))
                     - sum(occ * log2(occ)) / sum(occ) AS ent
            FROM per""").fetchone()
        total, dist, cross_g, ent = row
        got = out[n]
        assert got["total_ngrams"] == total
        assert got["distinct_ngrams"] == dist
        assert got["distinct_ratio"] == pytest.approx(dist / total,
                                                      rel=1e-12)
        assert got["cross_doc_fraction"] == pytest.approx(cross_g / dist,
                                                          rel=1e-12)
        assert got["entropy_bits"] == pytest.approx(ent, rel=1e-9)


def test_mode_collapse_signature(spark):
    # 40 copies of one document vs 40 distinct documents: the collapsed
    # corpus shows near-total cross-doc overlap and a low distinct
    # ratio; the diverse corpus the opposite
    base = "the quick brown fox jumps over the lazy dog again and again"
    collapsed = spark.createDataFrame(
        [(i, base) for i in range(40)], "doc_id long, text string")
    diverse = spark.createDataFrame(
        [(i, " ".join(f"w{i}x{j}" for j in range(12)))
         for i in range(40)], "doc_id long, text string")
    c = {r["n"]: r for r in diversity_metrics(collapsed).collect()}
    d = {r["n"]: r for r in diversity_metrics(diverse).collect()}
    for n in (1, 2, 3):
        assert c[n]["cross_doc_fraction"] == pytest.approx(1.0)
        assert d[n]["cross_doc_fraction"] == 0.0
        assert c[n]["distinct_ratio"] < 0.05 < d[n]["distinct_ratio"]
        # uniform distinct grams -> entropy == log2(distinct)
        assert d[n]["entropy_bits"] == pytest.approx(
            math.log2(d[n]["distinct_ngrams"]), rel=1e-9)


def test_one_data_shuffle_plan(spark, sf_dir):
    df = diversity_metrics(load(spark, sf_dir, "documents"), ns=(1, 2))
    plan = df._jdf.queryExecution().executedPlan().toString()
    # exactly ONE gram-keyed data shuffle: cross_doc uses
    # min(doc) != max(doc) instead of count_distinct(doc), so the
    # expand rewrite's extra (n, gram, doc)-clustered exchange is gone
    # and everything aggregates on the single (n, gram) exchange; the
    # rest are input repartitions and the n-row final/sort
    import re
    hashes = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    gram_shuffles = [h for h in hashes if "__gram" in h]
    assert len(gram_shuffles) == 1, gram_shuffles
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_gram_multiset_identical_to_per_n_gram_set(spark, sf_dir):
    """The fused single-explode gram front end must emit EXACTLY the
    multiset of the per-n gram_set union it replaced."""
    from collections import Counter

    from valkey_search_spark.operators.contamination import gram_set
    from valkey_search_spark.operators.dedup import _staged_tokens

    docs = load(spark, sf_dir, "documents").limit(150)
    want: Counter = Counter()
    for n in (1, 2, 3):
        for r in gram_set(docs, "doc_id", "text", n, "__dk").collect():
            want[(n, r["__gram"], r["__dk"])] += 1
    staged = _staged_tokens(docs, "doc_id", "text", barrier=False)
    toks = F.col("__toks")
    gram_structs = F.array_compact(F.array(*[
        F.when(F.col("__i") <= F.size(toks) - n,
               F.struct(F.lit(n).alias("n"),
                        F.xxhash64(F.slice(toks, F.col("__i") + 1, n))
                        .alias("__gram")))
        for n in (1, 2, 3)]))
    got: Counter = Counter()
    for r in (staged
              .select("k", "__toks",
                      F.posexplode("__toks").alias("__i", "__t"))
              .select(F.col("k").alias("__dk"),
                      F.explode(gram_structs).alias("__g"))
              .select("__g.n", "__g.__gram", "__dk")).collect():
        got[(r["n"], r["__gram"], r["__dk"])] += 1
    assert got == want
