"""weighted_sample (Efraimidis-Spirakis A-Res): exact-N contract,
Spark-key scalar replay, weight-proportional inclusion, determinism,
and the null/non-positive-weight exclusion convention."""
from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from tests.conftest import load
from valkey_search_spark.operators.sampling import weighted_sample


@pytest.fixture()
def weighted_docs(spark, sf_dir):
    # deterministic per-doc weight: heavy tail on a handful of docs
    return (load(spark, sf_dir, "documents")
            .withColumn("w", F.when(F.col("doc_id") % 50 == 0, 1000.0)
                              .otherwise(0.1)))


def test_exact_n_per_group_and_global(weighted_docs):
    per = weighted_sample(weighted_docs, "w", 7, by="lang").collect()
    counts: dict = {}
    for r in per:
        counts[r["lang"]] = counts.get(r["lang"], 0) + 1
    assert set(counts.values()) == {7}
    assert weighted_sample(weighted_docs, "w", 13).count() == 13


def test_small_group_taken_whole(spark):
    df = spark.createDataFrame(
        [("a", i, 1.0) for i in range(3)] +
        [("b", i, 1.0) for i in range(20)], ["g", "i", "w"])
    rows = weighted_sample(df, "w", 10, by="g").collect()
    got = {}
    for r in rows:
        got[r["g"]] = got.get(r["g"], 0) + 1
    assert got == {"a": 3, "b": 10}


def test_matches_spark_key_replay(weighted_docs):
    # recompute the A-Res key with the SAME expressions the operator
    # uses and check the sample is exactly the n smallest keys per group
    df = weighted_docs
    cells = 1 << 30
    u = (F.pmod(F.xxhash64(*[F.col(c) for c in df.columns],
                           F.lit("weighted")), F.lit(cells))
         .cast("double") + 1.0) / float(cells)
    key = -F.log(u) / F.col("w").cast("double")
    scored = df.select("doc_id", "lang", key.alias("k")).collect()
    by_lang: dict = {}
    for r in scored:
        by_lang.setdefault(r["lang"], []).append((r["k"], r["doc_id"]))
    want = {lang: {d for _, d in sorted(v)[:5]}
            for lang, v in by_lang.items()}
    got: dict = {}
    for r in weighted_sample(df, "w", 5, by="lang").collect():
        got.setdefault(r["lang"], set()).add(r["doc_id"])
    assert got == want


def test_heavy_weights_dominate(weighted_docs):
    n_heavy = weighted_docs.where("w > 1").count()
    assert n_heavy >= 8
    got = weighted_sample(weighted_docs, "w", n_heavy).collect()
    frac_heavy = sum(1 for r in got if r["w"] > 1) / n_heavy
    # weight ratio 10^4: a light row outranking a heavy one is ~1e-4
    assert frac_heavy >= 0.9


def test_inclusion_frequency_tracks_weight(spark):
    # n=1 from {w=3, 1, 1, 1}: P(heavy) = 1/2; replay across 200 salts
    df = spark.createDataFrame(
        [(0, 3.0), (1, 1.0), (2, 1.0), (3, 1.0)], ["i", "w"])
    wins = 0
    draws = 200
    for s in range(draws):
        r = weighted_sample(df, "w", 1, salt=f"s{s}").collect()[0]
        wins += int(r["i"] == 0)
    p = wins / draws
    # exact binomial(200, 0.5): +-4 sigma ~ +-0.14
    assert 0.36 <= p <= 0.64, p


def test_deterministic_across_reruns(weighted_docs):
    a = {r["doc_id"] for r in
         weighted_sample(weighted_docs, "w", 11).collect()}
    b = {r["doc_id"] for r in
         weighted_sample(weighted_docs, "w", 11).collect()}
    assert a == b
    c = {r["doc_id"] for r in
         weighted_sample(weighted_docs, "w", 11, salt="other").collect()}
    assert a != c  # an independent redraw


def test_bad_weights_excluded(spark):
    df = spark.createDataFrame(
        [(0, 1.0), (1, None), (2, 0.0), (3, -2.0), (4, math.nan),
         (5, 5.0)], "i int, w double")
    got = {r["i"] for r in weighted_sample(df, "w", 10).collect()}
    assert got == {0, 5}


def test_n_must_be_positive(spark):
    df = spark.createDataFrame([(1, 1.0)], ["i", "w"])
    with pytest.raises(ValueError, match="positive"):
        weighted_sample(df, "w", 0)


def test_global_mode_plans_per_partition_heaps(weighted_docs):
    df = weighted_sample(weighted_docs, "w", 11)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan  # no single-task global sort


def test_membership_invariant_to_partitioning(weighted_docs):
    """The module's core promise: membership is a pure function of
    (row contents, salt) — any physical layout yields the same draw."""
    base = {r["doc_id"] for r in
            weighted_sample(weighted_docs, "w", 9, by="lang").collect()}
    for parts in (1, 13):
        got = {r["doc_id"] for r in
               weighted_sample(weighted_docs.repartition(parts),
                               "w", 9, by="lang").collect()}
        assert got == base
    glob = {r["doc_id"] for r in
            weighted_sample(weighted_docs, "w", 17).collect()}
    got = {r["doc_id"] for r in
           weighted_sample(weighted_docs.repartition(13), "w",
                           17).collect()}
    assert got == glob


def test_key_param_stable_under_schema_change(weighted_docs):
    # hashing (key, salt) instead of all columns: adding an unrelated
    # upstream column must NOT redraw the sample (the all-columns
    # fallback redraws — the round-8 ADVICE finding)
    base = weighted_sample(weighted_docs, "w", 25, key="doc_id")
    ids = {r["doc_id"] for r in base.collect()}
    widened = weighted_docs.withColumn("extra", F.length("text"))
    ids2 = {r["doc_id"]
            for r in weighted_sample(widened, "w", 25,
                                     key="doc_id").collect()}
    assert ids == ids2
    # grouped mode too
    g1 = {(r["lang"], r["doc_id"]) for r in weighted_sample(
        weighted_docs, "w", 5, by="lang", key="doc_id").collect()}
    g2 = {(r["lang"], r["doc_id"]) for r in weighted_sample(
        widened, "w", 5, by="lang", key="doc_id").collect()}
    assert g1 == g2


def test_key_param_allows_unhashable_columns(spark):
    # a MapType column breaks xxhash64-over-all-columns; with key= the
    # draw never touches it
    df = spark.createDataFrame(
        [(i, 1.0, {"k": str(i)}) for i in range(40)],
        "id long, w double, meta map<string,string>")
    got = weighted_sample(df, "w", 10, key="id")
    assert got.count() == 10
    from pyspark.errors import AnalysisException
    with pytest.raises(AnalysisException):
        weighted_sample(df, "w", 10).count()  # documented fallback limit
