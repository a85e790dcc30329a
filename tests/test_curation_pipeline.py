"""Composed curation pipeline: funnel monotonicity, gate correctness,
dedup guarantees on planted duplicates."""

import pytest
from pyspark.sql import Row, functions as F

from valkey_search_spark.operators.pipeline import (
    CurationConfig, curate_documents,
)
from valkey_search_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_funnel_on_testdata(spark):
    docs = load_table(spark, SF, "documents")
    clean, funnel = curate_documents(
        docs, config=CurationConfig(min_quality=0.4, min_tokens=5,
                                    near_dup_threshold=0.8))
    assert funnel["input"] == docs.count()
    assert (funnel["input"] >= funnel["quality_gate"]
            >= funnel["exact_dedup"] >= funnel["near_dedup"])
    assert clean.count() == funnel["near_dedup"] > 0
    # no surviving exact duplicates
    assert clean.groupBy("fingerprint").count().where("count > 1").count() == 0


def test_planted_duplicates_removed(spark):
    base = ("the quick brown fox jumps over a lazy dog and then runs far "
            "away into the deep green forest tonight")
    near = base.replace("tonight", "today")          # near-dup of base
    rows = [
        Row(doc_id=1, text=base),
        Row(doc_id=2, text=base),                    # exact dup
        Row(doc_id=3, text=near),                    # near dup
        Row(doc_id=4, text="completely different words about spark "
                           "engines and the analytics of distributed "
                           "columnar query processing systems today"),
        Row(doc_id=5, text="too short"),             # fails min_tokens
    ]
    docs = spark.createDataFrame(rows)
    clean, funnel = curate_documents(
        docs, config=CurationConfig(min_quality=0.0, min_tokens=5,
                                    near_dup_threshold=0.6))
    ids = sorted(r["doc_id"] for r in clean.select("doc_id").collect())
    assert ids == [1, 4]
    assert funnel == {"input": 5, "quality_gate": 4,
                      "exact_dedup": 3, "near_dedup": 2}


def test_language_gate(spark):
    docs = load_table(spark, SF, "documents")
    clean, _ = curate_documents(
        docs, config=CurationConfig(min_quality=0.0, min_tokens=1,
                                    languages=("en",),
                                    near_dup_threshold=None))
    langs = {r["lang_id"] for r in clean.select("lang_id").distinct().collect()}
    assert langs == {"en"}


def test_repetition_gate(spark):
    """max_rep2_frac drops exactly the docs whose max-coverage 2-gram
    fraction exceeds the bound (signal verified against the standalone
    repetition_stats operator)."""
    from valkey_search_spark.operators.contamination import repetition_stats

    docs = load_table(spark, SF, "documents")
    cfg = CurationConfig(min_quality=0.0, min_tokens=1,
                         near_dup_threshold=None, max_rep2_frac=0.05)
    clean, funnel = curate_documents(docs, config=cfg)
    stats = repetition_stats(docs)
    want = stats.where(F.col("top_2gram_char_frac") <= 0.05).count()
    assert funnel["quality_gate"] == want
    assert 0 < funnel["quality_gate"] < funnel["input"]
    # the signal column rides along on the clean frame
    assert "top_2gram_char_frac" in clean.columns


def test_pipeline_is_lazy_without_funnel(spark):
    """with_funnel=False must trigger ZERO Spark jobs — the composed
    pipeline is one plan, and the caller's consumption is the only
    action."""
    docs = load_table(spark, SF, "documents")
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup() or [])
    clean, funnel = curate_documents(
        docs, config=CurationConfig(min_quality=0.4, min_tokens=5,
                                    near_dup_threshold=0.8),
        with_funnel=False)
    after = len(tracker.getJobIdsForGroup() or [])
    assert funnel is None and after == before    # plan only, no jobs
    assert clean.count() > 0


def test_funnel_is_single_aggregation(spark):
    """The funnel comes from ONE aggregation over the flag columns (plus
    whatever AQE sub-jobs that query needs), never a count per stage."""
    docs = load_table(spark, SF, "documents")
    clean, funnel = curate_documents(
        docs, config=CurationConfig(min_quality=0.4, min_tokens=5,
                                    near_dup_threshold=0.8))
    assert (funnel["input"] >= funnel["quality_gate"]
            >= funnel["exact_dedup"] >= funnel["near_dedup"])
    assert clean.count() == funnel["near_dedup"]


def test_ngram_stop_gram_cutoff_candidates_verified_exact(spark):
    """With a stop-gram cutoff the reported pairs still carry EXACT
    Jaccard, and on this corpus (planted near-dups share rare grams) the
    pair set matches the exact inverted join."""
    from valkey_search_spark.operators import dedup as dd

    docs = load_table(spark, SF, "documents")
    exact = {(r["a"], r["b"], r["jaccard"]) for r in
             dd.ngram_jaccard_pairs(docs, "doc_id", threshold=0.3).collect()}
    capped_df = dd.ngram_jaccard_pairs(docs, "doc_id", threshold=0.3,
                                       stop_gram_df=50)
    capped = {(r["a"], r["b"], r["jaccard"]) for r in capped_df.collect()}
    assert capped <= exact                 # verify step: no false pairs
    assert len(capped) / max(len(exact), 1) >= 0.9
    dd.release(capped_df, blocking=True)


def test_ngram_jaccard_branches_agree_on_subshingle_docs(spark):
    """Documents shorter than shingle_n are out of scope for BOTH the
    default inverted-join branch and the stop-gram candidate branch —
    identical 2-token docs at shingle_n=3 must not be reported by
    either (no truncated-window gram on either path)."""
    from pyspark.sql import Row
    from valkey_search_spark.operators import dedup as dd

    df = spark.createDataFrame([Row(doc_id=1, text="alpha beta"),
                                Row(doc_id=2, text="alpha beta"),
                                Row(doc_id=3, text="gamma delta epsilon "
                                                   "gamma delta epsilon")])
    default = dd.ngram_jaccard_pairs(df, "doc_id", shingle_n=3,
                                     threshold=0.5).collect()
    stop = dd.ngram_jaccard_pairs(df, "doc_id", shingle_n=3, threshold=0.5,
                                  stop_gram_df=10).collect()
    assert sorted(map(tuple, default)) == sorted(map(tuple, stop)) == []


def test_curation_gopher_gate(spark):
    """gopher_rules=True adds the published rule conjunction to the
    quality gate; a doc failing only a Gopher rule (word count) is
    dropped while a passing doc survives."""
    from pyspark.sql import Row
    from valkey_search_spark.operators.pipeline import (
        CurationConfig, curate_documents,
    )

    passing = ("the quick brown fox jumps over the lazy dog and then "
               "runs away to be with all of that other text " * 3)
    df = spark.createDataFrame([
        Row(doc_id=1, text=passing),
        Row(doc_id=2, text="too short but high quality of the and that"),
    ])
    cfg = CurationConfig(min_quality=0.0, min_tokens=1,
                         near_dup_threshold=None, gopher_rules=True,
                         gopher_min_words=50)
    clean, funnel = curate_documents(df, config=cfg)
    ids = {r["doc_id"] for r in clean.select("doc_id").collect()}
    assert ids == {1}
    assert funnel["quality_gate"] == 1
    # without the gopher gate both survive
    cfg2 = CurationConfig(min_quality=0.0, min_tokens=1,
                          near_dup_threshold=None)
    clean2, _ = curate_documents(df, config=cfg2)
    assert {r["doc_id"] for r in clean2.select("doc_id").collect()} == {1, 2}
