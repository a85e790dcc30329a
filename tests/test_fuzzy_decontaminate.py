"""fuzzy_decontaminate (operators/contamination.py): whole-document
near-duplicate contamination vs a scalar exact-Jaccard replay on real
documents, planted paraphrase catches, and the no-train-self-join
plan/semantics contract."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from valkey_search_spark.operators.contamination import fuzzy_decontaminate

from .conftest import load


def _scalar_jaccard(a: str, b: str, n=3) -> float:
    def sh(t):
        w = t.split()
        return {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)}
    sa, sb = sh(a), sh(b)
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def test_exact_benchmark_copies_always_flagged(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    bench = (docs.where("doc_id % 7 = 0")
             .select(F.col("doc_id").alias("bid"),
                     F.col("text").alias("btext")))
    out = fuzzy_decontaminate(docs, bench, benchmark_key="bid",
                              benchmark_text_col="btext", threshold=0.9)
    got = {r["doc_id"]: (r["contaminated"], r["max_benchmark_jaccard"])
           for r in out.collect()}
    assert len(got) == docs.count()              # one verdict per doc
    rows = docs.collect()
    texts = {r["doc_id"]: r["text"] for r in rows}
    for did, txt in texts.items():
        if did % 7 == 0 and len(txt.split()) >= 3:
            # identical text -> signatures collide in every band
            assert got[did][0], did
            assert got[did][1] == pytest.approx(1.0)
    # no false positives: every flagged doc really clears the threshold
    bench_texts = [t for d, t in texts.items() if d % 7 == 0]
    for did, (flag, j) in got.items():
        if flag and did % 7 != 0:
            best = max(_scalar_jaccard(texts[did], bt)
                       for bt in bench_texts)
            assert best >= 0.9 - 1e-9 and j == pytest.approx(best, abs=1e-6)
        if not flag:
            assert j == 0.0


def test_paraphrase_caught_exact_ngram_would_miss(spark):
    # a benchmark doc reformatted with one word changed mid-document:
    # long shared shingle mass -> high Jaccard -> fuzzy flag, while the
    # changed word breaks every 13-gram through that position
    base = ("alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliet kilo lima mike november oscar papa quebec romeo "
            "sierra tango uniform victor whiskey xray yankee zulu") * 2
    words = base.split()
    words[20] = "CHANGED"
    train = spark.createDataFrame(
        [(1, " ".join(words)), (2, "completely different text here "
                                   "about nothing in particular at all")],
        "doc_id int, text string")
    bench = spark.createDataFrame([(10, base)], "bid int, btext string")
    out = fuzzy_decontaminate(train, bench, benchmark_key="bid",
                              benchmark_text_col="btext", threshold=0.5)
    got = {r["doc_id"]: r for r in out.collect()}
    assert got[1]["contaminated"]
    assert got[1]["max_benchmark_jaccard"] == pytest.approx(
        _scalar_jaccard(" ".join(words), base), abs=1e-6)
    assert not got[2]["contaminated"]
    # and the exact 13-gram check also flags doc 1 (it shares plenty of
    # 13-grams outside the changed window) — the fuzzy check's unique
    # value is the JACCARD score + threshold semantics
    from valkey_search_spark.operators.contamination import (
        ngram_decontaminate,
    )
    ex = {r["doc_id"]: r["contaminated"]
          for r in ngram_decontaminate(
              train, bench, benchmark_key="bid",
              benchmark_text_col="btext", n=13).collect()}
    assert ex[1] and not ex[2]


def test_key_collisions_between_corpora_are_safe(spark):
    # train doc_id 5 and benchmark doc_id 5 are DIFFERENT documents;
    # the surrogate prefix must keep them apart
    train = spark.createDataFrame(
        [(5, "one two three four five six seven eight nine ten")],
        "doc_id int, text string")
    bench = spark.createDataFrame(
        [(5, "totally unrelated benchmark sentence with other words")],
        "doc_id int, text string")
    out = fuzzy_decontaminate(train, bench, threshold=0.5).collect()
    assert len(out) == 1 and not out[0]["contaminated"]


def test_no_train_self_pairs(spark):
    # two identical TRAIN docs and an unrelated benchmark: train-train
    # near-duplication must NOT flag anything (that's dedup's job)
    train = spark.createDataFrame(
        [(1, "red green blue cyan magenta yellow black white gray"),
         (2, "red green blue cyan magenta yellow black white gray")],
        "doc_id int, text string")
    bench = spark.createDataFrame(
        [(9, "benchmark words that match neither training document")],
        "bid int, btext string")
    out = fuzzy_decontaminate(train, bench, benchmark_key="bid",
                              benchmark_text_col="btext",
                              threshold=0.5).collect()
    assert all(not r["contaminated"] for r in out)


def test_empty_benchmark_flags_nothing(spark):
    train = spark.createDataFrame(
        [(1, "some training text with several words here")],
        "doc_id int, text string")
    bench = spark.createDataFrame([], "bid int, btext string")
    out = fuzzy_decontaminate(train, bench, benchmark_key="bid",
                              benchmark_text_col="btext",
                              threshold=0.5).collect()
    assert len(out) == 1 and not out[0]["contaminated"]
    assert out[0]["max_benchmark_jaccard"] == 0.0


def test_null_keys_raise_on_either_side(spark):
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    good = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id int, text string")
    nullkey = spark.createDataFrame(
        [(None, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id int, text string")
    with pytest.raises(Exception, match="null training key"):
        fuzzy_decontaminate(nullkey, good, threshold=0.5).collect()
    with pytest.raises(Exception, match="null benchmark key"):
        fuzzy_decontaminate(good, nullkey, threshold=0.5).collect()
