"""Sentence segmentation: independent scalar state-machine reference
(string ops, no lookbehind regex), pinned cases, lossless word
coverage, map-only plan."""
from __future__ import annotations

import re
import string

import pytest

from pyspark.sql import functions as F

from tests.conftest import load
from valkey_search_spark.operators.textops import (
    DEFAULT_ABBREVIATIONS, sentences_col, split_sentences,
)

_CLOSERS = "\"'”’)]"
_OPENERS = "\"'“‘(["


def _scalar_sentences(text: str,
                      abbrevs=DEFAULT_ABBREVIATIONS) -> list[str]:
    """Independent reference: explicit checks at each whitespace run,
    mirroring the documented heuristics (NOT the module's regex)."""
    breaks = []
    for m in re.finditer(r"\s+", text):
        pre, post = text[:m.start()], text[m.end():]
        if pre.endswith("..."):
            continue
        if re.search(r"\b(?:" + "|".join(abbrevs) + r")\.$", pre):
            continue
        if re.search(r"\b[A-Z]\.$", pre):
            continue
        j, c = len(pre), 0
        while j > 0 and c < 2 and pre[j - 1] in _CLOSERS:
            j -= 1
            c += 1
        if j == 0 or pre[j - 1] not in ".!?":
            continue
        k, o = 0, 0
        while k < len(post) and o < 2 and post[k] in _OPENERS:
            k += 1
            o += 1
        if k >= len(post) or post[k] not in (string.ascii_uppercase
                                             + string.digits):
            continue
        breaks.append((m.start(), m.end()))
    out, prev = [], 0
    for s, e in breaks:
        out.append(text[prev:s])
        prev = e
    out.append(text[prev:])
    return [t.strip() for t in out if t.strip()]


def _messy(i: int) -> str:
    bits = [
        "Hello world.", "Dr. Smith arrived!", "Is it 3.14?",
        "He said “No.”", "See Fig. 2 for details.", "J. Doe wrote it.",
        "Really...", "(Yes.)", "End", "Visit www.example.com today.",
        "IT WAS 1999.", "Whoa!!",
    ]
    n = 2 + i % 5
    return " ".join(bits[(i * 7 + j * 3) % len(bits)] for j in range(n))


def test_matches_independent_scalar_reference(spark):
    rows = [(i, _messy(i)) for i in range(300)]
    df = spark.createDataFrame(rows, "k long, text string")
    got = {r.k: r.s for r in
           df.select("k", sentences_col(F.col("text")).alias("s"))
             .collect()}
    for k, raw in rows:
        assert got[k] == _scalar_sentences(raw), (k, raw)


@pytest.mark.parametrize("raw,want", [
    ("Hello world. This is fine! Is it? Yes.",
     ["Hello world.", "This is fine!", "Is it?", "Yes."]),
    ("Dr. Smith met Mr. Jones. They left.",
     ["Dr. Smith met Mr. Jones.", "They left."]),
    ("Pi is 3.14 and e is 2.72. Next sentence.",
     ["Pi is 3.14 and e is 2.72.", "Next sentence."]),
    ("J. Smith wrote Vol. 3. It sold well.",
     ["J. Smith wrote Vol. 3.", "It sold well."]),
    ("He said “Stop.” Then ran... Or did he? No.",
     ["He said “Stop.”", "Then ran... Or did he?", "No."]),
    ("no terminator here", ["no terminator here"]),
    ("", []),
    ("lower case. continues here. Capital next.",
     ["lower case. continues here.", "Capital next."]),
])
def test_pinned_cases(spark, raw, want):
    df = spark.createDataFrame([(raw,)], "text string")
    assert df.select(sentences_col(F.col("text")).alias("s")) \
             .first().s == want


def test_explode_and_word_coverage(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").limit(100)
    out = split_sentences(docs).collect()
    assert all(r.sentence.strip() == r.sentence for r in out)
    # lossless on words: rejoining a doc's sentences preserves tokens
    texts = {r.doc_id: r.text for r in docs.collect()}
    by_doc: dict = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.sent_idx, r.sentence))
    for d, pairs in by_doc.items():
        joined = " ".join(s for _, s in sorted(pairs))
        assert joined.split() == texts[d].split()


def test_plan_map_only_python_free(spark):
    df = spark.createDataFrame([(1, "A. B.")], "doc_id long, text string")
    plan = split_sentences(df) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "EvalPython" not in plan
    # Generate must explode the STAGED column reference, not re-run
    # the split chain per output row
    assert re.search(r"Generate posexplode\(__sents#\d+\)", plan)


def test_unicode_whitespace_and_trim(spark):
    # NBSP-separated boundaries split; tabs/newlines trim off (Java \s
    # is ASCII-only and F.trim strips only spaces — both were review
    # findings); parity with the Python-\s scalar reference holds
    cases = ["First. Second one.", "\tHello world. Next.\n",
             "\n", "Done. Next part."]
    df = spark.createDataFrame([(c,) for c in cases], "text string")
    got = [r.s for r in
           df.select(sentences_col(F.col("text")).alias("s")).collect()]
    assert got[0] == ["First.", "Second one."]
    assert got[1] == ["Hello world.", "Next."]
    assert got[2] == []
    assert got[3] == ["Done.", "Next part."]   # em-space boundary
    for c, g in zip(cases, got):
        assert g == _scalar_sentences(c), c


def test_custom_abbreviations_are_escaped(spark):
    # an abbreviation containing '.' must be literal, not a wildcard
    # (unescaped, "e.g" would suppress breaks after any "<x>g.")
    abbr = DEFAULT_ABBREVIATIONS + ("e.g",)
    df = spark.createDataFrame(
        [("See e.g. The example. A keg. Next one.",)], "text string")
    got = df.select(sentences_col(F.col("text"), abbr).alias("s")) \
            .first().s
    assert got == ["See e.g. The example.", "A keg.", "Next one."]


def test_sentence_level_bitext_composition(spark):
    # the operator's real downstream: segment two "documents" (one a
    # shuffled paraphrase corpus of the other), embed each sentence,
    # and mine_bitext must recover the true sentence alignment
    from valkey_search_spark.operators.bitext import mine_bitext
    from valkey_search_spark.operators.textops import hashed_embeddings

    base = ["The cat sat on the mat today.",
            "Spark engines shuffle data between stages.",
            "Bitext mining aligns translated sentences.",
            "Quality gates drop boilerplate pages.",
            "Tokenizers compress bytes into pieces."]
    src_doc = " ".join(base)
    tgt_doc = " ".join(base[::-1])           # same sentences, reordered
    src = split_sentences(spark.createDataFrame(
        [(1, src_doc)], "doc_id long, text string"))
    tgt = split_sentences(spark.createDataFrame(
        [(2, tgt_doc)], "doc_id long, text string"))
    s = hashed_embeddings(
        src.select(F.col("sent_idx").alias("src_id"),
                   F.col("sentence").alias("text")))
    t = hashed_embeddings(
        tgt.select(F.col("sent_idx").alias("tgt_id"),
                   F.col("sentence").alias("text")))
    pairs = mine_bitext(s, t, k=2, min_margin=1.0).collect()
    got = {(p.src_id, p.tgt_id) for p in pairs}
    want = {(i, len(base) - 1 - i) for i in range(len(base))}
    assert got == want                       # exact alignment recovered
