"""Tests for decontamination, PII redaction, and repetition stats.

Independence: expected values are computed by scalar Python re-implementations
in this file (regex via the stdlib ``re`` module, n-gram sets via plain
set algebra), not by the Spark expressions under test.
"""

import re

import pytest
from pyspark.sql import Row, functions as F

from valkey_search_spark.operators.contamination import (
    PII_PATTERNS, ngram_decontaminate, redact_pii, repetition_stats,
)

WORDS = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
         "lambda mu nu xi omicron pi rho sigma tau upsilon")


@pytest.fixture(scope="module")
def corpora(spark):
    # doc 1 contains benchmark text verbatim (13+ shared tokens);
    # doc 2 shares only a short window (< n); doc 3 is disjoint
    train = spark.createDataFrame([
        Row(doc_id=1, text="intro words " + WORDS + " trailing tail"),
        Row(doc_id=2, text="alpha beta gamma delta unrelated filler "
                           "one two three four five six seven eight"),
        Row(doc_id=3, text="completely different content with no overlap "
                           "whatsoever in any window of tokens at all"),
    ])
    bench = spark.createDataFrame([Row(doc_id=100, text=WORDS)])
    return train, bench


def test_ngram_decontaminate_flags_only_real_leaks(corpora):
    train, bench = corpora
    out = {r["doc_id"]: r for r in
           ngram_decontaminate(train, bench, n=13).collect()}
    assert out[1]["contaminated"] and out[1]["leaked_ngrams"] > 0
    assert not out[2]["contaminated"] and out[2]["leaked_ngrams"] == 0
    assert not out[3]["contaminated"]
    # independent count: sliding 13-gram set intersection on doc 1
    t1 = ("intro words " + WORDS + " trailing tail").split()
    b = WORDS.split()
    tg = {" ".join(t1[i:i + 13]) for i in range(len(t1) - 12)}
    bgr = {" ".join(b[i:i + 13]) for i in range(len(b) - 12)}
    assert out[1]["leaked_ngrams"] == len(tg & bgr)


def test_ngram_decontaminate_shuffle_fallback_matches(corpora):
    train, bench = corpora
    a = sorted(map(tuple, ngram_decontaminate(train, bench, n=13).collect()))
    via_shuffle = ngram_decontaminate(train, bench, n=13,
                                      broadcast_benchmark=False)
    assert sorted(map(tuple, via_shuffle.collect())) == a


def test_redact_pii_counts_and_scrubs(spark):
    text = ("contact john.doe+spam@example.co.uk or 555-123-4567; "
            "server at 10.0.0.1, ssn 123-45-6789, no pii here: foo@bar")
    df = spark.createDataFrame([Row(doc_id=1, text=text)])
    r = redact_pii(df).collect()[0]
    # independent counts via stdlib re on the same published patterns
    for kind, pat in PII_PATTERNS.items():
        assert r[f"pii_{kind}_count"] == len(re.findall(pat, text)), kind
    red = r["text_redacted"]
    assert "john.doe" not in red and "4567" not in red
    assert "10.0.0.1" not in red and "123-45-6789" not in red
    assert red.count("[REDACTED]") >= 4
    assert "foo@bar" in red          # not an email (no TLD) — untouched


def test_redact_pii_null_and_clean_rows(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="clean text only"),
                                Row(doc_id=2, text=None)])
    rows = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert rows[1]["pii_email_count"] == 0
    assert rows[1]["text_redacted"] == "clean text only"
    assert rows[2]["text_redacted"] is None
    assert rows[2]["pii_email_count"] == 0


def test_cross_doc_line_dedup(spark):
    from valkey_search_spark.operators.contamination import (
        cross_doc_line_dedup,
    )

    boiler = "subscribe to our newsletter"
    footer = "all rights reserved"
    texts = {
        1: f"{boiler}\nunique first content\n{footer}",
        2: f"{boiler}\nsecond doc body\nmore body\n{footer}",
        3: "standalone doc\nwith its own lines",
        4: None,
        5: f"only here once\n{boiler}",
    }
    df = spark.createDataFrame(
        [Row(doc_id=k, text=t) for k, t in texts.items()])
    out = {r["doc_id"]: r for r in cross_doc_line_dedup(df).collect()}

    # scalar reference: doc-frequency per non-blank line
    from collections import Counter
    freq = Counter()
    for t in texts.values():
        if t is not None:
            for ln in set(t.split("\n")):
                if ln.strip():
                    freq[ln] += 1
    for k, t in texts.items():
        if t is None:
            assert out[k]["text_deduped"] is None
            continue
        kept = [ln for ln in t.split("\n") if freq[ln] < 2]
        assert out[k]["text_deduped"] == "\n".join(kept), k
        assert out[k]["lines_kept"] == len(kept)
        assert out[k]["lines_dropped"] == len(t.split("\n")) - len(kept)
    # the boilerplate lines are gone everywhere, bodies survive in order
    assert boiler not in out[1]["text_deduped"]
    assert out[2]["text_deduped"] == "second doc body\nmore body"
    assert out[3]["text_deduped"] == texts[3]


def test_cross_doc_line_dedup_metachar_separator(spark):
    """Regex-metacharacter separators are treated literally on both the
    split and the rejoin side."""
    from valkey_search_spark.operators.contamination import (
        cross_doc_line_dedup,
    )

    df = spark.createDataFrame([
        Row(doc_id=1, text="shared|unique one"),
        Row(doc_id=2, text="shared|unique two"),
    ])
    out = {r["doc_id"]: r for r in
           cross_doc_line_dedup(df, separator="|").collect()}
    assert out[1]["text_deduped"] == "unique one"
    assert out[2]["text_deduped"] == "unique two"
    assert out[1]["lines_dropped"] == 1


def _dup_frac(parts):
    parts = [p for p in parts if p.strip()]
    return 0.0 if not parts else (len(parts) - len(set(parts))) / len(parts)


def test_repetition_stats_match_scalar_reference(spark):
    texts = [
        "line a\nline b\nline a\nline c",                  # 1 dup of 4
        "para one\n\npara two\n\npara one",                # 1 dup of 3
        "spam spam spam spam spam ham",                    # heavy 2-gram
        "all tokens unique here now",
        "",
    ]
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)])
    rows = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    for i, t in enumerate(texts):
        assert rows[i]["dup_line_frac"] == pytest.approx(
            _dup_frac(t.split("\n"))), f"doc {i} lines"
        assert rows[i]["dup_para_frac"] == pytest.approx(
            _dup_frac(re.split(r"\n\s*\n", t))), f"doc {i} paras"
    # scalar max-coverage 2-gram: max over grams of count(g)*len(g)
    t = texts[2]
    toks = t.split()
    grams = [" ".join(toks[i:i + 2]) for i in range(len(toks) - 1)]
    expect = max(grams.count(g) * len(g) for g in set(grams)) / len(t)
    assert rows[2]["top_2gram_char_frac"] == pytest.approx(expect, abs=1e-6)
    assert rows[4]["top_2gram_char_frac"] == 0.0


def test_redact_pii_backreference_patterns_fall_back_to_chained(spark):
    """Custom patterns with backreferences (or $n replacements) must not
    be fused into one alternation — group renumbering would silently
    break them. The chained fallback keeps per-pattern semantics."""
    text = 'say "hello" and xx repeated aa'
    df = spark.createDataFrame([Row(doc_id=1, text=text)])
    pats = {"quoted": r'"([a-z]+)"', "doubled": r"\b([a-z])\1\b"}
    r = redact_pii(df, patterns=pats).collect()[0]
    expect = re.sub(pats["doubled"], "[REDACTED]",
                    re.sub(pats["quoted"], "[REDACTED]", text))
    assert r["text_redacted"] == expect
    assert '"hello"' not in r["text_redacted"]
    assert " xx " not in f' {r["text_redacted"]} '
    for kind, pat in pats.items():
        assert r[f"pii_{kind}_count"] == len(re.findall(pat, text)), kind


def test_redact_pii_named_groups_fall_back_to_chained(spark):
    """Duplicate NAMED groups across custom patterns would fail to
    compile when fused — the guard routes them to the chained path."""
    text = "ids: 123-id and id-456"
    df = spark.createDataFrame([Row(doc_id=1, text=text)])
    pats = {"a": r"(?<d>\d+)-id", "b": r"id-(?<d>\d+)"}
    r = redact_pii(df, patterns=pats).collect()[0]
    assert r["text_redacted"] == "ids: [REDACTED] and [REDACTED]"


# ---------------------------------------------------------------------------
# exact_substring_dedup: scalar reference + planted-span corpus

def _scalar_span_dedup(docs, n, min_doc_freq, keep_one):
    """Independent reference: dict-of-lists implementation of the same
    semantics (cross-doc n-gram doc frequency, leave-one at min key,
    merged-interval cut)."""
    toks = {k: t.split() for k, t in docs.items()}
    gram_docs = {}
    for k, ts in toks.items():
        for i in range(len(ts) - n + 1):
            gram_docs.setdefault(tuple(ts[i:i + n]), set()).add(k)
    out = {}
    for k, ts in toks.items():
        starts = []
        for i in range(len(ts) - n + 1):
            holders = gram_docs[tuple(ts[i:i + n])]
            if len(holders) >= min_doc_freq and (
                    not keep_one or k != min(holders)):
                starts.append(i)
        covered = set()
        spans = 0
        end = -1
        for s in starts:
            if s > end:
                spans += 1
                end = s + n
            else:
                end = max(end, s + n)
            covered.update(range(s, s + n))
        kept = [t for i, t in enumerate(ts) if i not in covered]
        out[k] = (" ".join(kept), len(kept), len(ts) - len(kept), spans)
    return out


@pytest.fixture(scope="module")
def span_docs():
    shared = "alpha beta gamma delta epsilon"
    return {
        1: "one two three " + shared + " four five",
        2: "six seven " + shared + " eight nine ten",
        # two overlapping duplicated windows -> one merged span
        3: "pre alpha beta gamma delta epsilon zeta post filler words",
        4: "also alpha beta gamma delta epsilon zeta more trailing",
        5: "totally unrelated content in this document here",
        6: "tiny doc",
    }


def test_exact_substring_dedup_matches_scalar_reference(spark, span_docs):
    from valkey_search_spark.operators.contamination import (
        exact_substring_dedup,
    )

    df = spark.createDataFrame(
        [Row(doc_id=k, text=t) for k, t in span_docs.items()])
    for keep_one in (True, False):
        want = _scalar_span_dedup(span_docs, 5, 2, keep_one)
        got = exact_substring_dedup(df, n=5, min_doc_freq=2,
                                    keep_one=keep_one).collect()
        assert len(got) == len(span_docs)
        for r in got:
            w = want[r["doc_id"]]
            assert (r["text_deduped"], r["tokens_kept"],
                    r["tokens_dropped"], r["spans_dropped"]) == w, \
                (keep_one, r["doc_id"])


def test_exact_substring_dedup_keeper_retains_copy(spark, span_docs):
    from valkey_search_spark.operators.contamination import (
        exact_substring_dedup,
    )

    df = spark.createDataFrame(
        [Row(doc_id=k, text=t) for k, t in span_docs.items()])
    rows = {r["doc_id"]: r for r in
            exact_substring_dedup(df, n=5, min_doc_freq=2).collect()}
    # min-key holder of each duplicated gram keeps the span
    assert "alpha beta gamma delta epsilon" in rows[1]["text_deduped"]
    assert "alpha" not in rows[2]["text_deduped"]
    # overlapping windows in 3/4 merged into ONE removed span in doc 4
    assert rows[4]["spans_dropped"] == 1
    assert rows[4]["tokens_dropped"] == 6          # 6-token merged span
    # untouched docs: disjoint and sub-window
    assert rows[5]["text_deduped"] == span_docs[5]
    assert rows[6]["text_deduped"] == span_docs[6]
    assert rows[6]["tokens_dropped"] == 0


def test_exact_substring_dedup_randomized_vs_reference(spark):
    import random

    from valkey_search_spark.operators.contamination import (
        exact_substring_dedup,
    )

    rng = random.Random(17)
    vocab = WORDS.split()
    shared = [" ".join(rng.choices(vocab, k=6)) for _ in range(3)]
    docs = {}
    for k in range(1, 21):
        body = rng.choices(vocab, k=rng.randint(0, 25))
        for s in shared:
            if rng.random() < 0.4:
                pos = rng.randint(0, len(body))
                body = body[:pos] + s.split() + body[pos:]
        docs[k] = " ".join(body)
    df = spark.createDataFrame(
        [Row(doc_id=k, text=t) for k, t in docs.items()])
    want = _scalar_span_dedup(docs, 4, 2, True)
    for r in exact_substring_dedup(df, n=4, min_doc_freq=2).collect():
        assert (r["text_deduped"], r["tokens_kept"], r["tokens_dropped"],
                r["spans_dropped"]) == want[r["doc_id"]], r["doc_id"]


def test_exact_substring_dedup_duckdb_oracle(spark, sf_dir):
    """Independent SQL oracle on the real corpus: covered positions via
    per-start range explode + count distinct (no interval merge needed),
    span count via the gap>n property of sorted starts (with ends
    always last-start+n, a start opens a new span iff it is more than n
    past the previous start)."""
    import duckdb

    path = f"{sf_dir}/documents.parquet"
    docs = spark.read.parquet(path)
    from valkey_search_spark.operators.contamination import (
        exact_substring_dedup,
    )

    got = {r["doc_id"]: (r["tokens_kept"], r["tokens_dropped"],
                         r["spans_dropped"])
           for r in exact_substring_dedup(docs, n=4).collect()}

    oracle = duckdb.sql(f"""
        WITH t AS (SELECT doc_id, string_split(text, ' ') ts
                   FROM '{path}'),
        w AS (SELECT doc_id, i, hash(ts[i:i+3]) h
              FROM t, lateral unnest(
                  range(1, greatest(len(ts) - 2, 1))) u(i)),
        dup AS (SELECT h, min(doc_id) keeper FROM w GROUP BY h
                HAVING count(DISTINCT doc_id) >= 2),
        st AS (SELECT w.doc_id, w.i FROM w JOIN dup ON w.h = dup.h
               WHERE w.doc_id != dup.keeper),
        cov AS (SELECT doc_id, count(DISTINCT p) dropped
                FROM st, lateral unnest(range(i, i + 4)) v(p)
                GROUP BY doc_id),
        sp AS (SELECT doc_id, count(*) FILTER (
                   WHERE prev IS NULL OR i - prev > 4) spans
               FROM (SELECT doc_id, i,
                            lag(i) OVER (PARTITION BY doc_id
                                         ORDER BY i) prev FROM st)
               GROUP BY doc_id)
        SELECT t.doc_id, len(ts) - coalesce(dropped, 0),
               coalesce(dropped, 0), coalesce(spans, 0)
        FROM t LEFT JOIN cov USING (doc_id) LEFT JOIN sp USING (doc_id)
    """).fetchall()
    assert len(oracle) == len(got)
    for doc_id, kept, dropped, spans in oracle:
        assert got[doc_id] == (kept, dropped, spans), doc_id


def test_exact_substring_dedup_preserves_punctuation_by_default(spark):
    """Whitespace tokenization (default): punctuation and case survive
    outside removed spans; tokenizer='analysis' folds them."""
    from valkey_search_spark.operators.contamination import (
        exact_substring_dedup,
    )

    docs = [Row(doc_id=1, text="Hello, world! Don't panic at all."),
            Row(doc_id=2, text="Unrelated text lives here peacefully.")]
    df = spark.createDataFrame(docs)
    out = {r["doc_id"]: r["text_deduped"]
           for r in exact_substring_dedup(df, n=3).collect()}
    assert out[1] == "Hello, world! Don't panic at all."
    ana = {r["doc_id"]: r["text_deduped"] for r in
           exact_substring_dedup(df, n=3, tokenizer="analysis").collect()}
    assert ana[1] == "hello world don t panic at all"
    with pytest.raises(ValueError, match="tokenizer"):
        exact_substring_dedup(df, tokenizer="bogus")
