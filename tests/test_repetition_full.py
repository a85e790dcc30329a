"""Full Gopher repetition table (Rae et al. A1): top-{2,3,4}-gram and
dup-{5..10}-gram char fractions, dup line/paragraph count AND char
fractions — scalar-reference-pinned on crafted + random corpora, DuckDB
oracle on the real documents table, thresholded flags, plan pinned
Python-free."""
from __future__ import annotations

import random
from collections import Counter

import duckdb
import pytest

from pyspark.sql import functions as F

from tests.conftest import SF_DIR, load
from valkey_search_spark.operators.contamination import (
    GOPHER_REPETITION_THRESHOLDS, gopher_repetition_flags,
    repetition_stats,
)

WORDS = "alpha beta gamma delta epsilon zeta eta theta".split()


def _toks(text):
    import re

    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def _scalar_stats(text, top_ns=(2, 3, 4), dup_ns=range(5, 11)):
    toks = _toks(text)
    chars = len(text)
    out = {}

    def grams(n):
        return [" ".join(toks[i:i + n])
                for i in range(len(toks) - n + 1)]

    for n in top_ns:
        if len(toks) < n or chars == 0:
            out[f"top_{n}gram_char_frac"] = 0.0
            continue
        c = Counter(grams(n))
        out[f"top_{n}gram_char_frac"] = round(
            max(cnt * len(g) for g, cnt in c.items()) / chars, 6)
    for n in dup_ns:
        if len(toks) < n or chars == 0:
            out[f"dup_{n}gram_char_frac"] = 0.0
            continue
        c = Counter(grams(n))
        tot = sum(cnt * len(g) for g, cnt in c.items() if cnt >= 2)
        out[f"dup_{n}gram_char_frac"] = round(min(tot / chars, 1.0), 6)
    for name, sep in (("line", "\n"), ("para", "\n\n")):
        segs = [s for s in text.split(sep) if s.strip()]
        c = Counter(segs)
        nseg = len(segs)
        out[f"dup_{name}_frac"] = (
            (nseg - len(c)) / nseg if nseg else 0.0)
        extra = sum((cnt - 1) * len(s) for s, cnt in c.items() if cnt >= 2)
        out[f"dup_{name}_char_frac"] = round(
            min(extra / chars, 1.0) if chars else 0.0, 6)
    return out


def _crafted():
    rng = random.Random(7)
    docs = []
    # highly repetitive: one phrase looped
    docs.append("the cat sat on the mat " * 20)
    # repeated lines and paragraphs
    docs.append("header line\nbody one two three\nheader line\n\n"
                "para alpha beta\n\npara alpha beta")
    # clean random soup
    for i in range(20):
        docs.append(" ".join(rng.choice(WORDS)
                             for _ in range(rng.randint(3, 60))))
    # short/edge docs
    docs += ["", "one", "two words", "a a a a a a a a a a a a"]
    return [(i, d) for i, d in enumerate(docs)]


def test_matches_scalar_reference(spark):
    rows = _crafted()
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in repetition_stats(
        df, top_ns=(2, 3, 4), dup_ns=tuple(range(5, 11))).collect()}
    for doc_id, text in rows:
        want = _scalar_stats(text)
        g = got[doc_id]
        for k, v in want.items():
            assert g[k] == pytest.approx(v, abs=2e-6), (doc_id, k, text[:40])


def test_duckdb_oracle_real_corpus(spark, sf_dir):
    path = f"{SF_DIR}/documents.parquet"
    df = load(spark, sf_dir, "documents")
    got = {r["doc_id"]: r for r in repetition_stats(
        df, top_ns=(3,), dup_ns=(5,)).collect()}
    want = duckdb.sql(f"""
        WITH t AS (SELECT doc_id, text, string_split(text,' ') tk
                   FROM '{path}'),
        g3 AS (SELECT doc_id, text, list_transform(
                 range(1, len(tk)-1),
                 i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]) gs
               FROM t WHERE len(tk) >= 3),
        t3 AS (SELECT doc_id, list_max(list_transform(list_distinct(gs),
                 g -> len(list_filter(gs, x -> x = g)) * length(g)))
                 / length(text) v FROM g3),
        g5 AS (SELECT doc_id, text, list_transform(
                 range(1, len(tk)-3),
                 i -> tk[i]||' '||tk[i+1]||' '||tk[i+2]||' '||tk[i+3]
                      ||' '||tk[i+4]) gs
               FROM t WHERE len(tk) >= 5),
        d5 AS (SELECT doc_id, least(coalesce(list_sum(list_transform(
                 list_filter(list_distinct(gs),
                   g -> len(list_filter(gs, x -> x = g)) >= 2),
                 g -> len(list_filter(gs, x -> x = g)) * length(g))), 0)
                 / length(text), 1.0) v FROM g5)
        SELECT t.doc_id, coalesce(t3.v, 0.0), coalesce(d5.v, 0.0)
        FROM t LEFT JOIN t3 USING (doc_id) LEFT JOIN d5 USING (doc_id)
    """).fetchall()
    assert len(want) == len(got) > 100
    hits3 = 0
    for doc_id, top3, dup5 in want:
        assert got[doc_id]["top_3gram_char_frac"] == \
            pytest.approx(round(top3, 6), abs=2e-6), doc_id
        assert got[doc_id]["dup_5gram_char_frac"] == \
            pytest.approx(round(dup5, 6), abs=2e-6), doc_id
        hits3 += top3 > 0
    # the soup really exercises the top-3 signal; within-document
    # 5-gram repeats are legitimately rare in random soup (the crafted
    # corpus in test_matches_scalar_reference covers nonzero dup_n)
    assert hits3 > 100


def test_flags_and_thresholds(spark):
    df = spark.createDataFrame(
        [(0, "the cat sat on the mat " * 30),
         (1, " ".join(f"w{i}" for i in range(80)))],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in gopher_repetition_flags(df).collect()}
    assert out[0]["rep_pass"] is False      # looped phrase trips top-n
    assert out[1]["rep_pass"] is True       # all-distinct text passes
    for sig in GOPHER_REPETITION_THRESHOLDS:
        assert f"g_{sig}" in out[0].asDict()
    # threshold override + unknown-name guard
    strict = gopher_repetition_flags(
        df, thresholds={"top_2gram_char_frac": 0.0}).collect()
    assert all(not r["g_top_2gram_char_frac"] or
               r["top_2gram_char_frac"] == 0.0 for r in strict)
    with pytest.raises(ValueError, match="unknown repetition"):
        gopher_repetition_flags(df, thresholds={"nope": 1.0})


def test_plan_python_free(spark):
    df = spark.createDataFrame([(1, "a b c d e f g h i j")],
                               "doc_id long, text string")
    plan = gopher_repetition_flags(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_default_output_backward_compatible(spark):
    # the historical three-signal shape plus the two new char fracs;
    # no top-3/4 or dup-n columns unless asked
    df = spark.createDataFrame([(1, "x y x y")], "doc_id long, text string")
    cols = set(repetition_stats(df).columns) - {"doc_id", "text"}
    assert cols == {"dup_line_frac", "dup_para_frac",
                    "dup_line_char_frac", "dup_para_char_frac",
                    "top_2gram_char_frac"}


def test_arrow_engine_bit_identical(spark, sf_dir):
    """engine="arrow" (one Arrow kernel pass) must produce EXACTLY the
    JVM expression engine's signals — same rounding (HALF_UP via
    BigDecimal's shortest-repr path), same trim semantics (space chars
    only), same null/empty gating — over the real corpus plus
    adversarial rows (unicode case folds, tabs, blank-para runs)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text")
    extra = spark.createDataFrame(
        [(90001, "a b a b a b a b a b a b a b a b"),
         (90002, "x\n\nx\n\nx\n  \nyy zz"),
         (90003, None),
         (90004, ""),
         (90005, "one two"),
         (90006, "CAFÉ Café café ß ẞ straße STRASSE " * 5),
         (90007, "tab\there spaces   multiple\nline1\nline1\n \nline1"),
         # unicode whitespace: Java-regex \s is ASCII-only, so NBSP /
         # U+2028 / ideographic space live INSIDE tokens on the JVM
         # side and the Arrow kernel must agree (re.ASCII twin)
         (90008, "nb\u00a0sp und\u3000ideo a\u2028b " * 3
                 + "\nx\n\u00a0\ny y y y y"),],
        "doc_id long, text string")
    base = docs.unionByName(extra)
    j = gopher_repetition_flags(base, engine="jvm")
    a = gopher_repetition_flags(base, engine="arrow")
    assert j.columns == a.columns
    cols = [c for c in j.columns if c != "text"]
    ja = {r["doc_id"]: tuple(r[c] for c in cols) for r in j.collect()}
    aa = {r["doc_id"]: tuple(r[c] for c in cols) for r in a.collect()}
    assert ja == aa


def test_arrow_engine_tokens_col_and_errors(spark):
    docs = spark.createDataFrame(
        [(1, "w w w w w q"), (2, "a b c d e f")],
        "doc_id long, text string")
    from valkey_search_spark.operators.contamination import (
        repetition_stats,
    )
    from valkey_search_spark.functions.analysis import raw_tokens_column

    staged = docs.withColumn("tk", raw_tokens_column(F.col("text")))
    j = repetition_stats(staged, tokens_col="tk", top_ns=(2,),
                         dup_ns=(3,), engine="jvm")
    a = repetition_stats(staged, tokens_col="tk", top_ns=(2,),
                         dup_ns=(3,), engine="arrow")
    cols = [c for c in j.columns if c not in ("text", "tk")]
    assert sorted(map(tuple, j.select(*cols).collect())) == \
        sorted(map(tuple, a.select(*cols).collect()))
    import pytest

    with pytest.raises(ValueError, match="unknown engine"):
        repetition_stats(docs, engine="duck")
