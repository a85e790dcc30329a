"""BM25 ranking: scalar reference, DuckDB oracle over the real corpus,
saturation/ordering sanity, and the map-only plan pin."""

import math

import pytest
from pyspark.sql import Row, functions as F

from valkey_search_spark.operators.ranking import bm25_rank

K1, B = 1.2, 0.75


def _scalar_bm25(docs, terms, k1=K1, b=B):
    toks = {k: t.split() for k, t in docs.items()}
    n = len(toks)
    avgdl = sum(map(len, toks.values())) / n

    def idf(t):
        dft = sum(1 for ts in toks.values() if t in ts)
        return math.log((n - dft + 0.5) / (dft + 0.5) + 1)

    def score(k):
        return sum(idf(t) * toks[k].count(t) * (k1 + 1)
                   / (toks[k].count(t)
                      + k1 * (1 - b + b * len(toks[k]) / avgdl))
                   for t in terms)

    return {k: score(k) for k in toks}


DOCS = {1: "the cat sat on the mat",
        2: "cat cat cat cat",
        3: "dogs prefer the rug to the mat today always",
        4: "nothing relevant here whatsoever",
        5: "mat"}


def test_bm25_matches_scalar_reference(spark):
    df = spark.createDataFrame(
        [Row(doc_id=k, text=t) for k, t in DOCS.items()])
    want = _scalar_bm25(DOCS, ["cat", "mat"])
    got = {r["doc_id"]: r["bm25_score"]
           for r in bm25_rank(df, ["cat", "mat"],
                              match_only=False).collect()}
    assert set(got) == set(DOCS)
    for k in DOCS:
        assert got[k] == pytest.approx(want[k], abs=1e-9), k


def test_bm25_saturation_and_ordering(spark):
    """BM25's defining behaviors: tf saturation (equal-length docs —
    tf=4 scores less than 4x the tf=1 score), non-matching docs drop
    under match_only, and top_k orders by (score desc, key asc) in
    agreement with the scalar model's ranking."""
    df = spark.createDataFrame(
        [Row(doc_id=k, text=t) for k, t in DOCS.items()])
    out = bm25_rank(df, ["cat", "mat"], top_k=10).collect()
    ids = [r["doc_id"] for r in out]
    assert 4 not in ids                         # no term -> dropped
    want = _scalar_bm25(DOCS, ["cat", "mat"])
    want_order = sorted((k for k in DOCS if want[k] > 0),
                        key=lambda k: (-want[k], k))
    assert ids == want_order
    scores = [r["bm25_score"] for r in out]
    assert scores == sorted(scores, reverse=True)
    # saturation: same-length docs, tf 4 vs tf 1 on one term
    sat = {1: "cat a b c", 2: "cat cat cat cat"}
    sdf = spark.createDataFrame(
        [Row(doc_id=k, text=t) for k, t in sat.items()])
    s = {r["doc_id"]: r["bm25_score"]
         for r in bm25_rank(sdf, ["cat"], match_only=False).collect()}
    assert s[2] < 4 * s[1]
    assert s[2] > s[1]


def test_bm25_duckdb_oracle_real_corpus(spark, sf_dir):
    """Same formula in DuckDB over the real documents table."""
    import duckdb

    path = f"{sf_dir}/documents.parquet"
    df = spark.read.parquet(path)
    terms = ["merge", "window", "cat"]          # two real, one absent
    got = {r["doc_id"]: r["bm25_score"]
           for r in bm25_rank(df, terms, match_only=False).collect()}

    inlist = ", ".join(f"'{t}'" for t in terms)
    oracle = duckdb.sql(f"""
        WITH t AS (SELECT doc_id, string_split(text, ' ') ts
                   FROM '{path}'),
        c AS (SELECT count(*) n, avg(len(ts)) avgdl FROM t),
        d AS (SELECT q.term,
                     (SELECT count(*) FROM t
                      WHERE list_contains(ts, q.term)) dft
              FROM (SELECT unnest([{inlist}]) term) q)
        SELECT doc_id,
               (SELECT sum(ln((c.n - d.dft + 0.5)/(d.dft + 0.5) + 1)
                        * len(list_filter(ts, x -> x = d.term))
                        * ({K1} + 1)
                        / (len(list_filter(ts, x -> x = d.term))
                           + {K1} * (1 - {B} + {B} * len(ts)/c.avgdl)))
                FROM d, c) s
        FROM t
    """).fetchall()
    assert len(oracle) == len(got)
    for doc_id, want in oracle:
        assert got[doc_id] == pytest.approx(want, abs=1e-9), doc_id


def test_bm25_tokens_col_reuse_matches(spark):
    from valkey_search_spark.functions.analysis import raw_tokens_column

    df = spark.createDataFrame(
        [Row(doc_id=k, text=t) for k, t in DOCS.items()])
    staged = df.withColumn("__toks", raw_tokens_column(F.col("text")))
    a = {r["doc_id"]: r["bm25_score"]
         for r in bm25_rank(df, ["cat"], match_only=False).collect()}
    b = {r["doc_id"]: r["bm25_score"]
         for r in bm25_rank(staged, ["cat"], tokens_col="__toks",
                            match_only=False).collect()}
    assert a == b


def test_bm25_edge_cases(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="a b")])
    with pytest.raises(ValueError, match="at least one"):
        bm25_rank(df, [])
    empty = spark.createDataFrame([], "doc_id long, text string")
    with pytest.raises(ValueError, match="empty"):
        bm25_rank(empty, ["a"])
    # duplicate query terms count once
    one = {r["doc_id"]: r["bm25_score"]
           for r in bm25_rank(df, ["a"], match_only=False).collect()}
    two = {r["doc_id"]: r["bm25_score"]
           for r in bm25_rank(df, ["a", "a"], match_only=False).collect()}
    assert one == two


def test_bm25_scoring_plan_map_only(spark):
    """After the one statistics job, scoring is a map-only codegen
    expression: no Python node, and without top_k no exchange beyond
    the optional input-spread round-robin (r12: an under-partitioned
    1-file scan repartitions once so the scoring expressions don't run
    on a single task; a well-partitioned input gets none — scoring
    itself introduces no shuffle either way)."""
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (bm25_rank(df, ["merge", "window"])
            ._jdf.queryExecution().executedPlan().toString())
    assert "Python" not in plan
    assert plan.count("Exchange") <= 1
    if "Exchange" in plan:
        assert "ROUND_ROBIN" in plan or "RoundRobin" in plan, plan


def test_bm25_tokenizer_not_duplicated_in_plan(spark):
    """The tokenizer regex must appear a BOUNDED number of times in the
    scoring plan: once in the match filter and once in the staged
    tf/dl projection, plus the scan node's textual echo of the pushed
    DataFilter (the pre-fix shape inlined it per score reference —
    11 copies, measured). Catches CollapseProject regressions."""
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (bm25_rank(df, ["merge", "window", "sort"], top_k=100)
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("regexp_extract_all") <= 3, plan


def test_bm25f_tokenizer_not_duplicated_in_plan(spark):
    """Per-field bound: filter + staged projection per field + the scan
    echo (pre-fix: 19 copies for two fields)."""
    from pyspark.sql import functions as F

    from valkey_search_spark.operators.ranking import bm25f_rank

    df = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
          .select("doc_id", F.col("text").alias("body"),
                  F.substring("text", 1, 40).alias("title")))
    plan = (bm25f_rank(df, ["merge", "window"],
                       fields={"body": 1.0, "title": 2.0})
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("regexp_extract_all") <= 5, plan


def test_bm25_over_indexed_token_column(spark):
    """A Column-typed tokens_col ranks off the catalog's staged struct
    tokens (the index's own analysis) — no re-tokenization, scores
    agree with a manual computation over the same token arrays."""
    from valkey_search_spark import SearchEngine, TextField

    docs = spark.createDataFrame(
        [Row(doc_id=k, text=t) for k, t in DOCS.items()])
    eng = SearchEngine(spark)
    eng.ft_create("bm25_idx", docs, [TextField("text")],
                  key_column="doc_id")
    frame = eng.catalog.get("bm25_idx").indexed_df()
    assert "_x_text" in frame.columns
    toks = F.transform(F.col("_x_text"), lambda s: s["t"])
    out = {r["doc_id"]: r["bm25_score"]
           for r in bm25_rank(frame, ["cat", "mat"], match_only=False,
                              tokens_col=toks).collect()}
    token_rows = {r["doc_id"]: [s["t"] for s in r["_x_text"]]
                  for r in frame.select("doc_id", "_x_text").collect()}
    want = _scalar_bm25({k: " ".join(v) for k, v in token_rows.items()},
                        ["cat", "mat"])
    for k, v in want.items():
        assert out[k] == pytest.approx(v, abs=1e-9), k


# ---------------------------------------------------------------------------
# TF-IDF top terms

from valkey_search_spark.operators.ranking import tfidf_top_terms


def _scalar_tfidf(docs, k):
    from collections import Counter

    toks = {i: t.split() for i, t in docs.items()}
    n = len(toks)
    dfreq = Counter()
    for ts in toks.values():
        for t in set(ts):
            dfreq[t] += 1
    out = {}
    for i, ts in toks.items():
        c = Counter(ts)
        scores = {t: c[t] * (math.log((1 + n) / (1 + dfreq[t])) + 1)
                  for t in c}
        out[i] = sorted(scores.items(),
                        key=lambda x: (-x[1], x[0]))[:k]
    return out


TDOCS = {1: "the cat sat on the mat", 2: "cat cat dog",
         3: "rare unicorn words here", 4: "the the the", 5: ""}


def test_tfidf_matches_scalar_reference(spark):
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in TDOCS.items()])
    got = {r["doc_id"]: r["top_terms"]
           for r in tfidf_top_terms(df, k=3).collect()}
    # N counts every document, including the empty one (sklearn's
    # convention); the empty doc just contributes no terms
    want = {i: w for i, w in _scalar_tfidf(TDOCS, 3).items() if w}
    for i, w in want.items():
        g = [(s["term"], s["score"]) for s in got[i]]
        assert len(g) == len(w)
        for (gt, gs), (wt, ws) in zip(g, w):
            assert gt == wt and gs == pytest.approx(ws, abs=1e-9), i
    assert got[5] is None                     # empty doc: no terms


def test_tfidf_min_df_and_distinctive_terms(spark):
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in TDOCS.items()])
    rows = {r["doc_id"]: r["top_terms"]
            for r in tfidf_top_terms(df, k=10, min_df=2).collect()}
    terms3 = [s["term"] for s in rows[3] or []]
    assert terms3 == []                       # all doc-3 terms are df=1
    # doc 1 keeps exactly its df>=2 terms, ordered by the model
    want1 = [(t, s) for t, s in _scalar_tfidf(TDOCS, 10)[1]
             if t in ("the", "cat")]          # doc 1's df>=2 terms
    got1 = [(s["term"], s["score"]) for s in rows[1]]
    assert [t for t, _ in got1] == [t for t, _ in want1]
    for (gt, gs), (wt, ws) in zip(got1, want1):
        assert gs == pytest.approx(ws, abs=1e-9), gt


def test_tfidf_duckdb_oracle_real_corpus(spark, sf_dir):
    import duckdb

    path = f"{sf_dir}/documents.parquet"
    df = spark.read.parquet(path)
    got = {r["doc_id"]: [(s["term"], round(s["score"], 9))
                         for s in r["top_terms"]]
           for r in tfidf_top_terms(df, k=5).collect()}
    oracle = duckdb.sql(f"""
        WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) w
                   FROM '{path}'),
        c AS (SELECT doc_id, w, count(*) tf FROM t GROUP BY doc_id, w),
        d AS (SELECT w, count(*) dfreq FROM c GROUP BY w),
        n AS (SELECT count(*) nd FROM '{path}'),
        s AS (SELECT c.doc_id, c.w,
                     c.tf * (ln((1 + n.nd)/(1 + d.dfreq)) + 1) sc,
                     row_number() OVER (PARTITION BY c.doc_id
                                        ORDER BY c.tf * (ln((1 + n.nd)
                                          /(1 + d.dfreq)) + 1) DESC,
                                        c.w ASC) rn
              FROM c JOIN d USING (w) CROSS JOIN n)
        SELECT doc_id, list(w ORDER BY rn), list(sc ORDER BY rn)
        FROM s WHERE rn <= 5 GROUP BY doc_id
    """).fetchall()
    assert len(oracle) == len(got)
    for doc_id, terms, scores in oracle:
        want = [(t, round(s, 9)) for t, s in zip(terms, scores)]
        assert got[doc_id] == want, doc_id


# ---------------------------------------------------------------------------
# BM25F

from valkey_search_spark.operators.ranking import bm25f_rank


def _scalar_bm25f(docs, terms, fields, k1=K1, b=B):
    toks = {k: {f: d[f].split() for f in fields} for k, d in docs.items()}
    n = len(docs)
    avgdl = {f: sum(len(toks[k][f]) for k in toks) / n for f in fields}

    def idf(t):
        dft = sum(1 for k in toks
                  if any(t in toks[k][f] for f in fields))
        return math.log((n - dft + 0.5) / (dft + 0.5) + 1)

    def score(k):
        s = 0.0
        for t in terms:
            tft = sum(w * toks[k][f].count(t)
                      / (1 - b + b * len(toks[k][f]) / avgdl[f])
                      for f, w in fields.items())
            s += idf(t) * tft / (k1 + tft)
        return s

    return {k: score(k) for k in docs}


FDOCS = {1: {"title": "spark engine", "body": "a long body about cat "
                                              "stuff and more cat talk"},
         2: {"title": "cat pictures", "body": "spark spark spark is "
                                              "mentioned here often"},
         3: {"title": "unrelated", "body": "nothing matches here at all"}}


def test_bm25f_matches_scalar_reference(spark):
    weights = {"title": 3.0, "body": 1.0}
    df = spark.createDataFrame(
        [Row(doc_id=k, **d) for k, d in FDOCS.items()])
    got = {r["doc_id"]: r["bm25f_score"] for r in
           bm25f_rank(df, ["spark", "cat"], weights,
                      match_only=False).collect()}
    want = _scalar_bm25f(FDOCS, ["spark", "cat"], weights)
    for k in FDOCS:
        assert got[k] == pytest.approx(want[k], abs=1e-9), k


def test_bm25f_field_weighting_boosts_title(spark):
    """A title hit under a 3x title weight outranks body repetition —
    the point of field weighting."""
    weights = {"title": 3.0, "body": 1.0}
    df = spark.createDataFrame(
        [Row(doc_id=k, **d) for k, d in FDOCS.items()])
    out = bm25f_rank(df, ["cat"], weights, top_k=5).collect()
    assert [r["doc_id"] for r in out][0] == 2    # 'cat' in the title
    # weights flipped: the long-body cats doc catches up in rank terms
    flat = {r["doc_id"]: r["bm25f_score"] for r in
            bm25f_rank(df, ["cat"], {"title": 1.0, "body": 3.0},
                       match_only=False).collect()}
    boost = {r["doc_id"]: r["bm25f_score"] for r in
             bm25f_rank(df, ["cat"], weights, match_only=False).collect()}
    assert boost[2] / boost[1] > flat[2] / flat[1]


def test_bm25f_single_field_rank_matches_bm25(spark):
    """One field at weight 1: BM25F differs from BM25 by the constant
    (k1+1) factor — rankings identical, scores proportional."""
    df = spark.createDataFrame(
        [Row(doc_id=k, text=t) for k, t in DOCS.items()])
    f = {r["doc_id"]: r["bm25f_score"] for r in
         bm25f_rank(df, ["cat", "mat"], {"text": 1.0},
                    match_only=False).collect()}
    o = {r["doc_id"]: r["bm25_score"] for r in
         bm25_rank(df, ["cat", "mat"], match_only=False).collect()}
    for k in DOCS:
        assert o[k] == pytest.approx(f[k] * (K1 + 1), abs=1e-9), k


def test_bm25f_edge_cases(spark):
    df = spark.createDataFrame([Row(doc_id=1, title="a", body="b")])
    with pytest.raises(ValueError, match="term"):
        bm25f_rank(df, [], {"title": 1.0})
    with pytest.raises(ValueError, match="field"):
        bm25f_rank(df, ["a"], {})
    empty = spark.createDataFrame([], "doc_id long, title string")
    with pytest.raises(ValueError, match="empty"):
        bm25f_rank(empty, ["a"], {"title": 1.0})


def test_bm25f_null_field_scores_off_remaining_fields(spark):
    """A doc whose title matches but whose body is NULL must keep a
    real score from the title (review finding: size(null) nulled every
    tf/dl and emitted bm25f_score = NULL through the match filter)."""
    from pyspark.sql import functions as F

    from valkey_search_spark.operators.ranking import bm25f_rank

    df = spark.createDataFrame(
        [(1, "batch stream", "full body with batch inside"),
         (2, "batch stream", None),
         (3, "nothing here", "irrelevant body")],
        "doc_id long, title string, body string")
    rows = {r["doc_id"]: r["bm25f_score"]
            for r in bm25f_rank(df, ["batch"],
                                fields={"title": 2.0, "body": 1.0})
            .collect()}
    assert set(rows) == {1, 2}
    assert rows[2] is not None and rows[2] > 0.0
    assert rows[1] > rows[2]   # doc 1 also matches in the body


def test_bm25_corpus_stats_query_parity(spark, sf_dir):
    # index-time stats: scores must equal the per-query statistics job
    # exactly for in-lexicon terms, and save/load round-trips
    from valkey_search_spark.operators.ranking import (BM25Stats,
                                                       bm25_corpus_stats)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(400)
    stats = bm25_corpus_stats(docs, text_col="text")
    terms = ["spark", "window", "merge"]
    live = {r["doc_id"]: r["bm25_score"]
            for r in bm25_rank(docs, terms, text_col="text").collect()}
    cached = {r["doc_id"]: r["bm25_score"]
              for r in bm25_rank(docs, terms, text_col="text",
                                 corpus_stats=stats).collect()}
    assert live.keys() == cached.keys()
    for k in live:
        assert cached[k] == pytest.approx(live[k], rel=1e-12)

    # zero eager jobs on the cached path
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    bm25_rank(docs, terms, text_col="text", corpus_stats=stats)
    assert len(tracker.getJobIdsForGroup(None) or []) == before

    # unseen term -> df 0 -> max idf, still scores without error
    out = bm25_rank(docs, ["qqzzxx", "spark"], text_col="text",
                    corpus_stats=stats, top_k=5).collect()
    assert out

    import tempfile, os
    p = os.path.join(tempfile.mkdtemp(), "bm.json")
    stats.save(p)
    s2 = BM25Stats.load(p)
    assert (s2.n, s2.avgdl) == (stats.n, stats.avgdl)
    assert s2.df == stats.df
