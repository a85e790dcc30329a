"""CCNet-style bigram-LM perplexity scoring: scalar reference, DuckDB
oracle over the real corpus, and ordering sanity (reference-like text
scores lower perplexity than OOV gibberish)."""

import math
from collections import Counter

import pytest
from pyspark.sql import Row

from valkey_search_spark.operators.lm import BigramLM, lm_perplexity

REF_TEXTS = ["the cat sat on the mat", "the dog sat on the rug",
             "a cat and a dog sat", "the cat and the dog"]


def _scalar_lm(ref_texts, d=0.75, order=2):
    toks = [t.split() for t in ref_texts]
    uni = Counter(w for ts in toks for w in ts)
    bi = Counter((ts[i - 1], ts[i]) for ts in toks
                 for i in range(1, len(ts)))
    tri = Counter((ts[i - 2], ts[i - 1], ts[i]) for ts in toks
                  for i in range(2, len(ts)))
    ctx, tv = Counter(), Counter()
    for (v, w), c in bi.items():
        ctx[v] += c
        tv[v] += 1
    tctx, tt = Counter(), Counter()
    for (v1, v, w), c in tri.items():
        tctx[(v1, v)] += c
        tt[(v1, v)] += 1
    n, t = sum(uni.values()), len(uni)

    def p_uni(w):
        return max(uni.get(w, 0) - d, 0) / n + (d * t / n) / (t + 1)

    def p2(v, w):
        if v not in ctx:
            return p_uni(w)
        return (max(bi.get((v, w), 0) - d, 0)
                + d * tv[v] * p_uni(w)) / ctx[v]

    def p(v1, v, w):
        lo = p2(v, w)
        if order == 2 or v1 is None or (v1, v) not in tctx:
            return lo
        return (max(tri.get((v1, v, w), 0) - d, 0)
                + d * tt[(v1, v)] * lo) / tctx[(v1, v)]

    def score(text):
        ts = text.split()
        if len(ts) < 2:
            return None
        return sum(math.log2(p(ts[i - 2] if i >= 2 else None,
                               ts[i - 1], ts[i]))
                   for i in range(1, len(ts))) / (len(ts) - 1)

    return score


def test_bigram_lm_matches_scalar_reference(spark):
    ref = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(REF_TEXTS)])
    docs = [Row(doc_id=1, text="the cat sat on the rug"),
            Row(doc_id=2, text="zebra quark flux blorp"),
            Row(doc_id=3, text="single"),
            Row(doc_id=4, text="the the the the"),
            Row(doc_id=5, text="mat the on sat cat the")]
    got = {r["doc_id"]: r for r in
           lm_perplexity(spark.createDataFrame(docs), ref).collect()}
    score = _scalar_lm(REF_TEXTS)
    for doc in docs:
        want = score(doc.text)
        g = got[doc.doc_id]
        if want is None:
            assert g["lm_logprob_per_token"] is None
            assert g["lm_perplexity"] is None
        else:
            assert g["lm_logprob_per_token"] == pytest.approx(want,
                                                              abs=1e-9)
            assert g["lm_perplexity"] == pytest.approx(2 ** -want,
                                                       rel=1e-9)


def test_bigram_lm_orders_quality(spark):
    """The filter's whole point: reference-like prose scores LOWER
    perplexity than shuffled/OOV text; every probability is positive so
    no doc scores inf."""
    ref = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(REF_TEXTS)])
    docs = spark.createDataFrame([
        Row(doc_id=1, text="the cat sat on the mat"),     # in-domain
        Row(doc_id=2, text="mat the on sat cat the"),     # shuffled
        Row(doc_id=3, text="zzz qqq www eee rrr ttt"),    # OOV
    ])
    rows = {r["doc_id"]: r["lm_perplexity"]
            for r in lm_perplexity(docs, ref).collect()}
    assert rows[1] < rows[2] < rows[3]
    assert all(math.isfinite(v) for v in rows.values())


def test_bigram_lm_min_count_prunes_only_bigram_table(spark):
    """min_count prunes singleton bigrams from the table; their mass
    returns via backoff, and context totals keep describing the FULL
    distribution (pruned-model scores stay finite and close)."""
    ref = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(REF_TEXTS)])
    lm = BigramLM.train(ref, min_count=2)
    full = BigramLM.train(ref, min_count=1)
    assert lm.bi.count() < full.bi.count()
    # ctx totals identical: pruning must not change c(v)/T(v)
    assert sorted(lm.ctx.collect()) == sorted(full.ctx.collect())
    doc = spark.createDataFrame([Row(doc_id=1, text="the cat sat")])
    r = lm.score(doc).collect()[0]
    assert math.isfinite(r["lm_perplexity"])


def test_bigram_lm_duckdb_oracle_real_corpus(spark, sf_dir):
    """Full-pipeline oracle on the real documents table: the same
    counts + closed-form probabilities in DuckDB SQL, compared per-doc
    at 1e-6. Reference = even doc_ids, scored = 60 odd docs."""
    import duckdb

    path = f"{sf_dir}/documents.parquet"
    docs = spark.read.parquet(path)
    ref = docs.where("doc_id % 2 = 0")
    target = docs.where("doc_id % 2 = 1 and doc_id < 120")
    got = {r["doc_id"]: r["lm_logprob_per_token"]
           for r in lm_perplexity(target, ref).collect()}

    oracle = duckdb.sql(f"""
        WITH tok AS (
          SELECT doc_id, unnest(string_split(text, ' ')) w,
                 generate_subscripts(string_split(text, ' '), 1) i
          FROM '{path}' WHERE doc_id % 2 = 0),
        uni AS (SELECT w, count(*) c_w FROM tok GROUP BY w),
        pair AS (
          SELECT a.w v, b.w w FROM tok a JOIN tok b
            ON a.doc_id = b.doc_id AND b.i = a.i + 1),
        bi AS (SELECT v, w, count(*) c_vw FROM pair GROUP BY v, w),
        ctx AS (SELECT v, sum(c_vw) c_v, count(*) t_v FROM bi GROUP BY v),
        consts AS (SELECT sum(c_w) n, count(*) t FROM uni),
        ttok AS (
          SELECT doc_id, string_split(text, ' ') ts
          FROM '{path}' WHERE doc_id % 2 = 1 AND doc_id < 120),
        tpair AS (
          SELECT doc_id, ts[i] v, ts[i+1] w
          FROM ttok, lateral unnest(range(1, len(ts))) u(i)),
        scored AS (
          SELECT doc_id,
            log2(CASE WHEN c.c_v IS NOT NULL THEN
              (greatest(coalesce(b.c_vw, 0) - 0.75, 0)
               + 0.75 * c.t_v * (greatest(coalesce(u.c_w,0)-0.75,0)/k.n
                                 + (0.75*k.t/k.n)/(k.t+1))) / c.c_v
            ELSE greatest(coalesce(u.c_w,0)-0.75,0)/k.n
                 + (0.75*k.t/k.n)/(k.t+1) END) lp
          FROM tpair p
          LEFT JOIN bi b ON b.v = p.v AND b.w = p.w
          LEFT JOIN ctx c ON c.v = p.v
          LEFT JOIN uni u ON u.w = p.w
          CROSS JOIN consts k)
        SELECT doc_id, avg(lp) FROM scored GROUP BY doc_id
    """).fetchall()
    assert len(oracle) == len(got) == 60
    for doc_id, want in oracle:
        assert got[doc_id] == pytest.approx(want, abs=1e-6), doc_id


def test_lm_score_plan_broadcasts_model(spark):
    """The corpus side must stream: all three model joins broadcast,
    and the only corpus shuffle is the per-doc aggregation key."""
    ref = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(REF_TEXTS)])
    docs = spark.createDataFrame([Row(doc_id=1, text="the cat sat")])
    plan = (lm_perplexity(docs, ref)._jdf.queryExecution()
            .executedPlan().toString())
    assert plan.count("BroadcastHashJoin") >= 3
    assert "Python" not in plan
    # every MODEL join is broadcast — a shuffle join keyed on v/w would
    # mean the scored corpus shuffled on a model key. (The doc-keyed
    # score join-back and the reference side's own training
    # aggregations may shuffle; those are the document key and the
    # small side respectively.)
    for ln in plan.splitlines():
        if "SortMergeJoin" in ln or "ShuffledHashJoin" in ln:
            assert " v#" not in ln and " w#" not in ln and \
                "[v#" not in ln and "[w#" not in ln, ln


def test_ccnet_buckets_tercile_split(spark, sf_dir):
    from valkey_search_spark.operators.lm import ccnet_buckets

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lm = BigramLM.train(docs.where("doc_id % 2 = 0"))
    out = ccnet_buckets(docs.where("doc_id % 2 = 1"), lm)
    counts = {r["ppl_bucket"]: r["n"] for r in
              out.groupBy("ppl_bucket").agg(
                  __import__("pyspark.sql.functions",
                             fromlist=["count"]).count("*").alias("n"))
              .collect()}
    total = sum(counts.values())
    # terciles: each labeled bucket within a few % of a third
    for b in ("head", "middle", "tail"):
        assert counts[b] / total == pytest.approx(1 / 3, abs=0.05), counts
    # heads really are the most reference-like docs
    stats = {r["ppl_bucket"]: r["m"] for r in out.groupBy("ppl_bucket")
             .agg(__import__("pyspark.sql.functions", fromlist=["avg"])
                  .avg("lm_perplexity").alias("m")).collect()}
    assert stats["head"] < stats["middle"] < stats["tail"]


def test_pipeline_lm_gate(spark):
    """max_lm_perplexity composes into curate_documents' single-scan
    gate; a pre-trained model keeps the composition job-free."""
    from valkey_search_spark.operators.pipeline import (
        CurationConfig, curate_documents,
    )

    ref = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(REF_TEXTS)])
    lm = BigramLM.train(ref)
    docs = spark.createDataFrame([
        Row(doc_id=1, text="the cat sat on the mat with the dog "
                           "and the cat sat on the rug again today"),
        Row(doc_id=2, text="zzz qqq www eee rrr ttt yyy uuu iii "
                           "ooo ppp aaa sss ddd fff ggg hhh jjj"),
    ])
    # threshold between the two docs' perplexities
    ppls = {r["doc_id"]: r["lm_perplexity"] for r in lm.score(docs).collect()}
    cut = (ppls[1] + ppls[2]) / 2
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup() or [])
    clean, funnel = curate_documents(
        docs, config=CurationConfig(
            min_quality=0.0, min_tokens=2, near_dup_threshold=None,
            lm_model=lm, max_lm_perplexity=cut),
        with_funnel=False)
    assert len(tracker.getJobIdsForGroup() or []) == before  # still lazy
    kept = [r["doc_id"] for r in clean.collect()]
    assert kept == [1]

    with pytest.raises(ValueError, match="max_lm_perplexity"):
        curate_documents(docs, config=CurationConfig(max_lm_perplexity=1.0))


def test_bigram_lm_empty_reference_raises(spark):
    empty = spark.createDataFrame([Row(doc_id=1, text="")])
    with pytest.raises(ValueError, match="no tokens"):
        BigramLM.train(empty)


def test_lm_score_tokens_col_reuse_matches(spark):
    """Scoring off a pre-staged token array equals scoring from text —
    the pipeline's single-tokenize composition stays correct."""
    from valkey_search_spark.functions.analysis import raw_tokens_column
    from pyspark.sql import functions as F

    ref = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(REF_TEXTS)])
    lm = BigramLM.train(ref)
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="the cat sat on the rug"),
         Row(doc_id=2, text="a dog and a cat")])
    staged = docs.withColumn("__toks", raw_tokens_column(F.col("text")))
    a = {r["doc_id"]: r["lm_logprob_per_token"]
         for r in lm.score(docs).collect()}
    b = {r["doc_id"]: r["lm_logprob_per_token"]
         for r in lm.score(staged, tokens_col="__toks").collect()}
    assert a == b


def test_trigram_lm_matches_scalar_reference(spark):
    """order=3: trigram level with recursive backoff into the bigram
    level — exact match against the scalar model on every shape
    (in-domain, partial context, OOV, first-position backoff)."""
    ref = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(REF_TEXTS)])
    docs = [Row(doc_id=1, text="the cat sat on the rug"),
            Row(doc_id=2, text="zebra quark flux blorp"),
            Row(doc_id=3, text="the cat"),                  # bigram only
            Row(doc_id=4, text="cat sat on the mat today"),
            Row(doc_id=5, text="single")]
    got = {r["doc_id"]: r["lm_logprob_per_token"] for r in
           lm_perplexity(spark.createDataFrame(docs), ref,
                         order=3).collect()}
    score = _scalar_lm(REF_TEXTS, order=3)
    for doc in docs:
        want = score(doc.text)
        if want is None:
            assert got[doc.doc_id] is None
        else:
            assert got[doc.doc_id] == pytest.approx(want, abs=1e-9), \
                doc.doc_id


def test_trigram_sharpens_in_domain_scores(spark):
    """A doc that is literally reference text must score at least as
    well under the trigram model; OOV gibberish stays bad; and a
    reference with no 3-token docs degrades to the bigram model."""
    ref = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(REF_TEXTS)])
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="the cat sat on the mat"),
         Row(doc_id=2, text="zzz qqq www eee rrr")])
    p2 = {r["doc_id"]: r["lm_perplexity"]
          for r in lm_perplexity(docs, ref, order=2).collect()}
    p3 = {r["doc_id"]: r["lm_perplexity"]
          for r in lm_perplexity(docs, ref, order=3).collect()}
    assert p3[1] < p2[1]                      # sharper on verbatim text
    assert p3[2] > p3[1] * 2                  # gibberish still far worse
    # short-doc reference -> empty trigram tables -> identical to order 2
    short_ref = spark.createDataFrame(
        [Row(doc_id=1, text="the cat"), Row(doc_id=2, text="a dog")])
    a = {r["doc_id"]: r["lm_logprob_per_token"]
         for r in lm_perplexity(docs, short_ref, order=2).collect()}
    b = {r["doc_id"]: r["lm_logprob_per_token"]
         for r in lm_perplexity(docs, short_ref, order=3).collect()}
    assert a == b


def test_ccnet_buckets_all_unscoreable_corpus(spark):
    """Every doc <2 tokens: approxQuantile has nothing to cut on — all
    buckets null instead of an unpack crash."""
    from valkey_search_spark.operators.lm import ccnet_buckets

    ref = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(REF_TEXTS)])
    lm = BigramLM.train(ref)
    docs = spark.createDataFrame([Row(doc_id=1, text="one"),
                                  Row(doc_id=2, text="two")])
    rows = ccnet_buckets(docs, lm).collect()
    assert all(r["ppl_bucket"] is None for r in rows)


def test_bigram_lm_tables_are_persisted(spark):
    """train() persists the model tables so repeated score() calls do
    not re-aggregate the reference corpus per broadcast build."""
    ref = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(REF_TEXTS)])
    lm = BigramLM.train(ref)
    assert lm.uni.storageLevel.useMemory
    assert lm.ctx.storageLevel.useMemory
    assert lm.bi.storageLevel.useMemory
    lm.unpersist()
    assert not lm.uni.storageLevel.useMemory


def test_lm_save_load_score_parity(spark, sf_dir, tmp_path):
    """Saved artifact scores identically to the trained model —
    the KenLM-arpa-style reuse contract (train once, score anywhere)."""
    from valkey_search_spark.operators.lm import BigramLM

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ref = docs.where("doc_id % 2 = 0")
    held = docs.where("doc_id % 2 = 1").limit(50)
    lm = BigramLM.train(ref, order=3)
    lm.save(str(tmp_path / "lm"))
    re = BigramLM.load(spark, str(tmp_path / "lm"))
    assert (re.n_tokens, re.n_types, re.discount) == \
        (lm.n_tokens, lm.n_types, lm.discount)
    a = {r["doc_id"]: r["lm_perplexity"]
         for r in lm.score(held).collect()}
    b = {r["doc_id"]: r["lm_perplexity"]
         for r in re.score(held).collect()}
    assert a.keys() == b.keys()
    for k in a:
        if a[k] is None:
            assert b[k] is None
        else:
            assert abs(a[k] - b[k]) < 1e-9
    lm.unpersist()
    re.unpersist()
