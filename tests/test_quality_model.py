"""Model-based quality filter: separation on held-out data, JVM-only
scoring plan, deterministic Pareto acceptance, persistence."""

import random

import pytest
from pyspark.sql import functions as F

from valkey_search_spark.operators.quality_model import (
    QualityClassifier, pareto_keep, quality_filter,
)

SF = "/root/testdata/sf0.001"


def _gibberish(spark, n, seed=11):
    rng = random.Random(seed)
    rows = [(i, " ".join("".join(rng.choices("qxzjvkw", k=rng.randint(3, 9)))
                         for _ in range(rng.randint(20, 60))))
            for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def clf(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    clean_train = docs.where(F.col("doc_id") % 2 == 0)
    return QualityClassifier.train(clean_train, _gibberish(spark, 400),
                                   num_features=1 << 15)


def test_separates_held_out(spark, clf):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    clean_held = docs.where(F.col("doc_id") % 2 == 1)
    m_clean = (clf.score(clean_held).agg(F.avg("quality_score"))
               .first()[0])
    m_gib = (clf.score(_gibberish(spark, 200, seed=99))
             .agg(F.avg("quality_score")).first()[0])
    assert m_clean > 0.8 > 0.2 > m_gib


def test_scoring_plan_is_python_free(spark, clf):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = (clf.score(docs)._jdf.queryExecution().executedPlan().toString())
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_pareto_acceptance_semantics(spark):
    n = 5000
    df = spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).alias("grp"))
    for score, lo, hi in ((1.0, 1.0, 1.0),        # always kept
                          (0.9, 0.32, 0.52),      # (1.1)^-9 ~ 0.424
                          (0.0, 0.0, 0.01)):      # (2.0)^-9 ~ 0.002
        kept = df.where(pareto_keep("k", F.lit(score))).count()
        assert lo <= kept / n <= hi, (score, kept / n)
    # deterministic: same seed same set; different seed a different set
    a = {r["k"] for r in
         df.where(pareto_keep("k", F.lit(0.5), seed=1)).collect()}
    b = {r["k"] for r in
         df.where(pareto_keep("k", F.lit(0.5), seed=1)).collect()}
    c = {r["k"] for r in
         df.where(pareto_keep("k", F.lit(0.5), seed=2)).collect()}
    assert a == b and a != c


def test_quality_filter_end_to_end(spark, clf):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    pool = docs.unionByName(
        _gibberish(spark, 300, seed=5)
        .withColumn("doc_id", F.col("doc_id") + 10_000_000)
        .select(*docs.columns[:1], "text",
                *[F.lit(None).cast(docs.schema[c].dataType).alias(c)
                  for c in docs.columns if c not in ("doc_id", "text")])
        .select(*docs.columns))
    kept = quality_filter(pool, clf, key="doc_id")
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    n_clean_kept = sum(1 for i in ids if i < 10_000_000)
    n_gib_kept = sum(1 for i in ids if i >= 10_000_000)
    assert n_clean_kept > 0.9 * docs.count()      # clean mostly passes
    assert n_gib_kept < 0.1 * 300                 # gibberish mostly dropped
    assert "quality_score" in kept.columns


def test_bigrams_variant_trains(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(200)
    clf = QualityClassifier.train(docs, _gibberish(spark, 100),
                                  num_features=1 << 14, bigrams=True)
    out = clf.score(docs.limit(5)).select("quality_score").collect()
    assert all(0.0 <= r[0] <= 1.0 for r in out)


def test_save_load_roundtrip(spark, clf, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(20)
    before = [round(r[0], 8) for r in
              clf.score(docs).select("quality_score").collect()]
    clf.save(str(tmp_path / "qc"))
    again = QualityClassifier.load(spark, str(tmp_path / "qc"))
    after = [round(r[0], 8) for r in
             again.score(docs).select("quality_score").collect()]
    assert before == after


def test_composes_into_curation_pipeline(spark, clf):
    from valkey_search_spark.operators.pipeline import (
        CurationConfig, curate_documents,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(300)
    gib = (_gibberish(spark, 100, seed=21)
           .withColumn("doc_id", F.col("doc_id") + 10_000_000)
           .select("doc_id", "text",
                   *[F.lit(None).cast(docs.schema[c].dataType).alias(c)
                     for c in docs.columns if c not in ("doc_id", "text")])
           .select(*docs.columns))
    pool = docs.unionByName(gib)
    cfg = CurationConfig(min_quality=0.0, min_tokens=1,
                         near_dup_threshold=None,
                         quality_model=clf, min_model_quality=0.5)
    clean, funnel = curate_documents(pool, config=cfg)
    ids = {r["doc_id"] for r in clean.select("doc_id").collect()}
    assert sum(1 for i in ids if i >= 10_000_000) < 10   # gibberish gated
    assert sum(1 for i in ids if i < 10_000_000) > 250   # clean survives
    assert "model_quality" in clean.columns
    assert funnel["quality_gate"] < funnel["input"]
    # pareto mode composes too and is deterministic
    cfg2 = CurationConfig(min_quality=0.0, min_tokens=1,
                          near_dup_threshold=None,
                          quality_model=clf, model_pareto=True)
    a, _ = curate_documents(pool, config=cfg2, with_funnel=False)
    b, _ = curate_documents(pool, config=cfg2, with_funnel=False)
    aset = {r["doc_id"] for r in a.select("doc_id").collect()}
    assert aset == {r["doc_id"] for r in b.select("doc_id").collect()}
    with pytest.raises(ValueError, match="quality_model"):
        curate_documents(pool, config=CurationConfig(model_pareto=True))


def test_null_text_scores_null_not_crash(spark, clf):
    df = spark.createDataFrame(
        [(1, "solid normal text here"), (2, None)],
        "doc_id long, text string")
    rows = {r["doc_id"]: r["quality_score"]
            for r in clf.score(df).collect()}
    assert rows[2] is None and rows[1] is not None
    # and the filter drops (never crashes on) the null row
    kept = {r["doc_id"] for r in
            quality_filter(df, clf, key="doc_id").collect()}
    assert 2 not in kept
    # null token-array input takes the same path
    clf2 = QualityClassifier.train(
        spark.createDataFrame([(["good", "tokens"],)], "toks array<string>"),
        spark.createDataFrame([(["qxz", "jvk"],)], "toks array<string>"),
        text_col=None, tokens_col="toks", num_features=1 << 10, max_iter=5)
    out = clf2.score(
        spark.createDataFrame([(["good"],), (None,)], "toks array<string>"),
        text_col=None, tokens_col="toks").collect()
    got = {tuple(r["toks"]) if r["toks"] else None: r["quality_score"]
           for r in out}
    assert got[None] is None and got[("good",)] is not None
