"""Plan-shape pins for the r13 `_pin` evaluation guard.

`dedup._pin` relies on `spark_partition_id() >= -1` surviving the
optimizer as a nondeterministic guard: if a future Spark release
learns to fold that comparison (the way Spark 4 already folds
`rand() > c` against rand's known range), every pinned operator
silently regresses to re-running its tokenizer in pushed-down /
inferred filters. These tests pin the mechanism and the two plan
shapes it protects, without executing any job."""
from __future__ import annotations

from pyspark.sql import functions as F


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_pin_survives_the_optimizer(spark):
    from valkey_search_spark.operators.dedup import _pin

    df = spark.range(3).select(
        _pin(F.upper(F.col("id").cast("string"))).alias("u"))
    plan = _optimized(df)
    # the always-true guard must still be there — constant-folding it
    # away would re-enable CollapseProject/pushdown duplication
    assert "SPARK_PARTITION_ID" in plan, plan


def test_bm25_plan_tokenizes_once(spark, sf_dir):
    from valkey_search_spark.operators.ranking import bm25_rank

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _physical(bm25_rank(docs, ["merge", "window"])
                     .select("doc_id", "bm25_score"))
    head = plan.split("InMemoryRelation")[0]   # cached lineage echoes
    assert head.count("regexp_extract_all") == 1, head


def test_gram_windows_filter_stays_on_the_attribute(spark, sf_dir):
    """The posexplode's inferred size/isnotnull filter must evaluate
    the staged __toks ATTRIBUTE, not an inlined tokenizer copy below
    the staging projection (one tokenizer occurrence per corpus side)."""
    from valkey_search_spark.operators.contamination import (
        ngram_decontaminate,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.where(F.col("doc_id") % 20 == 0).select("doc_id", "text")
    plan = _physical(ngram_decontaminate(docs, bench, n=13))
    head = plan.split("InMemoryRelation")[0]
    assert head.count("regexp_extract_all") == 2, head  # 1 per side


def test_staged_tokens_no_barrier_exchange_before_persist(spark, sf_dir):
    """minhash stages tokens straight into its persisted base: the
    historical token-array repartition before the persist is gone
    (one full-corpus exchange removed; r13)."""
    from valkey_search_spark.operators import dedup as dd

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = dd.minhash_lsh_pairs(docs, "doc_id", threshold=0.7)
    plan = _physical(out)
    # the cached base subtree must not contain a REPARTITION exchange
    cached = plan.split("InMemoryRelation", 1)
    assert len(cached) == 2, plan
    base_sub = cached[1].split("InMemoryRelation")[0]
    assert "REPARTITION_BY_NUM" not in base_sub, base_sub
    dd.release(out, blocking=True)


def test_split_sentences_filter_not_inlined(spark, sf_dir):
    from valkey_search_spark.operators.textops import split_sentences

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _physical(split_sentences(docs))
    # exactly one copy of the splitter regex chain: the staged
    # projection; the generate-inferred filter reads the attribute
    assert plan.count("(?<=[.!?]") == 1, plan
