"""Sequence packing: budget respected, all docs assigned, oversized docs
isolated, first-fit-decreasing efficiency."""

from pyspark.sql import functions as F

from valkey_search_spark.operators.packing import pack_documents
from valkey_search_spark.operators.textops import token_count_col

SF = "/root/testdata/sf0.001"


def _packed(spark, max_tokens=64):
    docs = (spark.read.parquet(f"{SF}/documents.parquet")
            .withColumn("token_count", token_count_col(F.col("text"))))
    return pack_documents(docs, max_tokens=max_tokens), docs


def test_budget_respected_and_all_assigned(spark):
    out, docs = _packed(spark, max_tokens=64)
    rows = out.select("doc_id", "token_count", "pack_id", "pack_tokens").collect()
    assert len(rows) == docs.count()
    by_pack = {}
    for r in rows:
        by_pack.setdefault(r["pack_id"], []).append(r)
    for pk, members in by_pack.items():
        total = sum(r["token_count"] for r in members)
        assert all(r["pack_tokens"] == total for r in members)
        if len(members) > 1:
            assert total <= 64              # only oversized docs overflow
    # oversized docs sit alone
    for r in rows:
        if r["token_count"] > 64:
            assert len(by_pack[r["pack_id"]]) == 1


def test_packing_efficiency(spark):
    """First-fit-decreasing should fill packs reasonably densely: average
    multi-doc pack utilization above 75 % of the budget."""
    out, _ = _packed(spark, max_tokens=64)
    stats = (out.groupBy("pack_id")
             .agg(F.sum("token_count").alias("t"), F.count("*").alias("n"))
             .where("n > 1").agg(F.avg("t")).first()[0])
    assert stats is None or stats >= 0.75 * 64


def test_no_shuffle_in_plan(spark):
    out, _ = _packed(spark)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan           # packing never shuffles
