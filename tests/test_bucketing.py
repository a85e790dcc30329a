"""Bucketed corpus storage: the plans are the product — every promise
('no Exchange on the bucketed side') is pinned on the executed plan."""
from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tests.conftest import load
from valkey_search_spark.sources.bucketing import (
    is_bucketed,
    read_bucketed,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("buckets")
    docs = load(spark, sf_dir, "documents")
    for t in ("t_docs_a", "t_docs_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        write_bucketed(docs, t, "doc_id", n_buckets=8,
                       path=str(base / t))
    yield "t_docs_a", "t_docs_b"
    for t in ("t_docs_a", "t_docs_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_round_trip_content(spark, sf_dir, bucketed):
    a, _ = bucketed
    docs = load(spark, sf_dir, "documents")
    got = read_bucketed(spark, a)
    assert got.count() == docs.count()
    assert (got.agg(F.sum("doc_id")).collect()[0][0]
            == docs.agg(F.sum("doc_id")).collect()[0][0])


def test_is_bucketed(spark, bucketed):
    a, _ = bucketed
    assert is_bucketed(spark, a, "doc_id")
    assert not is_bucketed(spark, a, "text")
    assert not is_bucketed(spark, "no_such_table_xyz", "doc_id")


def test_same_key_join_has_no_exchange(spark, bucketed):
    a, b = bucketed
    left, right = read_bucketed(spark, a), read_bucketed(spark, b)
    with _no_broadcast(spark):
        j = left.join(right.select("doc_id",
                                   F.col("n_chars").alias("n2")), "doc_id")
        plan = _plan(j)
    assert "Exchange" not in plan, plan


def test_groupby_on_bucket_key_has_no_exchange(spark, bucketed):
    a, _ = bucketed
    df = read_bucketed(spark, a)
    plan = _plan(df.groupBy("doc_id").agg(F.sum("n_chars")))
    assert "Exchange" not in plan, plan


def test_unbucketed_side_shuffles_alone(spark, sf_dir, bucketed):
    # one Exchange (the plain side), not two: the bucketed side's
    # write-time shuffle is amortized across every later join
    a, _ = bucketed
    left = read_bucketed(spark, a)
    plain = load(spark, sf_dir, "documents").select(
        "doc_id", F.col("n_chars").alias("n2"))
    with _no_broadcast(spark):
        plan = _plan(left.join(plain, "doc_id"))
    assert plan.count("Exchange") == 1, plan


def test_join_result_matches_unbucketed(spark, sf_dir, bucketed):
    a, b = bucketed
    with _no_broadcast(spark):
        got = (read_bucketed(spark, a)
               .join(read_bucketed(spark, b)
                     .select("doc_id", F.col("n_chars").alias("n2")),
                     "doc_id")
               .agg(F.count(F.lit(1)), F.sum(F.col("n_chars") + F.col("n2")))
               .collect()[0])
    docs = load(spark, sf_dir, "documents")
    want = (docs.join(docs.select("doc_id",
                                  F.col("n_chars").alias("n2")), "doc_id")
            .agg(F.count(F.lit(1)), F.sum(F.col("n_chars") + F.col("n2")))
            .collect()[0])
    assert tuple(got) == tuple(want)


class _no_broadcast:
    """Force sort-merge joins so the Exchange assertions test bucketing,
    not broadcast elision."""

    def __init__(self, spark):
        self.spark = spark

    def __enter__(self):
        self.old = self.spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        self.spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def __exit__(self, *a):
        self.spark.conf.set("spark.sql.autoBroadcastJoinThreshold", self.old)


def test_is_bucketed_exact_names_only(spark, bucketed):
    a, _ = bucketed
    # substring of the real column must NOT match (review finding)
    assert not is_bucketed(spark, a, "id")
    assert not is_bucketed(spark, a, "doc")
    assert not is_bucketed(spark, a, ["doc_id", "text"])
    assert is_bucketed(spark, a, ["doc_id"])
