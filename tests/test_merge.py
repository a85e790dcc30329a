"""merge_parquet: upsert/delete parity vs plain recomputation, the
partition-pruned path (untouched partitions carried by link), schema
and duplicate guards, and crash-window recovery."""
from __future__ import annotations

import os
import shutil

import pytest

from pyspark.sql import functions as F

from valkey_search_spark.sources.merge import merge_parquet


def _write_base(spark, path, n=1000):
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text-"), F.col("id")).alias("text"),
        (F.col("id") % 4).cast("int").alias("part"))
    df.write.mode("overwrite").parquet(path)
    return df


def test_upsert_and_delete_parity(spark, tmp_path):
    path = str(tmp_path / "t")
    _write_base(spark, path)
    updates = spark.createDataFrame(
        [(5, "updated-5", 1), (2000, "new-2000", 0)],
        "doc_id long, text string, part int")
    deletes = spark.createDataFrame([(7,), (8,), (4444,)], "doc_id long")

    stats = merge_parquet(spark, path, updates=updates, key="doc_id",
                          deletes=deletes)
    after = {r["doc_id"]: r["text"]
             for r in spark.read.parquet(path).collect()}
    assert stats == {"rows": 999, "upserts": 2, "deletes_requested": 3}
    assert after[5] == "updated-5"
    assert after[2000] == "new-2000"
    assert 7 not in after and 8 not in after
    assert after[6] == "text-6"          # untouched rows intact
    assert len(after) == 1000 - 2 + 1    # -7,-8, +2000
    # .merge/.old siblings are gone
    assert not os.path.exists(path + ".merge")
    assert not os.path.exists(path + ".old")


def test_delete_only_and_update_only(spark, tmp_path):
    path = str(tmp_path / "t2")
    _write_base(spark, path, n=50)
    merge_parquet(spark, path, key="doc_id",
                  deletes=spark.createDataFrame([(1,)], "doc_id long"))
    assert spark.read.parquet(path).count() == 49
    merge_parquet(spark, path, key="doc_id",
                  updates=spark.createDataFrame(
                      [(1, "back", 1)], "doc_id long, text string,"
                                        " part int"))
    assert spark.read.parquet(path).where("doc_id = 1").first()["text"] \
        == "back"


def test_partitioned_merge_prunes_and_carries(spark, tmp_path):
    path = str(tmp_path / "tp")
    base = _write_base(spark, path, n=400)
    base.write.mode("overwrite").partitionBy("part").parquet(path)
    before_files = {
        p: sorted(os.listdir(os.path.join(path, f"part={p}")))
        for p in range(4)}

    updates = spark.createDataFrame(
        [(1, "u1", 1), (999, "u999", 1)],
        "doc_id long, text string, part int")
    stats = merge_parquet(spark, path, updates=updates, key="doc_id",
                          partition_by="part")
    after = spark.read.parquet(path)
    assert stats["rows"] == 401
    assert after.where("doc_id = 1").first()["text"] == "u1"
    assert after.where("doc_id = 999").first()["part"] == 1
    assert after.where("part = 0").count() == 100   # untouched
    # untouched partition files carried byte-identical (same names)
    for p in (0, 2, 3):
        assert sorted(os.listdir(os.path.join(path, f"part={p}"))) \
            == before_files[p]


def test_guards(spark, tmp_path):
    path = str(tmp_path / "tg")
    _write_base(spark, path, n=10)
    with pytest.raises(ValueError, match="nothing to merge"):
        merge_parquet(spark, path)
    with pytest.raises(ValueError, match="schema"):
        merge_parquet(spark, path, updates=spark.createDataFrame(
            [(1, "x")], "doc_id long, text string"))
    dup = spark.createDataFrame(
        [(1, "a", 0), (1, "b", 0)], "doc_id long, text string, part int")
    with pytest.raises(ValueError, match="duplicate"):
        merge_parquet(spark, path, updates=dup)
    with pytest.raises(ValueError, match="partition_by"):
        merge_parquet(spark, path, partition_by="part",
                      deletes=spark.createDataFrame([(1,)], "doc_id long"))


def test_crash_window_recovery(spark, tmp_path):
    # simulate a kill AFTER the sibling is fully written but BEFORE the
    # swap: the original is intact; re-running the merge succeeds
    path = str(tmp_path / "tc")
    _write_base(spark, path, n=100)
    updates = spark.createDataFrame(
        [(1, "u", 0)], "doc_id long, text string, part int")
    # stage a leftover sibling from a dead run
    shutil.copytree(path, path + ".merge")
    merge_parquet(spark, path, updates=updates, key="doc_id")
    assert spark.read.parquet(path).where("doc_id = 1").first()["text"] \
        == "u"
    assert not os.path.exists(path + ".merge")
    # simulate a kill BETWEEN the two renames: path missing, .old intact
    os.rename(path, path + ".old")
    assert spark.read.parquet(path + ".old").count() == 100


def test_key_in_updates_and_deletes_rejected(spark, tmp_path):
    path = str(tmp_path / "tb")
    _write_base(spark, path, n=20)
    up = spark.createDataFrame([(3, "u", 0)],
                               "doc_id long, text string, part int")
    de = spark.createDataFrame([(3,)], "doc_id long")
    with pytest.raises(ValueError, match="BOTH"):
        merge_parquet(spark, path, updates=up, deletes=de)


def test_partitioned_merge_with_hive_escaped_values(spark, tmp_path):
    # partition values containing ':' are percent-escaped in directory
    # names; untouched-partition detection must not resurrect the OLD
    # directory of a touched partition
    path = str(tmp_path / "th")
    df = spark.createDataFrame(
        [(i, f"t{i}", f"2024-01-0{1 + i % 2} 00:00:00")
         for i in range(40)], "doc_id long, text string, day string")
    df.write.partitionBy("day").parquet(path)
    up = spark.createDataFrame(
        [(0, "updated", "2024-01-01 00:00:00")],
        "doc_id long, text string, day string")
    merge_parquet(spark, path, updates=up, key="doc_id",
                  partition_by="day")
    after = spark.read.parquet(path)
    assert after.count() == 40                    # no resurrection
    assert after.where("doc_id = 0").count() == 1  # no duplicate
    assert after.where("doc_id = 0").first()["text"] == "updated"


def test_partition_emptied_by_delete_does_not_resurrect(spark, tmp_path):
    path = str(tmp_path / "te")
    base = _write_base(spark, path, n=40)
    base.write.mode("overwrite").partitionBy("part").parquet(path)
    # delete EVERY row of part=2
    dels = spark.createDataFrame([(i, 2) for i in range(2, 40, 4)],
                                 "doc_id long, part int")
    merge_parquet(spark, path, deletes=dels, key="doc_id",
                  partition_by="part")
    after = spark.read.parquet(path)
    assert after.where("part = 2").count() == 0
    assert after.count() == 30


def test_boolean_partition_emptied_does_not_resurrect(spark, tmp_path):
    # review finding: touched-partition naming used Python str() of the
    # collected value — str(True)='True' but hive writes 'flag=true',
    # so a boolean partition fully emptied by deletes was treated as
    # untouched and hard-linked back (deleted rows resurrected)
    path = str(tmp_path / "tb")
    df = spark.range(20).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text-"), F.col("id")).alias("text"),
        (F.col("id") % 2 == 0).alias("flag"))
    df.write.mode("overwrite").partitionBy("flag").parquet(path)
    dels = spark.createDataFrame([(i, True) for i in range(0, 20, 2)],
                                 "doc_id long, flag boolean")
    merge_parquet(spark, path, deletes=dels, key="doc_id",
                  partition_by="flag")
    after = spark.read.parquet(path)
    assert after.where("flag = true").count() == 0
    assert after.count() == 10
    # the untouched flag=false partition was still carried
    assert after.where("flag = false").count() == 10


def test_null_partition_value_rejected(spark, tmp_path):
    path = str(tmp_path / "tn")
    _write_base(spark, path, n=10)
    up = spark.createDataFrame([(1, "u", None)],
                               "doc_id long, text string, part int")
    with pytest.raises(ValueError, match="null partition"):
        merge_parquet(spark, path, updates=up, partition_by="part")
