"""Parquet compaction: sizing from the listing only, crash-safe swap,
row preservation, no-op guards."""
from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from valkey_search_spark.sources.compaction import (compact_parquet,
                                                    parquet_file_stats)


def _write_slivers(spark, path, n_files=64, rows=2000):
    df = spark.range(rows).select(
        F.col("id"), (F.col("id") % 7).alias("v"),
        F.repeat(F.lit("x"), 200).alias("pad"))
    df.repartition(n_files).write.parquet(path)


def test_stats_from_listing_only(spark, tmp_path):
    p = str(tmp_path / "t")
    _write_slivers(spark, p, n_files=16)
    st = parquet_file_stats(spark, p)
    assert st["files"] == 16
    assert st["bytes"] == sum(
        os.path.getsize(f) for f in glob.glob(f"{p}/*.parquet"))
    assert 0 < st["smallest"] <= st["largest"]


def test_compacts_and_preserves_rows(spark, tmp_path):
    p = str(tmp_path / "t")
    _write_slivers(spark, p, n_files=64, rows=5000)
    before = spark.read.parquet(p)
    want = sorted((r.id, r.v) for r in before.select("id", "v").collect())
    res = compact_parquet(spark, p, target_file_mb=128)
    assert res["compacted"] and res["files_after"] < res["files"]
    assert res["files_after"] == 1          # tiny table -> one file
    assert res["rows"] == 5000
    got = sorted((r.id, r.v) for r in
                 spark.read.parquet(p).select("id", "v").collect())
    assert got == want
    assert not os.path.exists(p + ".old")
    assert not os.path.exists(p + ".compact")


def test_noop_when_already_compact(spark, tmp_path):
    p = str(tmp_path / "t")
    _write_slivers(spark, p, n_files=1)
    files = set(glob.glob(f"{p}/*.parquet"))
    res = compact_parquet(spark, p)
    assert not res["compacted"]
    assert set(glob.glob(f"{p}/*.parquet")) == files   # untouched


def test_noop_when_target_would_not_reduce(spark, tmp_path):
    # a target small enough that the rewrite would produce at least as
    # many files as exist now must refuse (compaction only shrinks)
    p = str(tmp_path / "t")
    _write_slivers(spark, p, n_files=4, rows=50_000)
    st = parquet_file_stats(spark, p)
    tiny_mb = max(st["bytes"] // 8, 1) / (1 << 20)   # -> ~8 files
    res = compact_parquet(spark, p, target_file_mb=tiny_mb)
    assert not res["compacted"] and res["files_after"] == 4


def test_crash_window_recovers(spark, tmp_path):
    # a leftover .compact sibling from a killed run must not poison
    # the next compaction
    p = str(tmp_path / "t")
    _write_slivers(spark, p, n_files=8)
    os.makedirs(p + ".compact")
    open(p + ".compact/garbage", "w").write("junk")
    res = compact_parquet(spark, p, target_file_mb=128)
    assert res["compacted"] and res["files_after"] == 1
    assert spark.read.parquet(p).count() == 2000


def test_partitioned_table_layout_survives(spark, tmp_path):
    p = str(tmp_path / "t")
    df = spark.range(4000).select(
        F.col("id"), (F.col("id") % 3).alias("part"),
        F.repeat(F.lit("y"), 100).alias("pad"))
    df.repartition(16).write.partitionBy("part").parquet(p)
    before = sorted((r.id, r.part) for r in
                    spark.read.parquet(p).select("id", "part").collect())
    res = compact_parquet(spark, p, target_file_mb=128)
    assert res["compacted"] and res["partitions"] == 3
    # hive dirs intact -> pruning + later partitioned MERGE still work
    dirs = sorted(e for e in os.listdir(p) if e.startswith("part="))
    assert dirs == ["part=0", "part=1", "part=2"]
    for d in dirs:
        assert len(glob.glob(f"{p}/{d}/*.parquet")) == 1
    after = sorted((r.id, r.part) for r in
                   spark.read.parquet(p).select("id", "part").collect())
    assert after == before


def test_empty_and_float_target_edges(spark, tmp_path):
    p = str(tmp_path / "empty")
    os.makedirs(p)
    open(f"{p}/_SUCCESS", "w").close()
    res = compact_parquet(spark, p)            # zero files: clean no-op
    assert not res["compacted"] and res["files_after"] == 0
    assert res["rows"] is None
    q = str(tmp_path / "t")
    _write_slivers(spark, q, n_files=8)
    res = compact_parquet(spark, q, target_file_mb=0.5)  # float target
    assert res["compacted"] and res["files_after"] >= 1
