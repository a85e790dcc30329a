"""sources/swap.py — the shared crash-safe sibling-swap helper."""

from __future__ import annotations

import os

import pytest

from valkey_search_spark.sources.swap import require_local_path, sibling_swap


def test_swap_replaces_and_cleans(tmp_path):
    live = tmp_path / "table"
    live.mkdir()
    (live / "a.parquet").write_text("old")
    sib = tmp_path / "table.compact"
    sib.mkdir()
    (sib / "b.parquet").write_text("new")
    sibling_swap(str(live), str(sib))
    assert (live / "b.parquet").read_text() == "new"
    assert not (live / "a.parquet").exists()
    assert not sib.exists()
    assert not (tmp_path / "table.old").exists()


def test_swap_clears_stale_old_dir(tmp_path):
    # a crash after rename-to-.old leaves <path>.old behind; the next
    # swap must not trip over it
    live = tmp_path / "t"
    live.mkdir()
    (live / "x").write_text("live")
    stale = tmp_path / "t.old"
    stale.mkdir()
    (stale / "junk").write_text("stale")
    sib = tmp_path / "t.new"
    sib.mkdir()
    (sib / "y").write_text("new")
    sibling_swap(str(live), str(sib))
    assert (live / "y").exists()
    assert not stale.exists()


def test_require_local_path_contract():
    assert require_local_path("/tmp/x") == "/tmp/x"
    assert require_local_path("file:///tmp/x") == "/tmp/x"
    assert require_local_path("relative/dir") == "relative/dir"
    for bad in ("s3a://bucket/k", "hdfs://nn/path", "s3://b/k",
                "abfss://c@a/p"):
        with pytest.raises(ValueError, match="crash-safe sibling-swap"):
            require_local_path(bad)


def test_index_builders_reject_remote_paths(spark):
    from valkey_search_spark.operators.ann import IVFIndex
    from valkey_search_spark.operators.hnsw import HNSWIndex

    df = spark.createDataFrame([(1, [1.0, 0.0])],
                               "vec_id int, embedding array<float>")
    with pytest.raises(ValueError, match="IVFIndex artifacts"):
        IVFIndex.build(df, "s3a://bucket/idx")
    with pytest.raises(ValueError, match="HNSWIndex artifacts"):
        HNSWIndex.build(df, "hdfs://nn/idx")
    with pytest.raises(ValueError, match="HNSWIndex artifacts"):
        HNSWIndex.load(spark, "s3://b/idx")


def test_trailing_slash_paths(tmp_path):
    live = tmp_path / "d"
    live.mkdir()
    (live / "f").write_text("1")
    sib = tmp_path / "d.merge"
    sib.mkdir()
    (sib / "g").write_text("2")
    sibling_swap(str(live) + "/", str(sib))
    assert (live / "g").exists()
    assert os.listdir(live) == ["g"]


def test_single_slash_file_uri():
    # Hadoop/Spark emit file:/path (no authority) — must normalize,
    # not pass through as a bogus relative path
    assert require_local_path("file:/tmp/x") == "/tmp/x"
    assert require_local_path("FILE:/tmp/y") == "/tmp/y"
