"""Z-order layout: scalar Morton reference, timestamp handling, and
the file-concentration property that makes the clustering worth a
shuffle — a box query on EITHER dimension touches few files of a
z-ordered write but nearly all files of a round-robin write."""
from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from valkey_search_spark.sources.layout import (column_ranges, write_zordered,
                                                zorder_expr)


def _morton_scalar(vals, ranges, bits):
    """Independent reference: normalize each value to bits-bit fixed
    point, interleave bit i of column j at position i*n+j."""
    n = len(vals)
    z = 0
    for j, (v, (lo, hi)) in enumerate(zip(vals, ranges)):
        if v is None:
            cell = 0
        else:
            span = hi - lo
            frac = (v - lo) / span if span > 0 else 0.0
            # Spark's round() = HALF_UP on doubles
            import decimal
            cell = int(decimal.Decimal(frac * ((1 << bits) - 1))
                       .quantize(0, rounding=decimal.ROUND_HALF_UP))
            cell = min(max(cell, 0), (1 << bits) - 1)
        for i in range(bits):
            z |= ((cell >> i) & 1) << (i * n + j)
    return z


def test_zorder_expr_matches_scalar(spark):
    rng = np.random.RandomState(8)
    rows = [(float(a), int(b)) for a, b in
            zip(rng.uniform(-5, 5, 200), rng.randint(0, 1000, 200))]
    rows += [(None, 5)]
    df = spark.createDataFrame(rows, "x double, y long")
    stats = column_ranges(df, ["x", "y"])
    got = [r["z"] for r in df.select(
        zorder_expr(df, ["x", "y"], bits=8, stats=stats).alias("z"))
        .collect()]
    ranges = [stats["x"], stats["y"]]
    for (x, y), z in zip(rows, got):
        assert z == _morton_scalar([x, y], ranges, 8), (x, y)


def test_zorder_timestamp_column(spark, sf_dir):
    from tests.conftest import load

    ev = load(spark, sf_dir, "events").limit(500)
    stats = column_ranges(ev, ["ts", "value"])
    zs = [r["z"] for r in ev.select(
        zorder_expr(ev, ["ts", "value"], bits=10, stats=stats)
        .alias("z")).collect()]
    assert all(isinstance(z, int) and z >= 0 for z in zs)
    assert len(set(zs)) > 100     # real spread, not collapsed cells


def test_box_query_file_concentration(spark, tmp_path):
    # uniform 2-D grid: a small box on either single dimension must
    # touch FEW z-ordered files; a round-robin layout spreads every
    # value range over every file
    rng = np.random.RandomState(3)
    rows = [(float(x), float(y), i) for i, (x, y) in
            enumerate(zip(rng.uniform(0, 100, 20000),
                          rng.uniform(0, 100, 20000)))]
    df = spark.createDataFrame(rows, "x double, y double, id long")
    zpath = str(tmp_path / "z")
    rpath = str(tmp_path / "rr")
    write_zordered(df, zpath, ["x", "y"], n_files=16, bits=10)
    df.repartition(16).write.parquet(rpath)

    zdf = spark.read.parquet(zpath)
    rdf = spark.read.parquet(rpath)
    pred = (F.col("x") >= 10) & (F.col("x") < 20) \
        & (F.col("y") >= 40) & (F.col("y") < 50)
    want = sorted(r["id"] for r in df.where(pred).collect())
    got = sorted(r["id"] for r in zdf.where(pred).collect())
    assert got == want                       # clustering loses nothing

    def files_touched(frame):
        return frame.where(pred) \
            .select(F.input_file_name().alias("f")).distinct().count()

    z_files, r_files = files_touched(zdf), files_touched(rdf)
    assert r_files >= 14                     # round-robin: everywhere
    assert z_files <= 4, (z_files, r_files)  # z-order: concentrated

    # one-dimensional range on the SECOND column also concentrates
    pred_y = (F.col("y") >= 0) & (F.col("y") < 8)
    zy = zdf.where(pred_y).select(F.input_file_name().alias("f")) \
        .distinct().count()
    ry = rdf.where(pred_y).select(F.input_file_name().alias("f")) \
        .distinct().count()
    assert zy < ry


def test_write_returns_reusable_stats(spark, tmp_path):
    df = spark.createDataFrame([(i, i * 2.0) for i in range(100)],
                               "a long, b double")
    stats = write_zordered(df, str(tmp_path / "p"), ["a", "b"],
                           n_files=2)
    assert stats["a"] == (0, 99) and stats["b"] == (0.0, 198.0)
    back = spark.read.parquet(str(tmp_path / "p"))
    assert back.count() == 100
    assert set(back.columns) == {"a", "b"}   # __z dropped


def test_validation(spark):
    df = spark.createDataFrame([(1, 2)], "a long, b long")
    with pytest.raises(ValueError):
        zorder_expr(df, [], bits=8)
    with pytest.raises(ValueError):
        zorder_expr(df, ["a", "b"], bits=32)   # 64 bits > 63


def test_string_column_rejected_up_front(spark):
    df = spark.createDataFrame([("us", 1.0)], "country string, v double")
    with pytest.raises(ValueError, match="country"):
        zorder_expr(df, ["country", "v"], bits=8)
    with pytest.raises(ValueError, match="no such column"):
        column_ranges(df, ["nope"])
