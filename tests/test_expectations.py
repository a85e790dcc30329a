"""check_expectations / psi_drift vs DuckDB recomputation on the real
tables, plus hand-built pass/fail and drift cases."""
from __future__ import annotations

import math

import duckdb
import pytest

from pyspark.sql import functions as F

from valkey_search_spark.operators.expectations import (Expect,
                                                        check_expectations,
                                                        psi_drift)


def test_expectations_on_real_table(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    res = {r["name"]: r for r in check_expectations(docs, [
        Expect("null_fraction", "text", max_null_fraction=0.0),
        Expect("unique", "doc_id"),
        Expect("bounds", "n_chars", lo=0, hi=10_000_000),
        Expect("in_set", "lang",
               allowed=["en", "de", "fr", "es", "zz"]),
        Expect("row_count", min_rows=1),
    ]).collect()}

    want = duckdb.sql(f"""
        SELECT sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END),
               count(doc_id) - count(DISTINCT doc_id),
               sum(CASE WHEN n_chars < 0 OR n_chars > 10000000
                   THEN 1 ELSE 0 END),
               sum(CASE WHEN lang NOT IN ('en','de','fr','es','zz')
                   THEN 1 ELSE 0 END),
               count(*)
        FROM '{sf_dir}/documents.parquet'
    """).fetchone()
    n = want[4]
    assert res["null_fraction(text)"]["observed"] == want[0] / n
    assert res["unique(doc_id)"]["observed"] == float(want[1])
    assert res["bounds(n_chars)"]["observed"] == float(want[2] or 0)
    assert res["in_set(lang)"]["observed"] == float(want[3] or 0)
    assert res["row_count(*)"]["observed"] == float(n)
    assert res["unique(doc_id)"]["passed"]
    assert res["row_count(*)"]["passed"]


def test_expectations_fail_modes(spark):
    df = spark.createDataFrame(
        [(1, "a", 5.0), (1, "b", -2.0), (2, None, 50.0)],
        "id int, s string, v double")
    res = {r["name"]: r for r in check_expectations(df, [
        Expect("unique", "id"),
        Expect("null_fraction", "s", max_null_fraction=0.2),
        Expect("bounds", "v", lo=0.0, hi=10.0),
        Expect("in_set", "s", allowed=["a"]),
        Expect("row_count", min_rows=5),
        Expect("row_count", max_rows=2, name="max_rows"),
    ]).collect()}
    assert not res["unique(id)"]["passed"]
    assert res["unique(id)"]["observed"] == 1.0       # one duplicate
    assert not res["null_fraction(s)"]["passed"]      # 1/3 > 0.2
    assert res["null_fraction(s)"]["observed"] == pytest.approx(1 / 3)
    assert not res["bounds(v)"]["passed"]
    assert res["bounds(v)"]["observed"] == 2.0        # -2 and 50
    assert not res["in_set(s)"]["passed"]             # 'b' (null ignored)
    assert res["in_set(s)"]["observed"] == 1.0
    assert not res["row_count(*)"]["passed"]
    assert not res["max_rows"]["passed"]


def test_expectations_one_pass_regardless_of_check_count(spark, sf_dir):
    # the job count (AQE may split one action into a few) must NOT grow
    # with the number of checks — no per-check scans
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tracker = spark.sparkContext.statusTracker()
    sc = spark.sparkContext

    # count within a DEDICATED job group: the global job list races
    # with background activity from the shared test session (draining
    # streaming queries, cleaner work), which made this assertion
    # order-dependent
    def jobs(fn, tag):
        sc.setJobGroup(tag, tag)
        try:
            fn()
        finally:
            sc.setLocalProperty("spark.jobGroup.id", None)
        return len(tracker.getJobIdsForGroup(tag) or [])

    few = jobs(lambda: check_expectations(docs, [
        Expect("null_fraction", "text")]), "exp-few")
    many = jobs(lambda: check_expectations(docs, [
        Expect("null_fraction", "text"),
        Expect("unique", "doc_id"),
        Expect("bounds", "n_chars", lo=0),
        Expect("in_set", "lang", allowed=["en"]),
        Expect("row_count", min_rows=1),
        Expect("unique", "text"),
    ]), "exp-many")
    assert many <= few + 1, (few, many)


def test_psi_zero_on_identical_and_detects_shift(spark):
    rows = [(float(i % 100), ["x", "y", "z"][i % 3]) for i in range(3000)]
    base = spark.createDataFrame(rows, "v double, c string")
    same = psi_drift(base, base, ["v", "c"]).collect()
    for r in same:
        assert r["psi"] == pytest.approx(0.0, abs=1e-9), r

    # shifted numeric + re-weighted categorical
    shifted = spark.createDataFrame(
        [(v + 50.0, ("x" if i % 10 else "y")) for i, (v, _) in
         enumerate(rows)], "v double, c string")
    drift = {r["column"]: r["psi"]
             for r in psi_drift(base, shifted, ["v", "c"]).collect()}
    assert drift["v"] > 0.25
    assert drift["c"] > 0.25


def test_psi_matches_scalar_recomputation(spark):
    import numpy as np
    rng = np.random.RandomState(5)
    b_vals = rng.normal(0, 1, 2000).round(4)
    c_vals = rng.normal(0.4, 1.2, 1500).round(4)
    base = spark.createDataFrame([(float(v),) for v in b_vals], "v double")
    cur = spark.createDataFrame([(float(v),) for v in c_vals], "v double")
    [r] = psi_drift(base, cur, ["v"], n_bins=10).collect()

    edges = sorted(set(base.approxQuantile(
        "v", [i / 10 for i in range(1, 10)], 0.001)))

    def bin_of(v):
        for i, e in enumerate(edges):
            if v <= e:
                return i
        return len(edges)

    from collections import Counter
    cb, cc = Counter(map(bin_of, b_vals)), Counter(map(bin_of, c_vals))
    bins = set(cb) | set(cc)
    eps = 1e-6
    want = sum((max(cc[b] / len(c_vals), eps) - max(cb[b] / len(b_vals), eps))
               * math.log(max(cc[b] / len(c_vals), eps)
                          / max(cb[b] / len(b_vals), eps))
               for b in bins)
    assert r["psi"] == pytest.approx(want, rel=1e-9)


def test_validation(spark):
    df = spark.createDataFrame([(1,)], "id int")
    with pytest.raises(ValueError):
        check_expectations(df, [])
    with pytest.raises(ValueError):
        Expect("nope", "id")
    with pytest.raises(ValueError):
        Expect("bounds", "id")
    with pytest.raises(ValueError):
        Expect("null_fraction")
    with pytest.raises(ValueError):
        psi_drift(df, df, [])
    with pytest.raises(ValueError):
        psi_drift(df, df, ["missing"])


def test_psi_categorical_cardinality_capped(spark):
    # a high-cardinality string column buckets to top max_categories +
    # __OTHER__ — the driver never sees one row per distinct value
    base = spark.createDataFrame(
        [(f"url-{i % 7}",) for i in range(700)]
        + [(f"rare-{i}",) for i in range(300)], "u string")
    cur = spark.createDataFrame(
        [(f"url-{i % 7}",) for i in range(300)]
        + [(f"rare-{i + 9000}",) for i in range(700)], "u string")
    [r] = psi_drift(base, cur, ["u"], max_categories=7).collect()
    assert r["n_bins_used"] <= 8        # 7 tops + __OTHER__
    assert r["psi"] > 0.25              # mass moved into the tail
