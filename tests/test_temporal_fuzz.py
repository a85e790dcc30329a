"""Randomized parity: asof_join vs pandas.merge_asof (an independent
second implementation), interval_join vs a scalar recomputation, and
chunk_documents coverage invariants over random shapes."""
from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from valkey_search_spark.operators.chunking import chunk_documents
from valkey_search_spark.operators.temporal import asof_join, interval_join


def _rand_frames(seed, n_left=120, n_right=40, n_keys=5):
    rng = np.random.RandomState(seed)
    left = pd.DataFrame({
        "lid": np.arange(n_left),
        "ts": rng.uniform(0, 1000, n_left).round(3),
        "k": rng.randint(0, n_keys, n_left),
    })
    right = pd.DataFrame({
        "rv": np.arange(n_right) + 1000,
        "ts": rng.uniform(0, 1000, n_right).round(3),
        "k": rng.randint(0, n_keys, n_right),
    })
    # merge_asof forbids duplicate (k, ts) ambiguity only on exact ties
    # across frames in rare cases; deduplicate ts per key on the right
    right = right.drop_duplicates(["k", "ts"])
    return left, right


@pytest.mark.parametrize("seed", [0, 1, 2, 7])
@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_matches_pandas_merge_asof(spark, seed, direction):
    lpd, rpd = _rand_frames(seed)
    left = spark.createDataFrame(lpd)
    right = spark.createDataFrame(rpd)
    got = {r["lid"]: r["r_rv"] for r in
           asof_join(left, right, on="ts", by="k",
                     direction=direction).collect()}
    want_df = pd.merge_asof(
        lpd.sort_values("ts"), rpd.sort_values("ts"),
        on="ts", by="k", direction=direction, suffixes=("", "_r"))
    want = {int(r.lid): (None if pd.isna(r.rv) else int(r.rv))
            for r in want_df.itertuples()}
    assert got == want


@pytest.mark.parametrize("seed", [3, 11])
def test_asof_tolerance_matches_pandas(spark, seed):
    lpd, rpd = _rand_frames(seed)
    left = spark.createDataFrame(lpd)
    right = spark.createDataFrame(rpd)
    got = {r["lid"]: r["r_rv"] for r in
           asof_join(left, right, on="ts", by="k",
                     tolerance="50 seconds").collect()}
    want_df = pd.merge_asof(
        lpd.sort_values("ts"), rpd.sort_values("ts"),
        on="ts", by="k", direction="backward", tolerance=50.0,
        suffixes=("", "_r"))
    want = {int(r.lid): (None if pd.isna(r.rv) else int(r.rv))
            for r in want_df.itertuples()}
    assert got == want


@pytest.mark.parametrize("seed", [5, 13])
def test_interval_join_matches_scalar(spark, seed):
    rng = np.random.RandomState(seed)
    pts = pd.DataFrame({"pid": np.arange(200),
                        "ts": rng.uniform(0, 5000, 200).round(2),
                        "k": rng.randint(0, 3, 200)})
    s = rng.uniform(0, 5000, 30).round(2)
    iv = pd.DataFrame({"ivid": np.arange(30), "start": s,
                       "end": (s + rng.uniform(1, 800, 30)).round(2),
                       "k": rng.randint(0, 3, 30)})
    got = {(r["pid"], r["ivid"]) for r in
           interval_join(spark.createDataFrame(pts),
                         spark.createDataFrame(iv),
                         by="k", bin_width=100).collect()}
    want = {(int(p.pid), int(i.ivid))
            for p in pts.itertuples() for i in iv.itertuples()
            if p.k == i.k and i.start <= p.ts < i.end}
    assert got == want


@pytest.mark.parametrize("seed", [0, 4])
@pytest.mark.parametrize("chunk_tokens,overlap", [(16, 0), (16, 5), (5, 4)])
def test_chunk_invariants_random_lengths(spark, seed, chunk_tokens,
                                         overlap):
    rng = np.random.RandomState(seed)
    rows = [(i, " ".join(f"t{i}_{j}" for j in range(int(n))))
            for i, n in enumerate(rng.randint(1, 60, size=40))]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(df, chunk_tokens=chunk_tokens,
                          overlap=overlap).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == {i for i, _ in rows}
    for (i, text), _ in zip(rows, range(len(rows))):
        toks = text.split()
        chunks = sorted(by_doc[i], key=lambda r: r["chunk_idx"])
        covered: set[int] = set()
        for r in chunks:
            span = set(range(r["token_start"],
                             r["token_start"] + r["chunk_tokens_n"]))
            assert span - covered        # no fully-redundant chunk
            covered |= span
            assert r["chunk_text"] == " ".join(
                toks[r["token_start"]:r["token_start"]
                     + r["chunk_tokens_n"]])
        assert covered == set(range(len(toks)))   # full coverage
