"""mine_bitext: planted-alignment recovery, hub rejection (the margin
score's whole point), scalar margin recomputation, mutual-vs-forward
modes."""
from __future__ import annotations

import numpy as np
import pytest

from valkey_search_spark.operators.bitext import mine_bitext


def _aligned_sets(rng, n=60, dim=24, noise=0.05):
    """Two 'languages': same latent vectors + independent noise."""
    base = rng.normal(0, 1, (n, dim))
    src = [(i, [float(x) for x in base[i] + rng.normal(0, noise, dim)])
           for i in range(n)]
    tgt = [(i + 1000, [float(x) for x in base[i]
                       + rng.normal(0, noise, dim)]) for i in range(n)]
    return src, tgt


def test_planted_alignment_recovered(spark):
    rng = np.random.RandomState(3)
    src_rows, tgt_rows = _aligned_sets(rng)
    src = spark.createDataFrame(src_rows,
                                "src_id long, embedding array<double>")
    tgt = spark.createDataFrame(tgt_rows,
                                "tgt_id long, embedding array<double>")
    got = {(r["src_id"], r["tgt_id"])
           for r in mine_bitext(src, tgt, k=4).collect()}
    want = {(i, i + 1000) for i in range(60)}
    # mutual-best + margin threshold: near-perfect recovery
    assert len(got & want) >= 55
    assert not (got - want)            # no false pairs


def test_hub_rejected_where_cosine_floods(spark):
    # a hub vector near the centroid is top-cosine for MANY sources;
    # margin demotes it because its own neighborhood is dense
    rng = np.random.RandomState(7)
    src_rows, tgt_rows = _aligned_sets(rng, n=40, noise=0.02)
    hub = [float(x) for x in np.mean(
        [v for _, v in tgt_rows], axis=0)]
    tgt_rows = tgt_rows + [(9999, hub)]
    src = spark.createDataFrame(src_rows,
                                "src_id long, embedding array<double>")
    tgt = spark.createDataFrame(tgt_rows,
                                "tgt_id long, embedding array<double>")
    pairs = mine_bitext(src, tgt, k=4).collect()
    hub_pairs = [r for r in pairs if r["tgt_id"] == 9999]
    assert not hub_pairs               # the hub wins no mutual margins
    assert len(pairs) >= 35            # true pairs still mined


def test_margin_matches_scalar_recomputation(spark):
    rng = np.random.RandomState(11)
    src_rows, tgt_rows = _aligned_sets(rng, n=20, dim=8, noise=0.3)
    src = spark.createDataFrame(src_rows,
                                "src_id long, embedding array<double>")
    tgt = spark.createDataFrame(tgt_rows,
                                "tgt_id long, embedding array<double>")
    k = 3
    got = {(r["src_id"], r["tgt_id"]): (r["cos"], r["margin"])
           for r in mine_bitext(src, tgt, k=k, min_margin=0.0,
                                mutual=False).collect()}

    def unit(v):
        v = np.asarray(v)
        return v / np.linalg.norm(v)

    S = {i: unit(v) for i, v in src_rows}
    T = {j: unit(v) for j, v in tgt_rows}

    def nn(vec, side, kk):
        sims = sorted((float(vec @ u) for u in side.values()),
                      reverse=True)[:kk]
        return sims

    for (i, j), (cos, margin) in got.items():
        want_cos = float(S[i] @ T[j])
        sden = np.mean(nn(S[i], T, k))
        tden = np.mean(nn(T[j], S, k))
        assert cos == pytest.approx(want_cos, abs=1e-9)
        assert margin == pytest.approx(
            want_cos / (sden / 2 + tden / 2), abs=1e-9), (i, j)


def test_forward_only_keeps_one_per_source(spark):
    rng = np.random.RandomState(5)
    src_rows, tgt_rows = _aligned_sets(rng, n=25)
    src = spark.createDataFrame(src_rows,
                                "src_id long, embedding array<double>")
    tgt = spark.createDataFrame(tgt_rows,
                                "tgt_id long, embedding array<double>")
    fwd = mine_bitext(src, tgt, k=4, mutual=False, min_margin=0.0) \
        .collect()
    ids = [r["src_id"] for r in fwd]
    assert len(ids) == len(set(ids)) == 25


def test_validation(spark):
    df = spark.createDataFrame([(1, [1.0])],
                               "src_id long, embedding array<double>")
    with pytest.raises(ValueError):
        mine_bitext(df, df.withColumnRenamed("src_id", "tgt_id"), k=0)
