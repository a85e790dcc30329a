"""Embedding PCA: pinned against numpy SVD (distance-matrix parity —
components are sign/rotation ambiguous, distances are not), isometry on
low-rank data, centering for cosine, whitening variance, the JVM plan
pin, the Arrow fallback, persistence, and IVF composition."""
from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from valkey_search_spark.functions.pca import EmbeddingPCA, train_pca

rng = np.random.default_rng(99)


def _lowrank(n=400, d=16, r=4):
    """Data lying (almost) in an r-dim affine subspace of R^d."""
    latent = rng.normal(size=(n, r)) * (10.0 * 0.6 ** np.arange(r))
    basis = np.linalg.qr(rng.normal(size=(d, r)))[0]
    return (latent @ basis.T + rng.normal(5.0, 0.01, size=(n, d))
            ).astype(np.float32)


def _df(spark, x):
    return spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "id long, embedding array<float>")


def _numpy_pca_proj(x, k):
    mu = x.mean(axis=0)
    xc = x.astype(np.float64) - mu
    _, _, vt = np.linalg.svd(xc, full_matrices=False)
    return xc @ vt[:k].T


@pytest.fixture(scope="module")
def fitted(spark):
    x = _lowrank()
    pca = train_pca(_df(spark, x), k=4)
    proj = {r["id"]: np.asarray(r["embedding_pca"])
            for r in pca.transform(_df(spark, x)).collect()}
    return x, pca, proj


def test_projection_matches_numpy_svd_distances(fitted):
    x, _, proj = fitted
    want = _numpy_pca_proj(x, 4)
    got = np.stack([proj[i] for i in range(len(x))])
    # distances, not raw coordinates: components are sign-ambiguous
    idx = rng.integers(0, len(x), size=(60, 2))
    for a, b in idx:
        dw = np.linalg.norm(want[a] - want[b])
        dg = np.linalg.norm(got[a] - got[b])
        assert dg == pytest.approx(dw, rel=1e-3, abs=1e-3)


def test_lowrank_isometry(fitted):
    # data lies in a 4-dim subspace: 4-dim PCA preserves pairwise L2
    x, _, proj = fitted
    idx = rng.integers(0, len(x), size=(40, 2))
    for a, b in idx:
        orig = np.linalg.norm(x[a].astype(np.float64) - x[b])
        red = np.linalg.norm(proj[a] - proj[b])
        assert red == pytest.approx(orig, rel=0.02, abs=0.05)


def test_centering_for_cosine(fitted):
    # mean-offset folded in: projections are centered (sum ~ 0), which
    # raw MLlib transform does NOT give you
    _, _, proj = fitted
    mean_proj = np.mean(np.stack(list(proj.values())), axis=0)
    assert np.abs(mean_proj).max() < 0.05


def test_explained_variance_ordered_and_whitening(spark):
    x = _lowrank()
    pca = train_pca(_df(spark, x), k=4, whiten=True)
    ev = pca.explained_variance
    assert all(ev[i] >= ev[i + 1] for i in range(len(ev) - 1))
    rows = pca.transform(_df(spark, x)).collect()
    mat = np.stack([np.asarray(r["embedding_pca"]) for r in rows])
    v = mat.var(axis=0, ddof=1)
    assert np.allclose(v, 1.0, atol=0.15)


def test_transform_plan_is_jvm_and_shuffle_free(spark, fitted):
    x, pca, _ = fitted
    plan = (pca.transform(_df(spark, x))
            ._jdf.queryExecution().executedPlan().toString())
    assert "EvalPython" not in plan
    assert "Exchange" not in plan


def test_arrow_fallback_matches_jvm_path(spark, fitted):
    x, pca, proj = fitted
    small_budget = type(pca)._JVM_LITERAL_BUDGET
    try:
        type(pca)._JVM_LITERAL_BUDGET = 1      # force the Arrow path
        rows = pca.transform(_df(spark, x)).collect()
    finally:
        type(pca)._JVM_LITERAL_BUDGET = small_budget
    for r in rows:
        assert np.allclose(np.asarray(r["embedding_pca"]), proj[r["id"]],
                           atol=1e-4)


def test_save_load_round_trip(tmp_path, spark, fitted):
    x, pca, proj = fitted
    p = str(tmp_path / "pca")
    pca.save(p)
    again = EmbeddingPCA.load(p)
    rows = again.transform(_df(spark, x)).limit(20).collect()
    for r in rows:
        assert np.allclose(np.asarray(r["embedding_pca"]), proj[r["id"]],
                           atol=1e-5)
    with pytest.raises((ValueError, FileNotFoundError)):
        EmbeddingPCA.load(str(tmp_path / "nope"))


def test_k_bounds(spark):
    x = _lowrank(n=50)
    with pytest.raises(ValueError):
        train_pca(_df(spark, x), k=0)
    with pytest.raises(ValueError):
        train_pca(_df(spark, x), k=17)


def test_composes_with_ivf_recall(spark, tmp_path):
    """PCA(8) over the 64-dim low-rank embeddings, IVF on the reduced
    vectors: full-probe search in the REDUCED space must recover most
    true L2 neighbors of the ORIGINAL space on low-intrinsic-dim data."""
    from valkey_search_spark.operators.ann import IVFIndex

    x = _lowrank(n=600, d=64, r=6)
    df = _df(spark, x)
    pca = train_pca(df, k=8)
    red = pca.transform(df).select(
        F.col("id").alias("vec_id"),
        F.col("embedding_pca").alias("embedding"))
    idx = IVFIndex.build(red, str(tmp_path / "ivf_pca"), metric="l2",
                         n_lists=4)
    q = x[7]
    qr = (pca.transform(_df(spark, x[7:8])).collect()[0]["embedding_pca"])
    got = [r["vec_id"] for r in
           idx.search(list(map(float, qr)), k=10,
                      nprobe=idx.n_lists, tiebreak_col="vec_id").collect()]
    true = np.argsort(((x.astype(np.float64) - q) ** 2).sum(1))[:10]
    overlap = len(set(got) & set(int(t) for t in true))
    assert overlap >= 8


def test_null_embeddings_fit_and_transform(spark):
    """Nulls are first-class (the multimodal on_error='null' contract):
    fit excludes them, both transform paths emit a proper NULL (not an
    array of nulls), so IVFIndex.build's isNotNull guard still works."""
    x = _lowrank(n=60)
    rows = [(i, [float(v) for v in r]) for i, r in enumerate(x)]
    rows.append((999, None))
    df = spark.createDataFrame(rows, "id long, embedding array<float>")
    pca = train_pca(df, k=3)
    for budget in (8192, 1):               # JVM path, then Arrow path
        old = EmbeddingPCA._JVM_LITERAL_BUDGET
        try:
            EmbeddingPCA._JVM_LITERAL_BUDGET = budget
            got = {r["id"]: r["embedding_pca"]
                   for r in pca.transform(df).collect()}
        finally:
            EmbeddingPCA._JVM_LITERAL_BUDGET = old
        assert got[999] is None
        assert got[0] is not None and len(got[0]) == 3
    empty = spark.createDataFrame([(1, None)],
                                  "id long, embedding array<float>")
    with pytest.raises(ValueError, match="no non-null"):
        train_pca(empty, k=2)
