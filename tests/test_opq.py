"""OPQ (Optimized Product Quantization): learned-rotation PQ tier —
orthonormality, quantization-error win on correlated data, rotated
encode/ADC/decode consistency, persistence, and the IVF integration."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from valkey_search_spark.functions.pq import PQCodebook
from valkey_search_spark.operators.ann import IVFIndex, knn_join_bucketed

DIM, M = 64, 8


def _correlated(spark, n=2000, seed=5):
    """Low-rank latent mixed across all dims — the correlated regime
    where plain dim-split PQ wastes codebook capacity and OPQ wins."""
    rng = np.random.default_rng(seed)
    latent = rng.normal(size=(n, 8))
    mix = rng.normal(size=(8, DIM))
    x = latent @ mix + 0.05 * rng.normal(size=(n, DIM))
    rows = [(i, [float(v) for v in x[i]]) for i in range(n)]
    return (spark.createDataFrame(rows, "vec_id long, embedding array<float>"),
            x.astype(np.float32))


@pytest.fixture(scope="module")
def corr(spark):
    return _correlated(spark)


@pytest.fixture(scope="module")
def books(spark, corr):
    df, _ = corr
    plain = PQCodebook.train(df, "embedding", m=M, iters=15, seed=7)
    opq = PQCodebook.train_opq(df, "embedding", m=M, iters=15,
                               opq_iters=8, seed=7)
    return plain, opq


def _recon_err(book, x):
    xr = x @ book.rotation if book.rotation is not None else x
    sub = xr.reshape(len(x), M, -1)
    err = 0.0
    for s in range(M):
        d = (((sub[:, s, :, None] - book.centroids[s].T[None]) ** 2)
             .sum(axis=1))
        err += d.min(axis=1).sum()
    return err / len(x)


def test_rotation_is_orthonormal(books):
    _, opq = books
    r = opq.rotation.astype(np.float64)
    assert np.allclose(r @ r.T, np.eye(DIM), atol=1e-4)


def test_opq_cuts_quantization_error_on_correlated_data(books, corr):
    _, x = corr
    plain, opq = books
    e_plain, e_opq = _recon_err(plain, x), _recon_err(opq, x)
    assert e_opq < 0.7 * e_plain          # a real win, not noise


def test_adc_distances_track_truth_better(books, corr):
    df, x = corr
    plain, opq = books
    q = x[0].tolist()
    true_d = np.sqrt(((x - x[0]) ** 2).sum(axis=1))

    def adc_err(book):
        codes_df = book.encode(df, "embedding")
        codes = np.array([r["__pqcode"] for r in
                          codes_df.select("__pqcode")
                          .collect()], dtype=np.int8)
        est = book.adc_score_batch(codes, q, "l2")
        return float(np.abs(est - true_d).mean())

    assert adc_err(opq) < adc_err(plain)


def test_decode_unrotates_to_original_space(spark, books, corr):
    df, x = corr
    _, opq = books
    out = opq.attach_decode(opq.encode(df.limit(50), "embedding"),
                            "embedding")
    got = {r["vec_id"]: np.array(r["embedding"]) for r in out.collect()}
    # numpy reference: rotate -> per-subspace nearest centroid -> unrotate
    xr = x[:50] @ opq.rotation
    sub = xr.reshape(50, M, -1)
    rec = np.concatenate(
        [opq.centroids[s][
            (((sub[:, s, :, None] - opq.centroids[s].T[None]) ** 2)
             .sum(axis=1)).argmin(axis=1)]
         for s in range(M)], axis=1)
    want = rec @ opq.rotation.T
    for i in range(50):
        assert np.allclose(got[i], want[i], atol=1e-3)
    # the decode is closer to the ORIGINAL vector than to noise scale
    err = np.linalg.norm(np.stack([got[i] for i in range(50)]) - x[:50],
                         axis=1).mean()
    assert err < 0.5 * np.linalg.norm(x[:50], axis=1).mean()


def test_json_roundtrip_keeps_rotation(books):
    _, opq = books
    again = PQCodebook.from_json(opq.to_json())
    assert np.allclose(again.rotation, opq.rotation)
    assert np.allclose(again.centroids, opq.centroids)


def test_ivf_opq_end_to_end(spark, corr, tmp_path):
    df, x = corr
    idx = IVFIndex.build(df, str(tmp_path / "ix"), vec_col="embedding",
                         metric="l2", n_lists=4, seed=42,
                         pq_m=M, pq_opq_iters=5, key_col="vec_id")
    assert idx.pq.rotation is not None
    q = [float(v) for v in x[3]]
    top = idx.search(q, k=5, nprobe=idx.n_lists,
                     tiebreak_col="vec_id").collect()
    assert top[0]["vec_id"] == 3          # self is nearest under OPQ-ADC
    # bucketed join parity with single search on the same index
    qdf = spark.createDataFrame([(0, q)], "qid int, embedding array<float>")
    j = [r["vec_id"] for r in
         knn_join_bucketed(qdf, idx, k=5, nprobe=idx.n_lists,
                           corpus_key="vec_id").orderBy("rank").collect()]
    assert j == [r["vec_id"] for r in top]
    # persistence: rotation survives load
    again = IVFIndex.load(spark, idx.path)
    assert np.allclose(again.pq.rotation, idx.pq.rotation)
    got = [r["vec_id"] for r in
           again.search(q, k=5, nprobe=4, tiebreak_col="vec_id").collect()]
    assert got == [r["vec_id"] for r in top]


def test_opq_recall_beats_plain_pq(spark, corr, tmp_path):
    """The headline: at the same m code bytes, OPQ recall@10 vs the
    exact float ranking is >= plain PQ recall on correlated data."""
    df, x = corr

    def recall(pq_kwargs, tag):
        idx = IVFIndex.build(df, str(tmp_path / tag), vec_col="embedding",
                             metric="l2", n_lists=2, seed=42,
                             key_col="vec_id", **pq_kwargs)
        hits = 0
        for qi in range(20):
            true_d = ((x - x[qi]) ** 2).sum(axis=1)
            want = set(np.lexsort((np.arange(len(x)), true_d))[:10])
            got = {r["vec_id"] for r in
                   idx.search([float(v) for v in x[qi]], k=10, nprobe=2,
                              tiebreak_col="vec_id").collect()}
            hits += len(want & got)
        return hits / (20 * 10)

    r_plain = recall({"pq_m": M}, "plain")
    r_opq = recall({"pq_m": M, "pq_opq_iters": 8}, "opq")
    assert r_opq >= r_plain
    assert r_opq >= 0.5
