"""Binary sign-code tier: scalar packing/popcount references, exact
equivalence of the rerank path, recall bounds, threshold training,
and plan pins (one Python kernel, JVM everything else)."""
from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from valkey_search_spark.functions.binary_quant import (
    binary_code_expr, binary_codes, fit_binary_thresholds, hamming_expr,
    popcount_words)
from valkey_search_spark.operators.ann import knn_join, knn_join_binary


def _pack_scalar(vec, thresholds=None):
    """Independent reference: little-endian bit packing into signed
    int64 words."""
    n_words = (len(vec) + 63) // 64
    words = []
    for w in range(n_words):
        u = 0
        for i in range(64):
            j = w * 64 + i
            if j < len(vec):
                t = thresholds[j] if thresholds is not None else 0.0
                if vec[j] is not None and vec[j] > t:
                    u |= 1 << i
        words.append(u - (1 << 64) if u >= (1 << 63) else u)
    return words


@pytest.mark.parametrize("dim", [40, 64, 130])
def test_code_expr_matches_scalar(spark, dim):
    rng = np.random.RandomState(dim)
    vecs = [[float(x) for x in rng.normal(0, 1, dim)] for _ in range(30)]
    thr = [float(t) for t in rng.normal(0, 0.3, dim)]
    for thresholds in (None, thr):
        df = spark.createDataFrame([(i, v) for i, v in enumerate(vecs)],
                                   "id int, embedding array<double>")
        got = {r["id"]: r["c"] for r in df.select(
            "id", binary_code_expr(F.col("embedding"), dim,
                                   thresholds).alias("c")).collect()}
        for i, v in enumerate(vecs):
            assert got[i] == _pack_scalar(v, thresholds), (i, thresholds)


def test_code_expr_sign_bit_under_ansi(spark):
    # vec[63] > 0 sets the word's SIGN bit — the ANSI overflow trap
    vec = [0.0] * 63 + [5.0]
    df = spark.createDataFrame([(vec,)], "embedding array<double>")
    [r] = df.select(binary_code_expr(F.col("embedding"), 64)
                    .alias("c")).collect()
    assert r["c"] == [-(1 << 63)]


def test_code_null_and_element_handling(spark):
    df = spark.createDataFrame(
        [(1, [1.0, None, -1.0]), (2, None)],
        "id int, embedding array<double>")
    got = {r["id"]: r["c"] for r in df.select(
        "id", binary_code_expr(F.col("embedding"), 3).alias("c"))
        .collect()}
    assert got[1] == [1]      # null element -> 0 bit
    assert got[2] is None     # null vector -> null code


def test_hamming_expr_and_popcount_reference(spark):
    rng = np.random.RandomState(7)
    pairs = [([int(rng.randint(-2**62, 2**62)) for _ in range(3)],
              [int(rng.randint(-2**62, 2**62)) for _ in range(3)])
             for _ in range(50)]
    df = spark.createDataFrame(pairs, "a array<long>, b array<long>")
    got = [r["h"] for r in
           df.select(hamming_expr(F.col("a"), F.col("b")).alias("h"))
           .collect()]
    for (a, b), h in zip(pairs, got):
        want = sum(bin((x ^ y) & ((1 << 64) - 1)).count("1")
                   for x, y in zip(a, b))
        assert h == want
    # numpy popcount helper agrees on the same words
    arr = np.array([a for a, _ in pairs], dtype=np.int64)
    brr = np.array([b for _, b in pairs], dtype=np.int64)
    np_h = popcount_words(np.bitwise_xor(arr, brr))
    want_all = [sum(bin((x ^ y) & ((1 << 64) - 1)).count("1")
                    for x, y in zip(a, b)) for a, b in pairs]
    assert np_h.tolist() == want_all


def test_fit_thresholds_are_column_means(spark):
    rng = np.random.RandomState(3)
    mat = rng.normal(2.0, 1.0, (200, 16))
    df = spark.createDataFrame(
        [([float(x) for x in row],) for row in mat],
        "embedding array<double>")
    thr = fit_binary_thresholds(df)
    assert np.allclose(thr, mat.mean(axis=0), atol=1e-9)


@pytest.mark.parametrize("metric", ["l2", "cosine", "ip"])
def test_full_oversample_equals_exact_knn(spark, sf_dir, metric):
    from tests.conftest import load

    emb = load(spark, sf_dir, "embeddings").limit(250) \
        .select(F.col("vec_id").alias("cid"), "embedding")
    q = emb.limit(6).select(F.col("cid").alias("qid"), "embedding")
    exact = knn_join(q, emb, k=8, metric=metric).collect()
    approx = knn_join_binary(q, emb, k=8, metric=metric,
                             oversample=1_000_000).collect()
    ex = {(r["qid"], r["rank"]): (r["cid"], r["distance"]) for r in exact}
    ap = {(r["qid"], r["rank"]): (r["cid"], r["distance"]) for r in approx}
    assert set(ex) == set(ap)
    for key in ex:
        assert ex[key][0] == ap[key][0], key
        # knn_join's expanded-norm l2 vs the rerank's direct sum
        # differ by cancellation noise at tiny distances
        assert ex[key][1] == pytest.approx(ap[key][1], abs=1e-6)


def test_recall_bound_and_threshold_lift(spark):
    # correlated (clustered) vectors: sign codes separate clusters well
    rng = np.random.RandomState(21)
    centers = rng.normal(0, 1, (8, 32))
    rows = [(i, [float(x) for x in centers[i % 8]
                 + rng.normal(0, 0.3, 32)]) for i in range(400)]
    corpus = spark.createDataFrame(rows, "cid long, embedding array<double>")
    q = spark.createDataFrame(rows[:10], "qid long, embedding array<double>")
    from valkey_search_spark.operators.ann import batch_recall

    exact = knn_join(q, corpus, k=10, metric="cosine")
    approx = knn_join_binary(q, corpus, k=10, metric="cosine",
                             oversample=8)
    rec = batch_recall(approx, exact)
    assert rec >= 0.8, rec

    # shifted data: untrained codes saturate (all-positive dims -> all
    # bits equal); trained mean thresholds restore discrimination
    shift_rows = [(i, [float(x + 10.0) for x in v]) for i, v in rows]
    s_corpus = spark.createDataFrame(
        shift_rows, "cid long, embedding array<double>")
    s_q = spark.createDataFrame(
        shift_rows[:10], "qid long, embedding array<double>")
    s_exact = knn_join(s_q, s_corpus, k=10, metric="l2")
    blind = batch_recall(
        knn_join_binary(s_q, s_corpus, k=10, metric="l2", oversample=4),
        s_exact)
    thr = fit_binary_thresholds(s_corpus)
    trained = batch_recall(
        knn_join_binary(s_q, s_corpus, k=10, metric="l2", oversample=4,
                        thresholds=thr),
        s_exact)
    assert trained >= blind
    assert trained >= 0.6, (blind, trained)


def test_precomputed_code_col_matches_inflight(spark):
    rng = np.random.RandomState(5)
    rows = [(i, [float(x) for x in rng.normal(0, 1, 24)])
            for i in range(120)]
    corpus = spark.createDataFrame(rows, "cid long, embedding array<double>")
    stored = binary_codes(corpus, "embedding", dim=24, out_col="code")
    q = spark.createDataFrame(rows[:5], "qid long, embedding array<double>")
    a = knn_join_binary(q, corpus, k=5, oversample=6).collect()
    b = knn_join_binary(q, stored, k=5, oversample=6,
                        code_col="code").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_plan_single_python_kernel(spark):
    rng = np.random.RandomState(9)
    rows = [(i, [float(x) for x in rng.normal(0, 1, 16)])
            for i in range(60)]
    corpus = spark.createDataFrame(rows, "cid long, embedding array<double>")
    q = spark.createDataFrame(rows[:3], "qid long, embedding array<double>")
    out = knn_join_binary(q, corpus, k=3, oversample=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") == 1      # the Hamming scan only
    assert "BatchEvalPython" not in plan       # rerank is all JVM


def test_validation(spark):
    df = spark.createDataFrame([(1, [1.0])],
                               "qid long, embedding array<double>")
    with pytest.raises(ValueError):
        binary_code_expr(F.col("embedding"), 0)
    with pytest.raises(ValueError):
        binary_code_expr(F.col("embedding"), 4, thresholds=[0.0])
    with pytest.raises(ValueError):
        knn_join_binary(df, df, k=0)
    with pytest.raises(ValueError):
        knn_join_binary(df, df, k=1, metric="hamming2")
    empty = df.where("qid < 0")
    with pytest.raises(ValueError):
        knn_join_binary(df, empty.withColumnRenamed("qid", "cid"), k=1)


def test_flipped_route_matches_broadcast(spark):
    # an over-cap corpus auto-routes to the corpus-distributed plan
    # (query codes broadcast) with IDENTICAL results — rows, order,
    # distances — and never materializes corpus rows on the driver
    rng = np.random.RandomState(11)
    rows = [(i, [float(x) for x in rng.normal(0, 1, 48)])
            for i in range(500)]
    corpus = spark.createDataFrame(rows, "cid long, embedding array<double>")
    q = spark.createDataFrame(rows[:7], "qid long, embedding array<double>")
    wide = knn_join_binary(q, corpus, k=6, oversample=5, metric="cosine",
                           max_broadcast_bytes=None).collect()
    # corpus codes 500 x 1 word x 8 B = 4000 B > 3000 B cap -> flipped;
    # query floats 7 x 48 x 8 = 2688 B < cap -> collectable side
    flip = knn_join_binary(q, corpus, k=6, oversample=5, metric="cosine",
                           max_broadcast_bytes=3000).collect()
    key = lambda r: (r["qid"], r["rank"])  # noqa: E731
    a = {key(r): (r["cid"], round(r["distance"], 9)) for r in wide}
    b = {key(r): (r["cid"], round(r["distance"], 9)) for r in flip}
    assert a == b
    # the size hint skips the probe jobs and routes the same way
    hint = knn_join_binary(q, corpus, k=6, oversample=5, metric="cosine",
                           max_broadcast_bytes=3000,
                           corpus_size_hint=(500, 48)).collect()
    c = {key(r): (r["cid"], round(r["distance"], 9)) for r in hint}
    assert a == c


def test_flipped_route_with_thresholds_and_code_col(spark):
    rng = np.random.RandomState(13)
    rows = [(i, [float(x + 3.0) for x in rng.normal(0, 1, 24)])
            for i in range(150)]
    corpus = spark.createDataFrame(rows, "cid long, embedding array<double>")
    q = spark.createDataFrame(rows[:4], "qid long, embedding array<double>")
    thr = fit_binary_thresholds(corpus)
    # corpus codes 150 x 8 = 1200 B > 1000 cap; query floats 768 B < cap
    wide = knn_join_binary(q, corpus, k=5, oversample=6, thresholds=thr,
                           max_broadcast_bytes=None).collect()
    flip = knn_join_binary(q, corpus, k=5, oversample=6, thresholds=thr,
                           max_broadcast_bytes=1000).collect()
    assert sorted(map(tuple, wide)) == sorted(map(tuple, flip))
    # pre-encoded code_col on the flipped path too
    stored = binary_codes(corpus, "embedding", dim=24, thresholds=thr,
                          out_col="code")
    flip2 = knn_join_binary(q, stored, k=5, oversample=6, thresholds=thr,
                            code_col="code",
                            max_broadcast_bytes=1000).collect()
    assert sorted(map(tuple, wide)) == sorted(map(tuple, flip2))


def test_both_sides_over_cap_raises_before_collect(spark):
    rng = np.random.RandomState(17)
    rows = [(i, [float(x) for x in rng.normal(0, 1, 32)])
            for i in range(64)]
    df = spark.createDataFrame(rows, "cid long, embedding array<double>")
    q = df.withColumnRenamed("cid", "qid")
    # queries: 64 rows x 32 dim x 8 B = 16 KiB float > 1 KiB cap
    with pytest.raises(ValueError, match="knn_join_bucketed"):
        knn_join_binary(q, df, k=3, max_broadcast_bytes=1 << 10,
                        corpus_size_hint=(10**9, 768))


def test_recall_scales_with_dimension(spark):
    # resolution = one Hamming level per dim: at 512 dims a clustered
    # corpus reaches recall 1.0 at oversample 8 (the bench's 64-dim
    # testdata needs ~64x for the same recall — its coarsest case)
    rng = np.random.RandomState(0)
    centers = rng.normal(0, 1, (32, 512))
    rows = [(i, [float(x) for x in centers[i % 32]
                 + rng.normal(0, 0.5, 512)]) for i in range(1000)]
    emb = spark.createDataFrame(rows, "cid long, embedding array<double>")
    q = spark.createDataFrame(rows[:40], "qid long, embedding array<double>")
    exact = knn_join(q, emb, k=10, metric="cosine").select("qid", "cid")
    n = exact.count()
    approx = knn_join_binary(q, emb, k=10, metric="cosine",
                             oversample=8).select("qid", "cid")
    rec = approx.join(exact, ["qid", "cid"]).count() / n
    assert rec >= 0.97, rec
