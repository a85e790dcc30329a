"""Batch KNN similarity join: shapes, metrics, determinism, null handling."""

import pytest
from pyspark.sql import Row, functions as F

from valkey_search_spark.operators.ann import knn_join

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_self_join_rank1_is_self(spark, emb):
    q = emb.limit(20).select(F.col("vec_id").alias("qid"), "embedding")
    c = emb.select(F.col("vec_id").alias("cid"), "embedding")
    out = knn_join(q, c, k=3, metric="l2")
    r1 = {r["qid"]: (r["cid"], r["distance"]) for r in
          out.where("rank = 1").collect()}
    assert all(cid == qid and d < 1e-5 for qid, (cid, d) in r1.items())


def test_k_rows_per_query(spark, emb):
    q = emb.limit(10).select(F.col("vec_id").alias("qid"), "embedding")
    c = emb.select(F.col("vec_id").alias("cid"), "embedding")
    counts = (knn_join(q, c, k=5).groupBy("qid")
              .agg(F.count(F.lit(1)).alias("n")).collect())
    assert len(counts) == 10 and all(r["n"] == 5 for r in counts)


@pytest.mark.parametrize("metric", ["l2", "ip", "cosine"])
def test_metrics_run_and_are_deterministic(spark, emb, metric):
    q = emb.limit(5).select(F.col("vec_id").alias("qid"), "embedding")
    c = emb.select(F.col("vec_id").alias("cid"), "embedding")
    a = sorted(map(tuple, knn_join(q, c, k=3, metric=metric).collect()))
    b = sorted(map(tuple, knn_join(q, c, k=3, metric=metric).collect()))
    assert a == b and len(a) == 15


def test_null_vectors_skipped(spark):
    q = spark.createDataFrame([Row(qid=1, embedding=[1.0, 0.0]),
                               Row(qid=2, embedding=None)])
    c = spark.createDataFrame([Row(cid=10, embedding=[1.0, 0.0]),
                               Row(cid=11, embedding=[0.0, 1.0])])
    out = knn_join(q, c, k=2, metric="l2").collect()
    assert {r["qid"] for r in out} == {1}


# ---------------------------------------------------------------------------
# knn_join_bucketed: the beyond-broadcast path over an IVF-partitioned corpus

from valkey_search_spark.operators.ann import IVFIndex, knn_join_bucketed


@pytest.fixture(scope="module")
def ivf(spark, emb, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivf") / "emb")
    corpus = emb.select(F.col("vec_id").alias("cid"), "embedding")
    return IVFIndex.build(corpus, path, "embedding", metric="l2", n_lists=8)


def test_bucketed_full_probe_equals_broadcast_join(spark, emb, ivf):
    q = emb.limit(25).select(F.col("vec_id").alias("qid"), "embedding")
    c = emb.select(F.col("vec_id").alias("cid"), "embedding")
    exact = sorted((r["qid"], r["cid"], round(r["distance"], 6), r["rank"])
                   for r in knn_join(q, c, k=4, metric="l2").collect())
    bucketed = sorted((r["qid"], r["cid"], round(r["distance"], 6), r["rank"])
                      for r in knn_join_bucketed(q, ivf, k=4, nprobe=8).collect())
    assert bucketed == exact


def test_bucketed_partial_probe_recall(spark, emb, ivf):
    q = emb.limit(25).select(F.col("vec_id").alias("qid"), "embedding")
    c = emb.select(F.col("vec_id").alias("cid"), "embedding")
    exact = {(r["qid"], r["cid"]) for r in
             knn_join(q, c, k=4, metric="l2").collect()}
    approx = {(r["qid"], r["cid"]) for r in
              knn_join_bucketed(q, ivf, k=4, nprobe=4).collect()}
    assert len(approx & exact) / len(exact) >= 0.6
    # every query still gets exactly k rows (probed lists hold >= k rows)
    assert len(approx) == len(exact)


def test_bucketed_never_collects_corpus(spark, emb, ivf, monkeypatch):
    """The whole point vs knn_join: nothing larger than the probed-list id
    set is ever materialized on the driver while BUILDING the plan."""
    q = emb.limit(10).select(F.col("vec_id").alias("qid"), "embedding")
    cls = type(emb)                    # the concrete (classic) DataFrame
    sizes = []
    orig = cls.collect

    def spy(self):
        rows = orig(self)
        sizes.append(len(rows))
        return rows

    monkeypatch.setattr(cls, "collect", spy)
    out = knn_join_bucketed(q, ivf, k=3, nprobe=4)
    assert sizes and max(sizes) <= ivf.n_lists     # only the list-id set
    monkeypatch.setattr(cls, "collect", orig)
    assert out.count() == 30


def test_auto_route_past_broadcast_limit(spark, emb, monkeypatch, tmp_path):
    """A corpus whose vector-matrix estimate exceeds max_broadcast_bytes
    never hits a driver-side collect of corpus rows: knn_join delegates to
    the full-probe bucketed plan and returns the SAME result."""
    q = emb.limit(10).select(F.col("vec_id").alias("qid"), "embedding")
    c = emb.select(F.col("vec_id").alias("cid"), "embedding")
    expected = sorted((r["qid"], r["cid"], round(r["distance"], 6), r["rank"])
                      for r in knn_join(q, c, k=3, metric="l2",
                                        max_broadcast_bytes=None).collect())

    cls = type(emb)
    sizes = []
    orig = cls.collect

    def spy(self):
        rows = orig(self)
        sizes.append(len(rows))
        return rows

    monkeypatch.setattr(cls, "collect", spy)
    routed = knn_join(q, c, k=3, metric="l2", max_broadcast_bytes=1,
                      index_path=str(tmp_path / "ivf"))
    n_corpus = emb.count()
    # plan construction (incl. the IVF build) collects only list-id sets
    assert not sizes or max(sizes) < n_corpus
    got = sorted((r["qid"], r["cid"], round(r["distance"], 6), r["rank"])
                 for r in orig(routed))
    monkeypatch.setattr(cls, "collect", orig)
    assert got == expected


def test_distance_ties_resolve_to_lowest_keys(spark, emb, tmp_path):
    """With exact-duplicate vectors under distinct keys, both join paths
    must pick the LOWEST corpus keys among tied distances — the per-list
    candidate cut has to honor the global (distance, key) tiebreak."""
    c1 = emb.select(F.col("vec_id").alias("cid"), "embedding")
    c2 = emb.select((F.col("vec_id") + 100000).alias("cid"), "embedding")
    corpus = c1.unionAll(c2)          # every vector twice
    q = emb.limit(6).select(F.col("vec_id").alias("qid"), "embedding")

    bcast = knn_join(q, corpus, k=4, metric="l2", max_broadcast_bytes=None)
    idx = IVFIndex.build(corpus, str(tmp_path / "ties"), metric="l2",
                         n_lists=4)
    buck = knn_join_bucketed(q, idx, k=4, nprobe=4, corpus_key="cid")

    b = sorted((r["qid"], r["rank"], r["cid"]) for r in bcast.collect())
    k_ = sorted((r["qid"], r["rank"], r["cid"]) for r in buck.collect())
    assert b == k_                               # identical incl. tie order
    # duplicates tie pairwise: the low-key copy must always outrank its twin
    by_q = {}
    for qid, rank, cid in b:
        by_q.setdefault(qid, []).append(cid)
    for qid, cids in by_q.items():
        for cid in cids:
            if cid >= 100000:
                assert cid - 100000 in cids       # twin's low copy is present


def test_corpus_size_hint_skips_metadata_jobs(spark, emb, monkeypatch):
    """With corpus_size_hint the size check must run ZERO eager jobs
    before routing: neither first() nor count() is called while the
    plan is built (the broadcast collect itself still runs, later)."""
    q = emb.limit(5).select(F.col("vec_id").alias("qid"), "embedding")
    c = emb.select(F.col("vec_id").alias("cid"), "embedding")
    cls = type(emb)
    calls = []
    orig_first, orig_count = cls.first, cls.count

    def spy_first(self):
        calls.append("first")
        return orig_first(self)

    def spy_count(self):
        calls.append("count")
        return orig_count(self)

    monkeypatch.setattr(cls, "first", spy_first)
    monkeypatch.setattr(cls, "count", spy_count)
    out = knn_join(q, c, k=3, metric="l2",
                   corpus_size_hint=(1000, 64))
    assert calls == []                   # routing ran no pre-jobs
    monkeypatch.undo()
    # hinted run matches the probed run value-for-value
    expect = sorted(map(tuple, knn_join(q, c, k=3, metric="l2").collect()))
    assert sorted(map(tuple, out.collect())) == expect
    # an oversized hint routes to the bucketed plan without probing
    # (dim inflated so the byte estimate trips the broadcast cap while
    # the row count — which sizes the KMeans fit sample — stays honest)
    routed = knn_join(q, c, k=3, metric="l2",
                      corpus_size_hint=(1000, 10**7))
    assert sorted(map(tuple, routed.select(
        "qid", "cid", F.round("distance", 6), "rank").collect())) == sorted(
        map(tuple, (r[:2] + (round(r[2], 6), r[3]) for r in expect)))


def test_flipped_route_matches_broadcast_all_metrics(spark, emb):
    """Over-cap WITHOUT index_path now takes the one-shot flipped plan
    (query matrix broadcast, corpus streamed): rows, tie order, and
    distances must match the broadcast join on every metric."""
    q = emb.limit(8).select(F.col("vec_id").alias("qid"), "embedding")
    c = emb.select(F.col("vec_id").alias("cid"), "embedding")
    for metric in ("l2", "cosine", "ip"):
        wide = sorted((r["qid"], r["rank"], r["cid"],
                       round(r["distance"], 6))
                      for r in knn_join(q, c, k=4, metric=metric,
                                        max_broadcast_bytes=None).collect())
        flip = sorted((r["qid"], r["rank"], r["cid"],
                       round(r["distance"], 6))
                      for r in knn_join(q, c, k=4, metric=metric,
                                        max_broadcast_bytes=8192).collect())
        assert wide == flip, metric


def test_flipped_route_never_collects_corpus(spark, emb, monkeypatch):
    q = emb.limit(5).select(F.col("vec_id").alias("qid"), "embedding")
    c = emb.select(F.col("vec_id").alias("cid"), "embedding")
    n_corpus = c.count()
    cls = type(emb)
    sizes = []
    orig = cls.collect

    def spy(self):
        rows = orig(self)
        sizes.append(len(rows))
        return rows

    monkeypatch.setattr(cls, "collect", spy)
    out = knn_join(q, c, k=3, metric="l2", max_broadcast_bytes=8192)
    rows = orig(out)
    monkeypatch.undo()
    # only the 5-row query collect happened during planning
    assert sizes and max(sizes) < n_corpus
    assert len(rows) == 15


def test_flipped_route_tie_order_and_both_sides_raise(spark, emb):
    # duplicate vectors under distinct keys: low key must win ties,
    # matching the broadcast path exactly
    c1 = emb.select(F.col("vec_id").alias("cid"), "embedding")
    c2 = emb.select((F.col("vec_id") + 100000).alias("cid"), "embedding")
    corpus = c1.unionAll(c2)
    q = emb.limit(5).select(F.col("vec_id").alias("qid"), "embedding")
    wide = sorted((r["qid"], r["rank"], r["cid"]) for r in
                  knn_join(q, corpus, k=4, metric="l2",
                           max_broadcast_bytes=None).collect())
    flip = sorted((r["qid"], r["rank"], r["cid"]) for r in
                  knn_join(q, corpus, k=4, metric="l2",
                           max_broadcast_bytes=8192).collect())
    assert wide == flip
    with pytest.raises(ValueError, match="IVFIndex"):
        knn_join(q, corpus, k=3, max_broadcast_bytes=64,
                 corpus_size_hint=(10**9, 768))


def test_flipped_fuzz_edge_semantics(spark):
    """Seeded sweep: duplicate vectors, NaN components, and near-tie
    distances. Tie order among distances that differ at ULP scale is
    NOT bit-stable across plan shapes (BLAS accumulation is
    position-dependent: identical vectors at different matrix columns
    can score 0.0 vs -2.2e-16 — observed on this very seed), so the
    contract checked here is the float-honest one: per query, the
    rounded distance sequences match exactly, every result's distance
    is within the top-k band, and the cid sets agree outside the
    boundary-tie group."""
    import numpy as np

    rng = np.random.RandomState(42)
    for trial in range(4):
        n = int(rng.randint(20, 60))
        dim = int(rng.randint(3, 9))
        mat = rng.randint(-3, 4, size=(n, dim)).astype(float)  # many ties
        mat[rng.randint(0, n)] [rng.randint(0, dim)] = float("nan")
        rows = [(i, [float(x) for x in mat[i]]) for i in range(n)]
        rows += [(i + 1000, r[1]) for i, r in enumerate(rows[:5])]  # dups
        corpus = spark.createDataFrame(
            rows, "cid long, embedding array<double>")
        q = spark.createDataFrame(rows[:6],
                                  "qid long, embedding array<double>")
        metric = ("l2", "cosine", "ip")[trial % 3]

        def by_query(df):
            out = {}
            for r in df.collect():
                d = r["distance"]  # NaN crosses Arrow as null, both paths
                d = float("nan") if d is None else round(d, 9) + 0.0
                out.setdefault(r["qid"], []).append((r["rank"], r["cid"], d))
            return {k: sorted(v) for k, v in out.items()}

        wide = by_query(knn_join(q, corpus, k=5, metric=metric,
                                 max_broadcast_bytes=None))
        # cap between the 6-query matrix (< 450 B) and the corpus
        flip = by_query(knn_join(q, corpus, k=5, metric=metric,
                                 max_broadcast_bytes=500))
        assert wide.keys() == flip.keys(), (trial, metric)
        for qid in wide:
            dw = [d for _, _, d in wide[qid]]
            df_ = [d for _, _, d in flip[qid]]
            # NaN distances (the planted NaN row) compare by repr
            assert [repr(x) for x in dw] == [repr(x) for x in df_], \
                (trial, metric, qid)
            kth = dw[-1]
            inner_w = {c for _, c, d in wide[qid] if repr(d) != repr(kth)}
            inner_f = {c for _, c, d in flip[qid] if repr(d) != repr(kth)}
            assert inner_w == inner_f, (trial, metric, qid)
            bw = {c for _, c, d in wide[qid] if repr(d) == repr(kth)}
            bf = {c for _, c, d in flip[qid] if repr(d) == repr(kth)}
            assert len(bw) == len(bf), (trial, metric, qid)


def test_duplicate_query_keys_per_row_semantics(spark):
    """Duplicate query KEYS (two input rows sharing qid) must each get
    their own top-k on EVERY route — broadcast, flipped, binary, and
    flipped-binary (r9 advice: the flipped window used to merge all
    same-key queries' candidates into one top-k)."""
    from valkey_search_spark.operators.ann import knn_join_binary

    corpus = spark.createDataFrame(
        [(i, [float(i), float(i % 7)]) for i in range(30)],
        "cid long, embedding array<double>")
    # qid=1 appears TWICE with different vectors; qid=2 once
    q = spark.createDataFrame(
        [(1, [0.0, 0.0]), (1, [29.0, 1.0]), (2, [15.0, 1.0])],
        "qid long, embedding array<double>")

    def rowset(df):
        return sorted((r["qid"], r["cid"], round(r["distance"], 6),
                       r["rank"]) for r in df.collect())

    wide = rowset(knn_join(q, corpus, k=3, metric="l2",
                           max_broadcast_bytes=None))
    # 3 input rows x k=3 = 9 rows; qid=1 contributes 6 (two rows, each
    # ranked 1..3 against its own vector)
    assert len(wide) == 9
    assert sum(1 for t in wide if t[0] == 1) == 6
    flip = rowset(knn_join(q, corpus, k=3, metric="l2",
                           max_broadcast_bytes=200))
    assert flip == wide

    bin_wide = rowset(knn_join_binary(q, corpus, k=3, metric="l2",
                                      oversample=30,
                                      max_broadcast_bytes=None))
    assert len(bin_wide) == 9 and sum(1 for t in bin_wide if t[0] == 1) == 6
    bin_flip = rowset(knn_join_binary(q, corpus, k=3, metric="l2",
                                      oversample=30,
                                      max_broadcast_bytes=200))
    assert bin_flip == bin_wide
    # full oversample => binary candidates cover the corpus => exact
    assert bin_wide == wide


def test_duplicate_query_keys_bucketed_and_hnsw(spark, tmp_path):
    """Same per-row contract on the index-backed routes: IVF bucketed
    (full probe == exact) and HNSW full-explore must return one top-k
    PER INPUT ROW when query keys repeat."""
    from valkey_search_spark.operators.hnsw import (
        HNSWIndex, knn_join_hnsw)

    corpus = spark.createDataFrame(
        [(i, [float(i), float(i % 5)]) for i in range(40)],
        "cid long, embedding array<double>")
    q = spark.createDataFrame(
        [(1, [0.0, 0.0]), (1, [39.0, 4.0]), (2, [20.0, 0.0])],
        "qid long, embedding array<double>")

    def rowset(df):
        return sorted((r["qid"], r[df.columns[1]], round(r["distance"], 6),
                       r["rank"]) for r in df.collect())

    wide = rowset(knn_join(q, corpus, k=3, metric="l2",
                           max_broadcast_bytes=None))
    assert len(wide) == 9 and sum(1 for t in wide if t[0] == 1) == 6

    ivf = IVFIndex.build(corpus, path=str(tmp_path / "ivf"),
                         vec_col="embedding", metric="l2", n_lists=4)
    bucketed = rowset(knn_join_bucketed(q, ivf, k=3, nprobe=ivf.n_lists))
    assert bucketed == wide

    hnsw = HNSWIndex.build(corpus, path=str(tmp_path / "hnsw"),
                           vec_col="embedding", key_col="cid",
                           metric="l2", m=8, ef_construction=40,
                           max_segment_rows=20)
    hj = rowset(knn_join_hnsw(q, hnsw, k=3, ef=40))
    assert hj == wide
