"""Property check for routing on ARBITRARY (even adversarial,
non-clusterable) data. NOTE route_segments == n_clusters dispatches to
the unrouted branch by contract, so equality there is a dispatch test,
not a routing test — the REAL routed path (r < clusters) is pinned
here with properties that hold on any data:

- every routed hit reports the TRUE distance to that corpus vector
  (routing can prune candidates, never corrupt distances/keys);
- per-rank, routed distances are >= the exact top-k distances
  (pruning only ever loses candidates);
- the routed result is deterministic across executions (the persisted
  probe pins one evaluation of the query lineage);
- full-explore unrouted equals numpy brute force exactly.
"""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from valkey_search_spark.operators.hnsw import HNSWIndex, knn_join_hnsw

CASES = [
    # (n_rows, dim, n_segments, metric, seed)
    (60, 4, 3, "l2", 0),
    (90, 6, 5, "cosine", 1),
    (40, 3, 4, "ip", 2),        # more segments than natural clusters
    (25, 5, 2, "l2", 3),        # duplicated vectors below
]


def _metric_dist(cm, qv, metric):
    if metric == "l2":
        return np.sqrt(((cm - qv) ** 2).sum(1))
    return 1.0 - cm @ qv


@pytest.mark.parametrize("n,dim,nseg,metric,seed", CASES)
def test_routed_path_properties_on_random_data(spark, tmp_path, n, dim,
                                               nseg, metric, seed):
    rng = np.random.RandomState(seed)
    # vectors live as array<float> in the index — the scalar reference
    # must flow through the same float32 quantization
    mat = rng.randn(n, dim).astype(np.float32).astype(np.float64)
    if seed == 3:                      # exact duplicates stress ties
        mat[1::2] = mat[::2][: len(mat[1::2])]
    rows = [(i, [float(x) for x in mat[i]]) for i in range(n)]
    df = spark.createDataFrame(rows,
                               "vec_id bigint, embedding array<float>")
    idx = HNSWIndex.build(df, str(tmp_path / f"f{seed}"), metric=metric,
                          m=4, ef_construction=24, n_segments=nseg,
                          partitioner="kmeans", max_segment_rows=10_000)
    q = df.where(F.col("vec_id") < 8) \
          .select(F.col("vec_id").alias("qid"), "embedding")
    k = 4
    base = knn_join_hnsw(q, idx, k=k, ef=10**6)
    r = max(1, len(idx.seg_map) - 1)   # < clusters: the REAL routed path
    routed = knn_join_hnsw(q, idx, k=k, ef=10**6, route_segments=r)
    got = sorted((x["qid"], x["vec_id"], x["distance"], x["rank"])
                 for x in routed.collect())
    # determinism across executions of the same routed frame
    again = sorted((x["qid"], x["vec_id"], x["distance"], x["rank"])
                   for x in routed.collect())
    assert got == again

    cm = mat.copy().astype(np.float64)
    qm = {i: cm[i].copy() for i in range(min(8, n))}
    if metric == "cosine":
        norms = np.linalg.norm(cm, axis=1, keepdims=True)
        cm = cm / norms
        qm = {i: v / np.linalg.norm(v) for i, v in qm.items()}
    exact = {x["qid"]: [] for x in base.collect()}
    for x in sorted(base.collect(), key=lambda x: (x["qid"], x["rank"])):
        exact[x["qid"]].append(x["distance"])
    per_q: dict = {}
    for qid, vid, dist, rank in got:
        # hit distances are HONEST: match numpy to the named vector
        true = float(_metric_dist(cm[vid:vid + 1], qm[qid], metric)[0])
        assert dist == pytest.approx(true, abs=1e-6), (qid, vid)
        per_q.setdefault(qid, []).append((rank, dist))
    per_q = {qid: [d for _, d in sorted(v)] for qid, v in per_q.items()}
    for qid, dists in per_q.items():
        assert dists == sorted(dists)
        # pruning only loses candidates: per-rank routed >= exact
        for i, d in enumerate(dists):
            assert d >= exact[qid][i] - 1e-6

    # and full-explore unrouted is EXACT vs numpy brute force
    want = set()
    for qi in qm:
        d = _metric_dist(cm, qm[qi], metric)
        order = sorted(range(n), key=lambda j: (round(float(d[j]), 9), j))
        for j in order[:k]:
            want.add((qi, j))
    assert {(x["qid"], x["vec_id"]) for x in base.collect()} == want
