"""Property check for the routing contract: on ARBITRARY (even
adversarial, non-clusterable) data, a routed search over ALL clusters
must equal the unrouted search row-for-row, and full-explore unrouted
equals brute force — i.e. routing can only ever prune, never corrupt.
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


@pytest.mark.parametrize("n,dim,nseg,metric,seed", CASES)
def test_route_all_equals_unrouted_on_random_data(spark, tmp_path, n,
                                                  dim, nseg, metric,
                                                  seed):
    rng = np.random.RandomState(seed)
    mat = rng.randn(n, dim)
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
    base = knn_join_hnsw(q, idx, k=4, ef=10**6)
    routed = knn_join_hnsw(q, idx, k=4, ef=10**6,
                           route_segments=len(idx.seg_map))
    a = sorted((r["qid"], r["vec_id"], round(r["distance"], 9), r["rank"])
               for r in base.collect())
    b = sorted((r["qid"], r["vec_id"], round(r["distance"], 9), r["rank"])
               for r in routed.collect())
    assert a == b
    # and the unrouted full-explore is EXACT vs numpy brute force
    want = set()
    qm = mat[:8]
    cm = mat.copy()
    if metric == "cosine":
        qm = qm / np.linalg.norm(qm, axis=1, keepdims=True)
        cm = cm / np.linalg.norm(cm, axis=1, keepdims=True)
    for qi in range(min(8, n)):
        if metric == "l2":
            d = np.sqrt(((cm - qm[qi]) ** 2).sum(1))
        else:
            d = 1.0 - cm @ qm[qi]
        order = sorted(range(n), key=lambda j: (round(float(d[j]), 9), j))
        for j in order[:4]:
            want.add((qi, j))
    assert {(x[0], x[1]) for x in a} == want
