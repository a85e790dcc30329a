"""Engine surface for HNSW segment routing: ft_build_ann(algorithm=
"hnsw", partitioner="kmeans") + ft_search(..., ann_route=r)."""

from __future__ import annotations

import numpy as np
import pytest

from valkey_search_spark import SearchEngine, TagField, VectorField
from valkey_search_spark.errors import QuerySyntaxError


def _vec_df(spark, n_clusters=4, per=30, dim=8):
    rng = np.random.RandomState(5)
    rows = []
    for c in range(n_clusters):
        center = np.zeros(dim)
        center[c % dim] = 80.0 * (1 + c // dim)
        for i in range(per):
            v = center + rng.randn(dim)
            rows.append((c * per + i, f"c{c}",
                         [float(x) for x in v]))
    return spark.createDataFrame(
        rows, "doc_id bigint, grp string, embedding array<float>")


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    df = _vec_df(spark)
    e = SearchEngine(spark)
    e.ft_create("vr", df,
                [VectorField("embedding", dim=8, metric="l2"),
                 TagField("grp")],
                key_column="doc_id")
    path = str(tmp_path_factory.mktemp("eng_route") / "art")
    e.ft_build_ann("vr", "embedding", path, algorithm="hnsw",
                   partitioner="kmeans", n_segments=4,
                   max_segment_rows=10_000, m=8, ef_construction=40)
    return e, df


def test_routed_engine_knn_exact_on_clusters(eng):
    e, df = eng
    qv = [float(x) for x in
          df.where("doc_id = 0").first()["embedding"]]
    routed = e.ft_search("vr", "*=>[KNN 5 @embedding $v]",
                         params={"v": qv}, ann_ef=10**6, ann_route=1,
                         limit=(0, 5))
    full = e.ft_search("vr", "*=>[KNN 5 @embedding $v]",
                       params={"v": qv}, ann_ef=10**6, limit=(0, 5))
    a = sorted(r["doc_id"] for r in routed.collect())
    b = sorted(r["doc_id"] for r in full.collect())
    assert a == b and len(a) == 5


def test_routed_hybrid_inline_filter(eng):
    e, df = eng
    qv = [float(x) for x in
          df.where("doc_id = 35").first()["embedding"]]
    out = e.ft_search("vr", "@grp:{c1} =>[KNN 3 @embedding $v]",
                      params={"v": qv}, ann_ef=10**6, ann_route=1,
                      limit=(0, 3))
    rows = out.collect()
    assert len(rows) == 3
    assert all(r["grp"] == "c1" for r in rows)


def test_ann_route_requires_graph_artifact(spark, eng, tmp_path):
    e, df = eng
    e2 = SearchEngine(spark)
    e2.ft_create("vr_ivf", df, [VectorField("embedding", dim=8,
                                            metric="l2")],
                 key_column="doc_id")
    e2.ft_build_ann("vr_ivf", "embedding", str(tmp_path / "ivf"),
                    algorithm="ivf", n_lists=4)
    qv = [0.0] * 8
    with pytest.raises(QuerySyntaxError, match="ann_route"):
        e2.ft_search("vr_ivf", "*=>[KNN 3 @embedding $v]",
                     params={"v": qv}, ann_route=1)


def test_ann_route_requires_artifact_at_all(spark, eng):
    e, df = eng
    e3 = SearchEngine(spark)
    e3.ft_create("vr_plain", df, [VectorField("embedding", dim=8,
                                              metric="l2")],
                 key_column="doc_id")
    with pytest.raises(QuerySyntaxError, match="no ANN artifact"):
        e3.ft_search("vr_plain", "*=>[KNN 3 @embedding $v]",
                     params={"v": [0.0] * 8}, ann_route=2)


def test_ft_info_reports_partitioner_and_routability(eng):
    e, _ = eng
    info = e.catalog.info("vr")
    vec = next(a for a in info["attributes"]
               if a["attribute"] == "embedding")
    ann = vec["index"]["ann"]
    assert ann["partitioner"] == "kmeans"
    assert ann["routable_segments"] == ann["segments"]


def test_info_search_counts_routed_requests(eng):
    e, df = eng
    before = e.info_search()["query"].get("routed_requests_count", 0)
    qv = [float(x) for x in df.first()["embedding"]]
    e.ft_search("vr", "*=>[KNN 3 @embedding $v]", params={"v": qv},
                ann_ef=64, ann_route=2, limit=(0, 3)).collect()
    e.ft_search("vr", "*=>[KNN 3 @embedding $v]", params={"v": qv},
                ann_ef=64, limit=(0, 3)).collect()   # unrouted: no bump
    after = e.info_search()["query"]["routed_requests_count"]
    assert after == before + 1


def test_ann_route_without_ef_raises_not_full_scan(eng):
    # the dial must never silently fall through to the exact full scan
    e, df = eng
    qv = [float(x) for x in df.first()["embedding"]]
    with pytest.raises(QuerySyntaxError, match="ann_ef"):
        e.ft_search("vr", "*=>[KNN 3 @embedding $v]", params={"v": qv},
                    ann_route=1)
    # EF_RUNTIME in the query text engages the branch without ann_ef
    rows = e.ft_search("vr",
                       "*=>[KNN 3 @embedding $v EF_RUNTIME 64]",
                       params={"v": qv}, ann_route=1,
                       limit=(0, 3)).collect()
    assert len(rows) == 3


def test_ann_route_on_hash_artifact_is_query_error(spark, eng, tmp_path):
    e, df = eng
    e4 = SearchEngine(spark)
    e4.ft_create("vr_hash", df, [VectorField("embedding", dim=8,
                                             metric="l2")],
                 key_column="doc_id")
    e4.ft_build_ann("vr_hash", "embedding", str(tmp_path / "h"),
                    algorithm="hnsw", n_segments=2, m=4,
                    ef_construction=24, max_segment_rows=10_000)
    before = e4.info_search()["query"].get("routed_requests_count", 0)
    with pytest.raises(QuerySyntaxError, match="hash-partitioned"):
        e4.ft_search("vr_hash", "*=>[KNN 3 @embedding $v]",
                     params={"v": [0.0] * 8}, ann_ef=64, ann_route=1)
    # the failed dial-misuse never counted as a routed request
    assert e4.info_search()["query"].get("routed_requests_count",
                                         0) == before
