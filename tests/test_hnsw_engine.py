"""Engine routing for the segment-graph HNSW artifact:
ft_build_ann(algorithm="hnsw") + ann_ef / EF_RUNTIME dials
(/root/reference/src/indexes/vector_hnsw.cc ef_runtime;
ft.create.md M / EF_CONSTRUCTION)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from valkey_search_spark import SearchEngine, NumericField
from valkey_search_spark.catalog import VectorField
from valkey_search_spark.errors import QuerySyntaxError

from .conftest import load

QVEC = [round(math.sin(i + 1), 6) for i in range(64)]


@pytest.fixture(scope="module")
def eng(spark, sf_dir, tmp_path_factory):
    emb = load(spark, sf_dir, "embeddings")
    e = SearchEngine(spark)
    e.ft_create("hemb", emb, [
        VectorField("embedding", dim=64, metric="l2", algo="hnsw",
                    m=8, ef_construction=60),
        NumericField("label")], key_column="vec_id")
    e.ft_build_ann("hemb", "embedding",
                   str(tmp_path_factory.mktemp("hnsw_art") / "idx"),
                   algorithm="hnsw", max_segment_rows=40)
    return e, emb


def _brute(rows, k, pred=lambda r: True):
    q = np.asarray(QVEC, dtype=np.float64)
    scored = []
    for r in rows:
        if not pred(r):
            continue
        v = np.asarray(r["embedding"], dtype=np.float64)
        scored.append((float(np.sqrt(((v - q) ** 2).sum())), r["vec_id"]))
    return [v for _, v in sorted(scored)[:k]]


def test_matchall_ann_ef_full_explore_exact(eng):
    e, emb = eng
    df = e.ft_search("hemb", "*=>[KNN 5 @embedding $v AS dist]",
                     params={"v": QVEC}, ann_ef=10 ** 6)
    got = [r["vec_id"] for r in df.orderBy("dist", "vec_id").collect()]
    assert got == _brute(emb.collect(), 5)


def test_ef_runtime_routes_to_graph_beam(eng):
    e, emb = eng
    df = e.ft_search(
        "hemb", "@label:[3 5]=>[KNN 5 @embedding $v EF_RUNTIME 1000000 AS dist]",
        params={"v": QVEC})
    got = [r["vec_id"] for r in df.orderBy("dist", "vec_id").collect()]
    assert got == _brute(emb.collect(), 5, lambda r: 3 <= r["label"] <= 5)
    # inline mode recorded (predicate evaluated in-traversal)
    ex = e.ft_explain(
        "hemb", "@label:[3 5]=>[KNN 5 @embedding $v EF_RUNTIME 64 AS dist]",
        params={"v": QVEC})
    assert ex["knn"]["mode"] == "inline"


def test_planner_defaults_beam_for_loose_hybrid(eng):
    e, emb = eng
    # loose filter + no dials: the planner picks the inline graph path
    ex = e.ft_explain("hemb", "@label:[0 9]=>[KNN 5 @embedding $v AS dist]",
                      params={"v": QVEC})
    assert ex["knn"]["mode"] == "inline"
    n = e.ft_search("hemb", "@label:[0 9]=>[KNN 5 @embedding $v AS dist]",
                    params={"v": QVEC}, count_only=True)
    assert n == 5


def test_count_only_and_return_projection(eng):
    e, emb = eng
    n = e.ft_search("hemb", "*=>[KNN 7 @embedding $v AS dist]",
                    params={"v": QVEC}, ann_ef=10 ** 6, count_only=True)
    assert n == 7
    df = e.ft_search("hemb", "*=>[KNN 3 @embedding $v AS dist]",
                     params={"v": QVEC}, ann_ef=10 ** 6,
                     return_fields=["label"])
    rows = df.collect()
    assert len(rows) == 3 and set(df.columns) >= {"label", "dist"}


def test_ft_info_reports_graph_artifact(eng):
    e, _ = eng
    info = e.catalog.info("hemb")
    vec = next(a for a in info["attributes"] if a["attribute"] == "embedding")
    assert vec["index"]["algorithm"] == {
        "name": "HNSW", "m": 8, "ef_construction": 60}
    assert vec["index"]["ann"]["storage"] == "float32_graph"
    assert vec["index"]["ann"]["segments"] >= 1


def test_delete_by_document_key_masks_engine_results(spark, sf_dir,
                                                     tmp_path):
    # throwaway engine + artifact: the delete is by DOCUMENT key
    # (__key, the stringified key column — the reference's
    # RemoveRecord surface)
    emb = load(spark, sf_dir, "embeddings")
    e = SearchEngine(spark)
    e.ft_create("hmut", emb, [
        VectorField("embedding", dim=64, metric="l2", algo="hnsw",
                    m=8, ef_construction=60),
        NumericField("label")], key_column="vec_id")
    art = e.ft_build_ann("hmut", "embedding", str(tmp_path / "idx"),
                         algorithm="hnsw", max_segment_rows=60)
    winner = _brute(emb.collect(), 1)[0]
    art.delete([str(winner)])
    df = e.ft_search("hmut", "*=>[KNN 5 @embedding $v AS dist]",
                     params={"v": QVEC}, ann_ef=10 ** 6)
    got = [r["vec_id"] for r in df.orderBy("dist", "vec_id").collect()]
    assert winner not in got
    assert got == [v for v in _brute(emb.collect(), 6) if v != winner][:5]


def test_unknown_algorithm_rejected(eng, tmp_path):
    e, _ = eng
    with pytest.raises(QuerySyntaxError):
        e.ft_build_ann("hemb", "embedding", str(tmp_path / "x"),
                       algorithm="faiss")


def test_wrong_dial_for_artifact_kind_raises(eng):
    e, _ = eng
    with pytest.raises(QuerySyntaxError):
        e.ft_search("hemb", "*=>[KNN 5 @embedding $v AS dist]",
                    params={"v": QVEC}, ann_nprobe=4)


def test_graph_payload_excludes_raw_columns(eng):
    # the artifact persists only predicate-visible derived columns —
    # raw source columns / the corpus text never duplicate into it
    e, _ = eng
    art = e.catalog.get("hemb")._ann["embedding"]
    assert all(c.startswith(("_t_", "_n_", "_x_", "_s_", "_sp_", "__fm_"))
               for c in art.payload_cols)
    assert any(c == "_n_label" for c in art.payload_cols)
