"""Retrieval-training capstone: the round-7 vector stack composed
end-to-end on the real documents table, no external embedding model —

  text -> hashed_embeddings (doc + chunk vectors)
       -> HNSWIndex over the corpus (graph tier)
       -> knn_join_hnsw first-stage retrieval
       -> maxsim_score late-interaction rerank over chunk-vector bags
       -> mine_hard_negatives training pairs

Every hop is oracle-pinned on its own (test_hnsw / test_late_interaction
/ test_negatives); this pins the COMPOSITION: schema compatibility,
key plumbing, and end-to-end invariants (self-retrieval at rank 1,
positives never mined, rerank preserves candidate sets)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from valkey_search_spark.operators.chunking import chunk_documents
from valkey_search_spark.operators.hnsw import HNSWIndex, knn_join_hnsw
from valkey_search_spark.operators.late_interaction import maxsim_score
from valkey_search_spark.operators.negatives import mine_hard_negatives
from valkey_search_spark.operators.textops import hashed_embeddings

from .conftest import load


@pytest.fixture(scope="module")
def stack(spark, sf_dir, tmp_path_factory):
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    emb = hashed_embeddings(docs, dim=128).select("doc_id", "text",
                                                  "embedding")
    path = str(tmp_path_factory.mktemp("cap") / "hnsw")
    idx = HNSWIndex.build(emb, path, vec_col="embedding",
                          key_col="doc_id", metric="cosine", m=8,
                          ef_construction=60, max_segment_rows=200)
    return docs, emb, idx


def test_first_stage_self_retrieval_rank_one(stack):
    docs, emb, idx = stack
    queries = (emb.where(F.col("doc_id") < 25)
               .select(F.col("doc_id").alias("qid"), "embedding"))
    hits = knn_join_hnsw(queries, idx, k=5, ef=10 ** 6)
    rank1 = {r["qid"]: r["doc_id"] for r in hits.where("rank = 1").collect()}
    # a document is its own nearest neighbor under cosine (dup texts
    # tie at distance 0 and may win the key tiebreak — allow those)
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert len(rank1) == 25
    for qid, did in rank1.items():
        assert did == qid or texts[did] == texts[qid]


def test_rerank_scores_candidates_consistently(stack, spark, sf_dir):
    docs, emb, idx = stack
    queries = (emb.where(F.col("doc_id") < 10)
               .select(F.col("doc_id").alias("qid"), "embedding"))
    cand = knn_join_hnsw(queries, idx, k=8, ef=64).select(
        "qid", F.col("doc_id").alias("cid"))

    # chunk-vector bags for late-interaction rerank (multi-vector view
    # of the same corpus, still model-free)
    chunks = chunk_documents(docs, chunk_tokens=40)
    cvec = hashed_embeddings(chunks, text_col="chunk_text", dim=128)
    bags = (cvec.groupBy("doc_id")
            .agg(F.sort_array(F.collect_list(
                F.struct("chunk_idx", "embedding"))).alias("s"))
            .select("doc_id", F.col("s.embedding").alias("vecs")))
    qbags = bags.where(F.col("doc_id") < 10).select(
        F.col("doc_id").alias("qid"), "vecs")
    dbags = bags.select(F.col("doc_id").alias("cid"), "vecs")

    rescored = maxsim_score(qbags, dbags, pairs=cand, query_key="qid",
                            doc_key="cid", metric="cosine")
    rows = rescored.collect()
    # the rerank returns exactly the candidate pairs, all scored
    assert {(r["qid"], r["cid"]) for r in rows} == \
        {(r["qid"], r["cid"]) for r in cand.collect()}
    byq = {}
    for r in rows:
        byq.setdefault(r["qid"], []).append((r["cid"], r["score"]))
    for qid, scored in byq.items():
        assert all(s == s for _, s in scored)        # no NaNs
        # when the query's own document survived the first stage, its
        # self-match (every chunk at cosine 1.0) must score at the top
        # (dup texts may TIE it, never beat it)
        self_score = next((s for c, s in scored if c == qid), None)
        if self_score is not None:
            assert self_score == pytest.approx(
                max(s for _, s in scored), rel=1e-9)


def test_mined_negatives_exclude_self_and_are_ranked(stack):
    docs, emb, idx = stack
    queries = (emb.where(F.col("doc_id") < 20)
               .select(F.col("doc_id").alias("qid"), "embedding"))
    corpus = emb.select(F.col("doc_id").alias("cid"), "embedding")
    positives = queries.select("qid", F.col("qid").alias("cid"))
    neg = mine_hard_negatives(queries, corpus, positives, k=4,
                              margin=0.05, metric="cosine")
    rows = neg.collect()
    assert rows, "mining produced no pairs"
    for r in rows:
        assert r["cid"] != r["qid"]
        assert 1 <= r["rank"] <= 4
    # ranks are dense per query and ordered by distance
    byq = {}
    for r in rows:
        byq.setdefault(r["qid"], []).append((r["rank"], r["distance"]))
    for qid, lst in byq.items():
        lst.sort()
        assert [t[0] for t in lst] == list(range(1, len(lst) + 1))
        assert all(lst[i][1] <= lst[i + 1][1] for i in range(len(lst) - 1))


def test_routed_first_stage_self_retrieval(stack, tmp_path):
    # round-8: the first-stage retrieval on a kmeans-partitioned index
    # with a REAL routed r=1 — a query's own segment is by construction
    # its nearest centroid, so self-retrieval still lands rank 1 even
    # with every other cluster pruned. (r == cluster count dispatches
    # to the unrouted branch by contract — checked as a dispatch test,
    # not a routing test.)
    docs, emb, idx = stack
    kidx = HNSWIndex.build(emb, str(tmp_path / "khnsw"),
                           vec_col="embedding", key_col="doc_id",
                           metric="cosine", m=8, ef_construction=60,
                           max_segment_rows=200, partitioner="kmeans")
    queries = (emb.where(F.col("doc_id") < 25)
               .select(F.col("doc_id").alias("qid"), "embedding"))
    full = knn_join_hnsw(queries, kidx, k=5, ef=10 ** 6)
    dispatch = knn_join_hnsw(queries, kidx, k=5, ef=10 ** 6,
                             route_segments=len(kidx.seg_map))
    a = sorted((r["qid"], r["doc_id"], r["rank"]) for r in full.collect())
    b = sorted((r["qid"], r["doc_id"], r["rank"])
               for r in dispatch.collect())
    assert a == b                       # r >= clusters -> full probe
    routed = knn_join_hnsw(queries, kidx, k=5, ef=10 ** 6,
                           route_segments=1)
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    rank1 = {r["qid"]: r["doc_id"]
             for r in routed.where("rank = 1").collect()}
    assert len(rank1) == 25
    for qid, did in rank1.items():
        assert did == qid or texts[did] == texts[qid]
