"""Embedding near-dup: OR-amplified hyperplane LSH vs exact pairs."""

from valkey_search_spark.operators import dedup as dd

SF = "/root/testdata/sf0.001"


def test_lsh_mode_recall_and_precision(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    exact = {(r["a"], r["b"]) for r in
             dd.embedding_cosine_pairs(emb, "vec_id", threshold=0.4).collect()}
    lsh = {(r["a"], r["b"]) for r in
           dd.embedding_cosine_pairs(emb, "vec_id", threshold=0.4,
                                     lsh_planes=3, lsh_tables=12).collect()}
    assert lsh <= exact                       # exact verify: no false pairs
    assert len(lsh & exact) / max(len(exact), 1) >= 0.9   # OR-amplified recall
