"""Embedding near-dup: OR-amplified hyperplane LSH vs exact pairs."""

from valkey_search_spark.operators import dedup as dd

SF = "/root/testdata/sf0.001"


def _pairs(df):
    return {(r["a"], r["b"]) for r in df.collect()}


def test_default_lsh_path_matches_exact(spark):
    """The DEFAULT path is LSH; at the driver's threshold it must recover
    every exact pair (auto-tuned k/L target 1e-4 miss; deterministic for
    the fixed seed + data)."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    exact = _pairs(dd.embedding_cosine_pairs(emb, "vec_id", threshold=0.4,
                                             exact=True))
    lsh_df = dd.embedding_cosine_pairs(emb, "vec_id", threshold=0.4)
    lsh = _pairs(lsh_df)
    assert lsh == exact
    dd.release(lsh_df)


def test_undersized_lsh_recall_and_precision(spark):
    """With deliberately small k/L the s-curve still gives >=0.9 recall,
    and the exact verify step guarantees zero false pairs."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    exact = _pairs(dd.embedding_cosine_pairs(emb, "vec_id", threshold=0.4,
                                             exact=True))
    lsh = _pairs(dd.embedding_cosine_pairs(emb, "vec_id", threshold=0.4,
                                           lsh_planes=3, lsh_tables=12))
    assert lsh <= exact                       # exact verify: no false pairs
    assert len(lsh & exact) / max(len(exact), 1) >= 0.9   # OR-amplified recall


def test_auto_params_follow_threshold():
    k_tight, l_tight = dd.auto_lsh_params(0.95)
    k_loose, l_loose = dd.auto_lsh_params(0.4)
    assert k_tight > k_loose            # high threshold -> deeper tables
    assert k_loose >= 2 and l_loose >= 8
    # bulk pruning at the tight threshold: candidate rate for cosine~0
    # pairs is L/2^k — must be well under 1%
    assert l_tight / 2 ** k_tight < 0.01


def test_release_unpersists(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    out = dd.embedding_cosine_pairs(emb, "vec_id", threshold=0.4)
    out.count()
    assert getattr(out, "_vss_cached")
    dd.release(out, blocking=True)
    assert not out._vss_cached
