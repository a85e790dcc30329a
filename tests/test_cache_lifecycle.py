"""Persisted-intermediate lifecycle: release() and Catalog.drop must not
leak cached RDDs across repeated operator calls in a long-lived session."""

from pyspark.sql import functions as F

from valkey_search_spark import SearchEngine, TagField, TextField
from valkey_search_spark.operators import dedup as dd

SF = "/root/testdata/sf0.001"


def _n_cached(spark):
    return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())


def test_minhash_release_frees_storage(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    before = _n_cached(spark)
    out = dd.minhash_lsh_pairs(docs, "doc_id", threshold=0.5)
    out.count()
    assert _n_cached(spark) > before          # intermediates cached
    dd.release(out, blocking=True)
    assert _n_cached(spark) == before         # all freed


def test_embedding_release_frees_storage(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    before = _n_cached(spark)
    # forced-LSH path (the one that persists unit vectors)
    out = dd.embedding_cosine_pairs(emb, "vec_id", threshold=0.4,
                                    lsh_planes=3, lsh_tables=8)
    out.count()
    dd.release(out, blocking=True)
    assert _n_cached(spark) == before
    # block path persists nothing at all
    blk = dd.embedding_cosine_pairs(emb, "vec_id", threshold=0.4)
    blk.count()
    assert _n_cached(spark) == before


def test_catalog_drop_unpersists_index_cache(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    e = SearchEngine(spark)
    before = _n_cached(spark)
    e.ft_create("cache_lc", docs, [TextField("text"), TagField("lang")],
                key_column="doc_id", cache=True)
    e.ft_search("cache_lc", "@lang:{en}", count_only=True)  # materialize
    assert _n_cached(spark) > before
    e.ft_dropindex("cache_lc")
    # unpersist is async by default; poll briefly
    import time

    for _ in range(50):
        if _n_cached(spark) == before:
            break
        time.sleep(0.1)
    assert _n_cached(spark) == before


def test_pipeline_propagates_minhash_handles(spark):
    """curate_documents consumes minhash_lsh_pairs; the pairs frame's
    persisted handles must ride on the returned clean frame so a
    long-lived session can release() them (the leak class _with_handles
    exists to prevent)."""
    from valkey_search_spark.operators import dedup as dd
    from valkey_search_spark.operators.pipeline import (
        CurationConfig, curate_documents,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    clean, _ = curate_documents(
        docs, config=CurationConfig(min_quality=0.0, min_tokens=0,
                                    near_dup_threshold=0.8),
        with_funnel=False)
    handles = getattr(clean, "_vss_cached", [])
    assert handles, "minhash persist handles must propagate to clean_df"
    clean.count()
    assert any(c.storageLevel.useMemory or c.storageLevel.useDisk
               for c in handles)
    dd.release(clean)
    assert all(not (c.storageLevel.useMemory or c.storageLevel.useDisk)
               for c in handles)
