"""Training-shard writer: determinism, balance, token-budget sizing,
ordering, and file-size bounding."""

import glob

import pytest
from pyspark.sql import functions as F

from valkey_search_spark.operators.sharding import write_training_shards

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_all_rows_once_and_balanced(spark, docs, tmp_path):
    n = docs.count()
    man = write_training_shards(docs, str(tmp_path / "sh"), key="doc_id",
                                n_shards=8, seed=1).collect()
    assert sum(r["rows"] for r in man) == n
    assert len(man) == 8
    rows = [r["rows"] for r in man]
    assert max(rows) < 2.0 * min(rows)         # hash balance at n=1000
    back = spark.read.parquet(str(tmp_path / "sh"))
    assert back.select("doc_id").distinct().count() == n


def test_deterministic_membership_and_order(spark, docs, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_training_shards(docs, a, key="doc_id", n_shards=4, seed=7)
    write_training_shards(docs, b, key="doc_id", n_shards=4, seed=7)
    fa = spark.read.parquet(a).select("__shard", "doc_id").collect()
    fb = spark.read.parquet(b).select("__shard", "doc_id").collect()
    assert {(r["__shard"], r["doc_id"]) for r in fa} == \
           {(r["__shard"], r["doc_id"]) for r in fb}
    # a different seed reshuffles membership
    c = str(tmp_path / "c")
    write_training_shards(docs, c, key="doc_id", n_shards=4, seed=8)
    fc = {(r["__shard"], r["doc_id"]) for r in
          spark.read.parquet(c).select("__shard", "doc_id").collect()}
    assert fc != {(r["__shard"], r["doc_id"]) for r in fa}


def test_intra_shard_order_is_hash_shuffled(spark, docs, tmp_path):
    """Rows inside one shard file are in xxhash64(key, seed+1) order —
    a pseudo-random permutation, not ingest order."""
    path = str(tmp_path / "sh")
    write_training_shards(docs, path, key="doc_id", n_shards=2, seed=3)
    files = sorted(glob.glob(f"{path}/__shard=0/*.parquet"))
    got = [r["doc_id"] for r in
           spark.read.parquet(files[0]).select("doc_id").collect()]
    want = sorted(
        got, key=lambda d: spark.sql(
            f"SELECT xxhash64(CAST({d} AS STRING), 4)").first()[0])
    assert got == want and got != sorted(got)


def test_token_budget_sizing(spark, docs, tmp_path):
    toks = docs.withColumn("tok", F.size(F.split("text", " ")))
    total = toks.agg(F.sum("tok")).first()[0]
    target = total // 5
    man = write_training_shards(toks, str(tmp_path / "sh"), key="doc_id",
                                token_col="tok",
                                target_tokens_per_shard=target).collect()
    assert len(man) in (5, 6)
    assert sum(r["tokens"] for r in man) == total


def test_max_records_per_file(spark, docs, tmp_path):
    path = str(tmp_path / "sh")
    write_training_shards(docs, path, key="doc_id", n_shards=2, seed=1,
                          max_records_per_file=100)
    for f in glob.glob(f"{path}/__shard=*/*.parquet"):
        assert spark.read.parquet(f).count() <= 100


def test_argument_contract(spark, docs, tmp_path):
    with pytest.raises(ValueError, match="exactly one"):
        write_training_shards(docs, str(tmp_path / "x"), key="doc_id")
    with pytest.raises(ValueError, match="token_col"):
        write_training_shards(docs, str(tmp_path / "x"), key="doc_id",
                              target_tokens_per_shard=100)


def test_jsonl_output(spark, docs, tmp_path):
    import gzip
    import json

    man = write_training_shards(docs, str(tmp_path / "j"), key="doc_id",
                                n_shards=4, seed=1, fmt="jsonl",
                                compression="gzip").collect()
    assert sum(r["rows"] for r in man) == docs.count()
    files = sorted(glob.glob(str(tmp_path / "j" / "__shard=0" / "*.gz")))
    assert files, "expected gzip jsonl part files"
    # each line is a standalone JSON object a dataloader can stream
    with gzip.open(files[0], "rt", encoding="utf-8") as fh:
        first = json.loads(fh.readline())
    assert {"doc_id", "text"} <= set(first)
    # membership identical to the parquet form at the same seed
    write_training_shards(docs, str(tmp_path / "p"), key="doc_id",
                          n_shards=4, seed=1)
    pq = {(r["doc_id"], r["__shard"]) for r in
          spark.read.parquet(str(tmp_path / "p"))
          .select("doc_id", "__shard").collect()}
    js = {(int(r["doc_id"]), int(r["__shard"])) for r in
          spark.read.json(str(tmp_path / "j"))
          .select("doc_id", "__shard").collect()}
    assert pq == js
    with pytest.raises(ValueError):
        write_training_shards(docs, str(tmp_path / "x"), key="doc_id",
                              n_shards=2, fmt="csvish")


def test_jsonl_all_null_column_survives_manifest(spark, docs, tmp_path):
    # the JSON writer drops all-null fields from every line; the
    # explicit read schema must keep the column so the token manifest
    # still aggregates (review finding)
    d = docs.withColumn("ntok", F.lit(None).cast("long"))
    man = write_training_shards(d, str(tmp_path / "nj"), key="doc_id",
                                n_shards=2, fmt="jsonl",
                                token_col="ntok").collect()
    assert len(man) == 2
    assert all(r["tokens"] is None for r in man)
