"""Streaming near-dup gate: batch parity with minhash_lsh_pairs,
stream-static corpus gate, stateful within-stream detection."""
from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from valkey_search_spark.operators.dedup import minhash_lsh_pairs
from valkey_search_spark.streaming.neardup import (
    minhash_band_table, neardup_gate, neardup_within_stream,
)

KW = dict(num_hashes=32, bands=8, shingle_n=3)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _corpus(spark):
    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep green forest tonight")
    rows = [(i, f"doc {i} " + " ".join(
        f"w{(i * 7 + j * 13) % 97}" for j in range(30))) for i in range(20)]
    rows.append((100, base))
    return _docs(spark, rows), base


def test_batch_parity_with_lsh_pairs(spark):
    # a doc near-duplicating corpus doc 100 must be flagged by the gate,
    # and the gate's candidate set must agree with the batch operator's
    corpus, base = _corpus(spark)
    probe = _docs(spark, [(200, base + " extra"), (201, "totally unrelated "
                          + " ".join(f"z{j}" for j in range(25)))])
    bands = minhash_band_table(corpus, "doc_id", **KW).persist()
    got = {(r["doc_id"], r["matched_key"]): r["est_jaccard"]
           for r in neardup_gate(probe, bands, threshold=0.5, **KW)
           .collect()}
    assert (200, 100) in got and got[(200, 100)] >= 0.5
    assert not any(k[0] == 201 for k in got)
    # batch cross-check: union corpus+probe, the pair (100, 200) is a
    # minhash_lsh_pairs candidate at the same parameters
    both = corpus.unionByName(probe)
    pairs = {(r["a"], r["b"]) for r in
             minhash_lsh_pairs(both, "doc_id", threshold=0.5, **KW)
             .collect()}
    assert (100, 200) in pairs
    bands.unpersist()


def test_est_jaccard_exact_dup_is_one(spark):
    corpus, base = _corpus(spark)
    bands = minhash_band_table(corpus, "doc_id", **KW)
    probe = _docs(spark, [(300, base)])
    rows = neardup_gate(probe, bands, threshold=0.9, **KW).collect()
    assert [(r["doc_id"], r["matched_key"], r["est_jaccard"])
            for r in rows] == [(300, 100, 1.0)]


def test_stream_static_gate(spark, tmp_path):
    corpus, base = _corpus(spark)
    bands = minhash_band_table(corpus, "doc_id", **KW).persist()
    bands.count()

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    probe = _docs(spark, [(400, base + " tail"), (401, " ".join(
        f"q{j}" for j in range(30)))])
    probe.write.mode("append").parquet(str(in_dir))

    stream = spark.readStream.schema(probe.schema).parquet(str(in_dir))
    out = neardup_gate(stream, bands, threshold=0.4, **KW)
    q = (out.writeStream.format("memory").queryName("nd_gate")
         .outputMode("append").trigger(availableNow=True)
         .option("checkpointLocation", str(tmp_path / "ckpt")).start())
    q.awaitTermination(120)
    rows = spark.sql("select * from nd_gate").collect()
    assert any(r["doc_id"] == 400 and r["matched_key"] == 100 for r in rows)
    assert not any(r["doc_id"] == 401 for r in rows)
    bands.unpersist()


def test_within_stream_two_batches(spark, tmp_path):
    in_dir = tmp_path / "in2"
    in_dir.mkdir()
    base = " ".join(f"t{j}" for j in range(40))
    other = " ".join(f"u{j}" for j in range(40))
    b1 = _docs(spark, [(1, base), (2, other)])
    b1.write.mode("append").parquet(str(in_dir))

    stream = spark.readStream.schema(b1.schema).parquet(str(in_dir))
    out = neardup_within_stream(stream, **KW)
    got: list = []

    def run_once():
        q = (out.writeStream.foreachBatch(
                lambda df, _n: got.extend(df.collect()))
             .outputMode("append").trigger(availableNow=True)
             .option("checkpointLocation", str(tmp_path / "ckpt2")).start())
        q.awaitTermination(120)

    run_once()
    first = list(got)
    # batch 1: no doc may match anything (empty buckets)
    assert all(r["matched_key"] is None or r["matched_key"] != r["key"]
               for r in first)
    best1 = {}
    for r in first:
        if r["est_jaccard"] is not None:
            best1[r["key"]] = max(best1.get(r["key"], 0), r["est_jaccard"])
    assert best1.get("1", 0) < 0.5 and best1.get("2", 0) < 0.5

    # batch 2: an exact dup of doc 1 and a fresh doc; state recovers
    # from the checkpoint, so doc 1's signatures are still in-bucket
    _docs(spark, [(3, base), (4, " ".join(f"v{j}" for j in range(40)))]) \
        .write.mode("append").parquet(str(in_dir))
    got.clear()
    run_once()
    second = list(got)
    hit = [r for r in second if r["key"] == "3" and r["matched_key"] == "1"
           and r["est_jaccard"] == 1.0]
    assert hit, f"dup of doc 1 not detected: {second}"
    assert all(not (r["key"] == "4" and (r["est_jaccard"] or 0) > 0.5)
               for r in second)


def test_band_table_single_signature_no_filter_inlining(spark):
    # the expensive tokenizer chain must appear ONCE in the plan — a
    # filter on the derived __sig would get pushed below the projection
    # with the whole expression substituted in (measured trap)
    corpus, _ = _corpus(spark)
    t = minhash_band_table(corpus, "doc_id", **KW)
    plan = t._jdf.queryExecution().executedPlan().toString()
    assert plan.count("regexp_extract_all") <= 1


def test_short_docs_null_bucket_never_match(spark):
    corpus, _ = _corpus(spark)
    bands = minhash_band_table(corpus, "doc_id", **KW)
    probe = _docs(spark, [(500, "too short"), (501, "")])
    assert neardup_gate(probe, bands, threshold=0.0, **KW).collect() == []
    # identical sub-shingle docs don't false-match via null buckets
    shorts = _docs(spark, [(1, "a b"), (2, "a b")])
    b2 = minhash_band_table(shorts, "doc_id", **KW)
    assert neardup_gate(shorts, b2, threshold=0.0, **KW) \
        .where("doc_id != matched_key").collect() == []


def test_stream_gate_watermark_bounded_dedup(spark, tmp_path):
    corpus, base = _corpus(spark)
    bands = minhash_band_table(corpus, "doc_id", **KW).persist()
    bands.count()
    in_dir = tmp_path / "in_wm"
    in_dir.mkdir()
    probe = spark.createDataFrame(
        [(600, base, "2024-01-01 00:00:00")],
        "doc_id long, text string, ts string") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    probe.write.mode("append").parquet(str(in_dir))
    stream = spark.readStream.schema(probe.schema).parquet(str(in_dir))
    out = neardup_gate(stream, bands, threshold=0.9,
                       watermark=("ts", "10 minutes"), **KW)
    q = (out.writeStream.format("memory").queryName("nd_wm")
         .outputMode("append").trigger(availableNow=True)
         .option("checkpointLocation", str(tmp_path / "ckpt_wm")).start())
    q.awaitTermination(120)
    rows = spark.sql("select * from nd_wm").collect()
    # the exact dup matched in all 8 bands; watermark dedup -> one row
    assert len([r for r in rows if r["doc_id"] == 600]) == 1
    assert rows[0]["matched_key"] == 100 and rows[0]["est_jaccard"] == 1.0
    bands.unpersist()


def test_band_table_matches_batch_bucketing(spark):
    # same doc -> same (band, bucket) set regardless of frame identity
    corpus, _ = _corpus(spark)
    t1 = minhash_band_table(corpus, "doc_id", **KW).collect()
    t2 = minhash_band_table(corpus.repartition(4), "doc_id", **KW).collect()
    as_set = lambda t: {(r["doc_id"], r["band"], r["bucket"]) for r in t}
    assert as_set(t1) == as_set(t2)
    assert len(t1) == corpus.count() * KW["bands"]
