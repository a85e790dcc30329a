"""applyInPandasWithState operator: state evolves across micro-batches."""

from pyspark.sql import functions as F

from valkey_search_spark.sources.tables import load_table
from valkey_search_spark.streaming.stateful import running_corpus_stats

SF = "/root/testdata/sf0.001"


def _run(spark, src, ckpt, sink: dict):
    docs_schema = load_table(spark, SF, "documents").schema
    stream = spark.readStream.schema(docs_schema).parquet(str(src))

    def absorb(batch_df, epoch):
        for r in batch_df.collect():
            sink[r["group_key"]] = r

    q = (running_corpus_stats(stream, group_col="source")
         .writeStream.foreachBatch(absorb)
         .outputMode("update")
         .option("checkpointLocation", str(ckpt))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)


def test_running_stats_across_batches(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    b1 = docs.where("doc_id < 200")
    b2 = docs.where("doc_id >= 200")

    src = tmp_path / "stream"
    src.mkdir()
    ckpt = tmp_path / "ck"

    b1.write.mode("append").parquet(str(src))
    first: dict = {}
    _run(spark, src, ckpt, first)
    assert sum(r["docs"] for r in first.values()) == b1.count()

    # second batch arrives; resume from the SAME checkpoint -> state resumes
    b2.write.mode("append").parquet(str(src))
    second: dict = {}
    _run(spark, src, ckpt, second)

    merged = dict(first)
    merged.update(second)   # groups untouched by batch 2 keep batch-1 totals
    assert sum(r["docs"] for r in merged.values()) == docs.count()
    per_group = {r["source"]: r["n"] for r in
                 docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert {k: v["docs"] for k, v in merged.items()} == per_group
    assert all(r["uniques"] <= r["docs"] for r in merged.values())
