"""Structured-Streaming ingest: backfill + SET/DEL upserts end-to-end
(reference semantics: /root/reference/src/index_schema.cc:591,840-865)."""

import time

from pyspark.sql import Row, functions as F

from valkey_search_spark import NumericField, SearchEngine, TagField
from valkey_search_spark.streaming.ingest import OP_DEL, OP_SET, DocumentStore

SF = "/root/testdata/sf0.001"


def _store(spark, tmp_path, n=100):
    docs = (spark.read.parquet(f"{SF}/part.parquet")
            .withColumn("__key", F.col("p_partkey").cast("string"))
            .limit(n))
    store = DocumentStore(spark, str(tmp_path / "docs"), num_buckets=8)
    store.backfill(docs)
    return store


def test_backfill_roundtrip(spark, tmp_path):
    store = _store(spark, tmp_path)
    assert store.read().count() == 100
    assert store.exists()


def test_batch_upsert_set_and_del(spark, tmp_path):
    store = _store(spark, tmp_path)
    base = store.read()
    one = base.where(F.col("__key") == "1").collect()[0].asDict()

    updated = dict(one, p_retailprice=9999.0)
    inserted = dict(one, __key="100001", p_partkey=100001, p_brand="Brand#99")
    muts = store.spark.createDataFrame([
        Row(**updated, __op=OP_SET, __seq=1),
        Row(**updated, __op=OP_SET, __seq=0),          # stale duplicate: loses
        Row(**inserted, __op=OP_SET, __seq=2),
        Row(**dict(one, __key="2"), __op=OP_DEL, __seq=3),
    ])
    store.apply_mutations(muts, seq_column="__seq")

    after = store.read()
    assert after.count() == 100  # +1 insert, -1 delete
    assert after.where("__key = '1'").collect()[0]["p_retailprice"] == 9999.0
    assert after.where("__key = '2'").count() == 0
    assert after.where("__key = '100001'").collect()[0]["p_brand"] == "Brand#99"


def test_streaming_foreachbatch(spark, tmp_path):
    store = _store(spark, tmp_path)
    one = store.read().where(F.col("__key") == "5").collect()[0].asDict()

    mut_dir = tmp_path / "mutations"
    mut_dir.mkdir()
    m1 = spark.createDataFrame([
        Row(**dict(one, p_retailprice=1234.5), __op=OP_SET),
        Row(**dict(one, __key="7"), __op=OP_DEL),
    ])
    m1.write.mode("append").parquet(str(mut_dir))

    stream = (spark.readStream.schema(m1.schema).parquet(str(mut_dir)))
    q = store.streaming_sink(stream, str(tmp_path / "ckpt"),
                             trigger={"availableNow": True})
    q.awaitTermination(120)

    after = store.read()
    assert after.where("__key = '5'").collect()[0]["p_retailprice"] == 1234.5
    assert after.where("__key = '7'").count() == 0
    assert after.count() == 99


def test_search_over_streamed_store(spark, tmp_path):
    """FT.CREATE over the store snapshot keeps working after upserts."""
    store = _store(spark, tmp_path)
    muts = store.spark.createDataFrame(
        [Row(**d, __op=OP_DEL) for d in
         (r.asDict() for r in store.read().where("p_brand = 'Brand#13'").collect())])
    store.apply_mutations(muts)

    eng = SearchEngine(spark)
    eng.ft_create("live", store.read(),
                  [TagField("p_brand"), NumericField("p_retailprice")],
                  key_column="p_partkey")
    assert eng.ft_search("live", "@p_brand:{Brand#13}", count_only=True) == 0
    assert eng.ft_search("live", "*", count_only=True) == store.read().count()


def test_ft_info_live_mutation_queue(spark, tmp_path):
    """FT.INFO reports LIVE mutation-queue state for an index whose
    DocumentStore has an active foreachBatch stream: nonzero
    mutation_queue_size while a batch is in flight, draining to 0 after
    (reference reports these from the background indexer,
    src/index_schema.h:215,462). Detached indexes keep the static
    ready/0 block."""
    store = _store(spark, tmp_path)
    eng = SearchEngine(spark)
    eng.ft_create("live", store.read(),
                  [TagField("p_brand"), NumericField("p_retailprice")],
                  key_column="p_partkey")
    eng.catalog.get("live").attach_store(store)

    before = eng.ft_info("live")
    assert before["mutation_queue_size"] == "0"
    assert before["state"] == "ready"

    one = store.read().where(F.col("__key") == "9").collect()[0].asDict()
    mut_dir = tmp_path / "mutations"
    mut_dir.mkdir()
    m1 = spark.createDataFrame([
        Row(**dict(one, p_retailprice=55.0), __op=OP_SET),
        Row(**dict(one, __key="11"), __op=OP_DEL),
    ])
    m1.write.mode("append").parquet(str(mut_dir))

    observed = {}

    def snapshot_mid_batch(n):
        # runs on the stream-execution thread between enqueue and apply:
        # FT.INFO must see the in-flight batch as queued mutations
        observed["info"] = eng.ft_info("live")

    stream = spark.readStream.schema(m1.schema).parquet(str(mut_dir))
    q = store.streaming_sink(stream, str(tmp_path / "ckpt"),
                             trigger={"availableNow": True},
                             _pre_apply=snapshot_mid_batch)
    q.awaitTermination(120)

    assert int(observed["info"]["mutation_queue_size"]) == 2
    after = eng.ft_info("live")
    assert after["mutation_queue_size"] == "0"       # queue drained
    assert after["state"] == "ready"
    assert store._applied_count == 2
    # backfill flag flips during a (synchronous) backfill
    assert after["backfill_in_progress"] == "0"
    assert after["backfill_complete_percent"] == "1.0"
