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


def test_streaming_endurance_snapshots(spark, tmp_path):
    """Endurance: 8 micro-batches of mixed upserts/deletes/inserts driven
    through a REAL restarted stream (same checkpoint — exercises
    exactly-once resume), racing ft_search calls. A pure-Python dict
    model is the consistency oracle: the mid-batch query (via the
    _pre_apply hook, i.e. while the batch is queued but not applied)
    must see exactly the previous snapshot, and the post-batch query
    exactly the new one. Reference analogue: stability_test.py.
    Mid-REWRITE reads are not exercised: the parquet store's
    multi-partition overwrite is not atomic (an MVCC table format owns
    that at production scale)."""
    import random

    store = _store(spark, tmp_path, n=200)
    eng = SearchEngine(spark)
    model = {r["__key"]: r.asDict() for r in store.read().collect()}
    template = next(iter(model.values()))
    mut_dir = tmp_path / "endur_muts"
    mut_dir.mkdir()
    ckpt = str(tmp_path / "endur_ckpt")
    rng = random.Random(5)
    mut_schema = None
    seq = 0

    def live_count():
        eng.ft_create("endur", store.read(),
                      [TagField("p_brand"), NumericField("p_retailprice")],
                      key_column="p_partkey")
        return eng.ft_search("endur", "*", count_only=True)

    for step in range(8):
        before = len(model)
        rows = []
        keys = sorted(model)

        def emit(doc, op):
            nonlocal seq
            seq += 1
            rows.append(Row(**doc, __op=op, __seq=seq))

        for k in rng.sample(keys, 5):               # upserts
            model[k] = dict(model[k], p_retailprice=1000.0 + step)
            emit(model[k], OP_SET)
        for k in rng.sample(sorted(model), 3):      # deletes (a key may
            emit(model.pop(k), OP_DEL)              # also be upserted
        newk = str(900000 + step)                   # above: __seq decides)
        doc = dict(template, __key=newk, p_partkey=int(newk),
                   p_brand="Brand#55", p_retailprice=500.0 + step)
        model[newk] = doc
        emit(doc, OP_SET)
        batch = spark.createDataFrame(rows, schema=mut_schema)
        mut_schema = mut_schema or batch.schema
        batch.write.mode("append").parquet(str(mut_dir))

        seen_mid = {}

        def mid_batch(n, _b=before):
            seen_mid["count"] = live_count()

        # constant source path across restarts: the checkpoint's file
        # log marks prior batches processed, so each restart picks up
        # exactly the files appended since
        stream = spark.readStream.schema(mut_schema).parquet(str(mut_dir))
        q = store.streaming_sink(stream, ckpt, _pre_apply=mid_batch,
                                 seq_column="__seq",
                                 trigger={"availableNow": True})
        q.awaitTermination(120)
        assert seen_mid["count"] == before          # pre-apply snapshot
        assert live_count() == len(model)           # post-apply snapshot

    # final deep check: full store contents equal the model
    got = {r["__key"]: r.asDict() for r in store.read().collect()}
    assert got.keys() == model.keys()
    for k in model:
        assert got[k]["p_retailprice"] == model[k]["p_retailprice"], k
    # the upserted/inserted values are queryable through the engine
    assert eng.ft_search("endur", "@p_brand:{Brand#55}",
                         count_only=True) == 8
