"""Continuous ingestion: keyspace-notification semantics on Structured Streaming.

The reference ingests by keyspace notification -> per-key mutation queue
(deduped per in-flight key) -> writer-thread apply, plus a full backfill
scan on FT.CREATE (/root/reference/src/index_schema.cc:591,840-865,1044;
SURVEY.md §3.3). The Spark-native shape:

- ``DocumentStore``: the document table persisted as Parquet, hash-bucket
  partitioned on the key (``__bucket = pmod(xxhash64(key), N)``). An upsert
  rewrites ONLY the buckets containing touched keys (dynamic partition
  overwrite), so per-microbatch write cost is O(touched buckets), not
  O(table) — the scale substitute for a MERGE-capable table format.
- ``backfill``: batch load of the existing keyspace == PerformBackfill;
  skipping it == SKIPINITIALSCAN.
- ``streaming_sink``: ``writeStream.foreachBatch`` applying SET/DEL
  mutations with last-writer-wins per key inside each micro-batch —
  the exactly-once replacement for the reference's in-flight dedup
  (TrackMutatedRecord, index_schema.cc:1986).

Derived index columns are computed lazily by IndexSchema over the store's
current snapshot, so ingestion never pays for tokenization the queries
don't use; ``materialize()`` remains the hot-index option.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

OP_SET = "SET"     # HSET / JSON.SET — full-document upsert
OP_DEL = "DEL"     # DEL / expiry — remove document


class DocumentStore:
    """Parquet-backed upsertable document table, bucket-partitioned by key.

    ``num_buckets`` sizes the unit of rewrite: at 100 TB with 4096 buckets a
    micro-batch touching 1k random keys rewrites at most 1k buckets
    (~25 GB), typically far fewer; reads prune to buckets only when a
    key-equality predicate is present, otherwise scan all buckets as usual.
    """

    def __init__(self, spark: SparkSession, path: str, key_column: str = "__key",
                 num_buckets: int = 64):
        self.spark = spark
        self.path = path
        self.key_column = key_column
        self.num_buckets = num_buckets
        # live ingest observables surfaced through FT.INFO when a schema
        # attaches this store (IndexSchema.attach_store); the reference
        # reports these from its background indexer
        # (src/index_schema.h:215,462)
        self._backfill_active = False
        self._queue_depth = 0
        self._applied_count = 0
        self._last_batch_ms = 0.0
        self._active_query = None

    # ------------------------------------------------------------------
    def _bucket(self, df: DataFrame) -> DataFrame:
        b = F.pmod(F.xxhash64(F.col(self.key_column).cast("string")),
                   F.lit(self.num_buckets)).cast("int")
        return df.withColumn("__bucket", b)

    def exists(self) -> bool:
        return os.path.isdir(self.path) and any(
            e.startswith("__bucket=") for e in os.listdir(self.path))

    def backfill(self, df: DataFrame) -> None:
        """Full keyspace scan -> initial table (PerformBackfill,
        index_schema.cc:1044). Dedupe on key: last writer wins arbitrarily,
        matching the reference's one-document-per-key model."""
        self._backfill_active = True
        try:
            (self._bucket(df.dropDuplicates([self.key_column]))
                 .write.mode("overwrite").partitionBy("__bucket")
                 .parquet(self.path))
        finally:
            self._backfill_active = False

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self.path).drop("__bucket")

    # ------------------------------------------------------------------
    def apply_mutations(self, mutations: DataFrame, op_column: str = "__op",
                        seq_column: str | None = None,
                        ann_indexes: list | None = None) -> None:
        """Apply a batch of SET/DEL mutations.

        ``mutations`` carries the key column, ``op_column`` (SET|DEL) and the
        document field columns for SETs. With ``seq_column``, the highest
        sequence per key wins; otherwise last-row-wins within the batch
        (per-key dedup == the reference's in-flight mutation dedup).

        Plan: winner-per-key (one shuffle on key, bounded by batch size) ->
        semi-join the CURRENT table to the touched buckets only -> merge ->
        dynamic-partition-overwrite those buckets.

        ``ann_indexes``: ANN artifacts (IVFIndex or HNSWIndex — any
        object with key_col/vec_col/delete/upsert) to mirror the batch
        into —
        the reference's notification -> index AddRecord/RemoveRecord loop
        (vector_base.cc): DEL keys tombstone out, SET rows upsert
        (replace-by-key). Each index must be keyed on this store's key
        column and built over columns the mutation rows carry; rows whose
        vector is null are deleted from the index (an unembedded document
        has no business in KNN results), matching the reference's
        drop-on-missing-attribute ingest behavior.
        """
        key = self.key_column
        muts = self._bucket(mutations)
        order = (F.col(seq_column).desc() if seq_column
                 else F.monotonically_increasing_id().desc())
        from pyspark.sql import Window
        w = Window.partitionBy(key).orderBy(order)
        winners = (muts.withColumn("__rn", F.row_number().over(w))
                       .where(F.col("__rn") == 1).drop("__rn"))
        if seq_column:
            winners = winners.drop(seq_column)

        touched = [r["__bucket"] for r in
                   winners.select("__bucket").distinct().collect()]
        if not touched:
            return

        current = self.spark.read.parquet(self.path).where(
            F.col("__bucket").isin(touched))
        doc_cols = current.columns  # includes __bucket

        # cast to the store schema: a widened mutation batch (e.g. int64 for
        # an int32 column) must not fork per-bucket parquet types
        cur_types = {f.name: f.dataType for f in current.schema.fields}
        sets = (winners.where(F.col(op_column) == OP_SET)
                       .drop(op_column)
                       .select(*[F.col(c).cast(cur_types[c]).alias(c)
                                 for c in doc_cols]))
        dels_or_sets = winners.select(key).distinct()
        survivors = current.join(dels_or_sets, on=key, how="left_anti")

        out = survivors.unionByName(sets)
        with _conf(self.spark, "spark.sql.sources.partitionOverwriteMode", "dynamic"):
            (out.write.mode("overwrite").partitionBy("__bucket")
                .parquet(self.path))

        if ann_indexes:
            # cache the batch-sized winners frame: the mirror legs and the
            # index delete/append actions would otherwise re-run the
            # window shuffle per job
            winners.persist()
            try:
                # EXACT store delete semantics: any winner that is not a
                # vector-carrying SET leaves the index (the store's
                # anti-join removes every winner key and re-adds only
                # op == SET rows — unknown/null ops are deletes there too)
                is_set = F.coalesce(F.col(op_column) == OP_SET,
                                    F.lit(False))
                for ix in ann_indexes:
                    if ix.key_col != key:
                        raise ValueError(
                            f"ANN index keyed on {ix.key_col!r}, "
                            f"store on {key!r}")
                    vec_ok = F.col(ix.vec_col).isNotNull()
                    dels = winners.where(~is_set | ~vec_ok).select(key)
                    ups = sets.where(vec_ok).drop("__bucket")
                    # one job sizes both legs so empty ones don't write
                    # files / burn generations
                    n = winners.agg(
                        F.count(F.when(~is_set | ~vec_ok, 1)).alias("d"),
                        F.count(F.when(is_set & vec_ok, 1)).alias("u"),
                    ).first()
                    if n["d"]:
                        ix.delete(dels)
                    if n["u"]:
                        ix.upsert(ups)
            finally:
                winners.unpersist()

    # ------------------------------------------------------------------
    def streaming_sink(self, mutation_stream: DataFrame, checkpoint: str,
                       op_column: str = "__op", seq_column: str | None = None,
                       trigger: dict | None = None, _pre_apply=None,
                       ann_indexes: list | None = None):
        """writeStream.foreachBatch upsert — the keyspace-notification
        consumer. Micro-batch boundaries give exactly-once upserts
        (checkpointed offsets replace the reference's queue + sequence
        revalidation, index_schema.cc:840-865).

        Each batch updates the live observables FT.INFO reads via
        ``ingest_info``: queue depth while the batch is in flight, apply
        latency, cumulative applied count. ``_pre_apply`` is a test hook
        called between enqueue and apply (lets tests observe the
        in-flight state deterministically)."""
        import time as _time

        def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
            n = batch_df.count()
            self._queue_depth = n
            if _pre_apply is not None:
                _pre_apply(n)
            t0 = _time.perf_counter()
            try:
                self.apply_mutations(batch_df, op_column=op_column,
                                     seq_column=seq_column,
                                     ann_indexes=ann_indexes)
            finally:
                self._last_batch_ms = (_time.perf_counter() - t0) * 1000.0
                self._applied_count += n
                self._queue_depth = 0

        writer = (mutation_stream.writeStream
                  .outputMode("update")
                  .option("checkpointLocation", checkpoint)
                  .foreachBatch(apply_batch))
        if trigger:
            writer = writer.trigger(**trigger)
        q = writer.start()
        self._active_query = q
        return q

    def ingest_info(self) -> dict:
        """Live mutation/backfill block for FT.INFO (ft.info.md fields).
        ``recent_mutations_queue_delay`` is reported in whole seconds like
        the reference; a busy stream also reflects the micro-batch trigger
        lag from ``lastProgress`` when available."""
        delay_s = int(self._last_batch_ms / 1000.0)
        q = self._active_query
        if q is not None:
            try:
                prog = q.lastProgress
                if prog and prog.get("durationMs"):
                    trig = prog["durationMs"].get("triggerExecution", 0)
                    delay_s = max(delay_s, int(trig / 1000))
            except Exception:
                pass
        backfilling = self._backfill_active
        return {
            "backfill_in_progress": "1" if backfilling else "0",
            "backfill_complete_percent": "0.0" if backfilling else "1.0",
            "mutation_queue_size": str(self._queue_depth),
            "recent_mutations_queue_delay": str(delay_s),
            # ft.info.md: state tracks BACKFILL only
            # (ready / backfill_in_progress / backfill_paused_by_oom)
            "state": "backfill_in_progress" if backfilling else "ready",
        }


class _conf:
    """Temporarily set a Spark SQL conf."""

    def __init__(self, spark: SparkSession, key: str, value: str):
        self.spark, self.key, self.value = spark, key, value

    def __enter__(self):
        self.old = self.spark.conf.get(self.key, None)
        self.spark.conf.set(self.key, self.value)

    def __exit__(self, *exc):
        if self.old is None:
            self.spark.conf.unset(self.key)
        else:
            self.spark.conf.set(self.key, self.old)
