"""Training-shard writer: the last mile of a training-data pipeline.

After curation/dedup/packing, training consumption wants the corpus as N
roughly-equal shards in a deterministic pseudo-random order (so a
dataloader can stream shard files sequentially and still see shuffled
data, and a re-run of the pipeline reproduces byte-identical shard
membership for caching/resume). Spark's ``randomSplit``/``rand()`` are
plan-reevaluation-unstable, so — like ``operators/sampling.py`` — both
the shard assignment and the intra-shard order are pure functions of
``(key, seed)``:

- ``__shard = pmod(xxhash64(key, seed), n_shards)``: balanced in
  expectation, deterministic under retries;
- intra-shard order = ``xxhash64(key, seed+1)``: a reproducible global
  pseudo-shuffle (shard directory + position is a total order).

Plan shape at 100 TB: ONE shuffle (repartition on the shard id) with an
intra-partition sort, then a partitioned write — no global sort, no
driver materialization. ``max_records_per_file`` bounds individual file
sizes via Spark's native write option. The returned manifest (one
aggregation job) is what a dataloader needs to size epochs without
listing files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def write_training_shards(df: DataFrame, path: str, key: str,
                          n_shards: int | None = None, seed: int = 0,
                          token_col: str | None = None,
                          target_tokens_per_shard: int | None = None,
                          max_records_per_file: int | None = None,
                          mode: str = "error",
                          fmt: str = "parquet",
                          compression: str | None = None,
                          spread_cols: list[str] | None = None) -> DataFrame:
    """Write ``df`` as ``path/__shard=K/`` directories in a
    deterministic hash-shuffled order; returns the per-shard manifest
    ``(__shard, rows[, tokens])``.

    Size shards either explicitly (``n_shards``) or by token budget
    (``token_col`` + ``target_tokens_per_shard`` — one count job derives
    n_shards from the corpus total). Exactly one of the two must be
    given.

    ``fmt="jsonl"`` writes JSON Lines (the format most training
    dataloaders stream) instead of parquet, optionally compressed
    (``compression="gzip"`` — per-file gzip, still shard-parallel).
    JSONL is for text consumption: binary columns base64-encode and
    timestamps stringify, so keep analytic round-trips on parquet.

    ``spread_cols`` hashes extra columns into BOTH the shard assignment
    and the intra-shard position. A frame carrying replicas — e.g.
    ``upsample_to_token_budget``'s ``epoch`` column — MUST pass them
    here (``spread_cols=["epoch"]``), otherwise every copy of a
    document hashes to the same shard at the same position and a
    dataloader sees the epochs back-to-back instead of spread across
    the corpus order."""
    if (n_shards is None) == (target_tokens_per_shard is None):
        raise ValueError(
            "pass exactly one of n_shards or target_tokens_per_shard")
    if fmt not in ("parquet", "jsonl"):
        raise ValueError("fmt must be 'parquet' or 'jsonl'")
    if target_tokens_per_shard is not None:
        if token_col is None:
            raise ValueError("target_tokens_per_shard requires token_col")
        total = df.agg(F.sum(token_col)).first()[0] or 0
        n_shards = max(1, -(-int(total) // int(target_tokens_per_shard)))

    keyed = [F.col(key).cast("string")] + \
        [F.col(c).cast("string") for c in (spread_cols or [])]
    out = (df
           .withColumn("__shard",
                       F.pmod(F.xxhash64(*keyed, F.lit(seed)),
                              F.lit(n_shards)).cast("int"))
           .withColumn("__pos", F.xxhash64(*keyed, F.lit(seed + 1)))
           .repartition(n_shards, F.col("__shard"))
           .sortWithinPartitions("__shard", "__pos")
           .drop("__pos"))
    writer = out.write.mode(mode).partitionBy("__shard")
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if fmt == "jsonl":
        if compression is not None:
            writer = writer.option("compression", compression)
        writer.json(path)
        # explicit schema: avoids a full inference re-parse of what we
        # just wrote, and keeps columns the writer omitted (all-null
        # fields are dropped from JSON lines) in the manifest frame
        written = df.sparkSession.read.schema(out.schema).json(path)
    else:
        writer.parquet(path)
        written = df.sparkSession.read.parquet(path)
    aggs = [F.count("*").alias("rows")]
    if token_col is not None:
        aggs.append(F.sum(token_col).alias("tokens"))
    return written.groupBy("__shard").agg(*aggs).orderBy("__shard")
