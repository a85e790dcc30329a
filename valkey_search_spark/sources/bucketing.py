"""Bucketed corpus storage — pay the shuffle once, at write time.

At 100 TB the dominant cost of key-keyed work (incremental dedup's
new-vs-all joins, ANN artifact/tombstone overlays, verdict joins back
to the corpus, per-key aggregations) is the Exchange. Spark's bucketed
tables remove it: a corpus written with ``bucketBy(n, key)`` records
its hash-partitioning in the catalog, and every later equi-join or
aggregation on that key reads co-located buckets with NO shuffle on
the bucketed side (two tables with the same bucket count join with no
Exchange at all — pinned in tests/test_bucketing.py).

This is the generic corpus-side twin of ``IndexSchema.materialize``'s
index bucketing (catalog.py). Spark requires bucketed data to live in
a saved table (the bucket spec is catalog metadata, not parquet
footer), hence table names + an explicit path.

Reference analogue: per-shard keyspace partitioning in CME mode
(SURVEY.md §3.4) — the reference co-locates by key hash across shards;
bucketing is Catalyst's native version of the same contract.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str | list[str],
                   n_buckets: int = 64, path: str | None = None,
                   sort: bool = True, mode: str = "overwrite") -> None:
    """Persist ``df`` as a parquet-backed bucketed table hashed on
    ``key``. ``sort=True`` additionally sorts within buckets, which
    upgrades later same-key sort-merge joins to zero-sort streams.
    Use one ``n_buckets`` per corpus family: equal counts join
    shuffle-free; unequal counts still save the larger side only."""
    keys = [key] if isinstance(key, str) else list(key)
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back WITH its bucket spec (a plain
    ``spark.read.parquet(path)`` would discard it — the spec lives in
    the catalog, which is why the table name is the handle)."""
    return spark.table(table)


def is_bucketed(spark: SparkSession, table: str,
                key: str | list[str]) -> bool:
    """True when ``table`` is bucketed on exactly ``key`` (the
    precondition for the shuffle-free plans this module promises).
    Exact-name comparison of the parsed column list — substring tests
    would claim 'id' matches a table bucketed on `doc_id`."""
    try:
        rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    except Exception:
        return False
    info = {r["col_name"]: (r["data_type"] or "") for r in rows}
    spec = info.get("Bucket Columns", "").strip()
    cols = [c.strip().strip("`") for c in spec.strip("[]").split(",")
            if c.strip()]
    want = [key] if isinstance(key, str) else list(key)
    return cols == want
