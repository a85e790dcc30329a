"""Parquet compaction — the small-files maintenance pass.

Incremental pipelines (streaming sinks, per-batch MERGE appends, many
small ingest jobs) accrete thousands of under-sized parquet files; at
100 TB that means listing overhead, tiny row groups that defeat
min/max pruning, and one task per sliver. Compaction rewrites a table
into ``ceil(bytes / target)`` right-sized files with the same
crash-safe sibling swap as ``merge_parquet`` (kill anywhere leaves a
readable table at the path or its ``.old`` sibling).

Sizing reads ONLY the file listing (``binaryFile`` metadata columns —
content is never materialized), so deciding "does this table need
compaction" is free. The rewrite itself is one round-robin
repartition; use ``sources.layout.write_zordered`` instead when the
rewrite should also cluster.

Reference analogue: none (beyond-reference maintenance per SURVEY.md
§2.10; the closest reference behavior is index compaction —
IVFIndex.compact — which this generalizes to any parquet table).
"""
from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession, functions as F

from .swap import sibling_swap


def parquet_file_stats(spark: SparkSession, path: str) -> dict:
    """(files, bytes, smallest, largest) from the listing only — no
    data read. The pre-flight for ``compact_parquet``."""
    row = (spark.read.format("binaryFile")
           .option("pathGlobFilter", "*.parquet")
           .option("recursiveFileLookup", "true")
           .load(path)
           .agg(F.count(F.lit(1)).alias("files"),
                F.sum("length").alias("bytes"),
                F.min("length").alias("smallest"),
                F.max("length").alias("largest"))
           .first())
    return {k: row[k] for k in ("files", "bytes", "smallest", "largest")}


def _partition_dirs(path: str) -> list[str]:
    return sorted(e for e in os.listdir(path)
                  if "=" in e and os.path.isdir(os.path.join(path, e)))


def compact_parquet(spark: SparkSession, path: str,
                    target_file_mb: float = 128,
                    min_files_to_compact: int = 2) -> dict:
    """Rewrite the table at ``path`` into ~``target_file_mb`` files.

    Hive-partitioned tables (``col=value`` directories) compact each
    partition directory independently — the layout, partition pruning,
    and the dir-name-encoded values all survive, and each partition
    gets its own right-sizing (a flattening rewrite would silently
    destroy the layout and break later partitioned MERGEs). The
    driver loop is one entry per partition directory.

    No-op (``compacted=False, rows=None``) when the table already has
    fewer than ``min_files_to_compact`` files or one target-sized file
    would not reduce the count. Row count is preserved (asserted via
    one count on each side of the swap)."""
    import math

    parts = _partition_dirs(path)
    if parts:
        results = [compact_parquet(spark, os.path.join(path, p),
                                   target_file_mb, min_files_to_compact)
                   for p in parts]
        return {
            "files": sum(r["files"] for r in results),
            "bytes": sum(r["bytes"] or 0 for r in results),
            "compacted": any(r["compacted"] for r in results),
            "files_after": sum(r["files_after"] for r in results),
            "partitions": len(results),
        }

    before = parquet_file_stats(spark, path)
    noop = {**before, "compacted": False, "rows": None,
            "files_after": before["files"]}
    if before["files"] < min_files_to_compact:
        return noop
    target_bytes = target_file_mb * (1 << 20)
    n_files = max(1, math.ceil(int(before["bytes"]) / target_bytes))
    if n_files >= before["files"]:
        return noop

    df = spark.read.parquet(path)
    rows_before = df.count()
    tmp = path.rstrip("/") + ".compact"
    shutil.rmtree(tmp, ignore_errors=True)
    df.repartition(n_files).write.mode("overwrite").parquet(tmp)

    rows_after = spark.read.parquet(tmp).count()
    if rows_after != rows_before:     # never swap in a bad rewrite
        shutil.rmtree(tmp, ignore_errors=True)
        raise RuntimeError(
            f"compaction row mismatch: {rows_before} -> {rows_after}")
    sibling_swap(path, tmp)
    after = parquet_file_stats(spark, path)
    return {**before, "compacted": True, "rows": rows_before,
            "files_after": after["files"],
            "largest_after": after["largest"]}
