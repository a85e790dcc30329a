"""MERGE-INTO semantics for plain parquet tables — upsert + delete in
one rewrite, crash-safe.

Vanilla Spark parquet has no MERGE (that is Delta/Iceberg territory);
the incremental-corpus workflow — nightly refresh of a 100 TB document
store with a small batch of new/changed/deleted keys — needs one. This
is the classic copy-on-write MERGE:

    kept     = target ANTI JOIN (updates ∪ deletes) ON key
    result   = kept UNION updates

executed as ONE read of the target, one broadcast-able anti-join (the
batch is small by assumption; Spark auto-broadcasts under the
threshold), and one write. The rewrite lands as a SIBLING directory
first and swaps in with two renames (the same crash-safe order as
``IVFIndex.compact``): a kill at any moment leaves a readable table at
either the original or the ``.old`` path.

At 100 TB, rewriting the whole table per batch is the documented
copy-on-write trade-off (what Delta does without deletion vectors);
batch several updates between merges, or partition the table and
merge only affected partitions (``partition_by``), which prunes
the read AND the rewrite to the touched slice; untouched partition
directories are carried into the sibling by HARD LINK (copy
fallback), so the original table stays complete until the final
swap — the crash guarantee holds in partitioned mode too.

Reference analogue: the mutation queue applying SET/DEL into the
indexes (vendor/README themes); this is the at-rest table's version.
Oracle: plain recomputation over before/after reads
(tests/test_merge.py), incl. kill-window crash simulation.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, functions as F

from .swap import sibling_swap


def merge_parquet(spark, path: str, updates: DataFrame | None = None,
                  key: str = "doc_id", deletes: DataFrame | None = None,
                  partition_by: str | None = None) -> dict:
    """Apply ``updates`` (upsert by ``key``) and ``deletes`` (a frame
    holding ``key`` values) to the parquet table at ``path``.
    Duplicate keys WITHIN updates are an error (ambiguous intent).
    Returns {"rows": total_after, "upserts": n, "deletes_requested": n}.

    ``partition_by``: when the table is hive-partitioned by this
    column and every update/delete row carries it, only the touched
    partition directories are rewritten; the rest are carried by hard
    link. PRECONDITION: a key never moves between partitions — the
    anti-join only sees the touched partitions, so an update that
    relocates a key to a new partition value would leave the stale row
    alive in its old partition (make the partition column part of the
    key's identity, as hive layouts normally do). Null partition
    values are rejected (they cannot be matched against hive's
    __HIVE_DEFAULT_PARTITION__ directories safely).
    """
    if updates is None and deletes is None:
        raise ValueError("nothing to merge")
    target = spark.read.parquet(path)
    tcols = target.columns
    n_up = 0
    if updates is not None:
        if set(updates.columns) != set(tcols):
            raise ValueError(
                f"updates schema {sorted(updates.columns)} != "
                f"target {sorted(tcols)}")
        n_up = updates.count()
        dup = updates.groupBy(key).count().where("count > 1").count()
        if dup:
            raise ValueError(f"{dup} duplicate keys in updates")
    n_del = deletes.select(key).distinct().count() if deletes is not None \
        else 0
    if updates is not None and deletes is not None:
        both = updates.select(key).join(deletes.select(key), key) \
            .count()
        if both:
            raise ValueError(
                f"{both} keys appear in BOTH updates and deletes — "
                "ambiguous intent (the update would silently win)")

    gone = None
    if updates is not None:
        gone = updates.select(key)
    if deletes is not None:
        d = deletes.select(key)
        gone = d if gone is None else gone.unionByName(d)

    touched_parts = None
    if partition_by is not None:
        sides = [s for s in (updates, deletes) if s is not None]
        if any(partition_by not in s.columns for s in sides):
            raise ValueError(
                f"partition_by={partition_by!r} must be present in "
                "updates and deletes")
        touched_parts = set()
        touched_strs = set()
        for s in sides:
            # collect the value (for the isin prune) AND Spark's own
            # string rendering (for hive dir-name comparison below) —
            # Python str() diverges from hive naming for e.g. booleans
            # (str(True)='True' but hive writes 'flag=true'), which made
            # fully-emptied partitions resurrect via the carry link
            for r in (s.select(F.col(partition_by).alias("v"),
                               F.col(partition_by).cast("string")
                               .alias("s")).distinct().collect()):
                touched_parts.add(r["v"])
                touched_strs.add(r["s"])
        if None in touched_parts:
            raise ValueError(
                "null partition values in updates/deletes are not "
                "supported in partitioned merge")
        target = target.where(F.col(partition_by).isin(list(touched_parts)))

    kept = target.join(F.broadcast(gone.distinct()), key, "left_anti")
    result = kept if updates is None \
        else kept.unionByName(updates.select(*tcols))

    tmp = path.rstrip("/") + ".merge"
    shutil.rmtree(tmp, ignore_errors=True)
    w = result.write.mode("overwrite")
    if partition_by is not None:
        w = w.partitionBy(partition_by)
    w.parquet(tmp)

    if touched_parts is not None:
        # carry untouched partition directories into the sibling by
        # hard link (copy fallback) — the ORIGINAL table stays complete
        # until the swap below, so a kill anywhere leaves a readable
        # table at one of the two paths. "Touched" is decided by what
        # the rewrite actually WROTE into tmp (Spark hive-escapes both
        # writes identically, so name comparison is exact), plus the
        # unescaped value set for partitions the rewrite EMPTIED
        # (all rows deleted -> no dir in tmp, but the old dir must not
        # resurrect)
        from urllib.parse import unquote

        written = {e for e in os.listdir(tmp)
                   if e.startswith(f"{partition_by}=")}
        for entry in os.listdir(path):
            if not entry.startswith(f"{partition_by}="):
                continue
            if entry in written:
                continue                       # rewritten in tmp
            raw_val = unquote(entry.split("=", 1)[1])
            if raw_val in touched_strs:
                continue                       # touched, emptied
            src = os.path.join(path, entry)
            dst = os.path.join(tmp, entry)
            os.makedirs(dst, exist_ok=True)
            for f in os.listdir(src):
                try:
                    os.link(os.path.join(src, f), os.path.join(dst, f))
                except OSError:
                    shutil.copy2(os.path.join(src, f),
                                 os.path.join(dst, f))
    sibling_swap(path, tmp)
    total = spark.read.parquet(path).count()
    return {"rows": total, "upserts": n_up, "deletes_requested": n_del}
