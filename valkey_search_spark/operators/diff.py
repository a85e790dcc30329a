"""Snapshot diffing + time-series regularization.

- ``diff_tables``: key-wise diff of two table snapshots — the
  verification tool for ``sources/merge.py`` (did the nightly MERGE do
  exactly what the batch said?) and for debugging any before/after
  pair. ONE full-outer join on the key; change detection compares a
  single struct of the shared non-key columns, so the plan is one
  join + one codegen comparison regardless of column count. Returns
  per-row verdicts (added / removed / changed / unchanged, with the
  list of changed columns) — aggregate for the summary, filter for
  the drill-down.
- ``resample``: per-key regular time grid with aggregation + gap fill
  (the SAMPLE BY / time_bucket_gapfill shape): one groupBy onto the
  bucket grid, one per-key sequence explode to materialize missing
  buckets, one window for forward fill — no cross-key work anywhere.

Reference analogue: none; beyond-reference extensions (SURVEY §2.10).
Oracles: DuckDB recomputation of both (tests/test_diff.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


def diff_tables(before: DataFrame, after: DataFrame,
                key: str = "doc_id",
                columns: list[str] | None = None) -> DataFrame:
    """Row-wise diff by ``key``. ``columns`` restricts change detection
    (default: all shared non-key columns). Returns one row per key
    seen on either side: (key, verdict, changed_columns) with verdict
    in {added, removed, changed, unchanged}. Null-safe throughout: a
    column going null <-> non-null counts as a change, null == null
    does not, and null KEYS pair up across sides. PRECONDITION: each
    snapshot is key-unique (verdicts fan out on duplicates)."""
    shared = [c for c in before.columns
              if c in set(after.columns) and c != key]
    cols = columns if columns is not None else shared
    missing = [c for c in cols if c not in shared]
    if missing:
        raise ValueError(f"not shared by both sides: {missing}")
    if not cols:
        raise ValueError("no columns to compare")

    # null-safe key match too: a null-keyed row present on both sides
    # must pair up, not report as added+removed. PRECONDITION: each
    # snapshot is key-unique (the full-outer join fans out otherwise
    # and fanned verdicts can mask real changes) — gate dirty inputs
    # with check_expectations(..., Expect("unique", key)) first.
    b = before.select(F.col(key).alias("__bk"),
                      F.struct(*cols).alias("__b"))
    a = after.select(F.col(key).alias("__ak"),
                     F.struct(*cols).alias("__a"))
    j = b.join(a, b["__bk"].eqNullSafe(a["__ak"]), "full_outer")
    changed_cols = F.filter(
        F.array(*[F.when(~F.col("__b")[c].eqNullSafe(F.col("__a")[c]),
                         F.lit(c)) for c in cols]),
        lambda x: x.isNotNull())
    verdict = (F.when(F.col("__b").isNull(), F.lit("added"))
               .when(F.col("__a").isNull(), F.lit("removed"))
               .when(F.size(changed_cols) > 0, F.lit("changed"))
               .otherwise(F.lit("unchanged")))
    return j.select(
        F.coalesce(F.col("__bk"), F.col("__ak")).alias(key),
        verdict.alias("verdict"),
        F.when(verdict == "changed", changed_cols)
        .otherwise(F.array().cast("array<string>"))
        .alias("changed_columns"))


def diff_summary(before: DataFrame, after: DataFrame,
                 key: str = "doc_id",
                 columns: list[str] | None = None) -> DataFrame:
    """One row per verdict with counts — the audit line for a merge."""
    return (diff_tables(before, after, key, columns)
            .groupBy("verdict").agg(F.count("*").alias("n"))
            .orderBy("verdict"))


def resample(df: DataFrame, every: int, agg: dict[str, str],
             key: str = "user_id", ts_col: str = "ts",
             fill: str = "none") -> DataFrame:
    """Per-``key`` regular time grid: bucket ``ts_col`` to ``every``-
    second cells, aggregate (``agg``: column -> one of sum/avg/min/
    max/count), then materialize EVERY grid cell between each key's
    first and last bucket. ``fill``: "none" leaves gap rows null,
    "ffill" forward-fills from the key's previous non-null bucket,
    "zero" fills numeric zeros. Grid cells are epoch-second buckets
    (``bucket_ts`` timestamp + ``bucket`` long). Per-key work only,
    and the source is scanned ONCE: each aggregated bucket row emits
    the grid cells up to the key's next bucket (a lead window + one
    sequence explode — no self-join back onto the aggregation, which
    would re-execute the scan per branch), then an optional fill
    window on the same key partitioning."""
    if every <= 0:
        raise ValueError("every must be positive seconds")
    if fill not in ("none", "ffill", "zero"):
        raise ValueError(f"unknown fill {fill!r}")
    if not agg:
        raise ValueError("need at least one aggregation")
    fns = {"sum": F.sum, "avg": F.avg, "min": F.min, "max": F.max,
           "count": F.count}
    for c, how in agg.items():
        if how not in fns:
            raise ValueError(f"unknown agg {how!r} for {c!r}")

    from .temporal import _epoch_seconds

    bucket = F.floor(_epoch_seconds(df, ts_col) / every).cast("long")
    out_names = [f"{how}_{c}" for c, how in agg.items()]
    got = (df.withColumn("__bkt", bucket)
           .groupBy(key, "__bkt")
           .agg(*[fns[how](c).alias(f"{how}_{c}")
                  for c, how in agg.items()]))
    # each bucket row emits its own cell plus the gap cells up to the
    # key's next bucket — the grid materializes from the SAME subtree
    # (a join against a separately-derived grid would re-execute the
    # whole scan+aggregation per branch; exchange reuse does not fire
    # across pruned branches)
    w = Window.partitionBy(key).orderBy("__bkt")
    staged = got.withColumn(
        "__hi", F.coalesce(F.lead("__bkt").over(w) - 1, F.col("__bkt")))
    expanded = staged.select(
        key, "__bkt", *out_names,
        F.explode(F.sequence("__bkt", "__hi")).alias("bucket"))
    own = F.col("bucket") == F.col("__bkt")
    if fill == "ffill":
        # gap cells inherit their emitting row's values = forward fill;
        # null aggregates still skip back via last(ignorenulls) on the
        # same key partitioning (sort-only, no new exchange)
        wf = Window.partitionBy(key).orderBy("bucket") \
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        vals = [F.last(F.when(own, F.col(n)), ignorenulls=True)
                .over(wf).alias(n) for n in out_names]
    elif fill == "zero":
        vals = [F.coalesce(F.when(own, F.col(n)), F.lit(0)).alias(n)
                for n in out_names]
    else:
        vals = [F.when(own, F.col(n)).alias(n) for n in out_names]
    return (expanded.select(key, "bucket", *vals)
            .withColumn("bucket_ts",
                        F.timestamp_seconds(F.col("bucket") * every)))
