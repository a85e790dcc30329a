"""Streaming analytics over event streams: windowed aggregation + stateful
dedup, as Structured Streaming building blocks.

The reference's streaming surface is ingest-only (queries are
point-in-time, SURVEY.md §2.9); these operators extend the engine for the
continuous half of a training-data pipeline: event-rate rollups feeding
curation decisions, and first-seen dedup of a document stream. Both run
identically on a batch frame (for tests/oracles) and a readStream frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _watermarkable(df: DataFrame, ts_col: str) -> DataFrame:
    """Watermarks require TIMESTAMP (with local-tz semantics); parquet
    written without isAdjustedToUTC infers TIMESTAMP_NTZ under Spark 4, so
    cast the event-time column when needed (wall-clock values unchanged —
    interpreted in the session timezone)."""
    dt = dict(df.dtypes).get(ts_col)
    if dt == "timestamp_ntz":
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def windowed_event_counts(df: DataFrame, ts_col: str = "ts",
                          window: str = "1 hour",
                          slide: str | None = None,
                          watermark: str | None = "2 hours",
                          group_cols: tuple[str, ...] = ("event_type",),
                          value_col: str | None = "value") -> DataFrame:
    """Tumbling/sliding window counts (+ sum of ``value_col``) per group.

    On a streaming frame the watermark bounds state: late events beyond
    ``watermark`` are dropped and closed windows are emitted/evicted —
    state per active window x group, independent of stream length. On a
    batch frame the same plan is a plain window aggregation (watermark is
    a no-op), which is how the oracle checks it.
    """
    # batch frames need the NTZ->TIMESTAMP cast too: window_start/end
    # inherit the event-time type, and NTZ refuses downstream epoch casts
    df = _watermarkable(df, ts_col)
    if df.isStreaming and watermark:
        df = df.withWatermark(ts_col, watermark)
    win = (F.window(F.col(ts_col), window, slide) if slide
           else F.window(F.col(ts_col), window))
    aggs = [F.count(F.lit(1)).alias("n")]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("sum_value"))
    return (df.groupBy(win.alias("w"), *[F.col(c) for c in group_cols])
              .agg(*aggs)
              .select(F.col("w.start").alias("window_start"),
                      F.col("w.end").alias("window_end"),
                      *group_cols, *[a for a in ("n", "sum_value")
                                     if value_col is not None or a == "n"]))


def sessionized_counts(df: DataFrame, ts_col: str = "ts",
                       gap: str = "30 minutes",
                       watermark: str | None = "2 hours",
                       group_cols: tuple[str, ...] = ("event_type",)) -> DataFrame:
    """Session windows: events within ``gap`` of each other merge into one
    session per group (F.session_window — state machine handled by Spark)."""
    df = _watermarkable(df, ts_col)
    if df.isStreaming and watermark:
        df = df.withWatermark(ts_col, watermark)
    win = F.session_window(F.col(ts_col), gap)
    return (df.groupBy(win.alias("w"), *[F.col(c) for c in group_cols])
              .agg(F.count(F.lit(1)).alias("n"))
              .select(F.col("w.start").alias("session_start"),
                      F.col("w.end").alias("session_end"), *group_cols, "n"))


def first_seen_dedup_stream(df: DataFrame, key_expr, ts_col: str = "ts",
                            watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup: emit only the first occurrence of each
    fingerprint. On a stream this is `dropDuplicates` with watermarked
    state (fingerprints older than the watermark age out — the unbounded
    seen-set becomes bounded state); on a batch frame it is plain
    dropDuplicates."""
    out = df.withColumn("__fp", key_expr)
    if out.isStreaming:
        out = _watermarkable(out, ts_col).withWatermark(ts_col, watermark)
        return out.dropDuplicatesWithinWatermark(["__fp"]).drop("__fp")
    return out.dropDuplicates(["__fp"]).drop("__fp")
