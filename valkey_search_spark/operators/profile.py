"""Corpus profiling — the dataset-card statistics pass.

Every training-data release ships a profile: per-source volumes, token
budgets, language mix, length distribution. This is ONE aggregation
job over the corpus (grouping sets — Spark compiles them into a single
shuffle with map-side partial aggregation), not a notebook of repeated
scans: at 100 TB the difference between one pass and six is the whole
cost of the report.

Output is a tall (dimension, bucket, metrics...) frame — stable schema
at any corpus, safe to collect (its row count is bounded by distinct
sources + langs + ~60 log2 length buckets), ready for a dashboard or a
dataset card.

Reference analogue: INFO SEARCH index stats (the reference reports
per-index record counts, docs/topics/search-observables.md); this
generalizes the idea to corpus statistics. Beyond-reference operator
per SURVEY.md §2.10.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def corpus_profile(df: DataFrame, text_col: str = "text",
                   source_col: str | None = "source",
                   lang_col: str | None = "lang") -> DataFrame:
    """Profile a document corpus in one aggregation pass.

    Rows: one per (dimension, bucket) where dimension is ``total``,
    ``source``, ``lang``, or ``len_log2`` (floor(log2(chars)) length
    histogram). Metrics: docs, chars, tokens (whitespace runs; empty
    tokens from leading/trailing whitespace excluded), plus per-bucket
    token-count quantiles from the same pass (approx_percentile
    partial-aggregates; no second scan).
    """
    toks = F.size(F.filter(F.split(F.col(text_col), r"\s+"),
                           lambda w: w != ""))
    chars = F.length(F.col(text_col))
    base = df.select(
        (F.col(source_col) if source_col else F.lit(None).cast("string"))
        .alias("__src"),
        (F.col(lang_col) if lang_col else F.lit(None).cast("string"))
        .alias("__lang"),
        F.when(chars > 0, F.floor(F.log2(chars))).otherwise(F.lit(0))
        .cast("int").alias("__len_b"),
        chars.alias("__chars"),
        F.when(F.col(text_col).isNotNull() & (chars > 0), toks)
        .otherwise(F.lit(0)).alias("__toks"),
    )

    sets = [[]]
    if source_col:
        sets.append([F.col("__src")])
    if lang_col:
        sets.append([F.col("__lang")])
    sets.append([F.col("__len_b")])

    g = base.groupingSets(
        sets, F.col("__src"), F.col("__lang"), F.col("__len_b")).agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("__chars").alias("chars"),
        F.sum("__toks").alias("tokens"),
        F.expr("approx_percentile(__toks, array(0.5, 0.9, 0.99))")
        .alias("q"),
        F.grouping("__src").alias("g_src"),
        F.grouping("__lang").alias("g_lang"),
        F.grouping("__len_b").alias("g_len"),
    )
    dimension = (F.when(F.col("g_src") == 0, F.lit("source"))
                 .when(F.col("g_lang") == 0, F.lit("lang"))
                 .when(F.col("g_len") == 0, F.lit("len_log2"))
                 .otherwise(F.lit("total")))
    bucket = (F.when(F.col("g_src") == 0, F.col("__src"))
              .when(F.col("g_lang") == 0, F.col("__lang"))
              .when(F.col("g_len") == 0, F.col("__len_b").cast("string"))
              .otherwise(F.lit("all")))
    return g.select(
        dimension.alias("dimension"), bucket.alias("bucket"),
        "docs", "chars", "tokens",
        F.element_at("q", 1).alias("tok_p50"),
        F.element_at("q", 2).alias("tok_p90"),
        F.element_at("q", 3).alias("tok_p99"))
