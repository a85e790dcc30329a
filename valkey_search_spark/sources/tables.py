"""Test-data table loaders + JSON field extraction.

The reference fetches documents from HASH (flat field maps) or JSON
values (`JSON.GET $` — /root/reference/src/attribute_data_type.h:83-139).
Parquet columns are our HASH fields; JSON-string columns (events.props)
are decoded with get_json_object — the Spark-native JsonAttributeDataType.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # NOTE (r12, measured): a blanket repartition-after-read here was
    # tried to fix the 1-file/1-row-group testdata scans executing as a
    # single task, and REVERTED — the round-robin exchange cost more
    # than the parallelism bought on every cheap scan (agg_q1 1.03 ->
    # 1.65 s, knn_binary 1.41 -> 1.81 s, events_resample 0.98 -> 1.31 s
    # isolated min-of-3). The CPU-bound text operators instead spread
    # their own input (dedup._parallelize at operator entry), which is
    # a no-op on well-partitioned production inputs.
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        # events.ts is TIMESTAMP(NANOS); Spark reads it only as long
        # (nanosAsLong) — normalize to TIMESTAMP_NTZ-equivalent seconds
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_seconds(F.col("ts") / F.lit(1e9)))
        return df
    return spark.read.parquet(path)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def json_number_field(df: DataFrame, json_col: str, path: str, out: str) -> DataFrame:
    """Decode one numeric field out of a JSON-string column (lenient —
    missing/invalid -> NULL == untracked, mirroring the reference's
    silent-untracked JSON handling)."""
    return df.withColumn(out, F.get_json_object(F.col(json_col), path).try_cast("double"))


def json_string_field(df: DataFrame, json_col: str, path: str, out: str) -> DataFrame:
    return df.withColumn(out, F.get_json_object(F.col(json_col), path))


def json_vector_expr(src) -> "F.Column":
    """Decode the reference's JSON vector format: a JSON *string* value
    like ``"[1.0, 0.0, 0.0]"`` — split on commas, whitespace skipped,
    extra commas tolerated, any non-numeric element rejects the whole
    vector -> NULL (untracked)
    (docs/topics/search-data-formats.md "JSON Vector Format")."""
    s = F.regexp_replace(src.cast("string"), r"^\s*\[|\]\s*$", "")
    parts = F.filter(F.transform(F.split(s, ","), lambda x: F.trim(x)),
                     lambda x: x != "")
    floats = F.transform(parts, lambda x: x.try_cast("float"))
    ok = ~F.exists(floats, lambda x: x.isNull())
    return F.when(ok & (F.size(floats) > 0), floats)


def json_vector_field(df: DataFrame, src_col: str, out: str) -> DataFrame:
    return df.withColumn(out, json_vector_expr(F.col(src_col)))
