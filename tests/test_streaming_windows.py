"""Streaming windowed aggregation + stateful dedup: batch/stream parity
and real readStream execution with watermarks."""

import pytest
from pyspark.sql import functions as F

from valkey_search_spark.operators.textops import fingerprint_col
from valkey_search_spark.sources.tables import load_table
from valkey_search_spark.streaming.windows import (
    first_seen_dedup_stream, sessionized_counts, windowed_event_counts,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return load_table(spark, SF, "events")


def test_windowed_counts_batch(events):
    out = windowed_event_counts(events, window="1 hour").collect()
    assert sum(r["n"] for r in out) == events.count()
    r0 = out[0]
    assert (r0["window_end"] - r0["window_start"]).total_seconds() == 3600


def test_windowed_counts_matches_manual_group(events):
    ours = {(r["window_start"], r["event_type"]): r["n"]
            for r in windowed_event_counts(events, window="1 hour").collect()}
    manual = {(r["h"], r["event_type"]): r["n"]
              for r in events.groupBy(
                  F.date_trunc("hour", "ts").alias("h"), "event_type")
              .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert ours == manual


def test_sliding_windows_batch(events):
    """slide < window: each event lands in window/slide windows."""
    out = windowed_event_counts(events, window="1 hour", slide="30 minutes")
    total = sum(r["n"] for r in out.collect())
    assert total == 2 * events.count()       # every event in exactly 2 windows
    r0 = out.first()
    assert (r0["window_end"] - r0["window_start"]).total_seconds() == 3600


def test_sessionized_counts_batch(events):
    out = sessionized_counts(events, gap="30 minutes").collect()
    assert sum(r["n"] for r in out) == events.count()
    assert all(r["session_end"] > r["session_start"] for r in out)


def test_streaming_windowed_with_watermark(spark, events, tmp_path):
    src = tmp_path / "ev"
    events.write.mode("overwrite").parquet(str(src))
    stream = spark.readStream.schema(events.schema).parquet(str(src))
    out = windowed_event_counts(stream, window="1 hour", watermark="2 hours")
    q = (out.writeStream.format("memory").queryName("win_counts")
         .outputMode("append").trigger(availableNow=True)
         .option("checkpointLocation", str(tmp_path / "ck")).start())
    q.awaitTermination(120)
    # append mode only emits windows closed by the watermark; with a single
    # batch the watermark advances to max(ts)-2h, so older windows emit
    got = spark.sql("select sum(n) from win_counts").first()[0]
    batch_total = windowed_event_counts(events, window="1 hour").count()
    assert got is not None and got > 0
    assert spark.sql("select count(*) from win_counts").first()[0] <= batch_total


def test_first_seen_dedup_stream(spark, tmp_path):
    docs = load_table(spark, SF, "documents").withColumn(
        "ts", F.timestamp_seconds(F.lit(1_700_000_000) + F.col("doc_id")))
    src = tmp_path / "docs"
    docs.write.mode("overwrite").parquet(str(src))
    stream = spark.readStream.schema(docs.schema).parquet(str(src))
    out = first_seen_dedup_stream(stream, fingerprint_col(F.col("text")),
                                  watermark="10 seconds")
    q = (out.writeStream.format("memory").queryName("dedup_stream")
         .outputMode("append").trigger(availableNow=True)
         .option("checkpointLocation", str(tmp_path / "ck2")).start())
    q.awaitTermination(120)
    streamed = spark.sql("select count(*) from dedup_stream").first()[0]
    batch = first_seen_dedup_stream(docs, fingerprint_col(F.col("text"))).count()
    assert streamed == batch  # same dedup cardinality batch vs stream


def test_streaming_html_ingest_pipeline(spark, tmp_path):
    """Stateless ingest operators (HTML extraction + analysis metrics)
    compose into readStream unchanged — a crawl feed cleans itself in
    flight. Results must equal the batch run over the same files."""
    from valkey_search_spark.operators.html import extract_documents
    from valkey_search_spark.operators.textops import analyze_documents

    docs = load_table(spark, SF, "documents").limit(120)
    pages = docs.select(
        "doc_id",
        F.concat(F.lit("<html><head><title>t</title></head><body><p>"),
                 F.col("text"),
                 F.lit('</p><a href="/n">nav</a></body></html>')
                 ).alias("html"))
    src = tmp_path / "pages"
    pages.write.parquet(str(src))

    def clean(df):
        ex = extract_documents(df).select("doc_id", "text", "link_density")
        return analyze_documents(ex).select(
            "doc_id", "token_count", "quality_score", "link_density")

    stream = spark.readStream.schema(pages.schema).parquet(str(src))
    q = (clean(stream).writeStream.format("memory")
         .queryName("html_stream").outputMode("append").start())
    try:
        q.processAllAvailable()
        got = {r["doc_id"]: r for r in
               spark.table("html_stream").collect()}
    finally:
        q.stop()
    want = {r["doc_id"]: r for r in clean(pages).collect()}
    assert set(got) == set(want)
    for k in want:
        assert got[k]["token_count"] == want[k]["token_count"]
        assert got[k]["quality_score"] == pytest.approx(
            want[k]["quality_score"])
