"""Benchmark harness: runs the headline query shapes from BASELINE.md at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Query-shape coverage mirrors the reference's CI benchmark workloads
(.github/benchmark_configs/fts-benchmarks-arm.json via BASELINE.md):
term, multi-term, phrase, prefix, negation, numeric range, tag match,
hybrid filter+KNN10, aggregate GROUPBY+reducers — plus the LLM-pipeline
extensions (minhash dedup, text analysis).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from valkey_search_spark.session import get_spark

BENCH_QUERIES = [
    "tag_match_prefix",
    "numeric_ranges",
    "and_or",
    "negation",
    "text_term",
    "text_term_stem",
    "text_affixes",
    "text_phrase",
    "text_proximity",
    "text_proximity_3term",
    "text_proximity_5term",
    "text_field_explosion",
    "agg_q1",
    "agg_filter_stage",
    "agg_events_json",
    "knn_metrics",
    "knn_hybrid",
    "knn_ivf",
    "search_sortby_limit",
    "agg_tpch_q6",
    "stream_windowed_counts",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "knn_join_bucketed",
    "text_analysis",
    "hygiene_decontaminate",
    "hygiene_pii_repetition",
    "knn_pq",
    "knn_binary",
    "knn_ivf_partial",
    "hygiene_line_dedup",
    "hygiene_gopher",
    "hygiene_span_dedup",
    "hygiene_lm_perplexity",
    "search_bm25",
    "dedup_semantic",
    "hygiene_quality_model",
    "tokenizer_bpe",
    "hygiene_html_extract",
    "dsir_select",
    "corpus_profile",
    "chunking",
    "sketch_overlap",
    "tokenizer_unigram",
    "asof_join",
    "sketch_heavy_hitters",
    "sample_stratified",
    "temporal_scd2",
    "eval_ir_metrics",
    "search_hybrid_rrf",
    "layout_zorder_scan",
    "events_session_funnel",
    "quality_expectations",
    "mine_bitext",
    "tokenizer_wordpiece",
    "events_resample",
    "hygiene_url_dedup",
    "ingest_warc_extract",
    "hygiene_clean_text",
    "text_sentences",
    "ingest_warc_cdx_fetch",
    "hygiene_robots_gate",
    "hygiene_c4_lines",
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0)
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    qs.update(entrymod.bench_extra())
    # warmup: JVM codegen + build the cached index columns and the IVF
    # artifact (the reference pays indexing at ingest; queries are timed
    # post-index)
    qs["tag_match_prefix"](spark, sf_dir).count()
    qs["text_term_stem"](spark, sf_dir).count()
    qs["knn_ivf"](spark, sf_dir).count()
    qs["knn_metrics"](spark, sf_dir).count()  # derive emb_cos/emb_ip indexes
    qs["agg_events_time"](spark, sf_dir).count()  # derive events ON-JSON index
    qs["text_fuzzy"](spark, sf_dir).count()   # start Arrow python workers
    qs["text_field_explosion"](spark, sf_dir).count()  # build the wide index

    # three timed runs per query, report the min: steady-state cost, robust
    # to co-tenant load spikes (the engine/caches are warm either way)
    times: dict[str, float] = {}
    for name in BENCH_QUERIES:
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).collect()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        times[name] = round(best, 4)
        print(f"  {name}: {times[name]}s", file=sys.stderr, flush=True)

    # partial-probe ANN speed/recall tradeoff (the reference's headline
    # is ">99% recall" — BASELINE.md row 3): recall@10 of nprobe =
    # n_lists/4 vs the exact full probe, over a 100-query batch through
    # knn_join_bucketed (one distributed job per side, recall computed
    # with a pair join — no per-query driver loop)
    from pyspark.sql import functions as F  # noqa: E402 (used below too)
    from valkey_search_spark.operators.ann import knn_join_bucketed

    idx = entrymod.ivf_index(spark, sf_dir)
    qdf = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
           .where(F.col("vec_id") < 100)
           .select(F.col("vec_id").alias("qid"), "embedding"))
    exact = knn_join_bucketed(qdf, idx, k=10, nprobe=idx.n_lists,
                              corpus_key="vec_id").select("qid", "vec_id")
    n_exact = exact.count()
    curve = []
    for nprobe in sorted({1, idx.n_lists // 4, idx.n_lists // 2}):
        approx = knn_join_bucketed(qdf, idx, k=10, nprobe=nprobe,
                                   corpus_key="vec_id").select("qid", "vec_id")
        t0 = time.perf_counter()
        approx.count()
        sec = round(time.perf_counter() - t0, 4)
        hits = approx.join(exact, ["qid", "vec_id"]).count()
        curve.append({"nprobe": nprobe,
                      "recall_at_10": round(hits / max(n_exact, 1), 4),
                      "batch_sec": sec})
    # the binary sign-code tier's operating point on the same batch:
    # Hamming scan over 32x-compressed codes + exact rerank of
    # k*oversample candidates — the engine's >99%-recall fast path
    from valkey_search_spark.operators.ann import knn_join, knn_join_binary

    # NOTE: the testdata's 64-dim vectors give the 1-bit tier only 64
    # Hamming levels — its coarsest case; at real embedding dims
    # (512-768 bits/code) recall 1.0 lands at oversample 8 (pinned in
    # tests/test_binary_quant.py's clustered 512-dim measurement)
    corpus = spark.read.parquet(f"{sf_dir}/embeddings.parquet") \
        .select(F.col("vec_id").alias("cid"), "embedding")
    flat = knn_join(qdf, corpus, k=10, corpus_key="cid",
                    metric="cosine").select("qid", "cid")
    n_flat = flat.count()
    for ovs in (8, 64):
        bq = knn_join_binary(qdf, corpus, k=10, metric="cosine",
                             oversample=ovs).select("qid", "cid")
        t0 = time.perf_counter()
        bq.count()
        bq_sec = round(time.perf_counter() - t0, 4)
        bq_hits = bq.join(flat, ["qid", "cid"]).count()
        curve.append({"tier": f"binary_oversample_{ovs}_cosine",
                      "recall_at_10": round(bq_hits / max(n_flat, 1), 4),
                      "batch_sec": bq_sec})
    ann_recall = {"n_lists": idx.n_lists, "k": 10, "queries": 100,
                  "curve": curve}

    # write-side workload (BASELINE.md "FTS write workload": 50 TEXT
    # fields ingest): one timed build of a cached 50-field index over a
    # 10k-doc slice — reported SEPARATELY so the query aggregate stays
    # comparable round-over-round
    from pyspark.sql import functions as F

    from valkey_search_spark import SearchEngine, TextField

    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet").limit(10_000))
    toks = F.split(F.col("text"), " ")
    wide = docs.select(
        "doc_id", *[F.array_join(F.slice(toks, i + 1, 5), " ").alias(f"field{i}")
                    for i in range(50)])
    eng = SearchEngine(spark)
    t0 = time.perf_counter()
    eng.ft_create("bench_wide", wide,
                  [TextField(f"field{i}") for i in range(50)],
                  key_column="doc_id", cache=True)
    n_docs = eng.ft_search("bench_wide", "*", count_only=True)  # build
    ingest_sec = round(time.perf_counter() - t0, 4)

    # concurrent-client shape (the reference CI drives 1000 clients):
    # 16 driver threads issuing mixed warm queries; Spark's scheduler
    # interleaves the jobs. Reported separately from the serial numbers.
    import threading

    mixed = ["text_term", "tag_match_prefix", "negation", "knn_hybrid"]
    per_thread = 8
    n_threads = 16
    done = []

    def client(tid):
        for i in range(per_thread):
            qs[mixed[(tid + i) % len(mixed)]](spark, sf_dir).collect()
        done.append(tid)

    # min-of-2: thread-scheduling noise swings a single concurrent run
    # ~1.5x; the better run is the steady-state figure
    conc_sec = None
    for _ in range(2):
        done.clear()
        t0 = time.perf_counter()
        threads = [threading.Thread(target=client, args=(t,))
                   for t in range(n_threads)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        dt = time.perf_counter() - t0
        conc_sec = dt if conc_sec is None else min(conc_sec, dt)
        assert len(done) == n_threads
    n_queries = n_threads * per_thread

    total = round(sum(times.values()), 4)
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": times,
        "runs_per_query": 3,
        "ann_recall": ann_recall,
        "ingest": {"workload": "50field_text_ingest_10k",
                   "docs": n_docs, "sec": ingest_sec,
                   "docs_per_sec": round(n_docs / max(ingest_sec, 1e-9), 1)},
        "concurrent": {"threads": n_threads, "queries": n_queries,
                       "sec": round(conc_sec, 4),
                       "qps": round(n_queries / max(conc_sec, 1e-9), 1)},
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
