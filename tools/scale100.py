"""100x-and-beyond scale legs for SCALE.md (round-9 verdict item 2):
minhash_lsh_pairs at 1M docs and the routed ANN join paths
(knn_join_bucketed, HNSW routed) at 400k vectors.

Replication scheme (deterministic, no RNG):
- documents: each of sf0.1's 5k docs is replicated R times with every
  word suffixed ``_<r>`` — replicas share ZERO shingles across replica
  ids, so the corpus is 5k*R UNIQUE documents and the true near-dup
  pair set is exactly R disjoint copies of the base corpus's pair set
  (a correctness pin at scale, and the honest workload: measuring a
  corpus that is 99.5% literal duplicates would let the exact-dedup
  shuffle collapse the work instead of scaling it).
- embeddings: each of sf0.1's 2k vectors replicated R times with a
  per-replica offset on component 0 (r * 1e-3), so vectors are unique
  and brute-force recall is well-defined.

For each leg it reports wall time at 1x and Rx, the observed scaling
exponent log(t_R/t_1)/log(R), and PLAN-SHAPE PINS: the number of
Exchange and Python-eval stages in the executed plan must be IDENTICAL
at both scales (a plan that grows exchanges with data is the 100 TB
failure mode the pin exists to catch).

Usage: python tools/scale100.py [R_docs] [R_vecs]   (defaults 200 200)
"""
from __future__ import annotations

import math
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from valkey_search_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def plan_pins(df) -> dict[str, int]:
    # pin the PRE-AQE physical plan: it is a pure function of the query
    # shape, so any growth with data size is a real pathology. The
    # executed (post-AQE) plan legitimately differs across scales —
    # AQE converts small shuffle joins to broadcast — so it is reported
    # but not asserted.
    plan = df._jdf.queryExecution().sparkPlan().toString()
    return {
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "python_stages": len(re.findall(
            r"ArrowEvalPython|BatchEvalPython|MapInPandas"
            r"|FlatMapGroupsInPandas", plan)),
    }


def timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return out, round(time.perf_counter() - t0, 2)


def replicate_docs(docs, r: int):
    rep = docs.select(
        "doc_id", "text",
        F.explode(F.sequence(F.lit(0), F.lit(r - 1))).alias("r"))
    return rep.select(
        (F.col("doc_id") * r + F.col("r")).alias("doc_id"),
        F.array_join(
            F.transform(F.split("text", " "),
                        lambda w: F.concat(w, F.lit("_"),
                                           F.col("r").cast("string"))),
            " ").alias("text"))


def replicate_vecs(emb, r: int):
    rep = emb.select(
        "vec_id", "embedding", "label",
        F.explode(F.sequence(F.lit(0), F.lit(r - 1))).alias("r"))
    return rep.select(
        (F.col("vec_id") * r + F.col("r")).alias("vec_id"),
        F.transform(
            F.col("embedding"),
            lambda x, i: x + F.when(i == 0, F.col("r") * F.lit(1e-3))
            .otherwise(F.lit(0.0))).alias("embedding"),
        "label")


def replicate_vecs_spread(emb, r: int):
    """Unique vectors with REAL spread for the recall-gate leg: the
    1e-3 replica clouds above are the HONEST stress case for dedup-ish
    workloads but DEGENERATE for graph recall (near-coincident points
    starve the neighbor-diversity heuristic — that is what capped the
    r10 ef=64 measurement at 0.917, a corpus property, not an index
    bug). Here each replica adds a deterministic per-(replica, dim)
    offset 0.35*sin((r+1)*(dim+1.3)) — pseudo-random in [-0.35, 0.35],
    expected inter-replica L2 ~2 on the 64-dim unit-ish base, the same
    order as the base corpus's own spread — so brute-force truth is
    well-defined AND the graph sees a realistic point distribution."""
    rep = emb.select(
        "vec_id", "embedding", "label",
        F.explode(F.sequence(F.lit(0), F.lit(r - 1))).alias("r"))
    return rep.select(
        (F.col("vec_id") * r + F.col("r")).alias("vec_id"),
        F.transform(
            F.col("embedding"),
            lambda x, i: x + F.lit(0.35) * F.sin(
                (F.col("r") + 1).cast("double")
                * (i.cast("double") + F.lit(1.3)))).alias("embedding"),
        "label")


def main():
    r_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    r_vecs = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    spark = get_spark("scale100")
    spark.sparkContext.setLogLevel("ERROR")

    # ---------------- minhash_lsh_pairs ---------------------------------
    from valkey_search_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "text")
    base_path = "/tmp/scale100_docs_base.parquet"
    big_path = "/tmp/scale100_docs_big.parquet"
    replicate_docs(docs, 1).write.mode("overwrite").parquet(base_path)
    replicate_docs(docs, r_docs).write.mode("overwrite").parquet(big_path)
    d1 = spark.read.parquet(base_path)
    dR = spark.read.parquet(big_path)
    n1, nR = d1.count(), dR.count()

    out1 = minhash_lsh_pairs(d1, "doc_id")
    p1, t1 = timed(out1.count)
    outR = minhash_lsh_pairs(dR, "doc_id")
    pR, tR = timed(outR.count)
    pins1, pinsR = plan_pins(out1), plan_pins(outR)
    exp = math.log(tR / t1) / math.log(nR / n1)
    print(f"minhash_lsh_pairs: {n1} docs {t1}s ({p1} pairs) -> "
          f"{nR} docs {tR}s ({pR} pairs); exponent {exp:.2f}; "
          f"pins {pins1} vs {pinsR}", flush=True)
    assert pins1 == pinsR, "plan shape grew with scale"
    # the true pair set is R disjoint copies of the base pair set;
    # banding recall is probabilistic per replica (hash values differ),
    # so borderline-J pairs may drop a few candidates — require >= 98%
    assert 0.98 * r_docs * p1 <= pR <= r_docs * p1, (pR, r_docs, p1)

    # ---------------- IVF bucketed KNN join -----------------------------
    from valkey_search_spark.operators.ann import (
        IVFIndex, batch_recall, knn_join, knn_join_bucketed)

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    vec_path = "/tmp/scale100_vecs.parquet"
    replicate_vecs(emb, r_vecs).write.mode("overwrite").parquet(vec_path)
    corpus = spark.read.parquet(vec_path) \
        .select(F.col("vec_id").alias("cid"), "embedding")
    nvec = corpus.count()
    queries = (spark.read.parquet(vec_path)
               .where(F.col("vec_id") % r_vecs == 0)
               .limit(500)
               .select(F.col("vec_id").alias("qid"), "embedding"))

    n_lists = 128
    _, t_build = timed(lambda: IVFIndex.build(
        corpus, path="/tmp/scale100_ivf", vec_col="embedding",
        metric="l2", n_lists=n_lists,
        sample_fraction=min(1.0, 60_000 / nvec)))
    idx = IVFIndex.load(spark, "/tmp/scale100_ivf")
    jb = knn_join_bucketed(queries, idx, k=10, nprobe=n_lists // 4)
    _, t_join = timed(jb.count)
    exact = knn_join(queries, corpus, k=10, metric="l2",
                     max_broadcast_bytes=None)
    _, t_exact = timed(exact.count)
    rec = batch_recall(jb, exact)
    print(f"ivf@{nvec}: build {t_build}s, bucketed join (500q, "
          f"nprobe {n_lists // 4}/{n_lists}) {t_join}s, "
          f"brute {t_exact}s, recall@10 {rec:.3f}; "
          f"pins {plan_pins(jb)}", flush=True)

    # ---------------- HNSW routed join ----------------------------------
    from valkey_search_spark.operators.hnsw import HNSWIndex, knn_join_hnsw

    _, t_hbuild = timed(lambda: HNSWIndex.build(
        corpus, path="/tmp/scale100_hnsw", vec_col="embedding",
        key_col="cid", metric="l2", m=16, ef_construction=100,
        max_segment_rows=8192, partitioner="kmeans",
        sample_fraction=min(1.0, 60_000 / nvec)))
    hidx = HNSWIndex.load(spark, "/tmp/scale100_hnsw")
    # a corpus small enough for ONE segment has no centroids to route
    # (kmeans assignment is skipped at n_segments == 1) — route only
    # when the index actually clustered
    route = 4 if hidx.centroids is not None else None
    hj = knn_join_hnsw(queries, hidx, k=10, ef=64, route_segments=route)
    _, t_routed = timed(hj.count)
    hrec = batch_recall(hj, exact, corpus_key="cid")
    hj_full = knn_join_hnsw(queries, hidx, k=10, ef=64)
    _, t_full = timed(hj_full.count)
    frec = batch_recall(hj_full, exact, corpus_key="cid")
    print(f"hnsw@{nvec}: build {t_hbuild}s ({hidx.n_segments} segs), "
          f"routed(4) {t_routed}s recall {hrec:.3f}, "
          f"full-probe {t_full}s recall {frec:.3f}; "
          f"pins {plan_pins(hj)}", flush=True)

    gate_leg(spark, r_vecs)
    span_leg(spark, min(100, max(2, r_vecs // 2)))


def span_leg(spark, r: int):
    """exact_substring_dedup at scale (new r11 driver row): the
    word-suffix replication scheme shares ZERO grams across replica
    ids, so the true duplicated-span structure of the Rx corpus is
    exactly R disjoint copies of the base corpus's — an EXACT
    correctness pin at scale (total tokens_dropped and spans_dropped
    must be exactly R times the base totals), alongside the usual
    wall-time exponent and plan-shape pins."""
    from valkey_search_spark.operators.contamination import (
        exact_substring_dedup,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "text")
    base_path = "/tmp/scale100_span_base.parquet"
    big_path = "/tmp/scale100_span_big.parquet"
    replicate_docs(docs, 1).write.mode("overwrite").parquet(base_path)
    replicate_docs(docs, r).write.mode("overwrite").parquet(big_path)
    d1 = spark.read.parquet(base_path)
    dR = spark.read.parquet(big_path)
    n1, nR = d1.count(), dR.count()

    def run(df):
        out = exact_substring_dedup(df, n=4, min_doc_freq=2)
        agg = out.agg(F.sum("tokens_dropped").alias("td"),
                      F.sum("spans_dropped").alias("sd"))
        row, sec = timed(lambda: agg.collect()[0])
        return out, row, sec

    out1, t1_row, t1 = run(d1)
    outR, tR_row, tR = run(dR)
    pins1, pinsR = plan_pins(out1), plan_pins(outR)
    exp = math.log(tR / t1) / math.log(nR / n1)
    ok = (tR_row["td"] == r * t1_row["td"]
          and tR_row["sd"] == r * t1_row["sd"])
    print(f"span_dedup: {n1} docs {t1}s (dropped {t1_row['td']} toks /"
          f" {t1_row['sd']} spans) -> {nR} docs {tR}s "
          f"(dropped {tR_row['td']} / {tR_row['sd']}); exact-Rx "
          f"{'pass' if ok else 'FAIL'}; exponent {exp:.2f}; "
          f"pins {pins1} vs {pinsR}", flush=True)
    assert pins1 == pinsR, "plan shape grew with scale"
    assert ok, (t1_row, tR_row, r)


def gate_leg(spark, r_vecs: int):
    """The bench's pass/fail recall tier (clustered_routed_r2: kmeans
    partitioner, route_segments=2, ef=48, recall@10 >= 0.95) at 400k
    vectors — r10 verdict item 3. Corpus: spread replicas (see
    ``replicate_vecs_spread``) + the SAME label shift the bench
    injects (+25.0 on dim label%64), so kmeans has genuine cluster
    structure and brute-force truth is non-degenerate. Build params
    match the bench tier (m=8, ef_construction=60); segment size
    scales with the corpus (8192 rows — the tier gates ROUTING
    recall, not segment granularity). Asserts the gate threshold:
    a regression here fails the leg, same semantics as bench.py's
    recall_gate."""
    from valkey_search_spark.operators.ann import batch_recall, knn_join
    from valkey_search_spark.operators.hnsw import HNSWIndex, knn_join_hnsw

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    path = "/tmp/scale100_vecs_gate.parquet"
    (replicate_vecs_spread(emb, r_vecs)
     .select(F.col("vec_id").alias("cid"),
             F.transform(
                 F.col("embedding"),
                 lambda x, i: F.when(i == F.col("label") % 64,
                                     x + F.lit(25.0)).otherwise(x))
             .cast("array<float>").alias("embedding"))
     .write.mode("overwrite").parquet(path))
    cl = spark.read.parquet(path)
    nvec = cl.count()
    qcl = (cl.where(F.col("cid") % r_vecs == 0).limit(500)
           .select(F.col("cid").alias("qid"), "embedding"))
    _, t_build = timed(lambda: HNSWIndex.build(
        cl, path="/tmp/scale100_hnsw_gate", vec_col="embedding",
        key_col="cid", metric="l2", m=8, ef_construction=60,
        max_segment_rows=8192, partitioner="kmeans",
        sample_fraction=min(1.0, 60_000 / nvec)))
    gidx = HNSWIndex.load(spark, "/tmp/scale100_hnsw_gate")
    exact = knn_join(qcl, cl, k=10, metric="l2",
                     max_broadcast_bytes=None)
    _, t_exact = timed(exact.count)
    routed = knn_join_hnsw(qcl, gidx, k=10, ef=48, route_segments=2)
    _, t_routed = timed(routed.count)
    grec = batch_recall(routed, exact, corpus_key="cid")
    print(f"GATE clustered_routed_r2 @ {nvec}: build {t_build}s "
          f"({gidx.n_segments} segs, {len(gidx.seg_map or {})} "
          f"clusters), brute {t_exact}s, routed(2) ef=48 {t_routed}s, "
          f"recall@10 {grec:.3f} -> "
          f"{'pass' if grec >= 0.95 else 'FAIL'}", flush=True)
    assert grec >= 0.95, f"gate tier recall {grec:.3f} < 0.95 at {nvec}"


if __name__ == "__main__":
    if "gate" in sys.argv[1:] or "span" in sys.argv[1:]:
        spark = get_spark("scale100")
        spark.sparkContext.setLogLevel("ERROR")
        # the replica count may appear on either side of the leg
        # keyword ("200 gate" and "gate 200" both honor the count)
        digits = [a for a in sys.argv[1:] if a.isdigit()]
        r = int(digits[0]) if digits else 200
        if "gate" in sys.argv[1:]:
            gate_leg(spark, r)
        if "span" in sys.argv[1:]:
            span_leg(spark, r)
    else:
        main()
