"""IR quality evaluation: precision/recall@k, MRR, NDCG@k over a
(query, doc, score) results frame against graded relevance judgments —
the measurement half of the search stack (FT.SEARCH text scoring,
BM25/BM25F, KNN/ANN) so index-quality regressions are a query away.

All metrics compute as ONE plan: rank results per query (window),
left-join the judgments, aggregate per query, then one global mean.
No Python, no driver loops — evaluates a million-query log the same
way it evaluates ten.

Metric definitions (the standard TREC forms):
  precision@k = |relevant ∩ top-k| / k
  recall@k    = |relevant ∩ top-k| / |relevant(q)|
  MRR         = 1 / rank of the first relevant result (0 if none)
  NDCG@k      = DCG@k / IDCG@k,  DCG = Σ (2^grade - 1) / log2(rank + 1)
Queries with judgments but no results still count (all-zero row, via a
right-outer pass on the qrels' query set); queries with results but no
judgments are excluded (unjudged ≠ irrelevant is the TREC convention).

Reference analogue: none — valkey-search ships no evaluation surface;
beyond-reference extension (SURVEY.md §2.10). Oracle: a DuckDB
recomputation of every metric (tests/test_evaluation.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def ir_metrics(results: DataFrame, qrels: DataFrame, k: int = 10,
               query_col: str = "qid", doc_col: str = "doc_id",
               score_col: str = "score",
               grade_col: str = "grade") -> DataFrame:
    """Per-query IR metrics. ``results``: (query, doc, score) — higher
    score = better, ties broken by doc id for determinism. ``qrels``:
    (query, doc, grade) with grade > 0 meaning relevant (graded for
    NDCG, binarized for precision/recall/MRR). Returns one row per
    JUDGED query: n_results, n_relevant, precision_at_k, recall_at_k,
    mrr, ndcg_at_k.

    Duplicate (query, doc) rows — a union of shard scans, a dirty log —
    are collapsed before ranking (best score wins; best grade for
    qrels), otherwise a twice-returned doc would double-count into
    recall/NDCG and push them past 1.0. The results dedup rides the
    same single query-keyed exchange as the rank window (two in-
    partition sorts, no extra shuffle); n_results counts DISTINCT
    returned docs."""
    if k <= 0:
        raise ValueError("k must be positive")
    q, d = query_col, doc_col

    w_dedup = Window.partitionBy(q).orderBy(F.col(d).asc(),
                                            F.col(score_col).desc())
    distinct_res = (results
                    .withColumn("__keep", F.coalesce(
                        F.lag(d).over(w_dedup) != F.col(d), F.lit(True)))
                    .where("__keep"))
    ranked = distinct_res.select(
        F.col(q), F.col(d),
        F.row_number().over(
            Window.partitionBy(q).orderBy(F.col(score_col).desc(),
                                          F.col(d).asc())).alias("__rank"))
    j = (qrels.select(F.col(q), F.col(d),
                      F.col(grade_col).cast("double").alias("__g"))
         .where(F.col(grade_col) > 0)
         .groupBy(q, d).agg(F.max("__g").alias("__g")))

    # ONE pass over the ranked results (left-join the judgments, then a
    # single per-query aggregate carrying n_results alongside the hit
    # stats) and ONE windowed pass over the judgments (ideal DCG +
    # n_relevant on the same query-keyed exchange). The former 4-branch
    # shape re-executed the rank window for the n_results count and the
    # judgment aggregation for n_relevant — plans are trees, and pruned
    # projections defeat exchange reuse; this shape computes each
    # subtree once and joins two frames instead of four.
    per_q = (ranked.join(j, [q, d], "left")
             .groupBy(q).agg(
                 F.count("*").alias("n_results"),
                 F.sum(F.when((F.col("__rank") <= k)
                              & F.col("__g").isNotNull(), 1).otherwise(0))
                  .alias("__rel_at_k"),
                 F.min(F.when(F.col("__g").isNotNull(), F.col("__rank")))
                  .alias("__first_rel"),
                 F.sum(F.when((F.col("__rank") <= k)
                              & F.col("__g").isNotNull(),
                              (F.pow(F.lit(2.0), F.col("__g")) - 1)
                              / F.log2(F.col("__rank") + 1))
                       .otherwise(0.0)).alias("__dcg")))

    # ideal DCG: grades sorted descending, discounted at ranks 1..k;
    # n_relevant rides the same aggregation (count of ALL judged rows)
    ideal = (j.withColumn("__irank", F.row_number().over(
        Window.partitionBy(q).orderBy(F.col("__g").desc(),
                                      F.col(d).asc())))
        .groupBy(q).agg(
            F.sum(F.when(F.col("__irank") <= k,
                         (F.pow(F.lit(2.0), F.col("__g")) - 1)
                         / F.log2(F.col("__irank") + 1)))
             .alias("__idcg"),
            F.count("*").alias("n_relevant")))

    return (ideal.join(per_q, q, "left")
            .select(
                F.col(q),
                F.coalesce("n_results", F.lit(0)).alias("n_results"),
                "n_relevant",
                (F.coalesce("__rel_at_k", F.lit(0)) / F.lit(float(k)))
                .alias("precision_at_k"),
                (F.coalesce("__rel_at_k", F.lit(0))
                 / F.col("n_relevant").cast("double")).alias("recall_at_k"),
                F.coalesce(1.0 / F.col("__first_rel"), F.lit(0.0))
                .alias("mrr"),
                F.coalesce(F.col("__dcg") / F.col("__idcg"), F.lit(0.0))
                .alias("ndcg_at_k")))


def ir_summary(results: DataFrame, qrels: DataFrame, k: int = 10,
               **kwargs) -> DataFrame:
    """Macro-averaged (mean over judged queries) single-row summary of
    ``ir_metrics`` — the number you track per index build."""
    per_q = ir_metrics(results, qrels, k=k, **kwargs)
    return per_q.agg(
        F.count("*").alias("n_queries"),
        F.avg("precision_at_k").alias("precision_at_k"),
        F.avg("recall_at_k").alias("recall_at_k"),
        F.avg("mrr").alias("mrr"),
        F.avg("ndcg_at_k").alias("ndcg_at_k"))


def paired_bootstrap(results_a: DataFrame, results_b: DataFrame,
                     qrels: DataFrame, metric: str = "ndcg_at_k",
                     k: int = 10, n_boot: int = 2000, seed: int = 7,
                     **kwargs) -> dict:
    """Paired bootstrap significance test between two runs over the
    same judged queries (the Smucker/Allan/Carterette recipe — THE
    standard answer to "is B actually better than A, or did 50 queries
    get lucky?"). Per-query ``metric`` values for both runs compute as
    the usual distributed ir_metrics plans and inner-join on the query
    (both sides evaluate the identical judged-query set, so the join
    drops nothing); the per-query DELTA vector — one double per query —
    comes to the driver, and the bootstrap runs vectorized there: the
    deltas are re-centered at zero (the null), resampled with
    replacement ``n_boot`` times, and the two-sided p-value is the
    fraction of null means at least as extreme as the observed mean.

    Returns a plain dict: metric, n_queries, mean_a, mean_b, delta
    (b - a), ci_lo/ci_hi (percentile 95% CI of the delta), p_value,
    n_boot, seed. Deterministic in ``seed``.

    Scale note: the collected vector is 8 bytes per judged query and
    the resample matrix is n_boot x n_queries driver-side — fine to
    ~10^5 judged queries at the default n_boot; for a larger log,
    evaluate on a query sample or lower n_boot (statistical power
    saturates long before that).
    """
    import numpy as np

    valid = ("precision_at_k", "recall_at_k", "mrr", "ndcg_at_k")
    if metric not in valid:
        raise ValueError(f"metric must be one of {valid}, got {metric!r}")
    if n_boot < 100:
        raise ValueError(f"n_boot must be >= 100, got {n_boot}")
    qcol = kwargs.get("query_col", "qid")
    per_a = ir_metrics(results_a, qrels, k=k, **kwargs) \
        .select(F.col(qcol), F.col(metric).alias("__a"))
    per_b = ir_metrics(results_b, qrels, k=k, **kwargs) \
        .select(F.col(qcol), F.col(metric).alias("__b"))
    # orderBy the query id: delta MEANS are order-invariant but the
    # resample indices are positional, so a plan-dependent row order
    # would break the "deterministic in seed" contract
    rows = per_a.join(per_b, qcol).orderBy(qcol) \
        .select("__a", "__b").collect()
    if not rows:
        raise ValueError("no judged queries in common — nothing to test")
    a = np.array([r["__a"] for r in rows], dtype=np.float64)
    b = np.array([r["__b"] for r in rows], dtype=np.float64)
    d = b - a
    obs = float(d.mean())
    rng = np.random.default_rng(seed)
    centered = d - d.mean()
    idx = rng.integers(0, d.size, size=(n_boot, d.size))
    null_means = centered[idx].mean(axis=1)
    # +1 smoothing keeps p > 0 (a bootstrap can never certify p = 0)
    p = float((np.abs(null_means) >= abs(obs)).sum() + 1) / (n_boot + 1)
    boot_means = d[idx].mean(axis=1)
    lo, hi = np.percentile(boot_means, [2.5, 97.5])
    return {"metric": metric, "n_queries": int(d.size),
            "mean_a": float(a.mean()), "mean_b": float(b.mean()),
            "delta": obs, "ci_lo": float(lo), "ci_hi": float(hi),
            "p_value": min(p, 1.0), "n_boot": int(n_boot),
            "seed": int(seed)}
