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

    hits = (ranked.join(j, [q, d], "inner")
            .select(q, "__rank", "__g"))
    per_q_hits = hits.groupBy(q).agg(
        F.sum(F.when(F.col("__rank") <= k, 1).otherwise(0))
         .alias("__rel_at_k"),
        F.min("__rank").alias("__first_rel"),
        F.sum(F.when(F.col("__rank") <= k,
                     (F.pow(F.lit(2.0), F.col("__g")) - 1)
                     / F.log2(F.col("__rank") + 1)).otherwise(0.0))
         .alias("__dcg"))

    # ideal DCG: grades sorted descending, discounted at ranks 1..k
    ideal = (j.withColumn("__irank", F.row_number().over(
        Window.partitionBy(q).orderBy(F.col("__g").desc(),
                                      F.col(d).asc())))
        .where(F.col("__irank") <= k)
        .groupBy(q).agg(
            F.sum((F.pow(F.lit(2.0), F.col("__g")) - 1)
                  / F.log2(F.col("__irank") + 1)).alias("__idcg")))
    n_rel = j.groupBy(q).agg(F.count("*").alias("n_relevant"))
    n_res = distinct_res.groupBy(q).agg(F.count("*").alias("n_results"))

    return (n_rel.join(ideal, q)
            .join(n_res, q, "left")
            .join(per_q_hits, q, "left")
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
