"""Hard-negative mining for retrieval/embedding training.

The standard contrastive-training data step: for each query, retrieve
its nearest corpus items, drop the KNOWN positives, optionally drop
near-positives that are probably unlabeled true matches (the margin
rule used by sentence-transformers' mine_hard_negatives: keep a
negative only if it is at least ``margin`` FARTHER than the query's
best positive), and keep the k hardest survivors.

Scale shape: one ``knn_join`` (broadcast <= 1 GB, auto-routes to the
IVF cogroup past that) fetching ``fetch_factor * k`` candidates, one
broadcast anti-join against the labeled pairs, one broadcast join of
the per-query best-positive distance (a |positives|-row aggregate),
and a final window — no extra corpus scans beyond the retrieval
itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .ann import knn_join


def positive_distances(positives: DataFrame, queries: DataFrame,
                       corpus: DataFrame, query_key: str = "qid",
                       corpus_key: str = "cid",
                       vec_col: str = "embedding",
                       metric: str = "cosine") -> DataFrame:
    """(query_key, __pos_dist): each query's BEST (smallest) labeled
    positive distance — the margin rule's anchor. Pure JVM: join the
    two vector tables onto the (qid, cid) pairs, zip_with distance,
    min per query. A zero-norm cosine vector yields a NULL distance
    (undefined cosine) and simply doesn't anchor — F.min skips NULLs;
    note ann.py's rerank block instead treats the norm as 1.0 (raw
    dot) because there a score must always exist."""
    q = queries.select(F.col(query_key),
                       F.col(vec_col).alias("__qv"))
    c = corpus.select(F.col(corpus_key), F.col(vec_col).alias("__cv"))
    pairs = (positives.select(query_key, corpus_key)
             .join(F.broadcast(q), query_key).join(c, corpus_key))
    if metric == "l2":
        d = F.sqrt(F.aggregate(
            F.zip_with(F.col("__qv"), F.col("__cv"),
                       lambda x, y: (x.cast("double") - y.cast("double"))
                       * (x.cast("double") - y.cast("double"))),
            F.lit(0.0), lambda a, x: a + x))
    else:
        dot = F.aggregate(
            F.zip_with(F.col("__qv"), F.col("__cv"),
                       lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0), lambda a, x: a + x)
        if metric == "cosine":
            nq = F.sqrt(F.aggregate(F.col("__qv"), F.lit(0.0),
                                    lambda a, x: a + x.cast("double") * x))
            nc = F.sqrt(F.aggregate(F.col("__cv"), F.lit(0.0),
                                    lambda a, x: a + x.cast("double") * x))
            dot = F.when((nq > 0) & (nc > 0), dot / (nq * nc))
        d = F.lit(1.0) - dot
    return (pairs.withColumn("__d", d)
            .groupBy(query_key).agg(F.min("__d").alias("__pos_dist")))


def mine_hard_negatives(queries: DataFrame, corpus: DataFrame,
                        positives: DataFrame, k: int = 10,
                        margin: float | None = None,
                        fetch_factor: int = 3,
                        query_key: str = "qid", corpus_key: str = "cid",
                        vec_col: str = "embedding",
                        metric: str = "cosine",
                        **knn_kwargs) -> DataFrame:
    """Top-k hardest negatives per query.

    ``positives``: (query_key, corpus_key) labeled pairs — always
    excluded. ``margin`` (in DISTANCE units, metric convention
    l2/ip/cosine as elsewhere): additionally drop candidates closer
    than ``best_positive_distance + margin`` — likely unlabeled
    positives. ``fetch_factor * k + per-query positive count`` bounds
    how deep the retrieval must go for k survivors; queries whose
    survivors run out return fewer rows (mirror of the retrieval
    truncation, reported honestly rather than padded).

    Returns (query_key, corpus_key, distance, rank) with rank 1 = the
    hardest (closest) kept negative. Extra kwargs reach knn_join
    (e.g. ``corpus_size_hint``, ``max_broadcast_bytes``)."""
    from pyspark.sql.window import Window

    if fetch_factor < 1:
        raise ValueError("fetch_factor must be >= 1")
    # worst case every fetched row is a labeled positive of that query:
    # fetch k*factor + the global max positives per query (one tiny agg)
    max_pos = (positives.groupBy(query_key).count()
               .agg(F.max("count")).first()[0] or 0)
    fetch_k = k * fetch_factor + int(max_pos)
    cand = knn_join(queries, corpus, k=fetch_k, query_key=query_key,
                    corpus_key=corpus_key, vec_col=vec_col,
                    metric=metric, **knn_kwargs)
    cand = cand.join(F.broadcast(positives.select(query_key, corpus_key)
                                 .distinct()),
                     [query_key, corpus_key], "left_anti")
    if margin is not None:
        anchors = positive_distances(
            positives, queries, corpus, query_key=query_key,
            corpus_key=corpus_key, vec_col=vec_col, metric=metric)
        cand = (cand.join(F.broadcast(anchors), query_key, "left")
                .where(F.col("__pos_dist").isNull()
                       | (F.col("distance")
                          >= F.col("__pos_dist") + F.lit(float(margin))))
                .drop("__pos_dist"))
    w = Window.partitionBy(query_key).orderBy(
        F.col("distance").asc(), F.col(corpus_key).asc())
    return (cand.drop("rank").withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))
