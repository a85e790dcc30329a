"""Margin-based parallel-pair mining (bitext mining) over two
embedding sets — the Artetxe & Schwenk (2019) recipe used to build
translation corpora from web crawls (LASER/CCMatrix).

Raw cosine fails at scale because of HUBS: some vectors are near
everything, so thresholding cosine floods the output with false pairs.
The margin score normalizes each candidate pair's cosine by the two
sides' local neighborhood densities:

    margin(x, y) = cos(x, y) /
        (avg cos(x, NN_k(x)) / 2 + avg cos(y, NN_k(y)) / 2)

A hub has a dense neighborhood -> big denominator -> its pairs score
low; an isolated true translation pair scores high. ``max`` strategy
additionally keeps only MUTUAL best matches (x's best y is x, and
vice versa), the strictest published variant.

Plan shape: two ``knn_join`` batches (src->tgt and tgt->src — each
broadcast-or-bucketed exactly like every other KNN in this engine),
two tiny per-key neighborhood aggregates (k rows per key in, 1 out),
one join to assemble margins, one mutual-best semi-join. Nothing
driver-side; the pair frame is bounded by |src| + |tgt| rows before
thresholding.

Reference analogue: none; beyond-reference extension (SURVEY §2.10).
Oracle: scalar recomputation of every margin + planted-alignment and
hub-rejection tests (tests/test_bitext.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def mine_bitext(src: DataFrame, tgt: DataFrame, k: int = 4,
                src_key: str = "src_id", tgt_key: str = "tgt_id",
                vec_col: str = "embedding",
                min_margin: float = 1.0,
                mutual: bool = True,
                max_broadcast_bytes: int | None = 1 << 30) -> DataFrame:
    """Mine aligned pairs between ``src`` and ``tgt`` embedding frames.
    Returns (src_key, tgt_key, cos, margin), one row per surviving
    pair: each side's best margin-scored match, optionally restricted
    to MUTUAL bests, thresholded at ``min_margin``. ``k`` sizes the
    neighborhood-density estimate (the paper uses 4)."""
    from .ann import knn_join

    if k <= 0:
        raise ValueError("k must be positive")
    s = src.select(F.col(src_key).alias("__s"), F.col(vec_col))
    t = tgt.select(F.col(tgt_key).alias("__t"), F.col(vec_col))

    # ONE tagged size-probe job for both sides: each knn_join otherwise
    # runs its own first() + count() metadata pair to size-check the
    # broadcast — four eager jobs per call collapse into one
    hints = None
    if max_broadcast_bytes is not None:
        probe = {r["side"]: r for r in
                 (s.select(F.lit("s").alias("side"),
                           F.col(vec_col).alias("__v"))
                  .unionByName(t.select(F.lit("t").alias("side"),
                                        F.col(vec_col).alias("__v")))
                  .groupBy("side")
                  .agg(F.count(F.lit(1)).alias("n"),
                       F.max(F.size("__v")).alias("d"))).collect()}

        def hint(side):
            r = probe.get(side)
            return (int(r["n"]), int(r["d"] or 0)) if r else (0, 0)

        hints = {"s": hint("s"), "t": hint("t")}

    # forward and backward KNN in cosine space; cos = 1 - distance.
    # Each KNN frame feeds TWO consumers (its density aggregate + the
    # margin pair assembly) — plans are trees and the BLAS scoring
    # stage is a Python stage with no exchange to reuse, so without a
    # persist each kernel executes once per branch (measured 2x per
    # direction). The persisted frame is bounded at |side| * k rows of
    # (key, key, distance) — never corpus-scale; ContextCleaner
    # unpersists once the returned frame is unreferenced.
    fwd = knn_join(s, t, k=k, query_key="__s", corpus_key="__t",
                   vec_col=vec_col, metric="cosine",
                   max_broadcast_bytes=max_broadcast_bytes,
                   corpus_size_hint=hints["t"] if hints else None) \
        .withColumn("__cos", 1.0 - F.col("distance")) \
        .select("__s", "__t", "__cos").persist()
    bwd = knn_join(t, s, k=k, query_key="__t", corpus_key="__s",
                   vec_col=vec_col, metric="cosine",
                   max_broadcast_bytes=max_broadcast_bytes,
                   corpus_size_hint=hints["s"] if hints else None) \
        .withColumn("__cos", 1.0 - F.col("distance")) \
        .select("__t", "__s", "__cos").persist()

    # neighborhood densities: avg cos over each side's k neighbors
    s_den = fwd.groupBy("__s").agg(F.avg("__cos").alias("__sden"))
    t_den = bwd.groupBy("__t").agg(F.avg("__cos").alias("__tden"))

    # margin for every forward candidate pair
    pairs = (fwd.select("__s", "__t", "__cos")
             .join(s_den, "__s").join(t_den, "__t")
             .withColumn("margin", F.col("__cos")
                         / (F.col("__sden") / 2 + F.col("__tden") / 2)))

    w_s = Window.partitionBy("__s").orderBy(F.col("margin").desc(),
                                            F.col("__t").asc())
    best_fwd = (pairs.withColumn("__r", F.row_number().over(w_s))
                .where("__r = 1").drop("__r"))
    if mutual:
        # backward margins reuse the SAME density aggregates
        bpairs = (bwd.select("__t", "__s", "__cos")
                  .join(s_den, "__s").join(t_den, "__t")
                  .withColumn("margin", F.col("__cos")
                              / (F.col("__sden") / 2
                                 + F.col("__tden") / 2)))
        w_t = Window.partitionBy("__t").orderBy(F.col("margin").desc(),
                                                F.col("__s").asc())
        best_bwd = (bpairs.withColumn("__r", F.row_number().over(w_t))
                    .where("__r = 1")
                    .select("__s", "__t"))
        best_fwd = best_fwd.join(best_bwd, ["__s", "__t"], "left_semi")

    out = (best_fwd.where(F.col("margin") >= min_margin)
           .select(F.col("__s").alias(src_key),
                   F.col("__t").alias(tgt_key),
                   F.col("__cos").alias("cos"), "margin"))
    # dedup's release() convention: long-lived sessions can free the
    # two bounded candidate caches once the result is consumed instead
    # of waiting for ContextCleaner to notice the lineage is dead
    from .dedup import _with_handles

    return _with_handles(out, fwd, bwd)
