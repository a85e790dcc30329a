"""N-gram language-model perplexity scoring — the CCNet-style quality
filter: train a small LM on a REFERENCE corpus (CCNet uses Wikipedia),
score every document's per-token log-loss against it, and gate on the
resulting perplexity (low = reference-like prose, high = noise/boiler).
CCNet trains a KenLM 5-gram; this is the Spark-native equivalent at
bigram order with absolute-discount interpolation — counts are plain
aggregations, scoring is three hash joins, every probability is a
closed-form column expression (no model binary, no Python in the path).

Model (absolute discounting, interpolated — the Ney/Essen/Kneser form):

    P_uni(w) = max(c(w) - d, 0)/N  +  (d*T/N) * 1/(V+1)
    P_bi(w|v) = [max(c(v,w) - d, 0) + d*T(v)*P_uni(w)] / c(v)
                (falls back to P_uni(w) when v is unseen)

where N = training tokens, T = distinct unigram types, V = vocabulary
size (the +1 reserves mass for unseen words: an OOV token scores the
uniform floor (d*T/N)/(V+1) instead of zero), c(v) = occurrences of
context v, T(v) = distinct continuations of v. Discounting guarantees
every probability is positive, so log-loss is total. ``order=3`` adds
the trigram level with the same recursion —
P_tri(w|v1,v2) = [max(c(v1,v2,w) - d, 0) + d*T(v1,v2)*P_bi(w|v2)] /
c(v1,v2), backing off to P_bi when the two-word context is unseen (and
at each document's first bigram position, where no two-back context
exists) — two more broadcast joins, nothing else changes.

Scale shape: the trained tables are reference-corpus aggregates
(bounded by distinct bigram count — broadcastable for any reference
that fits a single machine's text, which is exactly CCNet's setup);
scoring explodes the target corpus into bigram positions and runs
three BROADCAST joins (bigram, context, unigram) plus one per-doc
aggregation — one shuffle keyed on the document, everything else
map-side. 100 TB of documents score against a Wikipedia-sized LM
without shuffling a single corpus token on a model key.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from ..functions.analysis import raw_tokens_column


@dataclass
class BigramLM:
    """Trained tables + scalars. ``uni``: (w, c_w); ``ctx``: (v, c_v,
    t_v); ``bi``: (v, w, c_vw); at ``order=3`` also ``tri``:
    (v1, v, w, c_tw) and ``tctx``: (v1, v, c_t, t_t). All are small
    reference-corpus aggregates and are broadcast at score time.
    (The name is historical — the class carries orders 2 and 3; the
    trigram level backs off recursively into the bigram level.)"""

    uni: DataFrame
    ctx: DataFrame
    bi: DataFrame
    n_tokens: int
    n_types: int
    discount: float
    tri: DataFrame | None = None
    tctx: DataFrame | None = None

    @classmethod
    def train(cls, reference: DataFrame, text_col: str = "text",
              min_count: int = 1, discount: float = 0.75,
              order: int = 2) -> "BigramLM":
        """Count-based training: one explode of the reference corpus,
        three aggregations (unigram, context, bigram) — five at
        ``order=3`` (+ trigram, trigram-context). ``min_count`` prunes
        singleton n-grams from the top tables only — their mass
        reappears through the discount/backoff term, exactly the
        pruning a KenLM build applies."""
        if order not in (2, 3):
            raise ValueError(f"order must be 2 or 3, got {order}")
        from .dedup import _pin

        # _pin: the posexplode's inferred size/isnotnull filter would
        # otherwise inline the tokenizer below this projection and run
        # it two extra times per row (dedup._pin docs)
        toks = (reference
                .select(_pin(raw_tokens_column(F.col(text_col)))
                        .alias("__t"))
                .select(F.posexplode("__t").alias("__i", "w"),
                        F.col("__t").alias("__toks")))
        pairs = (toks.where(F.col("__i") > 0)
                 .select(F.element_at("__toks", F.col("__i")).alias("v"),
                         "w"))
        uni = (toks.groupBy("w").agg(F.count(F.lit(1)).alias("c_w")))
        bi_full = pairs.groupBy("v", "w").agg(
            F.count(F.lit(1)).alias("c_vw"))
        # context totals BEFORE pruning (c(v)/T(v) must describe the
        # real distribution or the backoff mass is wrong)
        ctx = bi_full.groupBy("v").agg(
            F.sum("c_vw").alias("c_v"),
            F.count(F.lit(1)).alias("t_v"))
        bi = bi_full.where(F.col("c_vw") >= min_count)
        tri = tctx = None
        if order == 3:
            trips = (toks.where(F.col("__i") > 1)
                     .select(F.element_at("__toks", F.col("__i") - 1)
                             .alias("v1"),
                             F.element_at("__toks", F.col("__i"))
                             .alias("v"),
                             "w"))
            tri_full = trips.groupBy("v1", "v", "w").agg(
                F.count(F.lit(1)).alias("c_tw"))
            tctx = tri_full.groupBy("v1", "v").agg(
                F.sum("c_tw").alias("c_t"),
                F.count(F.lit(1)).alias("t_t"))
            tri = tri_full.where(F.col("c_tw") >= min_count)
        # persist the tables: every score() broadcast build (and
        # ccnet_buckets' extra action) would otherwise re-tokenize and
        # re-aggregate the whole reference corpus per table. The
        # n_tokens action below materializes uni; the others
        # materialize on first use. Call unpersist() when done.
        uni, ctx, bi = uni.persist(), ctx.persist(), bi.persist()
        if tri is not None:
            tri, tctx = tri.persist(), tctx.persist()
        n_tokens, n_types = uni.agg(
            F.sum("c_w"), F.count(F.lit(1))).first()
        if not n_tokens:
            raise ValueError("reference corpus has no tokens — cannot "
                             "train a language model on it")
        return cls(uni=uni, ctx=ctx, bi=bi,
                   n_tokens=int(n_tokens), n_types=int(n_types),
                   discount=float(discount), tri=tri, tctx=tctx)

    def unpersist(self) -> None:
        """Release the persisted model tables."""
        for t in (self.uni, self.ctx, self.bi, self.tri, self.tctx):
            if t is not None:
                t.unpersist()

    def save(self, path: str) -> None:
        """Persist the count tables (parquet) + scalars (json) so later
        jobs score without re-aggregating the reference corpus — the
        same artifact contract as the tokenizer/quality-model families
        (an LM artifact is a KenLM .arpa's moral equivalent)."""
        import json
        import os

        tables = {"uni": self.uni, "ctx": self.ctx, "bi": self.bi}
        if self.tri is not None:
            tables.update(tri=self.tri, tctx=self.tctx)
        for name, df in tables.items():
            df.write.mode("overwrite").parquet(os.path.join(path, name))
        with open(os.path.join(path, "_lm_meta.json"), "w") as fh:
            json.dump({"format": "bigram-lm-v1",
                       "n_tokens": self.n_tokens, "n_types": self.n_types,
                       "discount": self.discount,
                       "order": 3 if self.tri is not None else 2}, fh)

    @classmethod
    def load(cls, spark, path: str) -> "BigramLM":
        import json
        import os

        with open(os.path.join(path, "_lm_meta.json")) as fh:
            meta = json.load(fh)
        from ..artifact import check_format

        check_format(meta, "bigram-lm-v1", path)
        rd = spark.read.parquet
        tri = tctx = None
        if meta["order"] == 3:
            tri = rd(os.path.join(path, "tri")).persist()
            tctx = rd(os.path.join(path, "tctx")).persist()
        return cls(uni=rd(os.path.join(path, "uni")).persist(),
                   ctx=rd(os.path.join(path, "ctx")).persist(),
                   bi=rd(os.path.join(path, "bi")).persist(),
                   n_tokens=meta["n_tokens"], n_types=meta["n_types"],
                   discount=meta["discount"], tri=tri, tctx=tctx)

    def _p_uni(self, c_w):
        d, n, t = self.discount, self.n_tokens, self.n_types
        floor = (d * t / n) * (1.0 / (t + 1))
        return (F.greatest(F.coalesce(c_w, F.lit(0)).cast("double")
                           - d, F.lit(0.0)) / n) + F.lit(floor)

    def score(self, df: DataFrame, key: str = "doc_id",
              text_col: str = "text",
              tokens_col: str | None = None) -> DataFrame:
        """Adds ``lm_logprob_per_token`` (mean log2 P of each interior
        bigram position) and ``lm_perplexity`` (2^-that). Documents
        with fewer than two tokens score null. Join order and the
        broadcast hints keep the corpus on the streaming side of every
        join — the plan is pinned in test_plan_quality.

        ``tokens_col`` names an already-materialized token array (e.g.
        the one a composed analysis pass staged) to skip the second
        tokenizer scan — the same reuse hook as ``repetition_stats``."""
        from .dedup import _parallelize, _pin

        df = _parallelize(df)    # spread 1-task scans; no-op at scale
        # _pin (computed-tokens path only): see train() — stops the
        # generate-inferred filter from re-running the tokenizer
        toks_src = (F.col(tokens_col) if tokens_col
                    else _pin(raw_tokens_column(F.col(text_col))))
        staged = (df.select(F.col(key).alias("k"),
                            toks_src.alias("__toks"))
                  .select("k", F.posexplode("__toks").alias("__i", "w"),
                          F.col("__toks").alias("__t")))
        pos = (staged.where(F.col("__i") > 0)
               .select("k", F.element_at("__t", F.col("__i")).alias("v"),
                       "w",
                       # two-back context for the trigram level; null at
                       # the first bigram position (and when order == 2)
                       F.when(F.col("__i") > 1,
                              F.element_at("__t", F.col("__i") - 1))
                       .alias("v1")))
        joined = (pos
                  .join(F.broadcast(self.bi), ["v", "w"], "left")
                  .join(F.broadcast(self.ctx), "v", "left")
                  .join(F.broadcast(self.uni), "w", "left"))
        if self.tri is not None:
            # null v1 join keys match nothing -> those positions fall
            # back to the bigram level, which is exactly the model
            joined = (joined
                      .join(F.broadcast(self.tri), ["v1", "v", "w"],
                            "left")
                      .join(F.broadcast(self.tctx), ["v1", "v"], "left"))
        d = self.discount
        p_uni = self._p_uni(F.col("c_w"))
        p = F.when(
            F.col("c_v").isNotNull(),
            (F.greatest(F.coalesce(F.col("c_vw"), F.lit(0))
                        .cast("double") - d, F.lit(0.0))
             + d * F.col("t_v") * p_uni) / F.col("c_v")
        ).otherwise(p_uni)
        if self.tri is not None:
            p = F.when(
                F.col("c_t").isNotNull(),
                (F.greatest(F.coalesce(F.col("c_tw"), F.lit(0))
                            .cast("double") - d, F.lit(0.0))
                 + d * F.col("t_t") * p) / F.col("c_t")
            ).otherwise(p)
        scored = (joined
                  .select("k", F.log2(p).alias("__lp"))
                  .groupBy("k")
                  .agg(F.avg("__lp").alias("lm_logprob_per_token")))
        out = (df.join(scored.withColumnRenamed("k", key), key, "left")
               .withColumn("lm_perplexity",
                           F.pow(F.lit(2.0),
                                 -F.col("lm_logprob_per_token"))))
        return out


def lm_perplexity(df: DataFrame, reference: DataFrame,
                  key: str = "doc_id", text_col: str = "text",
                  min_count: int = 1, discount: float = 0.75,
                  order: int = 2) -> DataFrame:
    """One-call form: train on ``reference``, score ``df``."""
    lm = BigramLM.train(reference, text_col=text_col,
                        min_count=min_count, discount=discount,
                        order=order)
    return lm.score(df, key=key, text_col=text_col)


def ccnet_buckets(df: DataFrame, lm: BigramLM, key: str = "doc_id",
                  text_col: str = "text",
                  cuts: tuple[float, float] = (1 / 3, 2 / 3),
                  relative_error: float = 0.001) -> DataFrame:
    """CCNet's head/middle/tail split: score the corpus, take the two
    perplexity quantile cutoffs (defaults: terciles, CCNet's split),
    and label each document ``head`` (most reference-like) /
    ``middle`` / ``tail``. Unscoreable docs (< 2 tokens) get a null
    bucket.

    The quantiles come from ``approxQuantile`` — one bounded-memory
    Greenwald-Khanna sketch pass over the scored corpus (the single
    driver-side action here; the two cutoffs then enter the plan as
    literals, so the labeling itself is a map-only expression). CCNet
    computes its cutoffs the same way: corpus-relative, not absolute."""
    scored = lm.score(df, key=key, text_col=text_col)
    qs = scored.approxQuantile("lm_perplexity", list(cuts),
                               relative_error)
    if len(qs) < 2:
        # approxQuantile ignores nulls and returns [] when every doc is
        # unscoreable (<2 tokens) — all buckets null, per the contract
        return scored.withColumn("ppl_bucket",
                                 F.lit(None).cast("string"))
    lo, hi = qs
    ppl = F.col("lm_perplexity")
    return scored.withColumn(
        "ppl_bucket",
        F.when(ppl.isNull(), F.lit(None).cast("string"))
         .when(ppl <= lo, "head")
         .when(ppl <= hi, "middle")
         .otherwise("tail"))
