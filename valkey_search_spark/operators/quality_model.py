"""Model-based document quality filtering (the GPT-3/CCNet recipe).

The published pipeline (GPT-3 paper, Appendix A; repeated by The Pile and
CCNet): train a LINEAR classifier to distinguish a known-high-quality
reference corpus (positive) from the raw crawl pool (negative), score
every pool document, then keep documents stochastically with the Pareto
acceptance rule ``pareto(alpha=9) > 1 - score`` so the filter keeps a
long tail of lower-scoring documents instead of a hard threshold.

Spark shape:

- TRAIN: tokens -> HashingTF (fixed feature hashing, no vocabulary
  build/broadcast — the fastText trick) -> LogisticRegression. The
  labeled frames are pipeline-sized (a sample of the pool), not corpus-
  sized; training cost is independent of the 100 TB pool.
- SCORE: ``model.transform`` — JVM ML transformers end-to-end, map-only,
  no shuffle and no Python in the scoring scan.
- FILTER: the Pareto draw is derandomized the same way as the sampling
  family: u = hash(key, seed) -> inverse-CDF transform
  ``(1-u)^(-1/alpha) - 1`` — a pure Column expression, reproducible
  under retries, matching the published acceptance semantics in
  distribution.

Tokens come from either a raw text column (whitespace split — the
classifier is robust to tokenizer choice) or a pre-analyzed token array
column (e.g. the engine's staged ``__toks``), so pipelines that already
tokenized don't pay twice.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


class QualityClassifier:
    """Linear quality model over hashed token features."""

    def __init__(self, model, num_features: int, binary: bool):
        self._model = model                       # PipelineModel
        self.num_features = num_features
        self.binary = binary

    # ------------------------------------------------------------------
    @staticmethod
    def _tokens(df: DataFrame, text_col: str | None,
                tokens_col: str | None) -> DataFrame:
        if (text_col is None) == (tokens_col is None):
            raise ValueError("pass exactly one of text_col or tokens_col")
        # null-safe: HashingTF NPEs on a null token array, and one
        # null-text row must not kill a 100 TB scoring job — nulls
        # featurize as empty and surface as a NULL score (see score())
        if tokens_col is not None:
            toks = F.coalesce(F.col(tokens_col),
                              F.array().cast("array<string>"))
            src_null = F.col(tokens_col).isNull()
        else:
            toks = F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                           r"\s+")
            src_null = F.col(text_col).isNull()
        return (df.withColumn("__qc_toks", toks)
                  .withColumn("__qc_srcnull", src_null))

    @classmethod
    def train(cls, positive: DataFrame, negative: DataFrame,
              text_col: str | None = "text", tokens_col: str | None = None,
              num_features: int = 1 << 18, binary: bool = True,
              max_iter: int = 50, reg_param: float = 1e-4,
              bigrams: bool = False) -> "QualityClassifier":
        """Fit on reference-vs-pool labels. ``binary=True`` counts each
        token once per document (presence features — less length-biased
        than counts); ``bigrams=True`` adds hashed word-bigram features
        (the fastText configuration)."""
        from pyspark.ml import Pipeline
        from pyspark.ml.classification import LogisticRegression
        from pyspark.ml.feature import HashingTF, NGram

        pos = cls._tokens(positive, text_col, tokens_col) \
            .select(F.col("__qc_toks"), F.lit(1.0).alias("__qc_label"))
        neg = cls._tokens(negative, text_col, tokens_col) \
            .select(F.col("__qc_toks"), F.lit(0.0).alias("__qc_label"))
        data = pos.unionByName(neg)

        stages = []
        feat_cols = []
        tf1 = HashingTF(inputCol="__qc_toks", outputCol="__qc_f1",
                        numFeatures=num_features, binary=binary)
        stages.append(tf1)
        feat_cols.append("__qc_f1")
        if bigrams:
            stages.append(NGram(n=2, inputCol="__qc_toks",
                                outputCol="__qc_bi"))
            stages.append(HashingTF(inputCol="__qc_bi",
                                    outputCol="__qc_f2",
                                    numFeatures=num_features, binary=binary))
            feat_cols.append("__qc_f2")
        if len(feat_cols) > 1:
            from pyspark.ml.feature import VectorAssembler

            stages.append(VectorAssembler(inputCols=feat_cols,
                                          outputCol="__qc_feat"))
            fcol = "__qc_feat"
        else:
            fcol = feat_cols[0]
        stages.append(LogisticRegression(
            featuresCol=fcol, labelCol="__qc_label",
            probabilityCol="__qc_prob", rawPredictionCol="__qc_raw",
            predictionCol="__qc_pred",
            maxIter=max_iter, regParam=reg_param, standardization=False))
        model = Pipeline(stages=stages).fit(data)
        # shed the LR trainingSummary: it holds the live SparkSession, so
        # the scoring UDF's task closure would serialize the session (and
        # its non-serializable ObservationManager — breaks in sessions
        # that ever ran an Observation query, e.g. the engine's one-pass
        # totals). A disk round-trip is the public-API way to drop it;
        # the model is KB-sized, so this is one cheap local write.
        import shutil
        import tempfile

        from pyspark.ml import PipelineModel

        tmp = tempfile.mkdtemp(prefix="qc_fit_")
        try:
            # file:// pins the round-trip to the driver's local disk —
            # a scheme-less path resolves against fs.defaultFS, which on
            # a real cluster is HDFS/S3 (wrong permissions, leaked dirs)
            model.write().overwrite().save(f"file://{tmp}")
            model = PipelineModel.load(f"file://{tmp}")
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        return cls(model, num_features, binary)

    # ------------------------------------------------------------------
    def score(self, df: DataFrame, text_col: str | None = "text",
              tokens_col: str | None = None,
              out_col: str = "quality_score") -> DataFrame:
        """``df`` + ``out_col`` = P(document is reference-like) in [0, 1];
        NULL for rows whose source text/tokens are null (downstream gates
        coalesce null to fail, the pipeline convention). Map-only: every
        stage is a JVM ML transformer."""
        from pyspark.ml.functions import vector_to_array

        toks = self._tokens(df, text_col, tokens_col)
        scored = self._model.transform(toks)
        drop = [c for c in scored.columns if c.startswith("__qc_")]
        return (scored
                .withColumn(out_col,
                            F.when(F.col("__qc_srcnull"), F.lit(None))
                            .otherwise(
                                vector_to_array(F.col("__qc_prob"))[1]))
                .drop(*drop))

    # ------------------------------------------------------------------
    def save(self, path: str) -> None:
        import json
        import os

        self._model.write().overwrite().save(os.path.join(path, "model"))
        with open(os.path.join(path, "_qc_meta.json"), "w") as fh:
            json.dump({"format": "quality-model-v1",
                       "num_features": self.num_features,
                       "binary": self.binary}, fh)

    @classmethod
    def load(cls, spark, path: str) -> "QualityClassifier":
        import json
        import os

        from pyspark.ml import PipelineModel

        with open(os.path.join(path, "_qc_meta.json")) as fh:
            meta = json.load(fh)
        from ..artifact import check_format

        check_format(meta, "quality-model-v1", path)
        model = PipelineModel.load(os.path.join(path, "model"))
        return cls(model, meta["num_features"], meta["binary"])


def pareto_keep(key_col: Column | str, score_col: Column | str,
                alpha: float = 9.0, seed: int = 0) -> Column:
    """The GPT-3 acceptance rule as a deterministic Column:
    keep iff ``pareto(alpha) > 1 - score``, with the Pareto draw
    derandomized via inverse CDF over a (key, seed) hash uniform —
    ``u -> (1-u)^(-1/alpha) - 1``. High scores always pass
    (1 - score <= 0); low scores survive with probability
    ``(2 - score)^(-alpha)``, preserving the published long-tail
    retention in distribution while staying reproducible under
    retries."""
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    score = F.col(score_col) if isinstance(score_col, str) else score_col
    u = (F.pmod(F.xxhash64(key.cast("string"), F.lit(seed)),
                F.lit(1 << 30)).cast("double") + 0.5) / float(1 << 30)
    draw = F.pow(1.0 - u, F.lit(-1.0 / alpha)) - 1.0
    return draw > (F.lit(1.0) - score)


def quality_filter(df: DataFrame, clf: QualityClassifier, key: str,
                   text_col: str | None = "text",
                   tokens_col: str | None = None,
                   alpha: float = 9.0, seed: int = 0,
                   score_col: str = "quality_score") -> DataFrame:
    """Score + Pareto-accept in one map-only pass: the GPT-3 filter as a
    single lazy transformation over the pool."""
    scored = clf.score(df, text_col=text_col, tokens_col=tokens_col,
                       out_col=score_col)
    return scored.where(pareto_keep(key, score_col, alpha=alpha, seed=seed))
