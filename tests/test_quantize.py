"""int8 vector quantization: reconstruction error bounds + KNN agreement."""

import math

from pyspark.sql import functions as F

from valkey_search_spark.functions.quantize import (
    dequantize_vectors, quantize_vectors,
)

SF = "/root/testdata/sf0.001"
QVEC = [round(math.sin(i + 1), 6) for i in range(64)]


def test_roundtrip_error_bounded(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    rt = dequantize_vectors(quantize_vectors(emb, "embedding"), "qvec", "deq")
    err = rt.select(F.max(F.aggregate(
        F.zip_with(F.col("embedding"), F.col("deq"),
                   lambda a, b: F.abs(a.cast("double") - b)),
        F.lit(0.0), lambda acc, x: F.greatest(acc, x))).alias("e")).first()["e"]
    mx = emb.select(F.max(F.aggregate(
        F.col("embedding"), F.lit(0.0),
        lambda a, x: F.greatest(a, F.abs(x.cast("double")))))).first()[0]
    # per-element error <= scale/2 = max|v|/254
    assert err <= mx / 254 + 1e-9


def test_knn_over_quantized_matches_full_precision(spark):
    from valkey_search_spark import SearchEngine, VectorField

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    deq = dequantize_vectors(quantize_vectors(emb, "embedding"),
                             "qvec", "emb_q")
    e = SearchEngine(spark)
    e.ft_create("full", emb, [VectorField("embedding", dim=64)],
                key_column="vec_id")
    e.ft_create("quant", deq, [VectorField("emb_q", dim=64)],
                key_column="vec_id")
    a = [r["vec_id"] for r in e.ft_search(
        "full", "*=>[KNN 10 @embedding $v]", params={"v": QVEC},
        limit=(0, 10)).collect()]
    b = [r["vec_id"] for r in e.ft_search(
        "quant", "*=>[KNN 10 @emb_q $v]", params={"v": QVEC},
        limit=(0, 10)).collect()]
    assert len(set(a) & set(b)) >= 9        # ~identical top-10
