"""materialize() -> serve from the persisted index with pushdown on the
derived columns (the reference's built-index serving path at scale)."""

from pyspark.sql import functions as F

from valkey_search_spark import (
    NumericField, SearchEngine, TagField, TextField,
)

SF = "/root/testdata/sf0.001"
FIELDS = [TagField("p_brand"), NumericField("p_retailprice"),
          TextField("p_name")]


def test_materialize_roundtrip_and_pushdown(spark, tmp_path):
    part = spark.read.parquet(f"{SF}/part.parquet")
    eng = SearchEngine(spark)
    schema = eng.ft_create("parts", part, FIELDS, key_column="p_partkey")
    path = str(tmp_path / "parts_idx")
    schema.materialize(path)

    served = SearchEngine(spark)
    served.ft_create("parts", spark.read.parquet(path), FIELDS,
                     key_column="p_partkey", prederived=True)

    q = "@p_brand:{Brand#13} @p_retailprice:[905 915]"
    assert (served.ft_search("parts", q, count_only=True)
            == eng.ft_search("parts", q, count_only=True))
    # text queries read the persisted token/stem columns (no re-tokenize)
    assert (served.ft_search("parts", "widget", count_only=True)
            == eng.ft_search("parts", "widget", count_only=True))

    # derived numeric column is a real parquet column -> pushed filter
    df = served.ft_search("parts", "@p_retailprice:[905 915]",
                          limit=(0, 2_000_000_000))
    plan = df._jdf.queryExecution().executedPlan().toString()
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed and "_n_p_retailprice" in pushed[0]


def test_materialized_knn(spark, tmp_path):
    import math

    from valkey_search_spark import VectorField

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    fields = [VectorField("embedding", dim=64, metric="l2"),
              NumericField("label")]
    eng = SearchEngine(spark)
    schema = eng.ft_create("emb", emb, fields, key_column="vec_id")
    path = str(tmp_path / "emb_idx")
    schema.materialize(path)

    served = SearchEngine(spark)
    served.ft_create("emb", spark.read.parquet(path), fields,
                     key_column="vec_id", prederived=True)
    qv = [round(math.sin(i + 1), 6) for i in range(64)]
    a = [r["vec_id"] for r in eng.ft_search(
        "emb", "*=>[KNN 5 @embedding $v]", params={"v": qv}, limit=(0, 5)).collect()]
    b = [r["vec_id"] for r in served.ft_search(
        "emb", "*=>[KNN 5 @embedding $v]", params={"v": qv}, limit=(0, 5)).collect()]
    assert a == b


def test_materialized_wide_index_serves_fieldmask(spark, tmp_path):
    """materialize() persists the union field-mask columns, so the
    prederived wide index serves fieldless single-token queries from ONE
    parquet column — the 100 TB path for the field-explosion shape. The
    scan's ReadSchema must include __fm_* and not the 50 per-field
    arrays."""
    from valkey_search_spark.catalog import MASK_STEM_COL, MASK_TOK_COL

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    toks = F.split(F.col("text"), " ")
    wide = docs.select(
        "doc_id",
        *[F.array_join(F.slice(toks, i + 1, 5), " ").alias(f"field{i}")
          for i in range(10)])
    fields = [TextField(f"field{i}") for i in range(10)]
    eng = SearchEngine(spark)
    schema = eng.ft_create("w", wide, fields, key_column="doc_id")
    path = str(tmp_path / "wide_idx")
    schema.materialize(path)

    stored = spark.read.parquet(path)
    assert MASK_TOK_COL in stored.columns and MASK_STEM_COL in stored.columns

    served = SearchEngine(spark)
    served.ft_create("w", stored, fields, key_column="doc_id",
                     prederived=True)
    want = eng.ft_search("w", "merge", count_only=True)
    assert served.ft_search("w", "merge", count_only=True) == want > 0
    df = served.ft_search("w", "merge", limit=(0, 5), nocontent=True)
    plan = df._jdf.queryExecution().executedPlan().toString()
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read and "__fm_stem" in read[0]
    assert "_x_field7" not in read[0] and "_s_field7" not in read[0]
