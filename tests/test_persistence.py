"""Index-definition save/load (RDB persistence parity,
/root/reference/src/rdb_serialization.cc)."""
import pytest

from valkey_search_spark import NumericField, SearchEngine, TagField, TextField
from valkey_search_spark.sources.persistence import load_index_def, save_index_def

SF = "/root/testdata/sf0.001"


def test_roundtrip_definition_and_results(spark, tmp_path):
    part = spark.read.parquet(f"{SF}/part.parquet")
    eng = SearchEngine(spark)
    schema = eng.ft_create(
        "parts", part,
        [TagField("p_brand", separator="|", casesensitive=True),
         NumericField("p_retailprice"),
         TextField("p_name", nostem=True, min_stem_size=5)],
        key_column="p_partkey")

    defpath = str(tmp_path / "parts.index.json")
    docpath = str(tmp_path / "parts_docs")
    save_index_def(schema, defpath, doc_path=docpath)

    loaded = load_index_def(spark, defpath)
    assert loaded.name == "parts"
    assert loaded.key_column == "p_partkey"
    tag = loaded.field("p_brand")
    assert tag.separator == "|" and tag.casesensitive
    text = loaded.field("p_name")
    assert text.nostem and text.min_stem_size == 5

    eng2 = SearchEngine(spark)
    eng2.catalog.create(loaded)
    q = "@p_brand:{Brand#13} @p_retailprice:[905 915]"
    assert (eng2.ft_search("parts", q, count_only=True)
            == eng.ft_search("parts", q, count_only=True))


def test_on_json_schema_roundtrips(spark, tmp_path):
    """JSONPath identifiers (json_source) survive save/load."""
    import json as _json

    from pyspark.sql import Row
    from valkey_search_spark import NumericField, SearchEngine, TagField
    from valkey_search_spark.sources.persistence import (
        load_index_def, save_index_def,
    )

    df = spark.createDataFrame(
        [Row(id="a", doc=_json.dumps({"cat": "x,y", "n": 3}))])
    e = SearchEngine(spark)
    schema = e.ft_create("jp", df, [TagField("$.cat", alias="cat"),
                                    NumericField("$.n", alias="n")],
                         key_column="id", on_json="doc")
    doc_path = str(tmp_path / "docs")
    df.write.parquet(doc_path)
    p = str(tmp_path / "jp.json")
    save_index_def(schema, p, doc_path=doc_path)
    loaded = load_index_def(spark, p)
    assert loaded.field("cat").json_source == "doc"
    assert loaded.field("n").name == "$.n"


def test_ann_artifact_reattached_on_load(spark, tmp_path):
    """The declaration records attr -> IVF path so a loaded index serves
    ANN queries without a rebuild (RDB-saves-the-graph analogue)."""
    import math

    from valkey_search_spark import (
        NumericField, SearchEngine, VectorField,
    )
    from valkey_search_spark.sources.persistence import (
        load_index_def, save_index_def,
    )

    qv = [round(math.sin(i + 1), 6) for i in range(64)]
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    e = SearchEngine(spark)
    e.ft_create("pidx", emb,
                [VectorField("embedding", dim=64, metric="l2", algo="hnsw"),
                 NumericField("label")], key_column="vec_id")
    e.ft_build_ann("pidx", "embedding", str(tmp_path / "ivf"), n_lists=4)
    before = [r["vec_id"] for r in e.ft_search(
        "pidx", "*=>[KNN 5 @embedding $v]", params={"v": qv},
        ann_nprobe=4, limit=(0, 5)).collect()]

    doc_path = str(tmp_path / "docs")
    p = str(tmp_path / "pidx.json")
    save_index_def(e.catalog.get("pidx"), p, doc_path=doc_path)

    e2 = SearchEngine(spark)
    e2.catalog.create(load_index_def(spark, p))
    after = [r["vec_id"] for r in e2.ft_search(
        "pidx", "*=>[KNN 5 @embedding $v]", params={"v": qv},
        ann_nprobe=4, limit=(0, 5)).collect()]
    assert after == before
    assert e2.catalog.get("pidx")._ann["embedding"].n_lists == 4


def test_with_offsets_survives_roundtrip(spark, tmp_path):
    from valkey_search_spark import SearchEngine, TextField
    from valkey_search_spark.errors import QuerySyntaxError
    from valkey_search_spark.sources.persistence import (
        load_index_def, save_index_def,
    )

    part = spark.read.parquet(f"{SF}/part.parquet")
    e = SearchEngine(spark)
    schema = e.ft_create("noffp", part,
                         [TextField("p_name", with_offsets=False)],
                         key_column="p_partkey")
    p = str(tmp_path / "noffp.json")
    save_index_def(schema, p, doc_path=str(tmp_path / "docs"))
    e2 = SearchEngine(spark)
    e2.catalog.create(load_index_def(spark, p))
    assert e2.catalog.get("noffp").field("p_name").with_offsets is False
    with pytest.raises(QuerySyntaxError, match="offsets"):
        e2.ft_search("noffp", '@p_name:"cold anvil"', count_only=True)


def test_hnsw_artifact_round_trip(spark, tmp_path):
    """Save/load re-attaches a segment-graph HNSW artifact by kind
    (the RDB-save analogue for the reference's HNSW graph,
    rdb_serialization.cc) — engine KNN results identical after load."""
    import math

    from valkey_search_spark import SearchEngine
    from valkey_search_spark.catalog import NumericField, VectorField
    from valkey_search_spark.operators.hnsw import HNSWIndex
    from valkey_search_spark.sources.persistence import (
        load_index_def, save_index_def,
    )

    qvec = [round(math.sin(i + 1), 6) for i in range(64)]
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    e = SearchEngine(spark)
    e.ft_create("hsave", emb, [
        VectorField("embedding", dim=64, metric="l2", algo="hnsw",
                    m=6, ef_construction=40),
        NumericField("label")], key_column="vec_id")
    e.ft_build_ann("hsave", "embedding", str(tmp_path / "art"),
                   algorithm="hnsw", max_segment_rows=120)
    before = [(r["vec_id"], round(r["dist"], 6)) for r in
              e.ft_search("hsave", "*=>[KNN 5 @embedding $v AS dist]",
                          params={"v": qvec}, ann_ef=10 ** 6)
              .orderBy("dist", "vec_id").collect()]

    save_index_def(e.catalog.get("hsave"), str(tmp_path / "def.json"),
                   doc_path=str(tmp_path / "docs"))
    schema = load_index_def(spark, str(tmp_path / "def.json"))
    assert isinstance(schema._ann["embedding"], HNSWIndex)
    f = schema.field("embedding")
    assert (f.algo, f.m, f.ef_construction) == ("hnsw", 6, 40)

    e2 = SearchEngine(spark)
    e2.catalog.create(schema)
    after = [(r["vec_id"], round(r["dist"], 6)) for r in
             e2.ft_search("hsave", "*=>[KNN 5 @embedding $v AS dist]",
                          params={"v": qvec}, ann_ef=10 ** 6)
             .orderBy("dist", "vec_id").collect()]
    assert before == after
