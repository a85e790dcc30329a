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


# ---------------------------------------------------------------------------
# Artifact format stamps (r10): persisted index artifacts carry a
# versioned "format" tag (the reference versions its RDB chunks the same
# way, src/rdb_serialization.cc). Loads must accept the PRE-stamp layout
# (checked-in miniature fixtures under tests/data/artifacts_v1, written
# by the r9-era writer shape: identical files, no format key) and fail
# a foreign tag with a versioned error — never deserialize garbage.

import json as _json
import os
import shutil as _shutil

from pyspark.sql import functions as F

_V1 = os.path.join(os.path.dirname(__file__), "data", "artifacts_v1")


def test_legacy_artifacts_load_and_search(spark):
    from valkey_search_spark.operators.ann import IVFIndex
    from valkey_search_spark.operators.hnsw import HNSWIndex

    ivf = IVFIndex.load(spark, os.path.join(_V1, "ivf"))
    assert _json.load(open(os.path.join(
        _V1, "ivf", "_ivf_meta.json"))).get("format") is None
    out = ivf.search([0.0] * 4, k=3, nprobe=ivf.n_lists).collect()
    assert len(out) == 3
    hnsw = HNSWIndex.load(spark, os.path.join(_V1, "hnsw"))
    rows = hnsw.search([0.0] * 4, k=3, ef=16).collect()
    assert len(rows) == 3


def test_foreign_format_tag_fails_versioned(spark, tmp_path):
    from valkey_search_spark.artifact import ArtifactFormatError
    from valkey_search_spark.operators.ann import IVFIndex
    from valkey_search_spark.operators.hnsw import HNSWIndex

    for kind, metaname, loader in (
            ("ivf", "_ivf_meta.json", IVFIndex.load),
            ("hnsw", "_hnsw_meta.json", HNSWIndex.load)):
        dst = str(tmp_path / kind)
        _shutil.copytree(os.path.join(_V1, kind), dst)
        mp = os.path.join(dst, metaname)
        m = _json.load(open(mp))
        m["format"] = f"{kind}-index-v9"
        _json.dump(m, open(mp, "w"))
        with pytest.raises(ArtifactFormatError, match="v9"):
            loader(spark, dst)


def test_current_writer_stamps_and_reloads(spark, tmp_path):
    from valkey_search_spark.operators.ann import IVFIndex

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet").limit(16).select(
        F.col("vec_id").alias("cid"), F.slice("embedding", 1, 4)
        .alias("embedding"))
    path = str(tmp_path / "ivf_new")
    IVFIndex.build(emb, path=path, vec_col="embedding", metric="l2",
                   n_lists=2)
    m = _json.load(open(os.path.join(path, "_ivf_meta.json")))
    assert m["format"] == "ivf-index-v1"
    assert IVFIndex.load(spark, path).n_lists == 2
