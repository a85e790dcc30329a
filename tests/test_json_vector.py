"""JSON vector-format decode parity
(docs/topics/search-data-formats.md "JSON Vector Format" examples)."""

import pytest
from pyspark.sql import Row

from valkey_search_spark import NumericField, SearchEngine, VectorField
from valkey_search_spark.sources.tables import json_vector_field


@pytest.mark.parametrize("raw,expected", [
    ("[0.1, 0.2, 0.3]", [0.1, 0.2, 0.3]),          # valid
    ("[ 0.1, ,0.2,0.3,]", [0.1, 0.2, 0.3]),        # extra commas/spaces ok
    ("[0.1, 0.2, a]", None),                       # non-numeric -> rejected
    ("[]", None),                                  # empty -> untracked
])
def test_documented_examples(spark, raw, expected):
    df = spark.createDataFrame([Row(id=1, v=raw)])
    out = json_vector_field(df, "v", "vec").first()["vec"]
    if expected is None:
        assert out is None
    else:
        assert [round(x, 6) for x in out] == expected


def test_knn_over_json_vectors(spark):
    rows = [Row(id=i, v="[" + ",".join(str(float(j == i)) for j in range(4)) + "]",
                label=i) for i in range(4)]
    rows.append(Row(id=9, v="[bad]", label=9))      # rejected -> untracked
    df = json_vector_field(spark.createDataFrame(rows), "v", "vec")
    e = SearchEngine(spark)
    e.ft_create("j", df, [VectorField("vec", dim=4, metric="l2"),
                          NumericField("label")], key_column="id")
    out = e.ft_search("j", "*=>[KNN 2 @vec $q]",
                      params={"q": [1.0, 0.0, 0.0, 0.0]}, limit=(0, 2)).collect()
    assert [r["id"] for r in out] == [0, 1] or out[0]["id"] == 0
    assert e.ft_search("j", "*", count_only=True) == 5  # untracked still a doc
