"""Field-explosion workload shape from the reference CI benchmarks
(fts-benchmarks-arm.json "field_explosion_50k": 50 TEXT fields per doc,
fieldless term search hits every field — the field-mask behavior)."""

import time

import pytest
from pyspark.sql import functions as F

from valkey_search_spark import SearchEngine, TextField
from valkey_search_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"
N_FIELDS = 50


@pytest.fixture(scope="module")
def wide_eng(spark):
    docs = load_table(spark, SF, "documents")
    toks = F.split(F.col("text"), " ")
    # field i = a deterministic word slice of the doc text; field0 carries
    # a sentinel word for a known subset
    cols = {f"field{i}": F.array_join(F.slice(toks, i + 1, 5), " ")
            for i in range(N_FIELDS)}
    cols["field0"] = F.when(F.col("doc_id") % 10 == 0,
                            F.concat(F.lit("sentineltoken "), cols["field0"])
                            ).otherwise(cols["field0"])
    wide = docs.select("doc_id", *[c.alias(n) for n, c in cols.items()])
    e = SearchEngine(spark)
    e.ft_create("wide", wide, [TextField(f"field{i}") for i in range(N_FIELDS)],
                key_column="doc_id")
    return e


def test_fieldless_search_spans_all_fields(wide_eng):
    # sentinel lives only in field0; fieldless search must still find it
    n = wide_eng.ft_search("wide", "sentineltoken", count_only=True)
    assert n == 50  # doc_id % 10 == 0 of 500 docs


def test_per_field_search(wide_eng):
    assert wide_eng.ft_search("wide", "@field0:sentineltoken",
                              count_only=True) == 50
    assert wide_eng.ft_search("wide", "@field7:sentineltoken",
                              count_only=True) == 0


def test_wide_fieldless_latency_sane(wide_eng):
    wide_eng.ft_search("wide", "sentineltoken", count_only=True)  # warm
    t0 = time.perf_counter()
    wide_eng.ft_search("wide", "sentineltoken", count_only=True)
    assert time.perf_counter() - t0 < 30  # 50-field OR stays tractable