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

def test_fieldless_composite_token_spans_fields(spark):
    """Reference semantics (filter_parser.cc ParseTextTokens, unquoted
    stops after first token): 'hello.world' is TWO term predicates each
    carrying the full field mask, ANDed — the tokens may match in
    DIFFERENT fields."""
    from pyspark.sql import Row

    df = spark.createDataFrame([
        Row(id=1, a="hello there", b="wide world"),   # split across fields
        Row(id=2, a="hello world", b="other stuff"),  # both in one field
        Row(id=3, a="hello only", b="no match"),      # world missing
    ])
    e = SearchEngine(spark)
    e.ft_create("xf", df, [TextField("a"), TextField("b")], key_column="id")
    got = sorted(r["id"] for r in
                 e.ft_search("xf", "hello.world", limit=(0, 10)).collect())
    assert got == [1, 2]


def test_fieldmask_columns_only_on_wide_uniform_schemas(spark):
    from pyspark.sql import Row
    from valkey_search_spark.catalog import MASK_STEM_COL, MASK_TOK_COL

    df = spark.createDataFrame([Row(id=1, a="x", b="y")])
    e = SearchEngine(spark)
    e.ft_create("narrow", df, [TextField("a"), TextField("b")],
                key_column="id")
    cols = e.catalog.get("narrow").indexed_df().columns
    assert MASK_TOK_COL not in cols           # below the width threshold

    wide_fields = [TextField(f"f{i}") for i in range(8)]
    wdf = spark.createDataFrame(
        [Row(id=1, **{f"f{i}": f"word{i}" for i in range(8)})])
    e.ft_create("wide8", wdf, wide_fields, key_column="id")
    s = e.catalog.get("wide8")
    cols = s.indexed_df().columns
    assert MASK_TOK_COL in cols and MASK_STEM_COL in cols
    # mixed config disables the union (it would change semantics)
    mixed = [TextField(f"f{i}") for i in range(7)] + [
        TextField("f7", nostem=True)]
    e.ft_create("mixed8", wdf, mixed, key_column="id")
    assert e.catalog.get("mixed8").fieldmask_fields() is None


def test_fieldless_search_uses_mask_column(spark, wide_eng):
    """The wide index serves fieldless single-token predicates from the
    union column: on a CACHED index the executed plan reads __fm_*, not
    the 50 per-field arrays — at 100 TB that is 1 column of IO instead
    of 50. (On a lazy index the same structure holds after projection
    collapse: the filter computes ONE concatenated tokenization.)"""
    cached = SearchEngine(spark)
    cached.catalog = wide_eng.catalog          # reuse the built wide schema
    wide_df = wide_eng.catalog.get("wide").doc_df
    cached.ft_create("widec", wide_df,
                     [TextField(f"field{i}") for i in range(N_FIELDS)],
                     key_column="doc_id", cache=True)
    plan = (cached.ft_search("widec", "sentineltoken", limit=(0, 5))
            ._jdf.queryExecution().executedPlan().toString())
    assert "__fm_" in plan
    assert "_x_field37" not in plan and "_s_field37" not in plan
    # and the mask path agrees with the per-field scoped query on counts
    assert wide_eng.ft_search("wide", "sentineltoken", count_only=True) \
        == wide_eng.ft_search("wide", "@field0:sentineltoken",
                              count_only=True) == 50
    # prefix / suffix / infix / fuzzy all route through the mask too
    n_pre = wide_eng.ft_search("wide", "sentinel*", count_only=True)
    n_suf = wide_eng.ft_search("wide", "*token", count_only=True)
    n_fuz = wide_eng.ft_search("wide", "%sentineltokex%", count_only=True)
    assert n_pre == n_suf == n_fuz == 50
