"""corpus_profile: DuckDB-oracle-pinned counts, one-shuffle plan pin."""
from __future__ import annotations

import duckdb
import pytest

from tests.conftest import SF_DIR, load
from valkey_search_spark.operators.profile import corpus_profile


@pytest.fixture(scope="module")
def prof(spark, sf_dir):
    rows = corpus_profile(load(spark, sf_dir, "documents")).collect()
    return {(r["dimension"], r["bucket"]): r for r in rows}


def _oracle(sql):
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/documents.parquet')")
    return con.sql(sql).fetchall()


def test_total_row(prof):
    (docs, chars, toks), = _oracle(
        "SELECT count(*), sum(length(text)),"
        " sum(length(regexp_split_to_array(text, '\\s+')))"
        " FROM documents")
    r = prof[("total", "all")]
    assert (r["docs"], r["chars"], r["tokens"]) == (docs, chars, toks)


def test_source_rows_match_oracle(prof):
    rows = _oracle("SELECT source, count(*), sum(length(text))"
                   " FROM documents GROUP BY source")
    assert rows, "oracle returned no sources"
    for src, docs, chars in rows:
        r = prof[("source", src)]
        assert (r["docs"], r["chars"]) == (docs, chars)


def test_lang_rows_match_oracle(prof):
    rows = _oracle("SELECT lang, count(*) FROM documents GROUP BY lang")
    for lang, docs in rows:
        assert prof[("lang", lang)]["docs"] == docs


def test_len_histogram_matches_oracle(prof):
    rows = _oracle(
        "SELECT cast(floor(log2(length(text))) AS int), count(*)"
        " FROM documents WHERE length(text) > 0 GROUP BY 1")
    for b, docs in rows:
        assert prof[("len_log2", str(b))]["docs"] == docs


def test_partitions_sum_to_total(prof):
    total = prof[("total", "all")]["docs"]
    for dim in ("source", "lang", "len_log2"):
        assert sum(r["docs"] for (d, _), r in prof.items()
                   if d == dim) == total


def test_quantiles_ordered(prof):
    r = prof[("total", "all")]
    assert r["tok_p50"] <= r["tok_p90"] <= r["tok_p99"]


def test_single_shuffle_plan(spark, sf_dir):
    plan = (corpus_profile(load(spark, sf_dir, "documents"))
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange") == 1, plan
    assert "Expand" in plan
    assert "EvalPython" not in plan


def test_empty_and_null_text(spark):
    df = spark.createDataFrame(
        [(1, "", "a", "en"), (2, None, "a", "de"), (3, "x y", "b", "en")],
        "doc_id int, text string, source string, lang string")
    rows = {(r["dimension"], r["bucket"]): r
            for r in corpus_profile(df).collect()}
    t = rows[("total", "all")]
    assert t["docs"] == 3
    assert t["tokens"] == 2          # only doc 3 contributes tokens
    assert rows[("source", "a")]["docs"] == 2


def test_optional_dims_off(spark):
    df = spark.createDataFrame([(1, "x y z")], "doc_id int, text string")
    rows = corpus_profile(df, source_col=None, lang_col=None).collect()
    dims = {r["dimension"] for r in rows}
    assert dims == {"total", "len_log2"}


def test_padded_whitespace_not_counted_as_tokens(spark):
    df = spark.createDataFrame([(1, " a b", "s", "en")],
                               "doc_id int, text string, source string,"
                               " lang string")
    rows = {(r["dimension"], r["bucket"]): r
            for r in corpus_profile(df).collect()}
    assert rows[("total", "all")]["tokens"] == 2
