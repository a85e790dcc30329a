"""chunk_documents: DuckDB oracle parity, edge semantics, plan shape."""
from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from tests.conftest import SF_DIR, load
from valkey_search_spark.operators.chunking import (
    chunk_documents, chunk_to_char_spans,
)


def _oracle(chunk_tokens: int, stride: int, overlap: int = 0):
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/documents.parquet')")
    return con.sql(f"""
        WITH t AS (
          SELECT doc_id,
                 regexp_split_to_array(trim(text), '\\s+') AS toks
          FROM documents
        ), s AS (
          SELECT doc_id, toks,
                 unnest(generate_series(
                     0, greatest(len(toks) - 1 - {overlap}, 0),
                     {stride})) AS start
          FROM t
        )
        SELECT doc_id,
               CAST(start / {stride} AS INT) AS chunk_idx,
               CAST(start AS INT)            AS token_start,
               len(toks[start + 1 : start + {chunk_tokens}])
                                             AS chunk_tokens_n,
               array_to_string(
                 toks[start + 1 : start + {chunk_tokens}], ' ')
                                             AS chunk_text
        FROM s
        ORDER BY doc_id, chunk_idx
    """).fetchall()


@pytest.mark.parametrize("chunk_tokens,overlap", [(32, 0), (32, 8), (7, 3)])
def test_matches_duckdb_oracle(spark, sf_dir, chunk_tokens, overlap):
    docs = load(spark, sf_dir, "documents")
    got = (chunk_documents(docs, chunk_tokens=chunk_tokens, overlap=overlap)
           .select("doc_id", "chunk_idx", "token_start", "chunk_tokens_n",
                   "chunk_text")
           .orderBy("doc_id", "chunk_idx").collect())
    want = _oracle(chunk_tokens, chunk_tokens - overlap, overlap)
    assert [tuple(r) for r in got] == want


def test_overlap_and_coverage(spark):
    text = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = chunk_documents(df, chunk_tokens=4, overlap=1) \
        .orderBy("chunk_idx").collect()
    # stride 3, bound n-overlap-1 = 8 -> starts 0,3,6 (a start at 9
    # would re-emit only w9, already covered by the chunk at 6)
    assert [r["token_start"] for r in rows] == [0, 3, 6]
    assert rows[0]["chunk_text"] == "w0 w1 w2 w3"
    assert rows[1]["chunk_text"] == "w3 w4 w5 w6"     # shares w3
    assert rows[-1]["chunk_text"] == "w6 w7 w8 w9"    # tail covered
    assert [r["chunk_tokens_n"] for r in rows] == [4, 4, 4]
    # every token covered, and every chunk contributes NEW tokens
    covered: set[int] = set()
    for r in rows:
        span = set(range(r["token_start"],
                         r["token_start"] + r["chunk_tokens_n"]))
        assert span - covered, "fully-redundant chunk emitted"
        covered |= span
    assert covered == set(range(10))


def test_empty_and_whitespace_doc(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "one")], "doc_id long, text string")
    rows = {r["doc_id"]: r for r in chunk_documents(df, chunk_tokens=4)
            .collect()}
    assert len(rows) == 3                      # one chunk each
    assert rows[1]["chunk_text"] == ""         # split('') == ['']
    assert rows[2]["chunk_text"] == ""
    assert rows[3]["chunk_text"] == "one"


def test_char_offsets(spark):
    df = spark.createDataFrame(
        [(1, "aa bbb  c   dddd e")], "doc_id long, text string")
    rows = chunk_to_char_spans(
        chunk_documents(df, chunk_tokens=2, overlap=0,
                        with_char_offsets=True)).orderBy("chunk_idx") \
        .collect()
    # normalized text: "aa bbb c dddd e"
    norm = "aa bbb c dddd e"
    for r in rows:
        assert norm[r["char_start"]:r["char_end"]] == r["chunk_text"]
    assert [r["char_start"] for r in rows] == [0, 7, 14]


def test_validation(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=0)
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=4, overlap=4)


def test_plan_is_map_only_single_split(spark, sf_dir):
    """chunk_documents is map-only: no DATA shuffle, and no exchange
    beyond the optional input-spread round-robin (r12: an
    under-partitioned 1-file scan repartitions once so the split/posexplode
    chain doesn't run on a single task; a well-partitioned 100 TB input
    gets none — chunking itself introduces no shuffle either way)."""
    docs = load(spark, sf_dir, "documents")
    out = chunk_documents(docs, chunk_tokens=64, overlap=16)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1
    if "Exchange" in plan:
        assert "ROUND_ROBIN" in plan or "RoundRobin" in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the split() runs once per document, not once per window/column ref
    assert plan.count("split(") <= 2         # staged column + alias echo
