"""Connected components over dup-pair graphs vs a pure-Python union-find."""

import pytest
from pyspark.sql import Row, functions as F

from valkey_search_spark.operators.dedup import (
    canonicalize_near_dups, connected_components,
)

SF = "/root/testdata/sf0.001"


def _union_find(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # canonical = min member of each component
    comp_min = {}
    for n in nodes:
        r = find(n)
        comp_min.setdefault(r, n if n < r else r)
        comp_min[r] = min(comp_min[r], n)
    return {n: comp_min[find(n)] for n in nodes}


@pytest.mark.parametrize("edges", [
    [(1, 2), (2, 3), (3, 4), (10, 11)],              # chain + pair
    [(1, 2), (3, 4), (4, 1), (5, 6), (6, 7), (7, 5)],  # merge + cycle
    [(2, 9), (9, 4), (4, 2), (100, 50)],             # cycle, reversed ids
])
def test_components_match_union_find(spark, edges):
    nodes = sorted({n for e in edges for n in e})
    want = _union_find(edges, nodes)
    pairs = spark.createDataFrame([Row(a=u, b=v) for u, v in edges])
    got = {r["node"]: r["component"]
           for r in connected_components(pairs).collect()}
    assert got == want


def test_components_long_chain_converges(spark):
    # a 12-node chain needs several label-propagation rounds
    edges = [(i, i + 1) for i in range(12)]
    pairs = spark.createDataFrame([Row(a=u, b=v) for u, v in edges])
    got = {r["node"]: r["component"]
           for r in connected_components(pairs, max_iter=15).collect()}
    assert set(got.values()) == {0}


def test_components_max_iter_raises(spark):
    edges = [(i, i + 1) for i in range(12)]
    pairs = spark.createDataFrame([Row(a=u, b=v) for u, v in edges])
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(pairs, max_iter=2)


def test_canonicalize_real_near_dups(spark):
    from valkey_search_spark.operators import dedup as dd

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    pairs = dd.minhash_lsh_pairs(docs, "doc_id", threshold=0.8)
    out = canonicalize_near_dups(docs, pairs, "doc_id")
    dd.release(pairs)
    n = docs.count()
    assert out.count() == n                       # no rows lost
    rows = out.select("doc_id", "canonical_id", "is_canonical").collect()
    by_id = {r["doc_id"]: r for r in rows}
    # canonical ids are members of the table, minimal in their component
    for r in rows:
        assert r["canonical_id"] <= r["doc_id"]
        assert r["is_canonical"] == (r["canonical_id"] == r["doc_id"])
        assert by_id[r["canonical_id"]]["is_canonical"]
    # planted near-dups exist in this corpus: some component has size > 1
    assert out.where(~F.col("is_canonical")).count() > 0
