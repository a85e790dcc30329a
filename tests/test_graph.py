"""Link-graph analytics: href extraction/resolution pinned against
urllib.parse.urljoin on the supported shapes, PageRank pinned against a
numpy power-iteration reference (same dangling correction), domain
graph + degree stats, lineage-cut plan behavior."""
from __future__ import annotations

from urllib.parse import urljoin

import numpy as np
import pytest

from pyspark.sql import functions as F

from valkey_search_spark.operators.graph import (
    degree_stats, domain_link_graph, extract_links, pagerank,
)
from valkey_search_spark.operators.urlops import resolve_href


# ---------------------------------------------------------------------------
BASE = "https://www.example.com/a/b/page.html?x=1"

HREF_CASES = [
    "https://other.org/abs",            # absolute
    "//cdn.example.net/lib.js",         # protocol-relative
    "/rooted/path?q=2",                 # root-relative
    "sibling.html",                     # path-relative
    "./dotted.html",                    # explicit ./
    "?q=3",                             # query-only
]


def test_resolve_href_matches_urljoin_on_supported_shapes(spark):
    df = spark.createDataFrame([(BASE, h) for h in HREF_CASES],
                               "base string, href string")
    got = [r["out"] for r in df.select(
        resolve_href(F.col("base"), F.col("href")).alias("out")).collect()]
    want = [urljoin(BASE, h) for h in HREF_CASES]
    assert got == want


def test_resolve_href_non_navigational_null(spark):
    bad = ["#frag", "javascript:void(0)", "mailto:x@y.z", "tel:+1555",
           "data:text/plain,hi", ""]
    df = spark.createDataFrame([(BASE, h) for h in bad],
                               "base string, href string")
    got = [r["out"] for r in df.select(
        resolve_href(F.col("base"), F.col("href")).alias("out")).collect()]
    assert got == [None] * len(bad)
    # unparseable base -> null too
    df2 = spark.createDataFrame([("not a url", "/x")],
                                "base string, href string")
    assert df2.select(resolve_href(F.col("base"), F.col("href"))
                      .alias("o")).first()["o"] is None


def test_extract_links_from_html(spark):
    html = ('<html><body>'
            '<a href="https://other.org/x">x</a>'
            "<a href='/local'>l</a>"
            '<a href=bare.html>b</a>'
            '<a href="#top">skip</a>'
            '<a href="https://amp.ed/?a=1&amp;b=2">ent</a>'
            '<script>var a = \'<a href="https://fake.org/">\';</script>'
            '</body></html>')
    df = spark.createDataFrame([("https://ex.com/dir/p.html", html)],
                               "url string, html string")
    got = sorted(r["link"] for r in extract_links(df).collect())
    assert got == sorted([
        "https://other.org/x",
        "https://ex.com/local",
        "https://ex.com/dir/bare.html",
        "https://amp.ed/?a=1&b=2",
    ])


def test_domain_link_graph(spark):
    links = spark.createDataFrame([
        ("https://a.example.com/1", "https://b.org/x"),
        ("https://www.a.example.com/2", "https://b.org/y"),
        ("https://a.example.com/3", "https://cdn.a.example.com/z"),  # intra
        ("https://a.example.com/4", "https://c.co.uk/p"),
    ], "url string, link string")
    got = {(r["src"], r["dst"]): r["n_links"]
           for r in domain_link_graph(links).collect()}
    assert got == {("example.com", "b.org"): 2,
                   ("example.com", "c.co.uk"): 1}


# ---------------------------------------------------------------------------
def _scalar_pagerank(edges, damping, n_iter, weights=None):
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    w = np.zeros((n, n))
    for k, (s, d) in enumerate(edges):
        w[idx[s], idx[d]] += weights[k] if weights else 1.0
    outw = w.sum(axis=1)
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        dang = r[outw == 0].sum()
        contrib = np.zeros(n)
        for i in range(n):
            if outw[i] > 0:
                contrib += r[i] * w[i] / outw[i]
        r = (1 - damping) / n + damping * (contrib + dang / n)
    return {nodes[i]: r[i] for i in range(n)}


def test_pagerank_matches_scalar_reference(spark):
    rng = np.random.RandomState(3)
    nodes = [f"n{i}" for i in range(30)]
    edges = [(nodes[rng.randint(30)], nodes[rng.randint(30)])
             for _ in range(120)]
    edges = [(s, d) for s, d in edges if s != d]
    # guarantee a dangler: n29 appears only as a destination
    edges = [(s, d) for s, d in edges if s != "n29"] + [("n0", "n29")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["rank"] for r in
           pagerank(df, n_iter=15).collect()}
    want = _scalar_pagerank(edges, 0.85, 15)
    assert len(got) == len(want)
    for node, rk in want.items():
        assert got[node] == pytest.approx(rk, abs=1e-12), node
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_weighted_and_star(spark):
    # weighted: all of a's mass flows 9:1 between b and c
    e = spark.createDataFrame(
        [("a", "b", 9.0), ("a", "c", 1.0)],
        "src string, dst string, n double")
    got = {r["node"]: r["rank"] for r in
           pagerank(e, weight="n", n_iter=10).collect()}
    want = _scalar_pagerank([("a", "b"), ("a", "c")], 0.85, 10,
                            weights=[9.0, 1.0])
    for k, v in want.items():
        assert got[k] == pytest.approx(v, abs=1e-12)
    assert got["b"] > got["c"]
    # star: hub in-links dominate
    star = spark.createDataFrame(
        [(f"leaf{i}", "hub") for i in range(8)], "src string, dst string")
    ranks = {r["node"]: r["rank"] for r in
             pagerank(star, n_iter=10).collect()}
    assert ranks["hub"] == max(ranks.values())


def test_pagerank_validation_and_empty(spark):
    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError, match="damping"):
        pagerank(df, damping=1.0)
    with pytest.raises(ValueError, match="n_iter"):
        pagerank(df, n_iter=0)
    empty = spark.createDataFrame([], "src string, dst string")
    assert pagerank(empty, n_iter=2).collect() == []


def test_degree_stats(spark):
    e = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("a", "c"), ("b", "c")],
        "src string, dst string")
    got = {r["node"]: r for r in degree_stats(e).collect()}
    assert (got["a"]["out_degree"], got["a"]["out_neighbors"],
            got["a"]["in_degree"]) == (3, 2, 0)
    assert (got["c"]["in_degree"], got["c"]["in_neighbors"],
            got["c"]["out_degree"]) == (2, 2, 0)


def test_pagerank_plan_stays_flat(spark):
    # the lineage cut must keep the final plan independent of n_iter
    e = spark.createDataFrame([("a", "b"), ("b", "a"), ("b", "c")],
                              "src string, dst string")
    p5 = pagerank(e, n_iter=5)._jdf.queryExecution() \
        .executedPlan().toString()
    p1 = pagerank(e, n_iter=1)._jdf.queryExecution() \
        .executedPlan().toString()
    assert abs(len(p5.splitlines()) - len(p1.splitlines())) <= 2
