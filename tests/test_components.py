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


def test_gopher_quality_flags_scalar_reference(spark):
    """Every Gopher rule pinned against a scalar Python re-implementation
    of the published thresholds (words = whitespace split)."""
    import re
    from pyspark.sql import Row
    from valkey_search_spark.operators.textops import (
        GOPHER_STOPWORDS, gopher_quality_flags,
    )

    good = ("the quick brown fox jumps over the lazy dog and then "
            "runs away to be with all of that other text " * 3)
    texts = {
        1: good,                                  # passes everything
        2: "short doc",                           # fails word count
        3: good + " ##### " * 40,                 # fails symbol ratio
        4: "\n".join("- bullet item " + good[:20] for _ in range(10)),
        5: "\n".join((good[:40] + "...") for _ in range(10)),
        6: ("123 456 789 " * 30) + "the be",      # fails alpha words
        7: ("zz " * 80).strip(),                  # fails stopwords+meanlen
        8: "",                                    # everything false
    }
    df = spark.createDataFrame(
        [Row(doc_id=k, text=t) for k, t in texts.items()])
    out = {r["doc_id"]: r for r in
           gopher_quality_flags(df, min_words=50).collect()}

    for k, t in texts.items():
        words = [w for w in re.split(r"\s+", t) if w]
        lines = t.split("\n")
        wc, nl = len(words), len(lines)
        mean_len = sum(map(len, words)) / wc if wc else None
        n_sym = t.count("#") + len(re.findall(r"\.\.\.|…", t))
        bullet = sum(bool(re.match(r"^[•‣▪-]", ln.lstrip()))
                     for ln in lines)
        ell = sum(bool(re.search(r"(\.\.\.|…)$", ln.rstrip()))
                  for ln in lines)
        alpha = sum(bool(re.search("[A-Za-z]", w)) for w in words)
        stop_hits = len({w.lower() for w in words} & set(GOPHER_STOPWORDS))
        expect = {
            "g_word_count": 50 <= wc <= 100_000,
            "g_mean_word_len": (mean_len is not None
                                and 3.0 <= mean_len <= 10.0),
            "g_symbol_ratio": wc > 0 and n_sym / wc < 0.1,
            "g_bullet_lines": nl > 0 and bullet / nl < 0.9,
            "g_ellipsis_lines": nl > 0 and ell / nl < 0.3,
            "g_alpha_words": wc > 0 and alpha / wc > 0.8,
            "g_stopwords": stop_hits >= 2,
        }
        for flag, want in expect.items():
            assert out[k][flag] == want, (k, flag)
        assert out[k]["gopher_pass"] == all(expect.values()), k
    assert out[1]["gopher_pass"] and not out[2]["gopher_pass"]
    assert not out[4]["g_bullet_lines"] and not out[5]["g_ellipsis_lines"]


def test_gopher_flags_hypothesis_parity(spark):
    """Randomized differential check: every Gopher flag matches the
    scalar reference on arbitrary printable texts (incl. pathological
    whitespace, unicode ellipsis, bullets, empty lines)."""
    import re
    from hypothesis import given, settings, strategies as st
    from pyspark.sql import Row
    from valkey_search_spark.operators.textops import (
        GOPHER_STOPWORDS, gopher_quality_flags,
    )

    piece = st.sampled_from(
        list("abc de\nf-•…#.123 ") + ["the ", "...", "\n\n", "zz "])
    texts_strategy = st.lists(
        st.lists(piece, max_size=30).map("".join), min_size=1, max_size=6)

    @given(texts_strategy)
    @settings(max_examples=12, deadline=None)
    def run(texts):
        df = spark.createDataFrame(
            [Row(doc_id=i, text=t) for i, t in enumerate(texts)])
        out = {r["doc_id"]: r for r in
               gopher_quality_flags(df, min_words=3).collect()}
        for i, t in enumerate(texts):
            words = [w for w in re.split(r"\s+", t) if w]
            lines = t.split("\n")
            wc, nl = len(words), len(lines)
            mean_len = sum(map(len, words)) / wc if wc else None
            n_sym = t.count("#") + len(re.findall(r"\.\.\.|…", t))
            bullet = sum(bool(re.match(r"^[•‣▪-]", ln.lstrip()))
                         for ln in lines)
            ell = sum(bool(re.search(r"(\.\.\.|…)$", ln.rstrip()))
                      for ln in lines)
            alpha = sum(bool(re.search("[A-Za-z]", w)) for w in words)
            hits = len({w.lower() for w in words} & set(GOPHER_STOPWORDS))
            expect = {
                "g_word_count": 3 <= wc <= 100_000,
                "g_mean_word_len": (mean_len is not None
                                    and 3.0 <= mean_len <= 10.0),
                "g_symbol_ratio": wc > 0 and n_sym / wc < 0.1,
                "g_bullet_lines": nl > 0 and bullet / nl < 0.9,
                "g_ellipsis_lines": nl > 0 and ell / nl < 0.3,
                "g_alpha_words": wc > 0 and alpha / wc > 0.8,
                "g_stopwords": hits >= 2,
            }
            for flag, want in expect.items():
                assert out[i][flag] == want, (repr(t), flag)

    run()
