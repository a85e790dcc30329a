"""Phrase members as wildcard / fuzzy specifiers
(docs/full-text/phrase.md: "Each word specifier could be a word, a word
wildcard match, or a fuzzy word match")."""

import duckdb
import pytest

from valkey_search_spark import SearchEngine, TextField
from valkey_search_spark.errors import QuerySyntaxError

SF = "/root/testdata/sf0.001"
PART = f"{SF}/part.parquet"


@pytest.fixture(scope="module")
def eng(spark):
    e = SearchEngine(spark)
    part = spark.read.parquet(PART)
    e.ft_create("ph", part, [TextField("p_name")], key_column="p_partkey")
    e.ft_create("ph_nt", part,
                [TextField("p_name", alias="nt", with_suffixtrie=False)],
                key_column="p_partkey")
    return e


def _oracle(where):
    return duckdb.sql(
        f"select count(*) from '{PART}' where {where}").fetchone()[0]


def _count(eng, q, index="ph"):
    return eng.ft_search(index, q, count_only=True)


def test_phrase_prefix_member(eng):
    # "blue ro*" matches 'blue rod' but not 'blue ring'... ro* vs ri*
    got = _count(eng, '@p_name:"blue ro*"')
    want = _oracle("p_name like 'blue ro%'")
    assert got == want > 0


def test_phrase_suffix_member(eng):
    got = _count(eng, '@p_name:"*old anvil"')   # cold anvil
    want = _oracle("p_name similar to '[a-z]*old anvil'")
    assert got == want > 0


def test_phrase_infix_member(eng):
    got = _count(eng, '@p_name:"*ol* anvil"')   # cold/gold... anvil
    want = _oracle("p_name similar to '[a-z]*ol[a-z]* anvil'")
    assert got == want > 0


def test_phrase_fuzzy_member(eng):
    # one edit: 'rod' ~ 'ros' is distance 1; use %rad% -> rod/red? 'rad'
    # matches 'rod' and 'red' at distance 1 but position must follow 'hot'
    got = _count(eng, '@p_name:"hot %rad%"')
    want = _oracle("p_name = 'hot rod'")        # only rod follows 'hot'
    assert got == want > 0


def test_phrase_order_still_enforced(eng):
    assert _count(eng, '@p_name:"rod blue"') == 0
    assert _count(eng, '@p_name:"ro* blue"') == 0


def test_phrase_plain_unchanged(eng):
    got = _count(eng, '@p_name:"blue rod"')
    assert got == _oracle("p_name = 'blue rod'") > 0


def test_phrase_suffix_member_requires_trie(eng):
    with pytest.raises(QuerySyntaxError, match="WITHSUFFIXTRIE"):
        _count(eng, '@nt:"*old anvil"', index="ph_nt")


def test_phrase_fuzzy_distance_capped(eng):
    with pytest.raises(QuerySyntaxError, match="fuzzy"):
        _count(eng, '@p_name:"hot %%%%rad%%%%"')


def test_phrase_escaped_star_is_literal(eng):
    r"""`\*` inside a phrase is a literal character, not a wildcard
    specifier (same escape handling tags get). The field lexer then
    splits the `*` away like any punctuation — so `"blue ro\*"` is the
    phrase (blue, ro), which matches nothing here, NOT the prefix match
    `"blue ro*"` does."""
    assert _count(eng, '@p_name:"blue ro*"') > 0          # wildcard member
    assert _count(eng, '@p_name:"blue ro\\*"') == 0       # literal member
    # a literal leading `\*` is NOT a suffix specifier: no WITHSUFFIXTRIE
    # demand on a trie-less field (it lexes to the term member "old")
    assert _count(eng, '@nt:"\\*old anvil"', index="ph_nt") == \
        _count(eng, '@p_name:"old anvil"')
    # escaped % is not a fuzzy specifier either
    assert _count(eng, '@p_name:"hot \\%rad\\%"') == 0


def test_nooffsets_phrase_gate_is_post_lex(eng, spark):
    """The offsets gate fires on the POST-lex term count
    (filter_parser.cc terms.size() > 1): one quoted word lexing to two
    tokens needs offsets; a two-word phrase collapsing to one term
    does not."""
    e = SearchEngine(spark)
    part = spark.read.parquet(PART)
    e.ft_create("noffp", part, [TextField("p_name", with_offsets=False)],
                key_column="p_partkey")
    with pytest.raises(QuerySyntaxError, match="offsets"):
        e.ft_search("noffp", '@p_name:"hot.rod"', count_only=True)
    # "- anvil": '-' lexes to nothing, leaving the single term "anvil"
    assert e.ft_search("noffp", '@p_name:"- anvil"', count_only=True) == \
        e.ft_search("noffp", "@p_name:anvil", count_only=True,
                    verbatim=True) > 0


def test_nooffsets_rejects_phrase_and_proximity(spark):
    """NOOFFSETS (ft_create_parser.cc:474): without word positions the
    index rejects phrase and proximity queries (filter_parser.cc:876),
    while single-term queries still work; FT.INFO reports with_offsets 0."""
    e = SearchEngine(spark)
    part = spark.read.parquet(PART)
    e.ft_create("noff", part,
                [TextField("p_name", with_offsets=False)],
                key_column="p_partkey")
    assert e.ft_search("noff", "anvil", count_only=True) > 0
    with pytest.raises(QuerySyntaxError, match="offsets"):
        e.ft_search("noff", '@p_name:"cold anvil"', count_only=True)
    with pytest.raises(QuerySyntaxError, match="offsets"):
        e.ft_search("noff", "cold anvil", slop=1, count_only=True)
    assert e.ft_info("noff")["with_offsets"] == "0"


def test_two_slot_proximity_is_jvm_only(spark):
    """The k=2 proximity fast path stays entirely inside codegen — no
    Arrow/Python nodes in the plan (3+ slots still use the kernel)."""
    e = SearchEngine(spark)
    part = spark.read.parquet(PART)
    # nostem isolates the assertion: a stemmed UNCACHED index would show
    # the ingest-time stemming UDF in the plan (not the proximity check —
    # cached indexes, like the driver's, scan materialized stem columns)
    e.ft_create("prox2", part, [TextField("p_name", nostem=True)],
                key_column="p_partkey")
    plan = e.ft_search("prox2", "cold anvil", slop=1, inorder=True,
                       limit=(0, 10))._jdf.queryExecution() \
        .executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    # and the fast path agrees with DuckDB on real data
    import duckdb
    got = e.ft_search("prox2", "cold anvil", slop=0, inorder=True,
                      count_only=True)
    want = duckdb.sql(
        f"select count(*) from '{PART}' where p_name = 'cold anvil'"
    ).fetchone()[0]
    assert got == want > 0


def test_proximity_inorder_compat_mode(spark):
    """proximity-inorder-compat-mode (proximity.cc:8-19): default strict
    INORDER requires strictly increasing positions (duplicate query terms
    need two occurrences); compat mode checks start order only, so one
    token can satisfy both slots."""
    from pyspark.sql import Row

    from valkey_search_spark import SearchEngine
    from valkey_search_spark.plans.predicate_translator import QueryLimits

    docs = spark.createDataFrame([
        Row(id=1, body="alpha beta alpha"),   # two alphas
        Row(id=2, body="alpha beta gamma"),   # one alpha
        Row(id=3, body="alpha alpha beta"),   # strict 3-slot chain exists
    ])
    strict = SearchEngine(spark)
    strict.ft_create("pc", docs, [TextField("body", nostem=True)],
                     key_column="id")
    got = sorted(r["id"] for r in strict.ft_search(
        "pc", "alpha alpha", inorder=True, limit=(0, 10)).collect())
    assert got == [1, 3]                       # needs 2 distinct positions

    compat = SearchEngine(spark, limits=QueryLimits(
        proximity_inorder_compat=True))
    compat.catalog = strict.catalog
    got = sorted(r["id"] for r in compat.ft_search(
        "pc", "alpha alpha", inorder=True, limit=(0, 10)).collect())
    assert got == [1, 2, 3]                    # overlap permitted

    # 3-slot kernel path honors the same toggle: strict needs the full
    # increasing alpha < alpha < beta chain (only doc 3 has it)
    got = sorted(r["id"] for r in strict.ft_search(
        "pc", "alpha alpha beta", inorder=True, slop=2,
        limit=(0, 10)).collect())
    assert got == [3]
    got = sorted(r["id"] for r in compat.ft_search(
        "pc", "alpha alpha beta", inorder=True, slop=2,
        limit=(0, 10)).collect())
    assert got == [1, 2, 3]
