"""FT.SEARCH filter algebra vs DuckDB oracle at sf0.001.

Mirrors the reference's integration/test_filter_expressions.py +
integration/test_non_vector.py shapes (SURVEY.md §5.2) with DuckDB as
the golden-answer oracle (SURVEY.md §5.3 analogue).
"""

from __future__ import annotations

import duckdb
import pytest

from valkey_search_spark import NumericField, SearchEngine, TagField, TextField

from .conftest import SF_DIR, load


@pytest.fixture(scope="module")
def eng(spark, sf_dir):
    e = SearchEngine(spark)
    e.ft_create(
        "parts",
        load(spark, sf_dir, "part"),
        [TagField("p_brand"), TagField("p_type"), NumericField("p_retailprice"),
         NumericField("p_size"), TextField("p_name")],
        key_column="p_partkey",
    )
    return e


def duck(sql: str) -> int:
    return duckdb.sql(sql.replace("PART", f"'{SF_DIR}/part.parquet'")).fetchall()[0][0]


CASES = [
    # (query, duckdb where-clause)
    ("@p_brand:{Brand#13}", "p_brand = 'Brand#13'"),
    ("@p_brand:{Brand#13|Brand#42}", "p_brand IN ('Brand#13','Brand#42')"),
    ("@p_brand:{Brand#1*}", "p_brand LIKE 'Brand#1%'"),
    ("@p_retailprice:[905 915]", "p_retailprice BETWEEN 905 AND 915"),
    ("@p_retailprice:[(905 (915]", "p_retailprice > 905 AND p_retailprice < 915"),
    ("@p_retailprice:[905 +inf]", "p_retailprice >= 905"),
    ("@p_retailprice:[-inf (910]", "p_retailprice < 910"),
    ("@p_retailprice:[905 905]", "p_retailprice = 905"),
    ("-@p_brand:{Brand#13}", "p_brand <> 'Brand#13'"),
    ("@p_brand:{Brand#13} @p_retailprice:[905 915]",
     "p_brand='Brand#13' AND p_retailprice BETWEEN 905 AND 915"),
    ("@p_brand:{Brand#13} | @p_retailprice:[918 919]",
     "(p_brand='Brand#13' OR p_retailprice BETWEEN 918 AND 919)"),
    ("-(@p_brand:{Brand#13} | @p_brand:{Brand#5})",
     "p_brand NOT IN ('Brand#13','Brand#5')"),
    ("widget", "regexp_matches(p_name, '(^|[^a-z0-9])widget([^a-z0-9]|$)')"),
    ("wid*", "regexp_matches(p_name, '(^|[^a-z0-9])wid')"),
    ("*get", "regexp_matches(p_name, 'get([^a-z0-9]|$)')"),
    ("*old*", "p_name LIKE '%old%'"),
    ('"large bolt"', "p_name LIKE '%large bolt%'"),
    ("@p_name:(widget|bolt)",
     "regexp_matches(p_name, '(^|[^a-z0-9])(widget|bolt)([^a-z0-9]|$)')"),
    ("*", "TRUE"),
]


@pytest.mark.parametrize("query,where", CASES, ids=[c[0] for c in CASES])
def test_count_matches_oracle(eng, query, where):
    got = eng.ft_search("parts", query, count_only=True)
    want = duck(f"SELECT count(*) FROM PART WHERE {where}")
    assert got == want, f"{query}: spark={got} duck={want}"


def test_params(eng):
    n1 = eng.ft_search("parts", "@p_brand:{$b}", params={"b": "Brand#13"}, count_only=True)
    n2 = eng.ft_search("parts", "@p_retailprice:[$lo $hi]",
                       params={"lo": 905, "hi": 915}, count_only=True)
    assert n1 == duck("SELECT count(*) FROM PART WHERE p_brand='Brand#13'")
    assert n2 == duck("SELECT count(*) FROM PART WHERE p_retailprice BETWEEN 905 AND 915")


def test_limit_and_return(eng):
    df = eng.ft_search("parts", "@p_brand:{Brand#13}", limit=(0, 5),
                       return_fields=["p_name", "p_retailprice"])
    rows = df.collect()
    assert len(rows) == 5
    assert df.columns == ["__key", "p_name", "p_retailprice"]


def test_sortby(eng):
    df = eng.ft_search("parts", "@p_brand:{Brand#13}", sortby="p_retailprice",
                       limit=(0, 100))
    prices = [r.p_retailprice for r in df.collect()]
    assert prices == sorted(prices)


def test_stemming(eng):
    # "widgets" stems to the same as "widget"
    n_sing = eng.ft_search("parts", "widget", count_only=True)
    n_plur = eng.ft_search("parts", "widgets", count_only=True)
    assert n_sing == n_plur > 0


def test_fuzzy(eng):
    # one edit away (deletion) — matches all docs containing "widget"
    n = eng.ft_search("parts", "%widgt%", count_only=True)
    assert n == eng.ft_search("parts", "widget", count_only=True)
    # %% = distance 2
    n2 = eng.ft_search("parts", "%%wdgt%%", count_only=True)
    assert n2 >= n


def test_phrase_and_term_lexed_with_field_punctuation(spark):
    """Query text passes through the schema lexer (filter_parser.cc:597-616):
    '"hello, world"' tokenizes to [hello, world] and matches documents
    whose ingest lexer produced the same tokens."""
    from pyspark.sql import Row
    from valkey_search_spark import SearchEngine, TextField

    df = spark.createDataFrame([
        Row(k="a", body="Hello, world today"),
        Row(k="b", body="hello mars today"),
    ])
    e = SearchEngine(spark)
    e.ft_create("lexq", df, [TextField("body")], key_column="k")
    got = {r["k"] for r in e.ft_search("lexq", '"hello, world"',
                                       limit=(0, 10)).collect()}
    assert got == {"a"}
    # punctuation inside a bare term splits into two ANDed terms
    got2 = {r["k"] for r in e.ft_search("lexq", "@body:hello,world",
                                        limit=(0, 10)).collect()}
    assert got2 == {"a"}


def test_count_only_knn_counts_after_topk(spark):
    """Exact-path count_only must report the <=k result size, matching the
    ANN branch."""
    from valkey_search_spark import SearchEngine, VectorField

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    e = SearchEngine(spark)
    e.ft_create("cnt_emb", emb, [VectorField("embedding", dim=64, metric="l2")],
                key_column="vec_id")
    qv = [0.1] * 64
    n = e.ft_search("cnt_emb", "*=>[KNN 7 @embedding $v]", params={"v": qv},
                    count_only=True)
    assert n == 7


def test_ft_create_key_prefix_filters(spark):
    """FT.CREATE PREFIX n p1..pn: only keys with a matching prefix belong
    to the index (docs/commands/ft.create.md; src/index_schema.h:86)."""
    from pyspark.sql import Row
    from valkey_search_spark import SearchEngine, TagField

    df = spark.createDataFrame([
        Row(k="doc:1", t="x"), Row(k="doc:2", t="y"),
        Row(k="user:1", t="x"), Row(k="img:1", t="x"),
    ])
    e = SearchEngine(spark)
    e.ft_create("pfx", df, [TagField("t")], key_column="k",
                prefixes=["doc:", "user:"])
    assert e.ft_search("pfx", "*", count_only=True) == 3
    got = {r["k"] for r in e.ft_search("pfx", "@t:{x}", limit=(0, 10)).collect()}
    assert got == {"doc:1", "user:1"}
    # the prefix filter reaches the scan as a pushed StartsWith
    plan = e.ft_search("pfx", "*", limit=(0, 10))._jdf.queryExecution() \
            .executedPlan().toString()
    assert "StartsWith" in plan


def test_withsortkeys_exposes_sort_value(eng):
    """WITHSORTKEYS augments output with the sort-key value
    (docs/commands/ft.search.md)."""
    df = eng.ft_search("parts", "@p_brand:{Brand#13}", sortby="p_retailprice",
                       withsortkeys=True, limit=(0, 5))
    assert "__sortkey" in df.columns
    rows = df.collect()
    assert [r["__sortkey"] for r in rows] == sorted(
        r["p_retailprice"] for r in rows)


def test_on_json_default_reply_is_whole_document(spark):
    """ON-JSON indexes with neither NOCONTENT nor RETURN reply with one
    `$` pair holding the entire JSON document."""
    import json as _json

    from pyspark.sql import Row
    from valkey_search_spark import SearchEngine, TagField

    doc = {"cat": "x", "n": 1}
    df = spark.createDataFrame([Row(k="a", body=_json.dumps(doc))])
    e = SearchEngine(spark)
    e.ft_create("jdef", df, [TagField("$.cat", alias="cat")],
                key_column="k", on_json="body")
    out = e.ft_search("jdef", "@cat:{x}", limit=(0, 5))
    assert out.columns == ["__key", "$"]
    assert _json.loads(out.first()["$"]) == doc


def test_tag_separator_trim_fold_and_untracked(spark):
    """TAG ingestion: separator split, whitespace trim, casefold, dedupe;
    an EMPTY tag set is untracked (tag.cc:149-177, 166-170)."""
    from pyspark.sql import Row

    df = spark.createDataFrame([
        Row(k=1, t="A; b ;c"), Row(k=2, t="b"), Row(k=3, t=" ; ;"),
        Row(k=4, t=None),
    ])
    e = SearchEngine(spark)
    e.ft_create("tagsep", df, [TagField("t", separator=";")], key_column="k")
    got = {int(r["__key"]) for r in e.ft_search("tagsep", "@t:{b}",
                                                limit=(0, 10)).collect()}
    assert got == {1, 2}
    # untracked rows (empty set / null) match the negation
    neg = {int(r["__key"]) for r in e.ft_search("tagsep", "-@t:{b}",
                                                limit=(0, 10)).collect()}
    assert neg == {3, 4}


def test_tag_casesensitive_matching(spark):
    from pyspark.sql import Row

    df = spark.createDataFrame([Row(k=1, t="Red"), Row(k=2, t="red")])
    e = SearchEngine(spark)
    e.ft_create("tagcs", df, [TagField("t", casesensitive=True)],
                key_column="k")
    got = {int(r["__key"]) for r in e.ft_search("tagcs", "@t:{Red}",
                                                limit=(0, 10)).collect()}
    assert got == {1}
    # default (insensitive) folds both sides
    e.ft_create("tagci", df, [TagField("t")], key_column="k")
    got2 = {int(r["__key"]) for r in e.ft_search("tagci", "@t:{RED}",
                                                 limit=(0, 10)).collect()}
    assert got2 == {1, 2}


def test_numeric_string_lenient_parse(spark):
    """NUMERIC over string values: int/float/scientific/±inf accepted,
    NaN and garbage -> untracked (search-data-formats.md:70-100)."""
    from pyspark.sql import Row

    df = spark.createDataFrame([
        Row(k=1, v="42"), Row(k=2, v="4.2e1"), Row(k=3, v="inf"),
        Row(k=4, v="-infinity"), Row(k=5, v="nan"), Row(k=6, v="abc"),
    ])
    e = SearchEngine(spark)
    e.ft_create("numstr", df, [NumericField("v")], key_column="k")
    got = {int(r["__key"]) for r in e.ft_search("numstr", "@v:[42 42]",
                                                limit=(0, 10)).collect()}
    assert got == {1, 2}
    hi = {int(r["__key"]) for r in e.ft_search("numstr", "@v:[100 +inf]",
                                               limit=(0, 10)).collect()}
    assert hi == {3}
    lo = {int(r["__key"]) for r in e.ft_search("numstr", "@v:[-inf (0]",
                                               limit=(0, 10)).collect()}
    assert lo == {4}
    # untracked (nan/garbage) never match ranges, DO match negation
    neg = {int(r["__key"]) for r in e.ft_search("numstr", "-@v:[42 42]",
                                                limit=(0, 10)).collect()}
    assert {5, 6} <= neg
    # [-inf +inf] means tracked-for-field
    trk = e.ft_search("numstr", "@v:[-inf +inf]", count_only=True)
    assert trk == 4


def test_nostem_field_matches_exact_tokens_only(spark):
    from pyspark.sql import Row

    df = spark.createDataFrame([Row(k=1, body="table"), Row(k=2, body="tables")])
    e = SearchEngine(spark)
    e.ft_create("nostem_ix", df, [TextField("body", nostem=True)],
                key_column="k")
    got = {int(r["__key"]) for r in e.ft_search("nostem_ix", "tables",
                                                limit=(0, 10)).collect()}
    assert got == {2}              # no stem expansion on a NOSTEM field
    e.ft_create("stem_ix", df, [TextField("body")], key_column="k")
    both = {int(r["__key"]) for r in e.ft_search("stem_ix", "tables",
                                                 limit=(0, 10)).collect()}
    assert both == {1, 2}


def test_min_stem_size_gate(spark):
    """Words shorter than MINSTEMSIZE are never stemmed
    (search-data-formats.md:232): with min_stem_size=6, 'tables' (6 chars)
    stems but 'table' (5) stays verbatim, so the two no longer co-match."""
    from pyspark.sql import Row

    df = spark.createDataFrame([Row(k=1, body="table"), Row(k=2, body="tables")])
    e = SearchEngine(spark)
    e.ft_create("mss", df, [TextField("body", min_stem_size=6)], key_column="k")
    # doc1 'table' (5 chars < 6) indexes verbatim as 'table'; doc2 'tables'
    # (6 chars) indexes as stem 'tabl'; query 'tables' stems to 'tabl' and
    # therefore reaches only doc2
    got = {int(r["__key"]) for r in e.ft_search("mss", "tables",
                                                limit=(0, 10)).collect()}
    assert got == {2}


def test_limit_offset_past_end(eng):
    df = eng.ft_search("parts", "@p_brand:{Brand#13}", limit=(10_000, 5))
    assert df.count() == 0


def test_unbounded_limit_none(eng):
    """limit=(0, None) is the explicit fetch-everything form: same rows
    as a large numeric limit, no single-partition limit exchange in the
    orderless plan, and the reply path still reports the correct
    pre-limit total (the observed plan re-caps internally so the
    CollectMetrics count is not double-executed by a sort)."""
    want = duck("SELECT count(*) FROM PART WHERE p_brand = 'Brand#13'")
    df = eng.ft_search("parts", "@p_brand:{Brand#13}", limit=(0, None))
    assert df.count() == want
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    rep = eng.ft_search_reply("parts", "@p_brand:{Brand#13}", limit=(0, None))
    assert rep[0] == want and (len(rep) - 1) // 2 == want
    # ordered variant stays correct and ordered
    rows = eng.ft_search("parts", "@p_brand:{Brand#13}",
                         sortby="p_retailprice", limit=(0, None)).collect()
    prices = [r["p_retailprice"] for r in rows]
    assert len(rows) == want and prices == sorted(prices)


def test_stopword_term_dropped_not_false(eng):
    """A stopword query term is SKIPPED at parse, not matched
    (filter_parser.cc:766-768): 'the' is never indexed, so requiring it
    would return zero rows; the reference instead drops the term and
    matches on the rest of the same text run."""
    n_with = eng.ft_search("parts", "the widget", count_only=True)
    n_plain = eng.ft_search("parts", "widget", count_only=True)
    assert n_with == n_plain > 0


def test_stopword_position_dependent_syntax_error(eng):
    """The reference's 'Invalid Query Syntax' is position-dependent: it
    fires when a text run drops ALL its terms while query_operations_ is
    still kNone (filter_parser.cc:891-893), so 'the @tag' ERRORS (the tag
    op is recorded only later at :373) while '@tag the' succeeds."""
    from valkey_search_spark import QuerySyntaxError

    with pytest.raises(QuerySyntaxError):
        eng.ft_search("parts", "the @p_brand:{Brand#13}", count_only=True)
    n_after = eng.ft_search("parts", "@p_brand:{Brand#13} the",
                            count_only=True)
    assert n_after == eng.ft_search("parts", "@p_brand:{Brand#13}",
                                    count_only=True) > 0


def test_all_stopword_query_is_syntax_error(eng):
    """A query reduced entirely to dropped terms has no effective
    operations -> 'Invalid Query Syntax' (filter_parser.cc:891-893).
    Quoted phrases are NOT dropped (no IsStopWord check in
    ParseQuotedTextToken) — '"the of"' is a valid query, tested below."""
    from valkey_search_spark import QuerySyntaxError

    for q in ("the", "the and of"):
        with pytest.raises(QuerySyntaxError):
            eng.ft_search("parts", q, count_only=True)


def test_stopword_dropped_inside_or_and_negate_transfers(eng):
    """Dropped children vanish from OR groups; a pending '-' attaches to
    the NEXT surviving term of the same text run (filter_parser.cc:951
    consumes '-' before ParseTextTokens, which skips the stopword), so
    '-the widget' is NOT(widget) — the complement set."""
    n_or = eng.ft_search("parts", "@p_name:(the|widget)", count_only=True)
    assert n_or == eng.ft_search("parts", "@p_name:widget", count_only=True) > 0
    n_not = eng.ft_search("parts", "-the widget", count_only=True)
    n_widget = eng.ft_search("parts", "widget", count_only=True)
    n_total = eng.ft_search("parts", "*", count_only=True)
    assert 0 < n_not == n_total - n_widget
    assert n_not == eng.ft_search("parts", "-widget", count_only=True)


def test_phrase_with_stopword_is_valid_but_matches_nothing(eng):
    """Quoted tokens are not stopword-filtered (ParseQuotedTextToken,
    filter_parser.cc:594-625), and stopwords are never indexed
    (lexer.cc:148): a phrase containing one is a VALID query returning 0
    rows — '"the large bolt"' does NOT fall back to matching 'large
    bolt'."""
    assert eng.ft_search("parts", '"the of"', count_only=True) == 0
    assert eng.ft_search("parts", '"the large bolt"', count_only=True) == 0
    assert eng.ft_search("parts", '"large bolt"', count_only=True) > 0
