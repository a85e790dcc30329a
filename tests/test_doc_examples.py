"""Parity fixtures from the reference's own doc-example scripts
(/root/reference/docs/examples/tag.field.examples, search.examples):
the exact datasets those scripts load, with expectations derived from
the documented TAG semantics (separator split, trim, casefold —
docs/topics/search-data-formats.md:10-46)."""

import pytest
from pyspark.sql import Row

from valkey_search_spark import SearchEngine, TagField


@pytest.fixture(scope="module")
def tag_eng(spark):
    # HSET rows from tag.field.examples (key6 has no city attribute)
    rows = [
        Row(key="key1", color="blue", city="San Jose"),
        Row(key="key2", color="black", city="Seattle"),
        Row(key="key3", color="green", city="New York, Barcelona, Kiev"),
        Row(key="key4", color="beige", city=" Taipei , Bangkok "),
        Row(key="key5", color="beige,green", city=" Cairo    ,  Tel Aviv   "),
        Row(key="key6", color="hello world, green is my heart", city=None),
    ]
    e = SearchEngine(spark)
    e.ft_create("index", spark.createDataFrame(rows),
                [TagField("color"), TagField("city")], key_column="key")
    return e


def _keys(e, q):
    return sorted(r["__key"] for r in
                  e.ft_search("index", q, limit=(0, 100),
                              return_fields=[]).collect())


def test_tag_exact(tag_eng):
    assert _keys(tag_eng, "@color:{blue}") == ["key1"]


def test_tag_or(tag_eng):
    assert _keys(tag_eng, "@color:{blue | black}") == ["key1", "key2"]


def test_tag_escaped_star_is_still_a_prefix(tag_eng):
    r"""Shipped semantics (tag.cc ParseSearchTags + predicate.cc
    TagPredicate): the backslash protects only the `|`/`}` split; tags
    are UNESCAPED before evaluation, and the evaluator re-checks the
    trailing `*` — so `{b\*}` is a PREFIX query for "b". This matches
    the search-query.md "Prefix Tag Query" transcript (4 keys), and the
    RAW-length guard (len("b\\*") = 3 > 2) is why the escaped 1-char
    prefix is legal while bare `{b*}` is rejected."""
    assert _keys(tag_eng, r"@color:{b\*}") == \
        ["key1", "key2", "key4", "key5"]


def test_tag_multiple_trailing_stars_error(tag_eng):
    from valkey_search_spark.errors import QuerySyntaxError

    with pytest.raises(QuerySyntaxError, match="multiple"):
        _keys(tag_eng, "@color:{bl**}")


def test_tag_prefix_or_exact(tag_eng, spark):
    # Under DEFAULTS `b*` errors: the guard measures the RAW text,
    # len("b*") = 2 <= tag-min-prefix-length 2
    # (tag.cc:160-166; valkey_search_options.cc:344). The doc transcript
    # for this query predates the guard; reproduce both behaviors.
    from valkey_search_spark.errors import QuerySyntaxError
    from valkey_search_spark.plans.predicate_translator import QueryLimits

    with pytest.raises(QuerySyntaxError, match="tag-min-prefix-length"):
        _keys(tag_eng, "@color:{b*|green}")

    relaxed = SearchEngine(spark, limits=QueryLimits(tag_min_prefix_length=1))
    relaxed.catalog = tag_eng.catalog
    got = sorted(r["__key"] for r in relaxed.ft_search(
        "index", "@color:{b*|green}", limit=(0, 100),
        return_fields=[]).collect())
    # b* matches blue/black/beige; green exact matches key3+key5 (key6's
    # tag is "green is my heart", not "green")
    assert got == ["key1", "key2", "key3", "key4", "key5"]


def test_tag_query_whitespace_trimmed(tag_eng):
    assert _keys(tag_eng, "@city: {  San Jose  }") == ["key1"]


def test_tag_internal_whitespace_significant(tag_eng):
    # "San  Jose" (two spaces) is a different tag than "San Jose"
    assert _keys(tag_eng, "@city:{San  Jose}") == []


def test_tag_values_trimmed_at_ingest(tag_eng):
    # key4/key5 city values carry ragged whitespace; the indexed tags trim
    assert _keys(tag_eng, "@city:{Taipei}") == ["key4"]
    assert _keys(tag_eng, "@city:{Tel Aviv}") == ["key5"]
    assert _keys(tag_eng, "@city:{Bangkok | Cairo}") == ["key4", "key5"]


def test_search_examples_hash_scenario(spark):
    # search.examples: five keys, @color:{bl*} matches blue/black/blend
    rows = [
        Row(key="key1", color="blue", city="London"),
        Row(key="key2", color="black", city="Paris"),
        Row(key="key3", color="green", city="Berlin"),
        Row(key="key4", color="white", city="Tokyo"),
        Row(key="key5", color="blend", city=None),
    ]
    e = SearchEngine(spark)
    e.ft_create("sidx", spark.createDataFrame(rows),
                [TagField("color"), TagField("city")], key_column="key")
    df = e.ft_search("sidx", "@color:{bl*}", limit=(0, 10))
    got = sorted(r["__key"] for r in df.collect())
    assert got == ["key1", "key2", "key5"]
    # NOCONTENT: keys only
    assert e.ft_search("sidx", "@color:{bl*}", limit=(0, 10),
                       return_fields=[]).columns == ["__key"]
    # RETURN 2 color city
    df = e.ft_search("sidx", "@color:{bl*}", limit=(0, 10),
                     return_fields=["color", "city"])
    assert df.columns == ["__key", "color", "city"]


def test_search_examples_json_scenario(spark):
    # search.examples ON JSON: same data as JSON documents
    docs = [
        Row(key="key1", doc='{"color":"blue","city":"London"}'),
        Row(key="key2", doc='{"color":"black","city":"Paris"}'),
        Row(key="key3", doc='{"color":"green","city":"Berlin"}'),
        Row(key="key4", doc='{"color":"white","city":"Tokyo"}'),
        Row(key="key5", doc='{"color":"blend","cityextra":"Unknown"}'),
    ]
    e = SearchEngine(spark)
    e.ft_create("jidx", spark.createDataFrame(docs),
                [TagField("$.color", alias="color"),
                 TagField("$.city", alias="city")],
                key_column="key", on_json="doc")
    got = sorted(r["__key"] for r in e.ft_search(
        "jidx", "@color:{bl*}", limit=(0, 10)).collect())
    assert got == ["key1", "key2", "key5"]
