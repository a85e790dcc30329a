"""Expression-language edge semantics against the reference's value system
(/root/reference/src/expr/value.cc): byte-based strings, ASCII-only case
mapping, count-returning contains, C-math edges, mixed-type comparison."""

import math

import pytest
from pyspark.sql import Row

from valkey_search_spark import NumericField, SearchEngine, TagField, TextField


@pytest.fixture(scope="module")
def eng(spark):
    docs = spark.createDataFrame([
        Row(id=1, s="héllo", t="abcabcab", num=4.0, word="Ab"),
    ])
    e = SearchEngine(spark)
    e.ft_create("edge", docs,
                [TagField("s"), TagField("t"), NumericField("num"),
                 TagField("word")], key_column="id")
    return e


def _one(eng, applies):
    df = eng.ft_aggregate("edge", "*", applies + " LIMIT 0 1")
    return df.collect()[0]


def test_strlen_is_bytes(eng):
    # "héllo" = 6 bytes UTF-8 (value.cc:483-492)
    assert _one(eng, 'APPLY "strlen(@s)" AS x').x == 6.0


def test_substr_byte_offsets_and_negatives(eng):
    # t = "abcabcab" (8 bytes); FuncSubstr semantics (value.cc:534-565):
    # negative offset wraps from the end, negative length truncates the
    # remainder by (size-offset)+length
    r = _one(eng, 'APPLY "substr(@t, 2, 3)" AS a '
                  'APPLY "substr(@t, 3, -1)" AS b '
                  'APPLY "substr(@t, 100, 2)" AS c '
                  'APPLY "substr(@t, -3, 2)" AS d '
                  'APPLY "substr(@t, -100, 2)" AS e '
                  'APPLY "substr(@t, 1, -10)" AS f')
    assert r.a == "cab"      # 0-based byte offset
    assert r.b == "abca"     # (8-3)+(-1) = 4 bytes from offset 3
    assert r.c == ""         # clamped past end
    assert r.d == "ca"       # offset -3 -> 5
    assert r.e == ""         # still negative after wrap -> empty
    assert r.f == ""         # negative effective length -> empty


def test_contains_counts_occurrences(eng):
    r = _one(eng, 'APPLY "contains(@t, \'ab\')" AS n '
                  'APPLY "contains(@t, \'\')" AS e')
    assert r.n == 3.0        # count, not boolean (value.cc:511-532)
    assert r.e == 9.0        # empty needle -> len+1 (RediSearch compat)


def test_upper_is_ascii_only(eng):
    # é must NOT be uppercased (ASCII-only mapping, value.cc:567-631)
    assert _one(eng, 'APPLY "upper(@s)" AS u').u == "hÉLLO".lower().replace("h", "H") or \
           _one(eng, 'APPLY "upper(@s)" AS u').u == "HéLLO"


def test_math_edges(eng):
    r = _one(eng, 'APPLY "log(0)" AS l0 APPLY "log(0-1)" AS ln1 '
                  'APPLY "sqrt(0-@num)" AS sn APPLY "log2(@num)" AS l2')
    assert r.l0 == -math.inf         # C log(0) = -inf
    assert math.isnan(r.ln1)         # C log(-x) = NaN
    assert math.isnan(r.sn)          # C sqrt(-x) = NaN
    assert r.l2 == 2.0


def test_mixed_type_comparison_promotes(eng):
    # string "4" == numeric 4 -> numeric promotion (value.cc:305-319)
    r = _one(eng, 'APPLY "\'4\' == @num" AS eq APPLY "\'x\' == @num" AS ne')
    assert r.eq is True
    assert r.ne is False     # 'x' does not convert -> string compare


def test_bool_coercion(eng):
    # non-empty strings are truthy (AsBool 1.2.1 fix, value.cc:102-128)
    assert eng.ft_aggregate("edge", "*", 'FILTER "@word" LIMIT 0 10').count() == 1
    # empty string is falsy
    assert eng.ft_aggregate(
        "edge", "*", 'FILTER "substr(@word, 0, 0)" LIMIT 0 10').count() == 0
    # NaN is truthy (AsBool: IsNan -> true)
    assert eng.ft_aggregate(
        "edge", "*", 'FILTER "@num/0" LIMIT 0 10').count() == 1
    # 0.0 is falsy
    assert eng.ft_aggregate(
        "edge", "*", 'FILTER "@num - 4" LIMIT 0 10').count() == 0


def test_arithmetic_on_non_numeric_is_nil(eng):
    # reference FuncAdd returns Nil when AsDouble fails — not NaN
    r = _one(eng, 'APPLY "@word + 1" AS a APPLY "exists(@word + 1)" AS ex '
                  'APPLY "0/0" AS nan_case')
    assert r.a is None and r.ex == 0.0
    import math
    assert math.isnan(r.nan_case)    # genuine NaN still NaN (x/0 rule)


def test_logical_ops_nil_propagation(eng):
    # false && Nil -> Nil and true || Nil -> Nil (value.cc:387-409):
    # the reference propagates Nil from EITHER side, stricter than Kleene
    r = _one(eng, 'APPLY "(1 == 2) && @missing_f" AS y '
                  'APPLY "(1 == 1) || @missing_f" AS z '
                  'APPLY "(1 == 1) && (2 == 2)" AS t')
    assert r.y is None and r.z is None and r.t == 1.0
