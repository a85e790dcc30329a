"""Property-based cross-check of the predicate translator.

For randomly generated boolean combinations of tag and numeric leaves,
the FT.SEARCH result count must equal the count from a NATIVELY-built
Spark filter over the same raw columns — an oracle independent of the
parser, translator, and derived-column machinery.

Leaf semantics mirrored natively:
- tag `@f:{a|b}`: raw value, comma-split, trimmed, casefolded, any match
  (here p_brand/p_type are single-valued, so lower(trim(col)) IN set)
- numeric `@f:[lo hi]`: closed range on the double value
- NOT matches documents where the field is missing too — the raw columns
  here are always present, so native `~cond` suffices.
"""

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from valkey_search_spark import NumericField, SearchEngine, TagField

SF = "/root/testdata/sf0.001"

BRANDS = [f"Brand#{i}{j}" for i in range(1, 6) for j in range(1, 6)]
TYPES = ["large", "standard", "medium", "small", "promo", "economy"]


@pytest.fixture(scope="module")
def fuzz_env(spark):
    part = spark.read.parquet(f"{SF}/part.parquet")
    e = SearchEngine(spark)
    e.ft_create("fuzzp", part,
                [TagField("p_brand"), TagField("p_type"),
                 NumericField("p_retailprice"), NumericField("p_size")],
                key_column="p_partkey")
    return e, part


def leaf():
    tag_brand = st.lists(st.sampled_from(BRANDS), min_size=1, max_size=3,
                         unique=True).map(lambda vs: ("tag", "p_brand", vs))
    tag_type = st.lists(st.sampled_from(TYPES), min_size=1, max_size=2,
                        unique=True).map(lambda vs: ("tag", "p_type", vs))
    num_size = st.tuples(st.integers(1, 50), st.integers(1, 50)).map(
        lambda t: ("num", "p_size", (min(t), max(t))))
    num_price = st.tuples(st.integers(900, 920), st.integers(900, 920)).map(
        lambda t: ("num", "p_retailprice", (min(t), max(t))))
    return st.one_of(tag_brand, tag_type, num_size, num_price)


def tree(depth=2):
    if depth == 0:
        return leaf()
    sub = tree(depth - 1)
    return st.one_of(
        leaf(),
        st.tuples(st.just("and"), sub, sub),
        st.tuples(st.just("or"), sub, sub),
        st.tuples(st.just("not"), sub),
    )


def to_query(node) -> str:
    kind = node[0]
    if kind == "tag":
        _, f, vs = node
        return "@%s:{%s}" % (f, " | ".join(vs))
    if kind == "num":
        _, f, (lo, hi) = node
        return f"@{f}:[{lo} {hi}]"
    if kind == "and":
        return f"({to_query(node[1])} {to_query(node[2])})"
    if kind == "or":
        return f"({to_query(node[1])} | {to_query(node[2])})"
    return f"-{to_query(node[1])}"


def to_native(node):
    kind = node[0]
    if kind == "tag":
        _, f, vs = node
        return F.lower(F.trim(F.col(f).cast("string"))).isin(
            [v.lower() for v in vs])
    if kind == "num":
        _, f, (lo, hi) = node
        c = F.col(f).cast("double")
        return (c >= lo) & (c <= hi)
    if kind == "and":
        return to_native(node[1]) & to_native(node[2])
    if kind == "or":
        return to_native(node[1]) | to_native(node[2])
    # reference NOT = complement incl. missing; columns here are non-null
    return ~to_native(node[1])


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(node=tree())
def test_random_boolean_trees_match_native_filters(fuzz_env, node):
    e, part = fuzz_env
    got = e.ft_search("fuzzp", to_query(node), count_only=True)
    want = part.where(to_native(node)).count()
    assert got == want, to_query(node)


# ---------------------------------------------------------------------------
# FT.AGGREGATE reducer fuzz: random GROUPBY/REDUCE pipelines vs natively
# built Spark aggregations encoding the reference's reducer semantics
# (SUM/AVG empty->0.0, MIN/MAX skip missing, COUNT as double).

REDUCERS = ["COUNT", "SUM", "AVG", "MIN", "MAX", "COUNT_DISTINCT", "STDDEV"]
GROUPS = ["p_brand", "p_type"]
NUMS = ["p_size", "p_retailprice"]


def _native_reducer(red, col):
    c = F.col(col).cast("double")
    if red == "COUNT":
        return F.count(F.lit(1)).cast("double")
    if red == "SUM":
        return F.coalesce(F.sum(c), F.lit(0.0))
    if red == "AVG":
        return F.coalesce(F.avg(c), F.lit(0.0))
    if red == "MIN":
        return F.min(c)
    if red == "MAX":
        return F.max(c)
    if red == "COUNT_DISTINCT":
        return F.count_distinct(c).cast("double")
    sd = F.stddev_samp(c)
    return F.coalesce(F.when(F.isnan(sd), F.lit(0.0)).otherwise(sd), F.lit(0.0))


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(group=st.sampled_from(GROUPS),
       reds=st.lists(st.tuples(st.sampled_from(REDUCERS),
                                st.sampled_from(NUMS)),
                     min_size=1, max_size=3))
def test_random_reducer_pipelines_match_native_aggs(fuzz_env, group, reds):
    e, part = fuzz_env
    stages = f"GROUPBY 1 @{group}"
    names = []
    for i, (red, col) in enumerate(reds):
        name = f"r{i}"
        names.append(name)
        stages += f" REDUCE {red} {0 if red == 'COUNT' else 1}" \
                  f"{'' if red == 'COUNT' else ' @' + col} AS {name}"
    got = {r[group]: tuple(None if r[n] is None else round(r[n], 6)
                           for n in names)
           for r in e.ft_aggregate("fuzzp", "*", stages).collect()}
    native = part.groupBy(F.col(group).cast("string").alias(group)).agg(
        *[_native_reducer(red, col).alias(n)
          for (red, col), n in zip(reds, names)])
    want = {r[group]: tuple(None if r[n] is None else round(r[n], 6)
                            for n in names)
            for r in native.collect()}
    # TAG group keys casefold in the engine; native side folds to compare
    want = {k.lower(): v for k, v in want.items()}
    got = {k.lower(): v for k, v in got.items()}
    assert got == want
