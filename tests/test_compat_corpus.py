"""Golden-answer compatibility corpus: enumerate query families
combinatorially and compare every query against DuckDB on the same data —
the analogue of the reference's integration/compatibility generator
(/root/reference/integration/compatibility/generate.py, which records
golden answers from redis-stack; here the oracle is DuckDB per
BASELINE.json)."""

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from valkey_search_spark import NumericField, SearchEngine, TagField, TextField

SF = "/root/testdata/sf0.001"
BRANDS = [f"Brand#{i}" for i in (13, 23, 34, 42, 55)]
SIZES = [(1, 10), (5, 25), (20, 40), (35, 50)]
PRICES = [(900, 905), (903, 910), (905, 915), (910, 920)]


def _gen_leaves(rng):
    kind = rng.choice(["tag", "tag2", "num", "num_excl", "text"])
    if kind == "tag":
        b = rng.choice(BRANDS)
        return f"@p_brand:{{{b}}}", f"p_brand = '{b}'"
    if kind == "tag2":
        b1, b2 = rng.sample(BRANDS, 2)
        return (f"@p_brand:{{{b1}|{b2}}}", f"p_brand IN ('{b1}','{b2}')")
    if kind == "num":
        lo, hi = rng.choice(PRICES)
        return (f"@p_retailprice:[{lo} {hi}]",
                f"p_retailprice BETWEEN {lo} AND {hi}")
    if kind == "num_excl":
        lo, hi = rng.choice(SIZES)
        return (f"@p_size:[({lo} {hi}]", f"p_size > {lo} AND p_size <= {hi}")
    w = rng.choice(["widget", "bolt", "anvil", "plate"])
    return (f"@p_name:{w}",
            f"regexp_matches(p_name, '(^|[^a-z0-9_]){w}([^a-z0-9_]|$)')")


def _gen_query(rng, depth=0):
    roll = rng.random()
    if depth >= 2 or roll < 0.45:
        return _gen_leaves(rng)
    if roll < 0.65:  # AND
        (q1, s1), (q2, s2) = _gen_query(rng, depth + 1), _gen_query(rng, depth + 1)
        return f"({q1} {q2})", f"({s1} AND {s2})"
    if roll < 0.85:  # OR
        (q1, s1), (q2, s2) = _gen_query(rng, depth + 1), _gen_query(rng, depth + 1)
        return f"({q1}|{q2})", f"({s1} OR {s2})"
    q1, s1 = _gen_query(rng, depth + 1)
    return f"-{q1}", f"NOT ({s1})"


CASES = [
    # fixed unparenthesized-precedence cases: AND binds tighter than OR,
    # NOT tighter than OR (dialect-2 convention)
    ("@p_brand:{Brand#13} @p_size:[1 10]|@p_brand:{Brand#42}",
     "(p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 10)"
     " OR p_brand = 'Brand#42'"),
    ("@p_brand:{Brand#13}|@p_brand:{Brand#42} @p_size:[1 10]",
     "p_brand = 'Brand#13'"
     " OR (p_brand = 'Brand#42' AND p_size BETWEEN 1 AND 10)"),
    ("-@p_brand:{Brand#13}|@p_brand:{Brand#42}",
     "NOT (p_brand = 'Brand#13') OR p_brand = 'Brand#42'"),
]
_rng = random.Random(20260813)
for i in range(60):
    CASES.append(_gen_query(_rng))


@pytest.fixture(scope="module")
def eng(spark):
    e = SearchEngine(spark)
    e.ft_create("parts", spark.read.parquet(f"{SF}/part.parquet"),
                [TagField("p_brand"), NumericField("p_retailprice"),
                 NumericField("p_size"), TextField("p_name")],
                key_column="p_partkey", cache=True)
    return e


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW part AS SELECT * FROM '{SF}/part.parquet'")
    return con


@pytest.mark.parametrize("query,sql", CASES,
                         ids=[f"case{i}" for i in range(len(CASES))])
def test_filter_algebra_corpus(eng, duck, query, sql):
    got = {r["p_partkey"] for r in
           eng.ft_search("parts", query, limit=(0, 10**9))
           .select("p_partkey").collect()}
    want = {r[0] for r in duck.execute(
        f"SELECT p_partkey FROM part WHERE {sql}").fetchall()}
    assert got == want, f"query={query!r} sql={sql!r}"


# -- aggregate corpus: GROUPBY x reducer combinatorics ----------------------
REDUCERS = [
    ("COUNT 0", "CAST(count(*) AS DOUBLE)"),
    ("SUM 1 @p_retailprice", "sum(p_retailprice)"),
    ("AVG 1 @p_retailprice", "avg(p_retailprice)"),
    ("MIN 1 @p_retailprice", "min(p_retailprice)"),
    ("MAX 1 @p_retailprice", "max(p_retailprice)"),
    ("COUNT_DISTINCT 1 @p_size", "CAST(count(DISTINCT p_size) AS DOUBLE)"),
]

AGG_CASES = []
_arng = random.Random(42)
for i in range(20):
    n = _arng.randint(1, 3)
    reds = _arng.sample(REDUCERS, n)
    fq, fs = _gen_leaves(_arng)
    stages = " ".join(f"REDUCE {r} AS r{j}" for j, (r, _) in enumerate(reds))
    sql_aggs = ", ".join(f"ROUND({s}, 4) AS r{j}" for j, (_, s) in enumerate(reds))
    AGG_CASES.append((fq, f"GROUPBY 1 @p_brand {stages}",
                      f"SELECT p_brand, {sql_aggs} FROM part WHERE {fs}"
                      " GROUP BY p_brand"))


# -- expression corpus: random arithmetic trees over a positive field ------
def _gen_expr(rng, depth=0):
    """(engine_expr, duckdb_expr) staying in a positive, finite domain."""
    if depth >= 3 or rng.random() < 0.35:
        if rng.random() < 0.5:
            v = rng.choice([2, 3, 5, 10, 100])
            return str(v), str(v)
        return "@p_retailprice", "p_retailprice"     # in [900, 920)
    roll = rng.random()
    a, da = _gen_expr(rng, depth + 1)
    if roll < 0.2:
        b, db = _gen_expr(rng, depth + 1)
        return f"({a} + {b})", f"({da} + {db})"
    if roll < 0.4:
        b, db = _gen_expr(rng, depth + 1)
        return f"({a} * {b})", f"({da} * {db})"
    if roll < 0.55:
        b, db = _gen_expr(rng, depth + 1)
        return f"({a} / ({b} + 1))", f"({da} / ({db} + 1))"   # denom > 0
    fn = rng.choice(["abs", "floor", "ceil", "sqrt", "log", "log2", "exp"])
    if fn == "exp":
        return f"exp({a} / 1000000)", f"exp(({da}) / 1000000)"
    dfn = {"log": "ln", "log2": "log2"}.get(fn, fn)
    return f"{fn}({a})", f"{dfn}(({da}))"


EXPR_CASES = []
_erng = random.Random(7)
for i in range(25):
    EXPR_CASES.append(_gen_expr(_erng))


@pytest.mark.parametrize("expr,dexpr", EXPR_CASES,
                         ids=[f"expr{i}" for i in range(len(EXPR_CASES))])
def test_expression_corpus(eng, duck, expr, dexpr):
    df = eng.ft_aggregate(
        "parts", "*",
        f'APPLY "{expr}" AS v GROUPBY 1 @p_brand REDUCE SUM 1 @v AS s')
    got = {(r["p_brand"], round(r["s"], 2)) for r in df.collect()}
    want = {(r[0], round(r[1], 2)) for r in duck.execute(
        f"SELECT p_brand, sum({dexpr}) FROM part GROUP BY 1").fetchall()}
    assert got == want, f"expr={expr!r}"


@pytest.mark.parametrize("fq,stages,sql", AGG_CASES,
                         ids=[f"agg{i}" for i in range(len(AGG_CASES))])
def test_aggregate_corpus(eng, duck, fq, stages, sql):
    df = eng.ft_aggregate("parts", fq, stages)
    rcols = [c for c in df.columns if c.startswith("r")]
    got = {tuple(r) for r in
           df.select("p_brand", *[F.round(F.col(c), 4).alias(c) for c in rcols])
           .collect()}
    want = {tuple(r) for r in duck.execute(sql).fetchall()}
    assert got == want, f"filter={fq!r} stages={stages!r}"


# -- string-function corpus: substr over real data, reference C semantics ---
def _ref_substr(s: str, off: int, ln: int) -> str:
    """FuncSubstr reimplemented from value.cc:534-565 as the golden
    oracle: byte offsets, negative offset wraps from the end, negative
    length truncates the remainder."""
    b = s.encode()
    size = len(b)
    if off < 0:
        off += size
    eff = (size - off) + ln if ln < 0 else ln
    if off < 0 or off >= size or eff <= 0:
        return ""
    return b[off:off + eff].decode(errors="replace")


SUBSTR_ARGS = [(0, 3), (2, 100), (5, -1), (-4, 2), (-100, 3), (3, -10),
               (-1, 1), (0, -2)]


@pytest.mark.parametrize("off,ln", SUBSTR_ARGS,
                         ids=[f"substr_{o}_{l}" for o, l in SUBSTR_ARGS])
def test_substr_corpus(eng, duck, off, ln):
    df = eng.ft_aggregate(
        "parts", "*",
        f'LOAD 1 @p_partkey APPLY "substr(@p_name, {off}, {ln})" AS v')
    got = {(r["p_partkey"], r["v"]) for r in df.collect()}
    want = {(k, _ref_substr(n, off, ln)) for k, n in duck.execute(
        "SELECT p_partkey, p_name FROM part").fetchall()}
    assert got == want
