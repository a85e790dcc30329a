"""FT.AGGREGATE stages + expression language vs DuckDB oracle at sf0.001.

Mirrors the reference's testing/ft_aggregate_exec_test.cc +
testing/expr/{expr,value}_test.cc semantics (SURVEY.md §5.1) via the
golden-answer-against-oracle pattern (§5.3).
"""

from __future__ import annotations

import math

import duckdb
import pytest

from valkey_search_spark import NumericField, SearchEngine, TagField, TextField

from .conftest import SF_DIR, load


@pytest.fixture(scope="module")
def eng(spark, sf_dir):
    e = SearchEngine(spark)
    e.ft_create(
        "li",
        load(spark, sf_dir, "lineitem"),
        [TagField("l_returnflag"), TagField("l_linestatus"),
         NumericField("l_quantity"), NumericField("l_extendedprice"),
         NumericField("l_discount"), NumericField("l_shipdate")],
        key_column="l_orderkey",
    )
    e.ft_create(
        "ords",
        load(spark, sf_dir, "orders"),
        [TagField("o_orderstatus"), TagField("o_orderpriority"),
         NumericField("o_totalprice"), NumericField("o_orderdate")],
        key_column="o_orderkey",
    )
    return e


def duck_rows(sql: str):
    sql = sql.replace("LINEITEM", f"'{SF_DIR}/lineitem.parquet'")
    sql = sql.replace("ORDERS", f"'{SF_DIR}/orders.parquet'")
    return duckdb.sql(sql).fetchall()


def norm(rows, ndigits=4):
    out = set()
    for r in rows:
        vals = []
        for v in r:
            if isinstance(v, float):
                vals.append(round(v, ndigits))
            else:
                vals.append(v)
        out.add(tuple(vals))
    return out


def test_groupby_all_reducers(eng):
    df = eng.ft_aggregate(
        "li", "*",
        'APPLY "@l_extendedprice*(1-@l_discount)" AS dp '
        "GROUPBY 2 @l_returnflag @l_linestatus "
        "REDUCE COUNT 0 AS n REDUCE SUM 1 @l_quantity AS sum_qty "
        "REDUCE AVG 1 @l_discount AS avg_disc REDUCE SUM 1 @dp AS revenue "
        "REDUCE MIN 1 @l_extendedprice AS min_p REDUCE MAX 1 @l_extendedprice AS max_p "
        "REDUCE STDDEV 1 @l_quantity AS sd REDUCE COUNT_DISTINCT 1 @l_quantity AS nq",
    )
    got = norm([tuple(r) for r in df.collect()], 2)
    want = norm(duck_rows(
        "SELECT l_returnflag, l_linestatus, CAST(count(*) AS DOUBLE) n,"
        " sum(l_quantity) sum_qty, avg(l_discount) avg_disc,"
        " sum(l_extendedprice*(1-l_discount)) revenue,"
        " min(l_extendedprice) min_p, max(l_extendedprice) max_p,"
        " stddev_samp(l_quantity) sd, CAST(count(DISTINCT l_quantity) AS DOUBLE) nq"
        " FROM LINEITEM GROUP BY 1, 2"), 2)
    assert got == want


def test_filter_stage_and_sortby_max(eng):
    df = eng.ft_aggregate(
        "ords", "*",
        'FILTER "@o_totalprice > 100000" '
        "GROUPBY 1 @o_orderpriority REDUCE COUNT 0 AS n "
        "SORTBY 2 @n DESC MAX 3",
    )
    got = [(r.o_orderpriority, r.n) for r in df.collect()]
    want = [tuple(r) for r in duck_rows(
        "SELECT o_orderpriority, CAST(count(*) AS DOUBLE) n FROM ORDERS"
        " WHERE o_totalprice > 100000 GROUP BY 1 ORDER BY n DESC, o_orderpriority"
        " LIMIT 3")]
    # ties on n possible: compare as sets of counts + same priorities chosen
    assert norm(got) == norm(want)


def test_limit_offset(eng):
    df = eng.ft_aggregate(
        "ords", "*",
        "GROUPBY 1 @o_orderstatus REDUCE COUNT 0 AS n SORTBY 2 @n DESC LIMIT 1 2",
    )
    rows = df.collect()
    assert len(rows) == 2


def test_apply_arithmetic_quirks(eng, spark):
    df = eng.ft_aggregate(
        "li", "@l_quantity:[1 1]",
        'APPLY "@l_quantity/0" AS div0 APPLY "@l_quantity^2" AS sq '
        'APPLY "-@l_quantity + 10" AS neg LIMIT 0 1',
    )
    r = df.collect()[0]
    assert math.isnan(r.div0)      # /0 -> NaN, not NULL (value.cc:351-363)
    assert r.sq == 1.0
    assert r.neg == 9.0


def test_time_functions(eng):
    df = eng.ft_aggregate(
        "ords", "*",
        'APPLY "year(@o_orderdate)" AS y APPLY "month(@o_orderdate)" AS m0 '
        'APPLY "dayofweek(@o_orderdate)" AS dw APPLY "dayofyear(@o_orderdate)" AS dy '
        'APPLY "hour(@o_orderdate)" AS h '
        "GROUPBY 5 @y @m0 @dw @dy @h REDUCE COUNT 0 AS n",
    )
    got = norm([tuple(r) for r in df.collect()])
    want = norm(duck_rows(
        "SELECT CAST(year(o_orderdate) AS DOUBLE) y,"
        " CAST(month(o_orderdate)-1 AS DOUBLE) m0,"          # 0-based month
        " CAST(dayofweek(o_orderdate) AS DOUBLE) dw,"        # duckdb: 0=Sunday
        " CAST(dayofyear(o_orderdate)-1 AS DOUBLE) dy,"      # 0-based
        " CAST(hour(o_orderdate) AS DOUBLE) h,"
        " CAST(count(*) AS DOUBLE) n FROM ORDERS GROUP BY 1,2,3,4,5"))
    assert got == want


def test_string_functions(eng):
    df = eng.ft_aggregate(
        "ords", "*",
        'APPLY "upper(@o_orderpriority)" AS up APPLY "strlen(@o_orderpriority)" AS sl '
        'APPLY "substr(@o_orderpriority, 0, 3)" AS s3 '
        'APPLY "contains(@o_orderpriority, \'e\')" AS ce '
        'APPLY "concat(@o_orderstatus, \'-\', @o_orderpriority)" AS cc '
        "GROUPBY 5 @up @sl @s3 @ce @cc REDUCE COUNT 0 AS n",
    )
    got = norm([tuple(r) for r in df.collect()])
    want = norm(duck_rows(
        "SELECT upper(o_orderpriority) up, CAST(strlen(o_orderpriority) AS DOUBLE) sl,"
        " substr(o_orderpriority, 1, 3) s3,"
        " CAST((strlen(o_orderpriority) - strlen(replace(o_orderpriority,'e','')))"
        "   AS DOUBLE) ce,"
        " o_orderstatus || '-' || o_orderpriority cc,"
        " CAST(count(*) AS DOUBLE) n FROM ORDERS GROUP BY 1,2,3,4,5"))
    assert got == want


def test_exists_and_comparison_semantics(eng):
    # exists() on a present field -> 1; missing field -> Nil==Nil comparisons
    df = eng.ft_aggregate(
        "ords", "*",
        'APPLY "exists(@o_totalprice)" AS e1 APPLY "exists(@nope)" AS e0 '
        'APPLY "@nope == @nope" AS nilnil APPLY "@nope < @o_totalprice" AS unord '
        "LIMIT 0 1",
    )
    r = df.collect()[0]
    assert r.e1 == 1.0
    assert r.e0 == 0.0
    assert r.nilnil is True        # Nil==Nil EQUAL (value.cc:271-319)
    assert r.unord is False        # UNORDERED -> false


def test_count_distinct_exact(eng):
    df = eng.ft_aggregate("ords", "*",
                          "GROUPBY 0 REDUCE COUNT_DISTINCT 1 @o_orderpriority AS d")
    assert df.collect()[0].d == duck_rows(
        "SELECT count(DISTINCT o_orderpriority) FROM ORDERS")[0][0]


def test_avg_empty_is_zero(eng):
    # AVG over empty set -> 0.0 not NULL (ft_aggregate_exec.cc:296-309)
    df = eng.ft_aggregate("ords", "@o_totalprice:[999999999 inf]",
                          "GROUPBY 0 REDUCE AVG 1 @o_totalprice AS a"
                          " REDUCE SUM 1 @o_totalprice AS s")
    rows = df.collect()
    # empty input: no groups at all (reference: GROUPBY 0 with no rows -> no record)
    if rows:
        assert rows[0].a == 0.0 and rows[0].s == 0.0


def test_groupby_numeric_field(eng):
    df = eng.ft_aggregate(
        "li", "*",
        "GROUPBY 1 @l_quantity REDUCE COUNT 0 AS n SORTBY 2 @l_quantity ASC MAX 5",
    )
    got = [(r.l_quantity, r.n) for r in df.collect()]
    want = [tuple(r) for r in duck_rows(
        "SELECT l_quantity, CAST(count(*) AS DOUBLE) FROM LINEITEM"
        " GROUP BY 1 ORDER BY 1 LIMIT 5")]
    assert got == want


def test_load_as_alias_binds_record_slot(eng):
    """LOAD f AS g: later stages see @g with f's value; the count argument
    counts RESP tokens incl. AS (ft_aggregate_parser.cc:252)."""
    df = eng.ft_aggregate(
        "li", "*",
        'LOAD 4 @l_quantity AS qty @l_returnflag '
        'FILTER "@qty >= 49" GROUPBY 1 @l_returnflag '
        "REDUCE MAX 1 @qty AS mq")
    rows = {r["l_returnflag"]: r["mq"] for r in df.collect()}
    assert rows and all(v >= 49 for v in rows.values())
    assert set(df.columns) == {"l_returnflag", "mq"}


def test_load_alias_field_count_is_token_count(eng):
    # LOAD 3 @a AS b consumes exactly the 3 counted tokens; a following
    # keyword must parse as the next clause, not a field
    df = eng.ft_aggregate(
        "li", "*", 'LOAD 3 @l_quantity AS qty FILTER "@qty >= 49"')
    assert df.columns == ["qty"]
    assert df.count() > 0


def test_min_max_polymorphic_compare(spark):
    """expr::Compare parity for MIN/MAX over STRING fields holding numeric
    text: '9' < '10' numerically (bytewise would give '10' as min)."""
    from pyspark.sql import Row
    from valkey_search_spark import SearchEngine, TagField

    df = spark.createDataFrame([
        Row(k=1, g="a", v="9"), Row(k=2, g="a", v="10"),
        Row(k=3, g="b", v="2"), Row(k=4, g="b", v="apple"),
    ])
    e = SearchEngine(spark)
    e.ft_create("polymm", df, [TagField("g")], key_column="k")
    out = {r["g"]: (r["lo"], r["hi"]) for r in e.ft_aggregate(
        "polymm", "*",
        "LOAD 2 @g @v GROUPBY 1 @g "
        "REDUCE MIN 1 @v AS lo REDUCE MAX 1 @v AS hi").collect()}
    assert out["a"] == ("9", "10")        # numeric ordering within tier
    assert out["b"] == ("2", "apple")     # numbers sort before words


def test_aggregate_command_level_slop_inorder(spark):
    """FT.AGGREGATE's search phase honors SLOP/INORDER exactly like
    FT.SEARCH (ft.aggregate.md command options)."""
    from pyspark.sql import Row
    from valkey_search_spark import SearchEngine, TextField

    df = spark.createDataFrame([
        Row(k="adj", body="alpha beta"),
        Row(k="far", body="alpha x1 x2 x3 x4 beta"),
        Row(k="rev", body="beta alpha"),
    ])
    e = SearchEngine(spark)
    e.ft_create("aggprox", df, [TextField("body")], key_column="k")
    out = e.ft_aggregate("aggprox", "alpha beta",
                         "GROUPBY 0 REDUCE COUNT 0 AS n",
                         slop=0, inorder=True)
    assert out.first()["n"] == 1.0       # only the adjacent in-order doc


def _ref_compare(l, r):
    """Pure-Python mirror of the reference's expr::Compare
    (/root/reference/src/expr/value.cc:271-319) for string values:
    numeric when BOTH convert to double, else bytewise strings."""
    def as_double(s):
        try:
            return float(s)
        except ValueError:
            return None
    ld, rd = as_double(l), as_double(r)
    if ld is not None and rd is not None:
        return -1 if ld < rd else (1 if ld > rd else 0)
    return -1 if l < r else (1 if l > r else 0)


def test_reference_minmax_compare_is_cyclic_so_tiering_is_the_oracle(spark):
    """The documented MIN/MAX divergence is not a parity gap the engine
    could close: the reference's pairwise comparator is NON-TRANSITIVE on
    mixed numeric/non-numeric strings ('5' < '30' numerically, '30' < '4a'
    bytewise, '4a' < '5' bytewise — a cycle), so its fold result depends
    on record iteration order. This test pins (a) the cycle in a faithful
    mirror of value.cc:271-319, (b) the order-dependence of the fold, and
    (c) that our two-tier total order returns ONE deterministic answer."""
    from functools import reduce

    from pyspark.sql import Row
    from valkey_search_spark import SearchEngine, TagField

    a, b, c = "5", "30", "4a"
    assert _ref_compare(a, b) < 0          # numeric: 5 < 30
    assert _ref_compare(b, c) < 0          # bytewise: '30' < '4a'
    assert _ref_compare(c, a) < 0          # bytewise: '4a' < '5'  (cycle!)

    def fold_min(vals):
        return reduce(lambda m, v: v if _ref_compare(m, v) > 0 else m, vals)

    assert fold_min([a, b, c]) != fold_min([b, c, a])   # order-dependent

    df = spark.createDataFrame(
        [Row(k=i, g="x", v=v) for i, v in enumerate([a, b, c])])
    e = SearchEngine(spark)
    e.ft_create("cyc", df, [TagField("g")], key_column="k")
    run = lambda: e.ft_aggregate(
        "cyc", "*", "LOAD 2 @g @v GROUPBY 1 @g REDUCE MIN 1 @v AS lo "
        "REDUCE MAX 1 @v AS hi").first()
    r1, r2 = run(), run()
    # deterministic two-tier answer: numeric tier first (5 < 30), text after
    assert (r1["lo"], r1["hi"]) == ("5", "4a")
    assert (r2["lo"], r2["hi"]) == (r1["lo"], r1["hi"])
