"""URL/domain curation: DuckDB oracle parity for the canonicalizer,
pinned edge cases, dedup/filter/stats contracts, map-only plan shape."""
from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from valkey_search_spark.operators.urlops import (
    DEFAULT_TRACKING_PARAMS, domain_filter, domain_stats, host_col,
    normalize_url, parse_urls, registered_domain, url_dedup,
)

# ---------------------------------------------------------------------------
# deterministic URL corpus: every branch of the canonicalizer exercised,
# with on-purpose collisions (param order / fragment / default port /
# userinfo variants of the same canonical URL)

_HOSTS = ["Example.COM", "www.news.example.co.uk", "a.b.shop.com.au",
          "cdn.example.com", "192.168.0.1", "localhost",
          "Sub.Domain.ORG", "[2001:db8::1]"]
_TRACK = ["utm_source=tw", "utm_campaign=x", "fbclid=abc", "gclid=1",
          "_ga=2.3", "spm=a.b"]


def mk_url(i: int) -> str | None:
    if i % 19 == 18:
        return None
    if i % 19 == 17:
        return f"no scheme here {i}"
    scheme = ["http", "HTTPS", "https", "ftp"][i % 4]
    host = _HOSTS[i % len(_HOSTS)]
    user = "user:pw@" if i % 5 == 0 else ""
    port = ["", ":80", ":443", ":8080"][i % 4] if i % 3 == 0 else ""
    path = ["", "/", "/a/b", "/a/b/", "/p%20q"][i % 5]
    # two real params in i-dependent ORDER + one tracking param
    real = ["a=1", f"b={i % 3}"]
    if i % 2:
        real = real[::-1]
    params = real + ([_TRACK[i % len(_TRACK)]] if i % 3 != 1 else [])
    q = "?" + "&".join(params) if i % 7 != 6 else ""
    frag = f"#sec{i % 4}" if i % 2 == 0 else ""
    pad = "  " if i % 11 == 0 else ""
    return f"{pad}{scheme}://{user}{host}{port}{path}{q}{frag}{pad}"


_N = 600


@pytest.fixture(scope="module")
def urls_df(spark):
    return spark.createDataFrame(
        [(i, mk_url(i)) for i in range(_N)], "k long, url string")


def _oracle_norm():
    con = duckdb.connect()
    con.execute("CREATE TABLE urls (k BIGINT, url VARCHAR)")
    con.executemany("INSERT INTO urls VALUES (?, ?)",
                    [(i, mk_url(i)) for i in range(_N)])
    track_re = "^(" + "|".join(DEFAULT_TRACKING_PARAMS) + ")(=.*)?$"
    return con.sql(f"""
      WITH nf AS (
        SELECT k, regexp_replace(trim(url), '#.*$', '') AS u FROM urls
      ), p AS (
        SELECT k, u,
          lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
            AS scheme,
          regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)
            AS auth,
          regexp_extract(u,
            '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path0,
          regexp_extract(u, '\\?(.*)', 1) AS q
        FROM nf
      ), h AS (
        SELECT *,
          lower(regexp_extract(auth,
            '^(?:[^@/]*@)?(\\[[^\\]]*\\]|[^:]*)', 1)) AS host,
          regexp_extract(auth, ':([0-9]+)$', 1) AS port0
        FROM p
      ), c AS (
        SELECT k, scheme, host,
          CASE WHEN port0 = '' OR (scheme = 'http' AND port0 = '80')
                    OR (scheme = 'https' AND port0 = '443')
               THEN '' ELSE ':' || port0 END AS port,
          CASE WHEN path1 <> '/' AND path1 LIKE '%/'
               THEN substr(path1, 1, length(path1) - 1)
               ELSE path1 END AS path,
          list_sort(list_filter(string_split(q, '&'),
            x -> x <> '' AND NOT regexp_matches(x, '{track_re}'))) AS ps
        FROM (SELECT *, CASE WHEN path0 = '' THEN '/' ELSE path0 END
                AS path1 FROM h)
      )
      SELECT k, CASE WHEN scheme = '' THEN NULL
                ELSE scheme || '://' || host || port || path ||
                     CASE WHEN len(ps) = 0 THEN ''
                          ELSE '?' || array_to_string(ps, '&') END
                END AS norm
      FROM c ORDER BY k
    """).fetchall()


def test_normalize_matches_duckdb_oracle(spark, urls_df):
    got = (urls_df.select("k", normalize_url(F.col("url")).alias("norm"))
           .orderBy("k").collect())
    want = _oracle_norm()
    assert [(r.k, r.norm) for r in got] == want
    # the corpus really exercised both regimes
    norms = [r.norm for r in got]
    assert sum(n is None for n in norms) >= _N // 19
    assert len(set(n for n in norms if n)) < sum(1 for n in norms if n)


# ---------------------------------------------------------------------------
@pytest.mark.parametrize("raw,want", [
    ("  HTTP://User:pw@Example.COM:80/a/b/?utm_source=x&b=2&a=1#f  ",
     "http://example.com/a/b?a=1&b=2"),
    ("https://example.com", "https://example.com/"),
    ("https://example.com/?", "https://example.com/"),
    ("https://example.com:8443/x", "https://example.com:8443/x"),
    ("http://192.168.1.10:8080//x?z=1&y=2",
     "http://192.168.1.10:8080//x?y=2&z=1"),
    ("https://[2001:db8::1]:443/v6?a=1", "https://[2001:db8::1]/v6?a=1"),
    ("ftp://files.example.org/pub/", "ftp://files.example.org/pub"),
    ("not a url", None),
    ("/relative/path?x=1", None),
])
def test_normalize_pinned_cases(spark, raw, want):
    df = spark.createDataFrame([(raw,)], "url string")
    assert df.select(normalize_url(F.col("url")).alias("n")) \
             .first().n == want


def test_normalize_keep_params_and_www(spark):
    df = spark.createDataFrame(
        [("https://WWW.Example.com/p?id=7&page=2&sess=9&utm_source=x",)],
        "url string")
    n = df.select(normalize_url(
        F.col("url"), keep_params=["id", "page"], strip_www=True)
        .alias("n")).first().n
    assert n == "https://example.com/p?id=7&page=2"


@pytest.mark.parametrize("host,want", [
    ("example.com", "example.com"),
    ("a.b.cdn.example.com", "example.com"),
    ("www.news.example.co.uk", "example.co.uk"),
    ("shop.com.au", "shop.com.au"),          # 2 labels: kept whole
    ("a.shop.com.au", "shop.com.au"),
    ("localhost", "localhost"),
    ("192.168.0.1", "192.168.0.1"),          # IPv4 never split
    ("[2001:db8::1]", "[2001:db8::1]"),
])
def test_registered_domain(spark, host, want):
    df = spark.createDataFrame([(host,)], "h string")
    assert df.select(registered_domain(F.col("h")).alias("d")) \
             .first().d == want


def test_parse_urls_columns(spark, urls_df):
    out = parse_urls(urls_df).where(F.col("k") == 0).first()
    assert out.url_scheme == "http"
    assert out.url_host == "example.com"
    assert out.url_domain == "example.com"
    # absent parts are '' (not NULL) for parseable URLs
    row = parse_urls(spark.createDataFrame(
        [("https://x.com",)], "url string")).first()
    assert (row.url_path, row.url_query) == ("", "")


# ---------------------------------------------------------------------------
def test_url_dedup_collapses_equivalent_forms(spark):
    df = spark.createDataFrame([
        (1, "https://example.com/a?x=1&y=2"),
        (2, "https://EXAMPLE.com:443/a/?y=2&x=1#frag"),   # same canonical
        (3, "https://example.com/a?x=1&y=2&utm_source=t"),  # same
        (4, "https://example.com/a?x=1&y=3"),             # different
        (5, "junk"), (6, "junk"),          # unparseable: NEVER collapsed
    ], "k long, url string")
    out = {r.k: r.dup_count for r in url_dedup(df, "k").collect()}
    assert out == {1: 3, 4: 1, 5: 1, 6: 1}


def test_domain_filter_list_and_df_forms(spark):
    df = spark.createDataFrame([
        (1, "https://evil.com/x"), (2, "https://cdn.evil.com/y"),
        (3, "https://good.org/z"), (4, None),
        (5, "https://evilish.com/w"),       # suffix must NOT match
    ], "k long, url string")
    keep = lambda d: sorted(r.k for r in d.collect())  # noqa: E731
    assert keep(domain_filter(df, blocklist=["evil.com"])) == [3, 4, 5]
    assert keep(domain_filter(df, allowlist=["evil.com"])) == [1, 2]
    assert keep(domain_filter(
        df, blocklist=["evil.com"], match_subdomains=False)) == [2, 3, 4, 5]
    bl = spark.createDataFrame([("evil.com",)], "domain string")
    assert keep(domain_filter(df, blocklist=bl)) == [3, 4, 5]
    assert keep(domain_filter(df, allowlist=bl)) == [1, 2]
    with pytest.raises(ValueError):
        domain_filter(df)
    with pytest.raises(ValueError):
        domain_filter(df, blocklist=["a"], allowlist=["b"])


def test_domain_stats(spark, urls_df):
    out = domain_stats(urls_df.withColumn("text", F.lit("abc")),
                       text_col="text").collect()
    shares = sum(r.doc_share for r in out)
    assert shares == pytest.approx(1.0)
    byd = {r.domain: r for r in out}
    assert byd["example.com"].n_hosts == 2   # Example.COM + cdn.
    assert all(r.n_chars == 3 * r.n_docs for r in out)


# ---------------------------------------------------------------------------
def test_plan_is_map_only_jvm(spark, urls_df):
    plan = (parse_urls(urls_df)
            .withColumn("n", normalize_url(F.col("url")))
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan
    assert "EvalPython" not in plan          # no Python stage
    f_plan = (domain_filter(urls_df, blocklist=["evil.com"])
              ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in f_plan and "EvalPython" not in f_plan


def test_host_col_null_propagation(spark):
    df = spark.createDataFrame([(None,), ("x",)], "url string")
    rows = df.select(host_col(F.col("url")).alias("h"),
                     registered_domain(host_col(F.col("url"))).alias("d")) \
             .collect()
    assert rows[0].h is None and rows[0].d is None
    assert rows[1].h == "" and rows[1].d == ""
