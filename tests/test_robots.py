"""robots.txt gate: RFC 9309 semantics pinned (longest match, allow
ties, wildcards, $ anchor, agent-group specificity), stdlib
urllib.robotparser as an independent oracle on the wildcard-free
subset, end-to-end gate over a URL corpus."""
from __future__ import annotations

import urllib.robotparser

import pytest

from valkey_search_spark.operators.robots import (_allowed,
                                                  _parse_robots_body,
                                                  parse_robots,
                                                  robots_gate)

_BODY = """
# comments ignored
User-agent: *
Disallow: /private
Allow: /private/ok
Disallow: /*.json$
Disallow: /tmp*
Allow: /page
Disallow: /page

User-agent: goodbot
Disallow:

User-agent: badbot
Disallow: /
"""


def _rules(agent="*"):
    return _parse_robots_body(_BODY, agent)


@pytest.mark.parametrize("path,want", [
    ("/", True),
    ("/private", False),
    ("/private/file", False),
    ("/private/ok/x", True),          # longer Allow wins
    ("/data/feed.json", False),       # * wildcard + $ anchor
    ("/data/feed.json?x=1", True),    # $ anchor: query breaks the match
    ("/tmpfiles/a", False),           # trailing *
    ("/page", True),                  # equal length: Allow wins the tie
])
def test_rfc_semantics(path, want):
    assert _allowed(path, _rules()) is want


def test_agent_group_selection():
    assert _allowed("/private", _rules("GoodBot/1.0")) is True
    assert _allowed("/anything", _rules("BadBot")) is False
    assert _allowed("/private", _rules("otherbot")) is False  # * group


def test_stdlib_robotparser_oracle():
    # stdlib RobotFileParser is FIRST-match-in-file-order (pre-RFC
    # semantics); listing the wildcard-free rules longest-first makes
    # first-match coincide with RFC longest-match, giving an
    # independent oracle over generated paths
    body = ("User-agent: *\nAllow: /a/b\nDisallow: /c/d\n"
            "Disallow: /a\nAllow: /c\nDisallow: /e\n")
    rp = urllib.robotparser.RobotFileParser()
    rp.parse(body.splitlines())
    rules = _parse_robots_body(body, "*")
    paths = ["/", "/a", "/a/", "/a/b", "/a/bc", "/a/b/c", "/ab",
             "/c", "/c/d", "/c/de", "/c/x", "/e", "/e/f", "/x"]
    for p in paths:
        assert _allowed(p, rules) == \
            rp.can_fetch("*", f"https://h.com{p}"), p


def test_gate_end_to_end(spark):
    robots = spark.createDataFrame([
        ("Site.com", "User-agent: *\nDisallow: /private\n"),
        ("other.com", "User-agent: *\nDisallow: /\nAllow: /pub\n"),
    ], "host string, robots_txt string")
    rules = parse_robots(robots)
    docs = spark.createDataFrame([
        (1, "https://site.com/ok"),
        (2, "https://SITE.com/private/x"),      # host case-folded
        (3, "https://other.com/pub/a?x=1"),
        (4, "https://other.com/secret"),
        (5, "https://norobots.com/anything"),   # no robots -> allowed
        (6, None),                              # null url -> allowed
    ], "k long, url string")
    kept = sorted(r.k for r in robots_gate(docs, rules).collect())
    assert kept == [1, 3, 5, 6]
    dropped = sorted(r.k for r in
                     robots_gate(docs, rules, keep_allowed=False)
                     .collect())
    assert dropped == [2, 4]
    # the rules frame is tiny and the join side broadcasts
    plan = robots_gate(docs, rules) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_empty_and_malformed_bodies(spark):
    assert _parse_robots_body("", "*") == []
    assert _parse_robots_body("garbage no colons\n<<>>", "*") == []
    assert _allowed("/x", []) is True
    # rules before any User-agent line are ignored (no group)
    assert _parse_robots_body("Disallow: /\n", "*") == []


def test_duplicate_star_groups_merge():
    # RFC 9309 2.2.1: every matching group's rules apply — duplicate
    # 'User-agent: *' groups are routine in real robots files
    body = "User-agent: *\nDisallow: /a\n\nUser-agent: *\nDisallow: /b\n"
    rules = _parse_robots_body(body, "*")
    assert _allowed("/a/x", rules) is False
    assert _allowed("/b/x", rules) is False
    assert _allowed("/c", rules) is True


def test_gate_survives_rules_column_and_dup_hosts(spark):
    robots = spark.createDataFrame(
        [("h.com", "User-agent: *\nDisallow: /no\n"),
         ("h.com", "User-agent: *\nDisallow: /no\n")],   # refetch
        "host string, robots_txt string")
    rules = parse_robots(robots)
    docs = spark.createDataFrame(
        [(1, "https://h.com/ok", "user-rules"),
         (2, "https://h.com/no/x", "user-rules")],
        "k long, url string, rules string")       # colliding column
    out = robots_gate(docs, rules).collect()
    assert [r.k for r in out] == [1]              # no row multiplication
    assert out[0].rules == "user-rules"           # user column intact


def test_gate_duckdb_oracle_real_corpus(spark, sf_dir):
    """DuckDB-replayable pin over the real documents table (the bench
    workload's shape): with the planted rule set, a doc's verdict is a
    pure function of (has-robots host?, path slot) — hosts site200+
    carry no robots.txt (allowed), and of the four synthesized paths
    /public/x and /private/ok/z pass (longest-match Allow beats the
    shorter Disallow) while /private/y and /data/f.json fail. The SQL
    CASE replays exactly that, making the Arrow verdict map
    independently checkable end-to-end (r12 rotation candidate)."""
    import duckdb

    from pyspark.sql import functions as F

    from valkey_search_spark.operators.robots import (parse_robots,
                                                      robots_gate)

    robots = spark.createDataFrame(
        [(f"site{i}.example.com",
          "User-agent: *\nDisallow: /private\n"
          "Allow: /private/ok\nDisallow: /*.json$\n")
         for i in range(200)], "host string, robots_txt string")
    rules = parse_robots(robots)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id")
    d = F.col("doc_id")
    urls = docs.select("doc_id", F.concat(
        F.lit("https://site"), (d % 300).cast("string"),
        F.lit(".example.com"),
        F.element_at(F.array(F.lit("/public/x"), F.lit("/private/y"),
                             F.lit("/private/ok/z"),
                             F.lit("/data/f.json")),
                     (d % 4 + 1).cast("int"))).alias("url"))
    got = sorted(r["doc_id"] for r in
                 robots_gate(urls, rules).select("doc_id").collect())
    want = sorted(r[0] for r in duckdb.sql(f"""
        SELECT doc_id FROM '{sf_dir}/documents.parquet'
        WHERE doc_id % 300 >= 200         -- no robots.txt -> allowed
           OR doc_id % 4 IN (0, 2)        -- /public/x, /private/ok/z
    """).fetchall())
    assert got == want and len(got) > 0
    # and the complement gate partitions the corpus exactly
    blocked = robots_gate(urls, rules, keep_allowed=False).count()
    assert blocked + len(got) == docs.count()
