"""robots.txt compliance — the crawl-side opt-out gate.

A responsible corpus pipeline drops pages whose host's robots.txt
disallows them (alongside the page-level ``html_meta_robots_col``
opt-out). This module parses a robots corpus (one robots.txt body per
host — what a crawler's fetch layer already has) and gates documents
by RFC 9309 semantics:

- group selection: the most specific matching ``User-agent`` group
  (longest agent-token match; ``*`` is the fallback), case-insensitive,
- rule matching: longest-match wins between Allow and Disallow;
  equal-length ties go to Allow; empty-pattern Disallow means
  allow-all; ``*`` wildcards and the ``$`` end anchor supported,
- no robots.txt for a host = allowed (the web's default).

Shape at 100 TB: robots bodies PARSE once into a compact per-host rule
frame (map-only Arrow pass over the robots corpus — tiny next to the
page corpus), then the gate is one broadcast join host->rules + one
Arrow verdict map over (path, rules) pairs. The page corpus never
shuffles.

Reference analogue: none (beyond-reference operator per SURVEY.md
§2.10; compliance sits upstream of any index).
"""
from __future__ import annotations

from functools import lru_cache as _lru_cache
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

_RULES_SCHEMA = T.StructType([
    T.StructField("host", T.StringType()),
    T.StructField("rules", T.ArrayType(T.StructType([
        T.StructField("allow", T.BooleanType()),
        T.StructField("pattern", T.StringType()),
    ]))),
])


def _parse_robots_body(body: str, agent: str) -> list[tuple[bool, str]]:
    """The (allow, pattern) rules of the most specific matching group.
    Group = consecutive User-agent lines + their rules."""
    agent = agent.lower()
    groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[bool, str]] = []
    in_agent_run = False
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not in_agent_run:
                if cur_agents:
                    groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules = [], []
                in_agent_run = True
            cur_agents.append(val.lower())
        elif key in ("allow", "disallow"):
            in_agent_run = False
            cur_rules.append((key == "allow", val))
        else:
            in_agent_run = False          # crawl-delay/sitemap etc.
    if cur_agents:
        groups.append((cur_agents, cur_rules))
    # most specific agent token: longest agent name that is a
    # substring of ours; '*' matches with specificity 0. ALL groups at
    # the winning specificity merge (RFC 9309 §2.2.1 — duplicate
    # 'User-agent: *' groups are routine in real robots files and
    # every rule of every matching group must apply)
    def spec(agents):
        s = -1
        for a in agents:
            if a == "*":
                s = max(s, 0)
            elif a and a in agent:
                s = max(s, len(a))
        return s

    specs = [spec(agents) for agents, _ in groups]
    best_len = max(specs, default=-1)
    if best_len < 0:
        return []
    merged: list[tuple[bool, str]] = []
    for s, (_, rules) in zip(specs, groups):
        if s == best_len:
            merged.extend(rules)
    return merged


@_lru_cache(maxsize=65536)
def _compiled(pattern: str):
    """Compiled matcher for one rule pattern, memoized per process —
    the gate evaluates (page x rule) pairs, so the translate/compile
    must not re-run per row. Consecutive '*' collapse (they compile to
    chained '.*' whose backtracking is the classic stall)."""
    import re

    anchored = pattern.endswith("$")
    core = pattern[:-1] if anchored else pattern
    core = re.sub(r"\*{2,}", "*", core)
    rx = "".join(".*" if ch == "*" else re.escape(ch) for ch in core)
    return re.compile("^" + rx + ("$" if anchored else ""))


def _pattern_matches(pattern: str, path: str) -> int:
    """RFC 9309 match: returns the pattern length (specificity) when it
    matches, -1 otherwise. '*' = any run, '$' = end anchor."""
    if pattern == "":
        return -1                          # empty rule: no effect
    return len(pattern) if _compiled(pattern).match(path) else -1


def _allowed(path: str, rules) -> bool:
    best_len, best_allow = -1, True
    for r in rules:
        allow = r["allow"] if isinstance(r, dict) else r[0]
        pattern = r["pattern"] if isinstance(r, dict) else r[1]
        ln = _pattern_matches(pattern, path)
        if ln > best_len or (ln == best_len and allow and not best_allow):
            if ln >= 0:
                best_len, best_allow = ln, allow
    return best_allow if best_len >= 0 else True


def parse_robots(robots_df: DataFrame, host_col: str = "host",
                 body_col: str = "robots_txt",
                 agent: str = "*") -> DataFrame:
    """(host, rules) frame from a robots corpus — one Arrow map over
    the (tiny) robots side; feed to ``robots_gate``. Hosts
    deduplicate FIRST (refetches are routine in crawl fetch tables;
    which fetch survives is unspecified) — a duplicated host would
    multiply page rows through the gate's join."""
    cols = [host_col, body_col]
    robots_df = robots_df.dropDuplicates([host_col])

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for host, body in zip(pdf[host_col], pdf[body_col]):
                rules = _parse_robots_body(body or "", agent)
                out.append({"host": (host or "").lower(),
                            "rules": [{"allow": a, "pattern": p}
                                      for a, p in rules]})
            yield pd.DataFrame(out, columns=["host", "rules"])

    return robots_df.select(*cols).mapInPandas(go, _RULES_SCHEMA)


def robots_gate(df: DataFrame, rules_df: DataFrame,
                url_col: str = "url",
                keep_allowed: bool = True) -> DataFrame:
    """Filter ``df`` to pages their host's robots.txt allows (or the
    complement with ``keep_allowed=False``). One broadcast join on the
    host + one Arrow verdict map; hosts absent from ``rules_df`` are
    allowed."""
    from .urlops import host_col as _host, path_col as _path, query_col

    u = F.col(url_col)
    q = query_col(u)
    full_path = F.concat(
        F.when(_path(u) == "", F.lit("/")).otherwise(_path(u)),
        F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q)))
    side = (rules_df.withColumnRenamed("host", "__host")
                    .withColumnRenamed("rules", "__rules"))
    tagged = (df.withColumn("__host", _host(u))
                .withColumn("__path", full_path)
                .join(F.broadcast(side), "__host", "left"))

    @F.pandas_udf(T.BooleanType())
    def verdict(paths: pd.Series, rules: pd.Series) -> pd.Series:
        return pd.Series([
            True if rs is None or (hasattr(rs, "__len__") and len(rs) == 0)
            else _allowed(p, rs)
            for p, rs in zip(paths, rules)])

    out = tagged.withColumn("__ok", verdict(F.col("__path"),
                                            F.col("__rules")))
    keep = F.col("__ok") if keep_allowed else ~F.col("__ok")
    return out.where(keep).drop("__host", "__path", "__ok", "__rules")
