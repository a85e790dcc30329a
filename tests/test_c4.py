"""C4 line filters: independent scalar implementation of the published
rules as the oracle, pinned edge cases, map-only plan."""
from __future__ import annotations

import re

import pytest

from pyspark.sql import functions as F

from valkey_search_spark.operators.c4 import (LINE_BLOCKLIST,
                                              PAGE_BLOCKLIST, c4_clean,
                                              c4_line_flags)


def _scalar_c4(text: str, min_words=5, min_kept=3):
    kept = []
    for ln in text.split("\n"):
        t = ln.strip()
        words = t.split()
        if len(words) < min_words:
            continue
        if not re.search(r"[.!?\"”'’][\"'”’)\]]{0,2}$", t):
            continue
        low = ln.lower()
        if any(p in low for p in LINE_BLOCKLIST):
            continue
        kept.append(t)
    page_ok = len(kept) >= min_kept and \
        not any(p in text.lower() for p in PAGE_BLOCKLIST)
    return "\n".join(kept), page_ok


_GOOD = "This is a proper sentence with enough words."
_LINES = [
    _GOOD,
    'He said "this line ends with a bare quote"',   # end-quote terminal
    "\tGood sentence padded with a tab ends here.\t",  # unicode trim
    "Another complete sentence sits right here today.",
    "And a third full sentence closes the page out!",
    "too short.",                           # < 5 words
    "No terminal punctuation on this line here",
    "Please enable javascript to view this content.",   # blocklist
    "Copyright 2026 all rights reserved by the site.",  # blocklist
    "menu",
]


def _page(i: int) -> str:
    n = 1 + i % 7
    return "\n".join(_LINES[(i + j * 3) % len(_LINES)]
                     for j in range(n))


def test_matches_scalar_reference(spark):
    rows = [(i, _page(i)) for i in range(300)]
    df = spark.createDataFrame(rows, "k long, text string")
    got = {r.k: (r.text_c4, r.c4_keep_page)
           for r in c4_line_flags(df).collect()}
    for k, raw in rows:
        assert got[k] == _scalar_c4(raw), (k, raw)


def test_page_rules(spark):
    three_good = "\n".join(_LINES[:3])
    df = spark.createDataFrame([
        (1, three_good),
        (2, "\n".join(_LINES[:2])),              # only 2 kept lines
        (3, three_good + "\nlorem ipsum dolor"),  # page blocklist
        (4, three_good + "\nif (x) { return; }"),  # brace page
        (5, None),
    ], "k long, text string")
    out = {r.k: r.c4_keep_page for r in c4_line_flags(df).collect()}
    assert out == {1: True, 2: False, 3: False, 4: False, 5: False}
    cleaned = c4_clean(df)
    rows = cleaned.collect()
    assert [r.k for r in rows] == [1]
    assert rows[0].text == _scalar_c4(three_good)[0]   # trimmed lines
    assert "text_c4" not in cleaned.columns


def test_counts_and_custom_thresholds(spark):
    df = spark.createDataFrame([(1, "\n".join(_LINES))],
                               "k long, text string")
    r = c4_line_flags(df).first()
    assert r.c4_lines_total == len(_LINES)
    assert r.c4_lines_kept == 5
    # loosened thresholds admit the 2-word "too short." line
    r2 = c4_line_flags(df, min_words=2, min_kept_lines=4).first()
    assert r2.c4_lines_kept == 6 and r2.c4_keep_page


def test_plan_map_only(spark):
    df = spark.createDataFrame([(1, _GOOD)], "k long, text string")
    plan = c4_line_flags(df) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "EvalPython" not in plan
    assert "Generate" not in plan            # no explode: array ops only
