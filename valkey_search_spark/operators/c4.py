"""C4-style line-level cleanup — the published heuristics between raw
page text and document-level quality gates (Raffel et al., C4;
variants in MassiveText/RefinedWeb).

Line rules (each a flag, conjunction = keep):
- ends in terminal punctuation (. ! ? or an end quotation mark,
  optionally followed by closing quotes/brackets — the published
  "sentence line" rule),
- at least ``min_words`` words (C4 uses 3 as the page-level sentence
  count; 5 words/line is the common line rule — both configurable),
- no blocklisted phrase (javascript-required notices, cookie/privacy
  boilerplate).

Page rules after line filtering:
- at least ``min_kept_lines`` surviving lines,
- pages containing any ``page_blocklist`` phrase drop ENTIRELY — the
  defaults are "lorem ipsum" and the C4 curly-brace rule (a "{"
  anywhere marks leaked code/markup and discards the page; extend the
  tuple with a bad-words list for the original's obscenity filter).

Everything is ONE map-only codegen scan: lines stage as a split array,
per-line predicates run inside a single ``F.filter`` lambda over it,
and the page verdict is arithmetic on the staged arrays — no Python,
no shuffle, no explode (the rebuild is array_join, so no
Generate-re-evaluation hazard either).

Deviation note: C4's original langdetect/bad-words steps live in this
repo as ``textops.lang_id_col`` and the quality gates; this module is
the line-shape subset, pinned against an independent scalar
implementation of the published rules.

Reference analogue: none (beyond-reference operator per SURVEY.md
§2.10).
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# phrases whose presence disqualifies a LINE (case-insensitive)
LINE_BLOCKLIST = (
    "javascript", "cookie policy", "cookies enabled", "privacy policy",
    "terms of use", "all rights reserved", "read more", "click here",
)
# phrases that disqualify the whole PAGE
PAGE_BLOCKLIST = ("lorem ipsum", "{")

# terminal = . ! ? OR a bare end quotation mark (the published rule),
# optionally followed by up to two closing quotes/brackets
_TERMINAL = "[.!?\"”'’][\"'”’)\\]]{0,2}$"
_EDGE_WS = "^[\\s\\p{Z}]+|[\\s\\p{Z}]+$"   # F.trim is ASCII-space-only


def _wtrim(col: Column) -> Column:
    return F.regexp_replace(col, _EDGE_WS, "")


def _line_ok(line: Column, min_words: int, blocklist) -> Column:
    words = F.filter(F.split(_wtrim(line), "[\\s\\p{Z}]+"),
                     lambda w: w != F.lit(""))
    ok = (F.size(words) >= min_words) & \
        _wtrim(line).rlike(_TERMINAL)
    low = F.lower(line)
    for phrase in blocklist:
        ok = ok & ~low.contains(phrase)
    return ok


def c4_line_flags(df: DataFrame, text_col: str = "text",
                  min_words: int = 5,
                  min_kept_lines: int = 3,
                  line_blocklist=LINE_BLOCKLIST,
                  page_blocklist=PAGE_BLOCKLIST) -> DataFrame:
    """Add ``text_c4`` (the line-filtered text), ``c4_lines_kept`` /
    ``c4_lines_total``, and ``c4_keep_page`` — one map-only scan."""
    from .dedup import _parallelize

    df = _parallelize(df)        # spread 1-task scans; no-op at scale
    # stage the split ONCE (referenced twice below — CollapseProject
    # would otherwise inline two split() copies into the map stage)
    staged = df.withColumn("__lines", F.split(F.col(text_col), "\n"))
    kept = F.filter(F.col("__lines"),
                    lambda ln: _line_ok(ln, min_words, line_blocklist))
    out = (staged.withColumn("__kept", kept)
           .withColumn("c4_lines_total", F.size(F.col("__lines")))
           .withColumn("c4_lines_kept", F.size(F.col("__kept")))
           .withColumn("text_c4",
                       F.array_join(F.transform(F.col("__kept"),
                                                _wtrim), "\n"))
           .drop("__kept", "__lines"))
    page_ok = F.col("c4_lines_kept") >= min_kept_lines
    low = F.lower(F.col(text_col))
    for phrase in page_blocklist:
        page_ok = page_ok & ~low.contains(phrase)
    return out.withColumn("c4_keep_page",
                          F.coalesce(page_ok, F.lit(False)))


def c4_clean(df: DataFrame, text_col: str = "text",
             **kwargs) -> DataFrame:
    """The composed filter: pages that survive, with ``text_col``
    REPLACED by the line-filtered text (the C4 output shape)."""
    flagged = c4_line_flags(df, text_col, **kwargs)
    return (flagged.where(F.col("c4_keep_page"))
            .withColumn(text_col, F.col("text_c4"))
            .drop("text_c4", "c4_lines_kept", "c4_lines_total",
                  "c4_keep_page"))
