"""Text analysis: the 4-stage TEXT ingestion pipeline as Spark columns.

Reference pipeline (docs/topics/search-data-formats.md:152-249;
/root/reference/src/indexes/text/lexer.cc):
  1. lexer — split on punctuation/whitespace, backslash escapes join
     punctuation into a token, must be valid UTF-8
  2. case folding (lower)
  3. stop-word removal (default RediSearch list)
  4. Snowball (Porter2) stemming, words >= MINSTEMSIZE, unless NOSTEM

Stages 1-3 are pure JVM-side Spark expressions (whole-stage codegen,
zero Python cost); stage 4 is an Arrow-batched pandas UDF (the only
unavoidable Python hop — stemming is procedural).

Token positions are assigned after stop-word removal — removed stop
words do not occupy a position (docs/topics/search-data-formats.md
"Stop Word Removal"; positions kept unless NOOFFSETS,
/root/reference/src/indexes/text/posting.h:72).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, functions as F, types as T

from .porter2 import porter2_stem

# Default stop-word list documented for the reference's text pipeline
# (docs/topics/search-data-formats.md, RediSearch-compatible default set).
DEFAULT_STOPWORDS: frozenset[str] = frozenset(
    """a is the an and are as at be but by for if in into it no not of on or
    such that their then there these they this to was will with""".split()
)

# A "word" is any run of characters that is neither punctuation nor
# whitespace/control; the punctuation set is configurable per index and
# operates on single bytes — multi-byte UTF-8 chars are never punctuation
# (docs/topics/search-data-formats.md "Lexical Analysis"). A backslash
# escape glues the following punctuation char into the token.
DEFAULT_PUNCTUATION = ",.<>{}[]\"':;!@#$%^&*()-+=~/\\|"


def _token_re(punctuation: str) -> str:
    cls = "".join("\\" + c for c in punctuation)
    return r"(?:\\.|[^" + cls + r"\s\x00-\x1f])+"


# Full-case-folding expansions the reference applies via ICU foldCase
# (lexer.cc:193-199 NormalizeLowerCaseInPlace: ASCII fast path, else ICU;
# unicode_normalizer.cc:22-28). JVM/Python lower() handles the simple
# foldings; these are the COMMON multi-char/special mappings lower()
# misses (sharp s, Latin ligatures, final sigma, micro sign, long s).
# Applied IDENTICALLY on the ingest column and the query-text twin, so
# both sides agree by construction; exotic-script folding beyond this
# table follows plain lowering on both sides (documented approximation).
FOLD_EXPANSIONS: tuple[tuple[str, str], ...] = (
    ("ß", "ss"), ("ẞ", "ss"),          # ß ẞ
    ("ﬀ", "ff"), ("ﬁ", "fi"), ("ﬂ", "fl"),
    ("ﬃ", "ffi"), ("ﬄ", "ffl"),
    ("ﬅ", "st"), ("ﬆ", "st"),
    ("ς", "σ"),                        # ς -> σ
    ("µ", "μ"),                        # micro -> mu
    ("ſ", "s"),                             # long s
    ("ŉ", "ʼn"),                       # ŉ
)


def fold_case(s: str) -> str:
    """Python twin of the ingest-side fold: lower() THEN expansions —
    lowering is what produces ß/ς (context-sensitive final sigma), so
    the expansion pass must run after it."""
    s = s.lower()
    for a, b in FOLD_EXPANSIONS:
        if a in s:
            s = s.replace(a, b)
    return s


def _fold_column(x: Column) -> Column:
    x = F.lower(x)
    for a, b in FOLD_EXPANSIONS:
        x = F.replace(x, F.lit(a), F.lit(b))
    return x


def raw_tokens_column(src: Column,
                      punctuation: str = DEFAULT_PUNCTUATION) -> Column:
    """array<string> of case-folded tokens (stop words INCLUDED), with
    backslash escapes resolved. Index in this array == word position.
    Case folding = lower() + the ICU full-fold expansions above."""
    # fold the SOURCE once (cheaper than per-token); the expansions never
    # introduce punctuation, so token boundaries are unchanged
    folded = _fold_column(src)
    toks = F.regexp_extract_all(folded, F.lit(_token_re(punctuation)), 0)
    return F.transform(toks, lambda x: F.lower(F.regexp_replace(x, r"\\", "")))


def text_tokens_column(src: Column, stopwords: frozenset[str],
                       punctuation: str = DEFAULT_PUNCTUATION) -> Column:
    """array<struct<t:string,p:int>> — non-stop tokens with word positions.

    Positions are assigned AFTER stop-word removal: "the quick brown fox"
    -> quick=0, brown=1, fox=2 ("Removed stop words do not occupy a
    position in the token sequence",
    docs/topics/search-data-formats.md Stop Word Removal)."""
    toks = raw_tokens_column(src, punctuation)
    if stopwords:
        stop_arr = F.array(*[F.lit(s) for s in sorted(stopwords)])
        toks = F.filter(toks, lambda t: ~F.array_contains(stop_arr, t))
    return F.transform(toks, lambda x, i: F.struct(x.alias("t"), i.alias("p")))


def stem_tokens_udf(min_stem_size: int):
    """pandas UDF: array<string> tokens -> array<string> distinct stems.

    Words shorter than MINSTEMSIZE are kept verbatim
    (docs/topics/search-data-formats.md:232)."""

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _stem(tokens: pd.Series) -> pd.Series:
        def go(lst):
            if lst is None:
                return None
            out, seen = [], set()
            for t in lst:
                s = porter2_stem(t) if len(t) >= min_stem_size else t
                if s not in seen:
                    seen.add(s)
                    out.append(s)
            return out

        return tokens.apply(go)

    return _stem


def lex_query_text(text: str,
                   punctuation: str = DEFAULT_PUNCTUATION) -> list[str]:
    """Python twin of raw_tokens_column for QUERY text: the reference lexes
    phrase/term query text with the schema's lexer
    (/root/reference/src/commands/filter_parser.cc:597-616), so punctuation
    inside a quoted phrase or term yields the same tokens at query time as
    at ingest ("hello, world" -> [hello, world], never the token
    "hello,")."""
    import re

    # re.ASCII pins `\s` inside the token class to Java-regex semantics
    # (ASCII-only): Spark's regexp_extract_all keeps NBSP/U+2028/
    # ideographic spaces INSIDE tokens, and this twin must match —
    # Python's default Unicode `\s` split such tokens apart (r11 fix,
    # found by the arrow-engine parity review; also closes the same
    # divergence for phrase/term query lexing)
    toks = re.findall(_token_re(punctuation), fold_case(text),
                      flags=re.ASCII)
    return [t.replace("\\", "").lower() for t in toks]


def stem_positions_udf(min_stem_size: int):
    """pandas UDF: array<string> tokens -> POSITION-ALIGNED stems (element
    i = stem of the token at post-stopword position i; tokens shorter than
    MINSTEMSIZE kept verbatim). Proximity/SLOP matching runs over this
    column so query terms are stem-expanded exactly like single TERMs —
    the reference builds proximity over stemmed term iterators
    (/root/reference/src/query/search.cc:226-298)."""

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _stems(tokens: pd.Series) -> pd.Series:
        def go(lst):
            if lst is None:
                return None
            return [porter2_stem(t) if len(t) >= min_stem_size else t
                    for t in lst]

        return tokens.apply(go)

    return _stems


def stem_positions_nested_udf(min_stem_size: int):
    """pandas UDF: array<array<string>> (one token list PER TEXT FIELD)
    -> position-aligned stems per field, in one Arrow pass. A 50-field
    schema otherwise pays 50 separate Python UDF evaluations per row
    batch at ingest (the reference's field_explosion write workload);
    batching them collapses that to one transfer + one stemmer sweep."""

    @F.pandas_udf(T.ArrayType(T.ArrayType(T.StringType())))
    def _stems(field_tokens: pd.Series) -> pd.Series:
        def go(fields):
            if fields is None:
                return None
            return [None if lst is None else
                    [porter2_stem(t) if len(t) >= min_stem_size else t
                     for t in lst]
                    for lst in fields]

        return field_tokens.apply(go)

    return _stems


def stem_query_term(term: str, min_stem_size: int = 4) -> str:
    """Query-side stemming — same function as ingest, driver-side (cheap)."""
    return porter2_stem(term) if len(term) >= min_stem_size else term
