"""Unicode text cleaning — the "fix the bytes" pass every training
corpus runs before quality/dedup (C4's and fineweb's cleanup steps,
the cheap subset of ftfy).

Two tiers, composable in one scan:

- **JVM tier** (default, pure codegen, map-only, no Python): strip
  control characters (keeping ``\\n`` and ``\\t``), zero-width and
  bidi-control marks, normalize every Unicode space separator to
  ASCII space, collapse space runs, trim line edges. Java regex
  character classes (``\\p{Cntrl}``, ``\\p{Zs}``) do all of it
  without leaving whole-stage codegen.
- **Arrow tier** (opt-in): canonical normalization
  (``unicode_form="NFC"|"NFKC"``) via ``unicodedata`` — the JVM has no
  normalizer expression — and ``fix_mojibake=True`` for the single
  dominant real-corpus encoding bug: UTF-8 bytes mis-decoded as
  Latin-1/cp1252 ("Ã©" for "é"). The repair is gated on a marker
  heuristic (Ã/Â/â sequences) and only applied when the re-decode
  round-trips cleanly AND strictly reduces marker count, so correct
  text containing real "Ã" words is never touched (pinned in tests).

Both tiers preserve NULL and leave non-string columns alone. The JVM
tier is what a 100 TB pass should run by default; the Arrow tier costs
one batched Python hop and is worth it only when the corpus mixes
encodings (measure with the ``mojibake_marker_count`` column first).

Reference analogue: none (beyond-reference operator per SURVEY.md
§2.10; the reference's ingest assumes clean field bytes).
"""
from __future__ import annotations

import unicodedata

import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F, types as T

# control chars except \t \n (\r is normalized to \n first) — C0, DEL,
# and C1 (mojibake debris) except NEL which normalizes to a space;
# zero-width + BOM + bidi controls; Mongolian vowel separator
_CTRL = ("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F"
         "\\u0080-\\u0084\\u0086-\\u009F]")
_ZERO_WIDTH = ("[\\u200B-\\u200F\\u202A-\\u202E\\u2060-\\u2064"
               "\\uFEFF\\u180E]")
_UNI_SPACE = "[\\p{Zs}\\u0085\\u2028\\u2029]"   # every space separator
# mojibake = a UTF-8 lead byte mis-decoded (Ã/Â/â for C3/C2/E2) followed
# by a mis-decoded continuation byte: raw U+0080-00BF (latin-1 path) or
# the cp1252 mappings of 0x80-0x9F (€‚ƒ…†‡ˆ‰Š‹ŒŽ''""•–—˜™š›œžŸ)
_SECOND_BYTE = ("[\\u0080-\\u00BF\\u20AC\\u201A\\u0192\\u201E\\u2026"
                "\\u2020\\u2021\\u02C6\\u2030\\u0160\\u2039\\u0152"
                "\\u017D\\u2018\\u2019\\u201C\\u201D\\u2022\\u2013"
                "\\u2014\\u02DC\\u2122\\u0161\\u203A\\u0153\\u017E"
                "\\u0178]")
_MOJIBAKE_MARKER = f"(?:Ã|Â|â){_SECOND_BYTE}"


def clean_text_col(text: Column) -> Column:
    """The JVM tier as one expression chain (see module doc)."""
    c = F.regexp_replace(text, "\\r\\n?", "\n")
    c = F.regexp_replace(c, _CTRL, "")
    c = F.regexp_replace(c, _ZERO_WIDTH, "")
    c = F.regexp_replace(c, _UNI_SPACE, " ")
    c = F.regexp_replace(c, " {2,}", " ")
    c = F.regexp_replace(c, " ?\n ?", "\n")      # trim line edges
    c = F.regexp_replace(c, "\n{3,}", "\n\n")    # cap blank runs
    return F.regexp_replace(c, "^[ \n]+|[ \n]+$", "")


def mojibake_marker_count(text: Column) -> Column:
    """How many UTF-8-as-Latin-1 marker sequences the text contains —
    the cheap JVM probe to decide whether the Arrow repair tier is
    worth running on a corpus."""
    # each marker match is 2 chars, so (len - len(stripped)) / 2
    return ((F.length(text) -
             F.length(F.regexp_replace(text, _MOJIBAKE_MARKER, ""))) / 2) \
        .cast("int")


# cp1252 leaves five bytes undefined (81 8D 8F 90 9D); the lenient
# decoders that PRODUCE mojibake (WHATWG windows-1252, and most web
# stacks) pass them through as their C1 codepoints, so the inverse
# must accept those codepoints back
_CP1252_HOLES = frozenset((0x81, 0x8D, 0x8F, 0x90, 0x9D))


def _encode_whatwg_cp1252(s: str) -> bytes:
    try:
        return s.encode("cp1252", errors="strict")
    except UnicodeEncodeError:
        pass
    out = bytearray()
    for ch in s:
        o = ord(ch)
        if o in _CP1252_HOLES:
            out.append(o)
        else:
            out += ch.encode("cp1252", errors="strict")   # may raise
    return bytes(out)


def _decode_utf8_sloppy(b: bytes) -> str:
    """UTF-8 with per-byte windows-1252 fallback (ftfy's 'sloppy'
    posture): valid UTF-8 sequences decode normally; a lone invalid
    byte maps back through cp1252 (its C1 codepoint for the five
    holes). This is what lets a string that MIXES mojibake with
    legitimate non-ASCII (NBSP, curly quotes) repair the broken runs
    without destroying the good ones."""
    out: list[str] = []
    while b:
        try:
            out.append(b.decode("utf-8"))
            break
        except UnicodeDecodeError as e:
            out.append(b[:e.start].decode("utf-8"))
            bad = b[e.start]
            out.append(chr(bad) if bad in _CP1252_HOLES
                       else bytes((bad,)).decode("cp1252"))
            b = b[e.start + 1:]
    return "".join(out)


def _fix_mojibake_str(s: str) -> str:
    import re

    markers = len(re.findall(_MOJIBAKE_MARKER, s))
    if not markers:
        return s
    # WHATWG windows-1252 first (the web's mis-decode), plain latin-1
    # second (raw C1 passthrough); sloppy UTF-8 on the way back so
    # legit non-ASCII mixed into the same string survives. The
    # marker-count-must-strictly-decrease gate keeps correct text
    # untouched.
    for enc in (_encode_whatwg_cp1252,
                lambda t: t.encode("latin-1", errors="strict")):
        try:
            fixed = _decode_utf8_sloppy(enc(s))
        except (UnicodeEncodeError, UnicodeDecodeError):
            continue
        if len(re.findall(_MOJIBAKE_MARKER, fixed)) < markers:
            return fixed
    return s


def clean_text(df: DataFrame, text_col: str = "text",
               out_col: str | None = None,
               unicode_form: str | None = None,
               fix_mojibake: bool = False) -> DataFrame:
    """Clean ``text_col`` into ``out_col`` (defaults to in-place).
    ``unicode_form``/``fix_mojibake`` enable the Arrow tier (one
    batched Python hop BEFORE the JVM chain, so normalization-created
    spaces still collapse); without them the scan is Python-free."""
    from .dedup import _parallelize

    if unicode_form not in (None, "NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"unknown unicode_form: {unicode_form!r}")
    df = _parallelize(df)        # spread 1-task scans; no-op at scale
    out_col = out_col or text_col
    src: Column = F.col(text_col)
    if unicode_form or fix_mojibake:
        form = unicode_form

        @F.pandas_udf(T.StringType())
        def fix(texts: pd.Series) -> pd.Series:
            def go(s):
                if not isinstance(s, str):
                    return s
                if fix_mojibake:
                    s = _fix_mojibake_str(s)
                if form:
                    s = unicodedata.normalize(form, s)
                return s

            return texts.map(go)

        src = fix(src)
    return df.withColumn(out_col, clean_text_col(src))
