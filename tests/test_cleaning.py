"""clean_text: independent scalar-reference parity (unicodedata-based,
not the module's regexes), pinned edge cases, mojibake repair safety,
Python-free default plan."""
from __future__ import annotations

import unicodedata

import pytest

from pyspark.sql import functions as F

from tests.conftest import load
from valkey_search_spark.operators.cleaning import (
    clean_text, clean_text_col, mojibake_marker_count,
)

_ZW = set("​‌‍‎‏‪‫‬‭"
          "‮⁠⁡⁢⁣⁤﻿᠎")


def _scalar_clean(s: str | None) -> str | None:
    """Independent reference: category-driven (unicodedata), not the
    module's regex classes."""
    if s is None:
        return None
    s = s.replace("\r\n", "\n").replace("\r", "\n")
    out = []
    for ch in s:
        if ch in ("\t", "\n"):
            out.append(ch)
        elif ch in ("", " ", " "):
            out.append(" ")
        elif unicodedata.category(ch) == "Cc":
            continue
        elif ch in _ZW:
            continue
        elif unicodedata.category(ch) == "Zs":
            out.append(" ")
        else:
            out.append(ch)
    s = "".join(out)
    import re
    s = re.sub(" {2,}", " ", s)
    s = re.sub(" ?\n ?", "\n", s)
    s = re.sub("\n{3,}", "\n\n", s)
    return re.sub("^[ \n]+|[ \n]+$", "", s)


def _messy(i: int) -> str | None:
    if i % 17 == 16:
        return None
    bits = [f"word{i}", " ", "x​y", "\t", f"{i}\x07end",
            "a b", "\r\n", "line\r", "‮txt", "  double  ",
            "\n\n\n\n", " edge ", "　wide", "\x9cC1", "nel"]
    # i-dependent subset and order
    chosen = [bits[(i + j) % len(bits)] for j in range(3 + i % 6)]
    return "".join(chosen)


def test_matches_independent_scalar_reference(spark):
    rows = [(i, _messy(i)) for i in range(400)]
    df = spark.createDataFrame(rows, "k long, text string")
    got = {r.k: r.c for r in
           df.select("k", clean_text_col(F.col("text")).alias("c"))
             .collect()}
    for k, raw in rows:
        assert got[k] == _scalar_clean(raw), (k, raw)


def test_real_corpus_is_already_clean(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").limit(300)
    out = clean_text(docs, out_col="cleaned")
    n = out.where(F.col("cleaned") != F.col("text")).count()
    assert n == 0                      # word-soup corpus: no-op, no harm


@pytest.mark.parametrize("raw,want", [
    ("a\x00b\x07c", "abc"),
    ("keep\ttab\nnewline", "keep\ttab\nnewline"),
    ("crlf\r\nand\rcr", "crlf\nand\ncr"),
    ("nb sp and em", "nb sp and em"),
    ("zero​width﻿bom", "zerowidthbom"),
    ("a  b   c", "a b c"),
    ("line \n next", "line\nnext"),
    ("a\n\n\n\n\nb", "a\n\nb"),
    ("  \n trimmed \n  ", "trimmed"),
    ("nelsep", "nel sep"),
    ("c1\x9cgone", "c1gone"),
    ("", ""),
])
def test_pinned_cases(spark, raw, want):
    df = spark.createDataFrame([(raw,)], "text string")
    assert df.select(clean_text_col(F.col("text")).alias("c")) \
             .first().c == want


# ---------------------------------------------------------------------------
_MOJI = [
    ("CafÃ© au lait", "Café au lait"),              # latin-1/cp1252 é
    ("donâ€™t â€œquoteâ€\x9d", "don’t “quote”"),    # cp1252 punctuation
    ("nÃ£o estÃ¡", "não está"),
    ("dashâ\x80\x93here", "dash–here"),             # latin-1 C1 path
    # MIXED content: broken runs repair, legit non-ASCII survives
    ("cafÃ© and “real quotes”", "café and “real quotes”"),
]


@pytest.mark.parametrize("raw,fixed", _MOJI)
def test_mojibake_repaired(spark, raw, fixed):
    df = spark.createDataFrame([(raw,)], "text string")
    out = clean_text(df, fix_mojibake=True).first().text
    assert out == _scalar_clean(fixed)


@pytest.mark.parametrize("legit", [
    "Às vezes",                # real pre-composed accents, no marker
    "maçã verde",              # ã before ASCII: not a marker pair
    "price € 5",               # lone cp1252 char, no lead byte
    "Â la carte?",             # marker-ish but transcode won't improve
])
def test_correct_text_never_touched(spark, legit):
    df = spark.createDataFrame([(legit,)], "text string")
    out = clean_text(df, fix_mojibake=True).first().text
    assert out == _scalar_clean(legit)


def test_marker_count_probe(spark):
    import re

    from valkey_search_spark.operators.cleaning import _MOJIBAKE_MARKER

    rows = [(r,) for r, _ in _MOJI] + [("plain text",), (None,)]
    df = spark.createDataFrame(rows, "text string")
    got = [r.m for r in
           df.select(mojibake_marker_count(F.col("text")).alias("m"))
             .collect()]
    want = [len(re.findall(_MOJIBAKE_MARKER, r)) if r else None
            for (r,) in rows]
    assert got == want
    assert got[0] >= 1 and got[-2] == 0 and got[-1] is None


def test_nfc_normalization(spark):
    decomposed = "étude"           # e + combining acute
    df = spark.createDataFrame([(decomposed,)], "text string")
    assert clean_text(df).first().text == decomposed       # JVM: as-is
    assert clean_text(df, unicode_form="NFC").first().text == "étude"
    with pytest.raises(ValueError):
        clean_text(df, unicode_form="NFX")


def test_null_preserved_and_plan_python_free(spark):
    df = spark.createDataFrame([(None,), ("ok",)], "text string")
    rows = clean_text(df).collect()
    assert rows[0].text is None and rows[1].text == "ok"
    plan = clean_text(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "Exchange" not in plan
    arrow = clean_text(df, unicode_form="NFC") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in arrow or "BatchEvalPython" in arrow


def test_composes_into_curation_pipeline(spark):
    from valkey_search_spark.operators.pipeline import (
        CurationConfig, curate_documents,
    )

    messy = "word " * 30 + "cafÃ©  end"   # mojibake + NBSP
    df = spark.createDataFrame(
        [(1, messy), (2, "short")], "doc_id long, text string")
    clean, funnel = curate_documents(
        df, config=CurationConfig(clean=True, clean_fix_mojibake=True,
                                  min_tokens=10, min_quality=0.0,
                                  near_dup_threshold=None))
    rows = clean.collect()
    assert funnel["input"] == 2 and len(rows) == 1
    assert rows[0].text.endswith("café end")     # repaired + NBSP->space


def test_clean_text_duckdb_oracle_real_corpus(spark, sf_dir, tmp_path):
    """DuckDB-replayable pin for the JVM cleaning chain (r12 rotation
    candidate): dirty text synthesized from the real corpus (CRLF,
    C0/C1 controls, zero-widths, unicode spaces, double spaces, blank
    runs, edge padding) cleaned by clean_text must equal the same
    8-step regex chain replayed in DuckDB/RE2 (\\uXXXX classes become
    \\x{...}; \\p{Zs} is shared syntax)."""
    import duckdb

    from pyspark.sql import functions as F

    from valkey_search_spark.operators.cleaning import clean_text

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text").limit(300)
    dirty = docs.select(
        "doc_id",
        F.concat(F.lit("  ​"), F.lit("\r\n"),
                 F.regexp_replace("text", " ", " "),
                 F.lit("\x07mid\x9fdle"),
                 F.lit("\n\n\n\n tail  padded  x \n ")
                 ).alias("text"))
    path = str(tmp_path / "dirty.parquet")
    dirty.write.parquet(path)
    back = spark.read.parquet(path)
    got = {r["doc_id"]: r["text"]
           for r in clean_text(back).collect()}
    want = dict(duckdb.sql(f"""
        SELECT doc_id,
          regexp_replace(regexp_replace(regexp_replace(regexp_replace(
          regexp_replace(regexp_replace(regexp_replace(regexp_replace(
            text,
            '\\r\\n?', chr(10), 'g'),
            '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F' ||
            '\\x{{0080}}-\\x{{0084}}\\x{{0086}}-\\x{{009F}}]', '', 'g'),
            '[\\x{{200B}}-\\x{{200F}}\\x{{202A}}-\\x{{202E}}' ||
            '\\x{{2060}}-\\x{{2064}}\\x{{FEFF}}\\x{{180E}}]', '', 'g'),
            '[\\p{{Zs}}\\x{{0085}}\\x{{2028}}\\x{{2029}}]', ' ', 'g'),
            ' {{2,}}', ' ', 'g'),
            ' ?\\n ?', chr(10), 'g'),
            '\\n{{3,}}', chr(10) || chr(10), 'g'),
            '^[ \\n]+|[ \\n]+$', '', 'g') AS cleaned
        FROM '{path}/*.parquet'
    """).fetchall())
    assert len(got) == len(want) > 0
    bad = [k for k in got if got[k] != want[k]]
    assert not bad, (bad[:3], got[bad[0]][:80] if bad else None,
                     want[bad[0]][:80] if bad else None)
