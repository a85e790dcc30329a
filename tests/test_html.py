"""HTML extraction pinned against an INDEPENDENT stdlib html.parser
reference (a real tokenizer, not regexes) on generated well-formed
documents; plus explicit contracts for entities, structure, and the
documented regex limitations."""
from __future__ import annotations

import html.parser
import random

import pytest

from pyspark.sql import functions as F

from valkey_search_spark.operators.html import (
    extract_documents,
    html_text_col,
    html_title_col,
    html_to_text,
    link_density_col,
)


# ---------------------------------------------------------------------------
# independent reference: stdlib HTMLParser

class _RefExtractor(html.parser.HTMLParser):
    _SKIP = {"script", "style", "noscript", "template", "head", "title"}
    _BLOCK = {"br", "hr", "p", "div", "h1", "h2", "h3", "h4", "h5", "h6",
              "li", "ul", "ol", "tr", "table", "blockquote", "pre",
              "section", "article", "header", "footer", "figcaption",
              "dd", "dt"}

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.out = []
        self.skip = 0

    def handle_starttag(self, tag, attrs):
        if tag in self._SKIP:
            self.skip += 1
        if tag in ("br", "hr"):
            self.out.append("\n")
        else:
            self.out.append(" ")

    def handle_endtag(self, tag):
        if tag in self._SKIP:
            self.skip = max(0, self.skip - 1)
        self.out.append("\n" if tag in self._BLOCK else " ")

    def handle_data(self, data):
        if not self.skip:
            self.out.append(data)


def ref_extract(doc: str) -> str:
    p = _RefExtractor()
    p.feed(doc)
    p.close()
    text = "".join(p.out)
    # the same whitespace normalization the operator applies
    import re
    text = re.sub("[ \\t\\x0b\\f\\r  ]+", " ", text)
    text = re.sub(r" ?\n ?", "\n", text)
    text = re.sub(r"\n{2,}", "\n", text)
    return text.strip()


# ---------------------------------------------------------------------------
# generated well-formed documents

_WORDS = ["alpha", "beta", "gamma", "delta", "eps &amp; zeta", "r&eacute;f"]
_INLINE = ["b", "i", "em", "strong", "span", "a"]
_BLOCKS = ["p", "div", "li", "blockquote", "h2"]


def _gen_doc(rng: random.Random) -> str:
    parts = ["<html><head><title>T &amp; t</title>",
             "<style>body { color: red; }</style>",
             "<script>if (1 < 2) { x(); }</script></head><body>"]
    for _ in range(rng.randint(2, 6)):
        tag = rng.choice(_BLOCKS)
        inner = []
        for _ in range(rng.randint(1, 5)):
            w = rng.choice(_WORDS)
            if rng.random() < 0.4:
                it = rng.choice(_INLINE)
                attr = ' href="/x?a=1&amp;b=2"' if it == "a" else ""
                inner.append(f"<{it}{attr}>{w}</{it}>")
            else:
                inner.append(w)
        parts.append(f"<{tag}>{' '.join(inner)}</{tag}>")
        if rng.random() < 0.3:
            parts.append("<!-- hidden comment -->")
        if rng.random() < 0.3:
            parts.append("<br/>")
    parts.append("</body></html>")
    return "".join(parts)


def test_extraction_matches_stdlib_parser_reference(spark):
    rng = random.Random(42)
    docs = [_gen_doc(rng) for _ in range(30)]
    df = spark.createDataFrame([(i, d) for i, d in enumerate(docs)],
                               ["i", "html"])
    got = {r["i"]: r["text"]
           for r in html_to_text(df, full_entities=True).collect()}
    for i, d in enumerate(docs):
        assert got[i] == ref_extract(d), d


def test_jvm_entities_match_on_common_set(spark):
    doc = ("<p>a &amp; b &lt;c&gt; &quot;d&quot; &#39;e&#39; x&nbsp;y "
           "&mdash; &hellip; &copy;</p>")
    df = spark.createDataFrame([(doc,)], ["html"])
    jvm = html_to_text(df).collect()[0]["text"]
    py = html_to_text(df, full_entities=True).collect()[0]["text"]
    assert jvm == py == ref_extract(doc)


def test_unknown_entities_pass_through_jvm(spark):
    df = spark.createDataFrame([("<p>&oelig; &#x1F600;</p>",)], ["html"])
    assert html_to_text(df).collect()[0]["text"] == "&oelig; &#x1F600;"


def test_script_style_comment_dropped(spark):
    doc = ("<div>keep</div><script>drop1()</script><style>.drop2{}</style>"
           "<!-- drop3 --><noscript>drop4</noscript><p>also keep</p>")
    df = spark.createDataFrame([(doc,)], ["html"])
    text = html_to_text(df).collect()[0]["text"]
    assert text == "keep\nalso keep"
    for bad in ("drop1", "drop2", "drop3", "drop4"):
        assert bad not in text


def test_block_structure_survives(spark):
    doc = "<h1>Title</h1><p>line one</p><p>line two</p>ta<br>il"
    df = spark.createDataFrame([(doc,)], ["html"])
    assert html_to_text(df).collect()[0]["text"] \
        == "Title\nline one\nline two\nta\nil"


def test_title_and_missing_title(spark):
    df = spark.createDataFrame(
        [(1, "<title>My &amp; Page</title><p>x</p>"), (2, "<p>x</p>")],
        ["i", "html"])
    rows = {r["i"]: r["t"] for r in df.select(
        "i", html_title_col(F.col("html")).alias("t")).collect()}
    assert rows[1] == "My & Page"
    assert rows[2] is None


def test_link_density(spark):
    nav = "<div>" + "".join(f'<a href="/{i}">link {i}</a>'
                            for i in range(8)) + "</div>"
    prose = "<p>" + "word " * 60 + '<a href="/x">one link</a></p>'
    df = spark.createDataFrame([(1, nav), (2, prose), (3, "<p></p>")],
                               ["i", "html"])
    d = {r["i"]: r["ld"] for r in df.select(
        "i", link_density_col(F.col("html")).alias("ld")).collect()}
    assert d[1] > 0.8   # inter-anchor separators dilute the numerator
    assert 0.0 < d[2] < 0.1
    assert d[3] == 0.0


def test_extract_documents_one_pass(spark):
    doc = ('<title>T</title><p>body text <a href="/">here</a></p>')
    df = spark.createDataFrame([(doc,)], ["html"])
    row = extract_documents(df).collect()[0]
    assert row["text"] == "body text here"
    assert row["title"] == "T"
    assert 0 < row["link_density"] < 1


def test_plan_is_python_free_without_full_entities(spark):
    df = spark.createDataFrame([("<p>x</p>",)], ["html"])
    plan = html_to_text(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    plan2 = html_to_text(df, full_entities=True) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan2


def test_documented_attribute_gt_limitation(spark):
    # regex tag stripping ends a tag at the first '>', even inside a
    # quoted attribute — the documented tradeoff; pin it so a future
    # change is deliberate
    # '<p title="a>' ends at the first '>', leaving 'b">x' as text
    df = spark.createDataFrame([('<p title="a>b">x</p>',)], ["html"])
    assert html_to_text(df).collect()[0]["text"] == 'b">x'


def test_null_html(spark):
    df = spark.createDataFrame([(None,)], "html string")
    assert html_to_text(df).collect()[0]["text"] is None


def test_nbsp_entity_collapses_after_decode(spark):
    # decode-then-normalize: &nbsp; sequences must collapse like spaces
    df = spark.createDataFrame([("<p>a&nbsp;&nbsp;b&nbsp;</p>",)], ["html"])
    assert html_to_text(df).collect()[0]["text"] == "a b"


def test_link_density_ignores_links_in_dropped_subtrees(spark):
    doc = ('<script>document.write("<a href=/x>click here more '
           'text</a>")</script><p>short prose here</p>')
    df = spark.createDataFrame([(doc,)], ["html"])
    ld = df.select(link_density_col(F.col("html")).alias("ld")) \
        .collect()[0]["ld"]
    assert ld == 0.0


def test_link_density_measures_decoded_anchor_text(spark):
    # numerator must measure decoded chars: '&amp;' is 1 char, not 5
    doc = '<p><a href="/">a &amp; b</a> plus twenty more chars</p>'
    df = spark.createDataFrame([(doc,)], ["html"])
    row = extract_documents(df).collect()[0]
    assert row["text"] == "a & b plus twenty more chars"
    assert row["link_density"] == pytest.approx(5 / 28)


# ---------------------------------------------------------------------------
def test_canonical_and_meta_robots(spark):
    from valkey_search_spark.operators.html import (html_canonical_col,
                                                    html_meta_robots_col)
    from valkey_search_spark.operators.urlops import normalize_url

    pages = [
        # canonical first attr order, tracking junk in the fetch url
        ('<html><head><link rel="canonical" '
         'href="https://ex.com/p?id=1"/></head><body>a</body></html>'),
        # reversed attr order + entity in href + meta robots
        ("<html><head><link href='https://ex.com/p?id=1&amp;x=2' "
         "rel='canonical'><meta name=ROBOTS "
         "content='NOINDEX, nofollow'></head></html>"),
        "<html><head></head><body>no canonical</body></html>",
        # meta robots reversed attr order
        ('<html><head><meta content="index, follow" '
         'name="robots"></head></html>'),
    ]
    df = spark.createDataFrame([(p,) for p in pages], "html string")
    rows = df.select(
        html_canonical_col(F.col("html")).alias("canon"),
        html_meta_robots_col(F.col("html")).alias("robots")).collect()
    assert rows[0].canon == "https://ex.com/p?id=1"
    assert rows[0].robots is None
    assert rows[1].canon == "https://ex.com/p?id=1&x=2"   # entity decoded
    assert rows[1].robots == "noindex, nofollow"
    assert rows[2].canon is None and rows[2].robots is None
    assert rows[3].robots == "index, follow"
    # the intended composition: canonical -> normalize_url -> dedup key
    norm = df.select(normalize_url(
        html_canonical_col(F.col("html"))).alias("n")).collect()
    assert norm[0].n == "https://ex.com/p?id=1"
    assert norm[1].n == "https://ex.com/p?id=1&x=2"


def test_extract_documents_optional_columns(spark):
    from valkey_search_spark.operators.html import extract_documents

    df = spark.createDataFrame(
        [('<html><head><link rel="canonical" href="https://c.com/x">'
          '<meta name="robots" content="noindex"></head>'
          "<body><p>hello</p></body></html>",)], "html string")
    base = extract_documents(df)
    assert "canonical_url" not in base.columns       # defaults off
    full = extract_documents(df, with_canonical=True,
                             with_meta_robots=True).first()
    assert full.canonical_url == "https://c.com/x"
    assert full.meta_robots == "noindex"
    assert full.text == "hello"
    plan = extract_documents(df, with_canonical=True,
                             with_meta_robots=True) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "Exchange" not in plan


def test_canonical_ignores_commented_out_markup(spark):
    from valkey_search_spark.operators.html import (html_canonical_col,
                                                    html_meta_robots_col)

    page = ('<html><head>'
            '<!-- <link rel="canonical" href="https://old.example/"> -->'
            '<script>var x = \'<meta name="robots" content="noindex">\';'
            '</script>'
            '<link rel="canonical" href="https://ex.com/real">'
            '</head></html>')
    row = spark.createDataFrame([(page,)], "html string").select(
        html_canonical_col(F.col("html")).alias("c"),
        html_meta_robots_col(F.col("html")).alias("r")).first()
    assert row.c == "https://ex.com/real"     # not the commented one
    assert row.r is None                      # script string ignored
