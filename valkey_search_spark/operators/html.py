"""HTML -> text extraction — the ingest front of a web-corpus pipeline.

Web-crawl curation (C4, RefinedWeb, Gopher) starts by stripping markup
BEFORE any quality/dedup pass. This module does it as an all-JVM
regexp_replace chain (whole-stage codegen, map-only, no Python in the
hot path), mirroring the structure those pipelines describe:

1. remove non-content subtrees (<script>, <style>, <noscript>,
   <template>, comments),
2. turn block-element boundaries into newlines so paragraph structure
   survives tag stripping,
3. strip remaining tags,
4. decode the common named/numeric entities,
5. normalize whitespace.

``full_entities=True`` swaps step 4 for stdlib ``html.unescape`` in an
Arrow-batched map — full fidelity for exotic charrefs at the cost of
one Python hop (the JVM subset covers what real crawl text uses).

Contract notes (documented, pinned in tests): tag stripping is
regex-based — an attribute value containing a literal ``>`` ends the
tag early (the classic tradeoff every regex extractor makes; a DOM
parser belongs client-side of the seam if a corpus needs it), and
unknown named entities pass through unchanged.

Boilerplate REMOVAL composes downstream: ``link_density_col`` is the
jusText/RefinedWeb anchor-text signal for page-level filtering, and
cross-corpus repeated lines go to ``contamination.cross_doc_line_dedup``.

Reference analogue: none (beyond-reference operator per SURVEY.md
§2.10; the reference's text path starts at already-clean fields).
"""
from __future__ import annotations

import html as _html

import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F, types as T

# non-content subtrees, matched with their contents ((?s) spans lines);
# <head> is metadata wholesale — its <title> is extracted separately by
# html_title_col, not leaked into the body text
_DROP_SUBTREES = (
    r"(?is)<(script|style|noscript|template|head|title)\b[^>]*>.*?</\1\s*>")
_COMMENT = r"(?s)<!--.*?-->"
# block boundaries that should become line breaks before tags vanish
_BLOCK_BREAK = (
    r"(?i)<(?:br|hr)\s*/?>|</(?:p|div|h[1-6]|li|ul|ol|tr|table|blockquote|"
    r"pre|section|article|header|footer|figcaption|dd|dt)\s*>")
_ANY_TAG = r"(?s)<[^>]*>"

# the named entities that dominate real crawl text; &#d; / &#xh; decoded
# for the ASCII range JVM-side, full unicode via full_entities=True
_NAMED = [("&nbsp;", " "), ("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
          ("&quot;", "\""), ("&apos;", "'"), ("&#39;", "'"),
          ("&mdash;", "—"), ("&ndash;", "–"),
          ("&hellip;", "…"), ("&copy;", "©"),
          ("&reg;", "®"), ("&trade;", "™"),
          ("&ldquo;", "“"), ("&rdquo;", "”"),
          ("&lsquo;", "‘"), ("&rsquo;", "’")]


def _strip_markup(col: Column) -> Column:
    c = F.regexp_replace(col, _DROP_SUBTREES, " ")
    c = F.regexp_replace(c, _COMMENT, " ")
    c = F.regexp_replace(c, _BLOCK_BREAK, "\n")
    return F.regexp_replace(c, _ANY_TAG, " ")


def _decode_entities_jvm(col: Column) -> Column:
    c = col
    for src, dst in _NAMED:
        if src != "&amp;":                 # ampersand LAST, or it would
            c = F.regexp_replace(c, src, dst)  # re-activate &lt; etc.
    return F.regexp_replace(c, "&amp;", "&")


def _normalize_ws(col: Column) -> Column:
    # \xa0/ : non-breaking spaces (html.unescape's &nbsp;) normalize
    # to plain spaces like every corpus pipeline expects
    c = F.regexp_replace(col, "[ \\t\\x0b\\f\\r  ]+", " ")
    c = F.regexp_replace(c, r" ?\n ?", "\n")
    c = F.regexp_replace(c, r"\n{2,}", "\n")
    # Spark's trim strips only spaces — strip newlines at the ends too
    return F.regexp_replace(c, r"^\s+|\s+$", "")


def html_text_col(col: Column) -> Column:
    """Markup-stripped, entity-decoded, whitespace-normalized text as a
    pure JVM Column expression (usable inside any select/filter)."""
    return _normalize_ws(_decode_entities_jvm(_strip_markup(col)))


@F.pandas_udf(T.StringType())
def _unescape_udf(texts: pd.Series) -> pd.Series:
    return texts.map(lambda t: _html.unescape(t)
                     if isinstance(t, str) else None)


def html_to_text(df: DataFrame, html_col: str = "html",
                 out_col: str = "text",
                 full_entities: bool = False) -> DataFrame:
    """Add ``out_col``: the extracted plain text of ``html_col``.
    Normalization runs AFTER entity decoding on both paths (decoding
    can introduce whitespace — &nbsp; — that must still collapse),
    so the JVM path is exactly ``html_text_col``."""
    if full_entities:
        text = _normalize_ws(_unescape_udf(
            _normalize_ws(_strip_markup(F.col(html_col)))))
    else:
        text = html_text_col(F.col(html_col))
    return df.withColumn(out_col, text)


def html_title_col(col: Column) -> Column:
    """The <title> contents (entity-decoded, trimmed), null when absent."""
    t = F.regexp_extract(col, r"(?is)<title[^>]*>(.*?)</title\s*>", 1)
    return F.when(t != "", _normalize_ws(_decode_entities_jvm(t)))


# commented-out markup must never feed head-tag extraction (a templated
# header's old canonical would become the dedup key), nor may tags
# quoted inside scripts — but <head> itself must SURVIVE (canonical and
# robots live there), so this is a narrower drop set than html_to_text's
_NON_MARKUP = (
    r"(?is)<(script|style|noscript|template)\b[^>]*>.*?</\1\s*>")


def _head_attr_pair_col(col: Column, tag: str, key_attr: str,
                        key_val: str, val_attr: str,
                        val_re: str) -> Column:
    """First ``<tag key_attr=key_val ... val_attr=VALUE>`` VALUE in the
    (comment/script-stripped) markup, either attribute order, '' when
    absent."""
    c = F.regexp_replace(col, _COMMENT, " ")
    c = F.regexp_replace(c, _NON_MARKUP, " ")
    key = rf"""{key_attr}\s*=\s*["']?{key_val}["']?"""
    val = rf"""{val_attr}\s*=\s*["']?({val_re})"""
    a = F.regexp_extract(c, rf"(?is)<{tag}\b[^>]*{key}[^>]*{val}", 1)
    b = F.regexp_extract(c, rf"(?is)<{tag}\b[^>]*{val}[^>]*{key}", 1)
    return F.when(a != "", a).when(b != "", b)


def html_hrefs_col(col: Column, decode: bool = True) -> Column:
    """array<string> of raw ``<a href>`` values in document order, from
    the comment/script-stripped markup (a link inside a <script> string
    is not a link) — one JVM ``regexp_extract_all``, entity-decoded
    (``&amp;`` in query strings). Resolution against the page URL is
    ``urlops.resolve_href``'s job; ``operators.graph.extract_links``
    composes the two. ``decode=False`` returns the raw values so a
    caller that EXPLODES the array first can decode per row instead —
    the entity chain inside an array lambda is what pushes the
    generated stage past the 64 KB codegen limit (interpreted-mode
    fallback, measured ~an order of magnitude slower)."""
    cleaned = F.regexp_replace(
        F.regexp_replace(col, _DROP_SUBTREES, " "), _COMMENT, " ")
    raw = F.regexp_extract_all(
        cleaned,
        F.lit(r"""(?is)<a\b[^>]*?href\s*=\s*["']?([^"'\s>]+)"""),
        F.lit(1))
    if not decode:
        return raw
    return F.transform(raw, _decode_entities_jvm)


def html_canonical_col(col: Column) -> Column:
    """The ``<link rel="canonical" href=...>`` target, null when
    absent — the dedup key crawl pipelines PREFER over the fetch URL
    (mirrors and tracking-parameter variants all declare the same
    canonical). Both attribute orders handled; commented-out markup
    ignored; feed the result through ``urlops.normalize_url`` before
    grouping."""
    got = _head_attr_pair_col(col, "link", "rel", "canonical",
                              "href", r"[^\"'\s>]+")
    return _decode_entities_jvm(got)


def html_meta_robots_col(col: Column) -> Column:
    """The ``<meta name="robots" content=...>`` directives, lowercased
    ('noindex, nofollow' etc.), null when absent — pipelines honoring
    publisher opt-outs gate on ``contains('noindex')``."""
    got = _head_attr_pair_col(col, "meta", "name", "robots",
                              "content", r"[^\"'>]+")
    return F.lower(F.trim(got))


def link_density_col(col: Column, text: Column | None = None) -> Column:
    """Fraction of extracted text characters that sit inside <a> anchors
    — the jusText/RefinedWeb boilerplate signal (nav bars and footers
    are link-dense; prose is not). All-JVM. The numerator is measured on
    the SAME cleaned form as the denominator: anchors are extracted
    after dropping non-content subtrees/comments (a link inside a
    <script> string contributes no text and must not count), and anchor
    bodies are tag-stripped, entity-decoded, and normalized. Pass
    ``text`` (an already-extracted text Column) to reuse it as the
    denominator instead of re-running the extraction chain. 0.0 for
    pages with no text."""
    cleaned = F.regexp_replace(
        F.regexp_replace(col, _DROP_SUBTREES, " "), _COMMENT, " ")
    anchors = F.regexp_extract_all(
        cleaned, F.lit(r"(?is)<a\b[^>]*>(.*?)</a\s*>"), F.lit(1))
    anchor_len = F.aggregate(
        anchors, F.lit(0),
        lambda acc, a: acc + F.length(_normalize_ws(_decode_entities_jvm(
            F.regexp_replace(a, _ANY_TAG, " ")))))
    total_len = F.length(text if text is not None else html_text_col(col))
    return (F.when(total_len > 0,
                   F.least(anchor_len.cast("double") / total_len, F.lit(1.0)))
            .otherwise(F.lit(0.0)))


def extract_documents(df: DataFrame, html_col: str = "html",
                      full_entities: bool = False,
                      with_canonical: bool = False,
                      with_meta_robots: bool = False) -> DataFrame:
    """One-pass web-document extraction: text + title + link_density
    (+ ``canonical_url`` / ``meta_robots`` on request — the dedup key
    and opt-out gate real crawl curation adds next). Map-only codegen
    scan (one Arrow hop only when full_entities); the density
    denominator reuses the extracted text column instead of re-running
    the strip/decode/normalize chain per row."""
    from .dedup import _parallelize

    df = _parallelize(df)        # spread 1-task scans; no-op at scale
    out = html_to_text(df, html_col, "text", full_entities)
    out = (out
           .withColumn("title", html_title_col(F.col(html_col)))
           .withColumn("link_density",
                       link_density_col(F.col(html_col),
                                        text=F.col("text"))))
    if with_canonical:
        out = out.withColumn("canonical_url",
                             html_canonical_col(F.col(html_col)))
    if with_meta_robots:
        out = out.withColumn("meta_robots",
                             html_meta_robots_col(F.col(html_col)))
    return out
