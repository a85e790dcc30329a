"""Tokenizer evaluation — the dataset-card numbers for a trained
tokenizer (BPE / Unigram / WordPiece, any object with the shared
``tokenize(df, text_col, out_col)`` contract).

Choosing a tokenizer for a 100 TB corpus is a measurement problem:
fertility (tokens per whitespace word) and compression (bytes per
token) decide the real training cost of the same text, and vocabulary
utilization decides whether the vocab budget is spent or wasted. This
module computes them corpus-wide:

- one Arrow tokenize pass + ONE global aggregation for the scalar
  totals (no shuffle — the agg is a map-side fold to a single row),
- optionally a second pass for ``vocab_used`` (distinct tokens that
  actually occur): explode + distinct, a shuffle bounded by the VOCAB
  size, never the corpus. The tokenize map runs once per pass — cache
  the input (or pass ``include_vocab_use=False``) when that matters.

All three families are byte-complete (no [UNK] data loss), so OOV rate
is structurally zero and deliberately not a column.

Reference analogue: none (beyond-reference operator per SURVEY.md
§2.10; tokenizer choice sits upstream of any index).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _vocab_size_of(tokenizer) -> int | None:
    v = getattr(tokenizer, "vocab", None)
    if v is not None:
        return len(v)
    for attr in ("merges", "merge_table"):
        m = getattr(tokenizer, attr, None)
        if m is not None:
            return 256 + len(m)           # byte-level base + learned merges
    return None


def tokenizer_report(df: DataFrame, tokenizer, text_col: str = "text",
                     include_vocab_use: bool = True,
                     by: list | None = None) -> DataFrame:
    """Corpus report for ``tokenizer`` over ``df[text_col]`` — one row,
    or one row per ``by`` group (e.g. ``by=["lang"]``: fertility per
    language is the number a multilingual vocab is judged on; the
    per-group vocab_used shuffle stays bounded by vocab x groups).

    Columns: [by...,] n_docs, total_tokens, total_words, total_bytes,
    total_chars, bytes_per_token (compression), chars_per_token,
    fertility (tokens/word), tokens_per_doc, vocab_size, vocab_used,
    vocab_used_frac. Null, empty and whitespace-only texts (zero
    words, Python ``str.split`` semantics) are excluded from the
    report entirely — they would deflate fertility/tokens_per_doc.
    """
    by = list(by or [])
    # words per str.split: split on Unicode whitespace, drop empties
    # (so '' and whitespace-only count ZERO words, unlike a bare
    # split('\\s+') whose [''] result counts one)
    words = F.filter(
        F.split(F.col(text_col), "[\\s\\p{Z}\\u0085\\x1c-\\x1f]+"),
        lambda w: w != F.lit(""))
    toks = (tokenizer.tokenize(df, text_col, "__tok")
            .where(F.col("__tok").isNotNull())
            .withColumn("__nw", F.size(words))
            .where(F.col("__nw") > 0))       # vocab_used shares the cut
    staged = toks.select(
        *by,
        F.col("__tok"),
        F.size("__tok").alias("__nt"),
        F.octet_length(text_col).alias("__nb"),
        F.length(text_col).alias("__nc"),
        F.col("__nw"))
    row = staged.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__nt").alias("total_tokens"),
        F.sum("__nw").alias("total_words"),
        F.sum("__nb").alias("total_bytes"),
        F.sum("__nc").alias("total_chars"))
    row = row.select(
        "*",
        (F.col("total_bytes") / F.col("total_tokens"))
        .alias("bytes_per_token"),
        (F.col("total_chars") / F.col("total_tokens"))
        .alias("chars_per_token"),
        (F.col("total_tokens") / F.col("total_words")).alias("fertility"),
        (F.col("total_tokens") / F.col("n_docs")).alias("tokens_per_doc"))
    vsize = _vocab_size_of(tokenizer)
    row = row.withColumn("vocab_size",
                         F.lit(vsize).cast("long"))
    if include_vocab_use:
        used = (toks.select(*by, F.explode("__tok").alias("__t"))
                    .groupBy(*by)
                    .agg(F.countDistinct("__t").alias("vocab_used")))
        if not by:
            row = row.crossJoin(used)        # both sides are one row
        else:
            # tiny groups-sized join — NULL-SAFE on the keys, or a
            # null-valued group (lang=None rows) would vanish from
            # the report entirely (inner equi-join: null != null)
            import functools
            import operator

            cond = functools.reduce(operator.and_, [
                row[c].eqNullSafe(used[c]) for c in by])
            row = row.join(used, cond).drop(*[used[c] for c in by])
    else:
        row = row.withColumn("vocab_used", F.lit(None).cast("long"))
    return row.withColumn(
        "vocab_used_frac",
        F.when(F.lit(vsize).isNotNull(),
               F.col("vocab_used") / F.lit(vsize)))


def compare_tokenizers(df: DataFrame, tokenizers: dict,
                       text_col: str = "text",
                       include_vocab_use: bool = True) -> DataFrame:
    """Union of ``tokenizer_report`` rows tagged with a ``family``
    column — the side-by-side table a tokenizer bake-off reads."""
    out = None
    for name, tok in tokenizers.items():
        r = tokenizer_report(df, tok, text_col, include_vocab_use) \
            .select(F.lit(name).alias("family"), "*")
        out = r if out is None else out.unionByName(r)
    return out
