"""Document chunking: fixed-token windows with overlap, map-only.

Training-data and retrieval pipelines split long documents into bounded
token windows before tokenization/embedding (context-length packing,
RAG passage indexing). This operator does it as a single map-only
posexplode — no shuffle, no Python:

    tokens  = split(trim(text), \\s+)           (staged once per doc)
    starts  = sequence(0, max(n-overlap-1, 0), stride)
                                                 stride = chunk_tokens - overlap
    chunk i = tokens[start : start + chunk_tokens] joined with ' '

Every chunk is non-empty and every token is covered; the final chunk
may be shorter than `chunk_tokens`. Consecutive chunks share `overlap`
tokens. The start bound is n-overlap-1 (not n-1): a start within the
last `overlap` tokens would emit a chunk whose every token is already
in the previous chunk — pure duplication that inflates downstream
embedding/indexing cost (standard sliding-window chunkers bound the
same way).
A document whose text is empty/whitespace yields one chunk with the
empty token, mirroring `split('', '\\s+') == ['']` — callers that want
to skip blanks filter on `chunk_tokens_n > 0` upstream (analyze_documents
/ gopher gates already drop them).

100 TB shape: whole-stage-codegen scan -> Generate(posexplode) -> project.
The token array is staged as a named column referenced by both the
sequence bound and the slice, so Catalyst computes the split once per
document (expensive-expression CollapseProject rule — see SCALE.md on
expression plumbing); the windows themselves are built by slicing the
staged array, never by materializing per-window arrays (the O(windows^2)
Generate trap). Output size is input_tokens * (1 + overlap/stride), a
constant factor chosen by the caller; no aggregation state.

Char offsets (`with_char_offsets=True`) add an `aggregate` fold over the
tokens BEFORE each chunk start — O(start) per chunk, O(n^2/stride) per
document worst case. Fine for typical chunk/document ratios, quadratic
for megatoken documents; off by default and documented here so the cost
is a caller's explicit choice.

Reference analogue: none — valkey-search indexes whole hash/JSON fields
(src/indexes/text/text_index.h operates per-field, not per-window);
chunking is part of the beyond-reference LLM-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def chunk_documents(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", chunk_tokens: int = 128,
                    overlap: int = 0,
                    with_char_offsets: bool = False) -> DataFrame:
    """Explode each document into overlapping fixed-size token windows.

    Returns the input row (minus `text_col`) plus:
      chunk_idx      0-based window index within the document
      token_start    0-based index of the window's first token
      chunk_tokens_n tokens in this window (== chunk_tokens except tail)
      chunk_text     the window's tokens joined with single spaces
      char_start     (optional) 0-based char offset of the window's first
                     token in the WHITESPACE-NORMALIZED text (tokens
                     joined by single spaces) — stable across the
                     original text's whitespace runs.
    """
    if chunk_tokens <= 0:
        raise ValueError("chunk_tokens must be positive")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("overlap must satisfy 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap

    from .dedup import _parallelize

    df = _parallelize(df)        # spread 1-task scans; no-op at scale
    toks = F.split(F.regexp_replace(F.col(text_col), r"^\s+|\s+$", ""),
                   r"\s+")
    # NOTE: deliberately NOT _pin-ned — the whitespace split is cheap
    # enough that the inferred-filter duplication costs less than the
    # pin's lost optimizations (interleaved A/B: pinned 0.51/0.53 s vs
    # 0.35/0.38 s unpinned on the bench row; r13)
    staged = df.withColumn("__toks", toks)
    n = F.size(F.col("__toks"))
    starts = F.sequence(F.lit(0), F.greatest(n - overlap - 1, F.lit(0)),
                        F.lit(stride))
    exploded = staged.select(
        "*", F.posexplode(starts).alias("chunk_idx", "token_start"))

    start = F.col("token_start")
    window = F.slice(F.col("__toks"), start + 1, chunk_tokens)
    out_cols = [c for c in df.columns if c != text_col]
    sel = [*out_cols, "chunk_idx", "token_start",
           F.size(window).alias("chunk_tokens_n"),
           F.array_join(window, " ").alias("chunk_text")]
    if with_char_offsets:
        sel.append(_char_offset(F.col("__toks"), start).alias("char_start"))
    return exploded.select(*sel)


def _char_offset(toks: Column, start: Column) -> Column:
    """Char offset of token `start` in the single-space-joined text:
    sum of lengths of the preceding tokens plus one separator each."""
    prefix = F.slice(toks, 1, start)
    return F.aggregate(prefix, F.lit(0),
                       lambda acc, t: acc + F.length(t) + 1)


def chunk_to_char_spans(chunks: DataFrame) -> DataFrame:
    """Convenience: add `char_end` (exclusive) to a chunked frame that
    carries `char_start` and `chunk_text`."""
    return chunks.withColumn(
        "char_end", F.col("char_start") + F.length("chunk_text"))
