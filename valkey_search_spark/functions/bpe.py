"""Byte-level BPE tokenizer trained on the corpus — Spark-first.

True LLM token counts (not the pre-tokenizer-piece estimate in
``textops.bpe_piece_count_col``) need a merge table. This module trains
one with the published byte-level BPE recipe (Sennrich et al. 2016
merges over GPT-2-style byte-to-unicode symbols and pre-token splits,
Radford et al. 2019) and applies it distributed.

Scale shape, deliberately:

- TRAINING needs only PRE-TOKEN FREQUENCIES. That is one distributed
  aggregation (Arrow pre-tokenize -> explode -> groupBy count); the
  driver never sees the corpus, only the top ``max_word_types``
  (pre-token, count) rows — the same bounded-materialization contract
  as PQ/KMeans training. At 100 TB the aggregation is the only corpus
  pass and distinct pre-token types are capped by construction.
- The MERGE LOOP runs driver-side over those bounded types with
  incremental pair-count maintenance (only words containing the merged
  pair are touched), so cost is O(types x avg_len + merges x touched),
  not O(merges x types).
- APPLICATION is an Arrow-batched map with the merge ranks shipped via
  a Spark broadcast — embarrassingly parallel, zero shuffle. BPE apply
  is inherently Python here (real deployments bind a native tokenizer);
  the per-pre-token LRU cache makes the common path a dict hit.

Reference analogue: none — the reference engine has no tokenizer
training (its text path is search tokenization, src/text/); this is a
beyond-reference training-pipeline operator per SURVEY.md §2.10.
"""
from __future__ import annotations

import json
import re
import zlib
from functools import lru_cache

import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F, types as T

# Python twin of textops._BPE_PRETOKEN_RE (stdlib re has no \p{L}; the
# [^\W\d_] idiom is the unicode-letter class, and the punctuation
# alternative needs `|_` because \w-based classes treat underscore as a
# word char while \p{L}\p{N} does not — without it '_' matches NOTHING
# and encode() silently drops it, breaking the round-trip contract).
# Used on BOTH the training and the apply side so pre-token splits are
# identical by construction.
_PRETOKEN_RE = re.compile(
    r"'s|'t|'re|'ve|'m|'ll|'d| ?[^\W\d_]+| ?\d+| ?(?:[^\s\w]|_)+|\s+",
    re.UNICODE,
)


def _bytes_to_unicode() -> dict[int, str]:
    """GPT-2's reversible byte<->printable-unicode map (public algorithm
    from the gpt-2 repository): printable latin-1 bytes map to
    themselves, the rest to U+0100.. so every token is a visible
    string and any byte sequence round-trips."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(0xA1, 0xAD)) + list(range(0xAE, 0x100)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, map(chr, cs)))


_BYTE_TO_UNI = _bytes_to_unicode()
_UNI_TO_BYTE = {v: k for k, v in _BYTE_TO_UNI.items()}


def _to_symbols(pretoken: str) -> tuple[str, ...]:
    return tuple(_BYTE_TO_UNI[b] for b in pretoken.encode("utf-8"))


def pretokenize(text: str) -> list[str]:
    return _PRETOKEN_RE.findall(text)


@F.pandas_udf(T.ArrayType(T.StringType()))
def _pretokenize_udf(texts: pd.Series) -> pd.Series:
    return texts.map(lambda t: _PRETOKEN_RE.findall(t)
                     if isinstance(t, str) else None)


def _merge_word(sym: tuple[str, ...], pair: tuple[str, str],
                joined: str) -> tuple[str, ...]:
    out, i, n = [], 0, len(sym)
    while i < n:
        if i + 1 < n and sym[i] == pair[0] and sym[i + 1] == pair[1]:
            out.append(joined)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def _pairs_of(sym: tuple[str, ...]) -> dict[tuple[str, str], int]:
    d: dict[tuple[str, str], int] = {}
    for a, b in zip(sym, sym[1:]):
        d[(a, b)] = d.get((a, b), 0) + 1
    return d


class BPETokenizer:
    """A trained merge table. ``merges`` is the ordered list of
    (left, right) pairs; rank = list position (lower merges first)."""

    def __init__(self, merges: list[tuple[str, str]]):
        self.merges = [tuple(m) for m in merges]
        self.ranks = {m: i for i, m in enumerate(self.merges)}
        # content fingerprint: worker-side caches key on this, so every
        # apply of the SAME merge table reuses one tokenizer per worker
        self.fingerprint = zlib.crc32(
            json.dumps(self.merges).encode("utf-8"))
        self._encode_pretoken = lru_cache(maxsize=65536)(
            self._encode_pretoken_uncached)

    # -- encoding ---------------------------------------------------------
    def _encode_pretoken_uncached(self, pretoken: str) -> tuple[str, ...]:
        sym = _to_symbols(pretoken)
        if len(sym) < 2:
            return sym
        ranks = self.ranks
        while True:
            best, best_rank = None, None
            for p in zip(sym, sym[1:]):
                r = ranks.get(p)
                if r is not None and (best_rank is None or r < best_rank):
                    best, best_rank = p, r
            if best is None:
                return sym
            sym = _merge_word(sym, best, best[0] + best[1])
            if len(sym) < 2:
                return sym

    def encode(self, text: str) -> list[str]:
        out: list[str] = []
        for pt in pretokenize(text):
            out.extend(self._encode_pretoken(pt))
        return out

    def decode(self, tokens: list[str]) -> str:
        data = bytes(_UNI_TO_BYTE[c] for t in tokens for c in t)
        return data.decode("utf-8", errors="replace")

    # -- persistence ------------------------------------------------------
    def save(self, path: str) -> None:
        with open(path, "w", encoding="utf-8") as f:
            json.dump({"format": "bpe-merges-v1",
                       "merges": [list(m) for m in self.merges]}, f,
                      ensure_ascii=False)

    @classmethod
    def load(cls, path: str) -> "BPETokenizer":
        with open(path, encoding="utf-8") as f:
            obj = json.load(f)
        from ..artifact import check_format

        # ArtifactFormatError (a ValueError) like every other stamped
        # artifact — a foreign tag fails versioned, never deserializes
        check_format(obj, "bpe-merges-v1", path, allow_missing=False)
        return cls([tuple(m) for m in obj["merges"]])

    # -- distributed apply --------------------------------------------------
    def _apply_udf(self, spark, counts_only: bool):
        bc = spark.sparkContext.broadcast(self.merges)
        bid = self.fingerprint             # worker-cache key: same merge
        #                                    table -> same cached tokenizer

        if counts_only:
            @F.pandas_udf(T.LongType())
            def udf(texts: pd.Series) -> pd.Series:
                tok = _tokenizer_from_broadcast(bid, bc)
                return texts.map(
                    lambda t: len(tok.encode(t))
                    if isinstance(t, str) else None).astype("Int64")
        else:
            @F.pandas_udf(T.ArrayType(T.StringType()))
            def udf(texts: pd.Series) -> pd.Series:
                tok = _tokenizer_from_broadcast(bid, bc)
                return texts.map(
                    lambda t: tok.encode(t) if isinstance(t, str) else None)
        return udf

    def tokenize(self, df: DataFrame, text_col: str = "text",
                 out_col: str = "bpe_tokens") -> DataFrame:
        """Add ``out_col`` (array<string>) of BPE tokens. Arrow-batched
        map, merge ranks via one broadcast, no shuffle."""
        spark = df.sparkSession
        return df.withColumn(out_col,
                             self._apply_udf(spark, False)(F.col(text_col)))

    def token_count(self, df: DataFrame, text_col: str = "text",
                    out_col: str = "bpe_token_count") -> DataFrame:
        """Add ``out_col`` (long): TRUE trained-BPE token count (compare
        textops.bpe_piece_count_col, the merge-free JVM estimate)."""
        spark = df.sparkSession
        return df.withColumn(out_col,
                             self._apply_udf(spark, True)(F.col(text_col)))

    @staticmethod
    def detokenize(df: DataFrame, tokens_col: str = "bpe_tokens",
                   out_col: str = "text_decoded") -> DataFrame:
        """Add ``out_col`` (string): the decoded text for a BPE token
        array. Decoding is merge-free (the static byte<->unicode table
        only), so this is one Arrow-batched map with nothing broadcast
        — any pipeline can assert decode(encode(x)) == x distributed,
        the lossless-byte-level contract pinned in tests/test_bpe.py."""
        @F.pandas_udf(T.StringType())
        def udf(tok_arrays: pd.Series) -> pd.Series:
            def dec(ts):
                if ts is None:
                    return None
                return bytes(_UNI_TO_BYTE[c] for t in ts
                             for c in t).decode("utf-8", errors="replace")
            return tok_arrays.map(dec)

        return df.withColumn(out_col, udf(F.col(tokens_col)))


# Executor-side tokenizer rebuild: one instance (and one pre-token cache)
# per MERGE TABLE per worker — shared bounded cache in _cache.py.
def _tokenizer_from_broadcast(bid: int, bc) -> BPETokenizer:
    from ._cache import worker_cached

    return worker_cached("bpe", bid, lambda: BPETokenizer(bc.value))


def train_bpe(df: DataFrame, text_col: str = "text",
              vocab_size: int = 1024, max_word_types: int = 50_000,
              min_pair_count: int = 2) -> BPETokenizer:
    """Train byte-level BPE merges on a corpus DataFrame.

    ``vocab_size`` counts the 256 byte symbols, so the number of merges
    learned is ``vocab_size - 256`` (fewer if no pair reaches
    ``min_pair_count``). The corpus pass is one distributed pre-token
    frequency aggregation; the driver materializes at most
    ``max_word_types`` (pre-token, count) rows — ties broken by
    pre-token for a deterministic type set — and runs the published
    merge loop with incremental pair-count updates.
    """
    n_merges = vocab_size - 256
    if n_merges <= 0:
        return BPETokenizer([])
    rows = (df.select(F.explode(_pretokenize_udf(F.col(text_col)))
                      .alias("w"))
            .groupBy("w").count()
            .orderBy(F.desc("count"), F.asc("w"))
            .limit(max_word_types)
            .collect())

    words: list[tuple[str, ...]] = []
    freqs: list[int] = []
    for r in rows:
        sym = _to_symbols(r["w"])
        if len(sym) >= 2:
            words.append(sym)
            freqs.append(int(r["count"]))

    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for wi, sym in enumerate(words):
        for p, k in _pairs_of(sym).items():
            pair_counts[p] = pair_counts.get(p, 0) + k * freqs[wi]
            pair_words.setdefault(p, set()).add(wi)

    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges and pair_counts:
        # deterministic argmax: count desc, then pair lexicographic
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] < min_pair_count:
            break
        merges.append(best)
        joined = best[0] + best[1]
        for wi in list(pair_words.get(best, ())):
            old = words[wi]
            new = _merge_word(old, best, joined)
            words[wi] = new
            f = freqs[wi]
            new_pairs = _pairs_of(new)
            for p, k in _pairs_of(old).items():
                c = pair_counts.get(p, 0) - k * f
                if c <= 0:
                    pair_counts.pop(p, None)
                else:
                    pair_counts[p] = c
                if p not in new_pairs:
                    pw = pair_words.get(p)
                    if pw is not None:
                        pw.discard(wi)
                        if not pw:
                            pair_words.pop(p, None)
            for p, k in new_pairs.items():
                pair_counts[p] = pair_counts.get(p, 0) + k * f
                pair_words.setdefault(p, set()).add(wi)
        pair_counts.pop(best, None)
        pair_words.pop(best, None)
    return BPETokenizer(merges)
