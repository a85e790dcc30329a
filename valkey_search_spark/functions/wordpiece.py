"""Corpus-trained WordPiece tokenizer — the BERT-family subword model,
completing the three major families next to BPE (``functions/bpe.py``)
and Unigram-LM (``functions/unigram.py``).

Same byte-symbol substrate and pre-token stream as the other two
(GPT-2's reversible byte<->unicode map + the published pre-tokenizer
regex), so all three tokenize identical word streams and differ only
in the subword model:

- **Training** (the likelihood form popularized by the original
  Schuster-Nakajima WordPiece and implemented by the public
  HuggingFace trainer): greedy merges like BPE, but scored by the
  unigram-LM likelihood GAIN of the merge,
  ``score(a, b) = count(ab) / (count(a) * count(b))``,
  instead of raw pair frequency. Continuation symbols carry the
  ``##`` prefix from the start, so learned pieces are word-initial or
  ``##``-continuations exactly as BERT vocabularies are. The corpus
  pass is the SAME single bounded pre-token frequency aggregation as
  the other trainers (driver sees <= max_word_types rows); the merge
  loop updates pair AND symbol counts incrementally.
- **Encoding**: the published greedy longest-match-first algorithm.
  Classic WordPiece emits [UNK] for unmatchable words; here the base
  vocabulary always contains all 256 byte symbols and their ``##``
  twins, so every byte sequence segments and
  ``decode(encode(x)) == x`` holds losslessly — the same contract the
  other two families guarantee (a data pipeline must never destroy
  text it tokenizes).

Distributed apply mirrors the siblings: one Arrow map with the vocab
broadcast once and a per-worker tokenizer cache (``_cache.py``), zero
shuffle. Oracles: brute-force score-recount trainer pin, hand
segmentations, distributed == driver, hypothesis round-trip fuzz
(tests/test_wordpiece.py).
"""

from __future__ import annotations

import json
import zlib
from functools import lru_cache

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

from .bpe import (_merge_word, _pairs_of, _pretokenize_udf, _to_symbols,
                  _UNI_TO_BYTE, _BYTE_TO_UNI, pretokenize)


def _base_vocab() -> set[str]:
    singles = set(_BYTE_TO_UNI.values())
    return singles | {"##" + s for s in singles}


class WordPieceTokenizer:
    """A trained WordPiece vocabulary (word-initial pieces and
    ``##``-prefixed continuations; always includes the 512 byte-symbol
    bases, so encoding never fails).

    Word-initial and continuation pieces live in SEPARATE lookup sets:
    a flat set would let text that literally starts with ``##`` (a
    markdown header) match a continuation entry at word-initial
    position, and decode() would then strip real characters. For the
    same reason, trained word-initial pieces whose text itself starts
    with ``##`` are rejected — so in the rendered token stream a
    leading ``##`` ALWAYS means continuation and round-trip holds."""

    def __init__(self, pieces: list[str] | set[str] = ()):
        singles = set(_BYTE_TO_UNI.values())
        self.initial = set(singles)
        self.cont = set(singles)          # stored WITHOUT the marker
        for p in pieces:
            if p.startswith("##"):
                # In the serialized form a leading '##' IS the
                # continuation marker (the HF-BERT convention), so an
                # entry like '####' denotes a continuation whose TEXT
                # is '##' — the trainer legitimately emits these from
                # markdown-header corpora, and they round-trip because
                # decode strips exactly ONE marker. A "word-initial
                # piece with '##' text" is therefore UNREPRESENTABLE
                # here rather than silently reclassified (r10 ADVICE
                # asked for a constructor raise; that would reject the
                # trainer's own output — see
                # tests/test_wordpiece.py::test_marker_prefixed_pieces
                # _roundtrip for the proof that round-trip holds for
                # every classification, so there is no invalid shape
                # to detect).
                self.cont.add(p[2:])
            else:
                self.initial.add(p)
        self.vocab = self.initial | {"##" + p for p in self.cont}
        self.max_sym_len = max(map(len, self.initial | self.cont))
        self.fingerprint = zlib.crc32(json.dumps(
            sorted(self.vocab), ensure_ascii=False).encode("utf-8"))
        self._encode_pretoken = lru_cache(maxsize=65536)(
            self._encode_pretoken_uncached)

    # -- encoding ---------------------------------------------------------
    def _encode_pretoken_uncached(self, pretoken: str) -> tuple[str, ...]:
        s = "".join(_to_symbols(pretoken))
        n = len(s)
        out: list[str] = []
        i = 0
        while i < n:
            table = self.cont if i else self.initial
            # longest match first; single byte symbols always present
            for ln in range(min(self.max_sym_len, n - i), 0, -1):
                if s[i:i + ln] in table:
                    out.append(("##" if i else "") + s[i:i + ln])
                    i += ln
                    break
        return tuple(out)

    def encode(self, text: str) -> list[str]:
        out: list[str] = []
        for pt in pretokenize(text):
            out.extend(self._encode_pretoken(pt))
        return out

    def decode(self, tokens: list[str]) -> str:
        data = bytes(_UNI_TO_BYTE[c]
                     for t in tokens
                     for c in (t[2:] if t.startswith("##") else t))
        return data.decode("utf-8", errors="replace")

    # -- persistence ------------------------------------------------------
    def save(self, path: str) -> None:
        learned = sorted(self.vocab - _base_vocab())
        with open(path, "w", encoding="utf-8") as f:
            json.dump({"format": "wordpiece-vocab-v1",
                       "pieces": learned}, f, ensure_ascii=False)

    @classmethod
    def load(cls, path: str) -> "WordPieceTokenizer":
        with open(path, encoding="utf-8") as f:
            obj = json.load(f)
        from ..artifact import check_format

        # ArtifactFormatError (a ValueError) like every other stamped
        # artifact — a foreign tag fails versioned, never deserializes
        check_format(obj, "wordpiece-vocab-v1", path, allow_missing=False)
        return cls(obj["pieces"])

    # -- distributed apply ------------------------------------------------
    def _apply_udf(self, spark, counts_only: bool):
        bc = spark.sparkContext.broadcast(
            sorted(self.vocab - _base_vocab()))
        bid = self.fingerprint

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
                 out_col: str = "wordpiece_tokens") -> DataFrame:
        """Add ``out_col`` (array<string>) of WordPiece pieces. Arrow
        map, vocab via one broadcast, no shuffle."""
        return df.withColumn(
            out_col, self._apply_udf(df.sparkSession, False)(F.col(text_col)))

    def token_count(self, df: DataFrame, text_col: str = "text",
                    out_col: str = "wordpiece_token_count") -> DataFrame:
        """Add ``out_col`` (long): piece count per document."""
        return df.withColumn(
            out_col, self._apply_udf(df.sparkSession, True)(F.col(text_col)))

    @staticmethod
    def detokenize(df: DataFrame, tokens_col: str = "wordpiece_tokens",
                   out_col: str = "text_decoded") -> DataFrame:
        """Add ``out_col`` (string): decoded text for a WordPiece token
        array. Decoding needs only the static byte<->unicode table (##
        markers strip off), so it is one Arrow map with nothing
        broadcast — pipelines can assert decode(encode(x)) == x
        distributed, the same lossless contract as ``BPETokenizer``."""
        @F.pandas_udf(T.StringType())
        def udf(tok_arrays: pd.Series) -> pd.Series:
            def dec(ts):
                if ts is None:
                    return None
                return bytes(
                    _UNI_TO_BYTE[c] for t in ts
                    for c in (t[2:] if t.startswith("##") else t)
                ).decode("utf-8", errors="replace")
            return tok_arrays.map(dec)

        return df.withColumn(out_col, udf(F.col(tokens_col)))


def _tokenizer_from_broadcast(bid: int, bc) -> WordPieceTokenizer:
    from ._cache import worker_cached

    return worker_cached("wordpiece", bid,
                         lambda: WordPieceTokenizer(bc.value))


# --------------------------------------------------------------------------
def _prefixed_symbols(word: str) -> tuple[str, ...]:
    sym = _to_symbols(word)
    return sym[:1] + tuple("##" + s for s in sym[1:])


def _merge_piece(a: str, b: str) -> str:
    return a + (b[2:] if b.startswith("##") else b)


def train_wordpiece(df: DataFrame, text_col: str = "text",
                    vocab_size: int = 1024, max_word_types: int = 50_000,
                    min_pair_count: int = 2) -> WordPieceTokenizer:
    """Train WordPiece pieces on a corpus DataFrame. ``vocab_size``
    counts the 512 byte-base symbols; merges learned =
    ``vocab_size - 512`` (fewer if no pair reaches ``min_pair_count``).
    One distributed pre-token frequency aggregation (driver bounded at
    ``max_word_types`` types), then the likelihood-scored merge loop
    with incremental pair + symbol counts."""
    n_merges = vocab_size - 512
    if n_merges <= 0:
        return WordPieceTokenizer()
    rows = (df.select(F.explode(_pretokenize_udf(F.col(text_col)))
                      .alias("w"))
            .groupBy("w").count()
            .orderBy(F.desc("count"), F.asc("w"))
            .limit(max_word_types)
            .collect())

    words: list[tuple[str, ...]] = []
    freqs: list[int] = []
    for r in rows:
        sym = _prefixed_symbols(r["w"])
        if len(sym) >= 2:
            words.append(sym)
            freqs.append(int(r["count"]))

    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    sym_counts: dict[str, int] = {}
    for wi, sym in enumerate(words):
        f = freqs[wi]
        for s in sym:
            sym_counts[s] = sym_counts.get(s, 0) + f
        for p, kcnt in _pairs_of(sym).items():
            pair_counts[p] = pair_counts.get(p, 0) + kcnt * f
            pair_words.setdefault(p, set()).add(wi)

    pieces: list[str] = []
    banned: set[tuple[str, str]] = set()
    while len(pieces) < n_merges:
        # deterministic argmax of count(ab)/(count(a)count(b)) among
        # ELIGIBLE pairs: score desc, then pair lexicographic. A pair
        # below min_pair_count is skipped, not a stop condition —
        # likelihood scoring RANKS rare pairs high (tiny denominators),
        # so a count-based break would end training while frequent
        # pairs remain.
        def key(kv):
            p, c = kv
            denom = sym_counts.get(p[0], 1) * sym_counts.get(p[1], 1)
            return (-c / denom, p)

        eligible = [(p, c) for p, c in pair_counts.items()
                    if c >= min_pair_count and p not in banned]
        if not eligible:
            break
        best, best_c = min(eligible, key=key)
        joined = _merge_piece(*best)
        if not best[0].startswith("##") and joined.startswith("##"):
            # a word-initial piece whose TEXT starts with '##' would
            # collide with the continuation marker in the rendered
            # token stream (markdown-header corpora) — never learn it
            banned.add(best)
            continue
        pieces.append(joined)
        for wi in list(pair_words.get(best, ())):
            old = words[wi]
            new = _merge_word(old, best, joined)
            words[wi] = new
            f = freqs[wi]
            # symbol counts: remove the old word's multiset, add new's
            for s in old:
                c = sym_counts.get(s, 0) - f
                if c <= 0:
                    sym_counts.pop(s, None)
                else:
                    sym_counts[s] = c
            for s in new:
                sym_counts[s] = sym_counts.get(s, 0) + f
            new_pairs = _pairs_of(new)
            for p, kcnt in _pairs_of(old).items():
                c = pair_counts.get(p, 0) - kcnt * f
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
            for p, kcnt in new_pairs.items():
                pair_counts[p] = pair_counts.get(p, 0) + kcnt * f
                pair_words.setdefault(p, set()).add(wi)
        pair_counts.pop(best, None)
        pair_words.pop(best, None)
    return WordPieceTokenizer(pieces)
