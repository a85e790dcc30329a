"""Unigram-LM (SentencePiece-style) tokenizer trained on the corpus —
the second of the two standard subword families (BPE grows a vocab
bottom-up by merging; Unigram shrinks a seed vocab top-down by EM +
pruning, Kudo 2018 "Subword Regularization").

Shares the byte-level plumbing of ``functions/bpe.py`` — the same
GPT-2 byte<->printable-unicode map and the same pre-token regex on
both the train and apply side — so the two tokenizers are directly
comparable on identical pre-token streams and both round-trip ANY
byte sequence losslessly.

Scale shape (identical posture to BPE, see bpe.py module doc):

- TRAINING consumes only the PRE-TOKEN FREQUENCY table: one
  distributed aggregation; the driver materializes at most
  ``max_word_types`` (pre-token, count) rows. EM then runs driver-side
  over that bounded table — each E-step is a forward-backward pass over
  each word type's segmentation lattice, O(types x len x max_piece_len).
- APPLICATION is an Arrow-batched map (Viterbi per pre-token, LRU-cached,
  vocab shipped via one broadcast) — zero shuffle.

Deliberate deviations from SentencePiece, documented:

- The E-step is the exact lattice forward-backward (expected piece
  counts), but PRUNING uses the expected-count heuristic (drop the
  pieces the model uses least) rather than SentencePiece's
  alternative-segmentation likelihood-loss score. Both shrink toward
  the same vocabulary on Zipfian corpora; the heuristic needs no
  second lattice pass.
- No subword-regularization sampling at encode time (always Viterbi).

Unknown symbols at encode time become their own single-symbol piece
(scored at a fixed penalty), so encode(decode(x)) == x holds even for
inputs whose bytes never occurred in training.

Reference analogue: none (beyond-reference training-pipeline surface,
SURVEY.md §2.10; the reference's text path is search tokenization,
src/text/lexer.h).
"""
from __future__ import annotations

import json
import math
import zlib
from functools import lru_cache

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

from .bpe import _pretokenize_udf, _to_symbols, _UNI_TO_BYTE, pretokenize

_UNK_PENALTY = 16.0  # nats below the worst in-vocab piece


class UnigramTokenizer:
    """A trained unigram vocabulary: piece -> log-probability (nats).
    ``em_loglik`` records the training likelihood trajectory as
    (prune_round, em_iter, corpus_loglik) triples."""

    def __init__(self, vocab: dict[str, float],
                 em_loglik: list[tuple[int, int, float]] | None = None,
                 prune_sizes: list[int] | None = None):
        if not vocab:
            raise ValueError("unigram vocab must be non-empty")
        self.vocab = dict(vocab)
        self.em_loglik = list(em_loglik or [])
        self.prune_sizes = list(prune_sizes or [])  # vocab size per round
        self.max_piece_len = max(len(p) for p in self.vocab)
        self._unk_lp = min(self.vocab.values()) - _UNK_PENALTY
        self.fingerprint = zlib.crc32(json.dumps(
            sorted(self.vocab.items()), ensure_ascii=False).encode("utf-8"))
        self._encode_pretoken = lru_cache(maxsize=65536)(
            self._encode_pretoken_uncached)

    # -- encoding ---------------------------------------------------------
    def _encode_pretoken_uncached(self, pretoken: str) -> tuple[str, ...]:
        s = "".join(_to_symbols(pretoken))
        n = len(s)
        if n == 0:
            return ()
        NEG = float("-inf")
        # Viterbi: best[i] = (score, j, piece) for s[:i]; deterministic
        # tie-break prefers the LONGER final piece, then lexicographic
        best: list[tuple[float, int, str]] = [(0.0, -1, "")] + \
            [(NEG, -1, "")] * n
        vocab, maxlen, unk = self.vocab, self.max_piece_len, self._unk_lp
        for i in range(1, n + 1):
            lo = max(0, i - maxlen)
            cand = best[i]
            for j in range(lo, i):
                if best[j][0] == NEG:
                    continue
                piece = s[j:i]
                lp = vocab.get(piece)
                if lp is None:
                    if i - j > 1:
                        continue
                    lp = unk  # single unknown symbol: always segmentable
                sc = best[j][0] + lp
                if sc > cand[0] or (sc == cand[0] and
                                    (i - j, piece) > (i - cand[1], cand[2])):
                    cand = (sc, j, piece)
            best[i] = cand
        out: list[str] = []
        i = n
        while i > 0:
            _, j, piece = best[i]
            out.append(piece)
            i = j
        out.reverse()
        return tuple(out)

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
            json.dump({"format": "unigram-vocab-v1",
                       "vocab": sorted(self.vocab.items())}, f,
                      ensure_ascii=False)

    @classmethod
    def load(cls, path: str) -> "UnigramTokenizer":
        with open(path, encoding="utf-8") as f:
            obj = json.load(f)
        from ..artifact import check_format

        # ArtifactFormatError (a ValueError) like every other stamped
        # artifact — a foreign tag fails versioned, never deserializes
        check_format(obj, "unigram-vocab-v1", path, allow_missing=False)
        return cls({p: lp for p, lp in obj["vocab"]})

    # -- distributed apply ------------------------------------------------
    def _apply_udf(self, spark, counts_only: bool):
        bc = spark.sparkContext.broadcast(self.vocab)
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
                 out_col: str = "unigram_tokens") -> DataFrame:
        """Add ``out_col`` (array<string>) of Viterbi pieces. Arrow map,
        vocab via one broadcast, no shuffle."""
        return df.withColumn(
            out_col, self._apply_udf(df.sparkSession, False)(F.col(text_col)))

    def token_count(self, df: DataFrame, text_col: str = "text",
                    out_col: str = "unigram_token_count") -> DataFrame:
        """Add ``out_col`` (long): Viterbi piece count per document."""
        return df.withColumn(
            out_col, self._apply_udf(df.sparkSession, True)(F.col(text_col)))

    @staticmethod
    def detokenize(df: DataFrame, tokens_col: str = "unigram_tokens",
                   out_col: str = "text_decoded") -> DataFrame:
        """Add ``out_col`` (string): decoded text for a unigram piece
        array. Decoding needs only the static byte<->unicode table, so
        it is one Arrow map with nothing broadcast — pipelines can
        assert decode(encode(x)) == x distributed, the same lossless
        contract as ``BPETokenizer`` / ``WordPieceTokenizer`` (r11,
        completing the family for the rotation roster)."""
        @F.pandas_udf(T.StringType())
        def udf(tok_arrays: pd.Series) -> pd.Series:
            def dec(ts):
                if ts is None:
                    return None
                return bytes(_UNI_TO_BYTE[c] for t in ts
                             for c in t).decode("utf-8", errors="replace")
            return tok_arrays.map(dec)

        return df.withColumn(out_col, udf(F.col(tokens_col)))


def _tokenizer_from_broadcast(bid: int, bc) -> UnigramTokenizer:
    from ._cache import worker_cached

    return worker_cached("unigram", bid, lambda: UnigramTokenizer(bc.value))


# --------------------------------------------------------------------------
def _logsumexp(vals: list[float]) -> float:
    m = max(vals)
    if m == float("-inf"):
        return m
    return m + math.log(sum(math.exp(v - m) for v in vals))


def _e_step(words: list[tuple[str, int]], vocab: dict[str, float],
            max_piece_len: int) -> tuple[dict[str, float], float]:
    """Exact lattice forward-backward: expected piece counts and total
    corpus log-likelihood (freq-weighted)."""
    counts: dict[str, float] = {}
    total_ll = 0.0
    NEG = float("-inf")
    for s, freq in words:
        n = len(s)
        fwd = [0.0] + [NEG] * n
        for i in range(1, n + 1):
            acc = []
            for j in range(max(0, i - max_piece_len), i):
                lp = vocab.get(s[j:i])
                if lp is not None and fwd[j] != NEG:
                    acc.append(fwd[j] + lp)
            if acc:
                fwd[i] = _logsumexp(acc)
        z = fwd[n]
        if z == NEG:   # unsegmentable (cannot happen with full singles)
            continue
        bwd = [NEG] * n + [0.0]
        for j in range(n - 1, -1, -1):
            acc = []
            for i in range(j + 1, min(n, j + max_piece_len) + 1):
                lp = vocab.get(s[j:i])
                if lp is not None and bwd[i] != NEG:
                    acc.append(lp + bwd[i])
            if acc:
                bwd[j] = _logsumexp(acc)
        total_ll += freq * z
        for j in range(n):
            if fwd[j] == NEG:
                continue
            for i in range(j + 1, min(n, j + max_piece_len) + 1):
                piece = s[j:i]
                lp = vocab.get(piece)
                if lp is not None and bwd[i] != NEG:
                    w = freq * math.exp(fwd[j] + lp + bwd[i] - z)
                    counts[piece] = counts.get(piece, 0.0) + w
    return counts, total_ll


def train_unigram(df: DataFrame, text_col: str = "text",
                  vocab_size: int = 1024, max_word_types: int = 50_000,
                  seed_size: int | None = None, max_piece_len: int = 8,
                  em_iters: int = 2, prune_keep: float = 0.75,
                  ) -> UnigramTokenizer:
    """Train a unigram-LM vocabulary on a corpus DataFrame.

    One distributed pre-token frequency aggregation (bounded at
    ``max_word_types`` types, deterministic tie-break), then driver-side
    seed -> (EM x ``em_iters`` -> prune to ``prune_keep``) until the
    vocab fits ``vocab_size``, then a final EM polish. Every single
    symbol occurring in the corpus stays in the vocab permanently
    (coverage guarantee). Corpus log-likelihood is non-decreasing within
    each fixed-vocab EM phase (the EM invariant — pinned in tests).
    """
    if vocab_size < 2:
        raise ValueError("vocab_size must be >= 2")
    seed_size = seed_size or max(4 * vocab_size, 256)
    rows = (df.select(F.explode(_pretokenize_udf(F.col(text_col)))
                      .alias("w"))
            .groupBy("w").count()
            .orderBy(F.desc("count"), F.asc("w"))
            .limit(max_word_types)
            .collect())
    words = [("".join(_to_symbols(r["w"])), int(r["count"])) for r in rows]
    if not words:
        raise ValueError("empty corpus: no pre-tokens to train on")

    # seed: all singles (mandatory, coverage) + most frequent substrings
    singles: dict[str, float] = {}
    cand: dict[str, float] = {}
    for s, freq in words:
        n = len(s)
        for i in range(n):
            singles[s[i]] = singles.get(s[i], 0.0) + freq
            for ln in range(2, min(max_piece_len, n - i) + 1):
                p = s[i:i + ln]
                cand[p] = cand.get(p, 0.0) + freq
    if vocab_size <= len(singles):
        raise ValueError(
            f"vocab_size={vocab_size} cannot cover the corpus' "
            f"{len(singles)} distinct symbols (coverage is mandatory)")
    top = sorted(cand.items(), key=lambda kv: (-kv[1], kv[0]))
    top = top[:max(0, seed_size - len(singles))]
    counts = dict(singles)
    counts.update(top)

    def normalize(c: dict[str, float]) -> dict[str, float]:
        tot = sum(c.values())
        return {p: math.log(v / tot) for p, v in c.items() if v > 0}

    vocab = normalize(counts)
    history: list[tuple[int, int, float]] = []
    sizes: list[int] = [len(vocab)]
    rnd = 0
    while True:
        for it in range(em_iters):
            counts, ll = _e_step(words, vocab, max_piece_len)
            history.append((rnd, it, ll))
            # singles with zero expected count must survive (coverage):
            # floor them at a tiny count before normalizing
            for ch in singles:
                counts[ch] = max(counts.get(ch, 0.0), 1e-6)
            vocab = normalize(counts)
        if len(vocab) <= vocab_size:
            break
        # prune: keep singles + the most-used multi-symbol pieces
        multi = sorted(
            ((p, c) for p, c in counts.items() if len(p) > 1),
            key=lambda kv: (-kv[1], kv[0]))
        # shrink the MULTI-piece pool by prune_keep per round (singles
        # are exempt from pruning and don't scale the kept count), never
        # below what vocab_size still allows
        keep_n = max(vocab_size - len(singles),
                     int(len(multi) * prune_keep))
        keep_n = min(keep_n, len(multi))
        if len(singles) + len(multi) <= vocab_size:
            break
        counts = {p: counts.get(p, 1e-6) for p in singles}
        counts.update(dict(multi[:keep_n]))
        vocab = normalize(counts)
        sizes.append(len(vocab))
        rnd += 1
    # final polish at the fixed final vocab
    counts, ll = _e_step(words, vocab, max_piece_len)
    history.append((rnd + 1, 0, ll))
    for ch in singles:
        counts[ch] = max(counts.get(ch, 0.0), 1e-6)
    return UnigramTokenizer(normalize(counts), em_loglik=history,
                            prune_sizes=sizes)
