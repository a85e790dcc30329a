"""Unigram-LM tokenizer: Viterbi optimality vs brute force, EM
likelihood invariant, lossless round-trip, distributed parity."""
from __future__ import annotations

import itertools
import math

import pytest

from pyspark.sql import functions as F

from tests.conftest import load
from valkey_search_spark.functions.bpe import _to_symbols
from valkey_search_spark.functions.unigram import (
    UnigramTokenizer, train_unigram,
)


@pytest.fixture(scope="module")
def tok(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").limit(200)
    return train_unigram(docs, vocab_size=400, max_word_types=5000,
                         max_piece_len=6)


def _brute_best(tok, pretoken):
    """Enumerate every segmentation over the vocab (+ unk singles),
    return the max score; None if the Viterbi result scores lower."""
    s = "".join(_to_symbols(pretoken))
    n = len(s)

    def score(pieces):
        t = 0.0
        for p in pieces:
            lp = tok.vocab.get(p)
            if lp is None:
                if len(p) > 1:
                    return None
                lp = tok._unk_lp
            t += lp
        return t

    best = None
    for cuts in itertools.chain.from_iterable(
            itertools.combinations(range(1, n), r) for r in range(n)):
        bounds = [0, *cuts, n]
        sc = score([s[a:b] for a, b in zip(bounds, bounds[1:])])
        if sc is not None and (best is None or sc > best):
            best = sc
    return best


def test_viterbi_is_optimal(tok):
    for w in ["sort", "window", "batch", "the", "a", "join", "zzqx"]:
        pieces = tok._encode_pretoken(w)
        got = sum(tok.vocab.get(p, tok._unk_lp) for p in pieces)
        want = _brute_best(tok, w)
        assert got == pytest.approx(want), (w, pieces)


def test_em_loglik_monotonic_within_fixed_vocab(tok):
    # the EM invariant: within one prune round (fixed vocab), corpus
    # log-likelihood never decreases
    by_round: dict[int, list[float]] = {}
    for rnd, _it, ll in tok.em_loglik:
        by_round.setdefault(rnd, []).append(ll)
    assert by_round
    for rnd, lls in by_round.items():
        for a, b in zip(lls, lls[1:]):
            assert b >= a - 1e-9, (rnd, lls)


def test_round_trip_lossless(tok):
    for text in ["the quick brown fox", "snake_case_words stay",
                 "unicode: naïve café 既定 🦊", "tabs\tand\nnewlines",
                 "bytes never seen: \x07\x1b[0m"]:
        assert tok.decode(tok.encode(text)) == text


def test_coverage_all_corpus_symbols_in_vocab(spark, tok, sf_dir):
    docs = load(spark, sf_dir, "documents").limit(200)
    sample = " ".join(r["text"] for r in docs.limit(20).collect())
    for ch in set("".join(_to_symbols(sample))):
        assert ch in tok.vocab


def test_compresses_vs_char_level(tok, spark, sf_dir):
    texts = [r["text"] for r in
             load(spark, sf_dir, "documents").limit(50).collect()]
    n_tok = sum(len(tok.encode(t)) for t in texts)
    n_sym = sum(len("".join(_to_symbols(t))) for t in texts)
    assert n_tok < 0.6 * n_sym  # trained pieces beat char-level


def test_distributed_matches_driver(tok, spark, sf_dir):
    docs = load(spark, sf_dir, "documents").limit(40)
    rows = tok.token_count(docs).select("doc_id", "text",
                                        "unigram_token_count").collect()
    for r in rows:
        assert r["unigram_token_count"] == len(tok.encode(r["text"]))
    toks = tok.tokenize(docs.limit(5)).collect()
    for r in toks:
        assert list(r["unigram_tokens"]) == tok.encode(r["text"])


def test_deterministic_training(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").limit(60)
    a = train_unigram(docs, vocab_size=300, max_piece_len=5)
    b = train_unigram(docs, vocab_size=300, max_piece_len=5)
    assert a.vocab == b.vocab


def test_save_load_round_trip(tok, tmp_path):
    p = str(tmp_path / "uni.json")
    tok.save(p)
    back = UnigramTokenizer.load(p)
    assert back.vocab == tok.vocab
    assert back.encode("window sort") == tok.encode("window sort")
    with pytest.raises(ValueError):
        UnigramTokenizer({})


def test_vocab_size_respected(tok, spark, sf_dir):
    assert len(tok.vocab) <= 400
    docs = load(spark, sf_dir, "documents").limit(10)
    with pytest.raises(ValueError):
        train_unigram(docs, vocab_size=3)  # below the symbol count


def test_unk_single_symbol_piece(tok):
    pieces = tok.encode("\x00\x01")
    assert pieces and all(len(p) == 1 for p in pieces)
    assert tok.decode(pieces) == "\x00\x01"


def test_detokenize_distributed_roundtrip(spark, sf_dir):
    """decode(encode(x)) == x distributed, the lossless contract the
    BPE/WordPiece rows already drive — detokenize added in r11 so the
    unigram tokenizer can take a driver rotation slot with the same
    invariant oracle."""
    from pyspark.sql import functions as F

    from valkey_search_spark.functions.unigram import train_unigram

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(120)
    extra = spark.createDataFrame(
        [(900001, "unicode café 中文 mixed"), (900002, None),
         (900003, "double  spaced\ttab")],
        "doc_id long, text string")
    df = docs.select("doc_id", "text").unionByName(extra)
    tok = train_unigram(docs, vocab_size=512 + 128)
    out = tok.detokenize(tok.tokenize(df)).select(
        "doc_id",
        (F.col("text_decoded") == F.col("text")).alias("ok"),
        F.size("unigram_tokens").alias("n"),
        F.octet_length("text").alias("b")).collect()
    for r in out:
        if r["ok"] is None:
            continue
        assert r["ok"], r["doc_id"]
        assert 0 < r["n"] <= r["b"], r
