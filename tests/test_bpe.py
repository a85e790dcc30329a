"""Byte-level BPE: the incremental trainer is pinned by a brute-force
recount trainer written here; encoding is pinned by losslessness (byte
fallback) and by the distributed apply matching the driver encoder."""
from __future__ import annotations

import numpy as np
import pytest

from valkey_search_spark.functions.bpe import (
    BPETokenizer,
    _merge_word,
    _pairs_of,
    _to_symbols,
    pretokenize,
    train_bpe,
)

rng = np.random.default_rng(6)


# ---------------------------------------------------------------------------
# brute-force reference trainer: full pair recount each iteration

def _brute_force_merges(word_freqs: dict[str, int], n_merges: int,
                        min_pair_count: int = 2):
    words = {i: _to_symbols(w) for i, w in enumerate(word_freqs)}
    freqs = dict(enumerate(word_freqs.values()))
    merges = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for i, sym in words.items():
            for p, k in _pairs_of(sym).items():
                counts[p] = counts.get(p, 0) + k * freqs[i]
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if counts[best] < min_pair_count:
            break
        merges.append(best)
        words = {i: _merge_word(s, best, best[0] + best[1])
                 for i, s in words.items()}
    return merges


def _df_from_freqs(spark, word_freqs):
    # one doc per word occurrence, shuffled — trainer sees a plain corpus
    docs = [w for w, n in word_freqs.items() for _ in range(n)]
    rng.shuffle(docs)
    return spark.createDataFrame([(t,) for t in docs], ["text"])


def test_trainer_matches_brute_force_on_random_corpus(spark):
    vocab = ["low", "lower", "newest", "widest", "new", "west",
             "widget", "bolt", "cold weld"]
    word_freqs = {w: int(rng.integers(1, 30)) for w in vocab}
    df = _df_from_freqs(spark, word_freqs)
    tok = train_bpe(df, vocab_size=256 + 12, min_pair_count=2)
    # the reference trainer works on the SAME pre-token multiset
    ref_freqs: dict[str, int] = {}
    for w, n in word_freqs.items():
        for pt in pretokenize(w):
            ref_freqs[pt] = ref_freqs.get(pt, 0) + n
    assert tok.merges == _brute_force_merges(ref_freqs, 12)


def test_trainer_first_merge_is_most_frequent_pair(spark):
    df = spark.createDataFrame([("aaab",)] * 10 + [("ccd",)] * 3, ["text"])
    tok = train_bpe(df, vocab_size=256 + 1)
    assert tok.merges == [("a", "a")]


def test_min_pair_count_stops_early(spark):
    df = spark.createDataFrame([("xy",)], ["text"])   # every pair count 1
    tok = train_bpe(df, vocab_size=256 + 5, min_pair_count=2)
    assert tok.merges == []


# ---------------------------------------------------------------------------
# encode / decode

def _trained(spark):
    docs = [("the quick brown fox jumps over the lazy dog",),
            ("the quicker the better, the lazier the worse",),
            ("pack my box with five dozen liquor jugs",)] * 20
    return train_bpe(spark.createDataFrame(docs, ["text"]),
                     vocab_size=256 + 40)


def test_encode_decode_lossless(spark):
    tok = _trained(spark)
    for text in ["the quick brown fox", "completely unseen zqxjv words!",
                 "unicode: héllo wörld — naïve 日本語 🙂", "", "   spaces  ",
                 "line\nbreaks\tand\ttabs"]:
        assert tok.decode(tok.encode(text)) == text


def test_merges_compress(spark):
    tok = _trained(spark)
    text = "the quick brown fox jumps over the lazy dog"
    n_tokens = len(tok.encode(text))
    n_bytes = len(text.encode("utf-8"))
    assert n_tokens < n_bytes
    # untrained tokenizer = pure bytes
    assert len(BPETokenizer([]).encode(text)) == n_bytes


def test_merge_order_respects_rank():
    # rank 0 ('a','b') must win inside 'abc' even though ('b','c') exists
    tok = BPETokenizer([("a", "b"), ("b", "c"), ("ab", "c")])
    assert tok._encode_pretoken("abc") == ("abc",)
    tok2 = BPETokenizer([("b", "c")])
    assert tok2._encode_pretoken("abc") == ("a", "bc")


def test_save_load_round_trip(tmp_path, spark):
    tok = _trained(spark)
    p = str(tmp_path / "merges.json")
    tok.save(p)
    tok2 = BPETokenizer.load(p)
    assert tok2.merges == tok.merges
    text = "the quick brown fox"
    assert tok2.encode(text) == tok.encode(text)
    with pytest.raises(ValueError):
        bad = str(tmp_path / "bad.json")
        with open(bad, "w") as f:
            f.write('{"format": "other"}')
        BPETokenizer.load(bad)


# ---------------------------------------------------------------------------
# distributed apply

def test_distributed_tokenize_matches_driver_encode(spark):
    tok = _trained(spark)
    texts = ["the quick brown fox", "over the lazy dog", None,
             "unseen zqxjv 日本語"]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    out = {r["text"]: r for r in
           tok.token_count(tok.tokenize(df)).collect()}
    for t in texts:
        row = out[t]
        if t is None:
            assert row["bpe_tokens"] is None
            assert row["bpe_token_count"] is None
        else:
            assert row["bpe_tokens"] == tok.encode(t)
            assert row["bpe_token_count"] == len(tok.encode(t))


def test_token_count_below_piece_estimate_times_word_len(spark):
    # sanity vs the JVM piece estimate: trained counts land between
    # piece count (lower bound-ish) and byte count (upper bound)
    from pyspark.sql import functions as F

    from valkey_search_spark.operators.textops import bpe_piece_count_col

    tok = _trained(spark)
    df = spark.createDataFrame(
        [("the quick brown fox jumps over the lazy dog",)], ["text"])
    row = (tok.token_count(df)
           .withColumn("pieces", bpe_piece_count_col(F.col("text")))
           .withColumn("nbytes", F.octet_length("text"))
           .collect()[0])
    assert row["pieces"] <= row["bpe_token_count"] <= row["nbytes"]


def test_underscore_and_symbols_round_trip(spark):
    # '_' is \w in Python but NOT \p{L}\p{N} in the JVM pattern — the
    # pre-tokenizer must not silently drop it (review finding: a class
    # built on [^\s\w] loses every underscore)
    tok = _trained(spark)
    for text in ["snake_case var_1", "__dunder__", "a _ b", "_"]:
        assert tok.decode(tok.encode(text)) == text
    assert pretokenize("snake_case") == ["snake", "_", "case"]


def test_worker_tokenizer_cache_bounded_and_keyed_by_content():
    from valkey_search_spark.functions import _cache
    from valkey_search_spark.functions import bpe as mod

    _cache._CACHE.clear()

    class FakeBC:
        def __init__(self, v):
            self.value = v

    t1 = BPETokenizer([("a", "b")])
    # same content -> same fingerprint -> one cached instance
    x = mod._tokenizer_from_broadcast(t1.fingerprint, FakeBC(t1.merges))
    y = mod._tokenizer_from_broadcast(t1.fingerprint, FakeBC(t1.merges))
    assert x is y
    # distinct tables evict beyond the cap
    for i in range(_cache._CAP + 3):
        t = BPETokenizer([("a", chr(98 + i))])
        mod._tokenizer_from_broadcast(t.fingerprint, FakeBC(t.merges))
    assert len(_cache._CACHE) <= _cache._CAP
    # the two tokenizer families share the cache without colliding:
    # same fingerprint, different kind -> different instances
    from valkey_search_spark.functions import unigram as uni
    u = uni.UnigramTokenizer({"a": -1.0})
    got = uni._tokenizer_from_broadcast(t1.fingerprint, FakeBC(u.vocab))
    assert got is not x and isinstance(got, uni.UnigramTokenizer)
    _cache._CACHE.clear()


def test_hypothesis_round_trip_arbitrary_text():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    tok = BPETokenizer([("a", "b"), ("ab", "c"), (" ", "t"),
                        ("h", "e"), ("t", "he")])

    @settings(max_examples=300, deadline=None)
    @given(st.text(max_size=120))
    def check(text):
        assert tok.decode(tok.encode(text)) == text

    check()


def test_hypothesis_round_trip_trained(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    tok = _trained(spark)

    @settings(max_examples=150, deadline=None)
    @given(st.text(alphabet=st.characters(codec="utf-8"), max_size=80))
    def check(text):
        assert tok.decode(tok.encode(text)) == text

    check()
