"""WordPiece: lossless round-trip, greedy longest-match semantics,
likelihood-scored trainer vs a brute-force recount reference,
distributed == driver, persistence."""
from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from valkey_search_spark.functions.wordpiece import (WordPieceTokenizer,
                                                     _prefixed_symbols,
                                                     train_wordpiece)


def test_roundtrip_lossless_on_anything():
    tok = WordPieceTokenizer(["hel", "##lo", "wor"])
    for text in ("hello world", "snake_case_id", "émigré — naïve",
                 "中文 mixed ascii", "tabs\tand\nnewlines", "a" * 300, ""):
        assert tok.decode(tok.encode(text)) == text


@settings(max_examples=150, deadline=None)
@given(st.text(max_size=80))
def test_roundtrip_fuzz(text):
    tok = WordPieceTokenizer(["the", "##ing", "##ed"])
    assert tok.decode(tok.encode(text)) == text


def test_greedy_longest_match():
    # vocab has both 'un' + '##related' and the longer 'unrelated':
    # greedy takes the LONGEST word-initial piece first
    tok = WordPieceTokenizer(["un", "##related", "unrelated",
                              "##relate", "##d"])
    assert tok.encode("unrelated") == ["unrelated"]
    # without the full word, longest prefix then longest continuation
    tok2 = WordPieceTokenizer(["un", "##relate", "##related", "##d"])
    assert tok2.encode("unrelated") == ["un", "##related"]
    # unknown word degrades to byte symbols, never fails
    tok3 = WordPieceTokenizer([])
    assert len(tok3.encode("xyz")) == 3
    assert tok3.decode(tok3.encode("xyz")) == "xyz"


def test_continuation_prefix_shape():
    tok = WordPieceTokenizer([])
    pieces = tok.encode("abc")
    assert pieces[0] == "a" and pieces[1] == "##b" and pieces[2] == "##c"
    assert _prefixed_symbols("abc") == ("a", "##b", "##c")


def test_trainer_matches_bruteforce_scores(spark):
    # tiny corpus; after every merge, recompute pair/symbol counts from
    # scratch and assert the trainer's chosen piece maximized
    # count(ab)/(count(a)count(b)) with lexicographic tie-break
    corpus = ["low low low lower lowest", "new newer newest",
              "wide wider widest"] * 3
    df = spark.createDataFrame([(t,) for t in corpus], "text string")
    n_learn = 6
    tok = train_wordpiece(df, vocab_size=512 + n_learn, min_pair_count=1)
    from valkey_search_spark.functions.bpe import (_pairs_of,
                                                   _pretokenize_udf)
    from valkey_search_spark.functions.wordpiece import (_merge_piece,
                                                         _prefixed_symbols)

    from collections import Counter
    word_freq = Counter(
        w for t in corpus
        for w in __import__("valkey_search_spark.functions.bpe",
                            fromlist=["pretokenize"]).pretokenize(t))
    words = {w: _prefixed_symbols(w) for w in word_freq}
    learned = sorted(tok.vocab - WordPieceTokenizer().vocab)
    assert len(learned) == n_learn

    # replay the trainer's merge order by re-deriving it brute-force
    merges = []
    for _ in range(n_learn):
        pair_counts, sym_counts = Counter(), Counter()
        for w, sym in words.items():
            f = word_freq[w]
            for s in sym:
                sym_counts[s] += f
            for p, k in _pairs_of(sym).items():
                pair_counts[p] += k * f
        best = min(pair_counts.items(),
                   key=lambda kv: (-kv[1] / (sym_counts[kv[0][0]]
                                             * sym_counts[kv[0][1]]),
                                   kv[0]))[0]
        joined = _merge_piece(*best)
        merges.append(joined)
        from valkey_search_spark.functions.bpe import _merge_word
        words = {w: _merge_word(sym, best, joined)
                 for w, sym in words.items()}
    assert sorted(merges) == learned


def test_distributed_matches_driver(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    tok = train_wordpiece(docs, vocab_size=512 + 64)
    rows = tok.tokenize(docs, "text").select("doc_id", "text",
                                             "wordpiece_tokens").collect()
    for r in rows:
        assert list(r["wordpiece_tokens"]) == tok.encode(r["text"])
        assert tok.decode(r["wordpiece_tokens"]) == r["text"]
    counted = tok.token_count(docs, "text").collect()
    for r in counted:
        assert r["wordpiece_token_count"] == len(tok.encode(r["text"]))


def test_trained_counts_compress(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(300)
    tok = train_wordpiece(docs, vocab_size=512 + 256)
    base = WordPieceTokenizer()
    [r] = (tok.token_count(docs, "text", "trained")
           .select(F.sum("trained")).collect())
    [rb] = (base.token_count(docs, "text", "base")
            .select(F.sum("base")).collect())
    n_bytes = docs.select(
        F.sum(F.octet_length("text"))).collect()[0][0]
    assert r[0] < rb[0] <= n_bytes * 1.01
    # trained vocab compresses at least 2x over raw byte symbols
    assert r[0] < 0.5 * rb[0]


def test_save_load_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([("the quick brown fox",)] * 5,
                               "text string")
    tok = train_wordpiece(df, vocab_size=512 + 8, min_pair_count=1)
    p = str(tmp_path / "wp.json")
    tok.save(p)
    tok2 = WordPieceTokenizer.load(p)
    assert tok2.vocab == tok.vocab
    assert tok2.encode("the quick") == tok.encode("the quick")
    with pytest.raises(ValueError):
        import json
        bad = str(tmp_path / "bad.json")
        with open(bad, "w") as f:
            json.dump({"format": "nope"}, f)
        WordPieceTokenizer.load(bad)


def test_min_pair_count_skips_rare_pairs_not_training(spark):
    # likelihood scoring ranks RARE pairs highest (tiny denominators);
    # a count-based break would end training at the first rare pair —
    # it must be SKIPPED while frequent pairs keep merging
    corpus = ["the the the the the the the the", "qz"]
    df = spark.createDataFrame([(t,) for t in corpus], "text string")
    tok = train_wordpiece(df, vocab_size=512 + 4, min_pair_count=2)
    learned = tok.vocab - WordPieceTokenizer().vocab
    assert learned                      # 'the' pairs merged
    assert not any("q" in p and "z" in p for p in learned)


def test_markdown_header_roundtrip(spark):
    # '##' at word-initial position must never be learned as an
    # initial piece (it would collide with the continuation marker)
    corpus = ["## heading ## heading ## heading", "#### deep #### deep"]
    df = spark.createDataFrame([(t,) for t in corpus], "text string")
    tok = train_wordpiece(df, vocab_size=512 + 16, min_pair_count=1)
    for t in corpus + ["## x ### y #z", "##alone"]:
        assert tok.decode(tok.encode(t)) == t, t
    for p in tok.vocab - WordPieceTokenizer().vocab:
        if p.startswith("##"):
            continue                     # continuation, fine
        assert not p.startswith("##")


def test_base_tokenizer_hash_text_roundtrip():
    # '#'-heavy text through the BASE vocab: continuation entries for
    # '#' ('###' rendered) must not be matchable at word-initial slots
    tok = WordPieceTokenizer()
    for t in ("###", "##", "#", "a##b", "## ##"):
        assert tok.decode(tok.encode(t)) == t, t


def test_detokenize_distributed_roundtrip(spark, sf_dir):
    # the r10 driver row's contract: decode(encode(x)) == x asserted
    # DISTRIBUTED (Arrow map, static table only), plus the piece-count
    # bracket [whitespace words, bytes] — including '##'-leading and
    # multi-space texts that stress the continuation namespace
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(150)
    extra = spark.createDataFrame(
        [(100001, "## header  double  spaced"),
         (100002, "tail unicode café 中文"),
         (100003, None)],
        "doc_id long, text string")
    df = docs.select("doc_id", "text").unionByName(extra)
    tok = train_wordpiece(docs, vocab_size=512 + 64)
    out = tok.detokenize(tok.tokenize(df)).select(
        "doc_id", "text",
        (F.col("text_decoded") == F.col("text")).alias("ok"),
        F.size("wordpiece_tokens").alias("n"),
        F.size(F.split("text", " ")).alias("w"),
        F.octet_length("text").alias("b")).collect()
    for r in out:
        if r["text"] is None:
            assert r["ok"] is None
            continue
        assert r["ok"], r["doc_id"]
        assert r["w"] <= r["n"] <= r["b"], r


def test_marker_prefixed_pieces_roundtrip(tmp_path):
    """r10 ADVICE asked __init__/load() to reject '##'-text pieces;
    investigating showed the trainer itself emits them (markdown '##'
    headers train a continuation with text '##', serialized '####'),
    and round-trip holds for EVERY classification because encode/decode
    share one marker convention: decode strips exactly one '##'. This
    pins the rebuttal: marker-prefixed entries are accepted and
    lossless, through the constructor and through load()."""
    import json

    from valkey_search_spark.functions.wordpiece import WordPieceTokenizer

    t = WordPieceTokenizer(["hello", "##lo", "###x", "####", "####y"])
    for text in ("hello", "## header", "#### deep", "a##b", "##", "####"):
        assert t.decode(t.encode(text)) == text, text
    # continuation table holds the TEXTS (marker stripped once)
    assert {"##", "##y", "#x", "lo"} <= t.cont
    # and the same vocabulary survives the save/load door losslessly
    p = tmp_path / "vocab.json"
    p.write_text(json.dumps({"format": "wordpiece-vocab-v1",
                             "pieces": ["ok", "##fine", "####deep"]}))
    t2 = WordPieceTokenizer.load(str(p))
    assert "##deep" in t2.cont and "ok" in t2.initial
    for text in ("ok ##deep", "####deep fine"):
        assert t2.decode(t2.encode(text)) == text, text
