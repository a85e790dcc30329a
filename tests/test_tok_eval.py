"""tokenizer_report / compare_tokenizers: every column pinned against a
driver-side recomputation using the tokenizer's own encode()."""
from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tests.conftest import load
from valkey_search_spark.functions.bpe import train_bpe
from valkey_search_spark.functions.tok_eval import (
    compare_tokenizers, tokenizer_report,
)
from valkey_search_spark.functions.wordpiece import train_wordpiece


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load(spark, sf_dir, "documents").limit(120).cache()


@pytest.fixture(scope="module")
def bpe(docs):
    return train_bpe(docs, vocab_size=300)


def _scalar_report(texts, tok):
    encs = [tok.encode(t) for t in texts]
    nt = sum(len(e) for e in encs)
    nb = sum(len(t.encode("utf-8")) for t in texts)
    nc = sum(len(t) for t in texts)
    nw = sum(len(t.strip().split()) for t in texts)
    used = len({p for e in encs for p in e})
    return dict(n_docs=len(texts), total_tokens=nt, total_words=nw,
                total_bytes=nb, total_chars=nc, vocab_used=used)


def test_report_matches_scalar_recomputation(docs, bpe):
    texts = [r.text for r in docs.select("text").collect()]
    want = _scalar_report(texts, bpe)
    row = tokenizer_report(docs, bpe).first()
    for k, v in want.items():
        assert getattr(row, k) == v, k
    assert row.vocab_size == 256 + len(bpe.merges)
    assert row.bytes_per_token == pytest.approx(
        want["total_bytes"] / want["total_tokens"])
    assert row.fertility == pytest.approx(
        want["total_tokens"] / want["total_words"])
    assert row.tokens_per_doc == pytest.approx(
        want["total_tokens"] / want["n_docs"])
    assert row.vocab_used_frac == pytest.approx(
        want["vocab_used"] / row.vocab_size)
    # sanity on the real corpus: subword fertility >= 1 token/word and
    # a trained vocab is actually used
    assert row.fertility >= 1.0
    assert 0 < row.vocab_used <= row.vocab_size


def test_vocab_use_skippable(docs, bpe):
    row = tokenizer_report(docs, bpe, include_vocab_use=False).first()
    assert row.vocab_used is None and row.vocab_used_frac is None
    assert row.total_tokens > 0


def test_null_and_empty_texts_excluded(spark, bpe):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, None)], "doc_id long, text string")
    row = tokenizer_report(df, bpe).first()
    assert row.n_docs == 1
    assert row.total_words == 2


def test_compare_tokenizers_families(docs, bpe):
    wp = train_wordpiece(docs, vocab_size=300)
    out = compare_tokenizers(docs, {"bpe": bpe, "wordpiece": wp}) \
        .orderBy("family").collect()
    assert [r.family for r in out] == ["bpe", "wordpiece"]
    # same corpus -> identical text-side totals, family-specific tokens
    assert out[0].total_bytes == out[1].total_bytes
    assert out[0].total_words == out[1].total_words
    assert all(r.total_tokens > 0 for r in out)
    # wordpiece vocab counts initial+continuation pieces
    assert out[1].vocab_size == len(wp.vocab)


def test_zero_word_texts_excluded_and_unicode_words(spark, bpe):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, ""), (3, "   "), (4, "a b"),
         (5, None)],
        "doc_id long, text string")
    row = tokenizer_report(df, bpe).first()
    # '' and whitespace-only count zero words -> excluded entirely;
    # NBSP separates words like str.split does
    assert row.n_docs == 2
    assert row.total_words == 4


def test_grouped_report_by_language(spark, docs, bpe):
    rows = tokenizer_report(docs, bpe, by=["lang"]).collect()
    langs = {r.lang for r in rows}
    assert len(rows) == len(langs) >= 2
    total = tokenizer_report(docs, bpe).first()
    assert sum(r.total_tokens for r in rows) == total.total_tokens
    assert sum(r.n_docs for r in rows) == total.n_docs
    # per-group vocab_used <= global vocab_used <= vocab_size
    assert all(0 < r.vocab_used <= total.vocab_used <= total.vocab_size
               for r in rows)
    # scalar recomputation for one group
    import collections
    texts = collections.defaultdict(list)
    for r in docs.select("lang", "text").collect():
        texts[r.lang].append(r.text)
    lang = sorted(langs)[0]
    want = _scalar_report(texts[lang], bpe)
    got = {r.lang: r for r in rows}[lang]
    for k, v in want.items():
        assert getattr(got, k) == v, k


def test_grouped_report_keeps_null_groups(spark, bpe):
    df = spark.createDataFrame(
        [(1, "hello world", "en"), (2, "bon jour", None),
         (3, "more text", "en")],
        "doc_id long, text string, lang string")
    rows = tokenizer_report(df, bpe, by=["lang"]).collect()
    bylang = {r.lang: r for r in rows}
    assert set(bylang) == {"en", None}       # null group survives
    assert bylang[None].n_docs == 1 and bylang[None].total_words == 2
    assert bylang[None].vocab_used > 0
    assert sum(r.n_docs for r in rows) == 3
