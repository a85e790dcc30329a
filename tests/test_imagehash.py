"""Perceptual image hashing + banded Hamming image-dup pairs: robustness
of dHash to photometric shifts, exact brute-force parity of the banded
join (also pins the hamming_code_pairs refactor), and the error/null
contract."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from valkey_search_spark.multimodal.codecs import encode_bmp
from valkey_search_spark.multimodal.imagehash import (
    _hash_bits, _pack64, image_dup_pairs, image_hash,
)


def _img(seed, h=24, w=32):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 200, size=(h, w, 3), dtype=np.uint8)


@pytest.fixture(scope="module")
def corpus(spark):
    base = _img(1)
    rows = [
        (0, encode_bmp(base)),                                  # original
        (1, encode_bmp(np.clip(base.astype(int) + 30, 0, 255)
                       .astype(np.uint8))),                     # brighter
        (2, encode_bmp((base.astype(float) * 0.8)
                       .astype(np.uint8))),                     # darker
        (3, encode_bmp(_img(2))),                               # unrelated
        (4, encode_bmp(_img(3))),                               # unrelated
        (5, None),                                              # null
        (6, b"not an image at all"),                            # corrupt
    ]
    return spark.createDataFrame(rows, "doc_id long, image binary")


def test_dhash_invariant_to_photometric_shifts():
    base = _img(1)
    h0 = _pack64(_hash_bits(base, "dhash"))
    bright = np.clip(base.astype(int) + 30, 0, 255).astype(np.uint8)
    dark = (base.astype(float) * 0.8).astype(np.uint8)
    other = _img(2)
    ham = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")
    assert ham(h0, _pack64(_hash_bits(bright, "dhash"))) <= 4
    assert ham(h0, _pack64(_hash_bits(dark, "dhash"))) <= 4
    assert ham(h0, _pack64(_hash_bits(other, "dhash"))) > 12


def test_image_hash_column_and_error_contract(spark, corpus):
    out = image_hash(corpus, on_error="null")
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[0]["img_hash"] is not None
    assert rows[5]["img_hash"] is None and rows[5]["decode_error"] is None
    assert rows[6]["img_hash"] is None and rows[6]["decode_error"]
    with pytest.raises(Exception):
        image_hash(corpus, on_error="raise").collect()


def test_image_dup_pairs_finds_planted_dups(spark, corpus):
    pairs = {(r["a"], r["b"]) for r in
             image_dup_pairs(corpus, "doc_id", max_hamming=5).collect()}
    assert (0, 1) in pairs and (0, 2) in pairs
    flat = {k for p in pairs for k in p}
    assert not {3, 4, 5, 6} & flat          # unrelated/corrupt produce none


def test_banded_join_matches_brute_force(spark, corpus):
    """Recall contract: the banded candidate join finds EXACTLY the pairs
    a brute-force Hamming filter over all hash pairs finds."""
    hashes = {r["doc_id"]: r["img_hash"] for r in
              image_hash(corpus, on_error="null").collect()
              if r["img_hash"] is not None}
    for mh in (2, 5, 10):
        want = set()
        ks = sorted(hashes)
        for i, a in enumerate(ks):
            for b in ks[i + 1:]:
                d = bin((hashes[a] ^ hashes[b]) & ((1 << 64) - 1)).count("1")
                if d <= mh:
                    want.add((a, b, d))
        got = {(r["a"], r["b"], r["hamming"]) for r in
               image_dup_pairs(corpus, "doc_id", max_hamming=mh).collect()}
        assert got == want, mh


def test_incremental_mode_restricts_to_new(spark, corpus):
    flagged = corpus.withColumn("is_new", F.col("doc_id") == 1)
    pairs = {(r["a"], r["b"]) for r in
             image_dup_pairs(flagged, "doc_id", max_hamming=5,
                             new_col="is_new").collect()}
    assert all(1 in p for p in pairs)       # every pair involves the new doc
    assert (0, 1) in pairs
