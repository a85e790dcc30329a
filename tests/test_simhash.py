"""SimHash near-dup golden checks.

The banded candidate join must never lose a qualifying pair (the recall
contract the reference's HNSW candidate expansion honors,
src/indexes/vector_hnsw.cc:315-340). Ground truth is exact all-pairs
Hamming over the collected codes in numpy; the pack kernel itself is
checked against an independent pure-Python majority-vote implementation
over the same token hashes.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from valkey_search_spark.operators import dedup as dd

SF = "/root/testdata/sf0.001"


def _coded(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    staged = dd._staged_tokens(docs, "doc_id", "text")
    hashes = F.transform(F.col("__toks"), lambda t: F.xxhash64(t))
    return staged.select(
        "k", dd._simhash_pack(hashes).alias("code"),
        F.col("__toks").alias("toks")).where(F.col("code").isNotNull())


def _exact_pairs(rows, max_hamming):
    keys = [r["k"] for r in rows]
    codes = np.array([r["code"] for r in rows], dtype=np.int64).view(np.uint64)
    xor = codes[:, None] ^ codes[None, :]
    ham = np.zeros_like(xor, dtype=np.int64)
    for _ in range(64):
        ham += (xor & 1).astype(np.int64)
        xor >>= 1
    out = {}
    n = len(keys)
    for i in range(n):
        for j in range(i + 1, n):
            a, b = sorted((keys[i], keys[j]))
            if ham[i, j] <= max_hamming:
                out[(a, b)] = int(ham[i, j])
    return out


@pytest.mark.parametrize("max_hamming", [3, 6])
def test_banded_join_full_recall_vs_exact_hamming(spark, max_hamming):
    """simhash_pairs at default bands returns EXACTLY the pairs within
    max_hamming — the round-2 driver call (max_hamming=6 with 4 bands)
    silently missed pairs at Hamming 4-6."""
    rows = _coded(spark).collect()
    want = _exact_pairs(rows, max_hamming)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = {(r["a"], r["b"]): r["hamming"]
           for r in dd.simhash_pairs(docs, "doc_id",
                                     max_hamming=max_hamming).collect()}
    assert got == want
    assert want, "corpus should contain at least one near-dup pair"


def test_pack_matches_python_majority_vote(spark):
    """_simhash_pack == per-bit majority vote of token hashes, checked
    against an independent pure-Python implementation."""
    toks_rows = _coded(spark).limit(25).collect()
    tok_df = spark.createDataFrame(
        [(str(r["k"]), r["toks"]) for r in toks_rows],
        "k string, toks array<string>")
    hrows = tok_df.select(
        "k", F.transform("toks", lambda t: F.xxhash64(t)).alias("hs")).collect()
    by_k = {r["k"]: r["hs"] for r in hrows}
    for r in toks_rows:
        votes = [0] * 64
        for h in by_k[str(r["k"])]:
            u = h & 0xFFFFFFFFFFFFFFFF
            for b in range(64):
                votes[b] += 1 if (u >> b) & 1 else -1
        code = 0
        for b in range(64):
            if votes[b] > 0:
                code |= 1 << b
        # interpret as signed 64-bit like the kernel's int64 output
        if code >= 1 << 63:
            code -= 1 << 64
        assert code == r["code"], f"pack mismatch for {r['k']}"


def test_inconsistent_band_parameters_raise(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    with pytest.raises(ValueError, match="recall"):
        dd.simhash_pairs(docs, "doc_id", max_hamming=6, bands=4)
    with pytest.raises(ValueError):
        dd.simhash_pairs(docs, "doc_id", max_hamming=3, bands=0)


def test_explicit_wider_banding_still_exact(spark):
    """More bands than required is allowed (better recall margin, more
    candidates) and still verifies to the same exact pair set."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = {(r["a"], r["b"]) for r in
         dd.simhash_pairs(docs, "doc_id", max_hamming=3).collect()}
    b = {(r["a"], r["b"]) for r in
         dd.simhash_pairs(docs, "doc_id", max_hamming=3, bands=8).collect()}
    assert a == b


def test_max_hamming_zero_single_band(spark):
    """max_hamming=0 -> bands=1 -> one width-64 chunk (the code itself);
    the naive (1 << 64) - 1 mask would overflow LongType and fail
    analysis. Pairs are exactly the identical-code pairs."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = {(r["a"], r["b"]): r["hamming"] for r in
           dd.simhash_pairs(docs, "doc_id", max_hamming=0).collect()}
    assert all(h == 0 for h in got.values())
    # ground truth: collect codes, identical-code pairs
    coded = dd.simhash_col(F.col("text"))
    rows = docs.select(F.col("doc_id").alias("k"), coded.alias("code")).collect()
    by_code = {}
    for r in rows:
        by_code.setdefault(r["code"], []).append(r["k"])
    want = {(a, b) for ks in by_code.values() for i, a in enumerate(sorted(ks))
            for b in sorted(ks)[i + 1:]}
    assert set(got) == want and want  # planted dups guarantee non-empty


def test_md5_hash_variant_finds_planted_dups(spark):
    """hash_fn="md5" (60-bit, SQL-replicable — the driver-oracle
    variant) finds the same planted near-duplicates the xxhash64
    default does; codes fit in 60 bits (nonnegative longs)."""
    from pyspark.sql import Row
    from valkey_search_spark.operators.dedup import simhash_pairs

    base = "alpha beta gamma delta epsilon zeta eta theta " * 4
    rows = [Row(id=1, text=base),
            Row(id=2, text=base.replace("zeta", "zetaX", 1)),  # near-dup
            Row(id=3, text="totally different words entirely here now")]
    df = spark.createDataFrame(rows)
    for fn in ("xxhash64", "md5"):
        got = {(r["a"], r["b"]) for r in
               simhash_pairs(df, "id", max_hamming=16,
                             hash_fn=fn).collect()}
        assert (1, 2) in got, fn
        assert (1, 3) not in got and (2, 3) not in got, fn
    import pytest as _pytest
    with _pytest.raises(ValueError, match="unknown hash_fn"):
        simhash_pairs(df, "id", hash_fn="crc32")
