"""Incremental (new-batch vs accumulated-corpus) minhash dedup mode."""

from pyspark.sql import Row
# ---------------------------------------------------------------------------
# incremental (new-batch vs corpus) minhash mode

def test_minhash_incremental_matches_filtered_full_pairs(spark):
    """Incremental pairs == the full all-pairs result filtered to pairs
    involving a new doc; no old-old pair is emitted."""
    from valkey_search_spark.operators.dedup import (
        minhash_lsh_pairs, minhash_lsh_pairs_incremental,
    )

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    rows = []
    for i in range(8):                         # old corpus: 4 dup pairs
        rows.append(Row(doc_id=i, text=base + f" old{i // 2}"))
    old = spark.createDataFrame(rows)
    new = spark.createDataFrame([
        Row(doc_id=100, text=base + " old0"),   # near-dups docs 0,1
        Row(doc_id=101, text="totally different words entirely here"),
        Row(doc_id=102, text=base + " old0 x"), # near-dups 0,1,100
    ])
    kw = dict(num_hashes=32, bands=8, threshold=0.6)
    inc = {(r["a"], r["b"]): r["jaccard"]
           for r in minhash_lsh_pairs_incremental(
               new, old, "doc_id", **kw).collect()}
    full = {(r["a"], r["b"]): r["jaccard"]
            for r in minhash_lsh_pairs(
                old.unionByName(new), "doc_id", **kw).collect()}
    want = {p: j for p, j in full.items()
            if p[0] >= 100 or p[1] >= 100}
    assert inc == want and len(want) > 0
    assert all(a >= 100 or b >= 100 for a, b in inc)
    # the old-old dups exist in the full result but not the incremental
    assert any(a < 100 and b < 100 for a, b in full)


def test_minhash_incremental_prunes_inside_bucket_join(spark):
    """The bucket join is ASYMMETRIC: its left input is filtered to the
    new rows (old-old candidates never enumerate — a residual OR
    predicate on a symmetric join would still generate and discard
    them, measured slower than the full join)."""
    from valkey_search_spark.operators.dedup import (
        minhash_lsh_pairs_incremental,
    )

    old = spark.createDataFrame([Row(doc_id=1, text="a b c d e f")])
    new = spark.createDataFrame([Row(doc_id=2, text="a b c d e f")])
    out = minhash_lsh_pairs_incremental(new, old, "doc_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the flag appears as a pre-join Filter, never as a join residual
    assert any("Filter" in ln and "__is_new" in ln
               for ln in plan.splitlines()), plan[:500]
    for ln in plan.splitlines():
        if "Join" in ln and "Filter" not in ln:
            assert "__is_new" not in ln, ln


def test_incremental_dedup_composes_with_document_store(spark, tmp_path):
    """The ingest-dedup composition: each arriving batch near-dedups
    against the accumulated DocumentStore BEFORE being applied — dup
    arrivals are dropped, novel docs land, and the store never pays
    old-vs-old pair work (the incremental contract)."""
    from pyspark.sql import functions as F

    from valkey_search_spark.operators.dedup import (
        minhash_lsh_pairs_incremental,
    )
    from valkey_search_spark.streaming.ingest import DocumentStore

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    store = DocumentStore(spark, str(tmp_path / "store"),
                          key_column="doc_id", num_buckets=4)
    store.backfill(spark.createDataFrame(
        [Row(doc_id=i, text=base + f" v{i}") for i in range(6)]))

    batch = spark.createDataFrame([
        Row(doc_id=100, text=base + " v0"),          # near-dup of doc 0
        Row(doc_id=101, text="fresh novel content entirely different"),
    ])
    corpus = store.read().select("doc_id", "text")
    dups = minhash_lsh_pairs_incremental(
        batch, corpus, "doc_id", threshold=0.6)
    # arrivals that near-dup ANY accumulated doc (or an earlier arrival)
    losers = dups.select(F.greatest("a", "b").alias("doc_id")).distinct()
    clean = batch.join(losers, "doc_id", "left_anti")
    store.apply_mutations(
        clean.withColumn("__op", F.lit("SET")), op_column="__op")

    kept = {r["doc_id"] for r in store.read().select("doc_id").collect()}
    assert 101 in kept and 100 not in kept
    assert kept == {0, 1, 2, 3, 4, 5, 101}


def test_simhash_incremental_matches_filtered_full_pairs(spark):
    """simhash new_col mode == full pairs filtered to new-involving;
    the flag sits in the chunk-join condition."""
    from valkey_search_spark.operators.dedup import simhash_pairs
    from pyspark.sql import functions as F

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    rows = [Row(doc_id=i, text=base + f" tail{i // 2}", __new=False)
            for i in range(8)]
    rows += [Row(doc_id=100, text=base + " tail0", __new=True),
             Row(doc_id=101, text="entirely different words", __new=True)]
    df = spark.createDataFrame(rows)
    kw = dict(max_hamming=8)
    inc = {(r["a"], r["b"]) for r in
           simhash_pairs(df, "doc_id", new_col="__new", **kw).collect()}
    full = {(r["a"], r["b"]) for r in
            simhash_pairs(df.drop("__new"), "doc_id", **kw).collect()}
    want = {p for p in full if p[0] >= 100 or p[1] >= 100}
    assert inc == want and len(want) > 0
    assert any(a < 100 and b < 100 for a, b in full)
    plan = (simhash_pairs(df, "doc_id", new_col="__new", **kw)
            ._jdf.queryExecution().executedPlan().toString())
    assert any("Filter" in ln and "__new" in ln
               for ln in plan.splitlines())


def test_ngram_jaccard_incremental_matches_filtered_full_pairs(spark):
    """Both branches (default and stop-gram) of the asymmetric ngram
    mode equal the full pairs filtered to new-involving."""
    from valkey_search_spark.operators.dedup import (
        ngram_jaccard_pairs, ngram_jaccard_pairs_incremental,
    )

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    old = spark.createDataFrame(
        [Row(doc_id=i, text=base + f" t{i // 2}") for i in range(8)])
    new = spark.createDataFrame([
        Row(doc_id=100, text=base + " t0"),
        Row(doc_id=101, text="totally different words entirely here"),
        Row(doc_id=102, text=base + " t0 extra"),
    ])
    for extra in ({}, {"stop_gram_df": 6}):
        kw = dict(shingle_n=3, threshold=0.5, **extra)
        inc = {(r["a"], r["b"], r["jaccard"]) for r in
               ngram_jaccard_pairs_incremental(
                   new, old, "doc_id", **kw).collect()}
        full = {(r["a"], r["b"], r["jaccard"]) for r in
                ngram_jaccard_pairs(
                    old.unionByName(new), "doc_id", **kw).collect()}
        want = {p for p in full if p[0] >= 100 or p[1] >= 100}
        assert inc == want and len(want) > 0, extra
        assert any(a < 100 and b < 100 for a, b, _ in full), extra
