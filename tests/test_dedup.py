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
    """The new-flag restriction sits INSIDE the bucket self-join
    condition — old-old candidates are never generated (pinned by the
    join condition in the physical plan), not post-filtered."""
    from valkey_search_spark.operators.dedup import (
        minhash_lsh_pairs_incremental,
    )

    old = spark.createDataFrame([Row(doc_id=1, text="a b c d e f")])
    new = spark.createDataFrame([Row(doc_id=2, text="a b c d e f")])
    out = minhash_lsh_pairs_incremental(new, old, "doc_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    join_lines = [ln for ln in plan.splitlines()
                  if "SortMergeJoin" in ln or "ShuffledHashJoin" in ln
                  or "BroadcastHashJoin" in ln]
    assert any("__is_new" in ln for ln in join_lines), join_lines
