"""Deterministic splits and weighted corpus mixing."""

import pytest
from pyspark.sql import functions as F

from valkey_search_spark.operators.sampling import mix_corpora, split_by_hash

SF = "/root/testdata/sf0.001"


def test_split_by_hash_partitions_and_is_deterministic(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n = docs.count()
    splits = split_by_hash(docs, "doc_id",
                           {"train": 0.8, "val": 0.1, "test": 0.1})
    sizes = {k: v.count() for k, v in splits.items()}
    assert sum(sizes.values()) == n                  # exhaustive + disjoint
    assert sizes["train"] > sizes["val"]
    # disjoint
    tv = splits["train"].select("doc_id").intersect(
        splits["val"].select("doc_id")).count()
    assert tv == 0
    # deterministic across re-evaluation (the randomSplit failure mode)
    again = split_by_hash(docs, "doc_id",
                          {"train": 0.8, "val": 0.1, "test": 0.1})
    assert again["val"].select("doc_id").exceptAll(
        splits["val"].select("doc_id")).count() == 0


def test_split_fractions_validated(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    with pytest.raises(ValueError):
        split_by_hash(docs, "doc_id", {"a": 0.5, "b": 0.2})


def test_mix_corpora_proportions_and_provenance(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = docs.where("doc_id % 2 = 0")
    b = docs.where("doc_id % 2 = 1")
    out = mix_corpora([("even", a, 3.0), ("odd", b, 1.0)], total_rows=200)
    counts = {r["source"]: r["n"] for r in
              out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"even", "odd"}
    # 3:1 target with Bernoulli-sample noise
    ratio = counts["even"] / counts["odd"]
    assert 1.8 <= ratio <= 5.0


def test_mix_corpora_counts_in_one_job(spark):
    """Source sizing pays ONE aggregation job for ALL sources (plus the
    AQE sub-jobs of that query), never a .count() per source."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    srcs = [(f"s{i}", docs.where(f"doc_id % 4 = {i}"), 1.0) for i in range(4)]
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup() or [])
    mix_corpora(srcs, total_rows=100)
    after = len(tracker.getJobIdsForGroup() or [])
    # one count query; AQE may split it into a couple of sub-jobs, but a
    # per-source design would cost >= 4
    assert after - before < 4


def test_mix_corpora_duplicate_names_rejected(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    with pytest.raises(ValueError):
        mix_corpora([("a", docs, 1.0), ("a", docs, 1.0)], total_rows=10)


def test_cross_split_leakage_reports_only_cross_pairs(spark):
    from pyspark.sql import Row
    from valkey_search_spark.operators.sampling import (
        cross_split_leakage, split_by_hash,
    )

    df = spark.createDataFrame([Row(doc_id=i, text=f"doc {i}")
                                for i in range(200)])
    splits = split_by_hash(df, "doc_id", {"train": 0.8, "val": 0.2})
    where = {r["doc_id"]: name for name, d in splits.items()
             for r in d.select("doc_id").collect()}
    # plant pairs: one guaranteed-cross, one guaranteed-same
    train_ids = [k for k, v in where.items() if v == "train"]
    val_ids = [k for k, v in where.items() if v == "val"]
    pairs = spark.createDataFrame([
        Row(a=train_ids[0], b=val_ids[0], jaccard=0.9),    # cross
        Row(a=train_ids[1], b=train_ids[2], jaccard=0.9),  # same
    ])
    got = cross_split_leakage(splits, pairs).collect()
    assert len(got) == 1
    assert {got[0]["split_a"], got[0]["split_b"]} == {"train", "val"}


def test_sample_to_token_budget_global_and_grouped(spark):
    from pyspark.sql import Row, functions as F
    from valkey_search_spark.operators.sampling import (
        sample_to_token_budget,
    )

    rows = [Row(doc_id=i, source="web" if i % 2 else "code",
                text=" ".join(f"w{j}" for j in range(10)))
            for i in range(2000)]                   # 10 tokens per doc
    df = spark.createDataFrame(rows)
    # global: 20k tokens available, ask for 5k -> ~500 docs
    out = sample_to_token_budget(df, "doc_id", 5_000)
    n = out.count()
    assert 400 <= n <= 600
    # deterministic under recomputation and across calls
    assert out.count() == n
    assert sample_to_token_budget(df, "doc_id", 5_000).count() == n
    # per-source budgets: each source has 10k tokens; budget 2k -> ~200
    # docs per source; a budget above a group's total takes it whole
    grouped = sample_to_token_budget(df, "doc_id", 2_000, by="source")
    per = {r["source"]: r["n"] for r in
           grouped.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert set(per) == {"web", "code"}
    assert all(140 <= v <= 260 for v in per.values()), per
    whole = sample_to_token_budget(df, "doc_id", 10**9, by="source")
    assert whole.count() == 2000
    # different salt -> different (deterministic) membership
    alt = sample_to_token_budget(df, "doc_id", 5_000, salt="other")
    a = {r["doc_id"] for r in out.select("doc_id").collect()}
    b = {r["doc_id"] for r in alt.select("doc_id").collect()}
    assert a != b


def test_sample_to_token_budget_is_driver_free_and_null_safe(spark):
    """The totals never reach the driver (any-cardinality group
    columns), and a NULL group samples like any other group."""
    from pyspark.sql import Row
    from valkey_search_spark.operators.sampling import (
        sample_to_token_budget,
    )

    df = spark.createDataFrame(
        [Row(doc_id=i, source=None if i % 3 == 0 else f"s{i % 7}",
             text="a b c d e f g h i j") for i in range(700)])
    cls = type(df)
    calls = []
    orig = cls.collect

    def spy(self):
        calls.append(1)
        return orig(self)

    import pytest
    mp = pytest.MonkeyPatch()
    try:
        mp.setattr(cls, "collect", spy)
        out = sample_to_token_budget(df, "doc_id", 1_000, by="source")
        assert calls == []                     # plan build runs no jobs
    finally:
        mp.undo()
    rows = out.collect()
    srcs = {r["source"] for r in rows}
    assert None in srcs                        # null group not dropped
    # ~100 docs per non-null group's 1000-token budget over 10-token docs
    assert 300 < len(rows) < 700


def test_sample_to_token_budget_tiny_fractions_and_hash_join(spark):
    """Sub-1e-6 fractions still select rows (double threshold over 2^30
    cells — no long truncation to zero), and the global case plans a
    HASH join, not a nested loop."""
    from pyspark.sql import Row
    from valkey_search_spark.operators.sampling import (
        sample_to_token_budget,
    )

    # 50k docs x 10 tokens = 500k tokens; budget 5 -> frac 1e-5: the
    # old long-truncated threshold at 1e6 cells kept ~10 cells, but a
    # frac an order lower (5e-7) truncated to ZERO. Emulate with a tiny
    # budget over a big synthetic total by checking non-empty sampling
    # at frac ~2e-6 on a hash-dense keyspace.
    df = spark.range(0, 500_000).select(
        F.col("id").alias("doc_id"),
        F.lit("a b c d e f g h i j").alias("text"))
    out = sample_to_token_budget(df, "doc_id", 10)    # frac = 2e-6
    n = out.count()
    assert 0 < n < 50                                  # ~1 expected, <50 certain
    # grouped case: a real hash equi-join on the group key (the global
    # case constant-folds to a one-row broadcast nested loop, which is
    # cost-identical to a map-side filter)
    df2 = df.withColumn("source", (F.col("doc_id") % 3).cast("string"))
    plan = sample_to_token_budget(df2, "doc_id", 1000, by="source")._jdf \
        .queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan
    assert "CartesianProduct" not in plan


def test_alpha_sample_to_budget_temperature_split(spark):
    """Alpha-weighted budget split (the mT5/XLM-R recipe): alpha=1 gives
    the natural proportions, alpha=0 the uniform split, 0<alpha<1 lands
    between — per-group token sums verified against the closed-form
    share, with deterministic hash membership and whole-group capping."""
    from pyspark.sql import Row
    from valkey_search_spark.operators.sampling import (
        alpha_sample_to_budget,
    )

    # high-resource 'web' (16k tokens), low-resource 'rare' (1k tokens)
    rows = [Row(doc_id=i, source="web",
                text=" ".join(f"w{j}" for j in range(8)))
            for i in range(2000)]
    rows += [Row(doc_id=10_000 + i, source="rare",
                 text=" ".join(f"w{j}" for j in range(8)))
             for i in range(125)]
    df = spark.createDataFrame(rows)
    totals = {"web": 16_000, "rare": 1_000}

    def shares(alpha, budget):
        wsum = sum(t ** alpha for t in totals.values())
        return {s: min(1.0, budget * (t ** alpha) / wsum / t) * t
                for s, t in totals.items()}

    for alpha in (0.0, 0.3, 1.0):
        out = alpha_sample_to_budget(df, "doc_id", 4_000, alpha=alpha)
        got = {r["source"]: r["n"] * 8 for r in
               out.groupBy("source").agg(F.count("*").alias("n"))
               .collect()}
        want = shares(alpha, 4_000)
        for s in totals:
            assert got.get(s, 0) == pytest.approx(want[s],
                                                  rel=0.25), (alpha, s)
    # alpha=0 with a big budget: rare is capped at its whole 1k tokens
    out = alpha_sample_to_budget(df, "doc_id", 10_000, alpha=0.0)
    got = {r["source"]: r["n"] for r in
           out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert got["rare"] == 125                     # taken whole
    # deterministic across recomputation
    o1 = alpha_sample_to_budget(df, "doc_id", 4_000)
    assert o1.count() == o1.count()
    # low-resource boost: rare's sampled-token share rises as alpha
    # drops (the whole point of temperature sampling)
    share = {}
    for alpha in (1.0, 0.3):
        out = alpha_sample_to_budget(df, "doc_id", 4_000, alpha=alpha)
        per = {r["source"]: r["n"] for r in
               out.groupBy("source").agg(F.count("*").alias("n"))
               .collect()}
        share[alpha] = per.get("rare", 0) / max(sum(per.values()), 1)
    assert share[0.3] > share[1.0]
    with pytest.raises(ValueError, match="alpha"):
        alpha_sample_to_budget(df, "doc_id", 100, alpha=-1)


def test_alpha_sample_keeps_zero_token_groups_whole(spark):
    """A group whose docs are all empty/whitespace has no token share
    but must not vanish — taken whole, like the sibling's under-budget
    convention."""
    from pyspark.sql import Row
    from valkey_search_spark.operators.sampling import (
        alpha_sample_to_budget,
    )

    rows = [Row(doc_id=i, source="web", text="a b c d") for i in range(50)]
    rows += [Row(doc_id=100 + i, source="meta", text="   ")
             for i in range(5)]
    out = alpha_sample_to_budget(spark.createDataFrame(rows), "doc_id",
                                 100, alpha=0.3)
    per = {r["source"]: r["n"] for r in
           out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert per.get("meta") == 5                  # kept whole
