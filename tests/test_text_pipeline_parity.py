"""TEXT ingestion pipeline parity against the reference's documented
examples (/root/reference/docs/topics/search-data-formats.md, "Text
Ingestion Examples") — these tables are the reference's own test vectors."""

import pytest
from pyspark.sql import Row, functions as F

from valkey_search_spark.functions.analysis import (
    DEFAULT_STOPWORDS, raw_tokens_column, text_tokens_column,
)
from valkey_search_spark.functions.porter2 import porter2_stem as porter_stem


def _tokens(spark, text):
    df = spark.createDataFrame([Row(s=text)])
    return df.select(raw_tokens_column(F.col("s")).alias("t")).first()["t"]


def _positioned(spark, text):
    df = spark.createDataFrame([Row(s=text)])
    out = df.select(text_tokens_column(F.col("s"), DEFAULT_STOPWORDS).alias("t")
                    ).first()["t"]
    return [(r["t"], r["p"]) for r in out]


# Lexical Processing Examples table (search-data-formats.md)
@pytest.mark.parametrize("text,expected", [
    ("hello world", ["hello", "world"]),
    ("hello, world!", ["hello", "world"]),
    ("it's a test", ["it", "s", "a", "test"]),
    ("hello-world", ["hello", "world"]),
    ("price: $100", ["price", "100"]),
    (r"hello\,world", ["hello,world"]),
])
def test_lexer_documented_examples(spark, text, expected):
    assert _tokens(spark, text) == expected


def test_case_folding(spark):
    assert _tokens(spark, "The QUICK Brown") == ["the", "quick", "brown"]


def test_underscore_is_not_punctuation(spark):
    # '_' is absent from the default punctuation set, so it stays in words
    assert _tokens(spark, "snake_case word") == ["snake_case", "word"]


def test_custom_punctuation_set(spark):
    # PUNCTUATION ",.!?" — '-' no longer splits words
    from pyspark.sql import Row
    from valkey_search_spark.functions.analysis import raw_tokens_column

    df = spark.createDataFrame([Row(s="hello-world, bye!now")])
    out = df.select(raw_tokens_column(F.col("s"), ",.!?").alias("t")).first()["t"]
    assert out == ["hello-world", "bye", "now"]


def test_multibyte_chars_stay_in_words(spark):
    # CJK / emoji are never punctuation (byte-level set)
    assert _tokens(spark, "日本語 emoji🙂word") == ["日本語", "emoji🙂word"]


def test_stopword_positions_documented_example(spark):
    """'the quick brown fox' -> quick=0, brown=1, fox=2: removed stop words
    do not occupy a position (search-data-formats.md Stop Word Removal)."""
    assert _positioned(spark, "the quick brown fox") == [
        ("quick", 0), ("brown", 1), ("fox", 2)]
    assert _positioned(spark, "the quick brown fox is not fast") == [
        ("quick", 0), ("brown", 1), ("fox", 2), ("fast", 3)]


def test_stemming_variants_share_stem():
    # "running", "runs", "run" all have the same stem (Stemming section)
    assert porter_stem("running") == porter_stem("runs") == porter_stem("run")


@pytest.mark.parametrize("word,stem", [
    ("caresses", "caress"), ("ponies", "poni"), ("cats", "cat"),
    ("feed", "feed"), ("agreed", "agre"), ("plastered", "plaster"),
    ("motoring", "motor"), ("sing", "sing"), ("conflated", "conflat"),
    ("troubling", "troubl"), ("sized", "size"), ("hopping", "hop"),
    ("falling", "fall"), ("hissing", "hiss"), ("failing", "fail"),
    ("filing", "file"), ("happy", "happi"), ("relational", "relat"),
    ("conditional", "condit"), ("valency", "valenc"),
])
def test_porter_published_vectors(word, stem):
    """Step examples from Porter's published algorithm description."""
    assert porter_stem(word) == stem


def test_phrase_skips_stopwords(spark, tmp_path):
    """Phrase matching over post-removal positions: 'quick fox' matches
    'the quick [stopword] fox'."""
    from valkey_search_spark import SearchEngine, TextField

    docs = spark.createDataFrame([
        Row(id=1, body="the quick is fox jumps"),    # quick,fox consecutive post-removal
        Row(id=2, body="quick brown fox"),           # quick,fox NOT consecutive
        Row(id=3, body="quick fox"),
    ])
    e = SearchEngine(spark)
    e.ft_create("d", docs, [TextField("body")], key_column="id")
    got = sorted(r["id"] for r in
                 e.ft_search("d", '@body:"quick fox"', limit=(0, 10)).collect())
    assert got == [1, 3]


def test_bpe_piece_count(spark):
    """GPT-2 pre-tokenizer piece counts: contractions split, letter/digit
    runs and punctuation counted as separate pieces, whitespace free."""
    from pyspark.sql import Row
    from valkey_search_spark.operators.textops import bpe_piece_count_col

    rows = [
        Row(id=1, t="hello world"),            # 2 pieces
        Row(id=2, t="don't stop"),             # don + 't + stop = 3
        Row(id=3, t="a1b2"),                   # a + 1 + b + 2 = 4
        Row(id=4, t="wait... what?!"),         # wait + ... + what + ?! = 4
        Row(id=5, t=""),                       # 0
    ]
    df = spark.createDataFrame(rows).withColumn(
        "n", bpe_piece_count_col(F.col("t")))
    got = {r["id"]: r["n"] for r in df.collect()}
    assert got == {1: 2, 2: 3, 3: 4, 4: 4, 5: 0}


def test_parallelize_spreads_in_memory_frames(spark):
    """An under-partitioned IN-MEMORY frame (inputFiles() == []) still
    gets repartitioned to defaultParallelism — the file-count proxy only
    applies to file-backed scans."""
    from valkey_search_spark.operators.dedup import _parallelize

    target = spark.sparkContext.defaultParallelism
    rdd = spark.sparkContext.parallelize(
        [(i, f"text {i}") for i in range(50)], 1)
    df = spark.createDataFrame(rdd, "k int, t string")
    assert df.inputFiles() == [] and df.rdd.getNumPartitions() == 1
    out = _parallelize(df)
    assert out.rdd.getNumPartitions() == target
    # well-partitioned in-memory frames are left alone (no extra shuffle)
    wide = spark.createDataFrame(
        spark.sparkContext.parallelize(
            [(i, "t") for i in range(50)], target), "k int, t string")
    assert "Repartition" not in \
        _parallelize(wide)._jdf.queryExecution().logical().toString()


def test_unicode_full_case_folding(spark):
    """Non-ASCII case folding follows the reference's ICU foldCase for
    the common full-fold mappings (lexer.cc:193-199,
    unicode_normalizer.cc:22-28): sharp s -> ss, Latin ligatures
    expanded, final sigma normalized, micro sign -> mu — identically at
    ingest (JVM column) and query time (Python twin)."""
    from pyspark.sql import Row
    from valkey_search_spark import SearchEngine, TextField
    from valkey_search_spark.functions.analysis import fold_case

    docs = spark.createDataFrame([
        Row(id=1, body="die Straße nach Berlin"),
        Row(id=2, body="ein ﬁnanzieller Bericht"),
        Row(id=3, body="ΟΔΟΣ προς athens"),
        Row(id=4, body="5 µm particles"),
    ])
    e = SearchEngine(spark)
    e.ft_create("uni", docs, [TextField("body", stopwords=frozenset())],
                key_column="id")
    cases = [("strasse", [1]), ("STRAße", [1]), ("Straße", [1]),
             ("finanzieller", [2]), ("ﬁnanzieller", [2]),
             ("οδοσ", [3]), ("ΟΔΟΣ", [3]), ("οδος", [3]),
             ("μm", [4]), ("µm", [4])]
    for q, want in cases:
        got = sorted(r["id"] for r in
                     e.ft_search("uni", q, limit=(0, 9)).collect())
        assert got == want, q
    # the Python twin agrees with the column fold on every mapping
    for s in ("STRAßE", "ﬁﬂﬀ", "ΟΔΟΣ ὈΔΥΣΣΕΎΣ", "µ ſ ﬅ"):
        assert fold_case(s) == fold_case(fold_case(s))   # idempotent


def test_hashed_embeddings_bridge_text_to_vector_stack(spark):
    """Feature-hashing vectors: deterministic, unit-norm, lexically
    discriminative — and they drive the vector-side dedup operators on
    plain text (semantic_dedup collapses a near-copy; cosine pairs
    find it) with a Python-free hashing plan."""
    import numpy as np
    from pyspark.sql import functions as F

    from valkey_search_spark.operators.semdedup import semantic_dedup
    from valkey_search_spark.operators.textops import hashed_embeddings

    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .limit(60))
    near = (docs.limit(1)
            .withColumn("doc_id", F.lit(999999))
            .withColumn("text", F.concat(F.col("text"), F.lit(" extra"))))
    pool = docs.unionByName(near)
    emb = hashed_embeddings(pool, dim=256)
    rows = {r["doc_id"]: np.array(r["embedding"]) for r in emb.collect()}
    assert len(rows) == 61
    norms = [np.linalg.norm(v) for v in rows.values()]
    assert all(abs(n - 1.0) < 1e-5 for n in norms)          # unit vectors
    first = docs.first()["doc_id"]
    cos_near = float(rows[first] @ rows[999999])
    others = [float(rows[first] @ v) for k, v in rows.items()
              if k not in (first, 999999)]
    # the synthetic corpus itself contains planted near-dups, so compare
    # against the TYPICAL similarity, not the max
    assert cos_near > 0.95
    assert sorted(others)[len(others) // 2] < 0.8           # median far
    # determinism under a fresh plan
    again = {r["doc_id"]: np.array(r["embedding"])
             for r in hashed_embeddings(pool, dim=256).collect()}
    assert all(np.array_equal(rows[k], again[k]) for k in rows)
    # vector-stack composition: semantic dedup collapses the near-copy
    kept = {r["doc_id"] for r in
            semantic_dedup(emb, key="doc_id", threshold=0.9, n_clusters=4,
                           seed=1, max_iter=5).select("doc_id").collect()}
    assert len({first, 999999} & kept) <= 1                  # pair collapsed
    # hashing plan is Python-free
    plan = (hashed_embeddings(docs, dim=64)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
