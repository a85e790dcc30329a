"""5-term proximity: linear-time matcher speed on the reference's
proximity_5term benchmark shape, plus brute-force equivalence on short
randomized docs (where the cross-product reference is tractable)."""

import itertools
import random
import time

import pytest
from pyspark.sql import Row

from valkey_search_spark import SearchEngine, TextField

WORDS5 = ["w0", "w1", "w2", "w3", "w4"]


def _brute(tokens, words, slop, inorder):
    pos = {}
    for i, t in enumerate(tokens):
        pos.setdefault(t, []).append(i)
    if any(w not in pos for w in words):
        return False
    for combo in itertools.product(*(pos[w] for w in words)):
        if len(set(combo)) != len(combo):
            continue
        if inorder and list(combo) != sorted(combo):
            continue
        seq = sorted(combo)
        if (seq[-1] - seq[0] + 1 - len(words)) <= slop:
            return True
    return False


@pytest.mark.parametrize("inorder", [True, False])
def test_five_term_stress_is_fast(spark, inorder):
    rng = random.Random(5)
    docs = [Row(id=i, body=" ".join(
        rng.choice(WORDS5 + ["x", "y", "z"]) for _ in range(300)))
        for i in range(100)]
    e = SearchEngine(spark)
    e.ft_create("p5", spark.createDataFrame(docs),
                [TextField("body", stopwords=frozenset())], key_column="id")
    t0 = time.perf_counter()
    n = e.ft_search("p5", " ".join(WORDS5), slop=2, inorder=inorder,
                    count_only=True)
    # each query word appears ~37x/doc: a cross-product matcher would do
    # ~37^5 = 7e7 combos per doc; the sweep must finish in seconds
    assert time.perf_counter() - t0 < 60
    assert 0 < n <= 100


@pytest.mark.parametrize("nwords,inorder", [(3, True), (3, False),
                                            (5, True), (5, False)])
def test_k_slot_proximity_is_jvm_only(spark, nwords, inorder):
    """3- and 5-slot proximity (the reference's proximity_5term stress
    shape) compiles to pure JVM expressions — no Arrow/Python nodes —
    except the unordered-with-duplicate-words shape, which keeps the
    kernel."""
    docs = [Row(id=i, body=" ".join(WORDS5))
            for i in range(4)]
    e = SearchEngine(spark)
    e.ft_create("pk", spark.createDataFrame(docs),
                [TextField("body", nostem=True)], key_column="id")
    q = " ".join(WORDS5[:nwords])
    df = e.ft_search("pk", q, slop=2, inorder=inorder, limit=(0, 10))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert df.count() == 4
    # duplicate words across slots, unordered, k=3: kernel fallback path
    dup = e.ft_search("pk", "w0 w0 w1", slop=5, limit=(0, 10))
    assert dup.count() == 0          # only one w0 occurrence per doc


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_k_slot_randomized_equivalence_with_or_groups(spark, seed):
    """Randomized parity of the k-slot JVM paths against the
    cross-product brute force, including OR-group slots (alternatives),
    3..5 slots, and INORDER-without-SLOP."""
    rng = random.Random(seed)
    vocab = ["aa", "bb", "cc", "dd", "ee", "ff", "gg"]
    docs = [Row(id=i, body=" ".join(rng.choice(vocab)
                                    for _ in range(rng.randint(4, 18))))
            for i in range(40)]
    e = SearchEngine(spark)
    e.ft_create("kz", spark.createDataFrame(docs),
                [TextField("body", stopwords=frozenset())], key_column="id")

    def brute_slots(tokens, slots, slop, inorder):
        pos = [[i for i, t in enumerate(tokens) if t in ws] for ws in slots]
        if any(not ps for ps in pos):
            return False
        win = float("inf") if slop is None else slop
        for combo in itertools.product(*pos):
            if len(set(combo)) != len(combo):
                continue
            if inorder and list(combo) != sorted(combo):
                continue
            seq = sorted(combo)
            if (seq[-1] - seq[0] + 1 - len(slots)) <= win:
                return True
        return False

    for _ in range(8):
        k = rng.randint(3, 5)
        pool = rng.sample(vocab, min(len(vocab), k + 1))
        slots = []
        for i in range(k):
            if rng.random() < 0.3:
                slots.append(sorted(rng.sample(pool, 2)))
            else:
                slots.append([rng.choice(pool)])
        inorder = rng.random() < 0.5
        slop = None if (inorder and rng.random() < 0.3) else rng.randint(0, 4)
        qparts = []
        for ws in slots:
            qparts.append(f"@body:({'|'.join(ws)})" if len(ws) > 1
                          else f"@body:{ws[0]}")
        got = {r["id"] for r in e.ft_search(
            "kz", " ".join(qparts), slop=slop, inorder=inorder,
            limit=(0, 100)).collect()}
        want = {d.id for d in docs
                if brute_slots(d.body.split(), slots, slop, inorder)}
        assert got == want, (slots, slop, inorder)


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_randomized_brute_force_equivalence(spark, seed):
    rng = random.Random(seed)
    vocab = ["aa", "bb", "cc", "dd", "ee"]
    docs = [Row(id=i, body=" ".join(rng.choice(vocab)
                                    for _ in range(rng.randint(3, 15))))
            for i in range(30)]
    df = spark.createDataFrame(docs)
    e = SearchEngine(spark)
    e.ft_create("fz", df, [TextField("body", stopwords=frozenset())],
                key_column="id")
    for _ in range(6):
        nwords = rng.randint(2, 4)
        words = (rng.sample(vocab, nwords) if rng.random() < 0.7
                 else [rng.choice(vocab)] * 2 + [rng.choice(vocab)])
        slop = rng.randint(0, 3)
        inorder = rng.random() < 0.5
        got = {r["id"] for r in
               e.ft_search("fz", " ".join(words), slop=slop, inorder=inorder,
                           limit=(0, 100)).collect()}
        want = {d.id for d in docs if _brute(d.body.split(), words, slop, inorder)}
        assert got == want, (words, slop, inorder)


# ---------------------------------------------------------------------------
# stem expansion + INORDER-only (no SLOP) semantics

def test_proximity_terms_are_stem_expanded(spark):
    """Inflected query words match base-form tokens and vice versa — the
    reference builds proximity over stemmed term iterators
    (src/query/search.cc:226-298)."""
    from pyspark.sql import Row
    from valkey_search_spark import SearchEngine, TextField

    df = spark.createDataFrame([
        Row(k="a", body="table big stream"),          # base forms
        Row(k="b", body="tables filter streaming"),   # inflected forms
        Row(k="c", body="stream gap gap gap table"),  # far apart
    ])
    e = SearchEngine(spark)
    e.ft_create("prox_stem", df, [TextField("body")], key_column="k")
    got = {r["k"] for r in e.ft_search("prox_stem", "tables streaming",
                                       slop=1, limit=(0, 10)).collect()}
    assert got == {"a", "b"}        # both match via stems; "c" exceeds slop


def test_inorder_without_slop_is_unbounded_span(spark):
    """INORDER alone constrains order only (reference checks the span only
    when slop_ has a value, src/indexes/text/proximity.h)."""
    from pyspark.sql import Row
    from valkey_search_spark import SearchEngine, TextField

    df = spark.createDataFrame([
        Row(k="ordered_far", body="alpha x1 x2 x3 x4 x5 x6 x7 beta"),
        Row(k="reversed", body="beta alpha"),
        Row(k="adjacent", body="alpha beta"),
    ])
    e = SearchEngine(spark)
    e.ft_create("prox_ord", df, [TextField("body")], key_column="k")
    got = {r["k"] for r in e.ft_search("prox_ord", "alpha beta",
                                       inorder=True, limit=(0, 10)).collect()}
    assert got == {"ordered_far", "adjacent"}
    # with SLOP 0 the far pair drops out again
    tight = {r["k"] for r in e.ft_search("prox_ord", "alpha beta", slop=0,
                                         inorder=True, limit=(0, 10)).collect()}
    assert tight == {"adjacent"}


def test_or_group_proximity_slots(spark):
    """An OR group of terms under SLOP/INORDER is ONE slot of alternatives
    (the reference's orproximity iterator, src/indexes/text/orproximity.cc)."""
    from pyspark.sql import Row
    from valkey_search_spark import SearchEngine, TextField

    df = spark.createDataFrame([
        Row(k="ab", body="alpha gamma"),            # alpha then gamma: adjacent
        Row(k="bb", body="beta gamma"),             # beta also fills slot 1
        Row(k="far", body="alpha x1 x2 x3 gamma"),  # exceeds slop
        Row(k="rev", body="gamma alpha"),           # wrong order for inorder
        Row(k="none", body="delta gamma"),          # slot 1 unfilled
    ])
    e = SearchEngine(spark)
    e.ft_create("orprox", df, [TextField("body")], key_column="k")
    got = {r["k"] for r in e.ft_search(
        "orprox", "@body:(alpha|beta) @body:gamma", slop=0,
        limit=(0, 10)).collect()}
    assert got == {"ab", "bb", "rev"}       # unordered slop=0: adjacency
    ordered = {r["k"] for r in e.ft_search(
        "orprox", "@body:(alpha|beta) @body:gamma", slop=0, inorder=True,
        limit=(0, 10)).collect()}
    assert ordered == {"ab", "bb"}


def test_or_proximity_with_stem_collision_stays_exact(spark):
    """Alternatives that stem into another slot's word (overlapping slots)
    still require DISTINCT positions."""
    from pyspark.sql import Row
    from valkey_search_spark import SearchEngine, TextField

    df = spark.createDataFrame([
        Row(k="one_token", body="tables zebra"),   # "tables"~"table" only once
        Row(k="two", body="table tables"),
    ])
    e = SearchEngine(spark)
    e.ft_create("orprox2", df, [TextField("body")], key_column="k")
    # both slots stem to "tabl": needs two distinct positions with it
    got = {r["k"] for r in e.ft_search(
        "orprox2", "@body:table @body:tables", slop=5,
        limit=(0, 10)).collect()}
    assert got == {"two"}
