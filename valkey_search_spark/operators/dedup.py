"""Deduplication operators for training-data pipelines at 100 TB.

Each operator is expressed as shuffle-conscious DataFrame composition:

- exact_dedup:       hash-groupBy on a fingerprint — one shuffle on the
                     fingerprint key; no UDFs.
- minhash_lsh_pairs: shingle -> k minhashes -> band buckets -> bucket
                     equi-join -> exact-Jaccard verify. The join is on
                     (band, bucket) so candidate generation never goes
                     O(n^2); skewed buckets are handled by AQE skew join.
- simhash:           64-bit sign fingerprint (Charikar); near-dups share
                     Hamming-close codes, found via band equi-join.
- ngram_jaccard_pairs: exact n-gram Jaccard via token-gram inverted join
                     (explode -> join on gram -> count shared / union).
- embedding_cosine_pairs: cosine near-dup over array<float> embeddings;
                     physical strategy picked from the threshold s-curve —
                     OR-amplified hyperplane LSH where it prunes
                     (selective thresholds), exact distributed
                     block-matrix BLAS in the bulk.
"""

from __future__ import annotations

import math
import re

import pandas as pd

from pyspark import StorageLevel
from pyspark.sql import DataFrame, functions as F, types as T

from ..functions.analysis import raw_tokens_column


def _with_handles(out: DataFrame, *cached: DataFrame) -> DataFrame:
    """Attach the intermediate persisted frames to the returned DataFrame
    so callers can free them once the result has been consumed. Long-lived
    sessions that call the pair generators repeatedly would otherwise
    accumulate cached RDDs (the frames are persisted because 2-3 branches
    of one job reuse them, not to outlive the job)."""
    out._vss_cached = list(cached)
    return out


def release(df: DataFrame, blocking: bool = False) -> None:
    """Unpersist the intermediates cached while building ``df``. Call after
    the frame has been fully consumed (collected / written). No-op for
    frames that carry no handles."""
    for c in getattr(df, "_vss_cached", []):
        c.unpersist(blocking)
    df._vss_cached = []


# logical-plan nodes that imply a shuffle (or an ordering that a
# round-robin spread would destroy); matched at line starts of the plan
# tree — "+- Join Inner, ..." / "   Window [...]" — never inside column
# names. Repartition covers both Repartition and RepartitionByExpression.
_SHUFFLE_NODE_RE = re.compile(
    r"^[\s:+-]*(?:Window|Join|Aggregate|Repartition|Deduplicate|Sort)\b",
    re.MULTILINE)


def _parallelize(df: DataFrame) -> DataFrame:
    """Round-robin repartition when the input has fewer partitions than
    cores. A single small parquet file reads as ONE task; the per-row
    hashing below is CPU-bound, so an under-partitioned input serializes
    the whole job. At real scale inputs are already well-partitioned and
    this is a no-op.

    Frames that already contain a shuffle (window/join/aggregate) are left
    alone WITHOUT probing partition counts: their layout follows
    spark.sql.shuffle.partitions, and df.rdd on such a plan triggers AQE
    stage execution — an eager job inside what must stay a lazy builder.
    Node names are matched at LINE STARTS of the plan tree (a user
    column literally named e.g. 'join_key_Window' must not disable the
    spread), and 'Sort' is excluded too: appending a round-robin
    repartition to a caller-sorted single-file frame would silently
    destroy its row order."""
    plan = df._jdf.queryExecution().logical().toString()
    if _SHUFFLE_NODE_RE.search(plan):
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    # file count is a pure-metadata proxy for scan parallelism — unlike
    # df.rdd.getNumPartitions() it never converts the plan to an RDD (a
    # per-call analysis cost on every builder invocation). Splittable
    # formats may read one big file as many tasks, in which case this
    # repartitions a frame that didn't need it — harmless for the small
    # under-partitioned inputs this guard exists for.
    try:
        nfiles = len(df.inputFiles())
    except Exception:
        return df
    if nfiles == 0:
        # in-memory frame (LocalRelation / parallelized RDD): no files to
        # count, so probe the partition count directly — safe here because
        # the shuffle-keyword guard above already excluded every plan
        # where df.rdd would trigger AQE stage execution
        try:
            if df.rdd.getNumPartitions() < target:
                return df.repartition(target)
        except Exception:
            pass
        return df
    if nfiles < target:
        return df.repartition(target)
    return df


def _pin(col):
    """Identity wrapper that pins an expensive expression to exactly ONE
    evaluation in the projection that defines it, by making the defining
    expression formally nondeterministic: ``spark_partition_id() >= -1``
    is always true (the wrapped value is returned unchanged for every
    row, retries included), but the optimizer may not duplicate, inline,
    constant-fold, or push expressions containing a nondeterministic
    node. Without it two rules re-run the tokenizer over the corpus:
    ``InferFiltersFromGenerate`` derives ``size(toks) > 0 AND
    isnotnull(toks)`` from a posexplode and pushdown substitutes the
    full tokenizer into that filter BELOW the parallelizing exchange
    (two extra serial evaluations per row on an under-partitioned
    scan — measured 6 tokenizer copies in hygiene_decontaminate's plan,
    2 after the pin), and ``CollapseProject`` inlines the tokenizer
    into every downstream reference when projections merge. Guardrails:
    (``rand() > c`` folds — Spark 4 knows rand's range; ``spark_
    partition_id`` comparisons survive). Side effect to keep in mind:
    no later filter can be pushed below the pinned projection."""
    return F.when(F.spark_partition_id() >= -1, col)


def _staged_tokens(df: DataFrame, key: str, text_col: str,
                   carry: tuple[str, ...] = (),
                   barrier: bool = True) -> DataFrame:
    """(k, __toks) with the token array pinned to one evaluation
    (``_pin``). The shingle expressions below reference the token array
    many times (size, sequence bound, one slice per position INSIDE an
    array lambda — lambda-captured expressions re-evaluate per element
    and are never CSE'd); deriving them from the raw text column re-runs
    the tokenizer regex per reference — observed 15-20x per row. The
    nondeterministic pin forbids that inlining outright, so the array
    is computed exactly once whatever the consumer shape.

    ``barrier=True`` (historical default) additionally materializes the
    arrays through a repartition exchange — kept for consumers whose
    plans still want the even re-spread after tokenization; the pin,
    not the exchange, is what prevents re-evaluation now.

    ``barrier=False`` skips the repartition for consumers whose
    downstream references the array only as a TOP-LEVEL projection
    attribute (the posexplode window shape: explode + size + slice) —
    no corpus shuffle, and the shuffle would otherwise be re-executed
    per consuming branch (pruned projections defeat exchange reuse)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    out = (_parallelize(df)
           .select(F.col(key).alias("k"),
                   _pin(raw_tokens_column(F.col(text_col))).alias("__toks"),
                   *carry))
    return out.repartition(target) if barrier else out


def _gram_rows(df: DataFrame, key: str, text_col: str, n: int,
               carry: tuple[str, ...] = ()) -> DataFrame:
    """(k, g) rows, one per word n-gram window occurrence, built
    explode-safely: posexplode runs over the staged ATTRIBUTE token
    array and each gram derives from a per-position slice. Exploding a
    BUILT grams array instead would cost O(windows^2) per document —
    Generate re-evaluates a computed child array once per output
    element. Consumed by the Jaccard inverted join.

    Gram identity is ``xxhash64`` of the TOKEN SLICE (the gram_set
    contract — array hash, not a joined string; r11): the inverted
    join shuffles and groups on 8-byte longs instead of gram strings
    (~2-3x less shuffle payload), token boundaries can't conflate
    ("a b"+"c" vs "a"+"b c"), and Jaccard over hashed grams equals
    string-gram Jaccard up to 2^-64 collisions — the approximation the
    whole dedup family already makes (minhash verify, span dedup,
    line dedup)."""
    staged = _staged_tokens(df, key, text_col, carry=carry)
    toks = F.col("__toks")
    return (staged.select("k", "__toks",
                          F.posexplode("__toks").alias("__i", "__t"),
                          *carry)
            .where(F.col("__i") <= F.size(toks) - n)
            .select("k", F.xxhash64(
                F.slice(toks, F.col("__i") + 1, n)).alias("g"),
                *carry))


def _shingles_of(toks, n: int):
    # Documents shorter than n tokens yield NULL (no truncated gram) —
    # deliberately matching _gram_rows' `__i <= size - n` window filter,
    # so ngram_jaccard_pairs' default and stop-gram branches agree that
    # sub-shingle documents are out of scope (pinned in test_curation_pipeline).
    cnt = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(cnt - (n - 1), F.lit(1)))
    return F.when(cnt >= n, F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))))


def _word_shingles(text_col, n: int = 3):
    """array<string> of word n-grams of the token stream.

    PERFORMANCE: pass a MATERIALIZED token/text column, not a nested
    expression — the slice inside the transform lambda re-evaluates the
    captured expression per element (no CSE inside array lambdas). The
    production paths stage tokens through an exchange first
    (`_staged_tokens`); this raw-text form exists for small/ad-hoc
    frames."""
    toks = raw_tokens_column(text_col)
    cnt = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(cnt - (n - 1), F.lit(1)))
    return F.when(cnt >= n,
                  F.array_distinct(F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))))


# ---------------------------------------------------------------------------
def exact_dedup(df: DataFrame, key: str, text_col: str = "text") -> DataFrame:
    """Keep one representative (min key) per identical normalized text.
    One shuffle on the md5 fingerprint; survives any scale."""
    from .textops import fingerprint_col

    fp = df.withColumn("__fp", fingerprint_col(F.col(text_col)))
    return (fp.groupBy("__fp")
              .agg(F.min(key).alias(key), F.count(F.lit(1)).alias("dup_count"))
              .drop("__fp"))


# ---------------------------------------------------------------------------
def hashed_shingles(text_col, shingle_n: int = 3):
    """array<bigint>: each distinct word n-gram hashed ONCE (the only
    string-hash pass). Downstream minhashing re-hashes these 8-byte longs,
    which is ~an order of magnitude cheaper than re-hashing strings per
    seed; Jaccard over the hashed sets equals Jaccard over the string sets
    up to 64-bit collisions."""
    sh = _word_shingles(text_col, shingle_n)
    return F.when(sh.isNotNull(),
                  F.transform(sh, lambda g: F.xxhash64(g)))


def minhash_signature(text_col, num_hashes: int = 32, shingle_n: int = 3):
    """array<bigint> of k minhashes — min over seeded re-hash of the
    once-hashed shingles. Pure JVM expressions: no Python, no shuffle."""
    hs = hashed_shingles(text_col, shingle_n)
    return F.when(
        hs.isNotNull(),
        F.transform(
            F.sequence(F.lit(0), F.lit(num_hashes - 1)),
            lambda seed: F.array_min(F.transform(hs, lambda h: F.xxhash64(h, seed))),
        ),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    key: str,
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    threshold: float = 0.7,
    new_col: str | None = None,
) -> DataFrame:
    """Near-duplicate pairs (a < b) with exact Jaccard >= threshold, using
    MinHash banding for candidate generation (the classic s-curve: with
    32 hashes / 8 bands / rows=4, the 50% crossover sits near J≈0.59).

    Plan shape: explode bands (xN rows) -> shuffle on (band, bucket) ->
    self-join inside buckets -> dedupe candidates -> verify with exact
    Jaccard on shingle sets. At 100 TB the only O(n^2) danger is a hot
    bucket; AQE skew-join splits those.

    ``new_col`` (incremental mode) names a boolean column: only pairs
    involving at least one ``new_col=true`` document are emitted, via an
    ASYMMETRIC bucket join (new rows on the left vs all rows) — the
    old-vs-old quadratic work within each bucket is never enumerated,
    and the small new side broadcasts so the corpus bands stream
    map-side. A daily batch dedups against an accumulated corpus at the
    cost of new-involving pairs only (see
    ``minhash_lsh_pairs_incremental``)."""
    rows = num_hashes // bands
    # hashed-shingle base: tokens staged through the exchange (computed
    # once), ONE string-hash pass, persisted because three downstream
    # branches (banding ×2 join sides, verify) reuse it.
    # NOTE: no isNotNull filter here — a Filter over the aliased projection
    # gets pushed below it, DUPLICATING the expensive expression; null hs
    # rows drop out naturally at the explode and the jaccard threshold
    carry = (new_col,) if new_col else ()
    # barrier=False: base persists immediately below, so the token
    # arrays materialize into the cache — the historical repartition
    # exchange before it was a full-corpus shuffle for nothing (the
    # _pin already guarantees one tokenizer evaluation)
    staged = _staged_tokens(df, key, text_col, carry=carry, barrier=False)
    sh = _shingles_of(F.col("__toks"), shingle_n)
    # MEMORY_AND_DISK (serialized): the hashed-shingle base is
    # corpus-scale, so the cache must spill instead of squeezing
    # execution memory (guide §5); released via _with_handles below
    base = staged.select(
        "k",
        F.transform(sh, lambda g: F.xxhash64(g)).alias("hs"),
        *carry,
    ).persist(StorageLevel.MEMORY_AND_DISK)

    sig = F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda seed: F.array_min(F.transform(F.col("hs"),
                                             lambda h: F.xxhash64(h, seed))))

    # candidate generation on (k, band, bucket) ONLY — never carry the
    # shingle arrays through the banded self-join shuffle (at 50k+ docs
    # that would duplicate every document's gram set 2×bands× per match).
    # Plumbing: the signature computes ONCE per document in the
    # projection BENEATH the explode and rides through as an attribute;
    # the generator child is a cheap integer sequence. (Exploding an
    # array whose elements reference `sig` would re-evaluate the full
    # 32-minhash signature per band twice over — Generate re-evaluates
    # a computed child array per output element, and lambda-captured
    # expressions re-evaluate per element; measured ~5x on this build.)
    banded = (base
              .select("k", sig.alias("__sig"),
                      F.explode(F.sequence(F.lit(0), F.lit(bands - 1))
                                ).alias("band"), *carry)
              .select("k", "band",
                      F.xxhash64(F.array_join(
                          F.transform(
                              F.slice(F.col("__sig"),
                                      F.col("band") * rows + 1, rows),
                              lambda h: h.cast("string")),
                          ",")).alias("bucket"), *carry)
              .persist())

    if new_col:
        # ASYMMETRIC join: left side holds only the new rows, so the
        # old-vs-old cross products inside each bucket are never
        # ENUMERATED (a residual `l.new OR r.new` predicate on the
        # symmetric join would still generate every old-old match and
        # filter it afterwards — measured slower than the full join).
        # The new side is the small one; Spark broadcasts it and the
        # corpus bands stream map-side. (new, new) pairs arrive in both
        # orientations; least/greatest + dropDuplicates normalizes.
        left = banded.where(F.col(new_col)).drop(new_col)
        cand = (
            left.alias("l").join(banded.alias("r"), on=["band", "bucket"])
            .where(F.col("l.k") != F.col("r.k"))
            .select(F.least(F.col("l.k"), F.col("r.k")).alias("a"),
                    F.greatest(F.col("l.k"), F.col("r.k")).alias("b"))
            .dropDuplicates(["a", "b"])
        )
    else:
        cand = (
            banded.alias("l").join(banded.alias("r"), on=["band", "bucket"])
            .where(F.col("l.k") < F.col("r.k"))
            .select(F.col("l.k").alias("a"), F.col("r.k").alias("b"))
            .dropDuplicates(["a", "b"])
        )

    # verify: join the (deduped, small) candidate set back to the hashed
    # shingle sets — two key-equi joins instead of shipping arrays through
    # banding; Jaccard over hashed sets == Jaccard over string sets w.h.p.
    hs = base.drop(*carry) if carry else base
    cand = (cand.join(hs.withColumnRenamed("k", "a").withColumnRenamed("hs", "hsa"), "a")
                .join(hs.withColumnRenamed("k", "b").withColumnRenamed("hs", "hsb"), "b"))
    inter = F.size(F.array_intersect(F.col("hsa"), F.col("hsb"))).cast("double")
    union = F.size(F.array_union(F.col("hsa"), F.col("hsb"))).cast("double")
    out = (cand.withColumn("jaccard", F.round(inter / union, 6))
               .where(F.col("jaccard") >= threshold)
               .select("a", "b", "jaccard"))
    return _with_handles(out, base, banded)


# ---------------------------------------------------------------------------
def ngram_jaccard_pairs(
    df: DataFrame, key: str, text_col: str = "text",
    shingle_n: int = 3, threshold: float = 0.5,
    stop_gram_df: int | None = None,
    new_col: str | None = None,
) -> DataFrame:
    """n-gram Jaccard similarity join via the inverted-index pattern:
    explode grams -> equi-join on gram -> per-pair shared count -> Jaccard.
    Never materializes the cross product; the shuffle key is the gram.

    ``stop_gram_df`` is the scale knob for gram-frequency skew (the one
    O(n^2) risk of the inverted join — a gram appearing in f documents
    contributes f^2 join rows): grams with document frequency above the
    cutoff are excluded from CANDIDATE generation only; candidates are
    then verified with exact Jaccard over each pair's full hashed gram
    sets, so reported similarities are unaffected. The (documented)
    approximation: a qualifying pair ALL of whose shared grams are
    stop-grams is missed — at realistic thresholds near-dup pairs share
    many grams and virtually always a rare one.

    ``new_col`` (incremental mode, same contract as the minhash/simhash
    operators): only pairs involving at least one flagged document, via
    the asymmetric new-vs-all gram join — old-vs-old pairs never
    enumerate in either branch.

    PRECONDITION: ``key`` values must be unique (one row per document,
    the contract of every pair generator in this module). With
    duplicate keys the per-ROW gram staging merges nothing, so a key's
    shared grams double-count (inflated inter / na / nb) instead of
    collapsing to one per-key gram set — dropDuplicates([key]) dirty
    inputs first."""
    carry = (new_col,) if new_col else ()
    if stop_gram_df is None:
        # per-document DISTINCT gram-hash array, materialized ONCE by a
        # persist (the same base shape as the stop-gram branch and the
        # minhash verify): exploding the persisted attribute restores
        # the one-row-per-(doc, gram) SET semantics without a
        # dropDuplicates shuffle, and the per-doc set size rides each
        # gram row as one long — so the old separate `sizes`
        # aggregation and its two post-agg equi-joins disappear
        # entirely. Gram identity is unchanged (xxhash64 of the token
        # slice), so emitted jaccard values are bit-identical.
        # barrier=False: the very next select persists — see
        # minhash_lsh_pairs
        staged = _staged_tokens(df, key, text_col, carry=carry,
                                barrier=False)
        toks = F.col("__toks")
        hs = F.when(F.size(toks) >= shingle_n, F.array_distinct(
            F.transform(F.sequence(F.lit(1),
                                   F.size(toks) - shingle_n + 1),
                        lambda i: F.xxhash64(
                            F.slice(toks, i, shingle_n)))))
        # corpus-scale cache: serialized + disk spill (guide §5)
        base = staged.select("k", hs.alias("hs"), *carry).persist(
            StorageLevel.MEMORY_AND_DISK)
        grams = base.select("k", F.size("hs").alias("n"),
                            F.explode("hs").alias("g"), *carry)
        if new_col:
            # asymmetric: new-only grams vs all grams — old-old pairs
            # never enumerate. A new-new pair would match in both
            # orientations, so the right side contributes it only when
            # l.k < r.k; new-old pairs join once whatever the key order,
            # then least/greatest normalizes (sizes swap with the keys).
            left = grams.where(F.col(new_col)).drop(new_col)
            lt = F.col("l.k") < F.col("r.k")
            shared = (
                left.alias("l").join(grams.alias("r"), on="g")
                .where(~F.col(f"r.{new_col}") | lt)
                .groupBy(F.least(F.col("l.k"), F.col("r.k")).alias("a"),
                         F.greatest(F.col("l.k"), F.col("r.k"))
                         .alias("b"),
                         F.when(lt, F.col("l.n")).otherwise(F.col("r.n"))
                         .alias("na"),
                         F.when(lt, F.col("r.n")).otherwise(F.col("l.n"))
                         .alias("nb"))
                .agg(F.count(F.lit(1)).alias("inter"))
            )
        else:
            shared = (
                grams.alias("l").join(grams.alias("r"), on="g")
                .where(F.col("l.k") < F.col("r.k"))
                .groupBy(F.col("l.k").alias("a"), F.col("r.k").alias("b"),
                         F.col("l.n").alias("na"), F.col("r.n").alias("nb"))
                .agg(F.count(F.lit(1)).alias("inter"))
            )
        out = (
            shared.withColumn("jaccard", F.round(
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6))
            .where(F.col("jaccard") >= threshold)
            .select("a", "b", "jaccard")
        )
        return _with_handles(out, base)

    # candidate-then-verify with a stop-gram cutoff: hashed gram sets are
    # the verify payload (Jaccard over 64-bit hashed grams == string-gram
    # Jaccard up to collisions, same contract as the minhash verify)
    staged = _staged_tokens(df, key, text_col, carry=carry,
                            barrier=False)   # persists next — no barrier
    sh = _shingles_of(F.col("__toks"), shingle_n)
    base = staged.select(
        "k", F.transform(sh, lambda g: F.xxhash64(g)).alias("hs"),
        *carry).persist(StorageLevel.MEMORY_AND_DISK)   # corpus-scale
    grams = base.select("k", F.explode(F.col("hs")).alias("g"), *carry)
    rare = (grams.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
            .where(F.col("df") <= stop_gram_df).select("g"))
    rare_grams = grams.join(rare, "g")
    if new_col:
        left = rare_grams.where(F.col(new_col)).drop(new_col)
        cand = (left.alias("l").join(rare_grams.alias("r"), on="g")
                .where(~F.col(f"r.{new_col}")
                       | (F.col("l.k") < F.col("r.k")))
                .select(F.least(F.col("l.k"), F.col("r.k")).alias("a"),
                        F.greatest(F.col("l.k"), F.col("r.k")).alias("b"))
                .dropDuplicates(["a", "b"]))
    else:
        cand = (rare_grams.alias("l").join(rare_grams.alias("r"), on="g")
                .where(F.col("l.k") < F.col("r.k"))
                .select(F.col("l.k").alias("a"), F.col("r.k").alias("b"))
                .dropDuplicates(["a", "b"]))
    hsb = base.drop(*carry) if carry else base
    cand = (cand.join(hsb.withColumnRenamed("k", "a")
                          .withColumnRenamed("hs", "hsa"), "a")
                .join(hsb.withColumnRenamed("k", "b")
                          .withColumnRenamed("hs", "hsb"), "b"))
    inter = F.size(F.array_intersect(F.col("hsa"), F.col("hsb"))).cast("double")
    union = F.size(F.array_union(F.col("hsa"), F.col("hsb"))).cast("double")
    out = (cand.withColumn("jaccard", F.round(inter / union, 6))
               .where(F.col("jaccard") >= threshold)
               .select("a", "b", "jaccard"))
    return _with_handles(out, base)


# ---------------------------------------------------------------------------
def _simhash_pack(hashes_col, bits: int = 64):
    """Pack an array<bigint> of token hashes into the SimHash code."""
    @F.pandas_udf(T.LongType())
    def _pack(hash_lists: pd.Series) -> pd.Series:
        import numpy as np

        def go(lst):
            if lst is None or len(lst) == 0:
                return None
            h = np.asarray(lst, dtype=np.uint64)
            # matrix of bits: (n_tokens, 64)
            bits_m = ((h[:, None] >> np.arange(bits, dtype=np.uint64)) & 1).astype(np.int64)
            votes = (2 * bits_m - 1).sum(axis=0)
            code = np.uint64(0)
            for b in np.nonzero(votes > 0)[0]:
                code |= np.uint64(1) << np.uint64(b)
            return int(code.astype(np.int64))

        return hash_lists.apply(go)

    return _pack(hashes_col)


def simhash_col(text_col, bits: int = 64):
    """Charikar SimHash over tokens: per-bit majority vote of token hashes,
    packed into one bigint. The bit-vote is procedural, so this is the one
    dedup kernel on the Pandas-UDF path (Arrow-batched; the token hashing
    stays JVM-side via xxhash64)."""
    toks = raw_tokens_column(text_col)
    return _simhash_pack(F.transform(toks, lambda t: F.xxhash64(t)), bits)


def minhash_lsh_pairs_incremental(new: DataFrame, corpus: DataFrame,
                                  key: str, text_col: str = "text",
                                  **kwargs) -> DataFrame:
    """Incremental ingest dedup: near-dup pairs of a NEW batch against an
    accumulated corpus (and within the batch itself) — old-vs-old pairs
    are never generated, so a daily batch pays |new|-proportional join
    work inside each LSH bucket instead of the corpus's quadratic term
    (the streaming-ingest posture: the historical corpus was already
    deduped when it accumulated). Keys must be distinct across the two
    frames; output is (a, b, jaccard) with at least one side from
    ``new``."""
    cols = [key, text_col]
    tagged = (corpus.select(*cols).withColumn("__is_new", F.lit(False))
              .unionByName(
                  new.select(*cols).withColumn("__is_new", F.lit(True))))
    return minhash_lsh_pairs(tagged, key, text_col,
                             new_col="__is_new", **kwargs)


def ngram_jaccard_pairs_incremental(new: DataFrame, corpus: DataFrame,
                                    key: str, text_col: str = "text",
                                    **kwargs) -> DataFrame:
    """Incremental form of ``ngram_jaccard_pairs`` — same union+tag
    contract as ``minhash_lsh_pairs_incremental`` (disjoint keys)."""
    cols = [key, text_col]
    tagged = (corpus.select(*cols).withColumn("__is_new", F.lit(False))
              .unionByName(
                  new.select(*cols).withColumn("__is_new", F.lit(True))))
    return ngram_jaccard_pairs(tagged, key, text_col,
                               new_col="__is_new", **kwargs)


def simhash_pairs(df: DataFrame, key: str, text_col: str = "text",
                  max_hamming: int = 3, bands: int | None = None,
                  hash_fn: str = "xxhash64",
                  new_col: str | None = None) -> DataFrame:
    """Near-dup pairs by SimHash: band the 64-bit code into ``bands`` chunks
    (pigeonhole: hamming <= bands-1 guarantees a shared chunk), equi-join on
    (band, chunk), verify exact Hamming distance via bit_count(xor).

    Candidate generation must never lose a qualifying pair (the recall
    contract HNSW candidate expansion honors in the reference,
    src/indexes/vector_hnsw.cc:315-340), so the pigeonhole precondition is
    enforced: ``bands`` defaults to ``max_hamming + 1`` and an explicit
    ``bands <= max_hamming`` raises instead of silently under-recalling.
    The bits are split as evenly as possible (e.g. 7 bands = widths
    10,9,9,...) so every band position is covered.

    ``hash_fn``: "xxhash64" (default — fastest, 64-bit codes) or "md5"
    (60-bit codes from the top 15 hex chars of md5 — bit-identically
    reproducible in standard SQL, so the driver's DuckDB oracle can
    verify the whole pipeline value-for-value; ~same speed at the
    token counts documents carry, both JVM-side).

    ``new_col`` (incremental mode, same contract as
    ``minhash_lsh_pairs``): only pairs involving at least one flagged
    document, via the asymmetric new-vs-all chunk join — old-vs-old
    candidates are never enumerated."""
    if hash_fn == "xxhash64":
        nbits = 64

        def hasher(t):
            return F.xxhash64(t)
    elif hash_fn == "md5":
        nbits = 60

        def hasher(t):
            return F.conv(F.substring(F.md5(t.cast("binary")), 1, 15),
                          16, 10).cast("long")
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    carry = (new_col,) if new_col else ()
    # barrier=False: one downstream consumer (the pack projection into
    # hamming_code_pairs); the pin keeps the tokenizer single-shot
    staged = _staged_tokens(df, key, text_col, carry=carry, barrier=False)
    hashes = F.transform(F.col("__toks"), hasher)
    coded = staged.select(
        "k", _simhash_pack(hashes, bits=nbits).alias("code"), *carry).where(
        F.col("code").isNotNull())
    return hamming_code_pairs(coded, max_hamming=max_hamming, bands=bands,
                              nbits=nbits, new_col=new_col)


def hamming_code_pairs(coded: DataFrame, max_hamming: int = 3,
                       bands: int | None = None, nbits: int = 64,
                       new_col: str | None = None) -> DataFrame:
    """Generic banded Hamming-distance pairs over a PRECOMPUTED integer
    code column — the candidate machinery shared by ``simhash_pairs``
    (text) and ``multimodal.image_dup_pairs`` (perceptual hashes).
    ``coded`` carries (``k``, ``code``[, ``new_col``]); output is
    (a, b, hamming). Pigeonhole recall contract and the incremental
    new-vs-all mode are exactly simhash's (documented there)."""
    if bands is None:
        bands = max_hamming + 1
    if not 1 <= bands <= nbits:
        raise ValueError(f"bands must be in [1, {nbits}], got {bands}")
    if bands <= max_hamming:
        raise ValueError(
            f"bands={bands} cannot guarantee recall for max_hamming="
            f"{max_hamming}: a pair differing in {max_hamming} bits is only"
            f" sure to share a chunk when bands > max_hamming")
    carry = (new_col,) if new_col else ()
    base_w, extra = divmod(nbits, bands)
    widths = [base_w + (1 if b < extra else 0) for b in range(bands)]
    offsets = [sum(widths[:b]) for b in range(bands)]

    def _chunk(b: int):
        # width 64 (bands=1, i.e. max_hamming=0): the chunk IS the code —
        # (1 << 64) - 1 would overflow LongType and fail analysis
        if widths[b] == 64:
            return F.col("code").alias("chunk")
        return (F.shiftright(F.col("code"), offsets[b])
                .bitwiseAND(F.lit((1 << widths[b]) - 1)).alias("chunk"))

    banded = coded.select(
        "k", "code", *carry,
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"), _chunk(b))
            for b in range(bands)
        ])).alias("bc"),
    ).select("k", "code", F.col("bc.band").alias("band"),
             F.col("bc.chunk").alias("chunk"), *carry)
    if new_col:
        # asymmetric new-vs-all join — same reasoning as minhash: the
        # restriction must remove old-old pairs from ENUMERATION, not
        # post-filter them; orientation normalized by least/greatest
        # (codes swap with the keys so the verify stays aligned)
        left = banded.where(F.col(new_col)).drop(new_col)
        swap = F.col("l.k") < F.col("r.k")
        cand = (left.alias("l").join(banded.alias("r"),
                                     on=["band", "chunk"])
                .where(F.col("l.k") != F.col("r.k"))
                .select(F.least(F.col("l.k"), F.col("r.k")).alias("a"),
                        F.greatest(F.col("l.k"), F.col("r.k")).alias("b"),
                        F.when(swap, F.col("l.code"))
                         .otherwise(F.col("r.code")).alias("ca"),
                        F.when(swap, F.col("r.code"))
                         .otherwise(F.col("l.code")).alias("cb"))
                .dropDuplicates(["a", "b"]))
    else:
        cand = (banded.alias("l").join(banded.alias("r"),
                                       on=["band", "chunk"])
                .where(F.col("l.k") < F.col("r.k"))
                .select(F.col("l.k").alias("a"), F.col("r.k").alias("b"),
                        F.col("l.code").alias("ca"),
                        F.col("r.code").alias("cb"))
                .dropDuplicates(["a", "b"]))
    hamming = F.bit_count(F.col("ca").bitwiseXOR(F.col("cb")))
    return (cand.withColumn("hamming", hamming)
                .where(F.col("hamming") <= max_hamming)
                .select("a", "b", "hamming"))


# ---------------------------------------------------------------------------
def auto_lsh_params(threshold: float) -> tuple[int, int]:
    """(planes-per-table k, tables L) for hyperplane LSH targeting ~1e-4
    miss probability for pairs AT the threshold.

    Sign-hash collision prob for cosine s is p = 1 - acos(s)/pi. Pick k so
    a threshold pair collides in one table with prob ~0.2 (p^k ≈ 0.2 —
    deep enough to prune the cosine≈0 bulk at 0.5^k per table), then L so
    the OR over tables recovers the pair: (1 - p^k)^L <= 1e-4. At s=0.95
    this yields k=15, L≈41 (bulk candidate rate 41/2^15 ≈ 0.1%); at a
    loose s=0.4 it yields k=3, L=32 — pruning is inherently weak when the
    threshold sits in the bulk of random similarity, which the exact
    verify step absorbs (correctness never depends on the s-curve)."""
    p = 1.0 - math.acos(max(-1.0, min(1.0, threshold))) / math.pi
    # clamp away the endpoints: threshold=1.0 gives p=1.0 (log 0 division)
    # and threshold=-1.0 gives p=0.0 (log domain error); the clamped value
    # degenerates to (k=24, L=1), a fine "everything collides only when
    # identical" regime for exact-duplicate thresholds
    p = min(max(p, 1e-9), 1.0 - 1e-9)
    k = max(1, min(24, round(math.log(0.2) / math.log(p))))
    per_table = p ** k
    tables = max(1, min(64, math.ceil(math.log(1e-4) / math.log(1.0 - per_table))))
    return k, tables


def lsh_is_selective(threshold: float) -> bool:
    """Whether auto-tuned hyperplane LSH actually PRUNES at this
    threshold: the bulk (cosine~0) candidate rate is ~L/2^k; below ~5%
    the banded join wins, otherwise candidate generation degenerates
    toward all-pairs and the exact block-BLAS plan is cheaper. The 5%
    knee lands near cosine 0.88 with the auto parameters."""
    k, tables = auto_lsh_params(threshold)
    return tables / 2 ** k <= 0.05


def _hyperplane_sig_udf(planes, k: int):
    """Arrow-batched UDF: all L*k hyperplane sign bits per vector in ONE
    BLAS matmul, packed to L k-bit signature longs. One UDF call replaces
    L*k Catalyst aggregate-lambda dot products (which dominate plan
    compile time past ~100 planes)."""
    import numpy as np

    weights = (np.int64(1) << np.arange(k, dtype=np.int64))
    n_tables = planes.shape[0] // k

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def sigs(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        m = np.stack(vecs.to_numpy())                      # (n, dim)
        bits = (m @ planes.T >= 0).reshape(len(m), n_tables, k)
        codes = bits @ weights                             # (n, L)
        return pd.Series(list(codes))

    return sigs


def _block_cosine_pairs(unit: DataFrame, key_type, threshold: float,
                        n_blocks: int | None = None) -> DataFrame:
    """EXACT all-pairs cosine join as a distributed block-matrix product:
    rows hash into B blocks; each row is shipped to the B block-PAIRS it
    participates in (one shuffle of n*B rows); each of the B(B+1)/2
    cogroups scores its two blocks with ONE BLAS matmul. No driver-side
    collect, no crossJoin row explosion — O(n^2) FLOPs (inherent to an
    exact join) but vectorized and spread evenly across the cluster.

    This is the right physical plan when the threshold sits inside the
    bulk of the similarity distribution, where no LSH family can prune
    (bulk sign-collision 0.5^k vs threshold p^k too close — see
    auto_lsh_params)."""
    import numpy as np

    from pyspark.sql import types as T_

    spark = unit.sparkSession
    B = n_blocks or max(2, math.isqrt(2 * spark.sparkContext.defaultParallelism))
    blk = (F.crc32(F.col("k").cast("string")) % B).cast("int")
    # block-pair id for blocks (i<=j) -> i*B + j; each row joins every
    # pair containing its block
    bp = F.explode(F.transform(
        F.sequence(F.lit(0), F.lit(B - 1)),
        lambda j: F.least(blk, j) * B + F.greatest(blk, j)))
    tagged = unit.select("k", "v", blk.alias("__b"), bp.alias("__bp"))

    out_schema = T_.StructType([
        T_.StructField("a", key_type), T_.StructField("b", key_type),
        T_.StructField("cosine", T_.DoubleType()),
    ])

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        cols = ["a", "b", "cosine"]
        if pdf.empty:
            return pd.DataFrame(columns=cols)
        bpid = int(pdf["__bp"].iloc[0])
        i, j = bpid // B, bpid % B
        if i == j:
            m = np.stack(pdf["v"].to_numpy())
            keys = pdf["k"].to_numpy()
            sim = np.round(m @ m.T, 6)
            ii, jj = np.nonzero(np.triu(sim >= threshold, k=1))
            rows = []
            for x, y in zip(ii, jj):
                ka, kb = keys[x], keys[y]
                if kb < ka:
                    ka, kb = kb, ka
                rows.append((ka, kb, float(sim[x, y])))
            return pd.DataFrame(rows, columns=cols)
        left = pdf[pdf["__b"] == i]
        right = pdf[pdf["__b"] == j]
        if left.empty or right.empty:
            return pd.DataFrame(columns=cols)
        ml = np.stack(left["v"].to_numpy())
        mr = np.stack(right["v"].to_numpy())
        kl = left["k"].to_numpy()
        kr = right["k"].to_numpy()
        sim = np.round(ml @ mr.T, 6)
        ii, jj = np.nonzero(sim >= threshold)
        rows = []
        for x, y in zip(ii, jj):
            ka, kb = kl[x], kr[y]
            if kb < ka:
                ka, kb = kb, ka
            rows.append((ka, kb, float(sim[x, y])))
        return pd.DataFrame(rows, columns=cols)

    return tagged.groupBy("__bp").applyInPandas(score, out_schema)


def embedding_cosine_pairs(
    df: DataFrame, key: str, vec_col: str = "embedding",
    threshold: float = 0.95, lsh_planes: int | None = None,
    lsh_tables: int | None = None, seed: int = 42,
    exact: bool = False, n_blocks: int | None = None,
) -> DataFrame:
    """Pairs (a<b) with cosine similarity >= threshold.

    The physical strategy is chosen from the threshold's s-curve, the way
    Catalyst picks join strategies from statistics:

    - HIGH thresholds (auto-tuned bulk candidate rate L/2^k <= 5%, i.e.
      cosine ~>= 0.88): random-hyperplane LSH with OR-amplification —
      ``lsh_tables`` tables of ``lsh_planes`` sign bits (auto-tuned, see
      auto_lsh_params), banded (table, signature) equi-join for candidate
      generation, exact-cosine verify inside candidates
      (candidate-then-verify, the contract HNSW fulfils in the reference:
      src/indexes/vector_hnsw.cc:315-340). Never O(n^2).
    - LOW thresholds, where NO sign-hash family prunes (bulk collision
      0.5^k vs threshold p^k too close): exact distributed block-matrix
      BLAS (_block_cosine_pairs) — O(n^2) FLOPs are inherent to the
      query, but there is no crossJoin row explosion and no driver
      collect.

    ``lsh_planes`` forces the LSH path; ``exact=True`` forces the block
    path (exact results regardless of threshold)."""
    import numpy as np

    norm = F.sqrt(F.aggregate(F.col(vec_col), F.lit(0.0),
                              lambda a, x: a + x.cast("double") * x))
    df = _parallelize(df)
    unit = df.select(
        F.col(key).alias("k"),
        F.transform(F.col(vec_col), lambda x: x.cast("double") / norm).alias("v"),
    ).where(norm > 0)

    auto_k, auto_l = auto_lsh_params(threshold)
    use_lsh = lsh_planes is not None or (not exact
                                         and lsh_is_selective(threshold))

    if not use_lsh:
        key_type = df.schema[key].dataType
        return _block_cosine_pairs(unit, key_type, threshold, n_blocks)

    unit = unit.persist()
    k_planes = lsh_planes or auto_k
    n_tables = lsh_tables or auto_l
    dim = len(df.select(vec_col).first()[0])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables * k_planes, dim))
    sig = _hyperplane_sig_udf(planes, k_planes)
    # candidate generation carries only (k, t, sig) through the
    # banded self-join; unit vectors join back AFTER pair dedup
    banded = unit.select(
        "k", F.posexplode(sig(F.col("v"))).alias("t", "sig"))
    cand = (banded.alias("l").join(banded.alias("r"), on=["t", "sig"])
            .where(F.col("l.k") < F.col("r.k"))
            .select(F.col("l.k").alias("a"), F.col("r.k").alias("b"))
            .dropDuplicates(["a", "b"]))
    cand = (cand.join(unit.withColumnRenamed("k", "a")
                          .withColumnRenamed("v", "va"), "a")
                .join(unit.withColumnRenamed("k", "b")
                          .withColumnRenamed("v", "vb"), "b"))

    dot = F.aggregate(F.zip_with(F.col("va"), F.col("vb"), lambda x, y: x * y),
                      F.lit(0.0), lambda a, x: a + x)
    out = (cand.select("a", "b", F.round(dot, 6).alias("cosine"))
               .where(F.col("cosine") >= threshold))
    return _with_handles(out, unit)


# ---------------------------------------------------------------------------
# Near-dup clustering: pairs -> connected components -> canonical documents


def connected_components(pairs: DataFrame, a: str = "a", b: str = "b",
                         max_iter: int = 15) -> DataFrame:
    """Connected components over a dup-pair graph: (node, component) with
    component = the MINIMUM node id in each component.

    Min-label propagation: every node starts labeled with itself; each
    round a node takes the minimum label in its closed neighborhood;
    converged when no label changes. Rounds needed = graph diameter —
    near-dup graphs are dense clusters of near-identical documents, so
    convergence is typically 2-4 rounds; ``max_iter`` bounds adversarial
    chains (raises if not converged, never returns wrong components).

    Scale shape: each round is one join of the label table with the
    symmetrized edge list + one min-aggregate (both shuffle on node id and
    AQE-coalesce); lineage is cut with localCheckpoint every round so the
    plan stays O(1) deep. Convergence check piggybacks on the same
    aggregate (max label-changed flag), costing no extra shuffle.
    """
    e1 = pairs.select(F.col(a).alias("src"), F.col(b).alias("dst"))
    edges = e1.unionAll(
        e1.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    edges = edges.persist()
    labels = (edges.select(F.col("src").alias("node")).distinct()
              .withColumn("component", F.col("node"))
              .localCheckpoint())
    for _ in range(max_iter):
        neigh = (edges.join(labels,
                            edges["dst"] == labels["node"], "inner")
                 .select(F.col("src").alias("node"),
                         F.col("component").alias("nc")))
        merged = (labels.unionAll(
            neigh.withColumnRenamed("nc", "component"))
            .groupBy("node").agg(F.min("component").alias("new_component")))
        joined = (labels.join(merged, "node")
                  .withColumn("changed",
                              F.col("new_component") != F.col("component"))
                  .select("node", F.col("new_component").alias("component"),
                          "changed")
                  .localCheckpoint())     # cut lineage each round
        if joined.agg(F.max("changed")).first()[0] is not True:
            labels = joined.drop("changed")
            break
        labels = joined.drop("changed")
    else:
        edges.unpersist()
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds")
    edges.unpersist()
    return labels


def canonicalize_near_dups(docs: DataFrame, pairs: DataFrame, key: str,
                           a: str = "a", b: str = "b") -> DataFrame:
    """Attach ``canonical_id`` to every document: the minimum key of its
    near-dup component (its own key when it has no dups), plus
    ``is_canonical``. Downstream: keep ``is_canonical`` for a deduped
    corpus, or group by ``canonical_id`` for provenance."""
    comp = connected_components(pairs, a=a, b=b)
    out = (docs.join(comp.withColumnRenamed("node", key), on=key, how="left")
           .withColumn("canonical_id",
                       F.coalesce(F.col("component"), F.col(key)))
           .drop("component")
           .withColumn("is_canonical", F.col("canonical_id") == F.col(key)))
    return out
