"""Streaming near-duplicate gating: flag incoming documents that are
near-dups of (a) a static reference corpus, or (b) earlier documents in
the same stream — the ingest-time counterpart of the batch
``operators/dedup.py`` family.

Batch dedup answers "which pairs exist in this corpus"; an ingest
pipeline instead asks "is THIS document new" at arrival time. Both
operators here reuse the exact MinHash machinery of the batch path
(same signatures, same banding, same bucket hash — a doc flagged here
is a doc ``minhash_lsh_pairs`` would pair), so batch and streaming
verdicts agree by construction.

Jaccard on the streaming path is ESTIMATED from minhash agreement
(fraction of equal signature slots — an unbiased estimator of J with
stderr ~ 1/sqrt(num_hashes)), not recomputed from shingle sets: the
static side then ships only (band, bucket, key, sig), never gram sets,
and the stream side stays stateless (corpus gate) or bounded-state
(within-stream gate).

100 TB shape:
- corpus gate: stream-STATIC equi-join on (band, bucket). The corpus
  band table is a normal DataFrame — bucketed/partitioned storage makes
  the per-microbatch probe a pruned hash join; no streaming state at
  all, so it runs at source parallelism.
- within-stream gate: ``applyInPandasWithState`` keyed by
  (band, bucket) — state is the signatures previously seen in that
  bucket, capped at ``max_per_bucket`` (hot buckets degrade to
  first-N comparison, the standard LSH hot-bucket posture; the batch
  verifier catches stragglers in the nightly pass).

Reference analogue: keyspace-notification ingest keeps the index
continuously fresh (src/keyspace_event_manager.h); content-level
streaming admission is beyond-reference LLM-pipeline surface
(SURVEY.md §2.10).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def minhash_band_table(df: DataFrame, key: str, text_col: str = "text",
                       num_hashes: int = 32, bands: int = 8,
                       shingle_n: int = 3,
                       carry: tuple[str, ...] = ()) -> DataFrame:
    """(key, sig, band, bucket[, *carry]) rows — ``bands`` per document.

    Pure column expressions (works on batch AND streaming frames); the
    bucket hash is identical to ``minhash_lsh_pairs``'s banded table, so
    bucket collisions here are exactly the batch operator's candidates.
    The signature is staged as a named column so the bands slice it as
    an attribute (never recompute-per-band — Generate re-evaluates
    computed children per element).

    Documents too short to shingle (< ``shingle_n`` tokens) carry a
    NULL sig/bucket. There is deliberately NO ``__sig`` filter here — a
    Filter on the derived column would be pushed below the projection
    with the full signature expression substituted in, doubling the
    dominant hashing cost (the measured filter-pushdown inlining trap,
    see dedup.py's banded-table NOTE). Null buckets are harmless
    downstream: SQL equi-joins never match on null, and the stateful
    gate skips them; batch callers persisting the table can filter the
    MATERIALIZED column for free after the persist.

    The token array and the shingle-hash array each stage as their own
    named column beneath the signature projection (dedup.py's banded
    staging): inlined into ``minhash_signature``'s nested lambdas the
    tokenizer chain would re-evaluate per seed/element (the plan pin in
    the tests counts tokenizer occurrences — it was 8 before staging).
    Values are identical to ``minhash_signature`` by construction (same
    shingles, same seeds, same hashes)."""
    from ..operators.dedup import _shingles_of, _staged_tokens

    rows = num_hashes // bands
    toked = _staged_tokens(df, key, text_col, carry=tuple(carry),
                           barrier=False)
    sh = _shingles_of(F.col("__toks"), shingle_n)
    hashed = toked.select(
        F.col("k").alias(key),
        F.transform(sh, lambda g: F.xxhash64(g)).alias("__hs"), *carry)
    hs = F.col("__hs")
    sig = F.when(hs.isNotNull(), F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda seed: F.array_min(
            F.transform(hs, lambda h: F.xxhash64(h, seed)))))
    staged = hashed.withColumn("__sig", sig).drop("__hs")
    banded = staged.select(
        F.col(key), F.col("__sig"), *[F.col(c) for c in carry],
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band"))
    bucket = F.xxhash64(F.array_join(
        F.transform(F.slice(F.col("__sig"), F.col("band") * rows + 1, rows),
                    lambda h: h.cast("string")), ","))
    return banded.select(key, "__sig", "band", bucket.alias("bucket"),
                         *carry)


def _est_jaccard(a, b) -> F.Column:
    """Fraction of agreeing minhash slots — unbiased Jaccard estimate."""
    agree = F.aggregate(
        F.zip_with(a, b, lambda x, y: (x == y).cast("int")),
        F.lit(0), lambda acc, v: acc + v)
    return agree / F.size(a)


def neardup_gate(stream: DataFrame, corpus_bands: DataFrame,
                 key: str = "doc_id", text_col: str = "text",
                 corpus_key: str = "doc_id", num_hashes: int = 32,
                 bands: int = 8, shingle_n: int = 3,
                 threshold: float = 0.5,
                 watermark: tuple[str, str] | None = None) -> DataFrame:
    """Flag stream documents near-duplicating a static corpus.

    ``corpus_bands`` is ``minhash_band_table(corpus, ...)`` built with
    the SAME (num_hashes, bands, shingle_n) — persist/bucket it once,
    probe it every micro-batch. Emits one row per (stream doc, matched
    corpus doc) with ``est_jaccard >= threshold``.

    Cross-band dedup of the same (doc, corpus doc) pair is BOUNDED-state
    only: on a batch frame it is a plain ``dropDuplicates``; on a stream
    with ``watermark=(ts_col, delay)`` it is
    ``dropDuplicatesWithinWatermark`` (state expires with the
    watermark). On a stream WITHOUT a watermark the pair may appear up
    to ``bands`` times — dedup it per micro-batch in ``foreachBatch``
    instead; an unbounded streaming ``dropDuplicates`` would grow the
    state store forever on exactly the long-running ingest this
    operator is for, so this function refuses to plant one."""
    ts_cols = [watermark[0]] if watermark else []
    sb = minhash_band_table(stream, key, text_col, num_hashes, bands,
                            shingle_n, carry=tuple(ts_cols))
    cb = corpus_bands.select(F.col(corpus_key).alias("__ck"),
                             F.col("__sig").alias("__csig"),
                             "band", "bucket")
    matches = (sb.join(cb, ["band", "bucket"])
               .select(F.col(key), F.col("__ck").alias("matched_key"),
                       F.round(_est_jaccard(F.col("__sig"),
                                            F.col("__csig")), 6)
                        .alias("est_jaccard"),
                       *[F.col(c) for c in ts_cols])
               .where(F.col("est_jaccard") >= threshold))
    if not stream.isStreaming:
        return matches.dropDuplicates([key, "matched_key"])
    if watermark:
        return (matches.withWatermark(*watermark)
                .dropDuplicatesWithinWatermark([key, "matched_key"]))
    return matches


# --------------------------------------------------------------------------
_MATCH_SCHEMA = T.StructType([
    T.StructField("key", T.StringType()),
    T.StructField("band", T.IntegerType()),
    T.StructField("matched_key", T.StringType()),
    T.StructField("est_jaccard", T.DoubleType()),
])

_BUCKET_STATE = T.StructType([
    T.StructField("keys", T.ArrayType(T.StringType())),
    T.StructField("sigs", T.ArrayType(T.ArrayType(T.LongType()))),
])


def _gate_bucket(max_per_bucket: int):
    def update(bucket_key, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        keys, sigs = (state.get if state.exists else ([], []))
        keys, sigs = list(keys), [list(s) for s in sigs]
        out = []
        for pdf in pdfs:
            for _, row in pdf.iterrows():
                if row["__sig"] is None:   # un-shingle-able doc: skip
                    continue
                # plain-int coercion: numpy scalars poison the JVM-side
                # state pickle (ClassDict numpy.dtype)
                sig = [int(x) for x in row["__sig"]]
                best_k, best_j = None, -1.0
                for pk, ps in zip(keys, sigs):
                    agree = sum(1 for x, y in zip(sig, ps) if x == y)
                    j = agree / len(sig)
                    if j > best_j:
                        best_k, best_j = pk, j
                out.append({"key": str(row["k"]), "band": int(bucket_key[0]),
                            "matched_key": best_k,
                            "est_jaccard": best_j if best_k is not None
                            else None})
                if len(keys) < max_per_bucket:
                    keys.append(str(row["k"]))
                    sigs.append(sig)
        state.update((keys, sigs))
        yield pd.DataFrame(out, columns=[f.name for f in _MATCH_SCHEMA])

    return update


def neardup_within_stream(stream: DataFrame, key: str = "doc_id",
                          text_col: str = "text", num_hashes: int = 32,
                          bands: int = 8, shingle_n: int = 3,
                          max_per_bucket: int = 1024) -> DataFrame:
    """Within-stream near-dup detection: match each arriving document
    against the signatures of EARLIER stream documents that share an LSH
    bucket. Emits one row per (doc, band) — ``matched_key`` is the
    best-agreeing earlier doc in that band's bucket (null when the
    bucket was empty); a document is a near-dup if ANY of its bands
    reports ``est_jaccard`` above the caller's threshold (take max over
    bands downstream, e.g. in foreachBatch).

    State per (band, bucket): up to ``max_per_bucket`` signatures. Keys
    are carried as STRINGS (any id type works; match on the string form
    downstream). Documents too short to shingle (null signature) emit
    nothing. Arrival order within a micro-batch follows the grouped
    Arrow batch; cross-batch order follows micro-batch sequence (the
    streaming contract — "earlier" means an earlier micro-batch or
    earlier row in the same bucket group)."""
    sb = minhash_band_table(stream, key, text_col, num_hashes, bands,
                            shingle_n) \
        .select(F.col(key).cast("string").alias("k"), "__sig", "band",
                "bucket")
    return (sb.groupBy("band", "bucket")
            .applyInPandasWithState(
                _gate_bucket(max_per_bucket),
                outputStructType=_MATCH_SCHEMA,
                stateStructType=_BUCKET_STATE,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))
