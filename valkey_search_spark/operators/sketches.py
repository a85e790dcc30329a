"""KMV (k-minimum-values / bottom-k) sketches for cross-corpus set
statistics: distinct counts, Jaccard similarity, and overlap size
between corpora WITHOUT joining them.

A 100 TB question that precedes every decontamination/dedup run is
"how much do these two corpora overlap?" — answering it exactly means
a distinct + join over every n-gram of both sides. The KMV sketch
(Bar-Yossef et al. 2002; Beyer et al. SIGMOD'07 "On synopses for
distinct-value estimation") answers it from two k-long arrays:

  sketch(S)   = the k smallest distinct uniform hashes of S
  D(S)       ~= (k-1) / u_k            (u_k = k-th smallest, in (0,1))
  J(A,B)     ~= |kmin_k(A ∪ B) ∩ A ∩ B| / k
  |A ∩ B|    ~= J * D(A ∪ B)

Distributed shape (the part that matters at scale):

  pass 1  approx_count_distinct per group       (HLL: bounded state)
  pass 2  map-side THRESHOLD filter  h < t      (t ≈ margin*k/D̂ of the
          hash range, so ~margin*k rows per group survive)
          -> groupBy(group).collect -> sort -> slice k

The threshold filter is the point: the k smallest hashes of a set are
exactly the k smallest of any prefix-range superset, so pass 2 shuffles
only ~margin*k rows PER GROUP no matter how many items the corpus has —
a 100 TB gram stream reduces map-side to kilobytes. Aggregation state is
the survivor set (≤ ~margin*k hashes), never the corpus. When the HLL
estimate says the group is small (D̂ ≤ margin*k) no filter applies and
the sketch is EXACT (``kmv_distinct`` returns the true count) — which is
also the regime the DuckDB oracle tests pin value-for-value.

If the HLL estimate were pathologically low, fewer than k hashes could
survive the filter while the true k-th minimum lies above the threshold;
``underfull`` flags that case (P < 1e-40 at the default margin=8;
re-run with a larger margin if ever set).

Estimator error: Beyer et al. give E[relative error] ≈ 1/sqrt(k-2) for
distinct counts; k=1024 → ~3%. Jaccard from bottom-k union sampling has
the same 1/sqrt(k) scaling (it is a size-k uniform sample of A ∪ B).

Reference analogue: none (valkey-search keeps exact per-index
cardinalities, src/indexes/index_base.h); this is beyond-reference
LLM-pipeline surface, SURVEY.md §2.10.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

_HASH_SPAN = 2.0 ** 64  # xxhash64 is signed int64: [-2^63, 2^63)
_HASH_MIN = -(2 ** 63)


def _to_unit(h: int) -> float:
    """Map a signed-64 hash to (0, 1]."""
    return (h - _HASH_MIN + 1) / _HASH_SPAN


def kmv_sketch(items: DataFrame, item_col: str,
               group_col: str | None = None, k: int = 1024,
               margin: int = 8) -> DataFrame:
    """Bottom-k sketch of the DISTINCT ``xxhash64(item_col)`` values,
    per ``group_col`` (or one global row when ``group_col`` is None).

    Returns one row per group:
      kmv             array<long>, ascending, len = min(k, |distinct|)
      approx_distinct pass-1 HLL estimate (diagnostic)
      filtered        whether the threshold pre-filter applied
                      (False => the sketch is exact and complete)
      underfull       filtered AND len(kmv) < k — re-run with a larger
                      ``margin`` (astronomically rare, see module doc)

    The degenerate underfull form — a filtered group where NO hash
    survives — drops the group from the output entirely; callers
    comparing against an expected group list should treat absence as
    underfull (same probability class: the HLL estimate would have to
    be ~margin*k times too low).
    """
    if k <= 2:
        raise ValueError("k must be > 2 (estimator needs k-1, u_k)")
    gcols = [group_col] if group_col else []
    hashed = items.select(*gcols, F.xxhash64(F.col(item_col)).alias("__h"))

    # pass 1: bounded-state cardinality estimate per group
    est = (hashed.groupBy(*gcols)
           .agg(F.approx_count_distinct("__h", 0.02).alias("__d")))

    # threshold: keep hashes in the smallest (margin*k / D̂) fraction of
    # the range; no filter for small groups (exact regime). The fraction
    # is clamped to 0.9 so the double->long cast stays far from the
    # signed-64 boundary (ANSI cast overflow); survivors are then
    # >= 0.9 * D > k either way.
    cap = F.lit(margin) * F.lit(k)
    frac = F.least(F.lit(0.9), cap / F.col("__d"))
    thresh = (F.lit(float(_HASH_MIN))
              + frac * F.lit(_HASH_SPAN)).cast("long")
    bounds = est.select(*gcols, (F.col("__d") > cap).alias("__filtered"),
                        F.when(F.col("__d") > cap, thresh)
                         .otherwise(F.lit(2 ** 63 - 1)).alias("__t"),
                        F.col("__d").alias("approx_distinct"))

    joined = (hashed.join(F.broadcast(bounds), gcols or None, "inner")
              if gcols else hashed.crossJoin(F.broadcast(bounds)))
    survivors = joined.where(F.col("__h") <= F.col("__t"))
    sk = (survivors.groupBy(*gcols, "__filtered", "approx_distinct")
          .agg(F.slice(F.array_sort(F.collect_set("__h")), 1, k)
               .alias("kmv")))
    return sk.select(*gcols, "kmv", "approx_distinct",
                     F.col("__filtered").alias("filtered"),
                     (F.col("__filtered") & (F.size("kmv") < k)
                      ).alias("underfull"))


# --------------------------------------------------------------------------
# Driver-side estimators over collected sketches (k longs each — tiny).

def kmv_distinct(kmv: list[int], k: int) -> float:
    """Distinct-count estimate. Exact when the sketch holds the whole
    set (len < k); else the Beyer et al. unbiased (k-1)/u_k."""
    if len(kmv) < k:
        return float(len(kmv))
    return (k - 1) / _to_unit(kmv[k - 1])


def kmv_merge(a: list[int], b: list[int], k: int) -> list[int]:
    """Sketch of the UNION: k smallest of the combined distinct values.
    Exact-regime inputs (len < k) merge into the union's true bottom-k."""
    return sorted(set(a) | set(b))[:k]


def kmv_jaccard(a: list[int], b: list[int], k: int) -> float:
    """Jaccard estimate: fraction of the union's bottom-k present in
    both sketches (a size-|u| uniform sample of A ∪ B)."""
    u = kmv_merge(a, b, k)
    if not u:
        return 0.0
    sa, sb = set(a), set(b)
    return sum(1 for h in u if h in sa and h in sb) / len(u)


def kmv_overlap(a: list[int], b: list[int], k: int) -> dict[str, float]:
    """Full overlap report: distinct sizes, Jaccard, union/intersection
    estimates, and containment in each direction."""
    j = kmv_jaccard(a, b, k)
    union = kmv_distinct(kmv_merge(a, b, k), k)
    inter = j * union
    da, db = kmv_distinct(a, k), kmv_distinct(b, k)
    return {"distinct_a": da, "distinct_b": db, "jaccard": j,
            "union": union, "intersection": inter,
            "containment_a_in_b": inter / da if da else 0.0,
            "containment_b_in_a": inter / db if db else 0.0}


def kmv_stderr(k: int) -> float:
    """Expected relative error of the distinct estimator, ~1/sqrt(k-2)."""
    return 1.0 / math.sqrt(k - 2)


# --------------------------------------------------------------------------
def corpus_gram_overlap(corpus_a: DataFrame, corpus_b: DataFrame,
                        text_col: str = "text", key: str = "doc_id",
                        n: int = 13, k: int = 4096,
                        margin: int = 8) -> dict[str, float]:
    """Estimate the word-``n``-gram set overlap between two corpora from
    two bottom-k sketches — the "should I even run decontamination?"
    pre-flight, at ~margin*k shuffled rows per corpus instead of a
    gram-level join. Gram hashing is IDENTICAL to
    ``ngram_decontaminate`` (xxhash64 of the token-slice array via
    ``contamination.gram_set``), so the estimated intersection predicts
    exactly what that operator would flag.

    Both corpora sketch in ONE tagged pipeline (union + grouped
    ``kmv_sketch``) — a single job scans both sides concurrently instead
    of two serialized collect()s."""
    from .contamination import gram_set

    def tagged(df, side):
        return (gram_set(df, key, text_col, n, "__k")
                .select(F.lit(side).alias("__side"), "__gram"))

    grams = tagged(corpus_a, "a").unionByName(tagged(corpus_b, "b"))
    rows = {r["__side"]: r
            for r in kmv_sketch(grams, "__gram", "__side", k=k,
                                margin=margin).collect()}
    ra, rb = rows.get("a"), rows.get("b")
    ka = list(ra["kmv"]) if ra is not None else []
    kb = list(rb["kmv"]) if rb is not None else []
    out = kmv_overlap(ka, kb, k)
    out["underfull"] = float(
        (ra is not None and bool(ra["underfull"]))
        or (rb is not None and bool(rb["underfull"])))
    return out


# --------------------------------------------------------------------------
# Heavy hitters: bounded-memory frequent-item summaries (Misra-Gries /
# batched SpaceSaving) for ultra-high-cardinality columns where even the
# distinct-key shuffle of a groupBy-count is the bottleneck (URLs, hosts,
# shingles at web scale).

def heavy_hitters(items: "DataFrame", item_col: str, k: int = 20,
                  summary_size: int = 4096,
                  exact_recount: bool = False) -> "DataFrame":
    """Top-``k`` most frequent values of ``item_col`` with deterministic
    error bounds, WITHOUT shuffling the distinct-value set.

    Per-partition batched Misra-Gries: each partition keeps at most
    ``summary_size`` counters; when a merged batch overflows, all
    counters drop by the (summary_size+1)-th largest count and items at
    zero fall out. Each such step removes at least (summary_size+1) *
    delta occurrences, so a partition's total undercount is at most
    n_p / (summary_size+1) — the classic MG guarantee, accumulated
    per partition and reported.

    Output (k rows, descending): ``item``, ``count_lb`` (sum of
    surviving counters — never an overcount), ``count_ub`` (lb + the
    summed per-partition error caps: a true count can exceed lb by at
    most the decrements in partitions that dropped or never surfaced
    the item). EVERY item with true count > n/(summary_size+1) is
    guaranteed to surface. ``exact_recount=True`` adds an ``count``
    column from one semi-join recount over the corpus (a second scan,
    but shuffling only candidate-matching rows).

    Plan: mapInPandas partial summaries (<= summary_size rows out per
    partition; Python cost is per DISTINCT item per Arrow batch via
    value_counts, not per row) -> groupBy item over the tiny candidate
    set -> top-k. The error rows ride along with a null item.
    """
    import pandas as pd

    from pyspark.sql import functions as F, types as T

    if k <= 0 or summary_size < k:
        raise ValueError("need 0 < k <= summary_size")

    schema = T.StructType([
        T.StructField("item", T.StringType()),
        T.StructField("lb", T.LongType()),
        T.StructField("err", T.LongType()),
    ])
    m = summary_size

    def summarize(batches):
        counts: dict[str, int] = {}
        err = 0
        for pdf in batches:
            vc = pdf[pdf.columns[0]].dropna().astype(str).value_counts()
            for it, c in vc.items():
                counts[it] = counts.get(it, 0) + int(c)
            if len(counts) > m:
                vals = sorted(counts.values(), reverse=True)
                delta = vals[m]
                err += delta
                counts = {it: c - delta for it, c in counts.items()
                          if c > delta}
        out = [{"item": it, "lb": c, "err": 0}
               for it, c in counts.items()]
        out.append({"item": None, "lb": 0, "err": err})
        yield pd.DataFrame(out, columns=["item", "lb", "err"])

    from pyspark.sql.window import Window

    summaries = items.select(F.col(item_col).cast("string")) \
        .mapInPandas(summarize, schema=schema)
    # ONE linear chain: the error rows (null item) group alongside the
    # candidates, and the global slack — the total decrement mass any
    # candidate's true count may exceed its lb by — broadcasts to every
    # row with an unpartitioned window over the TINY candidate frame
    # (<= summary_size x partitions rows). Branching summaries into a
    # separate slack aggregate re-executed the corpus-scanning Arrow
    # kernel once per branch (plans are trees; exchange reuse does not
    # rescue pruned projections) — measured 3 scans, now 1.
    agg = summaries.groupBy("item").agg(
        F.sum("lb").alias("count_lb"),
        F.sum("err").alias("__err"))
    slack = F.coalesce(
        F.max(F.when(F.col("item").isNull(), F.col("__err")))
        .over(Window.partitionBy()), F.lit(0).cast("long"))
    top = (agg.withColumn("__slack", slack)
           .where(F.col("item").isNotNull())
           .select("item", "count_lb",
                   (F.col("count_lb") + F.col("__slack")).alias("count_ub"))
           .orderBy(F.desc("count_lb"), F.asc("item"))
           .limit(k))
    if not exact_recount:
        return top
    # the recount references `top` TWICE (broadcast candidate side +
    # final probe side); plans are trees, so without a persist the
    # corpus-scanning Arrow summary kernel executes once per subtree —
    # the same branch shape the slack-aggregate fix above removed.
    # persist pins one execution (the broadcast build materializes the
    # cache, the probe side reuses it within the same action);
    # ContextCleaner unpersists once the frame is unreferenced. An
    # eager collect + local rebuild was tried instead (no cached RDD)
    # and measured 1.27x SLOWER interleaved at sf0.1 — the extra
    # driver round-trip plus python-RDD scans of the local frame cost
    # more than the cache they replace.
    top = top.persist()
    cand = F.broadcast(top.select(F.col("item").alias("__hh")))
    exact = (items.select(F.col(item_col).cast("string").alias("__hh"))
             .join(cand, "__hh")
             .groupBy("__hh").agg(F.count("*").alias("count")))
    return (top.join(exact, top["item"] == exact["__hh"], "left")
            .select("item", "count_lb", "count_ub",
                    F.coalesce(F.col("count"), F.lit(0)).alias("count"))
            .orderBy(F.desc("count"), F.asc("item")))
