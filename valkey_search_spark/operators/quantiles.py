"""t-digest quantile sketches: mergeable, persistable distribution
summaries for corpus-scale numeric profiling (doc lengths, quality
scores, perplexities, token counts).

Spark's built-in ``approx_percentile`` answers one-shot quantile
queries, but its sketch state is locked inside the aggregation — it
cannot be SAVED, MERGED with next week's shard, or queried for a new
quantile later without rescanning the corpus. At 100 TB the profile
question is incremental: "sketch the new shard, fold it into the
corpus digest, report the drifted percentiles" — one small-artifact
merge instead of a full re-read. The t-digest (Dunning & Ertl,
"Computing extremely accurate quantiles using t-digests", 2019) is the
published answer: a variable-resolution centroid list whose bin width
shrinks toward the tails (scale function k1), giving rank error
~ q(1-q)/delta — tight exactly where corpus-quality cutoffs live
(p99 length caps, p01 quality floors).

Distributed shape (the part that matters at scale):

  map     mapInPandas partial digests per (partition, group) — buffers
          compress locally, so at most ~buffer_cap values per group are
          ever resident and only centroid rows leave the scan
  reduce  groupBy(group) + applyInPandas merge of the partial centroid
          lists — aggregation state is O(delta) doubles per group,
          never the values

Only digests shuffle: a 100 TB column reduces map-side to
(partitions x groups x <=~2*delta) centroid rows. The sketch frame
persists as plain parquet (arrays of means/weights), merges with
``tdigest_merge_frames``, and answers any quantile later via
``tdigest_quantiles`` — no re-scan.

EXACT REGIME (the oracle hook, same design as ``kmv_sketch``): while a
group holds at most ``compression`` values, every centroid is a
singleton and ``tdigest_quantiles`` reproduces SQL ``percentile_cont``
/ numpy-linear interpolation bit-for-bit — pinned against DuckDB
``quantile_cont`` in tests. Past that size the estimate degrades
gracefully to the published rank-error bound.

Caveats (documented, not silent): NaN/null values are dropped before
sketching (quantiles of the non-null population, matching SQL
aggregate semantics); map-stage memory is O(groups_per_partition x
buffer), so ultra-high-cardinality group columns belong in a
repartition-by-group first (same caveat class as ``heavy_hitters``).

Reference analogue: none (valkey-search keeps no distribution
summaries; src/indexes/numeric.h is an exact btree) — this is
beyond-reference LLM-pipeline surface, SURVEY.md §2.10.
"""

from __future__ import annotations

import math

import numpy as np

from pyspark.sql import DataFrame, functions as F, types as T

__all__ = [
    "tdigest_sketch", "tdigest_merge_frames", "tdigest_quantiles",
    "tdigest_quantile", "tdigest_cdf", "tdigest_merge_arrays",
    "trim_to_quantiles",
]

_TWO_PI = 2.0 * math.pi


def _k1(q: float, delta: float) -> float:
    """Scale function k1: delta/(2*pi) * asin(2q - 1)."""
    return delta / _TWO_PI * math.asin(max(-1.0, min(1.0, 2.0 * q - 1.0)))


def _k1_inv(k: float, delta: float) -> float:
    return (math.sin(_TWO_PI * k / delta) + 1.0) / 2.0


def _compress(means: np.ndarray, weights: np.ndarray,
              delta: int) -> tuple[np.ndarray, np.ndarray]:
    """One merging-digest pass (Dunning 2019, Algorithm 1): sort by
    mean, then greedily absorb neighbours while the combined centroid
    stays within one k1 unit. Stable sort keeps equal means in input
    order, so the pass is deterministic for a given input sequence."""
    if means.size == 0:
        return means, weights
    order = np.argsort(means, kind="stable")
    means, weights = means[order], weights[order]
    total = float(weights.sum())
    out_m: list[float] = []
    out_w: list[float] = []
    sig_m, sig_w = float(means[0]), float(weights[0])
    cum = 0.0  # weight fully emitted so far
    q_limit = _k1_inv(_k1(0.0, delta) + 1.0, delta)
    for m, w in zip(means[1:], weights[1:]):
        m, w = float(m), float(w)
        if (cum + sig_w + w) / total <= q_limit:
            # absorb: weighted mean stays within the merged pair
            sig_m += (m - sig_m) * (w / (sig_w + w))
            sig_w += w
        else:
            out_m.append(sig_m)
            out_w.append(sig_w)
            cum += sig_w
            q_limit = _k1_inv(_k1(cum / total, delta) + 1.0, delta)
            sig_m, sig_w = m, w
    out_m.append(sig_m)
    out_w.append(sig_w)
    return np.asarray(out_m, dtype=np.float64), \
        np.asarray(out_w, dtype=np.float64)


def _merge_parts(means: np.ndarray, weights: np.ndarray, count: int,
                 delta: int) -> tuple[np.ndarray, np.ndarray]:
    """Merge concatenated partial centroids into a final digest. The
    exact regime is preserved here: while the group's TOTAL count fits
    in ``compression`` every partial is still all-singletons (the map
    stage only compresses past a larger buffer cap), so the merge is a
    plain sort and quantiles stay percentile_cont-exact."""
    if count <= delta and means.size == count \
            and bool(np.all(weights == 1.0)):
        order = np.argsort(means, kind="stable")
        return means[order], weights[order]
    return _compress(means, weights, delta)


# ---------------------------------------------------------------------------
# Driver-side estimators over one digest (arrays of doubles — tiny).

def tdigest_quantile(means, weights, count: int, vmin: float,
                     vmax: float, q: float) -> float:
    """Quantile estimate from one digest's centroid arrays.

    All-singleton digests (the exact regime) use the SQL
    ``percentile_cont`` linear-interpolation formula exactly; compressed
    digests interpolate between centroid midpoints with the min/max
    anchored at the extremes (the standard t-digest estimator), clamped
    to [vmin, vmax].
    """
    if not 0.0 <= q <= 1.0:
        raise ValueError(f"quantile must be in [0, 1], got {q}")
    m = np.asarray(means, dtype=np.float64)
    w = np.asarray(weights, dtype=np.float64)
    if m.size == 0:
        raise ValueError("empty digest has no quantiles")
    if m.size == 1:
        return float(m[0]) if w[0] > 1 else float(vmin if q == 0 else (
            vmax if q == 1 else m[0]))
    if bool(np.all(w == 1.0)):
        # exact regime: percentile_cont over the sorted singletons
        h = q * (m.size - 1)
        lo = int(math.floor(h))
        hi = min(lo + 1, m.size - 1)
        return float(m[lo] + (h - lo) * (m[hi] - m[lo]))
    total = float(w.sum())
    t = q * total
    # centroid mass centers: left cumulative + half own weight
    cum = np.cumsum(w)
    centers = cum - w / 2.0
    if t <= centers[0]:
        # interpolate from the true minimum to the first centroid
        span = centers[0]
        frac = t / span if span > 0 else 1.0
        return float(vmin + frac * (m[0] - vmin))
    if t >= centers[-1]:
        span = total - centers[-1]
        frac = (t - centers[-1]) / span if span > 0 else 0.0
        return float(max(min(m[-1] + frac * (vmax - m[-1]), vmax), vmin))
    i = int(np.searchsorted(centers, t, side="right")) - 1
    span = centers[i + 1] - centers[i]
    frac = (t - centers[i]) / span if span > 0 else 0.0
    return float(m[i] + frac * (m[i + 1] - m[i]))


def tdigest_cdf(means, weights, count: int, vmin: float, vmax: float,
                x: float) -> float:
    """Approximate P(value <= x) from one digest (inverse of
    ``tdigest_quantile``, same interpolation geometry)."""
    m = np.asarray(means, dtype=np.float64)
    w = np.asarray(weights, dtype=np.float64)
    if m.size == 0:
        raise ValueError("empty digest has no CDF")
    if x < vmin:
        return 0.0
    if x >= vmax:
        return 1.0
    total = float(w.sum())
    if bool(np.all(w == 1.0)):
        return float(np.searchsorted(m, x, side="right")) / total
    cum = np.cumsum(w)
    centers = cum - w / 2.0
    if x <= m[0]:
        span = m[0] - vmin
        frac = (x - vmin) / span if span > 0 else 1.0
        return float(frac * centers[0] / total)
    if x >= m[-1]:
        span = vmax - m[-1]
        frac = (x - m[-1]) / span if span > 0 else 0.0
        return float((centers[-1] + frac * (total - centers[-1])) / total)
    i = int(np.searchsorted(m, x, side="right")) - 1
    j = min(i + 1, m.size - 1)
    span = m[j] - m[i]
    frac = (x - m[i]) / span if span > 0 else 0.0
    return float((centers[i] + frac * (centers[j] - centers[i])) / total)


def tdigest_merge_arrays(parts: list[dict], delta: int
                         ) -> tuple[np.ndarray, np.ndarray, int,
                                    float, float]:
    """Merge partial digests (dicts with means/weights/count/vmin/vmax)
    into one (means, weights, count, vmin, vmax) tuple."""
    live = [p for p in parts if p["count"]]
    if not live:
        return (np.empty(0), np.empty(0), 0, math.nan, math.nan)
    means = np.concatenate([np.asarray(p["means"], dtype=np.float64)
                            for p in live])
    weights = np.concatenate([np.asarray(p["weights"], dtype=np.float64)
                              for p in live])
    count = int(sum(p["count"] for p in live))
    vmin = min(float(p["vmin"]) for p in live)
    vmax = max(float(p["vmax"]) for p in live)
    m, w = _merge_parts(means, weights, count, delta)
    return m, w, count, vmin, vmax


# ---------------------------------------------------------------------------

def _sketch_schema(gcols: list[T.StructField]) -> T.StructType:
    return T.StructType(list(gcols) + [
        T.StructField("count", T.LongType()),
        T.StructField("vmin", T.DoubleType()),
        T.StructField("vmax", T.DoubleType()),
        T.StructField("means", T.ArrayType(T.DoubleType())),
        T.StructField("weights", T.ArrayType(T.DoubleType())),
        T.StructField("compression", T.IntegerType()),
    ])


def tdigest_sketch(df: DataFrame, value_col: str,
                   group_col: str | None = None,
                   compression: int = 200) -> DataFrame:
    """t-digest sketch of ``value_col`` per ``group_col`` (or one global
    row when None). Returns one row per non-empty group:

      count        non-null values sketched (long)
      vmin / vmax  exact extremes (double)
      means        centroid means, ascending (array<double>)
      weights      centroid weights, same length; sum == count
      compression  the delta this digest was built with

    While ``count <= compression`` every weight is 1.0 and
    ``tdigest_quantiles`` is percentile_cont-EXACT; past that, rank
    error ~ q(1-q)/compression. Nulls and NaNs are dropped (SQL
    aggregate semantics); groups with no remaining values emit no row.
    The output persists as plain parquet and re-enters via
    ``tdigest_merge_frames``.
    """
    import pandas as pd

    if compression < 20:
        raise ValueError("compression must be >= 20 for a usable digest")
    delta = int(compression)
    # Local buffers stay all-singleton up to buffer_cap, which must be
    # >= compression so the exact-regime promise survives the map stage.
    buffer_cap = max(8 * delta, 4096)

    gcols = [group_col] if group_col else []
    src = df.select(
        *gcols, F.col(value_col).cast("double").alias("__v")
    ).where(F.col("__v").isNotNull() & ~F.isnan("__v"))

    gfields = [src.schema[c] for c in gcols]
    schema = _sketch_schema(gfields)
    out_cols = [f.name for f in schema.fields]

    def partials(batches):
        # group key -> [buffered arrays, buffered n, centroids|None,
        #               count, lo, hi]; Python cost is per (batch x
        #               group) via pandas groupby, never per row.
        state: dict = {}

        def flush_buffer(st):
            buf = np.concatenate(st[0]) if len(st[0]) > 1 else st[0][0]
            if st[2] is None and buf.size <= buffer_cap:
                st[2] = (buf, np.ones(buf.size))  # still all-singleton
            else:
                prev_m, prev_w = st[2] if st[2] is not None \
                    else (np.empty(0), np.empty(0))
                st[2] = _compress(np.concatenate([prev_m, buf]),
                                  np.concatenate([prev_w,
                                                  np.ones(buf.size)]),
                                  delta)
            st[0], st[1] = [], 0

        for pdf in batches:
            if gcols:
                grouped = pdf.groupby(gcols, dropna=False, sort=False)
                items = ((k if isinstance(k, tuple) else (k,),
                          g["__v"].to_numpy(dtype=np.float64))
                         for k, g in grouped)
            else:
                items = [((), pdf["__v"].to_numpy(dtype=np.float64))]
            for key, arr in items:
                if arr.size == 0:
                    continue
                key = tuple(None if pd.isna(x) else x for x in key)
                st = state.get(key)
                if st is None:
                    st = state[key] = [[], 0, None, 0,
                                       float(arr[0]), float(arr[0])]
                st[0].append(arr)
                st[1] += arr.size
                st[3] += arr.size
                lo, hi = float(arr.min()), float(arr.max())
                if lo < st[4]:
                    st[4] = lo
                if hi > st[5]:
                    st[5] = hi
                if st[1] > buffer_cap:
                    flush_buffer(st)
        rows = []
        for key, st in state.items():
            if st[0]:
                flush_buffer(st)
            m, w = st[2]
            rows.append(dict(zip(gcols, key)) | {
                "count": st[3], "vmin": st[4], "vmax": st[5],
                "means": list(map(float, m)),
                "weights": list(map(float, w)),
                "compression": delta,
            })
        yield pd.DataFrame(rows, columns=out_cols)

    partial_df = src.mapInPandas(partials, schema=schema)
    if not gcols:
        return _reduce_sketches(partial_df.withColumn("__g", F.lit(1)),
                                ["__g"], delta).drop("__g")
    return _reduce_sketches(partial_df, gcols, delta)


def _reduce_sketches(partial_df: DataFrame, gcols: list[str],
                     delta: int) -> DataFrame:
    """groupBy(group) merge of partial digest rows — state is O(delta)
    doubles per group."""
    import pandas as pd

    gfields = [partial_df.schema[c] for c in gcols]
    schema = _sketch_schema(gfields)
    out_cols = [f.name for f in schema.fields]

    def merge(pdf: "pd.DataFrame") -> "pd.DataFrame":
        m, w, count, vmin, vmax = tdigest_merge_arrays(
            pdf.to_dict("records"), delta)
        row = {c: pdf[c].iloc[0] for c in gcols} | {
            "count": count, "vmin": vmin, "vmax": vmax,
            "means": list(map(float, m)),
            "weights": list(map(float, w)),
            "compression": delta,
        }
        return pd.DataFrame([row], columns=out_cols)

    return partial_df.groupBy(*gcols).applyInPandas(merge, schema=schema)


def tdigest_save(sketch_df: DataFrame, path: str) -> None:
    """Persist a sketch frame with a format stamp: the centroid rows
    land as parquet under ``<path>/sketch`` and a
    ``<path>/_tdigest_meta.json`` carries ``tdigest-sketch-v1`` plus
    the group-column names — the same versioned-load contract as the
    HNSW/IVF/tokenizer artifacts (reference analogue:
    src/rdb_serialization.cc chunk version tags). The meta lives
    BESIDE the parquet directory, never inside it (a stray JSON file
    inside a parquet dir poisons later reads of that dir)."""
    import json
    import os

    fixed = {"count", "vmin", "vmax", "means", "weights", "compression"}
    gcols = [c for c in sketch_df.columns if c not in fixed]
    sketch_df.write.mode("overwrite").parquet(os.path.join(path, "sketch"))
    with open(os.path.join(path, "_tdigest_meta.json"), "w") as f:
        json.dump({"format": "tdigest-sketch-v1", "group_cols": gcols}, f)


def tdigest_load(spark, path: str) -> DataFrame:
    """Load a sketch persisted by ``tdigest_save``; a bare parquet
    directory (the pre-stamp layout — sketches always persisted as
    plain parquet) still loads as the legacy form, and a FOREIGN
    format tag fails with a versioned error instead of deserializing
    garbage."""
    import json
    import os

    from ..artifact import check_format

    meta_path = os.path.join(path, "_tdigest_meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        check_format(meta, "tdigest-sketch-v1", path, allow_missing=False)
        return spark.read.parquet(os.path.join(path, "sketch"))
    # legacy: the sketch frame written directly as parquet
    return spark.read.parquet(path)


def tdigest_merge_frames(a: DataFrame, b: DataFrame,
                         group_col: str | None = None) -> DataFrame:
    """Fold two sketch frames (same schema, same compression) into one —
    the incremental-profile step: sketch the NEW shard, merge with the
    persisted corpus digest, never re-read old data. Groups present in
    only one side pass through unchanged (union semantics)."""
    both = a.unionByName(b)
    deltas = [r[0] for r in
              both.select("compression").distinct().limit(3).collect()]
    if len(deltas) != 1:
        raise ValueError(
            f"cannot merge digests with different compressions {deltas}; "
            "re-sketch one side at the other's compression")
    gcols = [group_col] if group_col else []
    if not gcols:
        return _reduce_sketches(both.withColumn("__g", F.lit(1)),
                                ["__g"], int(deltas[0])).drop("__g")
    return _reduce_sketches(both, gcols, int(deltas[0]))


def trim_to_quantiles(df: DataFrame, value_col: str,
                      lo: float = 0.01, hi: float = 0.99,
                      group_col: str | None = None,
                      compression: int = 200,
                      sketch_df: DataFrame | None = None) -> DataFrame:
    """Keep rows whose ``value_col`` lies in the CLOSED interval
    [quantile(lo), quantile(hi)] of its own distribution, per
    ``group_col`` (or globally) — the outlier-trim step of a curation
    pass ("drop the shortest 1% and longest 1% of documents per
    language") without materializing a sorted copy.

    Pass a persisted ``sketch_df`` (from :func:`tdigest_sketch`, same
    value/group) to trim against a REFERENCE distribution — e.g. cut
    this week's shard at last month's corpus percentiles — otherwise
    one is sketched from ``df`` itself. The bounds frame is one tiny
    row per group, broadcast into the scan; the data never shuffles.

    Rows with a NULL or NaN value are dropped — they hold no position
    in any distribution; this holds in every branch below, including
    pass-through groups. A GROUP present in ``df`` but absent from a
    reference ``sketch_df`` (a brand-new language in this week's
    shard) passes through untrimmed — no reference bounds is not
    grounds for silent deletion; sketch the new shard and merge if it
    should count. An EMPTY reference sketch likewise passes everything
    through (same convention). In the exact regime (group fits in
    ``compression``) the cut equals SQL ``percentile_cont`` bounds
    bit-for-bit.
    """
    if not 0.0 <= lo <= hi <= 1.0:
        raise ValueError(f"need 0 <= lo <= hi <= 1, got lo={lo} hi={hi}")
    if sketch_df is None:
        sketch_df = tdigest_sketch(df, value_col, group_col=group_col,
                                   compression=compression)
    v = F.col(value_col).cast("double")
    value_ok = v.isNotNull() & ~F.isnan(v)
    in_bounds = (v >= F.col("__lo")) & (v <= F.col("__hi"))
    if group_col:
        bounds = tdigest_quantiles(sketch_df, {"__lo": lo, "__hi": hi}) \
            .select(group_col, "__lo", "__hi")
        joined = df.join(F.broadcast(bounds),
                         df[group_col].eqNullSafe(bounds[group_col]),
                         "left").drop(bounds[group_col])
        keep = value_ok & (F.col("__lo").isNull() | in_bounds)
        return joined.where(keep).drop("__lo", "__hi")
    # global mode: the sketch must be ungrouped (a grouped bounds frame
    # would silently multiply rows through a cross join) and its one
    # bounds row collects eagerly (tiny — same convention as
    # tdigest_merge_frames' compression check) into literal bounds
    meta = {"count", "vmin", "vmax", "means", "weights", "compression"}
    extra = [c for c in sketch_df.columns if c not in meta]
    if extra:
        raise ValueError(
            f"sketch_df carries group columns {extra} but group_col is "
            "None — pass the matching group_col")
    brows = tdigest_quantiles(sketch_df, {"__lo": lo, "__hi": hi}) \
        .limit(2).collect()
    if not brows:  # empty reference sketch: nothing to trim against
        return df.where(value_ok)
    return df.where(value_ok
                    & (v >= F.lit(float(brows[0]["__lo"])))
                    & (v <= F.lit(float(brows[0]["__hi"]))))


def tdigest_quantiles(sketch_df: DataFrame,
                      quantiles: dict[str, float]) -> DataFrame:
    """Evaluate named quantiles per group over a sketch frame (tiny:
    one row per group). ``quantiles`` maps output column name -> q, e.g.
    ``{"p50": 0.5, "p99": 0.99}``. Group columns pass through; output
    adds ``count`` and one double column per requested quantile.

    In the exact regime (all-singleton digests) the values equal SQL
    ``percentile_cont``/DuckDB ``quantile_cont`` bit-for-bit.
    """
    import pandas as pd

    for name, q in quantiles.items():
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile {name}={q} outside [0, 1]")
    meta = {"count", "vmin", "vmax", "means", "weights", "compression"}
    gcols = [c for c in sketch_df.columns if c not in meta]
    gfields = [sketch_df.schema[c] for c in gcols]
    schema = T.StructType(gfields + [T.StructField("count", T.LongType())] + [
        T.StructField(name, T.DoubleType()) for name in quantiles])
    out_cols = [f.name for f in schema.fields]
    items = list(quantiles.items())

    def evaluate(batches):
        for pdf in batches:
            rows = []
            for rec in pdf.to_dict("records"):
                row = {c: rec[c] for c in gcols}
                row["count"] = rec["count"]
                for name, q in items:
                    row[name] = tdigest_quantile(
                        rec["means"], rec["weights"], rec["count"],
                        rec["vmin"], rec["vmax"], q)
                rows.append(row)
            yield pd.DataFrame(rows, columns=out_cols)

    return sketch_df.mapInPandas(evaluate, schema=schema)
