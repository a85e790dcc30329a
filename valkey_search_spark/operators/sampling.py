"""Deterministic sampling for training-data assembly.

Two primitives a 100 TB pipeline needs constantly:

- ``split_by_hash``: train/val/test splits keyed on a STABLE hash of the
  document key. Spark's ``randomSplit`` re-evaluates nondeterministically
  when the plan is recomputed (a classic silent-leak bug — the same doc
  can land in train on one action and val on the next); hashing the key
  makes membership a pure function of the data, reproducible across jobs,
  clusters, and re-runs, and requires no shuffle at all.
- ``mix_corpora``: blend several sources to target proportions (the
  data-mixture step of LLM training runs), tagging provenance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def split_by_hash(df: DataFrame, key: str,
                  fractions: dict[str, float],
                  salt: str = "split") -> dict[str, DataFrame]:
    """Partition ``df`` into named splits by bucketing a salted xxhash64
    of the key. Fractions must sum to ~1. Membership is deterministic in
    (key, salt): adding a split later with a new salt cannot leak rows
    between existing splits of the same salt."""
    total = sum(fractions.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"fractions sum to {total}, expected 1.0")
    # uniform in [0, 1): bucket the hash into 1e6 cells
    cells = 1_000_000
    u = (F.pmod(F.xxhash64(F.col(key).cast("string"), F.lit(salt)),
                F.lit(cells)) / float(cells))
    out: dict[str, DataFrame] = {}
    lo = 0.0
    names = list(fractions)
    for i, name in enumerate(names):
        hi = 1.0 if i == len(names) - 1 else lo + fractions[name]
        out[name] = df.where((u >= lo) & (u < hi))
        lo = hi
    return out


def mix_corpora(sources: list[tuple[str, DataFrame, float]],
                total_rows: int, seed: int = 42) -> DataFrame:
    """Blend ``(name, df, weight)`` sources into ~``total_rows`` rows at
    the weight proportions, each row tagged with its ``source`` name.
    All source row counts come from ONE aggregation job (a union of
    name-tagged scans grouped by name), not a count per source; sampling
    itself is a scan (no shuffle). Sources smaller than their target are
    taken whole (the blend then undershoots rather than duplicating
    documents)."""
    names = [name for name, _, _ in sources]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate source names: {names}")
    wsum = sum(w for _, _, w in sources)
    counted = [
        df.select(F.lit(name).alias("__src")) for name, df, _ in sources
    ]
    counts_df = counted[0]
    for c in counted[1:]:
        counts_df = counts_df.unionAll(c)
    counts = {r["__src"]: r["n"] for r in
              counts_df.groupBy("__src").agg(F.count("*").alias("n")).collect()}
    parts = []
    for name, df, w in sources:
        target = int(round(total_rows * w / wsum))
        n = counts.get(name, 0)
        if n == 0 or target == 0:
            continue
        frac = min(1.0, target / n)
        part = df.sample(fraction=frac, seed=seed) if frac < 1.0 else df
        parts.append(part.withColumn("source", F.lit(name)))
    if not parts:
        raise ValueError("no non-empty sources")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    return out
