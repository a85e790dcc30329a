"""Data-quality gates: declarative expectations + distribution drift.

The two checks every scheduled 100 TB pipeline runs before publishing
a snapshot:

- ``check_expectations``: Deequ-style constraint validation — null
  fraction, uniqueness, min/max bounds, allowed value sets, row count
  — ALL evaluated in ONE aggregation pass over the table (a single
  job, no per-check scans; uniqueness adds one count_distinct into the
  same aggregate). Returns one row per check with the observed value,
  so a failed gate is diagnosable without a re-scan.
- ``psi_drift``: Population Stability Index per column between a
  baseline snapshot and the current one — the standard drift score
  (PSI = Σ (p_cur - p_base) · ln(p_cur / p_base) over shared bins;
  < 0.1 stable, 0.1-0.25 moderate, > 0.25 shifted). Numeric columns
  bin by the BASELINE's quantile edges (one approxQuantile on the
  baseline), categorical columns by value; each side then contributes
  one groupBy, and the join is on the tiny bin table.

Scale shape: expectations are one full-scan aggregate (the same cost
as any count(*)); PSI is two aggregations whose output is bounded by
n_bins, so the comparison join never sees data-sized frames.

Reference analogue: none; beyond-reference extension (SURVEY §2.10).
Oracles: DuckDB recomputation of every check and every PSI term
(tests/test_expectations.py).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F


@dataclass
class Expect:
    """One declarative constraint on a column (or the table when
    ``column`` is None for kind='row_count')."""
    kind: str                     # null_fraction | unique | bounds |
                                  # in_set | row_count
    column: str | None = None
    max_null_fraction: float = 0.0
    lo: float | None = None
    hi: float | None = None
    allowed: list | None = None
    min_rows: int = 0
    max_rows: int | None = None
    name: str = field(default="")

    def __post_init__(self):
        kinds = {"null_fraction", "unique", "bounds", "in_set",
                 "row_count"}
        if self.kind not in kinds:
            raise ValueError(f"unknown expectation kind {self.kind!r}")
        if self.kind != "row_count" and not self.column:
            raise ValueError(f"{self.kind} needs a column")
        if self.kind == "bounds" and self.lo is None and self.hi is None:
            raise ValueError("bounds needs lo and/or hi")
        if self.kind == "in_set" and not self.allowed:
            raise ValueError("in_set needs allowed values")
        if not self.name:
            self.name = f"{self.kind}({self.column or '*'})"


def check_expectations(df: DataFrame,
                       expectations: list[Expect]) -> DataFrame:
    """Evaluate every expectation in ONE aggregation job. Returns
    (name, kind, column, passed, observed, threshold) — ``observed``
    is the measured quantity (null fraction, duplicate count, count
    outside bounds/set, row count) as a double."""
    if not expectations:
        raise ValueError("no expectations given")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, e in enumerate(expectations):
        c = F.col(e.column) if e.column else None
        if e.kind == "null_fraction":
            aggs.append(F.sum(F.when(c.isNull(), 1).otherwise(0))
                        .alias(f"__a{i}"))
        elif e.kind == "unique":
            aggs.append((F.count(c) - F.count_distinct(c))
                        .alias(f"__a{i}"))
        elif e.kind == "bounds":
            bad = F.lit(False)
            if e.lo is not None:
                bad = bad | (c < e.lo)
            if e.hi is not None:
                bad = bad | (c > e.hi)
            aggs.append(F.sum(F.when(c.isNotNull() & bad, 1).otherwise(0))
                        .alias(f"__a{i}"))
        elif e.kind == "in_set":
            aggs.append(F.sum(F.when(c.isNotNull()
                                     & ~c.isin(list(e.allowed)), 1)
                              .otherwise(0)).alias(f"__a{i}"))
        elif e.kind == "row_count":
            aggs.append(F.count(F.lit(1)).alias(f"__a{i}"))
    row = df.agg(*aggs).first()
    n = row["__n"]

    out = []
    for i, e in enumerate(expectations):
        a = row[f"__a{i}"] or 0
        if e.kind == "null_fraction":
            observed = a / n if n else 0.0
            passed = observed <= e.max_null_fraction
            threshold = e.max_null_fraction
        elif e.kind == "unique":
            observed, passed, threshold = float(a), a == 0, 0.0
        elif e.kind in ("bounds", "in_set"):
            observed, passed, threshold = float(a), a == 0, 0.0
        else:                                   # row_count
            observed = float(a)
            passed = a >= e.min_rows and (e.max_rows is None
                                          or a <= e.max_rows)
            threshold = float(e.min_rows)
        out.append((e.name, e.kind, e.column, bool(passed),
                    float(observed), float(threshold)))
    return df.sparkSession.createDataFrame(
        out, "name string, kind string, column string, passed boolean,"
             " observed double, threshold double")


def psi_drift(baseline: DataFrame, current: DataFrame, columns: list[str],
              n_bins: int = 10, epsilon: float = 1e-6,
              max_categories: int = 1000) -> DataFrame:
    """PSI per column between two snapshots. Numeric columns bin by the
    BASELINE's approx quantile edges (so 'drift' means movement against
    the frozen reference — ALL numeric edges come from ONE
    approxQuantile pass); string columns bin by value, capped at the
    baseline's ``max_categories`` most frequent values with the tail
    folded into one __OTHER__ bin, so the per-column frames stay
    bounded at any cardinality. Empty-side bins are floored at
    ``epsilon`` (the standard smoothing). Returns
    (column, psi, n_bins_used).

    Tie-break note: count ties at the ``max_categories`` boundary are
    broken by the STRING-CAST value ascending (the r12 batched-lexicon
    rewrite; the old per-column loop ordered by the native column
    type). For string columns — the intended input — the two orders
    are identical; a NON-string categorical column with boundary ties
    can select a different top set than the pre-r12 code. Pre-rank on
    the native value before casting if that parity ever matters."""
    if not columns:
        raise ValueError("no columns given")
    dtypes = dict(baseline.dtypes)
    cur_cols = dict(current.dtypes)
    for col in columns:
        if col not in dtypes or col not in cur_cols:
            raise ValueError(f"column {col!r} missing from a side")
    numeric_set = {c for c in columns
                   if dtypes[c] in ("tinyint", "smallint", "int",
                                    "bigint", "float", "double")
                   or dtypes[c].startswith("decimal")}
    all_edges = {}
    if numeric_set:
        ordered = [c for c in columns if c in numeric_set]
        qs = baseline.approxQuantile(
            ordered, [i / n_bins for i in range(1, n_bins)], 0.001)
        all_edges = {c: sorted(set(e)) for c, e in zip(ordered, qs)}
    # categorical lexicons for EVERY string column in one job (per-doc
    # explode of (column, value) structs -> one grouped count + one
    # rank window) instead of one groupBy/collect per column
    str_cols = [c for c in columns if c not in numeric_set]
    tops: dict[str, set] = {c: set() for c in str_cols}
    if str_cols:
        from pyspark.sql.window import Window
        pairs = baseline.select(F.explode(F.array(*[
            F.struct(F.lit(c).alias("__col"),
                     F.col(c).cast("string").alias("__v"))
            for c in str_cols])).alias("p")).select("p.__col", "p.__v") \
            .where(F.col("__v").isNotNull())
        ranked = (pairs.groupBy("__col", "__v")
                  .agg(F.count("*").alias("__n"))
                  .withColumn("__r", F.row_number().over(
                      Window.partitionBy("__col").orderBy(
                          F.desc("__n"), F.asc("__v"))))
                  .where(F.col("__r") <= max_categories))
        for r in ranked.select("__col", "__v").collect():
            tops[r["__col"]].add(r["__v"])

    def bucket_of(col: str):
        if col in numeric_set:
            return _bucket_expr(F.col(col), all_edges[col])
        c = F.col(col).cast("string")
        return F.when(c.isin(list(tops[col])), c) \
            .otherwise(F.lit("__OTHER__"))

    # ONE aggregation per side covering every column: explode each
    # row's (column, bucket) structs, drop the per-column nulls, count
    # per (column, bucket). The former per-column loop re-scanned both
    # sides once per column; bucket semantics and PSI terms are
    # unchanged.
    def side_counts(df, alias):
        structs = [F.struct(
            F.lit(c).alias("__col"),
            F.when(F.col(c).isNotNull(), bucket_of(c)).alias("__b"))
            for c in columns]
        return (df.select(F.explode(F.array(*structs)).alias("p"))
                .select("p.__col", "p.__b")
                .where(F.col("__b").isNotNull())
                .groupBy("__col", "__b")
                .agg(F.count("*").alias(alias)))

    merged_rows = (side_counts(baseline, "nb")
                   .join(side_counts(current, "nc"),
                         ["__col", "__b"], "full").collect())
    by_col: dict[str, list] = {c: [] for c in columns}
    for r in merged_rows:
        by_col[r["__col"]].append(r)
    rows = []
    for col in columns:
        merged = by_col[col]
        tb = sum(r["nb"] or 0 for r in merged)
        tc = sum(r["nc"] or 0 for r in merged)
        psi = 0.0
        for r in merged:
            pb = max((r["nb"] or 0) / tb if tb else 0.0, epsilon)
            pc = max((r["nc"] or 0) / tc if tc else 0.0, epsilon)
            psi += (pc - pb) * math.log(pc / pb)
        rows.append((col, float(psi), len(merged)))
    return baseline.sparkSession.createDataFrame(
        rows, "column string, psi double, n_bins_used int")


def _bucket_expr(c, edges: list[float]):
    """0-based bin index against sorted edges (len(edges)+1 bins)."""
    expr = F.lit(len(edges))
    for i in range(len(edges) - 1, -1, -1):
        expr = F.when(c <= edges[i], F.lit(i)).otherwise(expr)
    return expr.cast("string")
