"""Temporal joins: as-of (point-in-time) and interval containment —
the two time-series join shapes Spark lacks as built-ins, expressed as
pure DataFrame plans (no UDF, no crossJoin).

``asof_join`` attaches to each left row the latest right row at or
before it (per key, optionally within a tolerance) — the
"state-as-of-event" join of feature backfills and slowly-changing
dimensions. Physical plan: tag both sides, UNION, one window over
(key, ts) with a last-non-null struct fold — ONE shuffle on the key,
no range explosion, no per-row lookup. The classic alternative
(inequality join) degenerates to a broadcast-nested-loop in Spark;
the union-window form is the scalable shape (same idea as
pandas.merge_asof's sort-merge, distributed by key).

``interval_join`` matches points to containing [start, end) intervals
via BIN BUCKETING: intervals explode to the fixed-width bins they
cover, points compute their single bin, and the match becomes an
equi-join on (key, bin) + an exact refine predicate. Each matching
pair meets in EXACTLY one bin (the point's), so no post-join dedup.
Replication factor = interval_duration / bin_width, a caller-visible
knob — without it Spark plans a range join as broadcast-nested-loop
(quadratic work at corpus scale).

Skew notes (100 TB): asof's window sorts each key's rows in one task —
a single hot key serializes there, the inherent cost of per-key order
(same posture as any window aggregation; split hot keys upstream if a
key exceeds a task's memory). interval_join's bin axis shards time
uniformly, so skew only arises from intervals vastly longer than
bin_width (bounded by the replication knob).

Reference analogue: none — valkey-search has no temporal join surface;
beyond-reference extension per SURVEY.md §2.10. Oracles: DuckDB's
native ASOF JOIN and range joins (tests/test_temporal.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


def asof_join(left: DataFrame, right: DataFrame, on: str = "ts",
              by: str | None = None, direction: str = "backward",
              tolerance: str | None = None,
              right_prefix: str = "r_") -> DataFrame:
    """For each left row, attach the closest right row at-or-before
    (``backward``) or at-or-after (``forward``) its ``on`` timestamp,
    matching within ``by`` when given. Every left row survives (left
    semantics); unmatched rows carry nulls. ``tolerance`` (an INTERVAL
    string, e.g. ``'15 minutes'``) nulls out matches farther than that
    from the left timestamp. Right columns (except ``on``/``by``) come
    back prefixed with ``right_prefix``; the matched right timestamp is
    ``{right_prefix}{on}``.

    Ties at equal timestamps match (the right row sorts first), as in
    pandas.merge_asof / DuckDB ASOF semantics with >= / <=.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    if on not in left.columns or on not in right.columns:
        raise ValueError(f"both frames need the '{on}' column")
    if by is not None and (by not in left.columns or by not in right.columns):
        raise ValueError(f"both frames need the '{by}' column")

    rcols = [c for c in right.columns if c not in (on, by)]
    payload = F.struct(F.col(on).alias("__rts"),
                       *[F.col(c) for c in rcols])

    keys = [by] if by else []
    lt = left.select(*keys, F.col(on), F.lit(1).alias("__side"),
                     F.struct(*[F.col(c) for c in left.columns])
                     .alias("__l"), F.lit(None).cast(
                         right.select(payload).schema[0].dataType)
                     .alias("__r"))
    rt = right.select(*keys, F.col(on), F.lit(0).alias("__side"),
                      F.lit(None).cast(
                          left.select(F.struct(*left.columns)).schema[0]
                          .dataType).alias("__l"),
                      payload.alias("__r"))
    both = lt.unionByName(rt)

    # backward: latest right at ts' <= ts  -> ascending scan, right rows
    # sort BEFORE left at equal ts (side 0 < 1) so equal-ts rows match.
    # forward: mirror with a descending scan.
    if direction == "backward":
        order = [F.col(on).asc(), F.col("__side").asc()]
    else:
        order = [F.col(on).desc(), F.col("__side").asc()]
    w = (Window.partitionBy(*keys) if keys else Window.partitionBy()) \
        .orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    matched = both.withColumn("__m", F.last("__r", ignorenulls=True).over(w))

    out = matched.where(F.col("__side") == 1)
    if tolerance is not None:
        on_type = dict(left.dtypes)[on]
        if on_type.startswith("timestamp"):
            # timestamp-interval arithmetic keeps the comparison exact
            keep = (F.col("__m.__rts")
                    >= F.col(on) - F.expr(f"INTERVAL {tolerance}")) \
                if direction == "backward" else \
                   (F.col("__m.__rts")
                    <= F.col(on) + F.expr(f"INTERVAL {tolerance}"))
        else:
            # numeric time axis: the interval's duration in seconds,
            # derived via timestamp arithmetic (day-time intervals only
            # — a constant duration by definition)
            base = F.lit("2000-01-01 00:00:00").cast("timestamp_ltz")
            tol = (F.unix_micros(base + F.expr(f"INTERVAL {tolerance}"))
                   - F.unix_micros(base)) / F.lit(1e6)
            gap = F.col(on) - F.col("__m.__rts") \
                if direction == "backward" \
                else F.col("__m.__rts") - F.col(on)
            keep = gap <= tol
        out = out.withColumn("__m", F.when(keep, F.col("__m")))

    sel = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    sel.append(F.col("__m.__rts").alias(f"{right_prefix}{on}"))
    sel += [F.col(f"__m.{c}").alias(f"{right_prefix}{c}") for c in rcols]
    return out.select(*sel)


def _epoch_seconds(df: DataFrame, col: str) -> Column:
    """Numeric seconds from a numeric OR timestamp column (Spark 4
    forbids a direct timestamp->double cast; NTZ goes through LTZ —
    the same session-zone conversion on both join sides, so equality
    and ordering are unaffected)."""
    t = dict(df.dtypes)[col]
    c = F.col(col)
    if t.startswith("timestamp"):
        return F.unix_micros(c.cast("timestamp_ltz")) / F.lit(1e6)
    return c.cast("double")


def interval_join(points: DataFrame, intervals: DataFrame,
                  ts: str = "ts", start: str = "start", end: str = "end",
                  by: str | None = None,
                  bin_width: int = 3600) -> DataFrame:
    """Inner-join each point row to every interval row with
    ``start <= point.ts < end`` (and equal ``by`` key when given),
    without a nested-loop join: intervals explode to the ``bin_width``-
    second bins they cover, points hash to their single bin, and the
    containment check refines the (key, bin) equi-join. Interval columns
    come back as-is (name-collision-free inputs are the caller's
    contract); each matching pair appears exactly once.

    ``bin_width`` trades interval replication (duration / bin_width
    rows per interval) against bin selectivity — set it near the median
    interval duration.
    """
    if bin_width <= 0:
        raise ValueError("bin_width must be positive seconds")
    overlap = set(points.columns) & set(intervals.columns) - {by}
    if overlap:
        raise ValueError(f"column collision between frames: {overlap}")

    keys = [by] if by else []
    pbin = F.floor(_epoch_seconds(points, ts) / bin_width).cast("long")
    p = points.withColumn("__bin", pbin)
    sbin = F.floor(_epoch_seconds(intervals, start) / bin_width) \
        .cast("long")
    ebin = F.floor(_epoch_seconds(intervals, end) / bin_width).cast("long")
    iv = intervals.select(
        "*", F.explode(F.sequence(sbin, ebin)).alias("__bin"))
    joined = p.join(iv, [*keys, "__bin"])
    refined = joined.where(
        (F.col(ts) >= F.col(start)) & (F.col(ts) < F.col(end)))
    return refined.drop("__bin")


def scd2_intervals(changes: DataFrame, key: str, ts: str = "ts",
                   valid_from: str = "valid_from",
                   valid_to: str = "valid_to") -> DataFrame:
    """Turn a change-event stream into SCD-2-style validity intervals:
    each input row becomes the state valid from its own timestamp until
    the key's NEXT change (open-ended ``NULL`` for the current state) —
    the dimension-building step that makes ``interval_join`` answer
    "which state was live at time t" (and whose result agrees with
    ``asof_join`` directly against the change stream, pinned in tests).

    One keyed window (lead over ``ts``); duplicate (key, ts) rows are
    ambiguous input and resolve by an arbitrary-but-deterministic total
    order (ts, then the remaining columns' hash)."""
    if valid_from in changes.columns or valid_to in changes.columns:
        raise ValueError("output column collides with input")
    tie = F.xxhash64(*[F.col(c) for c in changes.columns])
    w = Window.partitionBy(key).orderBy(F.col(ts).asc(), tie.asc())
    return (changes.withColumn(valid_from, F.col(ts))
                   .withColumn(valid_to, F.lead(ts).over(w)))
