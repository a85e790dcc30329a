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
              right_prefix: str = "r_",
              tiebreak: str | None = None,
              bin_width: int = 3600) -> DataFrame:
    """For each left row, attach the closest right row at-or-before
    (``backward``) or at-or-after (``forward``) its ``on`` timestamp,
    matching within ``by`` when given. Every left row survives (left
    semantics); unmatched rows carry nulls. ``tolerance`` (an INTERVAL
    string, e.g. ``'15 minutes'``) nulls out matches farther than that
    from the left timestamp. Right columns (except ``on``/``by``) come
    back prefixed with ``right_prefix``; the matched right timestamp is
    ``{right_prefix}{on}``.

    Ties at equal timestamps match (the right row sorts first), as in
    pandas.merge_asof / DuckDB ASOF semantics with >= / <=. Among
    MULTIPLE right rows at the same timestamp the winner is
    sort-nondeterministic unless ``tiebreak`` names a right column —
    then the row with the GREATEST tiebreak value wins, on every path.

    Scale shape: with ``by``, one shuffle on the key and a per-key
    window — per-key order is the inherent cost (split hot keys
    upstream). WITHOUT ``by`` the join is bin-bucketed (the
    ``interval_join`` trick): both sides hash to ``bin_width``-second
    time bins, each bin scans locally, and bins are stitched with a
    carry computed over the per-bin summary table — the only
    single-task step, bounded by the number of DISTINCT bins (time
    span / bin_width, a caller knob), never by corpus size.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    if on not in left.columns or on not in right.columns:
        raise ValueError(f"both frames need the '{on}' column")
    if by is not None and (by not in left.columns or by not in right.columns):
        raise ValueError(f"both frames need the '{by}' column")
    if tiebreak is not None and tiebreak not in right.columns:
        raise ValueError(f"right frame lacks tiebreak column '{tiebreak}'")
    if bin_width <= 0:
        raise ValueError("bin_width must be positive seconds")

    rcols = [c for c in right.columns if c not in (on, by)]
    payload = F.struct(F.col(on).alias("__rts"),
                       *[F.col(c) for c in rcols])
    backward = direction == "backward"

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

    # backward: latest right at ts' <= ts  -> ascending scan, right rows
    # sort BEFORE left at equal ts (side 0 < 1) so equal-ts rows match;
    # among equal-ts rights the tiebreak sorts ascending, so the running
    # last() lands on the greatest. forward: mirror with a descending
    # scan (side/tiebreak orientation unchanged — see the tie contract).
    def scan_order(ts_col):
        order = [ts_col.asc() if backward else ts_col.desc(),
                 F.col("__side").asc()]
        if tiebreak is not None:
            order.append(F.col(f"__r.{tiebreak}").asc_nulls_first())
        return order

    if keys:
        both = lt.unionByName(rt)
        w = Window.partitionBy(*keys) \
            .orderBy(*scan_order(F.col(on))) \
            .rowsBetween(Window.unboundedPreceding, 0)
        matched = both.withColumn(
            "__m", F.last("__r", ignorenulls=True).over(w))
    else:
        # keyless: bucket by time bin; stitch bins with a carry so a
        # left row whose own bin holds no match still sees the closest
        # right row from the neighboring bins
        eps_l = F.floor(_epoch_seconds(left, on) / bin_width)
        eps_r = F.floor(_epoch_seconds(right, on) / bin_width)
        ltb = lt.withColumn("__bin", eps_l.cast("long")) \
            .withColumn("__ord", _epoch_seconds(left, on))
        rtb = rt.withColumn("__bin", eps_r.cast("long")) \
            .withColumn("__ord", _epoch_seconds(right, on))

        # per-bin winner on the right side (the row the scan below
        # would choose if the bin were scanned alone): closest-to-the-
        # boundary timestamp, greatest tiebreak among equals
        summ_order = [F.col("__ord").desc() if backward
                      else F.col("__ord").asc()]
        if tiebreak is not None:
            summ_order.append(F.col(f"__r.{tiebreak}").desc_nulls_last())
        rn = F.row_number().over(
            Window.partitionBy("__bin").orderBy(*summ_order))
        summ = (rtb.withColumn("__rn", rn).where(F.col("__rn") == 1)
                .select("__bin", F.col("__r").alias("__last")))

        # bin axis = every non-empty bin on either side; the carry for
        # bin b is the latest(/earliest) right payload in any strictly
        # earlier(/later) bin — ONE ordered pass over the axis rows
        # (#bins, not corpus rows)
        axis = (ltb.select("__bin").distinct()
                .unionByName(summ.select("__bin")).distinct())
        wc = Window.orderBy(
            F.col("__bin").asc() if backward else F.col("__bin").desc()) \
            .rowsBetween(Window.unboundedPreceding, -1)
        carry = (axis.join(summ, "__bin", "left")
                 .withColumn("__c",
                             F.last("__last", ignorenulls=True).over(wc))
                 .where(F.col("__c").isNotNull()))
        inf = float("-inf") if backward else float("inf")
        seeds = carry.select(
            "__bin", F.lit(None).cast(lt.schema[on].dataType).alias(on),
            F.lit(-1).alias("__side"),
            F.lit(None).cast(lt.schema["__l"].dataType).alias("__l"),
            F.col("__c").alias("__r"), F.lit(inf).alias("__ord"))

        both = ltb.unionByName(rtb).unionByName(seeds)
        w = Window.partitionBy("__bin") \
            .orderBy(*scan_order(F.col("__ord"))) \
            .rowsBetween(Window.unboundedPreceding, 0)
        matched = both.withColumn(
            "__m", F.last("__r", ignorenulls=True).over(w))

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
