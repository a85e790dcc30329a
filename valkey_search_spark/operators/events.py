"""Event analytics: sessionization, funnels, retention cohorts.

The batch side of the streaming session windows
(``streaming/windows.py``): the same gap-based session semantics over
an at-rest event log, plus the two reports every event pipeline ends
at. All three are pure DataFrame plans:

- ``sessionize``: ONE keyed window (lag + running sum) assigns
  gap-delimited session ids — no self-join, no explosion; the id is a
  pure function of (key, session start) so re-runs agree.
- ``funnel``: per-user ordered step matching as an aggregate fold over
  the user's time-sorted event structs (greedy earliest-match, the
  standard funnel semantics: step i must strictly follow step i-1) —
  one groupBy shuffle, the fold is all-JVM; returns the per-step
  user-count table.
- ``retention_cohorts``: users grouped by first-seen period, counted
  per activity-period offset — two aggregations and a broadcast-size
  join keyed on the user.

Scale shape: everything shuffles on the user key exactly once
(sessionize/funnel) or twice (retention's first-seen + activity), no
window ever spans users, and no collect happens anywhere. Skewed hot
users bound funnel's per-user sort (one user's events sort in one
task) — the inherent cost of ordered semantics; cap with a per-user
event limit upstream if a device-id key is adversarial.

Reference analogue: none (valkey-search has no event model);
beyond-reference extension (SURVEY §2.10). Oracles: DuckDB CTEs in
tests/test_events.py replicate all three end-to-end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


def sessionize(events: DataFrame, user_col: str = "user_id",
               ts_col: str = "ts", gap: str = "30 minutes",
               out_col: str = "session_id") -> DataFrame:
    """Assign gap-delimited session ids: a new session starts when the
    user's inter-event gap EXCEEDS ``gap`` (an interval string, or
    seconds as a number for numeric time axes). An event at EXACTLY
    last + gap continues the session — Spark's own ``session_window``
    merges boundary-touching windows the same way (parity pinned in
    tests/test_events.py against a batch session_window evaluation),
    so batch and streaming session counts agree on boundary events.
    Adds ``out_col`` (= "<user>/<session start epoch>") and
    ``session_seq`` (1-based per-user counter). One keyed window."""
    if out_col in events.columns:
        raise ValueError(f"{out_col} already exists")
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc())
    t = F.col(ts_col)
    dtypes = dict(events.dtypes)
    if dtypes[ts_col].startswith("timestamp"):
        # the cast covers timestamp_ntz, which unix_micros rejects
        secs = F.unix_micros(t.cast("timestamp")).cast("double") / 1e6
        gap_s = F.lit(_interval_seconds(gap))
    else:
        secs = t.cast("double")
        gap_s = F.lit(float(gap))
    prev = F.lag(secs).over(w)
    is_new = F.when(prev.isNull() | (secs - prev > gap_s), 1).otherwise(0)
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    seq = F.sum(is_new).over(running)
    # session start propagates with last(ignorenulls) over the SAME
    # user-keyed window — one exchange total (a second window keyed on
    # (user, seq) would re-shuffle)
    start = F.last(F.when(is_new == 1, secs), ignorenulls=True) \
        .over(running)
    return (events
            .withColumn("session_seq", seq.cast("int"))
            .withColumn(out_col, F.concat_ws(
                "/", F.col(user_col).cast("string"),
                start.cast("string"))))


def _interval_seconds(gap: str) -> float:
    units = {"second": 1, "seconds": 1, "minute": 60, "minutes": 60,
             "hour": 3600, "hours": 3600, "day": 86400, "days": 86400}
    parts = str(gap).split()
    if len(parts) == 1:
        return float(parts[0])
    if len(parts) == 2 and parts[1].lower() in units:
        return float(parts[0]) * units[parts[1].lower()]
    raise ValueError(f"cannot parse gap {gap!r}")


def funnel(events: DataFrame, steps: list[str],
           user_col: str = "user_id", ts_col: str = "ts",
           type_col: str = "event_type") -> DataFrame:
    """Ordered funnel: per user, greedily match ``steps`` in time order
    (step i must occur strictly after the matched step i-1; the
    EARLIEST qualifying event is taken, the standard conversion
    semantics). Returns one row per step: ``step`` (1-based),
    ``step_name``, ``n_users`` reaching it, and ``conversion`` from
    step 1. Strict ordering: an event at the same instant as the
    previously matched step cannot satisfy the next one, so
    simultaneous events never advance the funnel twice (the outcome
    is order-independent for same-timestamp events)."""
    if not steps:
        raise ValueError("need at least one step")
    u, t = user_col, ts_col
    dtypes = dict(events.dtypes)
    tsec = (F.unix_micros(F.col(t).cast("timestamp")).cast("double") / 1e6
            if dtypes[t].startswith("timestamp")
            else F.col(t).cast("double"))

    # per user: time-sorted (ts, type) structs, then a fold that walks
    # the sorted array advancing a (stage, last_ts) state — all JVM
    relevant = events.where(F.col(type_col).isin(list(steps)))
    per_user = (relevant
                .groupBy(u)
                .agg(F.sort_array(F.collect_list(
                    F.struct(tsec.alias("s"),
                             F.col(type_col).alias("e")))).alias("__evs")))
    n = len(steps)
    step_lits = F.array(*[F.lit(s) for s in steps])

    def advance(acc: Column, ev: Column) -> Column:
        # acc: struct<stage int, last double>; match next step if this
        # event is it and strictly later than the last matched event
        nxt = F.get(step_lits, acc["stage"])
        hit = (acc["stage"] < n) & (ev["e"] == nxt) \
            & (ev["s"] > acc["last"])
        return F.when(hit, F.struct(
            (acc["stage"] + 1).alias("stage"),
            ev["s"].alias("last"))).otherwise(acc)

    init = F.struct(F.lit(0).alias("stage"),
                    F.lit(float("-inf")).alias("last"))
    staged = per_user.select(
        F.aggregate("__evs", init, advance)["stage"].alias("__stage"))
    counts = (staged.where(F.col("__stage") > 0)
              .groupBy("__stage").agg(F.count("*").alias("__c")))
    # cumulative: users reaching step i = sum of counts at stages >= i
    ladder = counts.crossJoin(
        F.broadcast(events.sparkSession.range(1, n + 1)
                    .select(F.col("id").cast("int").alias("step")))) \
        .where(F.col("__stage") >= F.col("step")) \
        .groupBy("step").agg(F.sum("__c").alias("n_users"))
    base = F.first("n_users").over(
        Window.orderBy("step").rowsBetween(Window.unboundedPreceding,
                                           Window.currentRow))
    return (events.sparkSession.range(1, n + 1)
            .select(F.col("id").cast("int").alias("step"))
            .join(ladder, "step", "left")
            .withColumn("n_users", F.coalesce("n_users", F.lit(0)))
            .withColumn("step_name", F.get(step_lits, F.col("step") - 1))
            .withColumn("conversion",
                        F.when(base > 0,
                               F.col("n_users") / base).otherwise(0.0))
            .select("step", "step_name", "n_users", "conversion")
            .orderBy("step"))


def retention_cohorts(events: DataFrame, user_col: str = "user_id",
                      ts_col: str = "ts", period: str = "week",
                      anchor_filter: Column | None = None) -> DataFrame:
    """Cohort retention: users bucketed by their FIRST event's period
    (optionally only ``anchor_filter`` events anchor, e.g.
    ``F.col("event_type") == "signup"``), counted per activity-period
    offset. Returns (cohort, offset, n_users, retention) where
    retention divides by the cohort's offset-0 size. ``period``:
    week/day/month."""
    trunc = {"day": "DD", "week": "WEEK", "month": "MM"}.get(period)
    if trunc is None:
        raise ValueError("period must be day, week, or month")
    u, t = user_col, ts_col
    tc = F.col(t).cast("timestamp")   # covers timestamp_ntz inputs
    anchors = events if anchor_filter is None \
        else events.where(anchor_filter)
    first = anchors.groupBy(u).agg(
        F.date_trunc(trunc, F.min(tc)).alias("__cohort"))
    active = events.select(
        F.col(u), F.date_trunc(trunc, tc).alias("__p")).distinct()
    if trunc == "MM":
        off = F.round(F.months_between("__p", "__cohort"))
    else:
        step_days = {"DD": 1.0, "WEEK": 7.0}[trunc]
        off = F.round(
            (F.unix_timestamp("__p") - F.unix_timestamp("__cohort"))
            / F.lit(86400.0 * step_days))
    joined = (active.join(first, u)
              .where(F.col("__p") >= F.col("__cohort"))
              .withColumn("offset", off.cast("int")))
    grid = joined.groupBy(F.col("__cohort").alias("cohort"), "offset") \
        .agg(F.count_distinct(u).alias("n_users"))
    base = Window.partitionBy("cohort")
    return grid.withColumn(
        "retention",
        F.col("n_users") / F.max(F.when(F.col("offset") == 0,
                                        F.col("n_users"))).over(base))
