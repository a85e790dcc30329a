"""sessionize / funnel / retention_cohorts vs DuckDB oracles on the
real events table, plus hand-built edge cases."""
from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from valkey_search_spark.operators.events import (funnel, retention_cohorts,
                                                  sessionize)


def _events_path(sf_dir):
    return f"{sf_dir}/events.parquet"


def test_sessionize_matches_duckdb(spark, sf_dir):
    ev = spark.read.parquet(_events_path(sf_dir)).limit(5000)
    out = sessionize(ev, gap="30 minutes")
    got = {(r["event_id"]): (r["session_seq"], r["session_id"])
           for r in out.collect()}

    want = duckdb.sql(f"""
        WITH base AS (SELECT * FROM '{_events_path(sf_dir)}'
                      ORDER BY event_id LIMIT 5000),
        lagged AS (
          SELECT event_id, user_id, ts,
                 epoch(ts) - epoch(lag(ts) OVER
                     (PARTITION BY user_id ORDER BY ts)) AS d
          FROM base),
        seq AS (
          SELECT event_id, user_id, ts,
                 sum(CASE WHEN d IS NULL OR d > 1800 THEN 1 ELSE 0 END)
                     OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS session_seq
          FROM lagged)
        SELECT event_id, session_seq,
               min(epoch(ts)) OVER (PARTITION BY user_id, session_seq)
                   AS start
        FROM seq
    """).fetchall()
    assert len(want) == len(got)
    for event_id, seqno, start in want:
        g = got[event_id]
        assert g[0] == seqno, event_id
        assert float(g[1].split("/")[1]) == pytest.approx(float(start))


def test_sessionize_gap_boundary_matches_session_window(spark):
    # an event at EXACTLY last+gap continues the session: Spark's own
    # session_window MERGES boundary-touching windows (verified here),
    # so the batch operator uses the same strict-exceeds rule
    rows = [(1, 0.0), (2, 1800.0), (3, 3600.0), (4, 5401.0)]
    ev = spark.createDataFrame(rows, "event_id int, ts double") \
        .withColumn("user_id", F.lit(7))
    out = {r["event_id"]: r["session_seq"]
           for r in sessionize(ev, gap=1800).collect()}
    # gaps: 1800 (same), 1800 (same), 1801 (new)
    assert out == {1: 1, 2: 1, 3: 1, 4: 2}

    # parity with the batch evaluation of session_window itself
    tev = spark.createDataFrame(
        [(i, float(t)) for i, t in rows], "event_id int, s double") \
        .select("event_id", F.timestamp_seconds("s").alias("ts")) \
        .withColumn("user_id", F.lit(7))
    sw = (tev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
          .count().collect())
    assert len(sw) == 2     # same session count as sessionize


def test_funnel_hand_case(spark):
    rows = [
        # u1 completes a->b->c in order
        (1, "a", 1.0), (1, "b", 2.0), (1, "c", 3.0),
        # u2 has b before a: only reaches step 1 (a at t=5, no b after)
        (2, "b", 4.0), (2, "a", 5.0),
        # u3: a then c (skips b): reaches step 1 only
        (3, "a", 1.0), (3, "c", 2.0),
        # u4: same-instant a,b -> b cannot match at the same ts
        (4, "a", 9.0), (4, "b", 9.0),
        # u5: never enters
        (5, "c", 1.0),
    ]
    ev = spark.createDataFrame(rows, "user_id int, event_type string,"
                                     " ts double")
    got = {r["step"]: (r["step_name"], r["n_users"], r["conversion"])
           for r in funnel(ev, ["a", "b", "c"]).collect()}
    assert got[1] == ("a", 4, 1.0)
    assert got[2] == ("b", 1, 0.25)
    assert got[3] == ("c", 1, 0.25)


def test_funnel_matches_duckdb(spark, sf_dir):
    steps = ["signup", "view", "purchase"]
    ev = spark.read.parquet(_events_path(sf_dir))
    got = {r["step"]: r["n_users"] for r in funnel(ev, steps).collect()}

    # greedy sequential match in SQL: earliest signup, earliest view
    # AFTER it, earliest purchase after that
    want = duckdb.sql(f"""
        WITH e AS (SELECT user_id, event_type, ts
                   FROM '{_events_path(sf_dir)}'),
        s1 AS (SELECT user_id, min(ts) t1 FROM e
               WHERE event_type = 'signup' GROUP BY user_id),
        s2 AS (SELECT e.user_id, min(e.ts) t2 FROM e JOIN s1 USING (user_id)
               WHERE e.event_type = 'view' AND e.ts > s1.t1
               GROUP BY e.user_id),
        s3 AS (SELECT e.user_id, min(e.ts) t3 FROM e JOIN s2 USING (user_id)
               WHERE e.event_type = 'purchase' AND e.ts > s2.t2
               GROUP BY e.user_id)
        SELECT (SELECT count(*) FROM s1),
               (SELECT count(*) FROM s2),
               (SELECT count(*) FROM s3)
    """).fetchone()
    assert (got[1], got[2], got[3]) == want


def test_funnel_greedy_vs_patient_semantics(spark):
    # greedy takes the EARLIEST step-1 match even when a later one
    # would convert: u1 a@1, b@0.5 (before), a@2, b@3 -> greedy matches
    # a@1 then b@3: converts. u2 a@1, b@0.5 only -> stuck at 1.
    rows = [(1, "a", 1.0), (1, "b", 0.5), (1, "a", 2.0), (1, "b", 3.0),
            (2, "b", 0.5), (2, "a", 1.0)]
    ev = spark.createDataFrame(rows, "user_id int, event_type string,"
                                     " ts double")
    got = {r["step"]: r["n_users"] for r in funnel(ev, ["a", "b"]).collect()}
    assert got == {1: 2, 2: 1}


def test_retention_matches_duckdb(spark, sf_dir):
    ev = spark.read.parquet(_events_path(sf_dir))
    got = {(str(r["cohort"]), r["offset"]): r["n_users"]
           for r in retention_cohorts(ev, period="week").collect()}

    want = duckdb.sql(f"""
        WITH first AS (
          SELECT user_id, date_trunc('week', min(ts)) c
          FROM '{_events_path(sf_dir)}' GROUP BY user_id),
        act AS (
          SELECT DISTINCT user_id, date_trunc('week', ts) p
          FROM '{_events_path(sf_dir)}')
        SELECT c, round((epoch(p) - epoch(c)) / (86400 * 7.0))::int o,
               count(DISTINCT user_id)
        FROM act JOIN first USING (user_id) WHERE p >= c
        GROUP BY c, o
    """).fetchall()
    assert len(want) == len(got)
    for c, o, n in want:
        key = (f"{c} 00:00:00", o) if " " not in str(c) else (str(c), o)
        assert got.get((str(c), o), got.get(key)) == n, (c, o)
    # retention at offset 0 is 1.0 everywhere
    for r in retention_cohorts(ev, period="week").collect():
        if r["offset"] == 0:
            assert r["retention"] == pytest.approx(1.0)


def test_retention_anchor_filter(spark, sf_dir):
    ev = spark.read.parquet(_events_path(sf_dir))
    anchored = retention_cohorts(
        ev, period="week",
        anchor_filter=F.col("event_type") == "signup")
    plain = retention_cohorts(ev, period="week")
    # anchored cohorts only contain users WITH a signup event
    n_anchored = anchored.agg(
        F.sum(F.when(F.col("offset") == 0, F.col("n_users")))).first()[0]
    n_signup_users = ev.where("event_type = 'signup'") \
        .select("user_id").distinct().count()
    assert n_anchored == n_signup_users
    n_all = plain.agg(
        F.sum(F.when(F.col("offset") == 0, F.col("n_users")))).first()[0]
    assert n_all >= n_anchored


def test_sessionize_single_exchange(spark, sf_dir):
    ev = spark.read.parquet(_events_path(sf_dir))
    plan = sessionize(ev)._jdf.queryExecution().executedPlan().toString()
    import re
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1


def test_validation(spark):
    df = spark.createDataFrame([(1, 1.0, "x")],
                               "user_id int, ts double, event_type string")
    with pytest.raises(ValueError):
        funnel(df, [])
    with pytest.raises(ValueError):
        retention_cohorts(df.withColumn("ts", F.current_timestamp()),
                          period="year")
    with pytest.raises(ValueError):
        sessionize(df.withColumn("session_id", F.lit("x")))
    with pytest.raises(ValueError):
        sessionize(df, gap="3 fortnights")
