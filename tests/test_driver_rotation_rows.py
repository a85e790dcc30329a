"""In-suite pin for the r11 driver rotation rows: the three queries()
entries rotated into the CORRECTNESS hash slots this round must match
their oracle_sql() twins at sf0.001 with the driver's own comparison
(sorted columns, rounded floats, order-insensitive rows) — so a
regression shows up in pytest, not first at driver time. The full
50-row sweep stays in tools/check_oracle.py (too slow for the suite)."""
from __future__ import annotations

import importlib.util
import os

import duckdb
import pytest

_spec = importlib.util.spec_from_file_location(
    "entry_under_test",
    os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "__spark_entry__.py"))
entrymod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_spec and entrymod)

SF = "/root/testdata/sf0.001"

ROWS = ["sketch_heavy_hitters", "hygiene_span_dedup", "events_retention"]


def _norm(cols, rows):
    import math

    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = "NaN" if math.isnan(v) else (round(v, 6) or 0.0)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


@pytest.mark.parametrize("name", ROWS)
def test_rotation_row_matches_oracle(spark, name):
    from valkey_search_spark.sources.tables import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert name in qs and name in oracles
    df = qs[name](spark, SF)
    got_cols = df.columns
    got = _norm(got_cols, [tuple(r) for r in df.collect()])
    cur = con.execute(oracles[name])
    want_cols = [d[0] for d in cur.description]
    want = _norm(want_cols, cur.fetchall())
    assert sorted(got_cols) == sorted(want_cols)
    assert len(got) == len(want)
    assert got == want
