"""The bench's pass/fail recall gate (round-8 verdict item 5): a
routing-recall regression must fail the bench run, not drift as an
informational curve row."""
from __future__ import annotations

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
_bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_bench)
recall_gate = _bench.recall_gate


def test_gate_passes_at_threshold():
    curve = [{"tier": "clustered_unrouted", "recall_at_10": 1.0},
             {"tier": "clustered_routed_r2", "recall_at_10": 0.95}]
    assert recall_gate(curve, "clustered_routed_r2", 0.95) == "pass"


def test_gate_fails_below_threshold():
    curve = [{"tier": "clustered_routed_r2", "recall_at_10": 0.90}]
    got = recall_gate(curve, "clustered_routed_r2", 0.95)
    assert got.startswith("fail"), got
    assert "0.9" in got


def test_gate_fails_when_tier_missing():
    curve = [{"ef": 48, "recall_at_10": 1.0}]  # no tier label at all
    assert recall_gate(curve, "clustered_routed_r2", 0.95) \
        == "fail: tier missing"


def test_gate_uses_latest_row_for_tier():
    # a tier re-measured later in the run supersedes the earlier row
    curve = [{"tier": "clustered_routed_r2", "recall_at_10": 0.2},
             {"tier": "clustered_routed_r2", "recall_at_10": 0.99}]
    assert recall_gate(curve, "clustered_routed_r2", 0.95) == "pass"
