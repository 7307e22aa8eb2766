"""Bench final-line budget (VERDICT r13 item 1): the r13 bench run
computed all 61 timings and then CRASHED printing them, because the
per-query map grew the final JSON line to 1907 chars — past bench.py's
own 1900-char guard (the driver captures only a ~2 KB stdout tail, so
an oversized line hides the whole run). The fix moves the per-query
map to a diagnostics line + BENCH_FULL_sf{sf}.json; these tests render
the final line from the LIVE bench registry with worst-case field
widths so registry growth can never re-break the emitter.
"""

from __future__ import annotations

import json

import bench
from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark import (
    plans,
)

# worst-case field widths: a 7-char total (e.g. 99999.9 s), a 7-char
# probe, max plausible reps, a 4-digit registry
WORST = dict(total=99999.99, sf=0.001, reps=99, n_queries=9999, probe_sec=9999.99)


def test_final_line_fits_tail_guard_at_current_registry_size():
    n = len(plans.bench_queries())
    line = bench.render_final_line(
        total=WORST["total"],
        sf=WORST["sf"],
        reps=WORST["reps"],
        n_queries=n,
        probe_sec=WORST["probe_sec"],
    )
    assert len(line) < 1900, f"final bench line would be {len(line)} chars"


def test_final_line_is_registry_size_invariant():
    # the final line must not grow with the bench set at all — that is
    # the structural fix; n_queries is a fixed-width count, not a map
    a = bench.render_final_line(1.0, 0.1, 3, 1, 1.0)
    b = bench.render_final_line(1.0, 0.1, 3, 9999, 1.0)
    assert abs(len(a) - len(b)) <= 3  # only the digits of n_queries


def test_norm_vs_prev_carries_both_ratios():
    """VERDICT r14 item 4: the cross-round diag must carry BOTH the
    probe-normalized ratio and the raw shared-sum ratio — a 24% probe
    spread turned r14's raw 0.99 into a phantom 1.247 normalized."""
    prev = ("r14", {"queries": {"q1": 2.0, "q2": 4.0}, "probe_sec": 0.4})
    # same raw times, but THIS session's probe ran 25% faster
    out = bench.compute_norm_vs_prev({"q1": 2.0, "q2": 4.0, "q3": 9.0}, prev, 0.3)
    assert out["n_shared"] == 2
    assert out["raw_shared_ratio"] == 1.0  # the truth: no regression
    assert out["total_norm_ratio"] == round((6.0 / 0.3) / (6.0 / 0.4), 3)
    assert out["total_norm_ratio"] > 1.3  # the phantom the raw ratio exposes
    # degenerate bases stay loud but non-crashing
    assert bench.compute_norm_vs_prev({"q1": 1.0}, None, 0.3) == {}
    assert bench.compute_norm_vs_prev(
        {"q9": 1.0}, prev, 0.3
    ) == {"base": "r14", "n_shared": 0}


def test_final_line_parses_and_has_driver_contract_fields():
    line = bench.render_final_line(12.34, 0.1, 3, 61, 0.56)
    obj = json.loads(line)
    for field in ("metric", "value", "unit", "sf", "probe_sec", "total_over_probe"):
        assert field in obj
    assert obj["metric"] == "bench_total_wall_sec"
    assert obj["unit"] == "sec"
    assert "queries" not in obj  # the map lives on the diag line / FULL file
