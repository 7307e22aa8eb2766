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
        probe_med=WORST["probe_sec"],
        cpus=9999,
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


def test_cross_round_diag_emits_norm_vs_prev_last():
    """VERDICT r16 item 3: the driver's ~2 KB tail capture keeps the
    END of the cross_round line, so the round-stamped cross-round
    block (norm_vs_prev, leading with its base label) must be the
    LAST key — a truncated capture then shows base:"rN" ratios, not
    the within-round self map."""
    line = bench.render_cross_round_diag(
        {"q1": 1.0},
        {"base": "r16", "n_shared": 1, "per_query": {"q1": 1.0}},
        {"base": "self_full", "n_shared": 1, "per_query": {"q1": 1.0}},
    )
    obj = json.loads(line)
    keys = list(obj)
    assert keys[-1] == "norm_vs_prev"
    assert keys.index("norm_vs_self") < keys.index("norm_vs_prev")
    # the cross-round block's own first key is its base label, so the
    # first thing a reader sees in the surviving block is "r16"
    assert list(obj["norm_vs_prev"])[0] == "base"
    # positional truth on the raw string, not just parsed order
    assert line.rindex('"norm_vs_prev"') > line.rindex('"norm_vs_self"')


def test_final_line_parses_and_has_driver_contract_fields():
    line = bench.render_final_line(12.34, 0.1, 3, 61, 0.56)
    obj = json.loads(line)
    for field in ("metric", "value", "unit", "sf", "probe_sec", "total_over_probe"):
        assert field in obj
    assert obj["metric"] == "bench_total_wall_sec"
    assert obj["unit"] == "sec"
    assert "queries" not in obj  # the map lives on the diag line / FULL file


def test_final_line_carries_probe_median_and_cpus():
    """VERDICT r18 item 9: probe min AND median on the final line (two
    numbers, still small) so cross-round judging can down-weight
    probe-flaky sessions; comparisons stay min-normalized."""
    line = bench.render_final_line(12.3, 0.1, 3, 66, 0.25, 0.41, 32)
    obj = json.loads(line)
    assert obj["probe_sec"] == 0.25 and obj["probe_med"] == 0.41
    assert obj["cpus"] == 32
    # legacy call shape (no probe_med/cpus) stays parseable and omits them
    legacy = json.loads(bench.render_final_line(12.3, 0.1, 3, 66, 0.25))
    assert "probe_med" not in legacy and "cpus" not in legacy


def test_reduced_core_runs_write_sidecar_not_full_record():
    """VERDICT r18 item 3: the driver's low-core scaling run must not
    clobber the full-width per-query record — r18's c8 run overwrote
    BENCH_FULL_sf0.1.json and PERF's scaling block had nothing to
    read. Reduced width -> c{N} sidecar; full width -> the record."""
    assert bench.full_record_name(0.1, 8, 32) == (
        "BENCH_FULL_c8_sf0.1.json",
        True,
    )
    assert bench.full_record_name(0.1, 32, 32) == (
        "BENCH_FULL_sf0.1.json",
        False,
    )
    # an over-subscribed width is still the box's full-width record
    assert bench.full_record_name(0.1, 64, 32) == (
        "BENCH_FULL_sf0.1.json",
        False,
    )


def _write(path, obj):
    with open(path, "w") as fh:
        json.dump(obj, fh)


def test_mid_round_refresh_cannot_become_cross_round_base(tmp_path):
    """VERDICT r15 item 1: the un-stamped BENCH_FULL self-record is
    refreshed on every full run, so r15's committed "0.943 vs
    previous" compared r15 against an r15-mid snapshot. The
    cross-round base must come ONLY from the round-stamped archive
    (or the ≤r12 driver artifacts); the self record feeds the
    separately-labeled norm_vs_self delta."""
    d = str(tmp_path)
    rec = {"probe_sec": 0.3, "queries": {"q1": 1.0}, "value": 1.0}
    # only a mid-round self refresh on disk -> NO cross-round base
    _write(f"{d}/BENCH_FULL_sf0.1.json", rec)
    assert bench.previous_bench(d, 0.1) is None
    assert bench.self_full_bench(d, 0.1)[0] == "self_full"
    # a round-stamped archive exists -> it wins, labeled by round
    _write(f"{d}/BENCH_FULL_r15_sf0.1.json", dict(rec, value=2.0))
    name, base = bench.previous_bench(d, 0.1)
    assert name == "r15" and base["value"] == 2.0
    # newer stamped round wins over older
    _write(f"{d}/BENCH_FULL_r16_sf0.1.json", dict(rec, value=3.0))
    assert bench.previous_bench(d, 0.1) == ("r16", dict(rec, value=3.0))


def test_archive_accepted_round_stamps_only_matching_headline(tmp_path):
    d = str(tmp_path)
    full = {"probe_sec": 0.3, "queries": {"q1": 1.0}, "value": 10.0}
    _write(f"{d}/BENCH_FULL_sf0.1.json", full)
    # driver artifact whose headline MATCHES the on-disk full record
    _write(
        f"{d}/BENCH_r15.json",
        {"parsed": {"value": 10.0, "probe_sec": 0.3}},
    )
    p = bench.archive_accepted_round(d, 0.1)
    assert p and p.endswith("BENCH_FULL_r15_sf0.1.json")
    arch = json.load(open(p))
    assert arch["accepted_round"] == 15 and arch["queries"] == {"q1": 1.0}
    # idempotent: never restamp an existing archive
    assert bench.archive_accepted_round(d, 0.1) is None


def test_archive_accepted_round_refuses_mismatched_headline(tmp_path):
    """If BENCH_FULL was already refreshed mid-round before the first
    archive attempt, its headline no longer matches the driver's
    BENCH_r{N} capture — stamping it would recreate the r15 bug, so
    the archiver must refuse."""
    d = str(tmp_path)
    _write(
        f"{d}/BENCH_FULL_sf0.1.json",
        {"probe_sec": 0.9, "queries": {"q1": 9.0}, "value": 99.0},
    )
    _write(
        f"{d}/BENCH_r15.json",
        {"parsed": {"value": 10.0, "probe_sec": 0.3}},
    )
    assert bench.archive_accepted_round(d, 0.1) is None
    import os as _os

    assert not _os.path.exists(f"{d}/BENCH_FULL_r15_sf0.1.json")


def test_repo_carries_r15_accepted_archive_matching_driver_capture():
    """The r16 artifact must compare against r15's accepted record
    (VERDICT r15 item 1 Done criterion)."""
    import os as _os

    here = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    arch = json.load(open(f"{here}/BENCH_FULL_r15_sf0.1.json"))
    drv = json.load(open(f"{here}/BENCH_r15.json"))["parsed"]
    assert arch["accepted_round"] == 15
    assert arch["value"] == drv["value"]
    assert arch["probe_sec"] == drv["probe_sec"]
    name, base = bench.previous_bench(here, 0.1)
    assert name >= "r15" and base.get("queries")
