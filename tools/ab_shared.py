"""Same-box code-vs-environment A/B for bench regressions
(VERDICT r16 item 7, generalizing the r16a finding).

The r16a session proved that a 1.25-1.6x normalized cross-round band
with a flat calibration probe can be PURE box-state drift: re-running
the six flagged queries with UNCHANGED r14 code reproduced the
multipliers bit-identically. The decisive instrument is therefore a
paired SAME-BOX A/B — time the worst shared-ratio queries under the
current tree AND under the previous round's code (a git worktree at
the round-close commit) in one session, and compare:

* current ~= previous-code  ->  environment (the box moved, not you);
* current >> previous-code  ->  a real code regression to chase.

Usage (round-close routine, one line per round in SCALING.md):

    python tools/ab_shared.py [sf_dir] [n_worst] [base_ref]

* ``sf_dir``  : bench dataset (default /root/testdata/sf0.1)
* ``n_worst`` : how many worst shared-ratio queries to A/B (default 3)
* ``base_ref``: git ref holding the previous round's code (default:
  the newest commit whose subject matches "round N: ..." — the
  driver's round-close stamp)

Mechanics: the worst movers come from BENCH_FULL_sf{sf}.json (this
round's committed full record) vs the newest BENCH_FULL_r{N}_sf{sf}
archive (the immutable cross-round base) by RAW per-query ratio. Each
leg runs in its own subprocess (fresh JVM; sys.path pinned to that
leg's repo root) with the bench discipline: clearCache per rep,
noop sink, min over reps, the frozen calibration probe. The worktree
is created under a tempdir and removed afterward.

Output: one ``AB_RESULT`` JSON line, per query: sec_now, sec_prev_code,
now_over_prev, and the verdict ("environment" when the previous
round's code is within 15% of today's time on today's box, "code"
when today's tree is >=15% slower than the old tree side-by-side)."""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: the per-leg runner, executed as `python -c LEG_RUNNER <root> <sf_dir>
#: <reps> <q1> ...` — self-contained so it also runs against OLD trees
#: that predate this tool.
LEG_RUNNER = r"""
import json, os, sys, time
root, sf_dir, reps = sys.argv[1], sys.argv[2], int(sys.argv[3])
names = sys.argv[4:]
sys.path.insert(0, root)
from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark import get_spark
from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.cache import release_caches
from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.plans import REGISTRY
spark = get_spark("ifds-ab")
spark.range(1000).selectExpr("sum(id)").collect()
def probe():
    t0 = time.perf_counter()
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    li.groupBy("l_returnflag").count().write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0
out = {"probe": round(min(probe() for _ in range(5)), 4), "queries": {}}
for name in names:
    times = []
    for _ in range(reps + 1):  # first rep is the untimed-ish warmup
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        df = REGISTRY[name].builder(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        times.append(time.perf_counter() - t0)
        release_caches()
    out["queries"][name] = round(min(times[1:]), 2)
print("LEG_RESULT " + json.dumps(out))
"""


def _newest_archive(sf: float) -> tuple[str, dict] | None:
    import glob

    best = None
    for f in glob.glob(os.path.join(HERE, f"BENCH_FULL_r*_sf{sf}.json")):
        m = re.search(r"BENCH_FULL_r(\d+)_sf", f)
        if not m:
            continue
        rec = json.load(open(f))
        n = int(m.group(1))
        if rec.get("queries") and (best is None or n > best[0]):
            best = (n, rec)
    return (f"r{best[0]}", best[1]) if best else None


def _default_base_ref() -> str:
    log = subprocess.run(
        ["git", "log", "--format=%H %s"],
        cwd=HERE,
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    for line in log.splitlines():
        h, _, subj = line.partition(" ")
        if re.match(r"round \d+:", subj):
            return h
    raise SystemExit("no 'round N:' round-close commit found; pass base_ref")


def _run_leg(root: str, sf_dir: str, reps: int, names: list[str]) -> dict:
    proc = subprocess.run(
        [sys.executable, "-c", LEG_RUNNER, root, sf_dir, str(reps), *names],
        capture_output=True,
        text=True,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("LEG_RESULT "):
            return json.loads(line[len("LEG_RESULT "):])
    raise SystemExit(
        f"leg under {root} produced no LEG_RESULT; stderr tail:\n"
        + proc.stderr[-2000:]
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_worst = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    base_ref = sys.argv[3] if len(sys.argv) > 3 else _default_base_ref()
    reps = int(os.environ.get("SPARK_GRAFT_AB_REPS", "3"))
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    cur = json.load(open(os.path.join(HERE, f"BENCH_FULL_sf{sf}.json")))
    prev = _newest_archive(sf)
    if prev is None:
        raise SystemExit("no BENCH_FULL_r{N} archive to rank against")
    prev_name, prev_rec = prev
    shared = {
        q: cur["queries"][q] / prev_rec["queries"][q]
        for q in cur["queries"]
        if prev_rec["queries"].get(q, 0) > 0
    }
    worst = sorted(shared, key=lambda q: -shared[q])[:n_worst]
    print(
        json.dumps(
            {
                "diag": "ab_worst_shared",
                "base": prev_name,
                "worst": {q: round(shared[q], 2) for q in worst},
            }
        ),
        flush=True,
    )

    wt = tempfile.mkdtemp(prefix="ifds_ab_prev_")
    subprocess.run(
        ["git", "worktree", "add", "--detach", wt, base_ref],
        cwd=HERE,
        check=True,
        capture_output=True,
    )
    try:
        now_leg = _run_leg(HERE, sf_dir, reps, worst)
        prev_leg = _run_leg(wt, sf_dir, reps, worst)
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", wt],
            cwd=HERE,
            capture_output=True,
        )
    out = {
        "base_ref": base_ref[:12],
        "bench_base": prev_name,
        "probe_now": now_leg["probe"],
        "probe_prev_code": prev_leg["probe"],
        "queries": {},
    }
    for q in worst:
        tn, tp = now_leg["queries"][q], prev_leg["queries"][q]
        ratio = round(tn / tp, 2) if tp else None
        out["queries"][q] = {
            "stamped_ratio": round(shared[q], 2),
            "sec_now": tn,
            "sec_prev_code": tp,
            "now_over_prev_code": ratio,
            "verdict": (
                "code" if ratio is not None and ratio >= 1.15 else "environment"
            ),
        }
    print("AB_RESULT " + json.dumps(out))


if __name__ == "__main__":
    main()
