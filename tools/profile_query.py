"""Per-query stage-level profile via the Spark event log.

Runs each named query with the bench discipline (untimed warm-up, then
one timed noop-sink run), then parses the session's event log and
attributes the timed window's jobs/stages: per-stage wall span, task
time, shuffle read/write bytes, task count. This is the guide-§1
"where is the time actually going" instrument for a UI-less sandbox.

Usage: python tools/profile_query.py [sf_dir] query [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def get_profiling_spark(event_dir: str) -> SparkSession:
    os.makedirs(event_dir, exist_ok=True)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ifds-profile")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", event_dir)
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def _event_lines(path: str):
    # Spark 4 default: rolling event log -> a directory of events_* files
    if os.path.isdir(path):
        parts = sorted(
            f for f in os.listdir(path) if f.startswith("events_")
        )
        for p in parts:
            with open(os.path.join(path, p)) as fh:
                yield from fh
    else:
        with open(path) as fh:
            yield from fh


def parse_events(path: str):
    jobs, stages = {}, {}
    if True:
        for line in _event_lines(path):
            try:
                ev = json.loads(line)
            except Exception:
                continue
            e = ev.get("Event", "")
            if e == "SparkListenerJobStart":
                jobs[ev["Job ID"]] = {
                    "t0": ev["Submission Time"],
                    "desc": (ev.get("Properties") or {}).get(
                        "spark.job.description", ""
                    ),
                    "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
                }
            elif e == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["t1"] = ev["Completion Time"]
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                acc = {
                    a.get("Name"): a.get("Value")
                    for a in si.get("Accumulables", [])
                }
                stages[sid] = {
                    "name": si.get("Name", ""),
                    "t0": si.get("Submission Time", 0),
                    "t1": si.get("Completion Time", 0),
                    "n_tasks": si.get("Number of Tasks", 0),
                    "sr_bytes": acc.get("internal.metrics.shuffle.read.remoteBytesRead", 0)
                    + acc.get("internal.metrics.shuffle.read.localBytesRead", 0),
                    "sw_bytes": acc.get("internal.metrics.shuffle.write.bytesWritten", 0),
                    "run_ms": acc.get("internal.metrics.executorRunTime", 0),
                    "cpu_ms": (acc.get("internal.metrics.executorCpuTime", 0) or 0)
                    // 1_000_000,
                }
    return jobs, stages


def main() -> None:
    argv = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if argv and os.path.isdir(argv[0]):
        sf_dir, argv = argv[0], argv[1:]
    names = argv
    event_dir = "/tmp/spark-events-profile"
    spark = get_profiling_spark(event_dir)
    app_id = spark.sparkContext.applicationId

    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.cache import (  # noqa: E402
        release_caches,
    )
    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.plans import (  # noqa: E402
        REGISTRY,
    )

    windows = {}
    for name in names:
        builder = REGISTRY[name].builder
        for phase in ("warmup", "timed"):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"{name}::{phase}")
            t0 = time.time()
            builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
            t1 = time.time()
            release_caches()
            if phase == "timed":
                windows[name] = (t0 * 1000, t1 * 1000, t1 - t0)
        spark.sparkContext.setJobDescription(None)
    spark.stop()

    cands = [
        os.path.join(event_dir, f)
        for f in os.listdir(event_dir)
        if app_id in f
    ] or [os.path.join(event_dir, f) for f in os.listdir(event_dir)]
    log_path = max(cands, key=os.path.getmtime)
    jobs, stages = parse_events(log_path)

    for name in names:
        t0, t1, wall = windows[name]
        my_jobs = {
            jid: j
            for jid, j in jobs.items()
            if j["desc"] == f"{name}::timed" and j.get("t1")
        }
        print(f"\n=== {name}: wall {wall:.2f}s, {len(my_jobs)} jobs ===")
        job_span = sum(j["t1"] - j["t0"] for j in my_jobs.values()) / 1000
        print(f"  sum of job spans: {job_span:.2f}s (gaps = driver/planning)")
        rows = []
        for jid, j in sorted(my_jobs.items()):
            for sid in j["stages"]:
                if sid in stages:
                    s = stages[sid]
                    rows.append((jid, sid, s))
        rows.sort(key=lambda r: -(r[2]["t1"] - r[2]["t0"]))
        print(
            f"  {'job':>4} {'stage':>5} {'span_s':>7} {'run_s':>7} {'cpu_s':>6}"
            f" {'tasks':>5} {'shufR_MB':>8} {'shufW_MB':>8}  name"
        )
        for jid, sid, s in rows[:14]:
            print(
                f"  {jid:>4} {sid:>5} {(s['t1']-s['t0'])/1000:>7.2f}"
                f" {s['run_ms']/1000:>7.2f} {s['cpu_ms']/1000:>6.1f}"
                f" {s['n_tasks']:>5}"
                f" {(s['sr_bytes'] or 0)/1e6:>8.2f} {(s['sw_bytes'] or 0)/1e6:>8.2f}"
                f"  {s['name'][:60]}"
            )


if __name__ == "__main__":
    main()
