"""MERGE/CDC upsert + SCD2 history (operators/merge.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.merge import (
    latest_changes,
    merge_upsert,
    scd2_apply,
)


def test_merge_upsert_semantics(spark):
    snap = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, name string, v double",
    )
    changes = spark.createDataFrame(
        [
            (2, "b2", 21.0, "U", 1),   # update
            (3, None, None, "D", 1),   # delete
            (4, "d", 40.0, "I", 1),    # insert
            (1, "a2", 11.0, "U", 1),   # superseded by...
            (1, None, None, "D", 2),   # ...a later delete — latest wins
        ],
        "k long, name string, v double, op string, seq int",
    )
    out = {
        r["k"]: (r["name"], r["v"])
        for r in merge_upsert(snap, changes, keys=["k"]).collect()
    }
    assert out == {2: ("b2", 21.0), 4: ("d", 40.0)}


def test_latest_changes_window_is_batch_only(spark):
    changes = spark.createDataFrame(
        [(1, "x", "U", 1), (1, "y", "U", 3), (1, "z", "U", 2)],
        "k long, payload string, op string, seq int",
    )
    rows = latest_changes(changes, ["k"]).collect()
    assert len(rows) == 1 and rows[0]["payload"] == "y"


def test_scd2_apply_versions(spark):
    d0 = dt.date(2020, 1, 1)
    eff = dt.date(2024, 6, 1)
    dim = spark.createDataFrame(
        [
            # an immutable closed-out history row must pass through as-is
            (1, 5.0, d0, dt.date(2022, 1, 1), False),
            (1, 7.0, dt.date(2022, 1, 1), None, True),
            (2, 9.0, d0, None, True),
        ],
        "k long, v double, valid_from date, valid_to date, is_current boolean",
    )
    updates = spark.createDataFrame(
        [(1, 8.0, eff), (3, 1.0, eff)],
        "k long, v double, effective_date date",
    )
    rows = scd2_apply(dim, updates, keys=["k"]).collect()
    by = sorted(
        [(r["k"], r["v"], r["valid_from"], r["valid_to"], r["is_current"]) for r in rows]
    )
    assert by == sorted(
        [
            (1, 5.0, d0, dt.date(2022, 1, 1), False),      # history untouched
            (1, 7.0, dt.date(2022, 1, 1), eff, False),     # closed out
            (1, 8.0, eff, None, True),                     # new version
            (2, 9.0, d0, None, True),                      # passthrough
            (3, 1.0, eff, None, True),                     # brand-new key
        ]
    )


def test_merge_broadcast_plan(spark):
    snap = spark.createDataFrame([(1, 1.0)], "k long, v double")
    ch = spark.createDataFrame(
        [(1, 2.0, "U", 1)], "k long, v double, op string, seq int"
    )
    out = merge_upsert(snap, ch, keys=["k"], broadcast_changes=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan
