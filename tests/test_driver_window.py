"""Driver-window contract (VERDICT r6 "Next round" item 5): the
correctness gate attests the FIRST 50 registered queries, so the
registry's iteration order is part of the verification contract. These
pin it so a future registration-order change can't silently shrink
driver coverage."""

from __future__ import annotations

from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark import (
    plans,
)


def test_first_50_queries_are_the_driver_window():
    assert len(plans._DRIVER_WINDOW) == 50
    assert list(plans.queries())[:50] == plans._DRIVER_WINDOW


def test_every_window_query_is_oracled():
    # the r7 rows-only experiment is closed (the driver records
    # err:no_oracle and NO attestation for oracle-less queries —
    # VERDICT r8 item 2), so every window slot must carry an oracle
    osql = plans.oracle_sql()
    missing = [n for n in plans._DRIVER_WINDOW if n not in osql]
    assert not missing, f"window queries without an oracle: {missing}"


def test_window_has_no_duplicates():
    assert len(set(plans._DRIVER_WINDOW)) == 50


def test_r15_rotation_segments():
    """VERDICT r14 item 3: r11-cohort remainder (37, alphabetical)
    leads, then the six oracled r14-new queries in the verdict's
    order, then the alphabetical head of the r12 cohort (7)."""
    w = plans._DRIVER_WINDOW
    r11_tail = w[:37]
    assert r11_tail[0] == "grouping_analytics_orders"
    assert r11_tail[-1] == "velocity_flags_events"
    assert r11_tail == sorted(r11_tail)
    assert w[37:43] == [
        "split_transactions_orders",
        "fdr_peer_alerts_customers",
        "conformal_anomaly_events",
        "rake_keywords_documents",
        "ztest_returns_by_priority",
        "streaming_split_transactions",
    ]
    r12_head = w[43:]
    assert r12_head[0] == "analytics_pipeline_events"
    assert r12_head[-1] == "bm25_topk_documents"
    assert r12_head == sorted(r12_head)
