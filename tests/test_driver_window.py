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
