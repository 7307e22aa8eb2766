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


#: Rows-only queries deliberately rotated into the window (VERDICT r7
#: item 8): the driver records a rows_match-only row for them.
ROWS_ONLY_IN_WINDOW = {
    "bpe_tokenize_documents",
    "hll_distinct_events",
    "minhash_near_dup",
}


def test_every_window_query_is_oracled_or_declared_rows_only():
    osql = plans.oracle_sql()
    missing = [
        n
        for n in plans._DRIVER_WINDOW
        if n not in osql and n not in ROWS_ONLY_IN_WINDOW
    ]
    assert not missing, f"window queries without an oracle: {missing}"
    # and the declared rows-only tail must really have no oracle
    assert not [n for n in ROWS_ONLY_IN_WINDOW if n in osql]


def test_window_has_no_duplicates():
    assert len(set(plans._DRIVER_WINDOW)) == 50
