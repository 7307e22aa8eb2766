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


def test_r17_rotation_is_the_full_r13_cohort():
    """VERDICT r16 item 2: the r13 cohort — recomputed from committed
    history — is exactly 50 still-registered queries, so it IS the
    window (alphabetical). No slots remain for first attestations
    this round (50 + 23 never-attested = 73 names for 50 slots; see
    the plans/__init__ docstring for the arithmetic)."""
    w = plans._DRIVER_WINDOW
    assert w[0] == "array_funcs_orders"
    assert w[-1] == "zonemap_prune_orders"
    assert w == sorted(w)


def test_r13_cohort_fully_covered_by_r17_window():
    """The binding criterion (tightened per VERDICT r16 item 2):
    after r17 no oracled query's last driver attestation may be older
    than r14. Recompute the r13-or-older cohort from the committed
    CORRECTNESS history and require every member to hold a window
    slot."""
    import glob
    import json
    import os
    import re

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    last: dict[str, int] = {}
    for f in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        n = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        for q, r in json.load(open(f)).items():
            if isinstance(r, dict) and r.get("hash_match"):
                last[q] = max(last.get(q, 0), n)
    registered = set(plans.queries())
    stale = sorted(
        q for q, n in last.items() if q in registered and n <= 13
    )
    missing = [q for q in stale if q not in plans._DRIVER_WINDOW]
    assert not missing, f"r13-or-older rows left out of the window: {missing}"
