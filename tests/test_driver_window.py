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


def _attestation_history() -> dict[str, int]:
    """Last hash-green driver round per query, from committed history."""
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
    return last


def test_r19_rotation_covers_all_never_attested_oracled():
    """VERDICT r18 item 7 (carrying the r17 item-1 discipline): every
    oracled query with NO driver attestation in committed history (the
    10 r18-new registrations/promotions that queued behind the r18
    window) must hold an r19 slot. Recomputed from history so the pin
    survives the r19 CORRECTNESS file landing (after which the
    never-attested set is empty — r19 registers no new queries)."""
    last = _attestation_history()
    osql = plans.oracle_sql()
    never = sorted(q for q in osql if q not in last)
    missing = [q for q in never if q not in plans._DRIVER_WINDOW]
    assert not missing, f"never-attested left out: {missing}"


def test_r19_window_slots_spent_only_on_sanctioned_cohorts():
    """Every r19 slot is (a) never-attested, (b) r14-stale — the
    oldest remaining cohort, taken in FULL so the staleness tail
    closes at r15 — or (c) one of the five R19_TOUCHED_QUERIES whose
    implementation changed in r18/r19 under local-gate-only
    attestation (VERDICT r18 item 7 names the four r18 rewrites;
    hits carries the r19 size-gated precache branch). Alphabetical order is
    part of the contract."""
    last = _attestation_history()
    w = plans._DRIVER_WINDOW
    assert w == sorted(w)
    for q in w:
        ok = (
            last.get(q, 0) <= 14
            or q in plans.R19_TOUCHED_QUERIES
            or last.get(q) == 19  # after the r19 CORRECTNESS file lands
        )
        assert ok, f"{q} attested r{last.get(q)} — not a sanctioned r19 slot"


def test_no_oracled_query_staler_than_r15():
    """The binding staleness criterion after the r19 rotation: the r14
    cohort is re-attested in full this round, so no oracled query's
    last driver attestation may be older than r15 — any r14-or-older
    row must hold a window slot."""
    last = _attestation_history()
    registered = set(plans.queries())
    too_old = sorted(
        q for q, n in last.items() if q in registered and n <= 14
    )
    missing = [q for q in too_old if q not in plans._DRIVER_WINDOW]
    assert not missing, f"r14-or-older rows left out of the window: {missing}"
