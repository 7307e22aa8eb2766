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


def test_r18_rotation_covers_all_never_attested_oracled():
    """VERDICT r17 item 1: every oracled query with NO driver
    attestation in committed history (35 names pre-r18) must hold an
    r18 window slot. Recompute the never-attested set from history so
    the pin survives the r18 CORRECTNESS file landing (after which the
    set shrinks to queries registered new in r18, which queue for
    r19 per the plans/__init__ docstring)."""
    last = _attestation_history()
    osql = plans.oracle_sql()
    never = sorted(q for q in osql if q not in last)
    missing = [q for q in never if q not in plans._DRIVER_WINDOW]
    # r18-new registrations are allowed to queue (docstring arithmetic);
    # everything never-attested as of r17 history must be in-window.
    pre_r18 = [q for q in missing if q not in plans.R18_NEW_QUERIES]
    assert not pre_r18, f"pre-r18 never-attested left out: {pre_r18}"


def test_r18_window_is_never_attested_plus_oldest_r14():
    """The 15 non-first-attestation slots go to the oldest remaining
    cohort (r14) — alphabetical head, per the plans/__init__ docstring.
    No window slot may be spent on a query attested r15 or later."""
    last = _attestation_history()
    w = plans._DRIVER_WINDOW
    assert w == sorted(w)
    for q in w:
        # every slot: never-attested (not in last) or r14-stale.
        # (after the r18 CORRECTNESS file lands these become 18s)
        assert last.get(q, 0) <= 14 or last.get(q) == 18, (
            f"{q} attested r{last[q]} — too fresh for an r18 slot"
        )


def test_no_oracled_query_staler_than_r14():
    """The binding staleness criterion, carried from r17: no oracled
    query's last driver attestation may be older than r14. (The r17
    verdict asked for r15; its 35+15=50 arithmetic assumed the r14
    cohort was 15 names — it is 50, so 35 r14 rows necessarily remain
    and queue for r19. See plans/__init__.)"""
    last = _attestation_history()
    registered = set(plans.queries())
    too_old = sorted(
        q for q, n in last.items() if q in registered and n <= 13
    )
    missing = [q for q in too_old if q not in plans._DRIVER_WINDOW]
    assert not missing, f"r13-or-older rows left out of the window: {missing}"
