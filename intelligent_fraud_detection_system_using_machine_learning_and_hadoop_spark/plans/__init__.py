"""Query registry assembly + driver-facing registration order.

The driver's correctness gate attests the FIRST 50 registered queries
(observed in rounds 1-2: CORRECTNESS_r0*.json hold exactly the first 50
in registration order), so registration order is part of the
verification contract. ``_DRIVER_WINDOW`` pins the window explicitly.

Round-12 rotation (VERDICT r11 "Next round" item 1 + the playbook's
least-recently-attested discipline): the window LEADS with the
thirteen-query round-8 tail — the oldest driver attestations in the
registry (``shipping_priority`` … ``window_funcs_orders``, last
attested r8) — then the twenty-one NEW round-12 oracled queries
(``scc_parts`` — directed strongly connected components, the
circular-trading-ring primitive, exact recursive-closure oracle;
``fraud_risk_report_events`` — the composed velocity + burstiness +
Benford per-entity risk pipeline with a full-chain value oracle;
``streaming_velocity_flags`` — the stateful trailing-window screen
sharing the batch RANGE-frame oracle; ``temporal_reach_parts`` —
time-respecting earliest-arrival taint tracing with an unrolled
min-combine oracle; ``structuring_orders`` — the smurfing-band +
round-number amount-pattern screen with exact cross-multiplied rate
flags; ``dormancy_reactivation_orders`` — the silent-then-big-spend
account-takeover screen; ``collusion_pairs_customers`` — top-k
shared-counterparty Jaccard pairs, the shell-network tell;
``lexical_diversity_documents`` — exact-integer Simpson/TTR/hapax
vocabulary-richness profile, no-transcendental entropy analog;
``k_truss_parts`` — edge-level triangle-support peeling, the
relationship-density fraud-ring primitive, 7 unrolled CTE-triple
rounds; ``wilcoxon_spend_shift_events`` — exact paired signed-rank
behavior-change test, bitwise z; ``holt_trend_events`` — Holt
double exponential smoothing with exact dyadic impulse-response
weights and pinned-association parity;
``streaming_benford_events`` — the Benford screen as a live stream,
additive digit-count fold ≡ the batch aggregation bit-for-bit;
``weighted_quantiles_lineitem`` — exact integer-weighted quantiles
via pure-BIGINT cross-multiplied targets;
``peer_outlier_customers`` — leave-one-out peer-group z screen on
exact moments; ``graph_risk_profile_parts`` — the composed
SCC+core+truss structural risk report, one spliced WITH RECURSIVE
twin; ``k_anonymity_customers`` — the k-anonymity / l-diversity
privacy gate for training-data exports;
``streaming_structuring_orders`` — the structuring screen live,
additive count-triple fold sharing the batch oracle;
``streaming_dormancy_orders`` — the dormancy screen live, one-long
state per entity, drained ≡ the batch lag row for row;
``mahalanobis_outliers_customers`` — exact 2-D joint-distance
outliers, closed-form covariance inverse, bitwise;
``collusion_rings_customers`` — Jaccard-thresholded suspect pairs →
connected components, the shell-NETWORK form of the pair screen;
``streaming_peer_outlier_orders`` — the peer screen live, additive
moment folds + LOO finish sharing the batch oracle), then
the round-9 cohort (now the oldest bulk, last attested r9)
alphabetically — 16 of its 50 queries fit. The thirty-four-query r9
tail (``dedup_source_flow_documents``,
``domain_stats_documents``, ``drift_report_orders``,
``equi_depth_hist_orders``,
``event_transitions``, ``expectations_orders``,
``fuzzy_join_part_names``,
``html_extract_documents``,
``incremental_agg_orders``,
``incremental_pipeline_documents``,
``label_centroids_embeddings``, ``large_volume_customers``,
``pmi_cooccurrence_documents``,
``pricing_summary``,
``quantile_normalize_events``, ``quota_sample_documents``,
``resample_locf_events``, ``revenue_by_nation``,
``seasonal_decompose_events``,
``seasonal_decompose_grouped``, ``source_overlap_matrix``,
``spearman_corr_lineitem``, ``streaming_attribution``,
``streaming_html_extract``, ``streaming_incremental_agg``,
``triangle_count_parts``, ``trimmed_mean_orders``,
``udtf_sentences_documents``, ``url_canonicalize_documents``,
``value_histogram_events``, ``web_corpus_pipeline``,
``weighted_sample_documents``, ``winsorize_orders_by_status``,
``zonemap_prune_orders``) keeps its r9 rows — within the verdict's "no
driver row older than r9" contract — and leads the r13 rotation.
After this round no oracled query's last attestation is older than r9.
Queries outside the window keep pytest + local-gate
(tools/check_oracle.py) coverage; registry content is unchanged — only
iteration order moves.
"""

from .catalog import REGISTRY, queries, oracle_sql, bench_queries
from . import data_ops  # noqa: F401  (registers data-pipeline queries)
from . import func_ops  # noqa: F401  (registers scalar-function families)
from . import join_ops  # noqa: F401  (registers as-of/range/interval joins)
from . import ml_ops  # noqa: F401  (registers ML + streaming queries)

#: First 50 = the driver-attested window.
_DRIVER_WINDOW = [
    # --- the r8 tail: oldest attestations, leads per VERDICT r11 item 1 ---
    "shipping_priority",
    "stats_moments_by_status",
    "status_priority_counts",
    "streaming_distinct_pairs",
    "streaming_incremental_dedup",
    "streaming_rolling_anomaly",
    "streaming_user_stats",
    "string_funcs_part",
    "suppliers_by_region",
    "temporal_funcs_orders",
    "topk_orders",
    "window_dist_orders",
    "window_funcs_orders",
    # --- new round-12 oracled queries (never attested) ---
    "scc_parts",
    "fraud_risk_report_events",
    "streaming_velocity_flags",
    "temporal_reach_parts",
    "structuring_orders",
    "dormancy_reactivation_orders",
    "collusion_pairs_customers",
    "lexical_diversity_documents",
    "k_truss_parts",
    "wilcoxon_spend_shift_events",
    "holt_trend_events",
    "streaming_benford_events",
    "weighted_quantiles_lineitem",
    "peer_outlier_customers",
    "graph_risk_profile_parts",
    "k_anonymity_customers",
    "streaming_structuring_orders",
    "streaming_dormancy_orders",
    "mahalanobis_outliers_customers",
    "collusion_rings_customers",
    "streaming_peer_outlier_orders",
    # --- the r9 cohort (now oldest bulk), alphabetically; its
    # 16-query tail keeps r9 rows and leads the r13 rotation ---
    "analytics_pipeline_events",
    "asof_click_purchase",
    "association_rules_parts",
    "attribution_linear_events",
    "auc_orders",
    "bigram_fluency_documents",
    "bm25_topk_documents",
    "canonical_dedup_documents",
    "chi_square_orders",
    "chunk_documents_sliding",
    "cogroup_purchase_error_stats",
    "cohort_retention_events",
    "corpus_curation",
    "corpus_snapshot_diff",
    "cust_order_histogram",
    "decontaminate_train_docs",
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
