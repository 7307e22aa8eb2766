"""Scale-curve measurement (VERDICT r9 item 2): run the bench heavies
at two scale factors and report per-query wall time, output rows, and
the time ratio. Times use the bench.py discipline — noop sink, cache
cleared per run, per-query MIN over reps, plus the frozen calibration
probe at each scale so machine contention is visible in the record.

    python tools/scaling_run.py /root/testdata/sf0.1 testdata_sf1 3
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark import (
    get_spark,
)
from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.cache import (
    release_caches,
)
from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.plans import (
    REGISTRY,
)

HEAVIES = [
    "k_core_parts",
    "triangle_count_parts",
    "pagerank_supplier_part",
    "label_propagation_parts",
    "spearman_corr_lineitem",
    "llm_data_pipeline",
    "exact_substring_dup_documents",
    "canonical_dedup_documents",
    "quantile_normalize_events",
    # round-12 additions (VERDICT r11 item 6): the r11 heavies that
    # had never been run past sf0.1, the rank-stat family (the next
    # Spearman-style overflow would surface one scale step up), and
    # the new r12 operators
    "shortest_paths_parts",
    "hits_supplier_part",
    "mann_whitney_events",
    "ks_test_events",
    "scc_parts",
    "fraud_risk_report_events",
    # late-r12 additions: the new operators added after the first r12
    # scaling pass
    "k_truss_parts",
    "collusion_pairs_customers",
    "wilcoxon_spend_shift_events",
    "lexical_diversity_documents",
    "structuring_orders",
    "temporal_reach_parts",
    "holt_trend_events",
    # round-14 additions (VERDICT r13 item 8): the r13-new operators
    # that had no sf1 point yet, plus the LSH collusion leg now that
    # the planted cohort makes its curve carry recall
    "streaming_fraud_risk_report",
    "mahalanobis_peer_outliers_customers",
    "collusion_hub_report_customers",
    "collusion_pairs_lsh_customers",
    # round-15 additions (VERDICT r14 item 5): the r14-new operators
    # with no sf1 row yet, plus the rings-over-LSH scale path (item 2)
    # which must carry a curve at the scales the exact leg cannot run
    "split_transactions_orders",
    "fdr_peer_alerts_customers",
    "conformal_anomaly_events",
    "rake_keywords_documents",
    "ztest_returns_by_priority",
    "streaming_split_transactions",
    "collusion_rings_lsh_customers",
    # round-15b additions: the operators/queries added within round 15
    # itself, so their first sf1 rows land in the same round's
    # SCALING section instead of waiting for the next verdict
    "skyline_orders",
    "skyline_supplier_profile",
    "key_islands_orders",
    "round_amount_bias_orders",
    "weekend_rate_poisson_events",
    "rfm_segments_customers",
    "conformal_fdr_alerts_events",
    "streaming_round_bias_orders",
    "benford_first2_orders",
    "rolling_wau_events",
    "ljung_box_events",
    "pacf_events",
    "streaming_rolling_wau",
    "betweenness_parts",
    "harmonic_closeness_parts",
    "duplicate_charges_events",
    "target_encode_orders",
    "stickiness_events",
    "new_vs_returning_events",
    "mmr_topk_embeddings",
    # round-16 additions: the r16-new operators plus the two r15 rows
    # the r15b pass missed (t-closeness, the new-vs-returning twin)
    "t_closeness_customers",
    "streaming_new_vs_returning",
    "privacy_gate_customers",
    "holt_winters_events",
    "benford_drift_orders",
    "last_digits_orders",
    "hhi_events",
    "mmr_topk_pooled_embeddings",
    "streaming_duplicate_charges",
    "streaming_last_digits",
    "pettitt_events",
    "mann_kendall_events",
    "streaming_pettitt",
    "streaming_mann_kendall",
    # round-17 additions: the Hirsch-Slack seasonal MK + cross-entity
    # duplicate screens and their streaming twins (VERDICT r16 item 6)
    "seasonal_mann_kendall_events",
    "cross_entity_duplicates_events",
    "streaming_seasonal_mann_kendall",
    "streaming_cross_entity_duplicates",
    # round-18 additions: the offset-grid cross-entity variant, the
    # impossible-velocity and spending-mix drift screens (VERDICT r17
    # items 3/6), and the re-keyed LSH near-dup legs (item 2 — their
    # Spark-side hash family changed, so they need fresh curves)
    "cross_entity_duplicates_offset_events",
    "impossible_velocity_events",
    "spending_mix_drift_events",
    "minhash_near_dup",
    "simhash_near_dup",
    "streaming_impossible_velocity",
    "streaming_cross_entity_duplicates_offset",
    "streaming_spending_mix_drift",
]


def probe(spark, sf_dir: str) -> float:
    t0 = time.perf_counter()
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    li.groupBy("l_returnflag").count().write.format("noop").mode(
        "overwrite"
    ).save()
    return time.perf_counter() - t0


def run_once(spark, name: str, sf_dir: str, want_rows: bool):
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    df = REGISTRY[name].builder(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    rows = df.count() if want_rows else None  # untimed, first rep only
    release_caches()
    return dt, rows


def main() -> None:
    lo = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    hi = sys.argv[2] if len(sys.argv) > 2 else "testdata_sf1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    only = set(sys.argv[4:])  # optional: run only these HEAVIES names
    heavies = [n for n in HEAVIES if not only or n in only]
    spark = get_spark("ifds-scaling")
    spark.range(1000).selectExpr("sum(id)").collect()

    out: dict = {"lo": lo, "hi": hi, "reps": reps, "queries": {}}
    for sf_key, sf_dir in (("lo", lo), ("hi", hi)):
        out[f"probe_{sf_key}"] = round(min(probe(spark, sf_dir) for _ in range(5)), 3)
    for name in heavies:
        rec = {}
        for sf_key, sf_dir in (("lo", lo), ("hi", hi)):
            times, rows = [], None
            for i in range(reps):
                dt, r = run_once(spark, name, sf_dir, want_rows=(i == 0))
                if r is not None:
                    rows = r
                times.append(dt)
                print(
                    json.dumps(
                        {"q": name, "sf": sf_key, "sec": round(dt, 2), "rows": rows}
                    ),
                    flush=True,
                )
            rec[f"sec_{sf_key}"] = round(min(times), 2)
            rec[f"rows_{sf_key}"] = rows
        rec["ratio"] = round(rec["sec_hi"] / rec["sec_lo"], 1)
        out["queries"][name] = rec
    print("RESULT " + json.dumps(out))


if __name__ == "__main__":
    main()
