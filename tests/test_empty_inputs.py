"""Empty-input robustness: every round-8 operator must degrade to an
empty (or zero-census) result, never a cryptic runtime error — the
behavior a scheduled pipeline hits on a quiet day."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def empties(spark):
    return {
        "s": spark.createDataFrame([], "s string"),
        "e": spark.createDataFrame([], "id_a long, id_b long"),
        "gv": spark.createDataFrame([], "g string, v double"),
        "iv": spark.createDataFrame([], "id long, v double"),
        "ab": spark.createDataFrame([], "a double, b double"),
        "ev": spark.createDataFrame(
            [], "event_id long, user_id long, ts timestamp, "
                "event_type string, value double"
        ),
        "bk": spark.createDataFrame([], "basket_id long, item string"),
    }


def test_empty_inputs_degrade_gracefully(spark, empties):
    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.cooccur import (
        association_rules,
    )
    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.funnel import (
        cohort_retention,
        event_transitions,
        linear_attribution,
    )
    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.fuzzy import (
        edit_distance_join,
    )
    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.graph import (
        connected_components,
        k_core,
        triangle_stats,
    )
    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.stats import (
        chi_square_independence,
        equi_depth_histogram,
        spearman_pairs,
        winsorized_stats,
    )

    em = empties
    assert edit_distance_join(em["s"], 2, "s").count() == 0
    assert k_core(em["e"], 2).count() == 0
    assert connected_components(em["e"]).count() == 0
    assert equi_depth_histogram(em["iv"], "v", "id", 4).count() == 0
    assert winsorized_stats(em["gv"], "g", "v").count() == 0
    assert linear_attribution(em["ev"], "purchase", ["view"]).count() == 0
    assert cohort_retention(em["ev"]).count() == 0
    assert event_transitions(em["ev"]).count() == 0
    assert association_rules(em["bk"]).count() == 0
    # census-style ops return a zero row, not an error
    tri = triangle_stats(em["e"]).first()
    assert (tri["n_nodes"], tri["n_edges"], tri["n_triangles"]) == (0, 0, 0)
    assert tri["global_clustering"] is None
    assert spearman_pairs(em["ab"], ["a", "b"]).count() == 1  # NaN rho row
    assert chi_square_independence(em["gv"], "g", "v").count() == 1


def test_round11_operators_empty_inputs(spark, empties):
    """Round-11 operators on a quiet day: empty or all-NULL one-row
    results, never a runtime error (the r11 hypothesis sweep showed
    ANSI mode turns degenerate divisions into hard errors — this pins
    the guards)."""
    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.changepoint import (
        longest_streaks,
    )
    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.fraud_stats import (
        benford_profile,
        interevent_burstiness,
        velocity_flags,
    )
    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.graph import (
        hits_quantized,
    )
    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.stats import (
        acf_daily,
        kruskal_wallis,
        ks_two_sample,
        lorenz_concentration,
        mann_whitney,
        theil_sen_daily,
    )

    em = empties
    assert benford_profile(em["gv"], "v", "g").count() == 0
    assert velocity_flags(em["ev"]).count() == 0
    assert interevent_burstiness(em["ev"]).count() == 0
    assert longest_streaks(em["ev"]).count() == 0
    assert acf_daily(em["ev"]).count() == 0
    assert theil_sen_daily(em["ev"]).count() == 0
    assert hits_quantized(em["e"], src="id_a", dst="id_b").count() == 0
    assert lorenz_concentration(em["iv"], "id", "v", 4).count() == 0
    # one-row census statistics: all-NULL measures, not errors
    ks = ks_two_sample(em["gv"], "g", "v", "a", "b").collect()
    assert len(ks) == 1 and ks[0]["d_stat"] is None
    mw = mann_whitney(em["gv"], "g", "v", "a", "b").collect()
    assert len(mw) == 1 and mw[0]["z"] is None and mw[0]["u_a"] is None
    kw = kruskal_wallis(em["gv"], "g", "v").collect()
    assert len(kw) == 1 and kw[0]["h"] is None


def test_round15_operators_empty_inputs(spark, empties):
    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.fraud_stats import (
        benford_first2_profile,
        round_amount_bias,
    )
    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.graph import (
        betweenness_sampled,
        harmonic_closeness_sampled,
    )
    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.sequences import (
        key_islands,
        trailing_distinct_count,
    )
    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.skyline import (
        skyline_2d_max,
        skyline_nd_max,
    )
    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.stats import (
        loo_target_encode,
        pacf_daily,
        ljung_box_daily,
    )

    gv, iv, e, ev = empties["gv"], empties["iv"], empties["e"], empties["ev"]
    xy = spark.createDataFrame([], "x long, y long")
    ud = spark.createDataFrame([], "u long, d long")
    assert skyline_2d_max(xy, "x", "y").count() == 0
    assert skyline_nd_max(xy, ["x", "y"]).count() == 0
    assert key_islands(iv, "id").count() == 0
    assert trailing_distinct_count(ud, "u", "d").count() == 0
    assert round_amount_bias(gv, "g", "v").count() == 0
    assert benford_first2_profile(gv, "v", "g").count() == 0
    assert betweenness_sampled(e).count() == 0
    assert harmonic_closeness_sampled(e).count() == 0
    assert pacf_daily(ev).count() == 0
    assert ljung_box_daily(ev).count() == 0
    assert loo_target_encode(iv, "id", "v", "id").count() == 0


def test_round16_operators_empty_inputs(spark, empties):
    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.fraud_stats import (
        benford_first2_drift,
        hhi_concentration,
        last_digits_profile,
    )
    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.quality_checks import (
        privacy_gate_report,
    )
    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.similarity import (
        mmr_topk_pooled,
    )
    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.stats import (
        holt_winters_additive,
    )

    gv, ev = empties["gv"], empties["ev"]
    qb = spark.createDataFrame([], "q string, band long")
    tsv = spark.createDataFrame([], "v double, ts timestamp")
    ikx = spark.createDataFrame([], "i long, k long, x double")
    vec = spark.createDataFrame([], "vec_id long, embedding array<double>")
    qv = spark.createDataFrame([([1.0, 0.0],)], "embedding array<double>")
    assert privacy_gate_report(qb, ["q"], "band").count() == 0
    assert hhi_concentration(ev, "user_id", "event_type").count() == 0
    assert last_digits_profile(gv, "v", "g").count() == 0
    assert benford_first2_drift(tsv, "v", "ts").count() == 0
    assert holt_winters_additive(ikx, "k", ["i"], "x").count() == 0
    assert mmr_topk_pooled(vec, qv, k=3).count() == 0
