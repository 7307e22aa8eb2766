"""Isolation forest: determinism, partitioning invariance, and the
planted-outlier ranking property."""

from __future__ import annotations

from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.ml.isoforest import (
    score_isolation_forest,
    train_isolation_forest,
)


def _fixture(spark, parts=4):
    rows = [(i, float(i % 50), float((i * 7) % 50)) for i in range(500)]
    rows.append((9999, 100000.0, -4000.0))  # planted far outlier
    return spark.createDataFrame(rows, "id long, a double, b double").repartition(
        parts
    )


def test_deterministic_and_partition_invariant(spark):
    df4, df9 = _fixture(spark, 4), _fixture(spark, 9)
    m1 = train_isolation_forest(df4, ["a", "b"], "id", n_trees=16, sample_size=64)
    m2 = train_isolation_forest(df9, ["a", "b"], "id", n_trees=16, sample_size=64)
    assert m1 == m2  # md5-rank sampling + seeded trees: bit-stable
    s1 = {r["id"]: r["iforest_score"] for r in score_isolation_forest(df4, m1, "id").collect()}
    s2 = {r["id"]: r["iforest_score"] for r in score_isolation_forest(df9, m2, "id").collect()}
    assert s1 == s2


def test_planted_outlier_ranks_first(spark):
    df = _fixture(spark)
    m = train_isolation_forest(df, ["a", "b"], "id", n_trees=32, sample_size=64)
    scored = score_isolation_forest(df, m, "id").collect()
    top = max(scored, key=lambda r: r["iforest_score"])
    assert top["id"] == 9999
    inliers = [r["iforest_score"] for r in scored if r["id"] != 9999]
    assert top["iforest_score"] > max(inliers)
    # and clearly above the bulk: nine-tenths of inliers sit well below
    inliers.sort()
    assert top["iforest_score"] > inliers[len(inliers) * 9 // 10] + 0.05


def test_scores_in_unit_interval(spark):
    df = _fixture(spark)
    m = train_isolation_forest(df, ["a", "b"], "id", n_trees=8, sample_size=32)
    vals = [r["iforest_score"] for r in score_isolation_forest(df, m, "id").collect()]
    assert all(0.0 < v < 1.0 for v in vals)
