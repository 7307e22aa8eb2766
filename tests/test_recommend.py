"""ALS recommendations: seeded determinism and ranking sanity on a
synthetic taste-cluster fixture."""

from __future__ import annotations

from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.ml.recommend import (
    recommend_parts,
    train_als,
)


def _taste_fixture(spark):
    # two disjoint taste clusters: users 0-9 x items 0-9, users 10-19 x
    # items 100-109; a recommender must not cross clusters at the top
    rows = []
    for u in range(10):
        for i in range(10):
            if (u + i) % 3:
                rows.append((u, i, 3.0))
    for u in range(10, 20):
        for i in range(100, 110):
            if (u + i) % 3:
                rows.append((u, i, 3.0))
    return spark.createDataFrame(rows, "user int, item int, rating float")


def test_recommendations_respect_taste_clusters(spark):
    r = _taste_fixture(spark)
    model = train_als(r, rank=4, seed=7)
    recs = recommend_parts(model, 3).collect()
    by_user = {}
    for row in recs:
        by_user.setdefault(row["custkey"], []).append(row["partkey"])
    assert set(by_user) == set(range(20))
    for u, items in by_user.items():
        assert len(items) == 3
        if u < 10:
            assert all(i < 100 for i in items), (u, items)
        else:
            assert all(i >= 100 for i in items), (u, items)


def test_seeded_determinism(spark):
    r = _taste_fixture(spark)
    a = recommend_parts(train_als(r, rank=4, seed=7), 3).collect()
    b = recommend_parts(train_als(r, rank=4, seed=7), 3).collect()
    assert [tuple(x) for x in a] == [tuple(x) for x in b]
