"""Collaborative-filtering recommendations: MLlib ALS over implicit
order feedback.

Training-data/analytics extension (the reference — a pandas fraud
scorer — has no recommendation surface): "customers who ordered these
parts also order…" is the classic bipartite factorization workload, and
MLlib's ALS is the distributed workhorse — blocked alternating least
squares, each side's factors solved per block against the broadcast
other side (public algorithm: Hu, Koren, Volinsky 2008 for the
implicit-feedback variant).

Engine-side shape: build the implicit ratings (customer, part,
n_orders) with one aggregation; ALS is seeded for reproducible factors;
``recommend_parts`` emits exploded per-user top-k with deterministic
(score desc, part asc) ordering. Randomized-initialization model ⇒ no
SQL oracle — the driver records a rows-only check; determinism and
ranking sanity are pinned in tests/test_recommend.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def implicit_ratings(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """(customer, part, n_orders) implicit-feedback triples — one
    join + one aggregation, both on fact keys."""
    return (
        lineitem.select("l_orderkey", "l_partkey")
        .join(orders.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("o_custkey").cast("int").alias("user"),
            F.col("l_partkey").cast("int").alias("item"),
        )
        .agg(F.count(F.lit(1)).cast("float").alias("rating"))
    )


def train_als(ratings: DataFrame, rank: int = 8, seed: int = 7):
    """Seeded implicit-feedback ALS fit (MLlib)."""
    from pyspark.ml.recommendation import ALS

    als = ALS(
        userCol="user",
        itemCol="item",
        ratingCol="rating",
        implicitPrefs=True,
        rank=rank,
        maxIter=8,
        regParam=0.1,
        alpha=10.0,
        seed=seed,
        coldStartStrategy="drop",
    )
    return als.fit(ratings)


def recommend_parts(model, k: int = 5) -> DataFrame:
    """Per-user top-k part recommendations, deterministically ordered
    (score desc, item asc within user)."""
    recs = model.recommendForAllUsers(k)
    return (
        recs.select("user", F.explode("recommendations").alias("r"))
        .select(
            F.col("user").cast("long").alias("custkey"),
            F.col("r.item").cast("long").alias("partkey"),
            F.col("r.rating").cast("double").alias("score"),
        )
        .orderBy("custkey", F.desc("score"), "partkey")
    )
