"""Skew operators (operators/skew.py): salted decompositions must be
EXACTLY equivalent to their plain forms on skewed fixtures."""

from __future__ import annotations

from pyspark.sql import functions as F

from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.skew import (
    salted_distinct_count,
    salted_join,
    top_keys,
)


def _skewed_fixture(spark):
    # key 0 is hot: 5000 rows, 700 distinct values; keys 1-20 are tiny
    rows = [(0, i % 700) for i in range(5000)]
    rows += [(k, v) for k in range(1, 21) for v in range(k)]
    return spark.createDataFrame(rows, "k long, v long")


def test_salted_distinct_count_matches_plain(spark):
    df = _skewed_fixture(spark)
    plain = {
        r["k"]: r["n"]
        for r in df.groupBy("k").agg(F.countDistinct("v").alias("n")).collect()
    }
    for n_salts in (1, 4, 16):
        salted = {
            r["k"]: r["n_distinct"]
            for r in salted_distinct_count(df, ["k"], "v", n_salts).collect()
        }
        assert salted == plain
    assert plain[0] == 700


def test_salted_join_matches_plain_on_skewed_fixture(spark):
    left = _skewed_fixture(spark).withColumnRenamed("v", "payload")
    right = spark.createDataFrame(
        [(k, f"dim{k}") for k in range(0, 15)], "k long, name string"
    )
    for how in ("inner", "left"):
        plain = sorted(
            (r["k"], r["payload"], r["name"])
            for r in left.join(right, "k", how).collect()
        )
        salted = sorted(
            (r["k"], r["payload"], r["name"])
            for r in salted_join(left, right, "k", how=how, salt=8).collect()
        )
        assert salted == plain


def test_top_keys_finds_the_hot_key(spark):
    df = _skewed_fixture(spark)
    top = top_keys(df, ["k"], k=3).collect()
    assert top[0]["k"] == 0 and top[0]["n_rows"] == 5000
