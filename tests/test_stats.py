"""Distributed exact Spearman: differential vs a plain-Python
reference computing the identical integer moments + IEEE float ops."""

from __future__ import annotations

import math
import random

from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.stats import (
    avg_rank2,
    spearman_pairs,
)


def _r2(vals):
    out = {}
    sv = sorted(vals)
    for v in set(vals):
        lt = sum(1 for x in sv if x < v)
        eq = sum(1 for x in sv if x == v)
        out[v] = 2 * lt + eq + 1
    return out


def _spearman(xs, ys):
    n = len(xs)
    rx, ry = _r2(xs), _r2(ys)
    sxx = sum(rx[x] * rx[x] for x in xs) - n * (n + 1) * (n + 1)
    syy = sum(ry[y] * ry[y] for y in ys) - n * (n + 1) * (n + 1)
    sxy = sum(rx[x] * ry[y] for x, y in zip(xs, ys)) - n * (n + 1) * (n + 1)
    return float(sxy) / math.sqrt(float(sxx) * float(syy))


def test_avg_rank2_ties(spark):
    vals = [3.0, 1.0, 3.0, 7.0, 1.0, 1.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = {r["x"]: r["r2"] for r in avg_rank2(df, "x").collect()}
    assert got == _r2(vals)


def test_spearman_monotone(spark):
    xs = list(range(1, 51))
    ys = [x * x for x in xs]  # monotone -> rho exactly 1
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(xs, ys)], "a double, b double"
    )
    row = spearman_pairs(df, ["a", "b"]).first()
    assert row["rho"] == 1.0 and row["n"] == 50


def test_spearman_random_with_ties_bitexact(spark):
    rng = random.Random(5)
    xs = [float(rng.randrange(10)) for _ in range(300)]
    ys = [x + rng.randrange(5) for x in xs]
    df = spark.createDataFrame(list(zip(xs, ys)), "a double, b double")
    row = spearman_pairs(df, ["a", "b"]).first()
    assert row["rho"] == _spearman(xs, ys)  # bit-exact, not approx


def test_spearman_anticorrelated(spark):
    xs = [float(i) for i in range(40)]
    ys = [-x for x in xs]
    df = spark.createDataFrame(list(zip(xs, ys)), "a double, b double")
    assert spearman_pairs(df, ["a", "b"]).first()["rho"] == -1.0
