"""dyadic_ewma (operators/stats.py): Python reference differential
(exact Fractions), ramp-in NULLs, order determinism."""

from __future__ import annotations

from fractions import Fraction

from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.stats import (
    dyadic_ewma,
)


def _run(spark, rows, depth=4):
    df = spark.createDataFrame(rows, "k string, t long, v long")
    out = dyadic_ewma(df, "k", ["t"], "v", depth=depth).collect()
    return {(r["k"], r["t"]): r["ewma"] for r in out}


def test_matches_exact_fraction_reference(spark):
    vals = [907, 12, 500000, 3, 88, 1048575, 7, 42]
    rows = [("a", t, v) for t, v in enumerate(vals)]
    got = _run(spark, rows, depth=4)
    for t in range(len(vals)):
        if t < 3:
            assert got[("a", t)] is None  # ramp-in: fewer than depth lags
        else:
            exact = sum(
                Fraction(vals[t - j], 2 ** (j + 1)) for j in range(4)
            )
            assert got[("a", t)] == float(exact)  # bitwise: value is dyadic


def test_partitions_independent(spark):
    rows = [("a", t, 100) for t in range(6)] + [("b", t, 200) for t in range(6)]
    got = _run(spark, rows, depth=4)
    # constant series -> ewma = v * (1 - 2^-depth), exactly
    assert got[("a", 5)] == 100 * (1 - 2.0**-4)
    assert got[("b", 5)] == 200 * (1 - 2.0**-4)
    assert got[("b", 2)] is None


def test_any_association_exact(spark):
    # the exactness claim itself: depth-16, near-max cents (< 2^30)
    vals = [2**29 - 1, 1, 2**29 - 7, 3] * 5
    rows = [("x", t, v) for t, v in enumerate(vals)]
    got = _run(spark, rows, depth=16)
    t = len(vals) - 1
    exact = sum(Fraction(vals[t - j], 2 ** (j + 1)) for j in range(16))
    assert got[("x", t)] == float(exact)
    assert float(exact) == float(Fraction(float(exact)))  # representable
