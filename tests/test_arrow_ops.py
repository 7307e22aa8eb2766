"""applyInArrow grouped Gini (operators/arrow_ops.py): Python
reference differential, tie invariance, and the exact big-int
fallback path."""

from __future__ import annotations

import pytest

from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.arrow_ops import (
    grouped_gini,
)


def _ref_gini(values):
    cents = sorted(round(v * 100) for v in values)
    n, s = len(cents), sum(cents)
    w = sum(i * x for i, x in enumerate(cents, 1))
    den = n * s
    return float(2 * w - (n + 1) * s) / float(den) if den else None


def _run(spark, rows):
    df = spark.createDataFrame(rows, "g string, v double")
    return {
        r["g"]: (r["n_rows"], r["sum_cents"], r["gini"])
        for r in grouped_gini(df, "g", "v").collect()
    }


def test_matches_python_reference(spark):
    rows = [("a", float(v)) for v in [1.5, 2.25, 2.25, 10.0, 0.01]] + [
        ("b", float(v)) for v in [5.0, 5.0, 5.0]
    ]
    out = _run(spark, rows)
    assert out["a"][0] == 5 and out["b"][0] == 3
    assert out["a"][2] == pytest.approx(_ref_gini([1.5, 2.25, 2.25, 10.0, 0.01]), abs=0)
    # perfectly equal distribution -> exactly 0
    assert out["b"][2] == 0.0


def test_tie_order_invariance(spark):
    # equal values contribute the same W under any rank order
    a = _run(spark, [("g", v) for v in [3.0, 1.0, 3.0, 1.0]])
    b = _run(spark, [("g", v) for v in [1.0, 3.0, 1.0, 3.0]])
    assert a == b


def test_all_zero_values_yield_null(spark):
    out = _run(spark, [("z", 0.0), ("z", 0.0)])
    assert out["z"] == (2, 0, None)


def test_bigint_fallback_matches_fast_path(spark):
    # values huge enough that n(n+1)/2 * max_cents >= 2**62 triggers
    # the exact Python-int path; compare against the reference formula
    big = 5e16  # cents = 5e18; n=3 -> bound 6*5e18 = 3e19 > 2**62
    rows = [("h", big), ("h", big / 2), ("h", big / 4)]
    out = _run(spark, rows)
    cents = sorted(round(v * 100) for _, v in rows)
    n, s = 3, sum(cents)
    w = sum(i * x for i, x in enumerate(cents, 1))
    assert out["h"][2] == float(2 * w - (n + 1) * s) / float(n * s)
