"""grouped_ols (operators/stats.py): numpy polyfit differential,
degenerate groups, exactness of moments."""

from __future__ import annotations

import numpy as np
import pytest

from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.stats import (
    grouped_ols,
)


def _run(spark, rows):
    df = spark.createDataFrame(rows, "g string, x long, y long")
    return {
        r["g"]: (r["n_rows"], r["slope"], r["intercept"])
        for r in grouped_ols(df, "g", "x", "y").collect()
    }


def test_matches_numpy_lstsq(spark):
    rng = np.random.default_rng(7)
    rows = []
    for g in ("a", "b"):
        xs = rng.integers(0, 10000, 50)
        ys = rng.integers(0, 5_000_000, 50)
        rows += [(g, int(x), int(y)) for x, y in zip(xs, ys)]
    out = _run(spark, rows)
    for g in ("a", "b"):
        xs = np.array([x for gg, x, _ in rows if gg == g], dtype=float)
        ys = np.array([y for gg, _, y in rows if gg == g], dtype=float)
        slope, intercept = np.polyfit(xs, ys, 1)
        assert out[g][0] == 50
        assert out[g][1] == pytest.approx(slope, rel=1e-9)
        assert out[g][2] == pytest.approx(intercept, rel=1e-9)


def test_exact_line_recovered(spark):
    # y = 3x + 7 exactly -> slope/intercept exact doubles
    rows = [("l", x, 3 * x + 7) for x in range(0, 100, 3)]
    out = _run(spark, rows)
    assert out["l"][1] == 3.0 and out["l"][2] == 7.0


def test_constant_x_degenerate_null(spark):
    out = _run(spark, [("c", 5, 1), ("c", 5, 2), ("c", 5, 9)])
    assert out["c"] == (3, None, None)


def test_single_point_null(spark):
    out = _run(spark, [("s", 1, 10)])
    assert out["s"] == (1, None, None)
