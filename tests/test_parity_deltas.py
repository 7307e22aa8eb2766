"""Dedicated tests for the semantic parity traps SURVEY.md §2/§7 calls
out — each delta between the reference's sklearn/numpy semantics and
our Spark/MLlib implementation is either reproduced exactly or
documented with its precise factor."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_stddev_pop_matches_numpy_ddof0(spark):
    """A6/M6: the reference thresholds with numpy std (population,
    ddof=0); our batch_threshold uses stddev_pop. Exact match."""
    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.ml.scoring import (
        batch_threshold,
    )

    vals = [1.5, 2.25, 3.0, 4.75, 8.0, 13.25, 2.0, 2.5]
    df = spark.createDataFrame(
        [(float(v),) for v in vals], "ReconstructionError double"
    )
    want = float(np.mean(vals)) + 2.0 * float(np.std(vals))  # ddof=0
    got = batch_threshold(df)
    assert math.isclose(got, want, rel_tol=1e-12), (got, want)


def test_spark_stddev_default_is_sample_not_population(spark):
    """The trap itself: Spark's default stddev is the SAMPLE std
    (ddof=1) — using it would inflate the reference's threshold by
    sqrt(n/(n-1)). Pin both values so the distinction stays visible."""
    vals = [1.0, 2.0, 3.0, 4.0, 5.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    row = df.agg(
        F.stddev("x").alias("sample"), F.stddev_pop("x").alias("pop")
    ).collect()[0]
    assert math.isclose(row["pop"], float(np.std(vals)), rel_tol=1e-12)
    assert math.isclose(row["sample"], float(np.std(vals, ddof=1)), rel_tol=1e-12)
    assert math.isclose(
        row["sample"] / row["pop"], math.sqrt(5 / 4), rel_tol=1e-12
    )


def test_mllib_scaler_sample_std_delta_is_exactly_sqrt_n_over_n1(spark):
    """M2: sklearn StandardScaler divides by the population std, MLlib
    by the sample std — scaled values differ by exactly sqrt(n/(n-1)).
    Verify the factor on real output (withMean=True centers first)."""
    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.ml.preprocess import (
        fit_preprocessor,
    )
    from pyspark.ml.functions import vector_to_array

    rng = np.random.RandomState(7)
    vals = rng.uniform(10, 500, size=40)
    rows = [(int(i), float(v), "A") for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id long, amount double, cat string")
    _, feats = fit_preprocessor(df, numeric_cols=["amount"], categorical_cols=["cat"])
    got = {
        r["id"]: r["f"][0]
        for r in feats.select(
            "id", vector_to_array(F.col("features")).alias("f")
        ).collect()
    }
    n = len(vals)
    sklearn_style = (vals - vals.mean()) / vals.std()  # ddof=0
    for i, v in enumerate(sklearn_style):
        # mllib = sklearn / sqrt(n/(n-1))
        assert math.isclose(
            got[i], v / math.sqrt(n / (n - 1)), rel_tol=1e-9
        ), (i, got[i], v)


def test_onehot_unknown_category_gets_overflow_slot(spark):
    """M1: sklearn handle_unknown='ignore' emits all-zeros; MLlib
    handleInvalid='keep' adds one overflow slot (feature dim is
    n_categories + 1). Pin the documented behavior: unknowns land in
    the extra slot, known categories never touch it."""
    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.ml.preprocess import (
        fit_preprocessor,
    )
    from pyspark.ml.functions import vector_to_array

    train = spark.createDataFrame(
        [(1, 1.0, "A"), (2, 2.0, "B"), (3, 3.0, "A")],
        "id long, amount double, cat string",
    )
    model, _ = fit_preprocessor(
        train, numeric_cols=["amount"], categorical_cols=["cat"]
    )
    test = spark.createDataFrame(
        [(10, 1.0, "A"), (11, 1.0, "ZZZ")], "id long, amount double, cat string"
    )
    out = {
        r["id"]: r["f"]
        for r in model.transform(test)
        .select("id", vector_to_array(F.col("features")).alias("f"))
        .collect()
    }
    # layout: [amount, cat_A, cat_B, indexer_unknown, ohe_invalid]
    # (alphabetAsc label order; StringIndexer keep adds the unknown
    # index, OneHotEncoder keep adds its own invalid slot that never
    # fires when the indexer already kept the row → dim = n_cat + 2).
    # The scaler then centers every slot, so "fired" shows as the
    # strictly-largest category slot, and the never-fired ohe_invalid
    # slot has zero variance → identically 0 after scaling.
    assert len(out[10]) == 5
    known, unknown = out[10][1:], out[11][1:]
    assert max(range(4), key=lambda i: known[i]) == 0      # 'A' slot
    assert max(range(4), key=lambda i: unknown[i]) == 2    # overflow slot
    assert known[3] == 0.0 == unknown[3]                   # ohe_invalid inert


def test_pandas_quantile_parity_on_ties_and_interpolation(spark):
    """A4: pandas interpolates between order statistics; so must
    exact_percentile — including duplicate values and non-integral h."""
    import pandas as pd

    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.functions.exprs import (
        exact_percentile,
    )

    vals = [5.0, 1.0, 1.0, 2.0, 9.0, 7.0, 7.0, 7.0, 3.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    s = pd.Series(vals)
    for q in (0.0, 0.25, 0.5, 0.77, 0.99, 1.0):
        assert math.isclose(
            exact_percentile(df, "x", q), float(s.quantile(q)), rel_tol=1e-12
        ), q
