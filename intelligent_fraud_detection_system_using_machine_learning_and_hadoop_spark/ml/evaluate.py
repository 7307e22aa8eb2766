"""Detector evaluation (SURVEY.md §7 step 7).

The reference ships 11,700 labeled rows (``FraudLabel`` in
``data/raw/simulated_subsidy_claims_10k.csv``) that no reference code
ever reads. This closes that gap: standard binary-classification
counts + precision/recall/F1 as a single aggregation pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def evaluate_binary(
    df: DataFrame, label_col: str, positive_pred: F.Column
) -> DataFrame:
    """One-row DataFrame: tp/fp/fn/tn, precision, recall, f1.

    ``positive_pred`` is any boolean column expression (e.g.
    ``col("FraudType") != "Normal"``). Single shuffle-free tree
    aggregation — works unchanged at any scale.
    """
    pred = positive_pred.cast("int")
    lab = F.col(label_col).cast("int")
    agg = df.agg(
        F.sum(pred * lab).alias("tp"),
        F.sum(pred * (1 - lab)).alias("fp"),
        F.sum((1 - pred) * lab).alias("fn"),
        F.sum((1 - pred) * (1 - lab)).alias("tn"),
    )
    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")
    precision = F.when(tp + fp > 0, tp / (tp + fp)).otherwise(F.lit(0.0))
    recall = F.when(tp + fn > 0, tp / (tp + fn)).otherwise(F.lit(0.0))
    return agg.select(
        "tp",
        "fp",
        "fn",
        "tn",
        precision.alias("precision"),
        recall.alias("recall"),
        F.when(
            (tp + fp > 0) & (tp + fn > 0) & (tp > 0),
            2 * (tp / (tp + fp)) * (tp / (tp + fn))
            / ((tp / (tp + fp)) + (tp / (tp + fn))),
        )
        .otherwise(F.lit(0.0))
        .alias("f1"),
    )
