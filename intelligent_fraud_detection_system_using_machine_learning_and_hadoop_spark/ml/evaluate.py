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


def exact_auc(
    df: DataFrame, score_col: str, label_col: str
) -> DataFrame:
    """Exact tie-adjusted ROC-AUC, computed distributedly — the
    rank-statistic (Mann-Whitney U) formulation:

        AUC = (Σ_{positives} avg_rank(score) − n⁺(n⁺+1)/2) / (n⁺·n⁻)

    with ``avg_rank`` the tie-averaged rank over ALL scores. Ranks come
    from the doubled-average-rank machinery (operators/stats.py::
    avg_rank2 — value-level dedup + equi-depth-bucketed prefix sums,
    never a single-partition global sort, unlike
    ``BinaryClassificationEvaluator``'s sortByKey path), so with
    r2 = 2·avg_rank every intermediate is an exact BIGINT:

        AUC = (Σ_{pos} r2 − 2·n⁺·(n⁺+1)/2) / (2·n⁺·n⁻)
            = (Σ_{pos} r2 − n⁺·(n⁺+1)) / (2·n⁺·n⁻)

    — one IEEE division at the end, so any engine (the DuckDB
    SQL-window oracle included) reproduces the double bitwise.
    Degenerate single-class inputs return NULL (AUC undefined).

    Returns one row: (n, n_pos, n_neg, auc). Width bound: Σ r2 ≤
    2n², exact in BIGINT to n ≈ 2·10⁹ rows (beyond: decimal(38,0),
    same discipline as spearman_pairs)."""
    from ..operators.stats import avg_rank2

    keyed = df.select(
        F.col(score_col).cast("double").alias("_s"),
        F.col(label_col).cast("int").alias("_y"),
    ).where(F.col("_s").isNotNull() & F.col("_y").isNotNull())
    r2 = avg_rank2(keyed, "_s").toDF("_s", "_r2")
    m = keyed.join(r2, "_s").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("_y").cast("long").alias("n_pos"),
        F.sum(F.col("_y") * F.col("_r2")).cast("long").alias("_pos_r2"),
    )
    n_pos, n = F.col("n_pos"), F.col("n")
    n_neg = (n - n_pos).alias("n_neg")
    return m.select(
        "n",
        "n_pos",
        n_neg,
        F.when(
            (n_pos > 0) & (n - n_pos > 0),
            (F.col("_pos_r2") - n_pos * (n_pos + 1)).cast("double")
            / (F.lit(2) * n_pos * (n - n_pos)).cast("double"),
        ).alias("auc"),
    )
