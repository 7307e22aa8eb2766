"""Anomaly scoring (SURVEY.md §2.10 M5–M7, §2.8 U2).

Two scorers over the preprocessed ``features`` vector:

* **PCA reconstruction error** (Spark-native primary): project the
  standardized features onto the top-k principal subspace; the anomaly
  score is the squared residual norm ‖x‖² − ‖Wᵀx‖² (W orthonormal,
  features already mean-centered by the scaler). Same "distance from
  the normal subspace" semantics as the reference's autoencoder
  (SURVEY.md §7 step 5) with zero Python in the row path.
* **Autoencoder** (reference parity): see ``autoencoder.py`` — scored
  through an Arrow-batched ``mapInPandas`` with driver-broadcast
  weights (the reference's U2 torch forward, ``run_pipeline.py:62-64``).

Thresholding preserves the reference's **batch-relative** semantics
(M6, ``run_pipeline.py:66-67``): mean + 2·population-std of the current
batch's errors, recomputed per scoring run — a row's verdict depends on
its batch, by design. ``stddev_pop`` matches numpy's ddof=0
(SURVEY.md A6 parity note).
"""

from __future__ import annotations

from pyspark.ml.feature import PCA, PCAModel
from pyspark.ml.functions import vector_to_array
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _norm_sq(arr_col) -> Column:
    return F.aggregate(arr_col, F.lit(0.0), lambda a, v: a + v * v)


def fit_pca(features_df: DataFrame, k: int = 8) -> PCAModel:
    """Fit top-k PCA; k is clamped to dim−1 so there is always a
    residual subspace (k = dim reconstructs exactly → all-zero scores)."""
    dim = features_df.select("features").head()["features"].size
    k = max(1, min(k, dim - 1))
    return PCA(k=k, inputCol="features", outputCol="pca_proj").fit(features_df)


def pca_reconstruction_scores(
    features_df: DataFrame, model: PCAModel | None = None, k: int = 8
) -> DataFrame:
    """Append ``ReconstructionError``: squared residual of the top-k
    PCA projection. Columnar end-to-end — vectors become arrays and the
    norms are JVM-side folds, so the scoring pass is a pure map."""
    model = model or fit_pca(features_df, k)
    projected = model.transform(features_df)
    x = vector_to_array(F.col("features"))
    p = vector_to_array(F.col("pca_proj"))
    return projected.withColumn(
        "ReconstructionError", F.greatest(_norm_sq(x) - _norm_sq(p), F.lit(0.0))
    )


def batch_threshold_df(
    scored: DataFrame, err_col: str = "ReconstructionError", sigmas: float = 2.0
) -> DataFrame:
    """Reference M6 as a LAZY 1-row DataFrame (column ``__ml_thr``):
    mean + 2·population-std of the current batch's errors. Designed for
    ``scored.crossJoin(F.broadcast(...))`` — the scalar barrier stays
    inside one Catalyst plan instead of an eager ``.collect()``."""
    return scored.agg(
        (
            F.mean(err_col)
            + F.lit(sigmas) * F.coalesce(F.stddev_pop(err_col), F.lit(0.0))
        ).alias("__ml_thr")
    )


def batch_threshold(
    scored: DataFrame, err_col: str = "ReconstructionError", sigmas: float = 2.0
) -> float:
    """Eager scalar form of :func:`batch_threshold_df` (population std,
    matching numpy ddof=0 — ``run_pipeline.py:66``). Prefer the lazy
    DataFrame form inside query plans."""
    row = batch_threshold_df(scored, err_col, sigmas).collect()[0]
    return float(row["__ml_thr"])


def with_ml_verdict(
    scored: DataFrame,
    threshold: float | None = None,
    err_col: str = "ReconstructionError",
) -> DataFrame:
    """Reference M5/M7 verdict: 'Suspicious' iff error > threshold.

    With ``threshold=None`` the batch-relative cutoff joins in as a
    broadcast 1-row crossJoin — no driver collect, one plan."""
    if threshold is not None:
        return scored.withColumn(
            "MLFraud",
            F.when(F.col(err_col) > F.lit(threshold), "Suspicious").otherwise(
                "Normal"
            ),
        )
    thr = batch_threshold_df(scored, err_col)
    return (
        scored.crossJoin(F.broadcast(thr))
        .withColumn(
            "MLFraud",
            F.when(F.col(err_col) > F.col("__ml_thr"), "Suspicious").otherwise(
                "Normal"
            ),
        )
        .drop("__ml_thr")
    )
