"""Pipeline observability: zero-cost metrics via Spark Observations.

Engine-completeness extension (the reference — a pandas scorer, ref
scripts/run_pipeline.py — prints row counts eagerly, forcing extra
passes): production pipelines need per-stage row counts / null rates /
value totals WITHOUT extra jobs. Spark's ``Observation`` API attaches
named aggregate expressions to a plan node; they are computed as a
side-effect of whatever action the caller runs — the metrics are free,
no second scan, no ``.count()`` re-execution of the lineage.

Usage::

    df, obs = observe_stage(df, "post_filter", value_col="o_totalprice")
    df.write.parquet(...)          # the caller's own action
    metrics = obs.get              # {'post_filter.n_rows': ..., ...}

Scale note: an eager ``df.count()`` between stages re-runs the whole
upstream plan — at 100 TB that doubles the pipeline. Observed metrics
ride the existing action's single pass, which is the entire point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observe_stage(
    df: DataFrame,
    stage: str,
    value_col: str | None = None,
    null_cols: tuple[str, ...] = (),
) -> tuple[DataFrame, Observation]:
    """Attach stage metrics to ``df``: row count, optional exact value
    total (integer cents) and per-column null counts. Returns the
    instrumented frame (plan unchanged semantically) and the
    ``Observation`` to read AFTER the caller's next action."""
    obs = Observation(stage)
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    if value_col is not None:
        metrics.append(
            F.sum(F.round(F.col(value_col) * 100).cast("long")).alias(
                "sum_cents"
            )
        )
    for c in null_cols:
        metrics.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"nulls_{c}")
        )
    return df.observe(obs, *metrics), obs
