"""Time-series change-point detection: one-sided CUSUM per group.

Analytics extension (the reference — a pandas batch scorer, ref
scripts/run_pipeline.py — has no time-series surface): detect the day a
metric's level shifts upward, per series — the drift monitor a
continuously-ingested corpus or event pipeline runs over its daily
volumes/quality scores.

The textbook CUSUM recurrence S_i = max(0, S_{i-1} + (x_i − μ − k)) is
sequential — useless on a cluster as written. It has a closed
prefix form: with P_i = Σ_{t≤i}(x_t − μ − k),

    S_i = P_i − min_{j≤i} P_j

i.e. cumulative sum minus running minimum — two ordered window
functions over each series, ONE window shuffle per group. That
reformulation is the whole scale story: a 10-year daily series per key
costs two window passes, not 3650 sequential steps.

Arithmetic is exact: values quantize to integer cents, the mean enters
cross-multiplied (deviations scaled by the series length n stay
BIGINT), so every engine computes identical statistics — the SQL
oracle matches bit-for-bit, no float summation-order hazard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cusum_daily(
    events: DataFrame,
    slack_cents: int = 0,
    threshold_cents: int = 500,
    group_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per (group, day): the one-sided upward CUSUM statistic of the
    day's summed value against the series mean, and a change flag.

    Scaled-integer form: with x_i the day's cents, T the series total,
    n the series length, deviations are d_i = n·x_i − T − n·slack
    (exact BIGINT; dividing by 100·n recovers value units). Returns
    (group, day, day_value, cusum, is_change) where
    cusum = (P_i − min_{j≤i} P_j) / (100·n) and is_change ⇔ the scaled
    statistic exceeds n·threshold_cents.
    """
    daily = (
        events.groupBy(
            F.col(group_col).alias("grp"),
            F.date_trunc("day", F.col(ts_col)).alias("day"),
        )
        .agg(
            F.sum(F.round(F.col(value_col) * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    series = Window.partitionBy("grp")
    ordered = Window.partitionBy("grp").orderBy("day")
    running = ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d = (
        daily.withColumn("_n", F.count(F.lit(1)).over(series))
        .withColumn("_total", F.sum("cents").over(series))
        .withColumn(
            "_dev",
            F.col("cents") * F.col("_n")
            - F.col("_total")
            - F.lit(slack_cents) * F.col("_n"),
        )
        .withColumn("_p", F.sum("_dev").over(running))
        .withColumn("_pmin", F.min("_p").over(running))
    )
    # the min ranges over j in 0..i with the EMPTY prefix P_0 = 0 —
    # without it, an immediately-rising series would zero out its own
    # first excursion
    scaled = F.col("_p") - F.least(F.lit(0), F.col("_pmin"))
    return d.select(
        F.col("grp").alias(group_col),
        "day",
        (F.col("cents").cast("double") / 100.0).alias("day_value"),
        (
            scaled.cast("double")
            / (F.lit(100.0) * F.col("_n").cast("double"))
        ).alias("cusum"),
        (scaled > F.lit(threshold_cents) * F.col("_n")).alias("is_change"),
    ).orderBy(group_col, "day")


def longest_streaks(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-series strictly-increasing STREAK census over the daily
    value totals — the gaps-and-islands pattern (the monitoring
    question "how many days in a row has this metric climbed, and
    what's the record?") computed with two window passes, no
    sequential scan:

    * ``inc`` flags each day whose exact cents total strictly exceeds
      the previous day's (series-partitioned lag);
    * the running count of NON-increases (ordered cumulative sum) is
      the island id — constant exactly within each maximal increasing
      run;
    * per-island length/start then per-series maxima are plain keyed
      aggregations.

    Everything is integer/date arithmetic on exact cents — no floats
    anywhere — so the SQL twin matches byte-for-byte. Returns one row
    per series: (series, n_days, n_runs, longest_run days,
    longest_run_start = earliest start among record-tying runs).
    Scale: windows partition by series (one shuffle); a 10-year daily
    series is 3,650 rows per key."""
    from pyspark.sql import Window

    daily = events.groupBy(
        F.col(group_col).alias("grp"),
        F.date_trunc("day", F.col(ts_col)).alias("day"),
    ).agg(
        F.sum(F.round(F.col(value_col) * 100).cast("long"))
        .cast("long")
        .alias("x")
    )
    w = Window.partitionBy("grp").orderBy("day")
    flagged = daily.select(
        "grp",
        "day",
        F.when(F.col("x") > F.lag("x").over(w), F.lit(1))
        .otherwise(F.lit(0))
        .alias("inc"),
    )
    islands = flagged.select(
        "grp",
        "day",
        F.sum(F.lit(1) - F.col("inc"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("island"),
    )
    runs = islands.groupBy("grp", "island").agg(
        F.count(F.lit(1)).cast("long").alias("run_len"),
        F.min("day").alias("run_start"),
    )
    per_grp = runs.groupBy("grp").agg(
        F.sum("run_len").cast("long").alias("n_days"),
        F.count(F.lit(1)).cast("long").alias("n_runs"),
        F.max("run_len").cast("long").alias("longest_run"),
    )
    best_start = (
        runs.join(
            per_grp.select("grp", F.col("longest_run").alias("_best")), "grp"
        )
        .where(F.col("run_len") == F.col("_best"))
        .groupBy("grp")
        .agg(F.min("run_start").alias("longest_run_start"))
    )
    return per_grp.join(best_start, "grp").select(
        F.col("grp").alias(group_col),
        "n_days",
        "n_runs",
        "longest_run",
        "longest_run_start",
    )
