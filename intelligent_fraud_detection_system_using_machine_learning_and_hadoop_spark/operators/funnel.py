"""Behavioral funnel analysis over an event stream.

Analytics extension (the reference — a pandas fraud scorer, ref
scripts/run_pipeline.py — has no event-sequence surface): the classic
product-analytics question "of the users who did step 1, how many went
on to do step 2, then step 3, in order, within a horizon?".

Semantics (the standard first-touch funnel): per user, t₁ = earliest
step-1 event; tᵢ = earliest step-i event AFTER tᵢ₋₁ and within
``horizon`` of t₁. A user converts through step i iff tᵢ exists.

Scale shape: one user-keyed conditional aggregation per step — k−1
user-keyed joins between per-user 1-row frames, each a skew-free
hash join on user_id (per-step frames shrink monotonically, so later
joins are cheap; AQE broadcasts them once they fit). The event table
itself is scanned once per step with the step's type filter pushed
into the parquet scan — no sessionize-everything pass, no per-user
event arrays (a hot user with millions of events costs nothing more
than a cold one).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_steps(
    events: DataFrame,
    steps: Sequence[str],
    horizon: str = "7 days",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user funnel timestamps: (user, t_1 … t_k) with tᵢ null once
    the user drops out. ``horizon`` is a SQL interval literal measured
    from t₁."""
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    cur = (
        events.where(F.col(type_col) == steps[0])
        .groupBy(F.col(user_col).alias("user_id"))
        .agg(F.min(ts_col).alias("t_1"))
    )
    for i, s in enumerate(steps[1:], start=2):
        step_events = events.where(F.col(type_col) == s).select(
            F.col(user_col).alias("user_id"), F.col(ts_col).alias("_ts")
        )
        nxt = (
            step_events.join(cur, "user_id")
            .where(
                (F.col("_ts") > F.col(f"t_{i - 1}"))
                & (F.col("_ts") <= F.col("t_1") + F.expr(f"INTERVAL {horizon}"))
            )
            .groupBy("user_id", *[f"t_{j}" for j in range(1, i)])
            .agg(F.min("_ts").alias(f"t_{i}"))
        )
        # keep drop-outs with null tᵢ so one frame carries the whole funnel
        cur = cur.join(
            nxt.select("user_id", f"t_{i}"), "user_id", "left"
        )
    return cur


def funnel_report(
    events: DataFrame,
    steps: Sequence[str],
    horizon: str = "7 days",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """One row per funnel step: users reaching it, conversion from the
    funnel top, conversion from the previous step (IEEE quotients of
    exact BIGINT counts — oracle-stable)."""
    per_user = funnel_steps(events, steps, horizon, user_col, ts_col, type_col)
    counts = per_user.agg(
        *[
            F.count(F.col(f"t_{i}")).cast("long").alias(f"n_{i}")
            for i in range(1, len(steps) + 1)
        ]
    )
    rows = []
    for i, s in enumerate(steps, start=1):
        rows.append(
            F.struct(
                F.lit(i).cast("long").alias("step"),
                F.lit(s).alias("event_type"),
                F.col(f"n_{i}").alias("n_users"),
                (F.col(f"n_{i}").cast("double") / F.col("n_1").cast("double")).alias(
                    "conv_from_top"
                ),
                (
                    F.col(f"n_{i}").cast("double")
                    / F.col(f"n_{max(i - 1, 1)}").cast("double")
                ).alias("conv_from_prev"),
            )
        )
    return (
        counts.select(F.explode(F.array(*rows)).alias("r"))
        .select("r.*")
        .orderBy("step")
    )


def linear_attribution(
    events: DataFrame,
    conv_type: str,
    touch_types: Sequence[str],
    horizon: str = "30 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    value_col: str = "value",
    raw: bool = False,
) -> DataFrame:
    """Linear multi-touch attribution: every conversion event splits
    its value EQUALLY across the user's touch events in the preceding
    ``horizon`` window (the standard linear model; first-touch is
    ``funnel_report``'s cousin). Per touch type, one output row:

    * ``n_touches`` — credited touch instances,
    * ``n_conversions`` — distinct conversions the type participated in,
    * ``credited_value`` — Σ value·(1/n) in currency units,
    * ``credited_conversions`` — Σ 1/n conversion credit.

    Exactness discipline: value splits as ``value_cents div n`` and
    conversion credit as ``10⁶ div n`` — integer floor divisions summed
    as BIGINTs, so the result is identical under any partitioning and
    on any engine (float 1/n sums are neither). The sub-cent division
    remainder is deliberately dropped, identically everywhere.
    Conversions with NO in-window touch carry no credit (callers union
    an "(unattributed)" row from a separate anti-join if they need
    conservation).

    Scale shape: the touch⋈conversion join is user-keyed with the time
    predicate applied on join — per-user micro cross products bounded
    by horizon density; the per-conversion fan-in count is a window
    over the conversion id (skew-free: one conversion's touches are
    horizon-bounded). For hot users at web scale, pre-bucketing both
    sides by (user, time-bucket) — operators/joins.py's interval-join
    discipline — drops in unchanged.
    """
    from pyspark.sql import Window

    conv = events.where(F.col(type_col) == conv_type).select(
        F.col(id_col).alias("_cid"),
        F.col(user_col).alias("_u"),
        F.col(ts_col).alias("_tc"),
        F.round(F.col(value_col) * 100).cast("long").alias("_vc"),
    )
    touch = events.where(F.col(type_col).isin(list(touch_types))).select(
        F.col(type_col).alias("touch_type"),
        F.col(user_col).alias("_u"),
        F.col(ts_col).alias("_tt"),
    )
    j = touch.join(conv, "_u").where(
        (F.col("_tt") < F.col("_tc"))
        & (F.col("_tt") >= F.col("_tc") - F.expr(f"INTERVAL {horizon}"))
    )
    n = Window.partitionBy("_cid")
    credited = j.withColumn("_n", F.count(F.lit(1)).over(n).cast("long"))
    folded = credited.groupBy("touch_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_touches"),
        F.countDistinct("_cid").cast("long").alias("n_conversions"),
        F.sum(F.expr("_vc div _n")).cast("long").alias("_cv_q"),
        F.sum(F.expr("1000000 div _n")).cast("long").alias("_cc_q"),
    )
    if raw:
        # mergeable integer state: every column adds exactly across
        # disjoint conversion partitions (the streaming fold path)
        return folded
    return (
        folded
        .select(
            "touch_type",
            "n_touches",
            "n_conversions",
            (F.col("_cv_q").cast("double") / F.lit(100.0)).alias(
                "credited_value"
            ),
            (F.col("_cc_q").cast("double") / F.lit(1000000.0)).alias(
                "credited_conversions"
            ),
        )
    )


def cohort_retention(
    events: DataFrame,
    epoch: str = "2024-01-01",
    period_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Classic cohort-retention matrix: users grouped by the period of
    their FIRST event (the cohort), each cohort tracked over subsequent
    periods by the fraction still active. One row per (cohort_period,
    period_offset): (n_active, cohort_size, retention) — exact BIGINT
    distinct-user counts, retention one IEEE division.

    Scale shape: one user-keyed min-aggregate (first activity), one
    distinct over (user, period) — both single-shuffle map-combined —
    then a user-keyed join and a cells-sized aggregation. The cohort
    size table is |cohorts| rows, broadcast. Period boundaries are
    integer day arithmetic from a fixed epoch (engine-portable; no
    week-of-year locale traps)."""
    p = F.expr(
        f"datediff(to_date({ts_col}), date'{epoch}') div {period_days}"
    ).cast("long")
    ev = events.select(F.col(user_col).alias("_u"), p.alias("_p"))
    first = ev.groupBy("_u").agg(F.min("_p").alias("cohort_period"))
    active = ev.distinct()
    sizes = first.groupBy("cohort_period").agg(
        F.countDistinct("_u").cast("long").alias("cohort_size")
    )
    return (
        active.join(first, "_u")
        .groupBy(
            "cohort_period",
            (F.col("_p") - F.col("cohort_period")).alias("period_offset"),
        )
        .agg(F.countDistinct("_u").cast("long").alias("n_active"))
        .join(F.broadcast(sizes), "cohort_period")
        .select(
            "cohort_period",
            "period_offset",
            "n_active",
            "cohort_size",
            (
                F.col("n_active").cast("double")
                / F.col("cohort_size").cast("double")
            ).alias("retention"),
        )
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition counts over each user's event
    sequence: for every ordered pair of consecutive events (by ts,
    ties broken by the unique event id — deterministic on any engine),
    one (from_type, to_type) transition. Returns per pair: n, plus the
    row-normalized fraction (one IEEE division of exact counts) — the
    behavioral transition matrix behind next-action prediction and
    anomaly path analysis.

    Scale: ONE user-partitioned window (lead) — distributed across
    users, no global sort — then a cells-sized aggregation and a
    broadcast of the per-from totals."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(id_col))
    pairs = (
        events.select(
            F.col(type_col).alias("from_type"),
            F.lead(type_col).over(w).alias("to_type"),
        )
        .where(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    totals = pairs.groupBy("from_type").agg(
        F.sum("n").cast("long").alias("n_from")
    )
    return pairs.join(F.broadcast(totals), "from_type").select(
        "from_type",
        "to_type",
        "n",
        "n_from",
        (F.col("n").cast("double") / F.col("n_from").cast("double")).alias(
            "fraction"
        ),
    )
