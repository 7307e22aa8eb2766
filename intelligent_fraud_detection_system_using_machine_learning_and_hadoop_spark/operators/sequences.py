"""Gaps-and-islands over integer key sequences.

The classic audit primitive (find runs of consecutive keys, and the
gaps between them — missing invoice numbers, sequence breaks in
ledger postings) — the reference engine has no sequence screen; this
extends the fraud-audit surface with the textbook islands analysis
(Ben-Gan's ``value - ROW_NUMBER()`` grouping idiom, public SQL
literature).

Scale shape: the idiom needs a GLOBAL dense rank over the key column.
A naive ``row_number() OVER (ORDER BY k)`` is a single-partition
window — the exact anti-pattern this repo bans — so the rank comes
from the range-bucketed exact-rank machinery already used by the
Spearman/Mann-Whitney family (operators/stats.py::avg_rank2: 64-way
equi-depth buckets, per-bucket cumulative counts, broadcast bucket
prefix). Keys are required UNIQUE (they are primary keys in every
intended use), so 2*avg_rank = 2*rank and the island id
``k - rank(k)`` is exact integer arithmetic; one keyed aggregation on
the island id finishes the job. Total: the rank's bucketed shuffles +
one groupBy — no driver loop, no single-partition window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def key_islands(df: DataFrame, key_col: str) -> DataFrame:
    """Islands of consecutive integers in the UNIQUE key column
    ``key_col`` of ``df``: one output row per maximal run, with
    ``island_start``, ``island_end``, ``island_len``, and
    ``next_gap`` — the count of missing keys between this island and
    the next one (null for the last island). Null keys are ignored.

    Uniqueness is ASSERTED, not assumed (ADVICE r15): duplicated keys
    would make ``k - rank`` drift and silently merge unrelated
    islands, and r2-parity catches only even-sized tie groups — so
    the function counts per-key multiplicity up front (one map-side
    combinable keyed aggregation, the same shuffle grain the rank
    pass needs anyway) and raises ``ValueError`` when any key repeats.
    Duplicate invoice numbers are themselves an audit finding — they
    must surface loudly, never pass through as corrupted islands. The
    deduplicated count frame then FEEDS the rank pass, so the check
    adds one bounded action (``isEmpty`` on the aggregated filter),
    not a second data-sized scan.

    CONTRACT NOTE (ADVICE r16): unlike the repo's default lazy
    plan-builders, this function runs EAGER Spark jobs at call time —
    the uniqueness guard must fire before a corrupted plan can be
    handed out, so the per-key count frame materializes immediately
    (registered in the bounded swap-cache, so ``release_caches``
    covers it) and the duplicate check executes inline. Callers get
    either a valid plan or a ``ValueError``, never a deferred
    failure."""
    from ..cache import plan_key, swap_cache
    from .stats import avg_rank2

    counted = (
        df.select(F.col(key_col).cast("long").alias("_k"))
        .where(F.col("_k").isNotNull())
        .groupBy("_k")
        .agg(F.count(F.lit(1)).cast("long").alias("_cnt"))
    )
    counted = swap_cache(plan_key("key_islands.counted", counted), counted)
    dups = counted.where(F.col("_cnt") > 1)
    if not dups.isEmpty():
        sample = [r._k for r in dups.select("_k").limit(5).collect()]
        raise ValueError(
            f"key_islands requires a UNIQUE key column; duplicates in "
            f"{key_col!r} (sample: {sample}) — duplicated keys merge "
            f"unrelated islands. Deduplicate or audit the duplicates "
            f"first (they are themselves a sequence-fraud signal)."
        )
    keys = counted.select("_k")
    # r2 = 2*lt + cnt + 1; keys are now provably unique so cnt == 1
    # and rank = r2 / 2.
    ranks = avg_rank2(keys, "_k", cast_type="long").toDF("_k", "_r2")
    islands = (
        keys.join(ranks, "_k")
        .select(
            "_k",
            (F.col("_k") - (F.col("_r2") / F.lit(2)).cast("long")).alias(
                "_isl"
            ),
        )
        .groupBy("_isl")
        .agg(
            F.min("_k").alias("island_start"),
            F.max("_k").alias("island_end"),
            F.count(F.lit(1)).cast("long").alias("island_len"),
        )
        .drop("_isl")
    )
    # |islands| <= |gaps|+1; the next-gap lookup is a self-equi-join
    # on the successor rank of island_start — again rank-bucketed,
    # not a global window. Rank islands by start via avg_rank2 over
    # the (already aggregated, gap-count-sized) island frame.
    isl_rank = avg_rank2(
        islands.select(F.col("island_start").alias("_k")), "_k",
        cast_type="long",
    ).toDF("island_start", "_ir2")
    cur = islands.join(isl_rank, "island_start").withColumn(
        "_ord", (F.col("_ir2") / F.lit(2)).cast("long")
    )
    nxt = cur.select(
        (F.col("_ord") - F.lit(1)).alias("_ord"),
        F.col("island_start").alias("_next_start"),
    )
    return (
        cur.join(nxt, "_ord", "left")
        .select(
            "island_start",
            "island_end",
            "island_len",
            (F.col("_next_start") - F.col("island_end") - F.lit(1)).alias(
                "next_gap"
            ),
        )
    )


def trailing_distinct_count(
    df: DataFrame,
    entity_col: str,
    day_col: str,
    window_days: int = 7,
) -> DataFrame:
    """Rolling distinct-entity count per day (the WAU/rolling-actives
    metric): for every day in the data's [min, max] range, the number
    of DISTINCT entities active in the trailing ``window_days`` days
    (current day inclusive). ``day_col`` must be an epoch-day long.

    Scale shape — the naive form is a day-range self-join and exact
    windowed COUNT(DISTINCT) is not frame-computable; the standard
    collapse is interval COVERAGE: each distinct (entity, active-day)
    pair covers days [d, d+W-1], so a day's trailing distinct count is
    the number of distinct (entity, covered-day) pairs on that day.
    That is one distinct on the (entity, day) pairs (data-sized, keyed),
    a constant W-fold explode, a second distinct, and one keyed count —
    all shuffles on (entity, day) keys, no range join, no window. The
    W× intermediate is a bounded multiplier, the discipline the C4
    line-dedup and gram-digest passes already accept. The day spine is
    a |days|-row broadcast (bounded domain: a calendar)."""
    from ..cache import plan_key, swap_cache

    pairs = (
        df.select(
            F.col(entity_col).alias("_e"), F.col(day_col).alias("_d")
        )
        .where(F.col("_e").isNotNull() & F.col("_d").isNotNull())
        .distinct()
    )
    # pairs fans out to the day-bounds reduce AND the coverage
    # explode — persist the distinct once (r16 fan-out discipline)
    pairs = swap_cache(plan_key("trailing_distinct.pairs", pairs), pairs)
    bounds = pairs.agg(
        F.min("_d").alias("_mn"), F.max("_d").alias("_mx")
    )
    spine = bounds.select(
        F.explode(F.sequence(F.col("_mn"), F.col("_mx"))).alias("day")
    )
    covered = (
        pairs.select(
            "_e",
            F.explode(
                F.sequence(F.col("_d"), F.col("_d") + F.lit(window_days - 1))
            ).alias("day"),
        )
        .distinct()
        .groupBy("day")
        .agg(F.count(F.lit(1)).cast("long").alias("_n"))
    )
    return (
        spine.join(covered, "day", "left")
        .select(
            "day",
            F.coalesce(F.col("_n"), F.lit(0)).cast("long").alias("n_active"),
        )
        .orderBy("day")
    )
