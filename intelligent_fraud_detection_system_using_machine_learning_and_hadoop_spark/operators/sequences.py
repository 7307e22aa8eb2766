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

    Uniqueness is asserted structurally: avg_rank2's doubled average
    rank r2 is odd iff the tie group has odd size, and exactly 2*rank
    only for singleton groups; duplicated keys would make
    ``k - rank`` drift and merge unrelated islands, so callers must
    pass a key column (callers here pass primary keys)."""
    from .stats import avg_rank2

    keys = (
        df.select(F.col(key_col).cast("long").alias("_k"))
        .where(F.col("_k").isNotNull())
    )
    # r2 = 2*lt + cnt + 1; for unique keys cnt == 1 so rank = r2 / 2.
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
