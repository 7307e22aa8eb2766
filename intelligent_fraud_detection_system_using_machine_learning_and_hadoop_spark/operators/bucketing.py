"""Order-preserving equi-depth bucketing for the distributed
prefix-sum idiom (avg_rank2, weighted_systematic_sample, packing).

The prefix-sum idiom needs an ORDER-PRESERVING bucket id so per-bucket
window cumsums compose with broadcast bucket offsets. Equal-WIDTH
ranges (the r8 shape) lose parallelism on heavy-tailed data: a
lognormal value column concentrates almost every distinct value in
bucket 0 and the "parallel" per-bucket window re-serializes. Sampled
equi-DEPTH boundaries (VERDICT r8 item 6) keep ~n/n_buckets rows per
bucket on ANY distribution: a percentile_approx aggregate branch
picks the edges inside the SAME lazy plan, and bucket(v) = #edges
strictly below v — order-preserving pure column expressions
throughout.

Bucket ids only steer PARALLELISM; every caller's output is invariant
to the boundary choice (the per-bucket cumsum + offset roll-up is
exact for any order-preserving assignment), so oracles are unaffected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_equi_depth_bucket(
    df: DataFrame, col: str, n_buckets: int = 64, out: str = "_bkt"
) -> DataFrame:
    """Attach an order-preserving bucket id column ``out`` with
    equi-depth boundaries over ``df[col]`` (numeric, null-free) —
    the boundaries are a ``percentile_approx`` aggregate branch of the
    same plan (exactly the shape the old equal-width min/max branch
    had), broadcast back as one edge array, and bucket(v) = #edges
    strictly below v via a single array-filter lambda (measured 3×
    cheaper than the equivalent 63-term comparison chain, which falls
    out of whole-stage codegen).

    The result ends in ``repartition(out)`` — one exchange keyed on
    the bucket id, doing three jobs at once: (a) the prefix-sum
    callers feed this frame to ≥2 consumers (per-bucket cumsum window
    + bucket totals) inside one action, and ReuseExchange makes them
    share ONE materialization instead of re-running the upstream
    aggregate per consumer; (b) the callers' window/groupBy on the
    bucket id are already satisfied by this partitioning, so they add
    no shuffle of their own; (c) it is a hard projection barrier, so
    the lambda-built bucket id reaches the window as a concrete
    column — lambda expressions collapsed into a window PARTITION BY
    hit Catalyst's ATTRIBUTE_NOT_FOUND rebinding bug (observed on
    Spark 4.1).

    v1 < v2 ⇒ bucket(v1) ≤ bucket(v2) for any edge multiset — the only
    property the prefix-sum roll-up needs. Duplicate edges (heavy tie
    groups) make some ids empty, which the roll-up tolerates; a
    constant column degrades to one bucket, which is also its true
    depth profile."""
    probs = F.array(
        *[F.lit(i / n_buckets) for i in range(1, n_buckets)]
    )
    edges = df.agg(
        F.percentile_approx(
            F.col(col).cast("double"), probs, F.lit(1000)
        ).alias("_qedges")
    )
    v = F.col(col).cast("double")
    return (
        df.crossJoin(F.broadcast(edges))
        .withColumn(
            out,
            F.size(F.filter("_qedges", lambda e: v > e)).cast("long"),
        )
        .drop("_qedges")
        .repartition(F.col(out))
    )
