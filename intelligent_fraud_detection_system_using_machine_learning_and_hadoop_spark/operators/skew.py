"""Skew-mitigation operators: hash-sharded exact distinct counting and
replicated salted joins.

At 100 TB one hot key can serialize an otherwise-parallel stage: every
row with that key lands on one reducer. Spark's own mitigations cover a
lot — map-side partial aggregation for algebraic aggs, AQE skew-join
splitting for sort-merge joins — but two shapes still concentrate:

* **exact COUNT(DISTINCT v) per key**: the dedup set for a hot key
  lives on one task regardless of partial aggregation (Spark's Expand
  two-phase helps multi-agg plans, not one giant per-key value set).
* **shuffled hash/sort joins where AQE is off or the build side is
  mid-sized**: all rows of a hot key still co-locate.

Both fixes are classical salting, expressed declaratively so Catalyst
still owns the physical plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_distinct_count(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    n_salts: int = 16,
    out_col: str = "n_distinct",
) -> DataFrame:
    """Exact per-key COUNT(DISTINCT value) in two bounded stages:
    shard by ``hash(value) % n_salts`` first, count distinct within
    each (key, shard), then SUM the shard counts per key.

    Exactness is structural, not approximate: every distinct value maps
    to exactly ONE shard, so per-shard distinct sets partition the
    per-key distinct set and their cardinalities add up. The hot key's
    value set is now spread over ``n_salts`` tasks instead of one, and
    stage 2 only sums ``n_salts`` small longs per key.

    Equivalent result to ``groupBy(keys).agg(countDistinct(value))``
    (pinned by pytest and by the oracle twin of the registered query);
    use the plain form until a hot key actually hurts — two shuffles
    beat one only when the one is skew-bound.
    """
    salt = F.pmod(F.xxhash64(F.col(value_col)), F.lit(n_salts))
    per_shard = df.groupBy(*key_cols, salt.alias("_salt")).agg(
        F.countDistinct(value_col).alias("_d")
    )
    return per_shard.groupBy(*key_cols).agg(
        F.sum("_d").cast("long").alias(out_col)
    )


def replicated_salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    n_salts: int = 8,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join with the classic skew salt: each LEFT row gets a
    uniform salt in [0, n_salts); the RIGHT side is replicated once per
    salt value; the join key becomes (key, salt). A hot key's left rows
    now spread across ``n_salts`` reducers, at the price of shuffling
    the right side ``n_salts`` times — the right trade when left is
    huge+skewed and right is too big to broadcast but far smaller than
    left.

    The salt comes from ``rand(seed)`` — deterministic per partition
    layout (Spark seeds each partition as seed+partitionId; a task
    retry replays the same values, so the join is exactly-once
    correct; a *repartition of the input* may reassign salts, which is
    harmless: any salt assignment yields the same join result, pinned
    by pytest).

    Supports inner and left joins (for left joins the replicated right
    preserves match semantics because every left row carries exactly
    one salt). Prefer AQE's automatic skew-join for sort-merge plans;
    this is the explicit form for when you need it deterministically in
    the plan.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left"):
        raise ValueError("replicated_salted_join supports how='inner'|'left'")
    lsalted = left.withColumn(
        "_salt", F.floor(F.rand(seed) * n_salts).cast("int")
    )
    rsalted = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>"))
    )
    return lsalted.join(rsalted, keys + ["_salt"], how).drop("_salt")


def top_keys(
    df: DataFrame, key_cols: list[str], k: int = 20
) -> DataFrame:
    """Per-key row counts for the k heaviest keys — the skew probe you
    run BEFORE reaching for salting (map-side partial count + a
    TakeOrderedAndProject top-k, so the probe itself cannot skew)."""
    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n_rows"))
    return counts.orderBy(F.col("n_rows").desc(), *key_cols).limit(k)
