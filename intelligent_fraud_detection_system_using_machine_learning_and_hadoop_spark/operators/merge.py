"""Snapshot maintenance: MERGE-style CDC upsert and SCD2 history.

Engine-completeness extensions (the reference — a pandas batch scorer,
ref scripts/run_pipeline.py — recomputes from scratch every run and has
no upsert surface): a periodically-refreshed corpus or dimension table
needs (a) MERGE semantics — apply a changelog of inserts / updates /
deletes to the previous snapshot and emit the next one — and (b)
slowly-changing-dimension type-2 history, where updates close out the
current version row and append a new one instead of overwriting.

Scale shape: both operators are ONE key-keyed join between the snapshot
and the (typically much smaller) change batch, plus a latest-change
window over the batch only. With snapshot and output stored bucketed by
the merge key the join needs no snapshot-side shuffle (the same layout
argument as operators/dedup.incremental_dedup); with a small batch,
``broadcast_changes=True`` removes the snapshot shuffle entirely. The
snapshot is never windowed — only the batch is — so the nightly cost is
O(|snapshot| scan + |batch| shuffle), never a corpus re-shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def latest_changes(
    changes: DataFrame, keys: Sequence[str], seq_col: str = "seq"
) -> DataFrame:
    """Collapse a changelog to the winning (highest-``seq_col``) change
    per key — the CDC compaction step. Window over the BATCH only."""
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(F.desc(seq_col))
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def merge_upsert(
    snapshot: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    op_col: str = "op",
    seq_col: str = "seq",
    broadcast_changes: bool = False,
) -> DataFrame:
    """MERGE INTO semantics on plain DataFrames: apply a changelog with
    ``op_col`` ∈ {'I','U','D'} (insert/update treated as upsert, delete
    removes) and per-key ordering ``seq_col`` (latest wins) to
    ``snapshot``; returns the next snapshot with the snapshot's schema.

    ``changes`` must carry the snapshot's payload columns plus op/seq.

    NOT a full-outer join (which Spark cannot broadcast): the merge is
    composed as snapshot ⟕ changes (updates applied, deletes dropped)
    ∪ insert rows, where insert detection goes through a tiny
    matched-keys semi-join instead of anti-joining the snapshot — so
    with ``broadcast_changes=True`` every join broadcasts the
    batch-sized side and the snapshot NEVER shuffles, not even its key
    column.
    """
    payload = [c for c in snapshot.columns if c not in keys]
    c = latest_changes(changes, keys, seq_col)
    cb = F.broadcast(c) if broadcast_changes else c
    s, j = snapshot.alias("s"), cb.alias("c")
    take_change = F.col(f"c.{op_col}").isNotNull() & (
        F.col(f"c.{op_col}") != "D"
    )
    merged = (
        s.join(j, list(keys), "left")
        .where(F.col(f"c.{op_col}").isNull() | (F.col(f"c.{op_col}") != "D"))
        .select(
            *[F.col(k) for k in keys],
            *[
                F.when(take_change, F.col(f"c.{p}"))
                .otherwise(F.col(f"s.{p}"))
                .alias(p)
                for p in payload
            ],
        )
    )
    # insert rows: change keys absent from the snapshot. The snapshot
    # side reduces FIRST to the ≤|batch|-row matched-key set (semi-join
    # against the broadcast batch), so the anti-join is batch×batch.
    change_keys = c.select(*keys)
    if broadcast_changes:
        change_keys = F.broadcast(change_keys)
    matched = snapshot.select(*keys).join(change_keys, list(keys), "left_semi")
    if broadcast_changes:
        matched = F.broadcast(matched)
    inserts = (
        c.where(F.col(op_col) != "D")
        .join(matched, list(keys), "left_anti")
        .select(*keys, *payload)
    )
    return merged.unionByName(inserts)


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    effective_col: str = "effective_date",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_flag: str = "is_current",
) -> DataFrame:
    """Slowly-changing-dimension type 2: for every key in ``updates``,
    close out the current version (``valid_to`` = the update's effective
    date, ``is_current`` = false) and append the new version
    (``valid_from`` = effective date, open-ended). Unchanged keys pass
    through. ``updates`` carries the dim's payload columns plus
    ``effective_col``; history rows (``is_current`` = false) are
    immutable and pass through untouched.

    One key-keyed left join (current rows ⟕ updates) plus a union with
    the new version rows — history is never rewritten, so the operator
    is incremental by construction."""
    payload = [
        c
        for c in dim.columns
        if c not in keys and c not in (valid_from, valid_to, current_flag)
    ]
    u = updates.select(
        *[F.col(k) for k in keys],
        *[F.col(p).alias(f"_new_{p}") for p in payload],
        F.col(effective_col).alias("_eff"),
    )
    history = dim.where(~F.col(current_flag))
    current = dim.where(F.col(current_flag))
    j = current.join(u, list(keys), "left")
    closed = j.select(
        *keys,
        *[F.col(p) for p in payload],
        F.col(valid_from),
        F.when(F.col("_eff").isNotNull(), F.col("_eff"))
        .otherwise(F.col(valid_to))
        .alias(valid_to),
        F.col("_eff").isNull().alias(current_flag),
    )
    new_versions = j.where(F.col("_eff").isNotNull()).select(
        *keys,
        *[F.col(f"_new_{p}").alias(p) for p in payload],
        F.col("_eff").alias(valid_from),
        F.lit(None).cast(dim.schema[valid_to].dataType).alias(valid_to),
        F.lit(True).alias(current_flag),
    )
    # brand-new keys (no current row) insert as open-ended versions
    inserts = u.join(current.select(*keys), list(keys), "left_anti").select(
        *keys,
        *[F.col(f"_new_{p}").alias(p) for p in payload],
        F.col("_eff").alias(valid_from),
        F.lit(None).cast(dim.schema[valid_to].dataType).alias(valid_to),
        F.lit(True).alias(current_flag),
    )
    return history.unionByName(closed).unionByName(new_versions).unionByName(
        inserts
    )
