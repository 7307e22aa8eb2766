"""Data-layout operators: Z-order (Morton) clustering keys and
z-ordered writes.

At 100 TB the dominant cost of a selective query is how much of the
table the scan can SKIP. Partitioning prunes on one column; a Z-order
(bit-interleaved) clustering key gives multi-dimensional locality: rows
close in (x, y) are close in z, so range-partitioning + sorting by z
makes every file's min/max envelope tight in BOTH dimensions and
parquet row-group/file statistics prune on either predicate. The same
technique under Delta's OPTIMIZE ZORDER BY — here as a plain column
expression + ``repartitionByRange`` write, no table format required.

The interleave is a JVM-side fold over bit positions (disjoint-bit
terms summed, so engines that differ in bitwise-or typing agree), and
is DuckDB-reproducible for the oracle gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(x: Column, y: Column, bits: int = 10) -> Column:
    """Morton interleave of two non-negative integer bucket columns
    (each < 2^bits): bit i of x lands at position 2i, bit i of y at
    2i+1. Pure column fold — no UDF, no shuffle."""
    terms = [
        (
            F.shiftleft(F.shiftright(x.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(
                F.shiftright(y.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i + 1
            )
        )
        for i in range(bits)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("long")


def write_zordered(
    df: DataFrame,
    path: str,
    x: Column,
    y: Column,
    n_files: int = 16,
    bits: int = 10,
) -> None:
    """Write ``df`` clustered by the Z-order of (x, y): range-partition
    on the z key (each output file owns a contiguous z range ⇒ a tight
    2-D envelope) and sort within partitions so parquet column stats
    prune at row-group granularity too."""
    z = zorder_key(x, y, bits).alias("__z")
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def zonemap_prune_report(
    df: DataFrame,
    layouts: dict[str, Column],
    value: Column,
    cutoff: int,
) -> DataFrame:
    """Zone-map (file/row-group min-max statistics) pruning simulator:
    for each candidate physical LAYOUT — a name → bucket-id expression
    modeling which file each row would land in — compute how much of
    the table the predicate ``value >= cutoff`` could SKIP using only
    per-bucket min/max stats, i.e. exactly what parquet footer stats +
    Catalyst's file pruning would do after an OPTIMIZE/cluster pass.

    Per layout one row: (layout, n_buckets, n_pruned_buckets,
    rows_total, rows_pruned, rows_matching, prune_fraction). A bucket
    prunes iff its zone-map max < cutoff — the same conservative test
    engines apply; ``rows_matching`` certifies every layout answers
    identically (pruning changes I/O, never results).

    This is the measurement half of the layout story (``write_zordered``
    is the action half): at 100 TB the difference between the
    "arrival" layout and a clustered one is typically the query — the
    report quantifies it from one cheap stats pass (one groupBy per
    layout over (bucket) — no data movement beyond the agg shuffle)."""
    rows = []
    for name, bucket in layouts.items():
        zm = (
            df.select(bucket.cast("long").alias("_b"), value.cast("long").alias("_v"))
            .groupBy("_b")
            .agg(
                F.count(F.lit(1)).cast("long").alias("_rows"),
                F.max("_v").alias("_mx"),
                F.sum((F.col("_v") >= cutoff).cast("long")).alias("_match"),
            )
        )
        rows.append(
            zm.agg(
                F.lit(name).alias("layout"),
                F.count(F.lit(1)).cast("long").alias("n_buckets"),
                F.sum((F.col("_mx") < cutoff).cast("long"))
                .cast("long")
                .alias("n_pruned_buckets"),
                F.sum("_rows").cast("long").alias("rows_total"),
                F.sum(
                    F.when(F.col("_mx") < cutoff, F.col("_rows")).otherwise(
                        F.lit(0)
                    )
                )
                .cast("long")
                .alias("rows_pruned"),
                F.sum("_match").cast("long").alias("rows_matching"),
            ).withColumn(
                "prune_fraction",
                F.col("rows_pruned").cast("double")
                / F.col("rows_total").cast("double"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out
