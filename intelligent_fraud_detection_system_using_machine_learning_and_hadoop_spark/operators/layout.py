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
