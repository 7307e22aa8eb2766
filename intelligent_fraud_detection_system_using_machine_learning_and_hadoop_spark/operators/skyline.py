"""Skyline (Pareto-dominance) operator.

The skyline of a relation under two maximize-dimensions (x, y) is the
set of rows not dominated by any other row, where row A dominates row
B iff A.x >= B.x AND A.y >= B.y with at least one strict inequality
(Borzsony/Kossmann/Stocker, ICDE 2001 — the original SKYLINE OF
proposal; ties on both dimensions are mutually non-dominating, so
duplicate points all survive). The reference engine has no skyline
operator; this extends the analytics surface the way a "best
trade-off" screen is used in practice (freshest AND largest orders,
cheapest AND fastest suppliers).

Scale shape — the naive formulation is a quadratic NOT EXISTS
self-join; the 2-D structure collapses it to group-and-suffix-max:

1. one keyed aggregation x -> max(y)  (distributed, one shuffle);
2. the strict-suffix max over the x-domain,
   best_later(x) = max{ max_y(x') : x' > x } — computed with a window
   over the AGGREGATED frame, which has one row per distinct x. This
   module is for BOUNDED-DOMAIN x (dates, status codes, small grids):
   |distinct x| is a domain constant (~2.4k dates for a TPC-H-shaped
   book) independent of row count, so the single-partition window
   over the aggregate is a broadcast-scale frame at any SF — the same
   bounded-by-contract argument as the per-category moment collects.
   For an unbounded x the suffix max would take the range-bucketed
   two-level pass (operators/bucketing.py), which no registered
   caller needs yet;
3. a broadcast join back: a row survives iff y == max_y(its x)
   (anything less is dominated by the same-x maximum — x ties,
   y strict) and y > best_later(x) (an x' > x with y' >= y dominates
   — x strict). Equality on step 3 is exact: both sides compare the
   same unmodified column values read from the same files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def skyline_2d_max(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Rows of ``df`` on the maximize/maximize Pareto frontier of
    (``x_col``, ``y_col``). Null x or y rows never join the frontier
    (a null coordinate is not comparable; they are dropped, matching
    SQL NOT EXISTS semantics where NULL comparisons are UNKNOWN and
    the row would spuriously survive — callers filter nulls first if
    they want them kept). Output keeps all input columns."""
    pts = df.where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    per_x = pts.groupBy(x_col).agg(F.max(y_col).alias("_sky_max_y"))
    # |per_x| = |x domain| — bounded by contract (see module doc), so
    # the global-order window is a small-frame pass, not a data-sized
    # single partition.
    suffix = per_x.withColumn(
        "_sky_best_later",
        F.max("_sky_max_y").over(
            W.orderBy(F.col(x_col).desc()).rowsBetween(
                W.unboundedPreceding, -1
            )
        ),
    )
    return (
        pts.join(F.broadcast(suffix), x_col)
        .where(
            (F.col(y_col) == F.col("_sky_max_y"))
            & (
                F.col("_sky_best_later").isNull()
                | (F.col(y_col) > F.col("_sky_best_later"))
            )
        )
        .drop("_sky_max_y", "_sky_best_later")
    )
