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


def skyline_nd_max(
    df: DataFrame, dim_cols: list[str], max_local: int = 100_000
) -> DataFrame:
    """N-dimensional maximize-skyline for UNBOUNDED dimension domains
    — the generic path ``skyline_2d_max``'s bounded-domain collapse
    cannot take. Distributed divide-and-conquer (the classic
    partition-local-then-merge skyline, Borzsony 2001 §5 adapted to
    Spark):

    1. each partition computes its LOCAL skyline with an Arrow-batched
       mapInPandas pass — a point dominated within a partition is
       dominated globally, so the union of local skylines is a
       superset of the answer (correctness does not depend on how
       rows are partitioned);
    2. the union is coalesced to one partition and the same dominance
       filter runs once more — exact, because dominance is transitive
       and stage 1 only removed globally-dominated points.

    The merge partition is bounded by Σ|local skylines| — for
    real-valued dimensions the expected skyline of n random points is
    O(log^{d-1} n) per partition, and ``max_local`` guards the
    adversarial case (correlated dimensions): a local skyline larger
    than the cap raises rather than silently OOMing the merge — the
    honest-truncation discipline (callers then pre-aggregate or
    bucket). Local filter cost is O(k·|skyline|) per partition with a
    sort-by-sum presort, vectorized in numpy; no driver collect
    anywhere.

    Ties (duplicate points) all survive, matching the NOT EXISTS
    dominance definition. Null dimension values are dropped (see
    skyline_2d_max). Output keeps all input columns."""
    import numpy as np
    import pandas as pd

    cond = None
    for c in dim_cols:
        k = F.col(c).isNotNull()
        cond = k if cond is None else (cond & k)
    pts = df.where(cond)
    schema = pts.schema

    def _local_skyline(batches):
        frames = list(batches)
        if not frames:
            return
        pdf = pd.concat(frames, ignore_index=True)
        if len(pdf) == 0:
            yield pdf
            return
        vals = pdf[list(dim_cols)].to_numpy()
        # presort by coordinate sum descending: a point can only be
        # dominated by one with a >= sum, so each point need only be
        # checked against the keep-set built so far.
        order = np.argsort(-vals.sum(axis=1), kind="stable")
        vals = vals[order]
        keep_rows = []
        kept = np.empty((0, vals.shape[1]), dtype=vals.dtype)
        for i in range(len(vals)):
            v = vals[i]
            if len(kept):
                ge = (kept >= v).all(axis=1)
                gt = (kept > v).any(axis=1)
                if bool((ge & gt).any()):
                    continue
            keep_rows.append(order[i])
            kept = np.vstack([kept, v[None, :]])
            if len(kept) > max_local:
                raise ValueError(
                    f"local skyline exceeds max_local={max_local}; "
                    "pre-aggregate or raise the cap"
                )
        yield pdf.iloc[sorted(keep_rows)]

    local = pts.mapInPandas(_local_skyline, schema=schema)
    # stage 2: one merge partition over the (small) local-skyline
    # union; same filter => exact global skyline.
    return local.coalesce(1).mapInPandas(_local_skyline, schema=schema)
