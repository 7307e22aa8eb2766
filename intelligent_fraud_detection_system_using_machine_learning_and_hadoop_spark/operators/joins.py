"""Join operators Spark lacks natively: as-of join and range join.

Training-data/time-series extensions (no reference analogue — the
reference performs no explicit joins at all, SURVEY.md §2.3). Both are
compositions of built-in DataFrame ops, picked for their shuffle
behavior at scale:

* **as-of join**: the union + last-non-null-window formulation — ONE
  shuffle on the join key (same cost as a window over the fact table),
  no range cross-product, no per-key collect. This is how kdb's ``aj``
  / pandas ``merge_asof`` semantics map onto a shuffle engine.
* **range join**: grid-binned equi-join — each band explodes into the
  fixed-width grid cells it covers, the fact side computes its cell id
  arithmetically, and the join is a plain (broadcastable) equi-join on
  the cell followed by an exact bound re-check. Turns an O(n·m)
  nested-loop inequality join into hash lookups (the same trick behind
  Databricks' range-join optimization and interval trees in genomics
  engines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_STRUCT = "__asof_payload"


def _median_width(df: DataFrame, width_col: Column) -> float:
    """Approximate median interval width via one mergeable-sketch
    aggregate — never collects the band set to the driver (a band table
    can itself be large; the grid constant is the only scalar needed)."""
    row = df.agg(
        F.percentile_approx(width_col.cast("double"), F.lit(0.5), F.lit(10000)).alias(
            "w"
        )
    ).first()
    w = row["w"] if row is not None else None
    return max(float(w), 1e-12) if w is not None else 1e-12


def null_safe_equi_join(
    left: DataFrame,
    right: DataFrame,
    keys: list,
    how: str = "inner",
    broadcast_right: bool = False,
) -> DataFrame:
    """Equi-join on ``keys`` with IS NOT DISTINCT FROM semantics
    (NULL matches NULL), keeping the left frame's key columns — the
    shared utility behind the privacy audits and the streaming
    duplicate-charge state join (hoisted in r17 so the pattern has
    one home). A plain name-list ``df.join(other, keys)`` uses
    non-null-safe equality, silently dropping null-keyed rows; here
    right-side keys are renamed before the join so the condition
    never hits self-lineage ambiguity, the rename+drop keeps the
    output schema identical to the name-list form, and the broadcast
    hint (when requested) survives the projection."""
    ren = right
    for k in keys:
        ren = ren.withColumnRenamed(k, f"__nsj_{k}")
    if broadcast_right:
        ren = F.broadcast(ren)
    cond = None
    for k in keys:
        c = F.col(k).eqNullSafe(F.col(f"__nsj_{k}"))
        cond = c if cond is None else (cond & c)
    return left.join(ren, cond, how).drop(*[f"__nsj_{k}" for k in keys])


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_time: str,
    right_time: str,
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
    allow_exact_match: bool = True,
) -> DataFrame:
    """Backward as-of join: for every left row, attach the payload of the
    LAST right row with the same key and ``right_time <= left_time``
    (``<`` when ``allow_exact_match=False``). Left rows with no prior
    right row keep nulls (left-outer semantics, like ``merge_asof``).

    Plan shape: tag sides → union → one window over (key) ordered by
    (time, side) carrying ``last(payload, ignorenulls=True)`` → keep
    left rows. At an equal timestamp the right row sorts before the left
    row iff exact matches are allowed. Ties inside a side are broken by
    input arrival via monotonically_increasing_id so results are
    deterministic.

    One shuffle on the key; skew behaves exactly like any window over
    the same key (salt upstream if a single key dominates).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [
            c for c in right.columns if c not in keys and c != right_time
        ]
    out_cols = {c: f"{c}{suffix}" for c in right_cols}
    matched_time = f"{right_time}{suffix}" if right_time == left_time else right_time

    l_tag = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(
            right.select(
                F.struct(
                    F.col(right_time).alias(matched_time),
                    *[F.col(c).alias(out_cols[c]) for c in right_cols],
                ).alias(_STRUCT)
            ).schema[_STRUCT].dataType.simpleString()
        ).alias(_STRUCT),
        F.col(left_time).alias("__asof_time"),
    )
    r_tag = right.select(
        *[F.col(k) for k in keys],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in keys],
        F.lit(0).alias(_SIDE),
        F.struct(
            F.col(right_time).alias(matched_time),
            *[F.col(c).alias(out_cols[c]) for c in right_cols],
        ).alias(_STRUCT),
        F.col(right_time).alias("__asof_time"),
    )
    unioned = l_tag.unionByName(r_tag).withColumn(
        "__asof_seq", F.monotonically_increasing_id()
    )

    side_order = F.col(_SIDE).asc() if allow_exact_match else F.col(_SIDE).desc()
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__asof_time").asc(), side_order, F.col("__asof_seq").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumn(
        _STRUCT, F.last(_STRUCT, ignorenulls=True).over(w)
    )
    if not allow_exact_match:
        # with side desc, an equal-time right row sorts AFTER the left row
        # and is correctly invisible to it; nothing more to do.
        pass
    return (
        filled.where(F.col(_SIDE) == 1)
        .select(
            *[F.col(c) for c in left.columns],
            F.col(f"{_STRUCT}.{matched_time}").alias(matched_time),
            *[F.col(f"{_STRUCT}.{out_cols[c]}").alias(out_cols[c]) for c in right_cols],
        )
    )


def range_join_bands(
    fact: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    grid: float | None = None,
    broadcast_bands: bool = True,
) -> DataFrame:
    """Range (band) join: match each fact row to every band with
    ``lo <= value < hi``, as a grid-binned equi-join.

    Each band row explodes into the grid cells [floor(lo/g) ..
    floor((hi-ε)/g)]; the fact side computes ``floor(value/g)`` — a pure
    projection — and the join is an equi-join on the cell id with an
    exact bound re-check. ``grid`` defaults to the median band width
    (cells-per-band stays O(1)). Overlapping bands produce one output
    row per match, like the inequality join would.

    The bands side (cells × bands) is broadcast when small — zero
    shuffle of the fact table; with huge band sets turn
    ``broadcast_bands`` off for a shuffled equi-join on the cell id,
    which still beats the nested-loop inequality join it replaces.
    """
    if grid is None:
        grid = _median_width(bands, F.col(hi_col) - F.col(lo_col))
    cells = bands.withColumn(
        "__cell",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col).cast("double") / F.lit(grid)),
                F.floor(
                    (F.col(hi_col).cast("double") - F.lit(grid) * 1e-9)
                    / F.lit(grid)
                ),
            )
        ),
    )
    if broadcast_bands:
        cells = F.broadcast(cells)
    binned = fact.withColumn(
        "__cell", F.floor(F.col(value_col).cast("double") / F.lit(grid))
    )
    return (
        binned.join(cells, "__cell")
        .where(
            (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
        )
        .drop("__cell")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    on: str | list[str] | None = None,
    grid: float | None = None,
) -> DataFrame:
    """Interval overlap join: pairs where [left_start, left_end) ∩
    [right_start, right_end) ≠ ∅, optionally also matching equi-keys.

    Both sides explode into grid cells covered by their interval;
    candidates meet on (keys…, cell) and are de-duplicated (an overlap
    spanning k cells would otherwise match k times) then exactly
    verified with the half-open overlap predicate. Numeric domains only
    (cast timestamps to epoch seconds first).
    """
    keys = [] if on is None else ([on] if isinstance(on, str) else list(on))
    if grid is None:
        grid = _median_width(right, F.col(right_end) - F.col(right_start))

    def cellify(df: DataFrame, start: str, end: str) -> DataFrame:
        return df.withColumn(
            "__cell",
            F.explode(
                F.sequence(
                    F.floor(F.col(start).cast("double") / F.lit(grid)),
                    F.floor(
                        (F.col(end).cast("double") - F.lit(grid) * 1e-9)
                        / F.lit(grid)
                    ),
                )
            ),
        )

    lc = cellify(left, left_start, left_end).alias("l")
    rc = cellify(right, right_start, right_end).alias("r")
    cond = F.col("l.__cell") == F.col("r.__cell")
    for k in keys:
        cond = cond & (F.col(f"l.{k}") == F.col(f"r.{k}"))
    overlap = (F.col(f"l.{left_start}") < F.col(f"r.{right_end}")) & (
        F.col(f"r.{right_start}") < F.col(f"l.{left_end}")
    )
    left_out = [F.col(f"l.{c}") for c in left.columns]
    right_out = [
        F.col(f"r.{c}").alias(f"{c}_r" if c in left.columns else c)
        for c in right.columns
    ]
    return (
        lc.join(rc, cond)
        .where(overlap)
        .select(*left_out, *right_out)
        .distinct()
    )


def resample_locf(
    events: DataFrame,
    grid_start: str,
    grid_end: str,
    step: str = "1 day",
    key_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
) -> DataFrame:
    """Time-grid resampling with last-observation-carried-forward: for
    every (key, grid point) over ``[grid_start, grid_end]`` at ``step``
    intervals, the most recent observation at or before the grid point
    (null until the key's first observation) — the hypertable
    ``time_bucket_gapfill + locf`` shape, and the feature-store
    "as-of snapshot at training time T" primitive.

    Pure composition: the grid is ``sequence()`` + explode (no driver
    loop) crossed with the distinct key set (dimension-sized,
    broadcast); the fill is one backward :func:`asof_join` — i.e. ONE
    window shuffle on the key, identical cost to any keyed window at
    100 TB. Returns (key, grid_ts, value, obs_ts) with ``obs_ts`` the
    carried observation's timestamp for staleness auditing."""
    grid_pts = F.explode(
        F.sequence(
            F.lit(grid_start).cast("timestamp"),
            F.lit(grid_end).cast("timestamp"),
            F.expr(f"INTERVAL {step}"),
        )
    ).alias("grid_ts")
    keys = events.select(F.col(key_col)).distinct()
    grid = keys.crossJoin(
        events.sparkSession.range(1).select(grid_pts)
    )
    obs = events.select(
        F.col(key_col),
        F.col(ts_col).alias("_t"),
        F.col(ts_col).alias("_obs_ts"),  # payload copy of the obs time
        F.col(val_col).alias("_obs_val"),
    )
    out = asof_join(
        grid,
        obs,
        on=key_col,
        left_time="grid_ts",
        right_time="_t",
        right_cols=["_obs_val", "_obs_ts"],
        suffix="",
    )
    return out.select(
        F.col(key_col),
        "grid_ts",
        F.col("_obs_val").alias("value"),
        F.col("_obs_ts").alias("obs_ts"),
    )
