"""Join-operator query bindings: as-of join, range join, interval
overlap join (operators/joins.py) bound to the driver testdata.

DuckDB's native ASOF JOIN is the oracle for the as-of composition;
the range/interval grid joins are oracled by the plain inequality
joins they replace.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.joins import asof_join, interval_overlap_join, range_join_bands
from ..sources.readers import read_table
from .catalog import _EVENTS_US, _dec, _exact_double, _sql_exact_double, query

# ---------------------------------------------------------------------------
# as-of join: each click event ← the user's most recent prior purchase
# ---------------------------------------------------------------------------


@query(
    "asof_click_purchase",
    oracle=f"""
    WITH {_EVENTS_US},
    clicks AS (SELECT * FROM events_us WHERE event_type = 'click'),
    purchases AS (SELECT * FROM events_us WHERE event_type = 'purchase')
    SELECT c.event_id, c.user_id, c.ts,
           p.ts AS purchase_ts,
           p.value AS purchase_value
    FROM clicks c
    ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
    bench=True,
)
def asof_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join via the union + last-non-null window composition —
    one shuffle on user_id, no range cross-product (operators/joins.py).
    Oracle: DuckDB's native ASOF LEFT JOIN."""
    e = read_table(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click")
    purchases = e.where(F.col("event_type") == "purchase")
    joined = asof_join(
        clicks,
        purchases,
        on="user_id",
        left_time="ts",
        right_time="ts",
        right_cols=["value"],
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.col("ts_asof").alias("purchase_ts"),
        F.col("value_asof").alias("purchase_value"),
    )


# ---------------------------------------------------------------------------
# range join: orders → price bands
# ---------------------------------------------------------------------------

_PRICE_BANDS = [
    ("micro", 0.0, 50_000.0),
    ("small", 50_000.0, 150_000.0),
    ("mid", 150_000.0, 300_000.0),
    ("large", 300_000.0, 450_000.0),
    ("jumbo", 450_000.0, 600_000.0),
]

_SQL_BANDS = "(VALUES " + ", ".join(
    f"('{b}', CAST({lo} AS DOUBLE), CAST({hi} AS DOUBLE))" for b, lo, hi in _PRICE_BANDS
) + ") AS bands(band, lo, hi)"


@query(
    "range_join_price_bands",
    oracle=f"""
    SELECT band,
           COUNT(*) AS n_orders,
           {_sql_exact_double("SUM(CAST(o_totalprice AS DECIMAL(12,2)))", 2)} AS sum_price
    FROM orders JOIN {_SQL_BANDS}
      ON o_totalprice >= lo AND o_totalprice < hi
    GROUP BY band
    """,
)
def range_join_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join as a grid-binned broadcast equi-join (zero shuffle of
    the fact side) + exact bound re-check; oracled by the inequality
    join it replaces."""
    o = read_table(spark, sf_dir, "orders")
    bands = spark.createDataFrame(_PRICE_BANDS, "band string, lo double, hi double")
    joined = range_join_bands(o, bands, value_col="o_totalprice")
    return joined.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_orders"),
        _exact_double(F.sum(_dec(F.col("o_totalprice"), 12, 2)), 2).alias("sum_price"),
    )


# ---------------------------------------------------------------------------
# interval overlap join: ±5-min windows around purchases vs errors
# ---------------------------------------------------------------------------


@query(
    "interval_overlap_purchase_error",
    oracle=f"""
    WITH {_EVENTS_US},
    p AS (SELECT event_id, user_id,
                 epoch(ts) - 300 AS p_start, epoch(ts) + 300 AS p_end
          FROM events_us WHERE event_type = 'purchase'),
    e AS (SELECT event_id, user_id,
                 epoch(ts) - 300 AS e_start, epoch(ts) + 300 AS e_end
          FROM events_us WHERE event_type = 'error')
    SELECT DISTINCT p.event_id AS purchase_id, e.event_id AS error_id
    FROM p JOIN e
      ON p.user_id = e.user_id
     AND p.p_start < e.e_end AND e.e_start < p.p_end
    """,
)
def interval_overlap_purchase_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval overlap join via grid cells + exact verify: purchases
    and errors by the same user within ±5 minutes of each other."""
    ev = read_table(spark, sf_dir, "events")
    half = 300.0
    base = ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.col("ts").cast("double").alias("epoch"),
    )
    p = base.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        (F.col("epoch") - half).alias("p_start"),
        (F.col("epoch") + half).alias("p_end"),
    )
    e = base.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        "user_id",
        (F.col("epoch") - half).alias("e_start"),
        (F.col("epoch") + half).alias("e_end"),
    )
    joined = interval_overlap_join(
        p, e, "p_start", "p_end", "e_start", "e_end", on="user_id", grid=600.0
    )
    return joined.select("purchase_id", "error_id")
