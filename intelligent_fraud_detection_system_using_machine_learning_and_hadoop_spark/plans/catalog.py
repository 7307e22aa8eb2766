"""Query catalog: every implemented operator (SURVEY.md §2) bound to the
driver testdata, with a DuckDB oracle twin where the op is
SQL-expressible.

Oracle-parity design rules (so the driver's order-insensitive
value-hash matches bit-for-bit):

* Money/measure aggregates sum **fixed-point longs** (``_cents``) or
  decimals — exact and order-independent either way; double summation
  order differs between engines, integers don't.
* Averages are ``CAST(exact_sum AS DOUBLE) / count`` — one IEEE
  division of identical operands is deterministic; decimal division
  rounding modes are not.
* Percentiles use Spark's exact-percentile interpolation arithmetic
  spelled out identically on the DuckDB side (``_pctile_cte``) instead
  of engine builtins.
* Window orderings always carry a unique tiebreaker column.
* Every computed column is aliased lowercase identically on both sides.
* Counts are cast to BIGINT in DuckDB (its SUM(int) is HUGEINT).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.rules import RuleConfig, with_rule_flags
from ..sources.readers import read_table


@dataclass(frozen=True)
class QuerySpec:
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    bench: bool = False


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, bench: bool = False):
    def deco(fn):
        # a duplicate name would silently REPLACE an existing query —
        # and with it its oracle and driver-window slot (bitten in r9:
        # a new sampler reused an r8 name and evicted it)
        # explicit raise, not assert — must survive `python -O`
        if name in REGISTRY:
            raise ValueError(f"duplicate query registration: {name}")
        REGISTRY[name] = QuerySpec(fn, oracle, bench)
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.builder for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle}


def bench_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.builder for name, spec in REGISTRY.items() if spec.bench}


# --------------------------------------------------------------------------
# helpers
# --------------------------------------------------------------------------

def _dec(col, prec: int = 18, scale: int = 6):
    """Exact decimal cast for order-independent summation."""
    return col.cast(f"decimal({prec},{scale})")


def _exact_double(sum_col, scale: int):
    """Decimal sum → double, bit-identical across engines.

    DuckDB's DECIMAL→DOUBLE cast goes int128→double→÷10^scale (two
    roundings) while Spark's BigDecimal conversion is correctly rounded —
    they can differ in the last ulp. Routing through an exact BIGINT of
    the scaled value and one IEEE division is identical everywhere.
    """
    f = 10**scale
    return (sum_col * F.lit(f)).cast("long").cast("double") / F.lit(float(f))


def _sql_exact_double(sum_expr: str, scale: int) -> str:
    f = 10**scale
    return f"CAST(CAST(({sum_expr}) * {f} AS BIGINT) AS DOUBLE) / {float(f)}"


def _cents(col, scale: int = 2):
    """Fixed-point long: round(value·10^scale) — exact, order-free
    integer summation at a fraction of decimal aggregation's cost
    (whole-stage codegen sums longs; Decimal goes through BigDecimal).
    Valid because the testdata money/measure columns are true
    ``scale``-decimal values: v·10^scale sits within 1e-9 of an integer,
    so Spark HALF_UP and DuckDB round() pick the same integer."""
    return F.round(col * F.lit(10**scale)).cast("long")


def _sql_cents(col: str, scale: int = 2) -> str:
    return f"CAST(round({col} * {10**scale}) AS BIGINT)"


def _cents_sum_double(sum_col, total_scale: int):
    """Long fixed-point sum → double via one IEEE division (both
    engines convert the identical integer, so bit-identical)."""
    return sum_col.cast("double") / F.lit(float(10**total_scale))


def _sql_cents_sum_double(sum_expr: str, total_scale: int) -> str:
    # DuckDB SUM(BIGINT) returns HUGEINT → route through BIGINT first
    return f"CAST(CAST(({sum_expr}) AS BIGINT) AS DOUBLE) / {float(10**total_scale)}"


def _pctile_cte(table: str, col: str, q: float) -> str:
    """DuckDB scalar subquery: exact interpolated percentile, spelled as
    the SAME IEEE arithmetic Spark's exact ``percentile`` aggregate uses
    (``(ceil(pos)-pos)*v_lo + (pos-floor(pos))*v_hi``, with the
    integral-position case returning v_lo directly) so the two engines
    agree bitwise — functions.exprs.exact_percentile is the Spark side.
    """
    _pos = f"CAST(count({col})-1 AS DOUBLE)*CAST({q} AS DOUBLE)"
    return f"""(
        SELECT CASE WHEN ANY_VALUE(lo_rn) = ANY_VALUE(hi_rn)
                    THEN MAX(CASE WHEN rn = lo_rn THEN v END)
                    ELSE (ANY_VALUE(hi_pos) - ANY_VALUE(pos))
                           * MAX(CASE WHEN rn = lo_rn THEN v END)
                         + (ANY_VALUE(pos) - ANY_VALUE(lo_pos))
                           * MAX(CASE WHEN rn = hi_rn THEN v END)
               END
        FROM (SELECT CAST({col} AS DOUBLE) AS v,
                     row_number() OVER (ORDER BY {col}) AS rn
              FROM {table} WHERE {col} IS NOT NULL) o
        CROSS JOIN (SELECT {_pos} AS pos,
                           floor({_pos}) AS lo_pos,
                           ceil({_pos}) AS hi_pos,
                           CAST(floor({_pos}) AS BIGINT)+1 AS lo_rn,
                           CAST(ceil({_pos}) AS BIGINT)+1 AS hi_rn
                    FROM {table} WHERE {col} IS NOT NULL) p
    )"""


# --------------------------------------------------------------------------
# TPC-H-style relational core (SURVEY.md §2.2, §2.4, §2.6)
# --------------------------------------------------------------------------

_Q1_SUM_QTY = f"SUM({_sql_cents('l_quantity')})"
_Q1_SUM_PRICE = f"SUM({_sql_cents('l_extendedprice')})"
_Q1_SUM_DISC_PRICE = (
    f"SUM({_sql_cents('l_extendedprice')} * (100 - {_sql_cents('l_discount')}))"
)
_Q1_SUM_CHARGE = (
    f"SUM({_sql_cents('l_extendedprice')} * (100 - {_sql_cents('l_discount')})"
    f" * (100 + {_sql_cents('l_tax')}))"
)


@query(
    "pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {_sql_cents_sum_double(_Q1_SUM_QTY, 2)} AS sum_qty,
           {_sql_cents_sum_double(_Q1_SUM_PRICE, 2)} AS sum_base_price,
           {_sql_cents_sum_double(_Q1_SUM_DISC_PRICE, 4)} AS sum_disc_price,
           {_sql_cents_sum_double(_Q1_SUM_CHARGE, 6)} AS sum_charge,
           {_sql_cents_sum_double(_Q1_SUM_QTY, 2)} / COUNT(l_quantity) AS avg_qty,
           {_sql_cents_sum_double(_Q1_SUM_PRICE, 2)} / COUNT(l_extendedprice) AS avg_price,
           {_sql_cents_sum_double(f"SUM({_sql_cents('l_discount')})", 2)} / COUNT(l_discount) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    bench=True,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped scan→filter→hash-agg (ops P2, A-family, F6).

    One shuffle on the 6-value grouping key; partial aggregation
    (map-side combine) does nearly all the work before exchange — the
    plan that survives 100 TB. Money math in fixed-point longs
    (``_cents``): exact and order-free like decimal, ~2× cheaper in
    whole-stage codegen.
    """
    l = read_table(spark, sf_dir, "lineitem")
    price_c = _cents(F.col("l_extendedprice"))
    qty_c = _cents(F.col("l_quantity"))
    disc_c = _cents(F.col("l_discount"))
    tax_c = _cents(F.col("l_tax"))
    sum_qty = F.sum(qty_c)
    sum_price = F.sum(price_c)
    return (
        l.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _cents_sum_double(sum_qty, 2).alias("sum_qty"),
            _cents_sum_double(sum_price, 2).alias("sum_base_price"),
            _cents_sum_double(
                F.sum(price_c * (F.lit(100) - disc_c)), 4
            ).alias("sum_disc_price"),
            _cents_sum_double(
                F.sum(price_c * (F.lit(100) - disc_c) * (F.lit(100) + tax_c)), 6
            ).alias("sum_charge"),
            (_cents_sum_double(sum_qty, 2) / F.count("l_quantity")).alias("avg_qty"),
            (_cents_sum_double(sum_price, 2) / F.count("l_extendedprice")).alias(
                "avg_price"
            ),
            (
                _cents_sum_double(F.sum(disc_c), 2) / F.count("l_discount")
            ).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "count_distinct_having",
    oracle="""
    SELECT o_custkey, COUNT(DISTINCT o_orderpriority) AS n_priorities
    FROM orders GROUP BY o_custkey
    HAVING COUNT(DISTINCT o_orderpriority) > 1
    """,
)
def count_distinct_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference A1–A3 (``run_pipeline.py:24-25``): groupBy +
    countDistinct + HAVING. Exact distinct = expand+two-phase agg in
    Spark; at 100 TB swap to approx_count_distinct."""
    o = read_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.countDistinct("o_orderpriority").alias("n_priorities"))
        .where(F.col("n_priorities") > 1)
    )


@query(
    "status_priority_counts",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders GROUP BY o_orderstatus, o_orderpriority
    """,
)
def status_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference A7 (``app.py:41-42``, value_counts for the UI pie) and
    batch DISTINCT in one attestation: the grouped count at (status,
    priority) grain — its key set IS ``SELECT DISTINCT`` of the pair
    (Spark plans DISTINCT as this same hash-aggregate), and summing over
    priority recovers the per-status value_counts. Consolidates round
    1's ``value_counts`` + ``distinct_status_priority`` (both driver-
    green there). The streaming twin is streaming_distinct_pairs."""
    o = read_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )


@query(
    "scalar_stats_global",
    oracle=f"""
    SELECT MIN(o_orderdate) AS min_date, MAX(o_orderdate) AS max_date,
           COUNT(*) AS n,
           {_pctile_cte('lineitem', 'l_extendedprice', 0.5)} AS p50,
           {_pctile_cte('lineitem', 'l_extendedprice', 0.9)} AS p90,
           {_pctile_cte('lineitem', 'l_extendedprice', 0.99)} AS p99
    FROM orders
    """,
)
def scalar_stats_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference A5 + A4 in one 1-row plan (consolidates round 1's
    ``global_minmax_dates`` + ``percentile_exact``, both driver-green
    there): global min/max/count over orders (``train.py:19`` — cheap
    tree reduction, no shuffle) crossJoined with exact
    pandas-interpolation percentiles over lineitem prices
    (``run_pipeline.py:34``). Both sides stay LAZY — the percentiles
    are Spark's exact ``percentile`` aggregate, not an eager
    ``.first()``; the sketch variant (sketch_aggregates) is the 100 TB
    path for the order statistic."""
    o = read_table(spark, sf_dir, "orders")
    l = read_table(spark, sf_dir, "lineitem")
    minmax = o.agg(
        F.min("o_orderdate").alias("min_date"),
        F.max("o_orderdate").alias("max_date"),
        F.count(F.lit(1)).alias("n"),
    )
    price = F.col("l_extendedprice").cast("double")
    pct = l.agg(
        F.percentile(price, F.lit(0.5)).alias("p50"),
        F.percentile(price, F.lit(0.9)).alias("p90"),
        F.percentile(price, F.lit(0.99)).alias("p99"),
    )
    return minmax.crossJoin(F.broadcast(pct))


@query(
    "window_funcs_orders",
    oracle="""
    SELECT o_orderkey,
           CAST(date_diff('day',
                CAST(lag(o_orderdate) OVER wd AS DATE),
                CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since_prev,
           COUNT(DISTINCT o_orderpriority) OVER (PARTITION BY o_custkey) > 1 AS multi_priority,
           CAST(row_number() OVER wp AS BIGINT) AS rn,
           CAST(rank() OVER wp AS BIGINT) AS rnk,
           CAST(dense_rank() OVER wp AS BIGINT) AS drnk,
           CAST(ntile(4) OVER wp AS BIGINT) AS quartile,
           lead(o_orderkey) OVER wp AS next_okey,
           first_value(o_orderkey) OVER (PARTITION BY o_custkey
                                         ORDER BY o_totalprice DESC, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                                  AND UNBOUNDED FOLLOWING) AS top_okey
    FROM orders
    WINDOW wd AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
           wp AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def window_funcs_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The window-function family over ONE shuffle (consolidates round
    1's driver-green ``window_lag_days`` + ``window_distinct_flag`` +
    ``window_rank_orders``): three window specs — date-ordered lag
    (reference W1/W2, ``run_pipeline.py:39-40``), unordered collect_set
    distinct flag (W3; countDistinct is unsupported over Spark windows),
    and the price-ordered ranking family (row_number/rank/dense_rank/
    ntile/lead/first_value) — all partitioned by o_custkey, so Spark
    exchanges once and only re-sorts between specs. Every ordering
    carries the o_orderkey tiebreaker (pandas' stable sort is
    deterministic on ties; an unordered Spark window is not,
    SURVEY.md §2.5)."""
    o = read_table(spark, sf_dir, "orders")
    wd = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wu = Window.partitionBy("o_custkey")
    wp = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    wp_full = wp.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate", 1).over(wd))
        .cast("long")
        .alias("days_since_prev"),
        (F.size(F.collect_set("o_orderpriority").over(wu)) > 1).alias(
            "multi_priority"
        ),
        F.row_number().over(wp).cast("long").alias("rn"),
        F.rank().over(wp).cast("long").alias("rnk"),
        F.dense_rank().over(wp).cast("long").alias("drnk"),
        F.ntile(4).over(wp).cast("long").alias("quartile"),
        F.lead("o_orderkey").over(wp).alias("next_okey"),
        F.first("o_orderkey").over(wp_full).alias("top_okey"),
    )


@query(
    "semi_anti_join_customers",
    oracle="""
    SELECT c_custkey, c_name, 'offender' AS tag FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders
                        GROUP BY o_custkey
                        HAVING COUNT(DISTINCT o_orderpriority) > 1)
    UNION ALL
    SELECT c_custkey, c_name, 'no_orders' AS tag FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL)
    """,
)
def semi_anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI and LEFT ANTI in one tagged attestation (consolidates
    round 1's driver-green ``semi_join_offenders`` +
    ``anti_join_no_orders``): reference J1 (``run_pipeline.py:25-26``,
    the isin-against-list done right — broadcast left-semi against the
    small offender set, no driver collect) unioned with its complement
    (customers with no orders at all, left-anti)."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    offenders = (
        o.groupBy("o_custkey")
        .agg(F.countDistinct("o_orderpriority").alias("n"))
        .where(F.col("n") > 1)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    semi = c.join(F.broadcast(offenders), "c_custkey", "left_semi").select(
        "c_custkey", "c_name", F.lit("offender").alias("tag")
    )
    anti = c.join(
        o.select(F.col("o_custkey").alias("c_custkey")), "c_custkey", "left_anti"
    ).select("c_custkey", "c_name", F.lit("no_orders").alias("tag"))
    return semi.unionByName(anti)


@query(
    "topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference O1/O2: sort + limit. Spark plans TakeOrderedAndProject —
    per-partition top-k then a k-row merge on the driver, never a full
    global sort."""
    o = read_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(10)
    )


@query(
    "revenue_by_nation",
    oracle=f"""
    SELECT n_name,
           {_sql_cents_sum_double(f"SUM({_sql_cents('o_totalprice')})", 2)} AS revenue,
           COUNT(*) AS n_orders
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
    bench=True,
)
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈dim⋈dim join + agg (TPC-H Q5 shape). nation (25 rows) is
    broadcast explicitly; customer⋈orders shuffles on the join key with
    AQE free to pick broadcast when customer fits."""
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            _cents_sum_double(F.sum(_cents(F.col("o_totalprice"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@query(
    "shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {_sql_cents_sum_double(_Q1_SUM_DISC_PRICE, 4)} AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
    bench=True,
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → two joins → agg → top-k.
    Predicates push into all three parquet scans (check PushedFilters);
    top-k is TakeOrderedAndProject, not a global sort."""
    c = read_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = read_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    l = read_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            _cents_sum_double(
                F.sum(
                    _cents(F.col("l_extendedprice"))
                    * (F.lit(100) - _cents(F.col("l_discount")))
                ),
                4,
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@query(
    "grouping_analytics_orders",
    oracle="""
    SELECT n_name, c_mktsegment, COUNT(*) AS n,
           CAST(GROUPING(n_name) AS BIGINT) AS g_nation,
           CAST(GROUPING(c_mktsegment) AS BIGINT) AS g_segment
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY GROUPING SETS ((n_name, c_mktsegment), (n_name), (c_mktsegment), ())
    """,
)
def grouping_analytics_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The grouping-sets surface in one attestation (consolidates round
    1's driver-green ``rollup_order_counts`` + ``cube_order_counts`` +
    ``grouping_sets_orders``): explicit GROUPING SETS enumerating the
    full CUBE lattice over (n_name, c_mktsegment) — which contains
    ROLLUP's prefix sets — with GROUPING() indicators distinguishing
    'subtotal over null' from 'group whose key is null'. One Expand +
    one hash-agg pass over the joined fact, never one scan per set;
    nation (25 rows) broadcasts."""
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    joined = o.join(c, o.o_custkey == c.c_custkey).join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    )
    joined.createOrReplaceTempView("orders_grouping_src")
    return spark.sql(
        """
        SELECT n_name, c_mktsegment, COUNT(*) AS n,
               CAST(GROUPING(n_name) AS BIGINT) AS g_nation,
               CAST(GROUPING(c_mktsegment) AS BIGINT) AS g_segment
        FROM orders_grouping_src
        GROUP BY GROUPING SETS ((n_name, c_mktsegment), (n_name), (c_mktsegment), ())
        """
    )


@query(
    "set_ops_custkeys",
    oracle="""
    SELECT custkey, 'both_eras' AS tag FROM (
      SELECT o_custkey AS custkey FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01'
      INTERSECT
      SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01')
    UNION ALL
    SELECT custkey, 'churned' AS tag FROM (
      SELECT o_custkey AS custkey FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01'
      EXCEPT
      SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01')
    UNION ALL
    SELECT c_custkey AS custkey, 'customer_dim' AS tag FROM customer
    """,
)
def set_ops_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The set-operator family in one tagged plan (consolidates round
    1's driver-green ``set_intersect_custkeys`` + ``set_except_custkeys``
    + ``union_all_tagged``): INTERSECT (customers active in both eras),
    EXCEPT (churned after the early era), and a schema-normalized UNION
    ALL branch from a heterogenous scan. Intersect/except hash-aggregate
    on the key; union all is free concatenation."""
    o = read_table(spark, sf_dir, "orders")
    early = o.where(
        F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp")
    ).select(F.col("o_custkey").alias("custkey"))
    late = o.where(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    ).select(F.col("o_custkey").alias("custkey"))
    c = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey")
    )
    return (
        early.intersect(late)
        .withColumn("tag", F.lit("both_eras"))
        .unionByName(early.subtract(late).withColumn("tag", F.lit("churned")))
        .unionByName(c.withColumn("tag", F.lit("customer_dim")))
    )


# --------------------------------------------------------------------------
# The reference's flagship rule pipeline, bound to testdata
# --------------------------------------------------------------------------

ORDERS_RULES = RuleConfig(
    id_col="o_custkey",
    name_col="o_orderpriority",
    amount_col="o_totalprice",
    date_col="o_orderdate",
    tiebreak_cols=("o_orderkey",),
    # o_orderpriority has 5 distinct values — a collect_set window
    # partitioned by it degenerates to 5 tasks at any scale; the
    # grouped-agg + broadcast-join strategy has no hot-key problem.
    strategy="semi_join",
    labels={
        "dup_id": "MultiPriority",
        "multi_id": "SharedPriority",
        "high_amount": "HighAmount",
        "frequent": "FrequentOrders",
    },
)


@query(
    "rule_flags_orders",
    oracle=f"""
    WITH base AS (
      SELECT o_orderkey, o_custkey, o_orderpriority, o_totalprice, o_orderdate,
             COUNT(DISTINCT o_orderpriority) OVER (PARTITION BY o_custkey) AS n_prio,
             COUNT(DISTINCT o_custkey) OVER (PARTITION BY o_orderpriority) AS n_cust,
             lag(o_orderdate) OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate, o_orderkey) AS prev_date
      FROM orders),
    flagged AS (
      SELECT o_orderkey,
             CAST(date_diff('day', CAST(prev_date AS DATE),
                            CAST(o_orderdate AS DATE)) AS BIGINT) AS days_diff,
             (CASE WHEN n_prio > 1 THEN 'MultiPriority;' ELSE '' END
              || CASE WHEN n_cust > 1 THEN 'SharedPriority;' ELSE '' END
              || CASE WHEN o_totalprice > {_pctile_cte('orders', 'o_totalprice', 0.99)}
                      THEN 'HighAmount;' ELSE '' END
              || CASE WHEN date_diff('day', CAST(prev_date AS DATE),
                                     CAST(o_orderdate AS DATE)) <= 7
                      THEN 'FrequentOrders;' ELSE '' END) AS flags
      FROM base)
    SELECT o_orderkey, days_diff,
           CASE WHEN flags = '' THEN 'Normal' ELSE flags END AS rule_fraud
    FROM flagged
    """,
    bench=True,
)
def rule_flags_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's full rule engine (``run_pipeline.py:22-43``)
    rebound to orders: multi-priority customers, shared priorities,
    >p99 amounts, repeat orders ≤7 days. Exercises the production
    ``operators.rules.with_rule_flags`` code path end-to-end."""
    o = read_table(spark, sf_dir, "orders")
    flagged = with_rule_flags(o, ORDERS_RULES)
    return flagged.select(
        "o_orderkey",
        F.col("DaysDiff").cast("long").alias("days_diff"),
        F.col("RuleFraud").alias("rule_fraud"),
    )


# --------------------------------------------------------------------------
# events: JSON extraction, time bucketing, sessionization
# --------------------------------------------------------------------------

#: events.ts is parquet TIMESTAMP(NANOS); Spark reads it truncated to µs
#: (sources.readers), so oracles align on the same truncation.
_EVENTS_US = (
    "events_us AS (SELECT * REPLACE (make_timestamp(epoch_us(ts)) AS ts) FROM events)"
)


@query(
    "json_extract_events",
    oracle="""
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
    """,
)
def json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured column access (F-family extension): JSON path
    extraction stays JVM-side via get_json_object."""
    e = read_table(spark, sf_dir, "events")
    return e.select(
        "event_id", F.get_json_object("props", "$.k").cast("long").alias("k")
    )


@query(
    "events_hourly",
    oracle=f"""
    WITH {_EVENTS_US}
    SELECT date_trunc('hour', ts) AS hour_ts, event_type,
           COUNT(*) AS n,
           {_sql_exact_double("SUM(CAST(value AS DECIMAL(12,2)))", 2)} AS sum_value
    FROM events_us GROUP BY date_trunc('hour', ts), event_type
    """,
    bench=True,
)
def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation in batch form — the exact plan the
    streaming path (streaming/) runs incrementally with a watermark."""
    e = read_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour_ts"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            _exact_double(F.sum(_dec(F.col("value"), 12, 2)), 2).alias("sum_value"),
        )
    )


@query(
    "sessionize_events",
    oracle=f"""
    WITH {_EVENTS_US},
    lagged AS (
      SELECT user_id, event_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events_us),
    numbered AS (
      SELECT user_id, event_id, ts,
             SUM(CASE WHEN prev_ts IS NULL
                        OR date_diff('second', prev_ts, ts) > 1800
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM lagged)
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events,
           CAST(date_diff('second', MIN(ts), MAX(ts)) AS BIGINT) AS duration_sec
    FROM numbered GROUP BY user_id, session_id
    """,
    bench=True,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization (30-min inactivity gap): lag →
    boundary flag → running sum → per-session agg. One shuffle on
    user_id serves both windows and the final groupBy."""
    e = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    gap_sec = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts", 1).over(w))
    boundary = F.when(
        F.lag("ts", 1).over(w).isNull() | (gap_sec > 1800), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        e.withColumn("session_id", F.sum(boundary).over(run).cast("long"))
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts")))
            .cast("long")
            .alias("duration_sec"),
        )
    )


# --------------------------------------------------------------------------
# Wider relational surface: pivot, cube, scalar subquery, union, ranking
# --------------------------------------------------------------------------

_STATUSES = ["F", "O", "P"]


@query(
    "pivot_status_by_nation",
    oracle="""
    SELECT n_name,
           COUNT(*) FILTER (o_orderstatus = 'F') AS status_f,
           COUNT(*) FILTER (o_orderstatus = 'O') AS status_o,
           COUNT(*) FILTER (o_orderstatus = 'P') AS status_p
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def pivot_status_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long→wide) with an explicit value list — no extra
    distinct-values job, output schema fixed at plan time (the only
    sane pivot at scale)."""
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    wide = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .pivot("o_orderstatus", _STATUSES)
        .count()
    )
    out = wide.select(
        "n_name",
        *[
            F.coalesce(F.col(s), F.lit(0)).alias(f"status_{s.lower()}")
            for s in _STATUSES
        ],
    )
    return out


@query(
    "scalar_subquery_above_avg",
    oracle=f"""
    SELECT o_orderkey, {_sql_exact_double("CAST(o_totalprice AS DECIMAL(12,2))", 2)} AS o_totalprice
    FROM orders
    WHERE o_totalprice > (SELECT {_sql_exact_double("SUM(CAST(o_totalprice AS DECIMAL(12,2)))", 2)}
                                 / COUNT(o_totalprice)
                          FROM orders)
    """,
)
def scalar_subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-aggregate barrier done declaratively: the global average
    joins in as a broadcast 1-row crossJoin — no .collect(), one
    Catalyst plan, reusable under AQE (reference A5/A6 shape)."""
    o = read_table(spark, sf_dir, "orders")
    avg_df = o.agg(
        (
            _exact_double(F.sum(_dec(F.col("o_totalprice"), 12, 2)), 2)
            / F.count("o_totalprice")
        ).alias("avg_price")
    )
    return (
        o.crossJoin(F.broadcast(avg_df))
        .where(F.col("o_totalprice") > F.col("avg_price"))
        .select(
            "o_orderkey",
            _exact_double(_dec(F.col("o_totalprice"), 12, 2), 2).alias("o_totalprice"),
        )
    )


@query(
    "exists_late_shipments",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def exists_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS (TPC-H Q4 shape) as a conditioned left-semi
    join — one pass over lineitem, no decorrelation subtleties, dedup
    for free from semi-join semantics."""
    o = read_table(spark, sf_dir, "orders")
    l = read_table(spark, sf_dir, "lineitem")
    return (
        o.join(
            l,
            (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "suppliers_by_region",
    oracle=f"""
    SELECT r_name,
           COUNT(*) AS n_suppliers,
           {_sql_cents_sum_double(f"SUM({_sql_cents('s_acctbal')})", 2)} AS sum_acctbal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def suppliers_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake-dim chain (supplier→nation→region): two broadcast hops,
    zero shuffles of the fact side before the final 5-group agg."""
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            _cents_sum_double(F.sum(_cents(F.col("s_acctbal"))), 2).alias(
                "sum_acctbal"
            ),
        )
    )


_ROLLING_ANOMALY_ORACLE = f"""
    WITH {{events_us}},
    c AS (
      SELECT event_id, user_id, ts, value,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events_us),
    w AS (
      SELECT event_id, value,
             COUNT(cents) OVER win AS n_prior,
             SUM(cents) OVER win AS s1,
             SUM(CAST(cents AS HUGEINT) * CAST(cents AS HUGEINT)) OVER win AS s2
      FROM c
      WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
    SELECT event_id, CAST(n_prior AS BIGINT) AS n_prior,
           CASE WHEN n_prior = 0 THEN FALSE
                ELSE value > (CAST(s1 AS DOUBLE) / n_prior / 100.0)
                             + 2 * sqrt(greatest(
                                 CAST(s2 AS DOUBLE) / n_prior / 10000.0
                                 - (CAST(s1 AS DOUBLE) / n_prior / 100.0)
                                   * (CAST(s1 AS DOUBLE) / n_prior / 100.0),
                                 0.0))
           END AS is_anomaly
    FROM w
"""


@query(
    "rolling_anomaly_events",
    oracle=_ROLLING_ANOMALY_ORACLE.format(events_us=_EVENTS_US),
)
def rolling_anomaly_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling per-user anomaly flag: each event vs mean+2σ of that
    user's PRIOR events — the streamable redesign of the reference's
    batch-relative threshold (M6, SURVEY.md §7 'batch-relative
    threshold doesn't stream'). Exact integer moments in a
    ROWS UNBOUNDED PRECEDING..1 PRECEDING frame; only the boolean and
    count are emitted so cross-engine float parity reduces to one
    identical IEEE expression."""
    e = read_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    c19 = cents.cast("decimal(19,0)")
    win = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    n_prior = F.count(cents).over(win)
    s1 = F.sum(cents).over(win)
    s2 = F.sum(c19 * c19).over(win)
    mean = s1.cast("double") / n_prior / F.lit(100.0)
    var = F.greatest(
        s2.cast("double") / n_prior / F.lit(10000.0) - mean * mean, F.lit(0.0)
    )
    return e.select(
        "event_id",
        n_prior.cast("long").alias("n_prior"),
        F.when(n_prior == 0, F.lit(False))
        .otherwise(F.col("value") > mean + 2 * F.sqrt(var))
        .alias("is_anomaly"),
    )


@query(
    "big_spenders_vs_nation",
    oracle=f"""
    WITH spend AS (
      SELECT o_custkey, CAST(SUM({_sql_cents('o_totalprice')}) AS BIGINT) AS s
      FROM orders GROUP BY o_custkey),
    joined AS (
      SELECT c_custkey, c_nationkey, s FROM spend
      JOIN customer ON o_custkey = c_custkey),
    nat AS (
      SELECT c_nationkey,
             CAST(CAST(SUM(s) AS BIGINT) AS DOUBLE) / COUNT(*) AS avg_cents
      FROM joined GROUP BY c_nationkey)
    SELECT c_custkey,
           CAST(s AS DOUBLE) / 100.0 AS spend
    FROM joined JOIN nat USING (c_nationkey)
    WHERE CAST(s AS DOUBLE) > 2 * avg_cents
    """,
)
def big_spenders_vs_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested aggregation (agg of agg): per-customer spend → per-nation
    average of those spends → customers above 2× their nation's
    average. Two hash-aggs + one broadcast of the 25-row nation stats;
    the fact table shuffles once."""
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    spend = o.groupBy("o_custkey").agg(
        F.sum(_cents(F.col("o_totalprice"))).alias("s")
    )
    joined = spend.join(c, spend.o_custkey == c.c_custkey).select(
        "c_custkey", "c_nationkey", "s"
    )
    nat = joined.groupBy("c_nationkey").agg(
        (F.sum("s").cast("double") / F.count(F.lit(1))).alias("avg_cents")
    )
    return (
        joined.join(F.broadcast(nat), "c_nationkey")
        .where(F.col("s").cast("double") > 2 * F.col("avg_cents"))
        .select(
            "c_custkey", (F.col("s").cast("double") / F.lit(100.0)).alias("spend")
        )
    )


@query(
    "shipmode_priority_counts",
    oracle="""
    SELECT l_linestatus,
           COUNT(*) FILTER (o_orderpriority IN ('1-URGENT', '2-HIGH')) AS high_line_count,
           COUNT(*) FILTER (o_orderpriority NOT IN ('1-URGENT', '2-HIGH')) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_linestatus
    """,
)
def shipmode_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: join + conditional counting (CASE inside the
    agg, one pass — never two filtered scans)."""
    o = read_table(spark, sf_dir, "orders")
    l = read_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(is_high, 1)).alias("high_line_count"),
            F.count(F.when(~is_high, 1)).alias("low_line_count"),
        )
    )


@query(
    "promo_revenue_ratio",
    oracle=f"""
    SELECT CAST(CAST(SUM(CASE WHEN p_type = 'PROMO'
                 THEN {_sql_cents('l_extendedprice')} * (100 - {_sql_cents('l_discount')})
                 ELSE 0 END) AS BIGINT) AS DOUBLE)
           / CAST(CAST(SUM({_sql_cents('l_extendedprice')} * (100 - {_sql_cents('l_discount')})) AS BIGINT) AS DOUBLE)
           * 100.0 AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    """,
)
def promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: join + conditional-sum ratio in one aggregation
    (exact integer numerator/denominator; one IEEE division each)."""
    l = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")
    disc_rev = _cents(F.col("l_extendedprice")) * (
        F.lit(100) - _cents(F.col("l_discount"))
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            (
                F.sum(F.when(F.col("p_type") == "PROMO", disc_rev).otherwise(F.lit(0)))
                .cast("double")
                / F.sum(disc_rev).cast("double")
                * F.lit(100.0)
            ).alias("promo_pct")
        )
    )


# --------------------------------------------------------------------------
# Advanced relational shapes (TPC-H Q2/Q17/Q21 flavors, adapted to the
# available schema: lineitem carries the part↔supplier link). Registered
# after the driver window — verified by the local oracle gate
# (tools/check_oracle.py) and available for future window rotation.
# --------------------------------------------------------------------------


@query(
    "min_price_supplier_per_part",
    oracle="""
    WITH m AS (
      SELECT l_partkey, l_suppkey, l_extendedprice,
             MIN(l_extendedprice) OVER (PARTITION BY l_partkey) AS min_price
      FROM lineitem)
    SELECT DISTINCT p_partkey, s_name, l_extendedprice AS min_price
    FROM m JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    WHERE l_extendedprice = min_price
    """,
)
def min_price_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 flavor: the argmin-per-group join — for every part, the
    supplier(s) quoting its minimum observed price. One window min over
    l_partkey (no self-join against a grouped subquery), equality
    filter, then dim joins; ties emit every minimal supplier, so no
    tiebreak arithmetic is needed for cross-engine parity (the min of a
    double column is an exact value, not a computation)."""
    l = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")
    s = read_table(spark, sf_dir, "supplier")
    w = Window.partitionBy("l_partkey")
    m = l.select(
        "l_partkey",
        "l_suppkey",
        "l_extendedprice",
        F.min("l_extendedprice").over(w).alias("min_price"),
    ).where(F.col("l_extendedprice") == F.col("min_price"))
    return (
        m.join(p, m.l_partkey == p.p_partkey)
        .join(s, m.l_suppkey == s.s_suppkey)
        .select("p_partkey", "s_name", F.col("l_extendedprice").alias("min_price"))
        .distinct()
    )


@query(
    "small_qty_order_revenue",
    oracle=f"""
    WITH a AS (
      SELECT l_partkey,
             CAST(CAST(SUM({_sql_cents('l_quantity')}) AS BIGINT) AS DOUBLE)
               / COUNT(*) / 100.0 AS avg_qty
      FROM lineitem GROUP BY l_partkey)
    SELECT {_sql_cents_sum_double(f"SUM({_sql_cents('l_extendedprice')})", 2)} / 7.0 AS avg_yearly
    FROM lineitem JOIN a USING (l_partkey)
    WHERE l_quantity < 0.2 * avg_qty
    """,
)
def small_qty_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated per-group scalar (the part's average
    quantity) decorrelated into an aggregate + equi-join — the plan
    Catalyst/DuckDB both produce for the correlated form, written
    explicitly. Both sides shuffle on l_partkey (co-partitioned; AQE
    free to broadcast the 1-row-per-part agg side). Exact integer
    moments for the average; one shared IEEE comparison."""
    l = read_table(spark, sf_dir, "lineitem")
    a = l.groupBy("l_partkey").agg(
        (
            F.sum(_cents(F.col("l_quantity"))).cast("double")
            / F.count(F.lit(1))
            / F.lit(100.0)
        ).alias("avg_qty")
    )
    return (
        l.join(a, "l_partkey")
        .where(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (
                _cents_sum_double(F.sum(_cents(F.col("l_extendedprice"))), 2)
                / F.lit(7.0)
            ).alias("avg_yearly")
        )
    )


@query(
    "exclusive_late_suppliers",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
    late AS (
      SELECT DISTINCT l_orderkey, l_suppkey
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY)
    SELECT s_name, COUNT(*) AS numwait
    FROM late l1
    JOIN supplier ON l1.l_suppkey = s_suppkey
    WHERE EXISTS (SELECT 1 FROM pairs l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s_name
    """,
)
def exclusive_late_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: EXISTS + NOT EXISTS stacked on one fact — late
    (order, supplier) pairs where ANOTHER supplier shares the order
    (conditioned left-semi) but NO other supplier was late on it
    (conditioned left-anti). Both subqueries run over pre-deduped
    (orderkey, suppkey) pair sets, so each is one shuffle on the order
    key — never a per-row re-probe of lineitem."""
    l = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    s = read_table(spark, sf_dir, "supplier")
    pairs = l.select("l_orderkey", "l_suppkey").distinct()
    late = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .where(
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    l1 = late.alias("l1")
    l2 = pairs.alias("l2")
    l3 = late.alias("l3")
    with_other = l1.join(
        l2,
        (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
        "left_semi",
    )
    exclusive = with_other.alias("l1").join(
        l3,
        (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
        "left_anti",
    )
    return (
        exclusive.join(s, exclusive.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@query(
    "dominant_part_suppliers",
    oracle="""
    WITH per AS (
      SELECT l_partkey, l_suppkey,
             CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_c
      FROM lineitem GROUP BY l_partkey, l_suppkey),
    tot AS (
      SELECT l_partkey, CAST(SUM(qty_c) AS BIGINT) AS total_c
      FROM per GROUP BY l_partkey),
    dom AS (
      SELECT l_suppkey, COUNT(*) AS n_dominated_parts
      FROM per JOIN tot USING (l_partkey)
      WHERE 2 * qty_c > total_c
      GROUP BY l_suppkey)
    SELECT s_name, n_dominated_parts
    FROM supplier JOIN dom ON s_suppkey = dom.l_suppkey
    """,
)
def dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 flavor: nested IN over an aggregate threshold — count,
    per supplier, the parts where that supplier shipped MORE THAN HALF
    of the part's total quantity. The correlated 'more than half of the
    part total' predicate decorrelates into two stacked aggregations
    (per (part, supplier), then per part) + one equi-join — re-using the
    first agg's partitioning for the second (partial agg on the same
    key prefix). Exact integer quantity sums; the comparison is integer,
    so no float parity concerns at all."""
    l = read_table(spark, sf_dir, "lineitem")
    per = l.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(_cents(F.col("l_quantity"))).alias("qty_c")
    )
    tot = per.groupBy("l_partkey").agg(F.sum("qty_c").alias("total_c"))
    dominated = (
        per.join(tot, "l_partkey")
        .where(2 * F.col("qty_c") > F.col("total_c"))
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n_dominated_parts"))
    )
    s = read_table(spark, sf_dir, "supplier")
    return s.join(dominated, s.s_suppkey == dominated.l_suppkey).select(
        "s_name", "n_dominated_parts"
    )


@query(
    "nation_pair_volume",
    oracle=f"""
    SELECT sn.n_name AS supp_nation,
           cn.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS ship_year,
           {_sql_cents_sum_double(_Q1_SUM_DISC_PRICE, 4)} AS volume
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <= TIMESTAMP '1997-12-31'
    GROUP BY 1, 2, 3
    """,
)
def nation_pair_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between a nation PAIR by year —
    the role-playing-dimension join (nation joins twice, once through
    supplier, once through customer). Both nation dims and supplier
    broadcast; the symmetric pair predicate lands AFTER both dims so
    Catalyst can push each side's IsNotNull into the scans; revenue is
    the exact cents-product sum (Q1 convention)."""
    from ..sources.readers import read_table

    li = read_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") <= F.lit("1997-12-31").cast("timestamp"))
    )
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    disc_price = _cents(F.col("l_extendedprice")) * (
        F.lit(100) - _cents(F.col("l_discount"))
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .where(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("ship_year"),
        )
        .agg(_cents_sum_double(F.sum(disc_price), 4).alias("volume"))
    )


@query(
    "market_share_by_year",
    oracle=f"""
    WITH v AS (
      SELECT CAST(year(l_shipdate) AS BIGINT) AS ship_year,
             sn.n_name AS supp_nation,
             {_sql_cents('l_extendedprice')} * (100 - {_sql_cents('l_discount')}) AS vol_c4
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey)
    SELECT ship_year,
           CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_1' THEN vol_c4 ELSE 0 END) AS BIGINT) AS DOUBLE)
             / CAST(CAST(SUM(vol_c4) AS BIGINT) AS DOUBLE) AS mkt_share,
           {_sql_cents_sum_double("SUM(vol_c4)", 4)} AS total_volume
    FROM v
    GROUP BY ship_year
    """,
)
def market_share_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of total shipping volume per
    year — conditional aggregation (CASE-sum over the same rows as the
    total) in ONE pass over the joined fact, supplier and nation
    broadcast. The share is a ratio of two exact cents-integer sums, so
    the double division is bit-identical across engines."""
    from ..sources.readers import read_table

    li = read_table(spark, sf_dir, "lineitem")
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    vol = _cents(F.col("l_extendedprice")) * (
        F.lit(100) - _cents(F.col("l_discount"))
    )
    joined = (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.year("l_shipdate").cast("long").alias("ship_year"),
            F.col("n_name").alias("supp_nation"),
            vol.alias("vol_c4"),
        )
    )
    cond = F.sum(
        F.when(F.col("supp_nation") == "NATION_1", F.col("vol_c4")).otherwise(F.lit(0))
    )
    total = F.sum(F.col("vol_c4"))
    return joined.groupBy("ship_year").agg(
        (cond.cast("double") / total.cast("double")).alias("mkt_share"),
        _cents_sum_double(total, 4).alias("total_volume"),
    )


@query(
    "important_parts_value",
    oracle=f"""
    WITH rp AS (
      SELECT l_partkey,
             CAST(SUM({_sql_cents('l_extendedprice')}
                      * (100 - {_sql_cents('l_discount')})) AS BIGINT) AS v
      FROM lineitem GROUP BY l_partkey),
    t AS (SELECT CAST(SUM(v) AS BIGINT) AS tv, COUNT(*) AS np FROM rp)
    SELECT l_partkey, {_sql_cents_sum_double("SUM(v)", 4)} AS part_value
    FROM rp, t
    WHERE v * np * 10 > tv * 12
    GROUP BY l_partkey, tv
    """,
    bench=True,
)
def important_parts_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-group value HAVING > threshold-of-global —
    the grouped aggregate feeds BOTH the per-part rows and (re-aggregated)
    the global threshold, which joins back as a broadcast 1-row
    crossJoin: one scan, two agg stages, no eager scalar collect. The
    'important' test (value > 1.2× the mean part value, spelled as the
    cross-multiplication v·np·10 > total·12) is pure integer
    arithmetic — exact on both engines, no float-threshold edge rows,
    and scale-stable selectivity on uniform data where a Q11-style
    global-fraction cut is all-or-nothing."""
    from ..sources.readers import read_table

    li = read_table(spark, sf_dir, "lineitem")
    rp = li.groupBy("l_partkey").agg(
        F.sum(
            _cents(F.col("l_extendedprice")) * (F.lit(100) - _cents(F.col("l_discount")))
        ).alias("v")
    )
    # decimal(38,0) for the global re-agg and cross-multiplication:
    # at 100 TB the corpus-wide cents⁴ sum (and v·np) exceeds int64,
    # while per-part sums stay comfortably long
    total = rp.agg(
        F.sum(F.col("v").cast("decimal(38,0)")).alias("tv"),
        F.count(F.lit(1)).alias("np"),
    )
    return (
        rp.crossJoin(F.broadcast(total))
        .where(
            F.col("v").cast("decimal(38,0)") * F.col("np") * 10
            > F.col("tv") * 12
        )
        .select("l_partkey", _cents_sum_double(F.col("v"), 4).alias("part_value"))
    )


@query(
    "top_revenue_supplier",
    oracle=f"""
    WITH r AS (
      SELECT l_suppkey,
             CAST(SUM({_sql_cents('l_extendedprice')}
                      * (100 - {_sql_cents('l_discount')})) AS BIGINT) AS v
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey),
    m AS (SELECT MAX(v) AS mv FROM r)
    SELECT s_suppkey, s_name, {_sql_cents_sum_double("SUM(v)", 4)} AS total_revenue
    FROM r JOIN supplier ON l_suppkey = s_suppkey, m
    WHERE v = mv
    GROUP BY s_suppkey, s_name
    """,
    bench=True,
)
def top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: argmax over a grouped aggregate, ties kept —
    the max joins back as a broadcast 1-row crossJoin and the filter is
    an exact integer equality (no float-max tie ambiguity). No global
    sort: the 'top' is an aggregate, not an orderBy."""
    from ..sources.readers import read_table

    li = read_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    s = read_table(spark, sf_dir, "supplier")
    r = li.groupBy("l_suppkey").agg(
        F.sum(
            _cents(F.col("l_extendedprice")) * (F.lit(100) - _cents(F.col("l_discount")))
        ).alias("v")
    )
    m = r.agg(F.max("v").alias("mv"))
    return (
        r.crossJoin(F.broadcast(m))
        .where(F.col("v") == F.col("mv"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            _cents_sum_double(F.col("v"), 4).alias("total_revenue"),
        )
    )


@query(
    "disjunctive_brand_revenue",
    oracle=f"""
    SELECT {_sql_cents_sum_double(
        f"SUM({_sql_cents('l_extendedprice')} * (100 - {_sql_cents('l_discount')}))", 4
    )} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
    bench=True,
)
def disjunctive_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-conjunction predicate blocks across both
    join sides. Catalyst splits the disjunction: the common join key
    stays an equi-join, per-side implied predicates (brand IN ...,
    size <= 15, quantity <= 30) are derived and pushed into BOTH
    parquet scans, and the residual OR evaluates post-join — the test
    that disjunctions don't silently disable pushdown."""
    from ..sources.readers import read_table

    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")
    q, b, sz = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    blocks = (
        ((b == "Brand#12") & sz.between(1, 5) & q.between(1, 11))
        | ((b == "Brand#23") & sz.between(1, 10) & q.between(10, 20))
        | ((b == "Brand#3") & sz.between(1, 15) & q.between(20, 30))
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .where(blocks)
        .agg(
            _cents_sum_double(
                F.sum(
                    _cents(F.col("l_extendedprice"))
                    * (F.lit(100) - _cents(F.col("l_discount")))
                ),
                4,
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "idle_rich_customers",
    oracle=f"""
    WITH pos AS (
      SELECT CAST(SUM({_sql_cents('c_acctbal')}) AS BIGINT) AS s,
             COUNT(*) AS n
      FROM customer WHERE c_acctbal > 0.0),
    rich AS (
      SELECT c_custkey % 10 AS code, c_acctbal
      FROM customer, pos
      WHERE {_sql_cents('c_acctbal')} * n > s
        AND NOT EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey
            AND o_orderdate >= TIMESTAMP '2001-01-01'))
    SELECT code, COUNT(*) AS n_cust,
           {_sql_cents_sum_double(f"SUM({_sql_cents('c_acctbal')})", 2)} AS total_bal
    FROM rich GROUP BY code
    """,
    bench=True,
)
def idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar-average subquery + anti join + grouped
    rollup. 'Above average balance' is spelled as the exact integer
    cross-multiplication cents(bal)·n > Σcents(bal) (no float-average
    threshold edge rows); the average joins in as a broadcast 1-row
    crossJoin and recent orders anti-join with their date filter pushed
    to the scan."""
    from ..sources.readers import read_table

    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp")
    )
    pos = c.where(F.col("c_acctbal") > 0.0).agg(
        F.sum(_cents(F.col("c_acctbal"))).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    rich = (
        c.crossJoin(F.broadcast(pos))
        .where(_cents(F.col("c_acctbal")) * F.col("n") > F.col("s"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
    )
    return (
        rich.groupBy((F.col("c_custkey") % 10).alias("code"))
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            _cents_sum_double(F.sum(_cents(F.col("c_acctbal"))), 2).alias("total_bal"),
        )
    )


@query(
    "salted_distinct_suppliers",
    oracle="""
    SELECT o_custkey, COUNT(DISTINCT l_suppkey) AS n_suppliers
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_custkey
    """,
    bench=True,
)
def salted_distinct_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof exact distinct count (operators/skew.py): suppliers
    per customer counted via hash-sharded two-stage distinct — the hot
    customer's supplier set spreads over 16 shards instead of one
    reducer. The oracle is the PLAIN COUNT(DISTINCT): hash-matching it
    attests the salted decomposition is exact, not approximate."""
    from ..operators.skew import salted_distinct_count
    from ..sources.readers import read_table

    o = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    j = o.join(li, F.col("o_orderkey") == F.col("l_orderkey")).select(
        "o_custkey", "l_suppkey"
    )
    return salted_distinct_count(
        j, ["o_custkey"], "l_suppkey", n_salts=16, out_col="n_suppliers"
    )


@query(
    "returned_item_customers",
    oracle=f"""
    SELECT c_custkey, c_name, n_name,
           {_sql_cents_sum_double(_Q1_SUM_DISC_PRICE, 4)} AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY CAST(({_Q1_SUM_DISC_PRICE}) AS BIGINT) DESC, c_custkey
    LIMIT 20
    """,
    bench=True,
)
def returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape — returned-item reporting: the 20 customers who
    returned the most money in a quarter (the chargeback-abuse screen
    in a fraud ledger). Fact⋈fact⋈dim⋈dim with the date filter pushed
    to the orders scan and the returnflag filter to the lineitem scan;
    nation broadcast; revenue summed as exact fixed-point (price·(100−
    discount) in 10⁻⁴ units) so the DESC order and the LIMIT-20 cut
    are deterministic (ties broken by custkey) and the double is one
    shared IEEE division. TakeOrderedAndProject — no global sort."""
    o = read_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = read_table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag") == "R"
    )
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    rev = F.sum(
        _cents(F.col("l_extendedprice"))
        * (F.lit(100) - _cents(F.col("l_discount")))
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            rev.alias("_rev_cents"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
        .orderBy(F.desc("_rev_cents"), F.asc("c_custkey"))
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            _cents_sum_double(F.col("_rev_cents"), 4).alias("revenue"),
            "n_lines",
        )
    )
