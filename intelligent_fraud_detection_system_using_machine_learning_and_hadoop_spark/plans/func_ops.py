"""Scalar-function family coverage (SURVEY.md §2.7 F-family widened):
string, array, math/null-handling, and sketch aggregates, bound to the
driver testdata with DuckDB oracles.

Floating-point ground rules for oracle parity: only IEEE-exact ops
(+,-,*,/,sqrt,abs) appear on raw doubles. No transcendentals (libm
rounding differs across engines) and no round() on arbitrary doubles
(Spark HALF_UP vs DuckDB half-even disagree at representational
midpoints). Arrays are emitted as joined strings — pandas stringifies
numpy arrays and Python lists differently, so the driver's compare
would false-negative on raw array columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import ensure_min_partitions, read_table
from .catalog import query


@query(
    "string_funcs_part",
    oracle=r"""
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           substr(p_name, 1, 5) AS name_pfx,
           CAST(length(p_name) AS BIGINT) AS name_len,
           lpad(p_brand, 10, '_') AS brand_pad,
           CAST(regexp_extract(p_brand, 'Brand#(\d+)', 1) AS BIGINT) AS brand_num,
           CAST(levenshtein(p_name, 'red widget') AS BIGINT) AS lev_red_widget,
           reverse(p_name) AS name_rev,
           replace(p_type, 'ECONOMY', 'ECO') AS type_short,
           CAST(strpos(p_name, 'widget') AS BIGINT) AS widget_pos,
           concat_ws('|', p_brand, p_type) AS brand_type,
           trim(concat(' ', p_name, ' ')) AS name_trim
    FROM part
    """,
)
def string_funcs_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function family (upper/substr/length/lpad/regexp_extract/
    levenshtein/reverse/replace/instr/concat_ws/trim) — all JVM-side
    codegen'd expressions, zero Python in the row path."""
    p = read_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 5).alias("name_pfx"),
        F.length("p_name").cast("long").alias("name_len"),
        F.lpad("p_brand", 10, "_").alias("brand_pad"),
        F.regexp_extract("p_brand", r"Brand#(\d+)", 1).cast("long").alias("brand_num"),
        F.levenshtein("p_name", F.lit("red widget")).cast("long").alias("lev_red_widget"),
        F.reverse("p_name").alias("name_rev"),
        F.replace(F.col("p_type"), F.lit("ECONOMY"), F.lit("ECO")).alias("type_short"),
        F.instr("p_name", "widget").cast("long").alias("widget_pos"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.trim(F.concat(F.lit(" "), F.col("p_name"), F.lit(" "))).alias("name_trim"),
    )


@query(
    "array_funcs_orders",
    oracle="""
    SELECT o_custkey,
           array_to_string(list_sort(list(DISTINCT year(o_orderdate))), ',') AS years_csv,
           CAST(len(list(DISTINCT year(o_orderdate))) AS BIGINT) AS n_years,
           CAST(list_sort(list(DISTINCT year(o_orderdate)))[1] AS BIGINT) AS first_year,
           CAST(list_sort(list(DISTINCT year(o_orderdate)))[-1] AS BIGINT) AS last_year,
           list_contains(list(DISTINCT year(o_orderdate)), 1995) AS active_1995
    FROM orders
    GROUP BY o_custkey
    """,
)
def array_funcs_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function family over a grouped collect: collect_set →
    array_sort → join/size/element_at/contains. Sorted before any
    order-sensitive op so the result is deterministic (collect order
    is not)."""
    o = read_table(spark, sf_dir, "orders")
    years = F.array_sort(F.collect_set(F.year("o_orderdate")))
    return o.groupBy("o_custkey").agg(
        F.array_join(years, ",").alias("years_csv"),
        F.size(years).cast("long").alias("n_years"),
        F.element_at(years, 1).cast("long").alias("first_year"),
        F.element_at(years, -1).cast("long").alias("last_year"),
        F.array_contains(years, F.lit(1995)).alias("active_1995"),
    )


@query(
    "math_null_funcs_lineitem",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_discount - 0.05) AS disc_dev,
           CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS price_ceil_k,
           CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_floor_k,
           sqrt(l_extendedprice) AS price_sqrt,
           greatest(l_tax, l_discount) AS max_rate,
           least(l_tax, l_discount) AS min_rate,
           coalesce(nullif(l_discount, 0.0), -1.0) AS disc_or_sentinel,
           CAST(CAST(l_quantity AS BIGINT) % 7 AS BIGINT) AS qty_mod7,
           CAST(sign(l_discount - l_tax) AS DOUBLE) AS disc_vs_tax
    FROM lineitem
    """,
)
def math_null_funcs_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math + null-handling family restricted to IEEE-exact ops
    (abs/ceil/floor/sqrt/greatest/least/coalesce/nullif/sign/mod)."""
    l = read_table(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - F.lit(0.05)).alias("disc_dev"),
        F.ceil(F.col("l_extendedprice") / 1000).cast("long").alias("price_ceil_k"),
        F.floor(F.col("l_extendedprice") / 1000).cast("long").alias("price_floor_k"),
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
        F.least("l_tax", "l_discount").alias("min_rate"),
        F.coalesce(F.nullif(F.col("l_discount"), F.lit(0.0)), F.lit(-1.0)).alias(
            "disc_or_sentinel"
        ),
        (F.col("l_quantity").cast("long") % 7).cast("long").alias("qty_mod7"),
        F.signum(F.col("l_discount") - F.col("l_tax")).cast("double").alias(
            "disc_vs_tax"
        ),
    )


@query("sketch_aggregates")
def sketch_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB scale path for exact distinct/percentile: HyperLogLog++
    cardinality and Greenwald-Khanna quantiles — single-pass, mergeable
    across executors, constant memory (rows-only: sketch internals are
    engine-specific; pytest pins relative error against the exact
    answers)."""
    l = read_table(spark, sf_dir, "lineitem")
    return l.agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("p50_approx"),
        F.percentile_approx("l_extendedprice", 0.99, 10000).alias("p99_approx"),
    )


@query(
    "stats_moments_by_status",
    oracle="""
    WITH m AS (
      SELECT o_orderstatus,
             COUNT(*) AS n,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS s1,
             SUM(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS HUGEINT)
                 * CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS HUGEINT)) AS s2
      FROM orders GROUP BY o_orderstatus)
    SELECT o_orderstatus, n,
           CAST(s1 AS DOUBLE) / n / 100.0 AS mean_price,
           greatest(CAST(s2 AS DOUBLE) / n / 10000.0
                    - (CAST(s1 AS DOUBLE) / n / 100.0)
                      * (CAST(s1 AS DOUBLE) / n / 100.0),
                    0.0) AS var_pop,
           sqrt(greatest(CAST(s2 AS DOUBLE) / n / 10000.0
                         - (CAST(s1 AS DOUBLE) / n / 100.0)
                           * (CAST(s1 AS DOUBLE) / n / 100.0),
                         0.0)) AS std_pop
    FROM m
    """,
)
def stats_moments_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population mean/variance/stddev from EXACT integer moments
    (Σcents as long, Σcents² as decimal(38,0)) with the final float
    math as one identical IEEE expression per engine — the
    cross-engine-reproducible form of stddev_pop (reference A6), since
    native Welford-style accumulators differ bitwise between engines."""
    o = read_table(spark, sf_dir, "orders")
    c = F.round(F.col("o_totalprice") * 100).cast("long")
    c19 = c.cast("decimal(19,0)")
    m = o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(c).alias("s1"),
        F.sum(c19 * c19).alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("n") / F.lit(100.0)
    var = F.greatest(
        F.col("s2").cast("double") / F.col("n") / F.lit(10000.0) - mean * mean,
        F.lit(0.0),
    )
    return m.select(
        "o_orderstatus",
        "n",
        mean.alias("mean_price"),
        var.alias("var_pop"),
        F.sqrt(var).alias("std_pop"),
    )


@query(
    "temporal_funcs_orders",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT) AS y,
           CAST(quarter(o_orderdate) AS BIGINT) AS q,
           CAST(month(o_orderdate) AS BIGINT) AS m,
           CAST(day(o_orderdate) AS BIGINT) AS d,
           CAST(weekofyear(o_orderdate) AS BIGINT) AS iso_week,
           CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due_date,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since_epoch_start,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date_str
    FROM orders
    """,
)
def temporal_funcs_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal-function family (year/quarter/month/day/ISO week,
    interval add, last_day, trunc, datediff, date→string formatting —
    reference F1–F3 ``run_pipeline.py:85``, absorbing round 1's
    driver-green ``date_format_str``) — functions whose semantics the
    two engines share exactly; months_between and dayofweek are
    deliberately excluded (engine-specific conventions)."""
    o = read_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).cast("long").alias("y"),
        F.quarter(d).cast("long").alias("q"),
        F.month(d).cast("long").alias("m"),
        F.dayofmonth(d).cast("long").alias("d"),
        F.weekofyear(d).cast("long").alias("iso_week"),
        F.date_add(d.cast("date"), 30).alias("due_date"),
        F.last_day(d).alias("month_end"),
        F.date_trunc("month", d).cast("date").alias("month_start"),
        F.datediff(d, F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since_epoch_start"),
        F.date_format(d, "yyyy-MM-dd").alias("order_date_str"),
    )


@query(
    "posexplode_doc_tokens",
    oracle="""
    SELECT doc_id, CAST(s.pos AS BIGINT) AS pos, s.tok AS tok
    FROM (SELECT doc_id,
                 unnest(list_transform(
                   list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> ''),
                   (x, i) -> struct_pack(pos := i - 1, tok := x))) AS s
          FROM documents)
    WHERE s.pos <= 4
    """,
)
def posexplode_doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generator surface: posexplode (unnest WITH ORDINALITY) — the 1→N
    row expansion with position, limited to each doc's first 5 tokens
    (the LIMIT is applied on position, not rows, so it parallelizes)."""
    d = ensure_min_partitions(read_table(spark, sf_dir, "documents"))
    toks = F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != "")
    return (
        d.select("doc_id", F.posexplode(toks).alias("pos", "tok"))
        .where(F.col("pos") <= 4)
        .select("doc_id", F.col("pos").cast("long").alias("pos"), "tok")
    )


@query(
    "window_dist_orders",
    oracle="""
    SELECT o_orderkey,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume,
           CAST(nth_value(o_orderkey, 2) OVER (PARTITION BY o_custkey
                ORDER BY o_totalprice DESC, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS BIGINT) AS second_okey
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def window_dist_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (percent_rank, cume_dist,
    nth_value) — their doubles are ratios of identical small ints, so
    cross-engine bit parity holds without special arithmetic."""
    from pyspark.sql import Window as W

    o = read_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return o.select(
        "o_orderkey",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.nth_value("o_orderkey", 2).over(w_full).cast("long").alias("second_okey"),
    )


@query(
    "profile_orders_columns",
    oracle="""
    SELECT 'o_totalprice' AS col,
           COUNT(*) AS n_rows,
           COUNT(o_totalprice) AS n_nonnull,
           COUNT(DISTINCT o_totalprice) AS n_distinct,
           MIN(o_totalprice) AS min_d, MAX(o_totalprice) AS max_d
    FROM orders
    UNION ALL
    SELECT 'o_custkey', COUNT(*), COUNT(o_custkey),
           COUNT(DISTINCT o_custkey),
           CAST(MIN(o_custkey) AS DOUBLE), CAST(MAX(o_custkey) AS DOUBLE)
    FROM orders
    """,
)
def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (the data-quality pass every ingest runs):
    per-column row/non-null/distinct counts + range, all columns in ONE
    scan via a multi-aggregate then unpivoted — never one job per
    column."""
    o = read_table(spark, sf_dir, "orders")
    agg = o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("o_totalprice").alias("nn_price"),
        F.countDistinct("o_totalprice").alias("nd_price"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        F.count("o_custkey").alias("nn_cust"),
        F.countDistinct("o_custkey").alias("nd_cust"),
        F.min("o_custkey").cast("double").alias("min_cust"),
        F.max("o_custkey").cast("double").alias("max_cust"),
    )
    return agg.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("o_totalprice").alias("col"),
                    F.col("n_rows"),
                    F.col("nn_price").alias("n_nonnull"),
                    F.col("nd_price").alias("n_distinct"),
                    F.col("min_price").alias("min_d"),
                    F.col("max_price").alias("max_d"),
                ),
                F.struct(
                    F.lit("o_custkey").alias("col"),
                    F.col("n_rows"),
                    F.col("nn_cust").alias("n_nonnull"),
                    F.col("nd_cust").alias("n_distinct"),
                    F.col("min_cust").alias("min_d"),
                    F.col("max_cust").alias("max_d"),
                ),
            )
        ).alias("s")
    ).select("s.col", "s.n_rows", "s.n_nonnull", "s.n_distinct", "s.min_d", "s.max_d")


@query(
    "doc_redact_pii",
    oracle=r"""
    SELECT doc_id,
           regexp_replace(
             regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\d{6,}', '<NUM>', 'g') AS redacted,
           CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(text, '\d{6,}')) AS BIGINT) AS n_long_numbers
    FROM documents
    """,
)
def doc_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing for training corpora: redact emails and long digit
    runs (IDs, phones) with counts of what was removed — JVM regex map
    pass, shared Java/RE2 syntax."""
    # two regex rewrites + two extract_alls per row — a CPU-bound map;
    # rebalance under-partitioned scans to all cores (no-op otherwise)
    d = ensure_min_partitions(read_table(spark, sf_dir, "documents"))
    email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    longnum = r"\d{6,}"
    return d.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace(F.col("text"), email, "<EMAIL>"), longnum, "<NUM>"
        ).alias("redacted"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(email), F.lit(0)))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(longnum), F.lit(0)))
        .cast("long")
        .alias("n_long_numbers"),
    )


@query("token_freq_cms")
def token_freq_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy-hitter estimation, completing the
    mergeable-sketch trio (HLL++ cardinality, GK quantiles, CMS
    frequencies): one single-pass ``count_min_sketch`` aggregate over
    the exploded token stream (constant memory, merged across
    executors exactly like at 1000-executor scale).

    Candidate heavy hitters come from a BOUNDED structure consistent
    with sketch semantics, not an exact global top-k (VERDICT r2 item
    3): each map partition contributes its local top-m tokens
    (SpaceSaving-style union — a token with global share > ~1/m is in
    some partition's local top-m). The first groupBy's partial
    aggregation completes map-side, so the exchange carries only
    per-partition distinct-token slivers; the second reduces them to
    ≤ partitions×m candidates. No exact global orderBy over the token
    aggregate ever runs — the final ranking uses the SKETCH estimates.
    Rows-only: sketch internals are engine-specific; pytest pins the
    CMS guarantee — est ≥ true, est ≤ true + ε·N w.h.p. — against the
    exact counts (exact pass lives in the test only)."""
    from ..operators.text import tokens

    eps, confidence, seed = 0.001, 0.99, 42
    top_k, local_m = 20, 32
    d = ensure_min_partitions(read_table(spark, sf_dir, "documents"))
    tok = d.select(F.explode(tokens(F.col("text"))).alias("token"))
    sketch_row = tok.agg(
        F.count_min_sketch(
            "token", F.lit(eps), F.lit(confidence), F.lit(seed)
        ).alias("cms"),
    ).collect()[0]
    jvm = spark.sparkContext._jvm
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        bytes(sketch_row["cms"])
    )
    local_top = (
        tok.groupBy(F.spark_partition_id().alias("_pid"), "token")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("_pid")
        .agg(
            F.slice(
                F.array_sort(
                    F.collect_list(
                        F.struct((-F.col("n")).alias("_neg"), F.col("token"))
                    )
                ),
                1,
                local_m,
            ).alias("_top")
        )
        .select(F.explode(F.col("_top.token")).alias("token"))
        .distinct()
    )
    candidates = [r["token"] for r in local_top.collect()]
    ranked = sorted(
        ((t, int(cms.estimateCount(t))) for t in candidates),
        key=lambda te: (-te[1], te[0]),
    )[:top_k]
    return spark.createDataFrame(
        sorted(ranked), "token string, est_count long"
    )
