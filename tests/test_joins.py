"""Unit tests for the as-of / range / interval join compositions
(operators/joins.py) on hand-computed fixtures, plus an equivalence
check against the naive inequality join."""

from __future__ import annotations

from pyspark.sql import functions as F

from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.joins import (
    asof_join,
    interval_overlap_join,
    range_join_bands,
)


def _asof_fixture(spark):
    left = spark.createDataFrame(
        [
            (1, 10, "a"),
            (1, 20, "b"),
            (1, 5, "c"),   # before any right row
            (2, 15, "d"),
            (3, 99, "e"),  # key with no right rows at all
        ],
        "k long, t long, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, 10, 100.0),  # exact tie with left (1,10)
            (1, 18, 200.0),
            (2, 1, 300.0),
            (2, 15, 400.0),
        ],
        "k long, t long, v double",
    )
    return left, right


def test_cogroup_zero_fills_users_without_purchase_or_error(spark, tmp_path):
    """A user whose only events are click/view/signup must still appear
    in cogroup_purchase_error_stats with all-zero counts: cogroup only
    unions keys present on ≥1 grouped side, so the full-key right join
    is load-bearing (round-2 advice follow-up)."""
    import datetime as dt

    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.plans.data_ops import (
        cogroup_purchase_error_stats,
    )

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    s = dt.timedelta(seconds=1)
    rows = [
        (1, "purchase", base + 300 * s),
        (1, "error", base),  # purchase 5min after error → close
        (2, "click", base),  # neither purchase nor error
        (2, "view", base + s),
        (2, "signup", base + 2 * s),
        (3, "error", base),  # error-only user
    ]
    spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    got = {
        r["user_id"]: (
            r["n_purchases"],
            r["n_errors"],
            r["purchases_within_10m_after_error"],
        )
        for r in cogroup_purchase_error_stats(spark, str(tmp_path)).collect()
    }
    assert got == {1: (1, 1, 1), 2: (0, 0, 0), 3: (0, 1, 0)}


def test_asof_join_backward_inclusive(spark):
    left, right = _asof_fixture(spark)
    out = {
        r["tag"]: (r["t_asof"], r["v_asof"])
        for r in asof_join(
            left, right, on="k", left_time="t", right_time="t", right_cols=["v"]
        ).collect()
    }
    assert out == {
        "a": (10, 100.0),   # exact match allowed
        "b": (18, 200.0),   # latest of the two priors
        "c": (None, None),  # nothing at or before t=5
        "d": (15, 400.0),   # exact match beats the earlier row
        "e": (None, None),  # key absent from right
    }


def test_asof_join_strict(spark):
    left, right = _asof_fixture(spark)
    out = {
        r["tag"]: (r["t_asof"], r["v_asof"])
        for r in asof_join(
            left,
            right,
            on="k",
            left_time="t",
            right_time="t",
            right_cols=["v"],
            allow_exact_match=False,
        ).collect()
    }
    assert out["a"] == (None, None)  # t=10 tie excluded, nothing earlier
    assert out["d"] == (1, 300.0)    # t=15 tie excluded → falls back to t=1
    assert out["b"] == (18, 200.0)   # unaffected


def test_range_join_bands_overlapping_and_edges(spark):
    fact = spark.createDataFrame(
        [(1, 0.0), (2, 9.99), (3, 10.0), (4, 25.0), (5, 100.0)],
        "id long, v double",
    )
    # overlapping bands: v=25 falls in both "wide" and "mid"
    bands = spark.createDataFrame(
        [("low", 0.0, 10.0), ("mid", 10.0, 30.0), ("wide", 20.0, 200.0)],
        "band string, lo double, hi double",
    )
    got = {
        (r["id"], r["band"])
        for r in range_join_bands(fact, bands, value_col="v").collect()
    }
    assert got == {
        (1, "low"),
        (2, "low"),
        (3, "mid"),    # lo inclusive
        (4, "mid"),
        (4, "wide"),   # overlap → two matches
        (5, "wide"),   # hi of "mid" exclusive was at 30; 100 only in wide
    }


def test_interval_overlap_matches_naive_join(spark, sf_dir):
    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.sources.readers import (
        read_table,
    )

    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", F.col("ts").cast("double").alias("ep")
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        "user_id",
        (F.col("ep") - 300).alias("ps"),
        (F.col("ep") + 300).alias("pe"),
    )
    e = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("eid"),
        "user_id",
        (F.col("ep") - 300).alias("es"),
        (F.col("ep") + 300).alias("ee"),
    )
    grid_pairs = {
        (r["pid"], r["eid"])
        for r in interval_overlap_join(
            p, e, "ps", "pe", "es", "ee", on="user_id", grid=600.0
        ).collect()
    }
    naive_pairs = {
        (r["pid"], r["eid"])
        for r in p.alias("p")
        .join(
            e.alias("e"),
            (F.col("p.user_id") == F.col("e.user_id"))
            & (F.col("p.ps") < F.col("e.ee"))
            & (F.col("e.es") < F.col("p.pe")),
        )
        .select("pid", "eid")
        .collect()
    }
    assert grid_pairs == naive_pairs


# ---------------------------------------------------------------------------
# property-based differential test: asof_join vs pandas merge_asof
# ---------------------------------------------------------------------------

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

_row = st.tuples(st.integers(0, 3), st.integers(0, 20))  # (key, time)


@settings(max_examples=15, deadline=None)
@given(
    left=st.lists(_row, min_size=1, max_size=12),
    right=st.lists(_row, max_size=12),
    exact=st.booleans(),
)
def test_asof_join_matches_pandas_merge_asof(spark, left, right, exact):
    """Differential oracle on random inputs: duplicate times, exact-time
    matches, empty right sides, multi-key interleavings — the Spark
    union+window as-of must agree with pandas merge_asof row for row
    (both resolve right-side time ties to the latest arrival)."""
    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.joins import (
        asof_join,
    )

    lpdf = pd.DataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)], columns=["lid", "k", "t"]
    ).astype("int64")
    rpdf = pd.DataFrame(
        [(j, k, t) for j, (k, t) in enumerate(right)], columns=["rid", "k", "t"]
    ).astype("int64")
    ldf = spark.createDataFrame(lpdf)
    rdf = (
        spark.createDataFrame(rpdf)
        if len(rpdf)
        else spark.createDataFrame([], "rid long, k long, t long")
    )
    out = asof_join(
        ldf,
        rdf,
        on="k",
        left_time="t",
        right_time="t",
        right_cols=["rid"],
        allow_exact_match=exact,
    )
    got = {r["lid"]: r["rid_asof"] for r in out.collect()}

    lp = lpdf.sort_values(["t", "lid"], kind="stable")
    rp = rpdf.sort_values(["t", "rid"], kind="stable")
    exp_df = pd.merge_asof(
        lp, rp, on="t", by="k", allow_exact_matches=exact, suffixes=("", "_r")
    )
    exp = {
        int(r.lid): (None if pd.isna(r.rid) else int(r.rid))
        for r in exp_df.itertuples()
    }
    assert got == exp


def test_resample_locf(spark):
    from datetime import datetime

    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.joins import (
        resample_locf,
    )

    ev = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 2, 5), 10.0),
            (1, datetime(2024, 1, 4, 1), 20.0),
            (2, datetime(2024, 1, 1, 0), 7.0),  # exactly ON a grid point
        ],
        "user_id long, ts timestamp, value double",
    )
    out = {
        (r["user_id"], r["grid_ts"].day): (r["value"], r["obs_ts"])
        for r in resample_locf(ev, "2024-01-01", "2024-01-05", "1 day").collect()
    }
    assert len(out) == 10  # 2 users x 5 grid days
    # user 1: null until day 2's obs lands (obs at 05:00 > grid 00:00)
    assert out[(1, 1)][0] is None and out[(1, 2)][0] is None
    assert out[(1, 3)][0] == 10.0
    assert out[(1, 4)][0] == 10.0  # day-4 obs at 01:00 is after the grid point
    assert out[(1, 5)][0] == 20.0
    # user 2: exact-match observation carries from the first grid point
    assert all(out[(2, d)][0] == 7.0 for d in range(1, 6))
    assert out[(2, 1)][1] == datetime(2024, 1, 1, 0)
