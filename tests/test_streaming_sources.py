"""Non-file streaming sources (SURVEY.md §2.9 source surface): the
deterministic rate-micro-batch path equals its closed-form batch twin;
the Kafka-shaped reader fails with the documented error when the
connector is absent."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.streaming.jobs import (
    kafka_available,
    rate_events_batch_twin,
    read_kafka_json_stream,
    stream_rate_minutely,
)


def test_rate_stream_equals_batch_twin(spark):
    n_rows = 1000
    streamed = {
        (r["minute_ts"], r["user_id"]): (r["n"], r["decivalue_sum"])
        for r in stream_rate_minutely(spark, n_rows=n_rows).collect()
    }
    batch = {
        (r["minute_ts"], r["user_id"]): (r["n"], r["decivalue_sum"])
        for r in rate_events_batch_twin(spark, n_rows)
        .groupBy(
            F.date_trunc("minute", F.col("ts")).alias("minute_ts"), F.col("user_id")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 10).cast("long")).alias("decivalue_sum"),
        )
        .collect()
    }
    assert streamed == batch
    assert sum(n for n, _ in streamed.values()) == n_rows


def test_kafka_reader_absent_connector(spark):
    """The Kafka connector jar isn't bundled here: the probe must say
    so, and the reader must raise Spark's missing-data-source error at
    load() (construction itself is lazy and valid)."""
    if kafka_available(spark):
        pytest.skip("kafka connector present in this environment")
    from pyspark.sql import types as T

    schema = T.StructType([T.StructField("event_id", T.LongType())])
    with pytest.raises(Exception) as exc:
        read_kafka_json_stream(spark, "localhost:9092", "events", schema)
    assert "kafka" in str(exc.value).lower()


def test_stream_stream_join_equals_batch(spark, sf_dir):
    """Single-batch availableNow input → the watermarked stream-stream
    join must emit exactly the batch time-bounded join."""
    from pyspark.sql import functions as F

    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.sources.readers import (
        read_table,
    )
    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.streaming.jobs import (
        stream_stream_click_purchase,
    )

    streamed = {
        (r["click_id"], r["purchase_id"])
        for r in stream_stream_click_purchase(spark, sf_dir).collect()
    }
    ev = read_table(spark, sf_dir, "events")
    c = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("cts")
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("u2"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("pts"),
    )
    batch = {
        (r["click_id"], r["purchase_id"])
        for r in c.join(
            p,
            (F.col("user_id") == F.col("u2"))
            & (F.col("pts") >= F.col("cts"))
            & (F.col("pts") <= F.col("cts") + F.expr("INTERVAL 1 HOUR")),
        ).collect()
    }
    assert streamed == batch and streamed


def test_stream_static_enrich_equals_batch_join(spark, sf_dir):
    """Stateless stream-static broadcast join over availableNow input
    must emit exactly the batch left join."""
    from pyspark.sql import functions as F

    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.sources.readers import (
        read_table,
    )
    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.streaming.jobs import (
        stream_static_enrich_events,
    )

    got = {
        tuple(r)
        for r in stream_static_enrich_events(spark, sf_dir).collect()
    }
    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type"
    )
    cust = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_name", "c_mktsegment"
    )
    want = {
        tuple(r)
        for r in ev.join(cust, "user_id", "left")
        .select("event_id", "user_id", "event_type", "c_name", "c_mktsegment")
        .collect()
    }
    assert got == want
