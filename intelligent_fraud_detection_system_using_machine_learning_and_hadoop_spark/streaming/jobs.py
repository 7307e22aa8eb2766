"""Structured Streaming jobs (SURVEY.md §2.9 / §7 step 8).

The reference's upload→score loop (``app.py:22-32``) is a manual
micro-batch; here it's a real stream:

* :func:`stream_events_hourly` — the events_hourly batch aggregation
  run incrementally (windowed agg + watermark). With an availableNow
  trigger over static files it must produce exactly the batch answer,
  which the driver's DuckDB oracle checks.
* :func:`stream_score_claims` — file-source claims scored per
  micro-batch via ``foreachBatch`` reusing the batch rule engine.
  NOTE the reference's batch-relative ML threshold (M6) is preserved
  per micro-batch — the verdict for a row depends on its batch, which
  is the reference's own semantic (SURVEY.md "batch-relative threshold
  doesn't stream" design note).
"""

from __future__ import annotations

import os
from itertools import count

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.rules import RuleConfig, score_claims

_sink_ids = count()


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming source over the events parquet (nanos ts → µs, same
    conversion as the batch reader so plans are interchangeable)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if dict(zip(raw_schema.names, raw_schema.fields))["ts"].dataType.simpleString() == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return stream


def stream_events_hourly(
    spark: SparkSession, sf_dir: str, watermark: str = "1 hour"
) -> DataFrame:
    """Tumbling 1-hour windowed count/sum over the event stream,
    executed with an availableNow trigger into a memory sink; returns
    the finished result (batch-equivalent by construction).

    Complete output mode so every window is emitted at termination —
    with append mode, windows younger than the watermark at end-of-
    input would be withheld. The watermark still bounds state for a
    live continuous run.
    """
    events = read_events_stream(spark, sf_dir)
    agg = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).alias("sum_value_dec"),
        )
    )
    name = f"events_hourly_sink_{next(_sink_ids)}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).select(
        F.col("w.start").alias("hour_ts"),
        "event_type",
        "n",
        ((F.col("sum_value_dec") * 100).cast("long").cast("double") / 100.0).alias(
            "sum_value"
        ),
    )


def stream_score_claims(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    schema,
    cfg: RuleConfig = RuleConfig(),
) -> None:
    """CSV-drop-folder scoring: each micro-batch runs the full batch
    rule engine via foreachBatch (plan reuse — no separate streaming
    implementation of the rules) and appends parquet output."""
    stream = (
        spark.readStream.schema(schema)
        .option("header", True)
        .option("dateFormat", "yyyy-MM-dd")
        .csv(input_dir)
    )

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        scored = score_claims(batch_df, cfg)
        scored.write.mode("append").parquet(output_dir)

    q = stream.writeStream.foreachBatch(handle).trigger(availableNow=True).start()
    q.awaitTermination()
