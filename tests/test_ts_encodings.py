"""Timestamp-encoding-proofing for the events readers.

The driver's testdata generator has already shipped ``events.ts`` under
two different physical parquet encodings across rounds (bigint
TIMESTAMP(NANOS) through round 3, tz-less timestamp[us] → Spark
TIMESTAMP_NTZ from round 4), and the second silently broke every
watermark and numeric-cast consumer. These tests pin the reader
contract: ``read_table`` / ``read_events_stream`` must yield
session-timezone TIMESTAMP with identical wall-clock values no matter
which of the three encodings the parquet carries, so the next
regeneration can't break event-time queries again.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import types as T

from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.sources.readers import (
    read_table,
)
from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.streaming.jobs import (
    read_events_stream,
)

ENCODINGS = ("nanos", "ntz_us", "ltz_us")


def _write_events(tmp_path, sf_dir: str, encoding: str) -> str:
    """Rewrite the first 200 events rows with ``ts`` in one of the three
    physical encodings the driver has shipped (or could ship)."""
    tbl = pq.read_table(os.path.join(sf_dir, "events.parquet")).slice(0, 200)
    ts = tbl.column("ts")
    # Normalize whatever the source encoding is to int64 epoch-nanos.
    if pa.types.is_timestamp(ts.type):
        nanos = ts.cast(pa.timestamp("ns", tz=ts.type.tz)).cast(pa.int64())
    else:
        nanos = ts.cast(pa.int64())
    target = {
        "nanos": pa.timestamp("ns"),
        "ntz_us": pa.timestamp("us"),
        "ltz_us": pa.timestamp("us", tz="UTC"),
    }[encoding]
    new_ts = nanos.cast(pa.timestamp("ns")).cast(target)
    tbl = tbl.set_column(tbl.schema.get_field_index("ts"), "ts", new_ts)
    out = os.path.join(str(tmp_path), encoding)
    os.makedirs(out, exist_ok=True)
    # version=2.6 preserves nanosecond timestamps instead of coercing to µs
    pq.write_table(tbl, os.path.join(out, "events.parquet"), version="2.6")
    return out


@pytest.fixture(scope="module")
def encoded_dirs(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("ts_encodings")
    return {enc: _write_events(base, sf_dir, enc) for enc in ENCODINGS}


def test_batch_reader_normalizes_all_encodings(spark, encoded_dirs):
    frames = {}
    for enc, d in encoded_dirs.items():
        df = read_table(spark, d, "events")
        assert isinstance(df.schema["ts"].dataType, T.TimestampType), (
            f"{enc}: expected session-tz TIMESTAMP, got {df.schema['ts'].dataType}"
        )
        frames[enc] = sorted(
            (r.event_id, str(r.ts)) for r in df.select("event_id", "ts").collect()
        )
    assert frames["nanos"] == frames["ntz_us"] == frames["ltz_us"]
    assert len(frames["nanos"]) == 200


def test_stream_reader_normalizes_all_encodings(spark, encoded_dirs):
    """The streaming reader must produce watermark-legal TIMESTAMP and
    the same rows as batch for every encoding (availableNow drain)."""
    for enc, d in encoded_dirs.items():
        stream = read_events_stream(spark, d)
        assert isinstance(stream.schema["ts"].dataType, T.TimestampType), (
            f"{enc}: streaming ts is {stream.schema['ts'].dataType}"
        )
        # withWatermark is the call that hard-errors on NTZ — exercise it.
        wm = stream.withWatermark("ts", "1 hour")
        q = (
            wm.writeStream.format("memory")
            .queryName(f"ts_enc_{enc}")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = sorted(
            (r.event_id, str(r.ts))
            for r in spark.sql(f"SELECT event_id, ts FROM ts_enc_{enc}").collect()
        )
        batch = sorted(
            (r.event_id, str(r.ts))
            for r in read_table(spark, d, "events").select("event_id", "ts").collect()
        )
        assert got == batch, f"{enc}: stream rows differ from batch"
