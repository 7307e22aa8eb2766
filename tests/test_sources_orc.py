"""ORC source/sink contract: lossless round-trip of every testdata
table plus the same pushdown/pruning plan properties the parquet scans
are held to (tests/test_plan_shapes.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.sources.readers import (
    read_table,
)
from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.sources.writers import (
    read_orc,
    write_orc,
)


def test_orc_round_trip_documents(spark, sf_dir, tmp_path):
    d = read_table(spark, sf_dir, "documents")
    p = str(tmp_path / "docs_orc")
    write_orc(d, p)
    back = read_orc(spark, p)
    assert back.schema == d.schema
    a = sorted(map(tuple, d.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


def test_orc_partitioned_write_prunes(spark, sf_dir, tmp_path):
    d = read_table(spark, sf_dir, "documents")
    p = str(tmp_path / "docs_orc_part")
    write_orc(d, p, partition_by=["lang"])
    back = read_orc(spark, p).where(F.col("lang") == "en")
    plan = back._jdf.queryExecution().executedPlan().toString()
    # partition pruning: only the lang=en directory is read
    assert back.count() == d.where(F.col("lang") == "en").count()
    assert "PartitionFilters: [isnotnull(lang" in plan or "lang#" in plan


def test_orc_filter_pushdown_and_pruning(spark, sf_dir, tmp_path):
    d = read_table(spark, sf_dir, "orders")
    p = str(tmp_path / "orders_orc")
    write_orc(d, p)
    q = read_orc(spark, p).where(F.col("o_orderkey") < 100).select("o_orderkey")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "LessThan(o_orderkey,100)" in plan
    # column pruning reaches the scan: only o_orderkey in ReadSchema
    assert "struct<o_orderkey:bigint>" in plan.replace("ReadSchema: ", "")


def test_avro_gated_roundtrip_or_named_error(spark, tmp_path):
    """Avro is connector-gated like Kafka: with spark-avro on the
    classpath the round-trip must preserve rows; without it the write
    raises Spark's find-data-source error naming 'avro' (so a
    deployment knows the missing module), never a silent no-op."""
    import pytest

    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.sources.writers import (
        avro_available,
        read_avro,
        write_avro,
    )

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", -2.0)], "id long, s string, v double"
    )
    path = str(tmp_path / "t.avro")
    if avro_available(spark):
        write_avro(df, path)
        got = sorted(tuple(r) for r in read_avro(spark, path).collect())
        assert got == [(1, "a", 1.5), (2, "b", -2.0)]
    else:
        with pytest.raises(Exception) as exc:
            write_avro(df, path)
        assert "avro" in str(exc.value).lower()
