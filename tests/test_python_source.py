"""Custom Python DataSource (Spark 4 pyspark.sql.datasource API):
deterministic synthetic claims generator, end-to-end through the rule
pipeline."""

from __future__ import annotations

from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.sources.python_source import (
    register,
)


def _read(spark, **opts):
    register(spark)
    r = spark.read.format("synthetic_claims")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_row_count_partitions_schema(spark):
    df = _read(spark, rows=500, partitions=7, seed=1)
    assert df.count() == 500
    assert df.rdd.getNumPartitions() == 7
    assert [f.name for f in df.schema.fields] == [
        "Name", "Aadhaar", "ClaimAmount", "SubsidyType", "Date",
    ]


def test_deterministic_and_partition_invariant(spark):
    a = sorted(map(tuple, _read(spark, rows=200, partitions=3, seed=5).collect()))
    b = sorted(map(tuple, _read(spark, rows=200, partitions=9, seed=5).collect()))
    c = sorted(map(tuple, _read(spark, rows=200, partitions=3, seed=6).collect()))
    assert a == b          # layout-independent content
    assert a != c          # seed actually matters
    # 12-digit ids, amounts within the reference's observed band
    for _, aadhaar, amount, sub, d in a:
        assert 100000000000 <= aadhaar < 10**12
        assert 500 <= amount < 500000


def test_feeds_rule_pipeline(spark):
    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.pipeline import (
        score,
    )

    df = _read(spark, rows=400, partitions=4, seed=2)
    out = score(df, scorer="pca")
    assert out.count() == 400
    assert "FraudType" in out.columns


def test_repeat_filer_fraction(spark):
    # ADVICE r8: the generator must actually produce the documented
    # "small fraction of repeat filers" — most holders unique, a ~1%
    # hot pool with multiple claims, never ~100 claims per holder.
    rows = _read(spark, rows=5000, partitions=8, seed=3).collect()
    from collections import Counter

    per_holder = Counter(r["Aadhaar"] for r in rows)
    repeats = {h: c for h, c in per_holder.items() if c > 1}
    frac_repeat_holders = len(repeats) / len(per_holder)
    assert 0.001 <= frac_repeat_holders <= 0.03, frac_repeat_holders
    assert max(per_holder.values()) < 20, max(per_holder.values())
