"""Driver-contract invariants."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert {"RuleFraud", "MLFraud", "FraudType"} <= set(df.columns)


def test_oracle_keys_subset_of_queries():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 30
    for name, sql in o.items():
        assert sql.strip(), name


def test_multimodal_decode_stub_shapes(spark, sf_dir):
    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.multimodal import (
        assets_from_documents,
        decode_assets,
    )
    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.sources.readers import (
        read_table,
    )

    docs = read_table(spark, sf_dir, "documents").limit(20)
    out = decode_assets(assets_from_documents(docs)).collect()
    assert len(out) == 20
    for r in out:
        assert r["byte_len"] > 0
        assert len(r["sha256"]) == 64
        assert r["width"] >= 64 and r["height"] >= 64
