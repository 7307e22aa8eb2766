"""Training-batch assembly operators (operators/packing.py):
sequence packing, sliding-window chunking, mixture interleave."""

from __future__ import annotations

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.packing import (
    chunk_documents,
    interleave_sources,
    md5_bucket,
    pack_sequences,
)


def docs_fixture(spark, n=200, seed=3):
    import numpy as np

    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        n_tok = int(rng.randint(0, 60))  # includes empty docs
        text = " ".join(f"w{rng.randint(0, 50)}" for _ in range(n_tok))
        rows.append((i * 7 % 1009, text, f"src{i % 5}"))  # non-contiguous ids
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


# --- pack_sequences -------------------------------------------------------


def naive_pack(docs, budget):
    """Single global-window reference implementation."""
    t = docs.select(
        "doc_id",
        F.size(F.filter(F.split("text", r"\s+"), lambda x: x != "")).alias("n"),
    ).where(F.col("n") > 0)
    w = W.orderBy("doc_id").rowsBetween(W.unboundedPreceding, -1)
    return (
        t.withColumn("start_offset", F.coalesce(F.sum("n").over(w), F.lit(0)))
        .withColumn("first_seq", F.expr(f"start_offset DIV {budget}"))
        .withColumn("last_seq", F.expr(f"(start_offset + n - 1) DIV {budget}"))
        .select("doc_id", "start_offset", "first_seq", "last_seq")
    )


@pytest.mark.parametrize("n_buckets", [1, 7, 64, 1000])
def test_pack_distributed_prefix_sum_matches_global_window(spark, n_buckets):
    docs = docs_fixture(spark)
    got = {
        r["doc_id"]: (r["start_offset"], r["first_seq"], r["last_seq"])
        for r in pack_sequences(docs, budget=64, n_buckets=n_buckets).collect()
    }
    want = {
        r["doc_id"]: (r["start_offset"], r["first_seq"], r["last_seq"])
        for r in naive_pack(docs, 64).collect()
    }
    assert got == want


def test_pack_offsets_contiguous_and_seqs_consistent(spark):
    docs = docs_fixture(spark, n=120, seed=11)
    rows = sorted(
        pack_sequences(docs, budget=32).collect(), key=lambda r: r["doc_id"]
    )
    assert rows[0]["start_offset"] == 0
    for prev, cur in zip(rows, rows[1:]):
        assert cur["start_offset"] == prev["start_offset"] + prev["n_tokens"]
    for r in rows:
        assert r["first_seq"] == r["start_offset"] // 32
        assert r["last_seq"] == (r["start_offset"] + r["n_tokens"] - 1) // 32
        assert r["n_seqs"] == r["last_seq"] - r["first_seq"] + 1
        assert r["n_tokens"] > 0  # empty docs dropped


# --- chunk_documents ------------------------------------------------------


def test_chunks_cover_all_tokens_and_reconstruct(spark):
    docs = docs_fixture(spark, n=80, seed=5)
    chunks = chunk_documents(docs, chunk_size=16, stride=16).collect()  # no overlap
    by_doc = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append(r)
    originals = {
        r["doc_id"]: [t for t in r["text"].split() if t]
        for r in docs.collect()
        if r["text"].strip()
    }
    assert set(by_doc) == set(originals)
    for doc_id, rs in by_doc.items():
        rs.sort(key=lambda r: r["chunk_id"])
        # stride-=-size chunks tile the doc exactly
        rebuilt = " ".join(r["chunk_text"] for r in rs).split()
        assert rebuilt == originals[doc_id]
        for i, r in enumerate(rs):
            assert r["start_tok"] == i * 16
            assert r["chunk_len"] == len(r["chunk_text"].split())
            assert 1 <= r["chunk_len"] <= 16


def test_chunk_overlap_and_final_short_chunk(spark):
    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10)))], "doc_id long, text string"
    )
    rows = sorted(
        chunk_documents(docs, chunk_size=4, stride=3).collect(),
        key=lambda r: r["chunk_id"],
    )
    # starts 0,3,6,9 — the last is a 1-token tail
    assert [r["start_tok"] for r in rows] == [0, 3, 6, 9]
    assert rows[0]["chunk_text"] == "t0 t1 t2 t3"
    assert rows[1]["chunk_text"] == "t3 t4 t5 t6"
    assert rows[-1]["chunk_text"] == "t9"
    assert rows[-1]["chunk_len"] == 1


# --- interleave_sources ---------------------------------------------------


def test_interleave_rate_bounds_and_subset_monotonicity(spark):
    docs = docs_fixture(spark, n=150, seed=9)
    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    full = {r["doc_id"] for r in interleave_sources(docs, {f"src{i}": 10000 for i in range(5)}).collect()}
    assert full == all_ids  # rate 10000 keeps everything
    none = interleave_sources(docs, {f"src{i}": 0 for i in range(5)}).count()
    assert none == 0
    lo = {r["doc_id"] for r in interleave_sources(docs, {f"src{i}": 2000 for i in range(5)}).collect()}
    hi = {r["doc_id"] for r in interleave_sources(docs, {f"src{i}": 6000 for i in range(5)}).collect()}
    assert lo <= hi  # raising rates only adds rows — epoch-stable growth


def test_interleave_deterministic_across_repartition(spark):
    docs = docs_fixture(spark, n=150, seed=13)
    rates = {f"src{i}": 3000 + 1000 * i for i in range(5)}
    a = {r["doc_id"] for r in interleave_sources(docs, rates).collect()}
    b = {
        r["doc_id"]
        for r in interleave_sources(docs.repartition(13), rates).collect()
    }
    assert a == b
    # decision is exactly the documented bucket predicate
    buckets = {
        r["doc_id"]: r["bucket"]
        for r in docs.select("doc_id", md5_bucket(F.col("doc_id"), 10000).alias("bucket")).collect()
    }
    srcs = {r["doc_id"]: r["source"] for r in docs.collect()}
    expect = {d for d in buckets if buckets[d] < rates[srcs[d]]}
    assert a == expect


def test_interleave_rejects_bad_rates(spark):
    docs = docs_fixture(spark, n=5)
    with pytest.raises(ValueError):
        interleave_sources(docs, {})
    with pytest.raises(ValueError):
        interleave_sources(docs, {"src0": 10001})


# ---------------------------------------------------------------------------
# property-based differential test: distributed prefix sum vs pure python
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=12, deadline=None)
@given(
    counts=st.lists(st.integers(0, 40), min_size=1, max_size=30),
    budget=st.integers(1, 64),
    n_buckets=st.integers(1, 40),
)
def test_pack_sequences_matches_python_reference(spark, counts, budget, n_buckets):
    """For ANY token-count profile, budget, and bucket count — including
    empty docs, budget 1, more buckets than docs — the distributed
    prefix sum must equal the sequential Python packing."""
    rows = [(i * 3 + 1, " ".join(["w"] * c)) for i, c in enumerate(counts)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["start_offset"], r["first_seq"], r["last_seq"], r["n_seqs"])
        for r in pack_sequences(docs, budget=budget, n_buckets=n_buckets).collect()
    }
    exp = {}
    offset = 0
    for i, c in enumerate(counts):
        if c == 0:
            continue
        first, last = offset // budget, (offset + c - 1) // budget
        exp[i * 3 + 1] = (offset, first, last, last - first + 1)
        offset += c
    assert got == exp


# --- epoch_shuffle --------------------------------------------------------


def test_epoch_shuffle_is_dense_seeded_permutation(spark):
    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.packing import (
        epoch_shuffle,
    )

    docs = docs_fixture(spark, n=120, seed=17)
    n = docs.count()
    s7 = {r["doc_id"]: r["epoch_pos"] for r in epoch_shuffle(docs, seed=7).collect()}
    # dense permutation of 0..n-1
    assert sorted(s7.values()) == list(range(n))
    # deterministic across repartitioning and bucket counts
    s7b = {
        r["doc_id"]: r["epoch_pos"]
        for r in epoch_shuffle(docs.repartition(11), seed=7, n_buckets=8).collect()
    }
    assert s7 == s7b
    # a different seed gives a different permutation (overwhelmingly)
    s8 = {r["doc_id"]: r["epoch_pos"] for r in epoch_shuffle(docs, seed=8).collect()}
    assert s7 != s8
    # matches the naive single-window rank
    from pyspark.sql import functions as F

    key = F.md5(F.concat_ws(":", F.lit("7"), F.col("doc_id").cast("string")))
    naive = {
        r["doc_id"]: r["pos"]
        for r in docs.select(
            "doc_id",
            (F.row_number().over(W.orderBy(key, "doc_id")) - 1).alias("pos"),
        ).collect()
    }
    assert s7 == naive


# --- budget_trim ----------------------------------------------------------


def skewed_docs_fixture(spark, n=400):
    """One giant source (95% of rows) + a handful of small ones — the
    exact shape where the per-source window plan loses its parallelism."""
    rows = []
    for i in range(n):
        src = "giant" if i % 20 != 0 else f"small{i % 3}"
        text = " ".join(f"t{j}" for j in range((i * 13) % 40))
        rows.append((i * 11 % 4001, text, src))
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_budget_trim_strategies_agree(spark):
    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.packing import (
        budget_trim,
    )

    docs = skewed_docs_fixture(spark)
    key = lambda r: (r["source"], r["doc_id"])  # noqa: E731
    win = sorted(budget_trim(docs, budget=300, strategy="window").collect(), key=key)
    bkt = sorted(budget_trim(docs, budget=300, strategy="bucketed").collect(), key=key)
    assert len(win) > 0
    assert [tuple(r) for r in win] == [tuple(r) for r in bkt]


def test_budget_trim_auto_switches_on_dominant_source(spark):
    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.packing import (
        _choose_trim_strategy,
        budget_trim,
    )

    docs = skewed_docs_fixture(spark)
    # the giant source (380 rows) crosses a threshold of 100; nothing
    # crosses the default multi-million threshold
    assert _choose_trim_strategy(docs, "source", 100) == "bucketed"
    assert _choose_trim_strategy(docs, "source", 5_000_000) == "window"
    # auto output identical regardless of which plan it picks
    key = lambda r: (r["source"], r["doc_id"])  # noqa: E731
    auto = sorted(
        budget_trim(docs, budget=300, strategy="auto", per_source_threshold=100)
        .collect(),
        key=key,
    )
    win = sorted(budget_trim(docs, budget=300, strategy="window").collect(), key=key)
    assert [tuple(r) for r in auto] == [tuple(r) for r in win]


def test_budget_trim_rejects_bad_strategy(spark):
    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.packing import (
        budget_trim,
    )

    with pytest.raises(ValueError):
        budget_trim(skewed_docs_fixture(spark, n=20), strategy="nope").collect()


def test_weighted_systematic_sample_properties(spark):
    from pyspark.sql import functions as F

    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.packing import (
        weighted_systematic_sample,
    )

    # 20 docs, one giant (w=1000) among small (w=10): W = 1190, k=10,
    # step=119 -> the giant (owning >1/10 of the line) MUST be sampled,
    # with multiple hits; total hits == k exactly
    rows = [(i, 10) for i in range(19)] + [(99, 1000)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = weighted_systematic_sample(df, 10)
    got = {r["doc_id"]: r for r in out.collect()}
    assert sum(r["n_hits"] for r in got.values()) == 10
    assert 99 in got and got[99]["n_hits"] >= 8  # owns 84% of the line
    # python reference: identical grid arithmetic
    order = sorted(rows)
    W = sum(w for _, w in order)
    starts, acc = {}, 0
    for i, w in order:
        starts[i] = (acc, acc + w)
        acc += w
    want = {}
    for j in range(10):
        p = (W * j) // 10
        for i, (s, e) in starts.items():
            if s <= p < e:
                want[i] = want.get(i, 0) + 1
    assert {i: r["n_hits"] for i, r in got.items()} == want
    # uniform weights degenerate to an even systematic pick
    uni = spark.createDataFrame([(i, 5) for i in range(100)], "doc_id long, n_tokens long")
    u = weighted_systematic_sample(uni, 10).collect()
    assert len(u) == 10 and all(r["n_hits"] == 1 for r in u)
