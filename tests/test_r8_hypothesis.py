"""Hypothesis differentials for round-8 operators: random inputs vs
independent plain-Python references (the test strategy SURVEY §5 sets
for every nontrivial operator)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SLOW = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@st.composite
def changelog(draw):
    n_keys = draw(st.integers(2, 8))
    snap = {
        k: draw(st.integers(0, 100)) for k in range(n_keys) if draw(st.booleans())
    }
    n_ch = draw(st.integers(0, 12))
    changes = []
    for i in range(n_ch):
        k = draw(st.integers(0, n_keys + 2))
        op = draw(st.sampled_from(["U", "D", "I"]))
        changes.append((k, draw(st.integers(0, 100)), op, i))
    return snap, changes


@SLOW
@given(changelog())
def test_merge_upsert_matches_python(spark, data):
    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.merge import (
        merge_upsert,
    )

    snap, changes = data
    snap_df = spark.createDataFrame(
        [(k, v) for k, v in snap.items()] or [(None, None)], "k long, v long"
    ).where("k is not null")
    ch_df = spark.createDataFrame(
        changes or [(None, None, None, None)], "k long, v long, op string, seq long"
    ).where("k is not null")
    got = {r["k"]: r["v"] for r in merge_upsert(snap_df, ch_df, keys=["k"]).collect()}

    # python reference: latest change per key wins, D deletes, U/I upsert
    latest = {}
    for k, v, op, seq in changes:
        if k not in latest or seq > latest[k][2]:
            latest[k] = (v, op, seq)
    expect = dict(snap)
    for k, (v, op, _) in latest.items():
        if op == "D":
            expect.pop(k, None)
        else:
            expect[k] = v
    assert got == expect


@SLOW
@given(
    st.lists(st.text(alphabet="abc ", min_size=0, max_size=12), min_size=1, max_size=12)
)
def test_incremental_dedup_matches_python(spark, texts):
    import hashlib
    import re

    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.dedup import (
        incremental_dedup,
        snapshot_digest_index,
    )

    half = max(1, len(texts) // 2)
    snap_rows = [(i, t) for i, t in enumerate(texts[:half])]
    delta_rows = [(100 + i, t) for i, t in enumerate(texts)]
    snap = spark.createDataFrame(snap_rows, "doc_id long, text string")
    delta = spark.createDataFrame(delta_rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r["status"]
        for r in incremental_dedup(
            delta, snapshot_digest_index(snap), broadcast_index=True
        ).collect()
    }

    def digest(t):
        return hashlib.md5(re.sub(r"\s+", " ", t.lower()).encode()).hexdigest()

    snap_d = {digest(t) for _, t in snap_rows}
    first_seen = {}
    for i, t in sorted(delta_rows):
        first_seen.setdefault(digest(t), i)
    for i, t in delta_rows:
        d = digest(t)
        if d in snap_d:
            assert out[i] == "dup_snapshot", (i, t)
        elif first_seen[d] != i:
            assert out[i] == "dup_delta", (i, t)
        else:
            assert out[i] == "kept", (i, t)


@SLOW
@given(
    st.lists(
        st.text(alphabet="xy z", min_size=1, max_size=16), min_size=1, max_size=10
    ),
    st.integers(2, 5),
)
def test_inverted_index_matches_python(spark, texts, n_shards):
    import hashlib
    from collections import Counter, defaultdict

    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.retrieval import (
        build_inverted_index,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["term"], r["shard"]): r
        for r in build_inverted_index(df, n_shards=n_shards, min_df=1).collect()
    }

    def shard(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % n_shards

    expect = defaultdict(dict)
    df_tot = Counter()
    for i, t in rows:
        toks = Counter(t.lower().split())
        for term, tf in toks.items():
            expect[(term, shard(i))][i] = tf
            df_tot[term] += 1
    assert set(got) == set(expect)
    for (term, sh), postings in expect.items():
        r = got[(term, sh)]
        assert r["df"] == df_tot[term]
        assert r["shard_df"] == len(postings)
        want = ",".join(f"{i}:{tf}" for i, tf in sorted(postings.items()))
        assert r["postings"] == want
