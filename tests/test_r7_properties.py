"""Property-based differential tests for the round-7 operator families:
for ANY random input the distributed plans must equal sequential Python
references (the same discipline as test_packing.py's prefix-sum
property test)."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

# small alphabets force collisions/duplicates to actually occur
_tok = st.sampled_from(["a", "b", "c", "d"])
_doc = st.lists(_tok, min_size=0, max_size=14).map(" ".join)


@settings(max_examples=10, deadline=None)
@given(docs=st.lists(_doc, min_size=1, max_size=12), L=st.integers(2, 4))
def test_exact_substring_dup_matches_python(spark, docs, L):
    """Gram duplication counts, fractions, and longest runs equal a
    brute-force Python pass over any corpus, any gram length."""
    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.dedup import (
        exact_substring_dup,
    )

    rows = [(i * 5 + 2, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["n_grams"],
            r["n_dup_grams"],
            r["max_dup_run"],
            r["dup_fraction"],
        )
        for r in exact_substring_dup(df, min_len=L).collect()
    }

    toks = {i: t.split() for i, t in rows}
    from collections import Counter

    counts: Counter = Counter()
    for v in toks.values():
        for p in range(len(v) - L + 1):
            counts[tuple(v[p : p + L])] += 1
    for i, v in toks.items():
        grams = [tuple(v[p : p + L]) for p in range(len(v) - L + 1)]
        dup = [counts[g] >= 2 for g in grams]
        best = run = 0
        for d in dup:
            run = run + 1 if d else 0
            best = max(best, run)
        frac = (sum(dup) / len(grams)) if grams else None
        g = got[i]
        assert g[0] == len(grams) and g[1] == sum(dup) and g[2] == best
        if frac is None:
            assert g[3] is None
        else:
            assert math.isclose(g[3], frac)


@settings(max_examples=8, deadline=None)
@given(
    data=st.lists(
        st.tuples(_doc, st.sampled_from(["s1", "s2", "giant"])),
        min_size=1,
        max_size=14,
    ),
    budget=st.integers(1, 30),
)
def test_budget_trim_bucketed_equals_window_any_input(spark, data, budget):
    """The 256-way bucketed prefix sum and the per-source window must
    agree on ANY corpus shape and budget (empty docs, budget 1, one
    dominant source)."""
    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.packing import (
        budget_trim,
    )

    rows = [(i * 7 + 3, t, s) for i, (t, s) in enumerate(data)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    win = sorted(
        map(tuple, budget_trim(df, budget=budget, strategy="window").collect()),
        key=lambda t: (t[1], t[0]),
    )
    bkt = sorted(
        map(tuple, budget_trim(df, budget=budget, strategy="bucketed").collect()),
        key=lambda t: (t[1], t[0]),
    )
    assert win == bkt


@settings(max_examples=8, deadline=None)
@given(
    docs=st.lists(_doc.filter(lambda t: t), min_size=2, max_size=10),
    k1=st.floats(0.5, 2.0, allow_nan=False),
    b=st.floats(0.0, 1.0, allow_nan=False),
)
def test_bm25_matches_python_any_corpus(spark, docs, k1, b):
    """BM25 scores (log-free oracle form) equal the Python reference on
    any corpus and any (k1, b) hyper-parameters."""
    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.retrieval import (
        bm25_topk,
    )

    rows = [(i + 1, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    terms = ["a", "c"]
    got = {
        r["doc_id"]: (round(r["score"], 9), r["n_hit_terms"])
        for r in bm25_topk(df, terms, k=50, k1=k1, b=b, log_idf=False).collect()
    }

    toks = {i: t.split() for i, t in rows}
    n = len(rows)
    avgdl = sum(len(v) for v in toks.values()) / n
    dfs = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    want = {}
    for i, v in toks.items():
        s, hits = 0, 0
        for t in terms:
            tf = v.count(t)
            if not tf:
                continue
            hits += 1
            odds = (n - dfs[t] + 0.5) / (dfs[t] + 0.5)
            contrib = odds * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * len(v) / avgdl))
            s += math.floor(contrib * 1e9)
        if hits:
            want[i] = (round(s / 1e9, 9), hits)
    assert got == want


def test_hll_sketches_merge_and_bound(spark, sf_dir):
    """HLL distinct estimates stay within 5% of exact on the testdata,
    and per-group sketches UNION to the whole-table estimate — the
    mergeability that makes the sketch shuffle metadata-sized."""
    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.plans.data_ops import (
        hll_distinct_events,
    )
    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.sources.readers import (
        read_table,
    )

    rows = hll_distinct_events(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["rel_err"] <= 0.05, (r["event_type"], r["rel_err"])

    e = read_table(spark, sf_dir, "events")
    merged = (
        e.groupBy("event_type")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .first()["est"]
    )
    whole = e.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est")
    ).first()["est"]
    assert merged == whole


def test_approx_quantiles_bound(spark, sf_dir):
    """The GK quantile sketch at accuracy 10000 stays within 1% of the
    exact per-group quantiles on the testdata."""
    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.plans.data_ops import (
        approx_quantiles_lineitem,
    )

    rows = approx_quantiles_lineitem(spark, sf_dir).collect()
    assert rows
    for r in rows:
        for tag in ("p5", "p95", "p99"):
            assert r[f"{tag}_rel_err"] <= 0.01, (r["l_returnflag"], tag)
