"""BM25 retrieval + exact-substring dedup semantics (VERDICT r6 "Next
round" item 8). The oracle gate pins engine bit-parity of the log-free
query forms; these pin the MEANING on hand-built fixtures, including
the textbook ln-idf BM25 path against a plain-Python reference."""

from __future__ import annotations

import math

import pytest

from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.dedup import (
    exact_substring_dup,
)
from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.retrieval import (
    bm25_topk,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# --- exact_substring_dup --------------------------------------------------


def test_exact_substring_dup_fixture(spark):
    """Doc 1 and 2 share the 6-token clone "a b c d e f" (two 5-gram
    starts, a run of 2 ⇒ repeated substring of 2+5-1 = 6 tokens); doc 3
    is unique; doc 4 is too short to carry any 5-gram."""
    docs = _docs(
        spark,
        [
            (1, "a b c d e f x y z w"),
            (2, "q r a b c d e f s t"),
            (3, "u v w x2 y2 z2 k m n o"),
            (4, "tiny doc"),
        ],
    )
    got = {r["doc_id"]: r for r in exact_substring_dup(docs, min_len=5).collect()}
    assert set(got) == {1, 2, 3, 4}
    for d in (1, 2):
        assert got[d]["n_grams"] == 6
        assert got[d]["n_dup_grams"] == 2
        assert got[d]["max_dup_run"] == 2
        assert math.isclose(got[d]["dup_fraction"], 2 / 6)
    assert got[3]["n_dup_grams"] == 0 and got[3]["max_dup_run"] == 0
    assert got[4]["n_grams"] == 0 and got[4]["dup_fraction"] is None


def test_exact_substring_dup_counts_within_doc_repeats(spark):
    """A gram repeated twice INSIDE one document is duplicated (the
    suffix array does not care where the second copy lives)."""
    docs = _docs(spark, [(1, "a b c d e z a b c d e"), (2, "p q r s t u v")])
    got = {r["doc_id"]: r for r in exact_substring_dup(docs, min_len=5).collect()}
    # "a b c d e" occurs at pos 1 and 7 of doc 1
    assert got[1]["n_dup_grams"] == 2
    assert got[2]["n_dup_grams"] == 0


def test_exact_substring_dup_partition_invariant(spark):
    docs = _docs(
        spark, [(i, f"w{i % 4} x y z common tail run {i % 3}") for i in range(40)]
    )
    a = sorted(map(tuple, exact_substring_dup(docs, min_len=5).collect()))
    b = sorted(map(tuple, exact_substring_dup(docs.repartition(13), min_len=5).collect()))
    assert a == b


# --- bm25_topk ------------------------------------------------------------


def _py_bm25(corpus, terms, k1=1.2, b=0.75, log_idf=True):
    """Plain-Python textbook BM25 (ln idf), the differential reference."""
    tok = {i: t.lower().split() for i, t in corpus.items()}
    n = len(corpus)
    avgdl = sum(len(v) for v in tok.values()) / n
    df = {t: sum(1 for v in tok.values() if t in v) for t in terms}
    out = {}
    for i, v in tok.items():
        s, hits = 0.0, 0
        for t in terms:
            tf = v.count(t)
            if tf == 0:
                continue
            hits += 1
            odds = (n - df[t] + 0.5) / (df[t] + 0.5)
            idf = math.log(odds + 1.0) if log_idf else odds
            contrib = idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * len(v) / avgdl))
            s += math.floor(contrib * 1e9) / 1e9
        if hits:
            out[i] = (round(s, 9), hits)
    return out


@pytest.mark.parametrize("log_idf", [True, False])
def test_bm25_log_idf_matches_python(spark, log_idf):
    corpus = {
        1: "spark shuffle join spark spark agg",
        2: "hash join merge sort",
        3: "vector scan filter window",
        4: "the quick brown fox",
        5: "spark hash vector merge stream stream",
    }
    docs = _docs(spark, list(corpus.items())[::-1])
    terms = ["spark", "hash", "vector"]
    got = {
        r["doc_id"]: (round(r["score"], 9), r["n_hit_terms"])
        for r in bm25_topk(docs, terms, k=10, log_idf=log_idf).collect()
    }
    want = _py_bm25(corpus, terms, log_idf=log_idf)
    assert got == want


def test_bm25_ranking_properties(spark):
    """More matching occurrences of a rare term ⇒ higher score; docs
    with no query term never appear; k truncates."""
    docs = _docs(
        spark,
        [
            (1, "spark spark spark filler filler filler"),
            (2, "spark filler filler filler filler filler"),
            (3, "filler filler filler filler filler filler"),
            (4, "spark spark filler filler filler filler"),
        ],
    )
    rows = bm25_topk(docs, ["spark"], k=2).collect()
    assert [r["doc_id"] for r in rows] == [1, 4]
    all_rows = bm25_topk(docs, ["spark"], k=10).collect()
    assert {r["doc_id"] for r in all_rows} == {1, 2, 4}


def test_bm25_rejects_empty_query(spark):
    with pytest.raises(ValueError):
        bm25_topk(_docs(spark, [(1, "a")]), [])
