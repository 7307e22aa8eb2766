"""DSIR importance-selection semantics (the oracle gate pins the
quantized-ratio twin's engine parity; these pin the MEANING, including
the paper's log-weight estimator against a plain-Python reference)."""

from __future__ import annotations

import hashlib
import math

import pytest

from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.selection import (
    dsir_scores,
    dsir_select,
)

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def _bucket(tok: str, m: int) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % m


def _py_dsir(rows, m, log_weights):
    """Plain-Python reference implementation of both estimators."""
    docs = {i: (t.lower().split(), lang == "en") for i, t, lang in rows}
    cr: dict[int, int] = {}
    ct: dict[int, int] = {}
    for toks, is_t in docs.values():
        for tok in toks:
            b = _bucket(tok, m)
            cr[b] = cr.get(b, 0) + 1
            if is_t:
                ct[b] = ct.get(b, 0) + 1
    total_r, total_t = sum(cr.values()), sum(ct.values())
    out = {}
    for i, (toks, is_t) in docs.items():
        counts: dict[int, int] = {}
        for tok in toks:
            b = _bucket(tok, m)
            counts[b] = counts.get(b, 0) + 1
        s = 0.0 if log_weights else 0
        for b, c in counts.items():
            p_t = (ct.get(b, 0) + 1) / (total_t + m)
            p_r = (cr.get(b, 0) + 1) / (total_r + m)
            if log_weights:
                s += c * (math.log(p_t) - math.log(p_r))
            else:
                s += c * math.floor(p_t / p_r * 1e6)
        out[i] = (len(toks), s if log_weights else s / 1e6)
    return out


FIXTURE = [
    (1, "alpha beta gamma alpha", "en"),
    (2, "alpha beta delta", "en"),
    (3, "omega psi chi omega psi", "fr"),
    (4, "alpha omega beta psi", "fr"),
    (5, "gamma gamma delta alpha beta", "en"),
    (6, "chi chi psi omega", "de"),
]


@pytest.mark.parametrize("log_weights", [True, False])
def test_dsir_scores_match_python(spark, log_weights):
    got = {
        r["doc_id"]: (r["n_tokens"], r["score"])
        for r in dsir_scores(
            _docs(spark, FIXTURE),
            F.col("lang") == "en",
            n_buckets=64,
            log_weights=log_weights,
        ).collect()
    }
    want = _py_dsir(FIXTURE, 64, log_weights)
    assert set(got) == set(want)
    for i in got:
        assert got[i][0] == want[i][0]
        assert math.isclose(got[i][1], want[i][1], rel_tol=1e-9), (i, got[i], want[i])


def test_dsir_ranks_target_like_docs_higher(spark):
    """Docs made of target-only vocabulary must out-score docs made of
    non-target vocabulary, under both estimators."""
    rows = (
        [(i, "aaa bbb ccc ddd", "en") for i in range(1, 9)]
        + [(i, "xxx yyy zzz www", "fr") for i in range(9, 17)]
        + [(100, "aaa bbb ccc ddd", "fr"), (101, "xxx yyy zzz www", "en")]
    )
    for lw in (True, False):
        got = {
            r["doc_id"]: r["score"]
            for r in dsir_scores(
                _docs(spark, rows), F.col("lang") == "en", n_buckets=256, log_weights=lw
            ).collect()
        }
        # doc 100 uses target vocabulary (despite its own lang) → high;
        # doc 101 uses non-target vocabulary → low
        assert got[100] > got[101], (lw, got[100], got[101])


def test_dsir_select_topk_deterministic(spark):
    sel = dsir_select(
        _docs(spark, FIXTURE), F.col("lang") == "en", k=3, n_buckets=64,
        log_weights=False,
    )
    ids = [r["doc_id"] for r in sel.collect()]
    assert len(ids) == 3
    scores = {
        r["doc_id"]: r["score"]
        for r in dsir_scores(
            _docs(spark, FIXTURE), F.col("lang") == "en", n_buckets=64,
            log_weights=False,
        ).collect()
    }
    want = sorted(scores, key=lambda i: (-scores[i], i))[:3]
    assert ids == want


class TestKAnonymity:
    def test_hand_computed_violations(self, spark):
        from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.quality_checks import (
            k_anonymity_report,
        )

        rows = [
            # class (1,'A'): 6 rows, sensitive {10,20} -> no violations
            *[(1, "A", 10) for _ in range(3)],
            *[(1, "A", 20) for _ in range(3)],
            # class (1,'B'): 2 rows -> k violation; {10,20} -> l ok
            (1, "B", 10), (1, "B", 20),
            # class (2,'A'): 5 rows all sensitive 7 -> l violation only
            *[(2, "A", 7) for _ in range(5)],
        ]
        df = spark.createDataFrame(rows, "q1 int, q2 string, sv long")
        out = {
            (r["q1"], r["q2"]): r
            for r in k_anonymity_report(df, ["q1", "q2"], "sv", k=5, l=2).collect()
        }
        a = out[(1, "A")]
        assert a["class_size"] == 6 and a["l_distinct"] == 2
        assert not a["k_violation"] and not a["l_violation"]
        b = out[(1, "B")]
        assert b["class_size"] == 2 and b["k_violation"] and not b["l_violation"]
        c = out[(2, "A")]
        assert c["class_size"] == 5 and not c["k_violation"] and c["l_violation"]
