"""PassJoin edit-distance join: differential vs brute-force DP.

The blocked join's contract is EXACTNESS — identical pair set to the
naive all-pairs levenshtein join (no false negatives from blocking, no
false positives from the verify). Pinned here on adversarial small
alphabets (dense near-matches), mixed lengths crossing the short-path
boundary, and duplicates-free random corpora.
"""

from __future__ import annotations

import random

import pytest

from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.fuzzy import (
    edit_distance_join,
)


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _brute(strings, k):
    out = set()
    ss = sorted(strings)
    for i in range(len(ss)):
        for j in range(i + 1, len(ss)):
            if abs(len(ss[i]) - len(ss[j])) <= k:
                d = _lev(ss[i], ss[j])
                if d <= k:
                    out.add((ss[i], ss[j], d))
    return out


def _run(spark, strings, k):
    df = spark.createDataFrame([(s,) for s in strings], "s string")
    got = {
        (r["name_a"], r["name_b"], r["dist"])
        for r in edit_distance_join(df, threshold=k, str_col="s").collect()
    }
    assert got == _brute(strings, k)


@pytest.mark.parametrize("k", [1, 2])
def test_dense_small_alphabet(spark, k):
    # every string over {a,b} up to length 4: maximally dense near-matches,
    # exercises empty-segment short path (len <= k) and equal lengths
    import itertools

    pool = [
        "".join(t)
        for n in range(1, 5)
        for t in itertools.product("ab", repeat=n)
    ]
    assert len(pool) == 2 + 4 + 8 + 16
    _run(spark, pool, k)


def test_random_words(spark):
    rng = random.Random(8)
    vocab = ["red", "cold", "small", "old", "big", "green"]
    nouns = ["widget", "gear", "anvil", "bolt", "gizmo", "ring"]
    base = {f"{a} {b}" for a in vocab for b in nouns}
    # perturb some with 1-2 edits
    mutated = set()
    for s in list(base)[:12]:
        t = list(s)
        t[rng.randrange(len(t))] = rng.choice("xyz")
        mutated.add("".join(t))
    _run(spark, sorted(base | mutated), 2)


def test_random_strings_mixed_lengths(spark):
    rng = random.Random(42)
    pool = set()
    while len(pool) < 40:
        n = rng.randrange(1, 10)
        pool.add("".join(rng.choice("abcd") for _ in range(n)))
    _run(spark, sorted(pool), 2)
