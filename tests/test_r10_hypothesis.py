"""Hypothesis differentials for round-10 operators: random graphs /
groups vs independent plain-Python references (the SURVEY §5 strategy
— every nontrivial operator gets a brute-force twin on arbitrary
inputs, not just hand fixtures)."""

from __future__ import annotations

from collections import Counter, defaultdict, deque

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SLOW = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@st.composite
def random_graph(draw):
    n = draw(st.integers(2, 12))
    n_edges = draw(st.integers(1, 24))
    edges = [
        (draw(st.integers(0, n - 1)), draw(st.integers(0, n - 1)))
        for _ in range(n_edges)
    ]
    return edges


def _adj(edges):
    adj = defaultdict(set)
    for u, v in edges:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    return adj


@SLOW
@given(random_graph(), st.integers(1, 4))
def test_label_propagation_matches_python(spark, edges, rounds):
    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.graph import (
        label_propagation,
    )

    adj = _adj(edges)
    if not adj:
        return  # all self-loops: operator output is empty, nothing to compare
    labels = {u: u for u in adj}
    for _ in range(rounds):
        labels = {
            u: max(
                Counter(labels[m] for m in adj[u]).items(),
                key=lambda kv: (kv[1], -kv[0]),
            )[0]
            for u in adj
        }
    df = spark.createDataFrame(
        [(int(u), int(v)) for u, v in edges], "id_a long, id_b long"
    )
    got = {
        r["id"]: r["community"]
        for r in label_propagation(df, rounds=rounds).collect()
    }
    assert got == labels


@SLOW
@given(random_graph(), st.lists(st.integers(0, 11), min_size=1, max_size=3), st.integers(1, 5))
def test_bfs_distances_matches_python(spark, edges, seeds, max_hops):
    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.graph import (
        bfs_distances,
    )

    adj = _adj(edges)
    dist = {s: 0 for s in seeds if s in adj}
    dq = deque(dist)
    while dq:
        u = dq.popleft()
        if dist[u] >= max_hops:
            continue
        for m in adj[u]:
            if m not in dist:
                dist[m] = dist[u] + 1
                dq.append(m)
    e = spark.createDataFrame(
        [(int(u), int(v)) for u, v in edges], "id_a long, id_b long"
    )
    s = spark.createDataFrame([(int(x),) for x in set(seeds)], "id long")
    got = {
        r["id"]: r["dist"]
        for r in bfs_distances(e, s, max_hops=max_hops).collect()
    }
    assert got == dist


@SLOW
@given(
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 1000), st.integers(0, 10**7)),
        min_size=1,
        max_size=40,
    )
)
def test_grouped_ols_matches_python(spark, rows):
    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.stats import (
        grouped_ols,
    )

    df = spark.createDataFrame(
        [(str(g), int(x), int(y)) for g, x, y in rows], "g string, x long, y long"
    )
    got = {
        r["g"]: (r["n_rows"], r["slope"], r["intercept"])
        for r in grouped_ols(df, "g", "x", "y").collect()
    }
    by_g = defaultdict(list)
    for g, x, y in rows:
        by_g[str(g)].append((x, y))
    for g, pts in by_g.items():
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        sxx = sum(x * x for x, _ in pts)
        den = n * sxx - sx * sx
        assert got[g][0] == n
        if den == 0:
            assert got[g][1] is None and got[g][2] is None
        else:
            slope = float(n * sxy - sx * sy) / float(den)
            assert got[g][1] == slope  # bitwise: same exact ints, one division
            assert got[g][2] == (float(sy) - slope * float(sx)) / float(n)


@SLOW
@given(
    st.lists(
        st.tuples(st.integers(0, 1), st.floats(0, 1000, allow_nan=False)),
        min_size=1,
        max_size=30,
    )
)
def test_grouped_gini_matches_python(spark, rows):
    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.arrow_ops import (
        grouped_gini,
    )

    df = spark.createDataFrame(
        [(str(g), float(v)) for g, v in rows], "g string, v double"
    )
    got = {
        r["g"]: (r["n_rows"], r["sum_cents"], r["gini"])
        for r in grouped_gini(df, "g", "v").collect()
    }
    by_g = defaultdict(list)
    for g, v in rows:
        # Spark-side F.round is HALF_UP on the double product — mirror
        # with decimal-free arithmetic on the same double
        import math

        prod = v * 100
        frac = prod - math.floor(prod)
        cents = int(math.floor(prod)) + (1 if frac >= 0.5 else 0)
        by_g[str(g)].append(cents)
    for g, cents in by_g.items():
        cents.sort()
        n, s = len(cents), sum(cents)
        w = sum(i * c for i, c in enumerate(cents, 1))
        assert got[g][0] == n and got[g][1] == s
        if n * s == 0:
            assert got[g][2] is None
        else:
            assert got[g][2] == float(2 * w - (n + 1) * s) / float(n * s)
