"""Hypothesis differentials for the round-8b operators: random inputs
vs independent plain-Python references (SURVEY §5's strategy), covering
the cases fixed fixtures under-sample — dense tie groups, adversarial
near-match string sets, degenerate group sizes."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SLOW = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@SLOW
@given(
    st.sets(st.text(alphabet="abc", min_size=0, max_size=8), min_size=2, max_size=18),
    st.integers(1, 2),
)
def test_edit_distance_join_matches_brute(spark, strings, k):
    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.fuzzy import (
        edit_distance_join,
    )

    strings = sorted(s for s in strings if s)  # non-null, non-empty
    if len(strings) < 2:
        return
    df = spark.createDataFrame([(s,) for s in strings], "s string")
    got = {
        (r["name_a"], r["name_b"], r["dist"])
        for r in edit_distance_join(df, threshold=k, str_col="s").collect()
    }
    want = {
        (a, b, _lev(a, b))
        for i, a in enumerate(strings)
        for b in strings[i + 1 :]
        if _lev(a, b) <= k
    }
    assert got == want


@SLOW
@given(
    st.lists(st.integers(0, 6), min_size=2, max_size=40),
    st.integers(2, 7),
)
def test_equi_depth_matches_python_ntile(spark, vals, B):
    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.stats import (
        equi_depth_histogram,
    )

    rows = [(i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id long, v double")
    got = {
        r["bucket"]: (r["n_rows"], r["min_v"], r["max_v"])
        for r in equi_depth_histogram(df, "v", "id", B).collect()
    }
    # python ntile over (v, id)
    order = sorted(rows, key=lambda t: (t[1], t[0]))
    n = len(order)
    q, r = divmod(n, B)
    want = {}
    idx = 0
    for b in range(1, B + 1):
        size = q + (1 if b <= r else 0)
        if size == 0:
            continue
        chunk = order[idx : idx + size]
        idx += size
        vs = [t[1] for t in chunk]
        want[b] = (size, min(vs), max(vs))
    assert got == want


@SLOW
@given(
    st.lists(
        st.tuples(st.sampled_from("ab"), st.integers(0, 9)),
        min_size=2,
        max_size=40,
    )
)
def test_quantile_normalize_matches_python(spark, items):
    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.stats import (
        quantile_normalize,
    )

    rows = [(g, i, float(v)) for i, (g, v) in enumerate(items)]
    df = spark.createDataFrame(rows, "g string, id long, v double")
    got = {
        (r["g"], r["id"]): r["normalized"]
        for r in quantile_normalize(df, "g", "v", "id").collect()
    }
    N = len(rows)
    glob = sorted(rows, key=lambda t: (t[2], t[1]))
    gvals = [t[2] for t in glob]
    by_g = {}
    for g, i, v in rows:
        by_g.setdefault(g, []).append((v, i))
    for g, members in by_g.items():
        members.sort()
        ng = len(members)
        for r0, (v, i) in enumerate(members):
            h = (N - 1) / 2.0 if ng == 1 else float(N - 1) * float(r0) / float(ng - 1)
            lo, hi = gvals[int(math.floor(h))], gvals[int(math.ceil(h))]
            assert got[(g, i)] == lo + (hi - lo) * (h - math.floor(h))


@SLOW
@given(
    st.lists(st.tuples(st.integers(0, 9), st.integers(0, 9)), min_size=1, max_size=50)
)
def test_triangle_stats_matches_brute(spark, raw_edges):
    from itertools import combinations

    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.graph import (
        triangle_stats,
    )

    edges = [(u, v) for u, v in raw_edges if u != v]
    if not edges:
        return
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    row = triangle_stats(df).first()
    es = {(min(u, v), max(u, v)) for u, v in edges}
    adj = {}
    for a, b in es:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = sum(
        1
        for a, b, c in combinations(sorted(adj), 3)
        if b in adj[a] and c in adj[a] and c in adj[b]
    )
    wedges = sum(len(nb) * (len(nb) - 1) // 2 for nb in adj.values())
    assert (row["n_nodes"], row["n_edges"], row["n_wedges"], row["n_triangles"]) == (
        len(adj),
        len(es),
        wedges,
        tri,
    )
