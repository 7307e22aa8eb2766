"""Hypothesis property tests for the round-15 operators: skyline
dominance semantics, islands reconstruction, trailing distinct
coverage, and LOO target-encoding identities — randomized inputs
against pure-Python ground truth (the r7-r11 hypothesis discipline:
small deadline-free examples, deterministic derandomized profiles)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@st.composite
def _points(draw):
    n = draw(st.integers(min_value=1, max_value=40))
    return [
        (
            draw(st.integers(min_value=0, max_value=8)),
            draw(st.integers(min_value=0, max_value=8)),
        )
        for _ in range(n)
    ]


class TestSkylineProperties:
    @given(pts=_points())
    @settings(**_SETTINGS)
    def test_skyline_is_exactly_nondominated_set(self, spark, pts):
        from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.skyline import (
            skyline_2d_max,
        )

        df = spark.createDataFrame(pts, "x int, y int")
        got = sorted(
            (r.x, r.y) for r in skyline_2d_max(df, "x", "y").collect()
        )
        exp = sorted(
            a
            for a in pts
            if not any(
                d[0] >= a[0]
                and d[1] >= a[1]
                and (d[0] > a[0] or d[1] > a[1])
                for d in pts
            )
        )
        assert got == exp

    @given(pts=_points())
    @settings(**_SETTINGS)
    def test_nd_agrees_with_2d(self, spark, pts):
        from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.skyline import (
            skyline_2d_max,
            skyline_nd_max,
        )

        df = spark.createDataFrame(pts, "x int, y int")
        a = sorted((r.x, r.y) for r in skyline_2d_max(df, "x", "y").collect())
        b = sorted(
            (r.x, r.y) for r in skyline_nd_max(df, ["x", "y"]).collect()
        )
        assert a == b


class TestIslandsProperties:
    @given(
        keys=st.sets(
            st.integers(min_value=0, max_value=300), min_size=1, max_size=80
        )
    )
    @settings(**_SETTINGS)
    def test_islands_reconstruct_key_set(self, spark, keys):
        from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.sequences import (
            key_islands,
        )

        df = spark.createDataFrame([(k,) for k in keys], "k long")
        got = key_islands(df, "k").collect()
        rebuilt = set()
        for r in got:
            assert r.island_len == r.island_end - r.island_start + 1
            rebuilt |= set(range(r.island_start, r.island_end + 1))
        assert rebuilt == keys
        # islands are maximal: no two islands touch or overlap
        spans = sorted((r.island_start, r.island_end) for r in got)
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert s2 > e1 + 1
        # next_gap consistency
        by_start = {r.island_start: r for r in got}
        for (s1, e1), (s2, _) in zip(spans, spans[1:]):
            assert by_start[s1].next_gap == s2 - e1 - 1
        assert by_start[spans[-1][0]].next_gap is None


class TestTrailingDistinctProperties:
    @given(
        rows=st.lists(
            st.tuples(
                st.integers(min_value=1, max_value=6),
                st.integers(min_value=50, max_value=70),
            ),
            min_size=1,
            max_size=60,
        ),
        w=st.integers(min_value=1, max_value=9),
    )
    @settings(**_SETTINGS)
    def test_matches_bruteforce_window(self, spark, rows, w):
        from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.sequences import (
            trailing_distinct_count,
        )

        df = spark.createDataFrame(rows, "u long, d long")
        got = {
            r.day: r.n_active
            for r in trailing_distinct_count(df, "u", "d", w).collect()
        }
        mn = min(d for _, d in rows)
        mx = max(d for _, d in rows)
        assert set(got) == set(range(mn, mx + 1))
        for day in range(mn, mx + 1):
            exp = len({u for u, d in rows if day - w + 1 <= d <= day})
            assert got[day] == exp


class TestLooEncodeProperties:
    @given(
        rows=st.lists(
            st.tuples(
                st.sampled_from(["a", "b", "c"]),
                st.integers(min_value=0, max_value=10_000),
            ),
            min_size=2,
            max_size=40,
        )
    )
    @settings(**_SETTINGS)
    def test_loo_identity(self, spark, rows):
        from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.stats import (
            loo_target_encode,
        )

        data = [(i, g, c / 100.0) for i, (g, c) in enumerate(rows)]
        df = spark.createDataFrame(data, "id long, g string, v double")
        got = {
            r.id: r for r in loo_target_encode(df, "g", "v", "id").collect()
        }
        cents = {i: c for i, (g, c) in enumerate(rows)}
        groups: dict = {}
        for i, (g, _) in enumerate(rows):
            groups.setdefault(g, []).append(i)
        total = sum(cents.values())
        n = len(rows)
        for g, ids in groups.items():
            s = sum(cents[i] for i in ids)
            for i in ids:
                if len(ids) > 1:
                    exp = (s - cents[i]) / (len(ids) - 1)
                else:
                    exp = (total - cents[i]) / (n - 1)
                assert got[i].loo_enc == exp
