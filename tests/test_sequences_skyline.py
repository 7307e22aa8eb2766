"""Hand fixtures + brute-force differentials for the r15 operators:
skyline (Pareto dominance), gaps-and-islands, round-amount bias, and
the Poisson conditional-binomial rate test."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.fraud_stats import (
    round_amount_bias,
)
from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.sequences import (
    key_islands,
)
from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.skyline import (
    skyline_2d_max,
)
from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.stats import (
    poisson_rate_ztest,
)


def _brute_skyline(pts):
    out = []
    for a in pts:
        dominated = any(
            d[0] >= a[0]
            and d[1] >= a[1]
            and (d[0] > a[0] or d[1] > a[1])
            for d in pts
        )
        if not dominated:
            out.append(a)
    return sorted(out)


class TestSkyline:
    def test_hand_fixture_with_ties(self, spark):
        # (3,5) and a duplicate of it both survive (mutual ties);
        # (3,4) is dominated by (3,5) (x tie, y strict);
        # (2,9) survives (best y); (5,1) survives (best x);
        # (1,1) dominated by everything.
        pts = [(3, 5), (3, 5), (3, 4), (2, 9), (5, 1), (1, 1)]
        df = spark.createDataFrame(pts, "x int, y int")
        got = sorted(
            (r.x, r.y) for r in skyline_2d_max(df, "x", "y").collect()
        )
        assert got == [(2, 9), (3, 5), (3, 5), (5, 1)]

    def test_differential_vs_brute_force(self, spark):
        rng = random.Random(7)
        pts = [(rng.randint(0, 20), rng.randint(0, 20)) for _ in range(300)]
        df = spark.createDataFrame(pts, "x int, y int")
        got = sorted(
            (r.x, r.y) for r in skyline_2d_max(df, "x", "y").collect()
        )
        assert got == _brute_skyline(pts)

    def test_nulls_dropped(self, spark):
        df = spark.createDataFrame(
            [(1, None), (None, 9), (2, 2)], "x int, y int"
        )
        got = [(r.x, r.y) for r in skyline_2d_max(df, "x", "y").collect()]
        assert got == [(2, 2)]

    def test_keeps_all_columns(self, spark):
        df = spark.createDataFrame(
            [(1, 1, "a"), (2, 2, "b")], "x int, y int, tag string"
        )
        got = skyline_2d_max(df, "x", "y")
        assert got.columns == ["x", "y", "tag"]
        assert [r.tag for r in got.collect()] == ["b"]


class TestKeyIslands:
    def test_hand_fixture(self, spark):
        keys = [1, 2, 3, 7, 9, 10]
        df = spark.createDataFrame([(k,) for k in keys], "k long")
        got = sorted(
            (r.island_start, r.island_end, r.island_len, r.next_gap)
            for r in key_islands(df, "k").collect()
        )
        assert got == [(1, 3, 3, 3), (7, 7, 1, 1), (9, 10, 2, None)]

    def test_single_island_no_gap(self, spark):
        df = spark.createDataFrame([(k,) for k in range(5, 11)], "k long")
        got = key_islands(df, "k").collect()
        assert len(got) == 1
        r = got[0]
        assert (r.island_start, r.island_end, r.island_len, r.next_gap) == (
            5,
            10,
            6,
            None,
        )

    def test_differential_vs_python(self, spark):
        rng = random.Random(42)
        keys = sorted(rng.sample(range(0, 2000), 700))
        df = spark.createDataFrame([(k,) for k in keys], "k long")
        # brute islands
        exp = []
        start = prev = keys[0]
        for k in keys[1:]:
            if k == prev + 1:
                prev = k
                continue
            exp.append((start, prev, prev - start + 1, k - prev - 1))
            start = prev = k
        exp.append((start, prev, prev - start + 1, None))
        got = sorted(
            (r.island_start, r.island_end, r.island_len, r.next_gap)
            for r in key_islands(df, "k").collect()
        )
        assert got == sorted(exp)

    def test_ignores_nulls(self, spark):
        df = spark.createDataFrame([(1,), (None,), (2,)], "k long")
        got = key_islands(df, "k").collect()
        assert len(got) == 1 and got[0].island_len == 2

    def test_duplicate_keys_raise(self, spark):
        # ADVICE r15: duplicates must raise, not silently merge
        # islands — including ODD-sized tie groups, which the old
        # r2-parity claim could never detect (three 7s below).
        import pytest as _pytest

        df = spark.createDataFrame(
            [(1,), (2,), (7,), (7,), (7,), (9,)], "k long"
        )
        with _pytest.raises(ValueError, match="UNIQUE key column"):
            key_islands(df, "k")

    def test_even_duplicate_keys_raise(self, spark):
        import pytest as _pytest

        df = spark.createDataFrame([(4,), (4,), (6,)], "k long")
        with _pytest.raises(ValueError, match="UNIQUE key column"):
            key_islands(df, "k")


class TestRoundAmountBias:
    def test_hand_counts(self, spark):
        # group a: 100.00, 200.00, 33.33 -> 2 round of 3
        # group b: 50.001 (rounds to 5000 cents -> round), 7.77 -> 1 of 2
        rows = [
            ("a", 100.00),
            ("a", 200.00),
            ("a", 33.33),
            ("b", 50.001),
            ("b", 7.77),
        ]
        df = spark.createDataFrame(rows, "g string, v double")
        got = {
            r.grp: r
            for r in round_amount_bias(df, "g", "v", round_cents=100).collect()
        }
        assert (got["a"].n, got["a"].n_round) == (3, 2)
        assert (got["b"].n, got["b"].n_round) == (2, 1)
        p0 = 3.0 / 5.0
        z_a = (2.0 - 3.0 * p0) / math.sqrt(3.0 * p0 * (1.0 - p0))
        assert got["a"].z == z_a
        assert got["a"].base_rate == p0

    def test_cents_exactness(self, spark):
        # 0.1+0.2-style float noise must not flip roundness: a value
        # stored as 99.99999999999999 dollars is 100.00 in cents.
        df = spark.createDataFrame(
            [("a", 99.99999999999999), ("a", 100.01)], "g string, v double"
        )
        got = round_amount_bias(df, "g", "v", round_cents=100).collect()[0]
        assert got.n_round == 1


class TestPoissonRateZtest:
    def test_hand_z(self, spark):
        counts = spark.createDataFrame(
            [("t", 30, 100)], "grp string, k1 long, k long"
        )
        expo = spark.createDataFrame([(2, 7)], "e1 long, e long")
        r = poisson_rate_ztest(counts, expo).collect()[0]
        p = 2.0 / 7.0
        mu = 100.0 * p
        assert r.p_null == p
        assert r.z == (30.0 - mu) / math.sqrt(mu * (1.0 - p))
        assert bool(r.significant) == (abs(r.z) > 2.5758293035489004)

    def test_null_rate_no_flag(self, spark):
        # exactly the null proportion -> z == 0, not significant
        counts = spark.createDataFrame(
            [("t", 20, 70)], "grp string, k1 long, k long"
        )
        expo = spark.createDataFrame([(2, 7)], "e1 long, e long")
        r = poisson_rate_ztest(counts, expo).collect()[0]
        assert r.z == 0.0 and not r.significant


def _brute_skyline_nd(pts):
    out = []
    for a in pts:
        dominated = any(
            all(d[i] >= a[i] for i in range(len(a)))
            and any(d[i] > a[i] for i in range(len(a)))
            for d in pts
        )
        if not dominated:
            out.append(a)
    return sorted(out)


class TestSkylineNd:
    def test_differential_3d_vs_brute_force(self, spark):
        from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.skyline import (
            skyline_nd_max,
        )

        rng = random.Random(11)
        pts = [
            (rng.randint(0, 15), rng.randint(0, 15), rng.randint(0, 15))
            for _ in range(400)
        ]
        df = spark.createDataFrame(pts, "x long, y long, z long").repartition(
            8
        )
        got = sorted(
            (r.x, r.y, r.z)
            for r in skyline_nd_max(df, ["x", "y", "z"]).collect()
        )
        assert got == _brute_skyline_nd(pts)

    def test_ties_survive_and_columns_kept(self, spark):
        from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.skyline import (
            skyline_nd_max,
        )

        df = spark.createDataFrame(
            [(5, 5, "a"), (5, 5, "b"), (4, 6, "c"), (4, 5, "d")],
            "x long, y long, tag string",
        )
        got = sorted(
            (r.x, r.y, r.tag)
            for r in skyline_nd_max(df, ["x", "y"]).collect()
        )
        assert got == [(4, 6, "c"), (5, 5, "a"), (5, 5, "b")]

    def test_max_local_cap_raises(self, spark):
        from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.skyline import (
            skyline_nd_max,
        )
        import pytest as _pytest

        # anti-chain: every point is on the skyline -> cap must trip
        pts = [(i, 100 - i) for i in range(50)]
        df = spark.createDataFrame(pts, "x long, y long").coalesce(1)
        with _pytest.raises(Exception, match="max_local"):
            skyline_nd_max(df, ["x", "y"], max_local=10).collect()

    def test_agrees_with_2d_operator(self, spark):
        from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.skyline import (
            skyline_2d_max,
            skyline_nd_max,
        )

        rng = random.Random(3)
        pts = [(rng.randint(0, 30), rng.randint(0, 30)) for _ in range(500)]
        df = spark.createDataFrame(pts, "x long, y long")
        a = sorted((r.x, r.y) for r in skyline_2d_max(df, "x", "y").collect())
        b = sorted(
            (r.x, r.y) for r in skyline_nd_max(df, ["x", "y"]).collect()
        )
        assert a == b


class TestRfmNtiles:
    def test_quintiles_hand_fixture(self, spark):
        from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.stats import (
            exact_ntile_assign,
        )

        # 10 customers, values 1..10 -> quintiles of size 2: value 1,2
        # -> bucket 1 ... value 9,10 -> bucket 5
        df = spark.createDataFrame(
            [(i, i) for i in range(1, 11)], "v long, id long"
        )
        got = {
            r._id: r.bucket
            for r in exact_ntile_assign(df, "v", "id", 5, "long").collect()
        }
        assert got == {i: (i + 1) // 2 for i in range(1, 11)}


class TestStreamingRoundBias:
    def test_drained_stream_equals_batch(self, spark):
        from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.fraud_stats import (
            round_amount_bias,
        )
        from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.sources.readers import (
            read_table,
        )
        from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.streaming.jobs import (
            stream_round_amount_bias,
        )

        sf_dir = "/root/testdata/sf0.001"
        batch = round_amount_bias(
            read_table(spark, sf_dir, "orders"),
            "o_orderpriority",
            "o_totalprice",
            round_cents=100,
        ).collect()
        streamed = stream_round_amount_bias(spark, sf_dir, n_files=3).collect()
        assert sorted(map(tuple, streamed)) == sorted(map(tuple, batch))


class TestBenfordFirst2:
    def test_hand_counts_and_masses(self, spark):
        from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.fraud_stats import (
            BENFORD2_P,
            benford_first2_profile,
        )

        assert len(BENFORD2_P) == 90
        assert abs(sum(BENFORD2_P) - 1.0) < 1e-12
        # amounts 1.23 (123 cents -> 12), 0.10 (10 cents -> 10),
        # 0.05 (5 cents -> excluded: single digit), 99.00 (9900 -> 99)
        rows = [("a", 1.23), ("a", 0.10), ("a", 0.05), ("a", 99.00)]
        df = spark.createDataFrame(rows, "g string, v double")
        got = {
            r.digit: r
            for r in benford_first2_profile(df, "v", "g").collect()
        }
        assert len(got) == 90
        assert got[12].n_obs == 1 and got[10].n_obs == 1 and got[99].n_obs == 1
        assert got[11].n_obs == 0
        assert got[12].n_total == 3  # the 5-cent row is excluded
        assert got[10].expected_p == math.log10(1.0 + 1.0 / 10.0)

    def test_chi2_matches_python(self, spark):
        from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.fraud_stats import (
            BENFORD2_P,
            benford_first2_profile,
        )

        rng = random.Random(5)
        rows = [("g", round(rng.uniform(0.10, 9999.0), 2)) for _ in range(500)]
        df = spark.createDataFrame(rows, "g string, v double")
        out = benford_first2_profile(df, "v", "g").collect()
        n_total = out[0].n_total
        obs = {r.digit: r.n_obs for r in out}
        q = 0
        for d, p in zip(range(10, 100), BENFORD2_P):
            e = n_total * p
            q += math.floor((obs[d] - e) * (obs[d] - e) / e * 1e9)
        assert out[0].chi2 == q / 1e9


class TestTrailingDistinct:
    def test_differential_vs_python(self, spark):
        from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.sequences import (
            trailing_distinct_count,
        )

        rng = random.Random(9)
        rows = [
            (rng.randint(1, 20), rng.randint(100, 160)) for _ in range(500)
        ]
        df = spark.createDataFrame(rows, "u long, d long")
        got = {
            r.day: r.n_active
            for r in trailing_distinct_count(df, "u", "d", 7).collect()
        }
        mn, mx = min(d for _, d in rows), max(d for _, d in rows)
        assert set(got) == set(range(mn, mx + 1))
        for day in range(mn, mx + 1):
            exp = len({u for u, d in rows if day - 6 <= d <= day})
            assert got[day] == exp, day

    def test_gap_days_counted_as_zero_or_carry(self, spark):
        from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.sequences import (
            trailing_distinct_count,
        )

        # activity on day 100 only: days 100..106 see 1 active, and a
        # second burst on 120 leaves 107..113 carrying... nothing:
        # 107-113 have window [101,107]..[107,113] -> 0 from day 107 on
        df = spark.createDataFrame([(1, 100), (1, 120)], "u long, d long")
        got = {
            r.day: r.n_active
            for r in trailing_distinct_count(df, "u", "d", 7).collect()
        }
        assert all(got[d] == 1 for d in range(100, 107))
        assert all(got[d] == 0 for d in range(107, 120))
        assert got[120] == 1


class TestLjungBox:
    def test_q_matches_python_formula(self, spark):
        import datetime as _dt

        from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.stats import (
            acf_daily,
            ljung_box_daily,
        )

        rng = random.Random(13)
        rows = [
            (
                "t",
                _dt.datetime(2024, 1, 1) + _dt.timedelta(days=i, hours=3),
                round(rng.uniform(1, 50), 2),
            )
            for i in range(40)
        ]
        df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
        acf = acf_daily(df).collect()[0]
        lb = ljung_box_daily(df).collect()[0]
        n = float(acf.n_days)
        t = (
            (acf.acf_lag1 * acf.acf_lag1) / (n - 1.0)
            + (acf.acf_lag2 * acf.acf_lag2) / (n - 2.0)
        ) + (acf.acf_lag3 * acf.acf_lag3) / (n - 3.0)
        assert lb.lb_q == n * (n + 2.0) * t
        assert bool(lb.reject_white_noise) == (lb.lb_q > 11.344866730144373)

    def test_short_series_null(self, spark):
        import datetime as _dt

        from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.stats import (
            ljung_box_daily,
        )

        rows = [
            ("t", _dt.datetime(2024, 1, 1 + i), 5.0) for i in range(2)
        ]
        df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
        r = ljung_box_daily(df).collect()[0]
        assert r.lb_q is None and r.reject_white_noise is None

    def test_lags_guard(self, spark):
        import pytest as _pytest

        from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.stats import (
            ljung_box_daily,
        )

        with _pytest.raises(ValueError, match="1..m"):
            ljung_box_daily(None, lags=(2, 3))

    def test_lags_depth4_works_depth7_raises(self, spark):
        # ADVICE r15: lags=(1,2,3,4) used to pass the 1..m guard and
        # crash with a bare KeyError on the critical-value lookup
        import datetime as _dt

        import pytest as _pytest

        from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.stats import (
            ljung_box_daily,
        )

        rng = random.Random(29)
        rows = [
            (
                "t",
                _dt.datetime(2024, 1, 1) + _dt.timedelta(days=i, hours=2),
                round(rng.uniform(1, 40), 2),
            )
            for i in range(30)
        ]
        df = spark.createDataFrame(
            rows, "event_type string, ts timestamp, value double"
        )
        r = ljung_box_daily(df, lags=(1, 2, 3, 4)).collect()[0]
        assert r.lb_q is not None
        # χ²_0.99(4) pinned literal drives the decision
        assert bool(r.reject_white_noise) == (r.lb_q > 13.276704135987622)
        with _pytest.raises(ValueError, match="critical-value table"):
            ljung_box_daily(df, lags=tuple(range(1, 8)))


class TestPacf:
    def test_matches_durbin_levinson_python(self, spark):
        import datetime as _dt

        from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.stats import (
            acf_daily,
            pacf_daily,
        )

        rng = random.Random(21)
        rows = [
            (
                "t",
                _dt.datetime(2024, 1, 1) + _dt.timedelta(days=i, hours=2),
                round(rng.uniform(1, 80), 2),
            )
            for i in range(60)
        ]
        df = spark.createDataFrame(
            rows, "event_type string, ts timestamp, value double"
        )
        acf = acf_daily(df).collect()[0]
        got = pacf_daily(df).collect()[0]
        r = [None, acf.acf_lag1, acf.acf_lag2, acf.acf_lag3]
        # generic Durbin-Levinson (float, not the pinned tree —
        # compare with tolerance)
        phi = {(1, 1): r[1]}
        for k in (2, 3):
            num = r[k] - sum(phi[(k - 1, j)] * r[k - j] for j in range(1, k))
            den = 1.0 - sum(phi[(k - 1, j)] * r[j] for j in range(1, k))
            phi[(k, k)] = num / den
            for j in range(1, k):
                phi[(k, j)] = phi[(k - 1, j)] - phi[(k, k)] * phi[(k - 1, k - j)]
        assert abs(got.pacf_lag1 - phi[(1, 1)]) < 1e-12
        assert abs(got.pacf_lag2 - phi[(2, 2)]) < 1e-12
        assert abs(got.pacf_lag3 - phi[(3, 3)]) < 1e-12

    def test_white_noise_pacf_small(self, spark):
        import datetime as _dt

        from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.stats import (
            pacf_daily,
        )

        rng = random.Random(2)
        rows = [
            (
                "t",
                _dt.datetime(2024, 1, 1) + _dt.timedelta(days=i),
                round(rng.uniform(10, 20), 2),
            )
            for i in range(200)
        ]
        df = spark.createDataFrame(
            rows, "event_type string, ts timestamp, value double"
        )
        got = pacf_daily(df).collect()[0]
        # iid series: every pacf within a loose 3/sqrt(n) band
        band = 3.0 / math.sqrt(200)
        assert abs(got.pacf_lag1) < band
        assert abs(got.pacf_lag2) < band
        assert abs(got.pacf_lag3) < band


class TestStreamingRollingWau:
    def test_drained_stream_equals_batch(self, spark):
        from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.plans import (
            REGISTRY,
        )

        sf_dir = "/root/testdata/sf0.001"
        batch = REGISTRY["rolling_wau_events"].builder(spark, sf_dir).collect()
        streamed = REGISTRY["streaming_rolling_wau"].builder(
            spark, sf_dir
        ).collect()
        assert sorted(map(tuple, streamed)) == sorted(map(tuple, batch))


def _exact_brandes(adj, nodes):
    # Brandes 2001, exact, all sources; undirected -> final /2
    import collections

    btw = {v: 0.0 for v in nodes}
    for s in nodes:
        dist = {s: 0}
        sigma = {s: 1}
        order = [s]
        qd = collections.deque([s])
        while qd:
            v = qd.popleft()
            for w in adj[v]:
                if w not in dist:
                    dist[w] = dist[v] + 1
                    sigma[w] = 0
                    order.append(w)
                    qd.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
        delta = {v: 0.0 for v in order}
        for w in reversed(order):
            for v in adj[w]:
                if dist.get(v, -2) == dist[w] - 1:
                    delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
            if w != s:
                btw[w] += delta[w]
    return {v: b / 2.0 for v, b in btw.items()}


class TestBetweenness:
    def _run(self, spark, edges, k):
        from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.graph import (
            betweenness_sampled,
        )

        df = spark.createDataFrame(edges, "id_a long, id_b long")
        return {
            r.id: r.betweenness
            for r in betweenness_sampled(
                df, k_sources=k, max_hops=10
            ).collect()
        }

    def test_path_graph_hand(self, spark):
        # a-b-c: b carries the single (a,c) pair -> betweenness 1
        got = self._run(spark, [(1, 2), (2, 3)], k=3)
        assert abs(got[2] - 1.0) < 1e-6
        assert abs(got[1]) < 1e-6 and abs(got[3]) < 1e-6

    def test_star_graph_hand(self, spark):
        # hub 0 with 4 leaves: hub carries C(4,2)=6 pairs
        got = self._run(spark, [(0, i) for i in range(1, 5)], k=5)
        assert abs(got[0] - 6.0) < 1e-6
        assert all(abs(got[i]) < 1e-6 for i in range(1, 5))

    def test_differential_vs_exact_brandes(self, spark):
        import collections

        rng = random.Random(17)
        nodes = list(range(20))
        edges = set()
        while len(edges) < 35:
            a, b = rng.sample(nodes, 2)
            edges.add((min(a, b), max(a, b)))
        adj = collections.defaultdict(set)
        for a, b in edges:
            adj[a].add(b)
            adj[b].add(a)
        present = sorted(adj)
        exp = _exact_brandes(adj, present)
        got = self._run(spark, sorted(edges), k=len(present))
        assert set(got) == set(present)
        for v in present:
            assert abs(got[v] - exp[v]) < 1e-5, (v, got[v], exp[v])

    def test_exact_width_is_byte_equal(self, spark):
        """r19 (VERDICT r18 item 4): the hot σ/δ accumulators default
        to BIGINT — the per-level decimal(38,0) aggregation was a pure
        CPU tax (sf0.1 11.86→10.06 s, sf1 15.41→14.91 s, interleaved
        A/B). The width changes aggregation types only, never values
        while in range: long and decimal(38,0) must be byte-equal on
        the same graph (floats compared bitwise)."""
        from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.graph import (
            betweenness_sampled,
        )

        rng = random.Random(31)
        nodes = list(range(24))
        edges = set()
        while len(edges) < 40:
            a, b = rng.sample(nodes, 2)
            edges.add((min(a, b), max(a, b)))
        df = spark.createDataFrame(sorted(edges), "id_a long, id_b long")
        widths = {}
        for w in ("long", "decimal(38,0)"):
            widths[w] = sorted(
                (r.id, r.betweenness)
                for r in betweenness_sampled(
                    df, k_sources=6, max_hops=10, exact_width=w
                ).collect()
            )
        assert widths["long"] == widths["decimal(38,0)"]


class TestHarmonicCloseness:
    def _run(self, spark, edges, k):
        from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.graph import (
            harmonic_closeness_sampled,
        )

        df = spark.createDataFrame(edges, "id_a long, id_b long")
        return {
            r.id: r.harmonic
            for r in harmonic_closeness_sampled(
                df, k_sources=k, max_hops=10
            ).collect()
        }

    def test_path_graph_hand(self, spark):
        # a-b-c with k=n: unbiased n/k scale = 1, so estimates ARE the
        # exact harmonic values (ADVICE r15: was (n-1)/k, deflated)
        got = self._run(spark, [(1, 2), (2, 3)], k=3)
        assert abs(got[2] - 2.0) < 1e-6
        assert abs(got[1] - 1.5) < 1e-6

    def test_disconnected_contributes_zero(self, spark):
        # two components: pairs across contribute nothing, no NaN/inf
        got = self._run(spark, [(1, 2), (10, 11)], k=4)
        exp = 1.0  # one in-component neighbor at d=1; n/k = 1 at k=n
        for v in (1, 2, 10, 11):
            assert abs(got[v] - exp) < 1e-6

    def test_differential_vs_exact(self, spark):
        import collections

        rng = random.Random(23)
        nodes = list(range(18))
        edges = set()
        while len(edges) < 30:
            a, b = rng.sample(nodes, 2)
            edges.add((min(a, b), max(a, b)))
        adj = collections.defaultdict(set)
        for a, b in edges:
            adj[a].add(b)
            adj[b].add(a)
        present = sorted(adj)
        n = len(present)
        # exact harmonic via BFS from every node
        import math as _m

        exp = {}
        for s in present:
            dist = {s: 0}
            q = [s]
            while q:
                nq = []
                for v in q:
                    for w in adj[v]:
                        if w not in dist:
                            dist[w] = dist[v] + 1
                            nq.append(w)
                q = nq
            for v, d in dist.items():
                if d > 0:
                    exp[v] = exp.get(v, 0.0) + 1.0 / d
        # n/k = 1 at k = |V|: the unbiased estimator reproduces the
        # exact harmonic values with no (n-1)/n deflation
        exp = {v: exp.get(v, 0.0) for v in present}
        got = self._run(spark, sorted(edges), k=n)
        for v in present:
            assert abs(got[v] - exp[v]) < 1e-5, (v, got[v], exp[v])


class TestLooTargetEncode:
    def test_hand_values_and_singleton_fallback(self, spark):
        from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.stats import (
            loo_target_encode,
        )

        rows = [
            (1, "a", 10.00),
            (2, "a", 20.00),
            (3, "a", 30.00),
            (4, "b", 40.00),  # singleton -> global LOO
        ]
        df = spark.createDataFrame(rows, "id long, g string, v double")
        got = {
            r.id: r.loo_enc
            for r in loo_target_encode(df, "g", "v", "id").collect()
        }
        assert got[1] == (2000 + 3000) / 2.0  # cents
        assert got[2] == (1000 + 3000) / 2.0
        assert got[3] == (1000 + 2000) / 2.0
        assert got[4] == (1000 + 2000 + 3000) / 3.0

    def test_no_self_leakage(self, spark):
        from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.stats import (
            loo_target_encode,
        )

        # two rows in a group: each must see exactly the OTHER value
        df = spark.createDataFrame(
            [(1, "g", 5.00), (2, "g", 7.00)], "id long, g string, v double"
        )
        got = {
            r.id: r.loo_enc
            for r in loo_target_encode(df, "g", "v", "id").collect()
        }
        assert got[1] == 700.0 and got[2] == 500.0


class TestMmr:
    def test_differential_vs_exact_python(self, spark):
        from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.similarity import (
            mmr_topk,
        )

        rng = random.Random(31)
        dim = 8
        vecs = {
            i: [rng.uniform(-1, 1) for _ in range(dim)] for i in range(40)
        }
        qv = [rng.uniform(-1, 1) for _ in range(dim)]

        def cos(a, b):
            d = sum(x * y for x, y in zip(a, b))
            na = math.sqrt(sum(x * x for x in a))
            nb = math.sqrt(sum(x * x for x in b))
            return round(d / (na * nb), 6)

        lam, k = 0.7, 6
        rel = {i: cos(v, qv) for i, v in vecs.items()}
        sel, remaining = [], set(vecs)
        for _ in range(k):
            best = None
            for i in sorted(remaining):
                pen = max((cos(vecs[i], vecs[j]) for j in sel), default=None)
                s = lam * rel[i] if pen is None else lam * rel[i] - (1 - lam) * pen
                if best is None or s > best[1]:
                    best = (i, s)
            sel.append(best[0])
            remaining.discard(best[0])
        df = spark.createDataFrame(
            [(i, v) for i, v in vecs.items()],
            "vec_id long, embedding array<double>",
        )
        qdf = spark.createDataFrame([(qv,)], "embedding array<double>")
        got = [r.vec_id for r in mmr_topk(df, qdf, k=k, lam=lam).collect()]
        assert got == sel

    def test_diversifies_duplicates(self, spark):
        from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.similarity import (
            mmr_topk,
        )

        # three exact copies of the best match + one orthogonal doc:
        # plain top-2 would return two copies; MMR picks one copy then
        # the orthogonal doc
        df = spark.createDataFrame(
            [
                (1, [1.0, 0.0]),
                (2, [1.0, 0.0]),
                (3, [1.0, 0.0]),
                (4, [0.0, 1.0]),
            ],
            "vec_id long, embedding array<double>",
        )
        qdf = spark.createDataFrame([([1.0, 0.1],)], "embedding array<double>")
        got = [r.vec_id for r in mmr_topk(df, qdf, k=2, lam=0.5).collect()]
        assert got == [1, 4]

    def test_zero_norm_vectors_dropped(self, spark):
        # ADVICE r15: a zero-norm embedding yields NaN rel, and NaN
        # sorts greatest under desc — unguarded it was picked FIRST
        # every run. It must now be excluded from the candidate set.
        from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.similarity import (
            mmr_topk,
        )

        df = spark.createDataFrame(
            [
                (1, [0.0, 0.0]),
                (2, [1.0, 0.0]),
                (3, [0.0, 1.0]),
            ],
            "vec_id long, embedding array<double>",
        )
        qdf = spark.createDataFrame(
            [([1.0, 0.2],)], "embedding array<double>"
        )
        got = [r.vec_id for r in mmr_topk(df, qdf, k=2, lam=0.5).collect()]
        assert got == [2, 3]

    def test_zero_norm_query_yields_empty(self, spark):
        from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.similarity import (
            mmr_topk,
        )

        df = spark.createDataFrame(
            [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
        )
        qdf = spark.createDataFrame(
            [([0.0, 0.0],)], "embedding array<double>"
        )
        assert mmr_topk(df, qdf, k=2).count() == 0

    def test_pooled_equals_full_corpus_on_gate_data(self, spark):
        """VERDICT r15 item 3: when the relevance-ranked pool contains
        every full-corpus MMR pick, the pooled greedy sequence is
        IDENTICAL (argmax over a superset-of-the-argmax subset is that
        argmax). Containment is asserted explicitly so a failure names
        the right cause (pool too small vs a real composition bug)."""
        from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.plans import (
            REGISTRY,
        )

        sf_dir = "/root/testdata/sf0.001"
        full = REGISTRY["mmr_topk_embeddings"].builder(spark, sf_dir).collect()
        pooled = REGISTRY["mmr_topk_pooled_embeddings"].builder(
            spark, sf_dir
        ).collect()
        full_picks = [(r.rank, r.vec_id, r.rel, r.mmr) for r in full]
        # containment precondition: every full pick is in the cosine
        # top-256 pool (rel-ranked, k=10 ≪ 256)
        from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.similarity import (
            cosine_topk,
        )
        from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.sources.readers import (
            read_table,
        )
        from pyspark.sql import functions as F

        emb = read_table(spark, sf_dir, "embeddings")
        q1 = emb.orderBy("vec_id").limit(1).select(
            F.lit(0).cast("long").alias("query_id"), "embedding"
        )
        corpus = emb.join(
            emb.orderBy("vec_id").limit(1).select("vec_id"),
            "vec_id",
            "left_anti",
        )
        pool = {
            r.vec_id for r in cosine_topk(corpus, q1, k=256).collect()
        }
        assert {p[1] for p in full_picks} <= pool
        assert [(r.rank, r.vec_id, r.rel, r.mmr) for r in pooled] == full_picks


class TestHarmonicOracle:
    def test_duckdb_xxhash64_emulation_matches_spark(self, spark):
        """The harmonic-closeness oracle's source panel depends on
        reproducing Spark's xxhash64(col, lit(42)) bit-for-bit in
        DuckDB (HUGEINT wraparound arithmetic). Pin the emulation on
        ids spanning the 32-bit split boundaries the multiply
        emulation folds across."""
        import duckdb

        from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.plans.data_ops import (
            _xxhash64_seed42_ctes,
        )

        ids = list(range(21)) + [
            2**31 - 1,
            2**31,
            2**32 - 1,
            2**32,
            2**32 + 12345,
            10**12 + 7,
            10**18 + 3,
            2**62,
            # negative ids: Spark hashes the long's two's-complement
            # BYTES, so the emulation must reinterpret id + 2^64 (the
            # r17 code-review finding)
            -1,
            -42,
            -(2**31),
            -(2**32) - 7,
            -(2**62),
            -(2**63),
        ]
        vals = ", ".join(f"({i})" for i in ids)
        sql = (
            f"WITH nodes(id) AS (VALUES {vals}),\n"
            f"{_xxhash64_seed42_ctes('nodes')}\n"
            f"SELECT id, hs FROM xh ORDER BY id"
        )
        duck = {int(i): int(h) for i, h in duckdb.sql(sql).fetchall()}
        rows = (
            spark.createDataFrame([(i,) for i in ids], "id long")
            .select("id", F.xxhash64(F.col("id"), F.lit(42)).alias("h"))
            .collect()
        )
        got = {int(r.id): int(r.h) for r in rows}
        assert got == duck


class TestXxhChainBuilders:
    def test_hashint_and_variable_seed_chains_match_spark(self, spark):
        """The generalized XXH64 chain builders behind the collusion
        LSH twins (r17): xxhash64(long, int) = hashInt(i, hashLong(v,
        42)) and xxhash64(long, long) = hashLong(u2, hashLong(u1, 42))
        with a VARIABLE seed — pinned against Spark including negative
        longs (two's-complement reinterpretation) and −2^63."""
        import duckdb

        from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.plans.data_ops import (
            _xxh_chain,
            _xxh_hashint_steps,
            _xxh_hashlong_steps,
            _xxh_to_signed,
            _xxh_to_unsigned,
        )

        c1, cte1, col1 = _xxh_chain(
            "rows", ["sh", "i"],
            _xxh_hashlong_steps(_xxh_to_unsigned("sh"), 42), "L",
        )
        c2, cte2, col2 = _xxh_chain(
            cte1, ["sh", "i"], _xxh_hashint_steps("i", col1), "I"
        )
        sql1 = (
            "WITH rows(sh, i) AS "
            "(SELECT a.range, b.range FROM range(-3, 5) a, range(0, 4) b),\n"
            f"{c1},\n{c2}\n"
            f"SELECT sh, i, {_xxh_to_signed(col2)} AS hv FROM {cte2}"
        )
        duck1 = {
            (int(a), int(b)): int(c)
            for a, b, c in duckdb.sql(sql1).fetchall()
        }
        got1 = {
            (r.sh, r.i): r.h
            for r in spark.createDataFrame(
                [(sh, i) for sh in range(-3, 5) for i in range(4)],
                "sh long, i int",
            )
            .select("sh", "i", F.xxhash64(F.col("sh"), F.col("i")).alias("h"))
            .collect()
        }
        assert got1 == duck1

        pairs = [
            (-(2**63), 12345),
            (5, -7),
            (123456789012345, -987654321098765),
            (0, 0),
        ]
        ca, ctea, cola = _xxh_chain(
            "rows2", ["s1", "s2"],
            _xxh_hashlong_steps(_xxh_to_unsigned("s1"), 42), "A",
        )
        cb, cteb, colb = _xxh_chain(
            ctea, ["s1", "s2", cola],
            _xxh_hashlong_steps(_xxh_to_unsigned("s2"), cola), "B",
        )
        vals = ", ".join(f"({a}, {b})" for a, b in pairs)
        sql2 = (
            f"WITH rows2(s1, s2) AS (VALUES {vals}),\n"
            f"{ca},\n{cb}\n"
            f"SELECT s1, s2, {_xxh_to_signed(colb)} AS hv FROM {cteb}"
        )
        duck2 = {
            (int(a), int(b)): int(c)
            for a, b, c in duckdb.sql(sql2).fetchall()
        }
        got2 = {
            (r.s1, r.s2): r.h
            for r in spark.createDataFrame(pairs, "s1 long, s2 long")
            .select("s1", "s2", F.xxhash64("s1", "s2").alias("h"))
            .collect()
        }
        assert got2 == duck2


class TestMmrPoolGuard:
    """ADVICE r16: a pick in the pool's last-k relevance ranks means a
    just-outside-the-pool candidate could have won that round — the
    guard must surface it as a UserWarning, never silently diverge."""

    def _corpus(self, spark, angles):
        rows = [
            (i + 1, [math.cos(a), math.sin(a)])
            for i, a in enumerate(angles)
        ]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        qdf = spark.createDataFrame(
            [([1.0, 0.0],)], "embedding array<double>"
        )
        return df, qdf

    def test_boundary_pick_warns(self, spark):
        import warnings

        from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.similarity import (
            mmr_topk_pooled,
        )

        # lam < 0.5 makes every round-2 score −(0.5−lam)·cos(angle),
        # maximized by the LARGEST pool angle — the greedy pick lands
        # on pool rank 3 of a 3-item pool (> pool_size − k = 1)
        df, qdf = self._corpus(spark, [0.0, 0.05, 0.45, 1.05])
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            got = [
                r.vec_id
                for r in mmr_topk_pooled(
                    df, qdf, k=2, lam=0.4, pool_size=3
                ).collect()
            ]
        assert got == [1, 3]
        msgs = [str(x.message) for x in w if x.category is UserWarning]
        assert any("mmr_topk_pooled" in m for m in msgs)

    def test_interior_picks_do_not_warn(self, spark):
        import warnings

        from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.similarity import (
            mmr_topk_pooled,
        )

        # relevance-heavy lam keeps both picks in the pool head
        df, qdf = self._corpus(spark, [0.0, 0.05, 0.45, 1.05])
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            got = [
                r.vec_id
                for r in mmr_topk_pooled(
                    df, qdf, k=2, lam=0.9, pool_size=4
                ).collect()
            ]
        assert got == [1, 2]
        msgs = [str(x.message) for x in w if x.category is UserWarning]
        assert not any("mmr_topk_pooled" in m for m in msgs)


class TestTCloseness:
    def test_emd_matches_python(self, spark):
        from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.quality_checks import (
            t_closeness_report,
        )

        rng = random.Random(41)
        rows = [
            (rng.choice(["x", "y"]), rng.randint(0, 4))
            for _ in range(300)
        ]
        df = spark.createDataFrame(rows, "q string, band long")
        got = {
            r.q: r for r in t_closeness_report(df, ["q"], "band").collect()
        }
        # python EMD on ordered bands
        import collections

        per = collections.Counter(rows)
        bands = sorted({b for _, b in rows})
        m = len(bands)
        tot = len(rows)
        gcum, acc = {}, 0
        for b in bands:
            acc += sum(v for (q, bb), v in per.items() if bb == b)
            gcum[b] = acc
        for q in ("x", "y"):
            cs = sum(v for (qq, _), v in per.items() if qq == q)
            acc, sumabs = 0, 0
            for b in bands:
                acc += per.get((q, b), 0)
                sumabs += abs(acc * tot - gcum[b] * cs)
            emd = sumabs / (cs * tot * (m - 1))
            assert abs(got[q].emd - emd) < 1e-12
            assert bool(got[q].t_violation) == (sumabs * 5 > cs * tot * (m - 1))

    def test_identical_distribution_zero(self, spark):
        from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.quality_checks import (
            t_closeness_report,
        )

        # both classes share the global distribution exactly -> EMD 0
        rows = [(q, b) for q in ("a", "b") for b in (1, 1, 2, 3)]
        df = spark.createDataFrame(rows, "q string, band long")
        got = t_closeness_report(df, ["q"], "band").collect()
        assert all(r.emd == 0.0 and not r.t_violation for r in got)

    def test_disjoint_distribution_violates(self, spark):
        from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.quality_checks import (
            t_closeness_report,
        )

        # class a all band 0, class b all band 9 -> large EMD, flag
        rows = [("a", 0)] * 10 + [("b", 9)] * 10
        df = spark.createDataFrame(rows, "q string, band long")
        got = {r.q: r for r in t_closeness_report(df, ["q"], "band").collect()}
        assert got["a"].t_violation and got["b"].t_violation
        assert got["a"].emd == 0.5 and got["b"].emd == 0.5

    def test_single_band_emd_zero_not_nan(self, spark):
        # ADVICE r15: m=1 made the (m-1) denominator 0 and EMD 0/0 =
        # NaN; with one sensitive band every class trivially matches
        # the global distribution, so EMD is definitionally 0.
        from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.quality_checks import (
            t_closeness_report,
        )

        rows = [("a", 7)] * 3 + [("b", 7)] * 5
        df = spark.createDataFrame(rows, "q string, band long")
        got = t_closeness_report(df, ["q"], "band").collect()
        assert len(got) == 2
        assert all(r.emd == 0.0 and not r.t_violation for r in got)


class TestStreamingNewVsReturning:
    def test_drained_stream_equals_batch(self, spark):
        from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.plans import (
            REGISTRY,
        )

        sf_dir = "/root/testdata/sf0.001"
        batch = REGISTRY["new_vs_returning_events"].builder(
            spark, sf_dir
        ).collect()
        streamed = REGISTRY["streaming_new_vs_returning"].builder(
            spark, sf_dir
        ).collect()
        assert sorted(map(tuple, streamed)) == sorted(map(tuple, batch))


class TestStreamingDuplicateCharges:
    def test_drained_stream_equals_batch(self, spark):
        from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.plans import (
            REGISTRY,
        )

        sf_dir = "/root/testdata/sf0.001"
        batch = REGISTRY["duplicate_charges_events"].builder(
            spark, sf_dir
        ).collect()
        streamed = REGISTRY["streaming_duplicate_charges"].builder(
            spark, sf_dir
        ).collect()
        assert sorted(map(tuple, streamed)) == sorted(map(tuple, batch))
        assert [r.event_id for r in streamed] == sorted(
            r.event_id for r in streamed
        )


class TestPrivacyGate:
    def test_composition_equals_three_attested_legs(self, spark):
        """VERDICT r15 item 7: the composed gate must reproduce the
        three single-check legs column for column over the same
        equivalence classes."""
        from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.plans import (
            REGISTRY,
        )

        sf_dir = "/root/testdata/sf0.001"
        gate = {
            (r.c_nationkey, r.c_mktsegment): r
            for r in REGISTRY["privacy_gate_customers"]
            .builder(spark, sf_dir)
            .collect()
        }
        kl = {
            (r.c_nationkey, r.c_mktsegment): r
            for r in REGISTRY["k_anonymity_customers"]
            .builder(spark, sf_dir)
            .collect()
        }
        tc = {
            (r.c_nationkey, r.c_mktsegment): r
            for r in REGISTRY["t_closeness_customers"]
            .builder(spark, sf_dir)
            .collect()
        }
        assert set(gate) == set(kl) == set(tc)
        for key, g in gate.items():
            assert g.class_size == kl[key].class_size
            assert g.l_distinct == kl[key].l_distinct
            assert bool(g.k_violation) == bool(kl[key].k_violation)
            assert bool(g.l_violation) == bool(kl[key].l_violation)
            assert g.emd == tc[key].emd  # bitwise: same expression tree
            assert bool(g.t_violation) == bool(tc[key].t_violation)
            assert bool(g.any_violation) == (
                bool(g.k_violation)
                or bool(g.l_violation)
                or bool(g.t_violation)
            )

    def test_hand_fixture_flags(self, spark):
        from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.quality_checks import (
            privacy_gate_report,
        )

        # class "a": 2 rows (k<3 violation), single band (l<2, EMD vs
        # global skew); class "b": 6 rows, two bands
        rows = [("a", 0)] * 2 + [("b", 0)] * 3 + [("b", 9)] * 3
        df = spark.createDataFrame(rows, "q string, band long")
        got = {
            r.q: r
            for r in privacy_gate_report(
                df, ["q"], "band", k=3, l=2, t_num=1, t_den=5
            ).collect()
        }
        a, b = got["a"], got["b"]
        assert a.class_size == 2 and a.l_distinct == 1
        assert a.k_violation and a.l_violation
        assert b.class_size == 6 and b.l_distinct == 2
        assert not b.k_violation and not b.l_violation
        # global cum at band0 = 5/8; a's cum = 1 -> |1 - 5/8| = 3/8
        assert abs(a.emd - 3.0 / 8.0) < 1e-12 and a.t_violation
        # b's cum at band0 = 1/2 -> |1/2 - 5/8| = 1/8 < 1/5
        assert abs(b.emd - 1.0 / 8.0) < 1e-12 and not b.t_violation
        assert a.any_violation and not b.any_violation

    def test_null_keys_survive_the_audit(self, spark):
        """ADVICE r16: a NULL quasi class and a NULL sensitive band
        must reach the report (null-safe joins throughout) — a privacy
        audit that silently omits null-keyed classes is wrong as an
        operator contract even when the registered query has no
        nulls."""
        from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.quality_checks import (
            k_anonymity_report,
            privacy_gate_report,
            t_closeness_report,
        )

        rows = (
            [("a", 0)] * 2
            + [("a", None)] * 1
            + [(None, 0)] * 2
            + [(None, 9)] * 1
            + [("b", 9)] * 4
        )
        df = spark.createDataFrame(rows, "q string, band long")
        gate = {
            r.q: r
            for r in privacy_gate_report(df, ["q"], "band", k=3, l=2)
            .collect()
        }
        assert set(gate) == {"a", "b", None}
        # NULL quasi class: 3 rows across bands {0, 9}
        assert gate[None].class_size == 3 and gate[None].l_distinct == 2
        # NULL sensitive value counts as its own band for class "a"
        assert gate["a"].class_size == 3 and gate["a"].l_distinct == 2
        assert gate["b"].class_size == 4 and gate["b"].l_distinct == 1
        # the single-check legs see the SAME classes with the same stats
        ka = {
            r.q: r
            for r in k_anonymity_report(df, ["q"], "band", k=3, l=2)
            .collect()
        }
        tc = {
            r.q: r for r in t_closeness_report(df, ["q"], "band").collect()
        }
        assert set(ka) == set(tc) == {"a", "b", None}
        for q, g in gate.items():
            assert g.class_size == ka[q].class_size
            assert g.l_distinct == ka[q].l_distinct
            assert g.emd == tc[q].emd
            assert bool(g.t_violation) == bool(tc[q].t_violation)
