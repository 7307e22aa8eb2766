"""Differentials for operators/fraud_stats.py (Benford digit test,
trailing-window velocity flags) — pure-Python reimplementations on
planted data, exact-arithmetic edge cases."""

from __future__ import annotations

import datetime as dt
import math
import random

import pytest
from pyspark.sql import functions as F

from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.fraud_stats import (
    BENFORD_P,
    benford_profile,
    velocity_flags,
)


class TestBenford:
    def test_expected_masses(self):
        assert len(BENFORD_P) == 9
        assert abs(sum(BENFORD_P) - 1.0) < 1e-12
        assert abs(BENFORD_P[0] - math.log10(2)) < 1e-15

    def test_hand_computed_counts_and_chi2(self, spark):
        # group 'a': amounts 1.00, 1.50, 19.99, 2.00 -> digits 1,1,1,2
        # group 'b': 9.00, 0.05 -> digits 9, 5 (0.05 = 5 cents)
        rows = [
            ("a", 1.00), ("a", 1.50), ("a", 19.99), ("a", 2.00),
            ("b", 9.00), ("b", 0.05),
            ("b", 0.0), ("b", -3.0),  # non-positive cents: excluded
        ]
        df = spark.createDataFrame(rows, "g string, amount double")
        out = benford_profile(df, "amount", "g").collect()
        assert len(out) == 18  # 2 groups x full digit spine
        got = {(r["g"], r["digit"]): r for r in out}
        assert got[("a", 1)]["n_obs"] == 3
        assert got[("a", 2)]["n_obs"] == 1
        assert got[("a", 3)]["n_obs"] == 0  # spine fills missing digits
        assert got[("a", 1)]["n_total"] == 4
        assert got[("b", 9)]["n_obs"] == 1 and got[("b", 5)]["n_obs"] == 1
        assert got[("b", 9)]["n_total"] == 2

        # python replica of the quantized chi-square for group 'a'
        def chi2(counts, total):
            s = 0
            for d in range(1, 10):
                e = float(total) * BENFORD_P[d - 1]
                dev = float(counts.get(d, 0)) - e
                s += math.floor(dev * dev / e * 1e9)
            return float(s) / 1e9

        assert got[("a", 1)]["chi2"] == chi2({1: 3, 2: 1}, 4)
        assert got[("b", 9)]["chi2"] == chi2({9: 1, 5: 1}, 2)
        # chi2 constant within a group
        assert len({r["chi2"] for r in out if r["g"] == "a"}) == 1

    def test_benford_conforming_sample_scores_low(self, spark):
        # draw 10k amounts whose leading digit EXACTLY follows Benford
        # via inverse-CDF on a deterministic grid -> tiny chi2; a
        # uniform-digit sample on the same grid scores far higher
        rng = random.Random(7)
        conforming, uniform = [], []
        cdf = [0.0]
        for p in BENFORD_P:
            cdf.append(cdf[-1] + p)
        for i in range(10000):
            u = (i + 0.5) / 10000
            d = max(j for j in range(1, 10) if cdf[j - 1] <= u)
            conforming.append(("c", float(d) * 10 ** rng.randrange(3)))
            uniform.append(("u", float(1 + i % 9) * 10 ** rng.randrange(3)))
        df = spark.createDataFrame(
            conforming + uniform, "g string, amount double"
        )
        rows = benford_profile(df, "amount", "g").collect()
        chi = {r["g"]: r["chi2"] for r in rows}
        assert chi["c"] < 1.0, chi
        assert chi["u"] > 100.0, chi


class TestVelocity:
    def _mk(self, spark, rows):
        return spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp, value double"
        )

    def test_brute_force_differential(self, spark):
        rng = random.Random(11)
        base = dt.datetime(2024, 1, 1)
        rows = []
        for eid in range(400):
            rows.append(
                (
                    eid,
                    rng.randrange(8),
                    base + dt.timedelta(seconds=rng.randrange(8000)),
                    round(rng.uniform(0.5, 300.0), 2),
                )
            )
        out = velocity_flags(
            self._mk(spark, rows),
            window_seconds=3600,
            count_threshold=3,
            cents_threshold=200_00,
        ).collect()
        got = {r["event_id"]: r for r in out}
        by_user: dict[int, list[tuple[int, int]]] = {}
        for eid, uid, ts, v in rows:
            s = int(ts.timestamp())
            by_user.setdefault(uid, []).append((s, int(round(v * 100)), eid))
        for uid, evs in by_user.items():
            for s, _c, eid in evs:
                peers = [(t, c) for t, c, _ in evs if s - 3600 <= t <= s]
                n, total = len(peers), sum(c for _, c in peers)
                r = got[eid]
                assert (r["n_trailing"], r["cents_trailing"]) == (n, total), eid
                assert r["velocity_flag"] == (n >= 3)
                assert r["spend_flag"] == (total >= 200_00)

    def test_same_second_ties_are_mutual_peers(self, spark):
        t = dt.datetime(2024, 5, 1, 12, 0, 0)
        rows = [
            (1, 7, t, 10.0),
            (2, 7, t, 20.0),  # same second: RANGE peers both ways
            (3, 7, t + dt.timedelta(seconds=3600), 30.0),  # still inside
            (4, 7, t + dt.timedelta(seconds=3601), 40.0),  # first two out
        ]
        out = {
            r["event_id"]: r
            for r in velocity_flags(self._mk(spark, rows)).collect()
        }
        assert out[1]["n_trailing"] == 2 and out[2]["n_trailing"] == 2
        assert out[1]["cents_trailing"] == 3000 == out[2]["cents_trailing"]
        assert out[3]["n_trailing"] == 3
        assert out[4]["n_trailing"] == 2  # event 3 and itself
        assert out[4]["cents_trailing"] == 7000


class TestStreaks:
    def test_hand_computed_islands(self, spark):
        import datetime as dt

        from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.changepoint import (
            longest_streaks,
        )

        base = dt.datetime(2024, 2, 1)
        # daily totals: 1, 2, 3, 2, 3, 4, 5, 5 ->
        # runs: [1,2,3] (len 3), [2,3,4,5] (len 4), [5] (len 1)
        vals = [1.0, 2.0, 3.0, 2.0, 3.0, 4.0, 5.0, 5.0]
        rows = [
            ("s", base + dt.timedelta(days=d), v) for d, v in enumerate(vals)
        ]
        # tie case: two record runs of len 2 -> earliest start wins
        tie = [5.0, 6.0, 1.0, 2.0, 1.0]
        rows += [
            ("t", base + dt.timedelta(days=d), v) for d, v in enumerate(tie)
        ]
        df = spark.createDataFrame(
            rows, "event_type string, ts timestamp, value double"
        )
        got = {r["event_type"]: r for r in longest_streaks(df).collect()}
        s = got["s"]
        assert (s["n_days"], s["n_runs"], s["longest_run"]) == (8, 3, 4)
        assert s["longest_run_start"] == base + dt.timedelta(days=3)
        t = got["t"]
        assert (t["n_days"], t["n_runs"], t["longest_run"]) == (5, 3, 2)
        assert t["longest_run_start"] == base  # earliest of the two len-2 runs

    def test_equal_values_break_streaks(self, spark):
        import datetime as dt

        from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.changepoint import (
            longest_streaks,
        )

        base = dt.datetime(2024, 2, 1)
        rows = [
            ("c", base + dt.timedelta(days=d), 7.0) for d in range(6)
        ]  # constant: strictly-increasing runs are all singletons
        df = spark.createDataFrame(
            rows, "event_type string, ts timestamp, value double"
        )
        r = longest_streaks(df).collect()[0]
        assert (r["n_days"], r["n_runs"], r["longest_run"]) == (6, 6, 1)


class TestBurstiness:
    def test_bot_vs_bursty_and_python_replica(self, spark):
        import math
        import random

        from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.fraud_stats import (
            interevent_burstiness,
        )

        base = dt.datetime(2024, 6, 1)
        rows, eid = [], 0
        # bot: exactly every 60s -> sd=0, B = -1
        for i in range(20):
            rows.append((eid, 1, base + dt.timedelta(seconds=60 * i), 0.0))
            eid += 1
        # bursty human: tight bursts separated by long silences
        gaps_h = [1, 2, 1, 7200, 1, 3, 1, 10800, 2, 1]
        t = base
        rows.append((eid, 2, t, 0.0)); eid += 1
        for g in gaps_h:
            t = t + dt.timedelta(seconds=g)
            rows.append((eid, 2, t, 0.0)); eid += 1
        # below min_events: excluded
        rows += [(eid, 3, base, 0.0), (eid + 1, 3, base, 0.0)]
        eid += 2
        # all same second -> sigma = mu = 0 -> NULL B
        rows += [(eid + i, 4, base, 0.0) for i in range(5)]
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp, value double"
        )
        got = {r["user_id"]: r for r in interevent_burstiness(df).collect()}
        assert 3 not in got
        assert got[1]["burstiness"] == -1.0
        assert got[1]["sd_gap_s"] == 0.0 and got[1]["mean_gap_s"] == 60.0
        assert got[4]["burstiness"] is None
        # python replica for the bursty user (pinned spelling)
        n = len(gaps_h)
        s, ss = sum(gaps_h), sum(g * g for g in gaps_h)
        mu = float(s) / float(n)
        sd = math.sqrt(float(n * ss - s * s)) / float(n)
        r = got[2]
        assert (r["n_events"], r["n_gaps"]) == (n + 1, n)
        assert r["mean_gap_s"] == mu and r["sd_gap_s"] == sd
        assert r["burstiness"] == (sd - mu) / (sd + mu)
        assert r["burstiness"] > 0.3  # bursty (B ≈ 0.39 for these gaps)


class TestFraudRiskReport:
    def test_composed_flags_fire_per_branch(self, spark):
        """The composed risk report's branches each fire on a user
        engineered to trip exactly that screen — bot_flag in
        particular is unreachable on the human-random driver data, so
        the combine logic for it is pinned here."""
        import datetime as dt

        from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.plans.data_ops import (
            fraud_risk_report_events,
        )

        base = dt.datetime(2024, 3, 1, 12, 0, 0)
        rows = []
        eid = 1
        # user 1: metronome bot — constant 60s gaps, small amounts,
        # spread out so velocity windows stay quiet
        t = base
        for i in range(6):
            rows.append((eid, 1, t, 1.23))
            eid += 1
            t += dt.timedelta(seconds=3600 * 3)
        # re-do: constant gaps but INSIDE burstiness (60s) -> also
        # trips velocity count (>=3 events in an hour)
        # user 2: velocity burst — 4 events in 10 minutes
        t = base
        for i in range(4):
            rows.append((eid, 2, t, 2.0))
            eid += 1
            t += dt.timedelta(seconds=120)
        # user 3: big spender — two events, 300.00 total inside an hour
        rows.append((eid, 3, base, 150.0)); eid += 1
        rows.append((eid, 3, base + dt.timedelta(seconds=30), 151.0)); eid += 1
        # user 4: quiet — one modest event
        rows.append((eid, 4, base, 3.0)); eid += 1
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp, value double"
        )
        df = df.withColumn("event_type", F.lit("purchase")).withColumn(
            "props", F.lit("{}")
        )

        import os
        import tempfile

        with tempfile.TemporaryDirectory() as d:
            df.write.parquet(os.path.join(d, "events.parquet"))
            rep = {
                r["user_id"]: r
                for r in fraud_risk_report_events(spark, d).collect()
            }
        # user 1: constant gaps -> B = -1 -> bot_flag; gaps 3h apart so
        # velocity windows hold one event each
        assert rep[1]["bot_flag"] and rep[1]["burstiness"] == -1.0
        assert rep[1]["n_velocity_events"] == 0
        assert rep[1]["risk_score"] == 2 and rep[1]["verdict"] == "review"
        # user 2: constant 120s gaps ALSO make it a bot; 4 events in
        # 10 min trip the count flag -> high
        assert rep[2]["n_velocity_events"] >= 2 and rep[2]["bot_flag"]
        assert rep[2]["verdict"] == "high"
        # user 3: spend flag only (30000 cents trailing), too few
        # events for burstiness
        assert rep[3]["n_spend_events"] >= 1
        assert rep[3]["burstiness"] is None and not rep[3]["bot_flag"]
        assert rep[3]["verdict"] == "review"
        # user 4: nothing fires
        assert rep[4]["risk_score"] == 0 and rep[4]["verdict"] == "ok"
        # benford never grounded at n < 30
        assert all(not r["benford_flag"] for r in rep.values())
