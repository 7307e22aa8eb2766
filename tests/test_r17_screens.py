"""Round-17 additions (VERDICT r16 item 6): the seasonal Mann–Kendall
trend test (Hirsch–Slack 1984) and the cross-entity duplicate-amount
screen — hand fixtures, exact Python differentials, and
drained-stream ≡ batch twins."""

from __future__ import annotations

import datetime
import random

from pyspark.sql import functions as F

from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.fraud_stats import (
    cross_entity_duplicates,
)
from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.stats import (
    MK_Z99_SQ,
    seasonal_mann_kendall_from_daily,
)


def _python_seasonal_mk(rows):
    """Exact Hirsch–Slack on (grp, date, x) tuples; season = weekday
    with Sunday=0 (Spark dayofweek − 1)."""
    import collections

    by = collections.defaultdict(list)
    for g, d, x in rows:
        sea = (d.weekday() + 1) % 7  # python Monday=0 -> Sunday=0
        by[(g, sea)].append((d, x))
    out = {}
    agg = collections.defaultdict(lambda: [0, 0, 0, set()])
    for (g, sea), pts in by.items():
        pts.sort()
        s = 0
        for i in range(len(pts)):
            for j in range(i + 1, len(pts)):
                d = pts[j][1] - pts[i][1]
                s += (d > 0) - (d < 0)
        n = len(pts)
        ties = collections.Counter(x for _, x in pts)
        tie18 = sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
        v18 = n * (n - 1) * (2 * n + 5) - tie18
        a = agg[g]
        a[0] += n
        a[1] += s
        a[2] += v18
        a[3].add(sea)
    for g, (n_days, s, v18, seas) in agg.items():
        m = max(abs(s) - 1, 0)
        if n_days >= 2 and v18 > 0:
            import math

            z = (1 if s > 0 else -1 if s < 0 else 0) * m / math.sqrt(
                v18 / 18.0
            )
            sig = 18 * m * m >= MK_Z99_SQ * v18
        else:
            z, sig = None, None
        out[g] = (n_days, len(seas), s, z, sig)
    return out


class TestSeasonalMannKendall:
    def test_differential_vs_exact_python(self, spark):
        rng = random.Random(17)
        base = datetime.date(2024, 1, 1)
        rows = [
            ("a", base + datetime.timedelta(days=i), rng.randint(0, 50))
            for i in range(60)
        ] + [
            ("b", base + datetime.timedelta(days=i), 100 + i)
            for i in range(40)
        ]
        daily = spark.createDataFrame(
            [(g, datetime.datetime(d.year, d.month, d.day), x) for g, d, x in rows],
            "grp string, day timestamp, x long",
        )
        got = {
            r.grp: (r.n_days, r.n_seasons, r.s_stat, r.z, r.significant)
            for r in seasonal_mann_kendall_from_daily(daily, "grp").collect()
        }
        want = _python_seasonal_mk(rows)
        assert set(got) == set(want)
        for g in want:
            assert got[g][:3] == want[g][:3], g
            assert abs(got[g][3] - want[g][3]) < 1e-12, g
            assert bool(got[g][4]) == bool(want[g][4]), g

    def test_weekly_cycle_masks_plain_mk_but_not_seasonal(self, spark):
        """The motivating Hirsch–Slack property: a strong weekly cycle
        plus a small creep. Within each weekday the series is strictly
        increasing (every seasonal pair is concordant), so the seasonal
        S equals its maximum possible value — the drift is fully
        visible once the cycle is controlled for."""
        base = datetime.date(2024, 1, 7)  # a Sunday
        rows = []
        for i in range(56):  # 8 full weeks
            d = base + datetime.timedelta(days=i)
            cycle = [0, 100000, 200000, 300000, 400000, 500000, 600000][
                (d.weekday() + 1) % 7
            ]
            rows.append(("t", d, cycle + i))  # +i = the creep
        daily = spark.createDataFrame(
            [(g, datetime.datetime(d.year, d.month, d.day), x) for g, d, x in rows],
            "grp string, day timestamp, x long",
        )
        got = seasonal_mann_kendall_from_daily(daily, "grp").collect()[0]
        # 7 seasons x C(8,2)=28 concordant pairs each
        assert got.s_stat == 7 * 28
        assert got.n_seasons == 7 and got.n_days == 56
        assert bool(got.significant)

    def test_single_day_series_null_decision(self, spark):
        daily = spark.createDataFrame(
            [("solo", datetime.datetime(2024, 1, 1), 5)],
            "grp string, day timestamp, x long",
        )
        got = seasonal_mann_kendall_from_daily(daily, "grp").collect()[0]
        assert got.n_days == 1 and got.s_stat == 0
        assert got.z is None and got.significant is None


class TestCrossEntityDuplicates:
    def _events(self, spark, rows):
        return spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp, value double"
        )

    def test_hand_fixture(self, spark):
        t0 = datetime.datetime(2024, 3, 4, 12, 0, 0)

        def at(h):
            return t0 + datetime.timedelta(hours=h)

        rows = [
            # same cents, two entities, same window -> flagged
            (1, 10, at(0), 123.45),
            (2, 11, at(5), 123.45),
            # same cents, SAME entity twice -> not flagged (that's the
            # per-entity screen's job)
            (3, 20, at(0), 99.99),
            (4, 20, at(1), 99.99),
            # same cents, two entities, ~3 weeks apart -> different
            # windows, not flagged
            (5, 30, at(0), 55.55),
            (6, 31, at(24 * 21), 55.55),
        ]
        got = cross_entity_duplicates(self._events(spark, rows)).collect()
        assert len(got) == 1
        r = got[0]
        assert r.cents == 12345 and r.n_entities == 2 and r.n_events == 2
        assert r.last_s - r.first_s == 5 * 3600
        assert r.win_start_s % 604800 == 0

    def test_null_entity_counts_events_not_entities(self, spark):
        """A NULL entity contributes to n_events/first/last but never
        to the distinct-entity count (count_distinct excludes NULLs) —
        the streaming twin's count(_ent) finish mirrors this exactly
        (r17 code-review finding)."""
        t0 = datetime.datetime(2024, 3, 4, 12, 0, 0)
        rows = [
            (1, None, t0, 77.77),
            (2, 50, t0 + datetime.timedelta(hours=1), 77.77),
        ]
        df = self._events(spark, rows)
        assert cross_entity_duplicates(df, min_entities=2).count() == 0
        got = cross_entity_duplicates(df, min_entities=1).collect()
        assert len(got) == 1
        assert got[0].n_events == 2 and got[0].n_entities == 1

    def test_min_entities_threshold(self, spark):
        t0 = datetime.datetime(2024, 3, 4, 12, 0, 0)
        rows = [
            (i, 100 + i, t0 + datetime.timedelta(hours=i), 10.00)
            for i in range(3)
        ]
        df = self._events(spark, rows)
        assert cross_entity_duplicates(df, min_entities=4).count() == 0
        got = cross_entity_duplicates(df, min_entities=3).collect()
        assert len(got) == 1 and got[0].n_entities == 3


class TestStreamingTwins:
    def test_seasonal_mk_drained_equals_batch(self, spark):
        from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.plans import (
            REGISTRY,
        )

        sf_dir = "/root/testdata/sf0.001"
        batch = REGISTRY["seasonal_mann_kendall_events"].builder(
            spark, sf_dir
        ).collect()
        streamed = REGISTRY["streaming_seasonal_mann_kendall"].builder(
            spark, sf_dir
        ).collect()
        assert sorted(map(tuple, streamed)) == sorted(map(tuple, batch))

    def test_cross_entity_drained_equals_batch(self, spark):
        from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.plans import (
            REGISTRY,
        )

        sf_dir = "/root/testdata/sf0.001"
        batch = REGISTRY["cross_entity_duplicates_events"].builder(
            spark, sf_dir
        ).collect()
        streamed = REGISTRY["streaming_cross_entity_duplicates"].builder(
            spark, sf_dir
        ).collect()
        assert sorted(map(tuple, streamed)) == sorted(map(tuple, batch))
