"""Round-18 additions (VERDICT r17 items 3 and 6): the two-grid
offset-bucket variant of the cross-entity duplicate screen (the
straddling-pair fixture the single-grid form misses, the covering
guarantee as a randomized property, grid-0 ≡ base-screen containment),
the impossible-velocity screen, and the spending-mix drift screen."""

from __future__ import annotations

import datetime
import random

from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.fraud_stats import (
    cross_entity_duplicates,
    cross_entity_duplicates_offset,
    impossible_velocity,
    spending_mix_drift,
)

WINDOW = 604800
HALF = WINDOW // 2


def _ts(s: int) -> datetime.datetime:
    # session tz is UTC (session.py), so a naive UTC datetime lands on
    # exactly epoch second s
    return datetime.datetime.utcfromtimestamp(s)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )


class TestCrossEntityDuplicatesOffset:
    def test_straddling_pair_missed_by_single_grid(self, spark):
        """The motivating fixture (VERDICT r17 item 3): same cents,
        two entities, 120 s apart — but either side of a grid-0
        window edge. The base screen drops the pair; the shifted grid
        catches it."""
        boundary = ((1709500000 // WINDOW) + 1) * WINDOW
        rows = [
            (1, 10, _ts(boundary - 60), 123.45),
            (2, 11, _ts(boundary + 60), 123.45),
        ]
        df = _events(spark, rows)
        assert cross_entity_duplicates(df).count() == 0
        got = cross_entity_duplicates_offset(df).collect()
        assert len(got) == 1
        r = got[0]
        assert r.grid == 1 and r.cents == 12345 and r.n_entities == 2
        # the grid-1 window really contains both events
        assert r.win_start_s <= boundary - 60
        assert boundary + 60 < r.win_start_s + WINDOW
        assert (r.win_start_s + HALF) % WINDOW == 0

    def test_grid0_rows_equal_base_screen(self, spark):
        """Grid 0 of the offset variant IS the base screen — same agg
        on the same keys; the variant only adds the shifted pass."""
        rng = random.Random(18)
        t0 = 1709500000
        rows = [
            (
                i,
                rng.randrange(5),
                _ts(t0 + rng.randrange(4 * WINDOW)),
                float(rng.randrange(3)) + 0.5,
            )
            for i in range(200)
        ]
        df = _events(spark, rows)
        base = {
            (r.cents, r.win_start_s): (r.n_events, r.n_entities, r.first_s, r.last_s)
            for r in cross_entity_duplicates(df).collect()
        }
        got = cross_entity_duplicates_offset(df).collect()
        grid0 = {
            (r.cents, r.win_start_s): (r.n_events, r.n_entities, r.first_s, r.last_s)
            for r in got
            if r.grid == 0
        }
        assert grid0 == base

    def test_covering_guarantee_within_half_window(self, spark):
        """The two-offset covering property, checked exhaustively on a
        random fixture: EVERY cross-entity same-cents pair with time
        gap ≤ window/2 shares at least one flagged (grid, bucket)
        cell."""
        rng = random.Random(42)
        t0 = 1709500000
        rows = [
            (
                i,
                rng.randrange(20),
                _ts(t0 + rng.randrange(3 * WINDOW)),
                float(rng.randrange(4)) + 0.25,
            )
            for i in range(300)
        ]
        df = _events(spark, rows)
        flagged = cross_entity_duplicates_offset(df).collect()
        cells = {(r.grid, r.cents, r.win_start_s) for r in flagged}

        def cell(grid, s):
            return s - ((s + grid * HALF) % WINDOW)

        evs = [(u, int(round(v * 100)), t0_s) for (_, u, t, v), t0_s in (
            ((r[0], r[1], r[2], r[3]), int(r[2].replace(tzinfo=datetime.timezone.utc).timestamp()))
            for r in rows
        )]
        missed = []
        for i in range(len(evs)):
            for j in range(i + 1, len(evs)):
                ua, ca, sa = evs[i]
                ub, cb, sb = evs[j]
                if ua == ub or ca != cb or abs(sa - sb) > HALF:
                    continue
                if not any(
                    (g, ca, cell(g, sa)) in cells and cell(g, sa) == cell(g, sb)
                    for g in (0, 1)
                ):
                    missed.append((evs[i], evs[j]))
        assert not missed, missed[:5]


def _typed_events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp, value double"
    )


class TestImpossibleVelocity:
    def test_hand_fixture(self, spark):
        t0 = 1709500000
        rows = [
            # signup -> purchase 12 s later: below the 30 s floor
            (1, 10, "signup", _ts(t0), 0.0),
            (2, 10, "purchase", _ts(t0 + 12), 50.0),
            # purchase -> purchase 10 min apart: plausible
            (3, 10, "purchase", _ts(t0 + 612), 20.0),
            # unlisted transition (view -> click) same second: default
            # 1 s floor catches the gap-0 pair
            (4, 11, "view", _ts(t0), 0.0),
            (5, 11, "click", _ts(t0), 0.0),
            # unlisted transition 2 s apart: above the default floor
            (6, 12, "view", _ts(t0), 0.0),
            (7, 12, "click", _ts(t0 + 2), 0.0),
        ]
        got = impossible_velocity(_typed_events(spark, rows)).collect()
        assert [(r.event_id, r.prev_event_id, r.gap_s, r.floor_s) for r in got] == [
            (2, 1, 12, 30),
            (5, 4, 0, 1),
        ]
        assert got[0].prev_type == "signup" and got[0].curr_type == "purchase"

    def test_lag_is_previous_event_not_previous_same_type(self, spark):
        """The floor applies to the entity's IMMEDIATELY preceding
        event: a view between two purchases resets the purchase gap to
        the (view -> purchase) transition."""
        t0 = 1709500000
        rows = [
            (1, 10, "purchase", _ts(t0), 10.0),
            (2, 10, "view", _ts(t0 + 5), 0.0),
            (3, 10, "purchase", _ts(t0 + 8), 10.0),  # 3 s after the VIEW
        ]
        got = impossible_velocity(_typed_events(spark, rows)).collect()
        # (view -> purchase) floor is 10 s, gap 3 s -> flagged against
        # the view, not the earlier purchase
        assert [(r.event_id, r.prev_event_id, r.prev_type, r.gap_s, r.floor_s) for r in got] == [
            (3, 2, "view", 3, 10)
        ]

    def test_custom_floors_and_default(self, spark):
        t0 = 1709500000
        rows = [
            (1, 10, "a", _ts(t0), 0.0),
            (2, 10, "b", _ts(t0 + 40), 0.0),
        ]
        df = _typed_events(spark, rows)
        assert impossible_velocity(df).count() == 0
        got = impossible_velocity(df, floors={("a", "b"): 60}).collect()
        assert len(got) == 1 and got[0].floor_s == 60 and got[0].gap_s == 40


class TestStreamingImpossibleVelocity:
    def test_drained_equals_batch(self, spark):
        from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.plans import (
            REGISTRY,
        )

        sf_dir = "/root/testdata/sf0.001"
        batch = REGISTRY["impossible_velocity_events"].builder(
            spark, sf_dir
        ).collect()
        streamed = REGISTRY["streaming_impossible_velocity"].builder(
            spark, sf_dir
        ).collect()
        assert sorted(map(tuple, streamed)) == sorted(map(tuple, batch))

    def test_offset_drained_equals_batch(self, spark):
        from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.plans import (
            REGISTRY,
        )

        sf_dir = "/root/testdata/sf0.001"
        batch = REGISTRY["cross_entity_duplicates_offset_events"].builder(
            spark, sf_dir
        ).collect()
        streamed = REGISTRY["streaming_cross_entity_duplicates_offset"].builder(
            spark, sf_dir
        ).collect()
        assert sorted(map(tuple, streamed)) == sorted(map(tuple, batch))

    def test_cross_batch_state_resolves_predecessor(self, spark, tmp_path):
        """A same-entity pair 0 s apart that straddles a micro-batch
        boundary must still be flagged — the state join supplies the
        predecessor identity the within-batch lag cannot see."""
        import datetime

        from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.streaming.jobs import (
            stream_impossible_velocity,
        )

        t0 = 1709500000
        # (signup -> signup) floor is 86400 s; the two events sit an
        # hour apart with DISTINCT ts, so repartitionByRange(2, ts)
        # puts them in different files -> different micro-batches ->
        # the flag can only come from the state join
        rows = [
            (1, datetime.datetime.utcfromtimestamp(t0), 10, "signup", 1.0, "{}"),
            (2, datetime.datetime.utcfromtimestamp(t0 + 3600), 10, "signup", 1.0, "{}"),
        ]
        df = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
        )
        d = str(tmp_path / "events.parquet")
        df.coalesce(1).write.parquet(d)
        got = stream_impossible_velocity(spark, str(tmp_path), n_files=2).collect()
        assert [
            (r.event_id, r.prev_event_id, r.prev_type, r.gap_s, r.floor_s)
            for r in got
        ] == [(2, 1, "signup", 3600, 86400)]


class TestSpendingMixDrift:
    def test_concentration_jump_flagged(self, spark):
        """Four balanced baseline weeks (HHI 1/2 over two categories)
        then a single-category current week (HHI 1): drift 0.5 >= 0.25
        -> flagged. A stable-mix entity in the same frame is decided
        and unflagged."""
        wk0 = 1704067200  # 2024-01-01, a Monday (week-start aligned)
        rows = []
        eid = 0
        for w in range(5):
            for d in (0, 2):  # two events per week
                eid += 1
                # drifter: balanced a/b for weeks 0-3, all-a in week 4
                ty = "a" if (w == 4 or d == 0) else "b"
                rows.append((eid, 1, ty, _ts(wk0 + w * 604800 + d * 86400), 10.0))
                # stable: always balanced
                eid += 1
                rows.append((eid, 2, "a" if d == 0 else "b", _ts(wk0 + w * 604800 + d * 86400), 10.0))
        got = {r.user_id: r for r in spending_mix_drift(_typed_events(spark, rows)).collect()}
        drifter, stable = got[1], got[2]
        assert drifter.decided and drifter.drift_flag
        assert abs(drifter.hhi_cur - 1.0) < 1e-15
        assert abs(drifter.hhi_base - 0.5) < 1e-15
        assert abs(drifter.hhi_drift - 0.5) < 1e-15
        assert stable.decided and not stable.drift_flag
        assert abs(stable.hhi_drift) < 1e-15

    def test_new_entity_undecided_never_flagged(self, spark):
        """An entity with no baseline weeks (or a thin one) is decided
        = FALSE and drift_flag = FALSE — never NULL, never flagged."""
        wk0 = 1704067200
        rows = [
            # old-timer supplies the prior weeks so week 4 is current
            (1, 1, "a", _ts(wk0), 10.0),
            (2, 1, "a", _ts(wk0 + 4 * 604800), 10.0),
            # newcomer: current week only
            (3, 9, "a", _ts(wk0 + 4 * 604800), 10.0),
        ]
        got = {r.user_id: r for r in spending_mix_drift(_typed_events(spark, rows)).collect()}
        new = got[9]
        assert new.hhi_base is None and new.decided is False and new.drift_flag is False
        # the old-timer has a baseline but under min_base_events=5
        old = got[1]
        assert old.hhi_base is not None and old.decided is False and old.drift_flag is False

    def test_streaming_drained_equals_batch(self, spark):
        from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.plans import (
            REGISTRY,
        )

        sf_dir = "/root/testdata/sf0.001"
        batch = REGISTRY["spending_mix_drift_events"].builder(
            spark, sf_dir
        ).collect()
        streamed = REGISTRY["streaming_spending_mix_drift"].builder(
            spark, sf_dir
        ).collect()
        assert sorted(map(tuple, streamed)) == sorted(map(tuple, batch))

    def test_zero_total_slice_null_hhi(self, spark):
        """Refund-cancelled slices (cents summing to 0) get NULL hhi
        via the explicit guard — no inf, no division error."""
        wk0 = 1704067200
        rows = [
            (1, 1, "a", _ts(wk0), 10.0),
            (2, 1, "a", _ts(wk0 + 86400), -10.0),
            (3, 1, "a", _ts(wk0 + 4 * 604800), 10.0),
        ]
        got = spending_mix_drift(_typed_events(spark, rows)).collect()
        assert len(got) == 1
        r = got[0]
        assert r.hhi_base is None and r.hhi_cur is not None
        assert r.decided is False and r.drift_flag is False
