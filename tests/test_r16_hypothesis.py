"""Hypothesis property tests for the round-16 operators: HHI
identities, last-digit spine reconstruction, and the privacy-gate
composition — randomized inputs against pure-Python ground truth
(the r7-r15 hypothesis discipline: small deadline-free examples,
deterministic derandomized profiles)."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@st.composite
def _entity_cats(draw):
    n = draw(st.integers(min_value=1, max_value=50))
    return [
        (
            draw(st.integers(min_value=1, max_value=5)),
            draw(st.sampled_from(["a", "b", "c", "d"])),
        )
        for _ in range(n)
    ]


class TestHhiProperties:
    @given(rows=_entity_cats())
    @settings(**_SETTINGS)
    def test_matches_python_and_bounds(self, spark, rows):
        from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.fraud_stats import (
            hhi_concentration,
        )

        df = spark.createDataFrame(rows, "u long, c string")
        got = {r.u: r for r in hhi_concentration(df, "u", "c").collect()}
        per: dict = {}
        for u, c in rows:
            per.setdefault(u, {}).setdefault(c, 0)
            per[u][c] += 1
        assert set(got) == set(per)
        for u, cats in per.items():
            n = sum(cats.values())
            ss = sum(v * v for v in cats.values())
            assert got[u].hhi == ss / (n * n)
            assert got[u].n == n and got[u].n_categories == len(cats)
            # bounds: 1/|cats| <= HHI <= 1
            assert 1.0 / len(cats) - 1e-12 <= got[u].hhi <= 1.0
            assert bool(got[u].concentration_flag) == (
                n >= 5 and 2 * ss >= n * n
            )


@st.composite
def _amounts(draw):
    n = draw(st.integers(min_value=1, max_value=60))
    # integer cents in [1000, 30000) so every row clears the $10 gate
    return [
        draw(st.integers(min_value=1000, max_value=29999)) for _ in range(n)
    ]


class TestLastDigitsProperties:
    @given(cents=_amounts())
    @settings(**_SETTINGS)
    def test_spine_counts_and_chi2(self, spark, cents):
        from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.fraud_stats import (
            last_digits_profile,
        )

        rows = [("g", c / 100.0) for c in cents]
        df = spark.createDataFrame(rows, "g string, v double")
        out = {r.digit: r for r in last_digits_profile(df, "v", "g").collect()}
        assert set(out) == set(range(100))
        counts: dict = {}
        for c in cents:
            counts[c % 100] = counts.get(c % 100, 0) + 1
        n = len(cents)
        q = 0
        for d in range(100):
            assert out[d].n_obs == counts.get(d, 0)
            assert out[d].n_total == n
            e = n * 0.01
            dev = counts.get(d, 0) - e
            q += math.floor(dev * dev / e * 1e9)
        assert out[0].chi2 == q / 1e9


@st.composite
def _quasi_bands(draw):
    n = draw(st.integers(min_value=1, max_value=60))
    return [
        (
            draw(st.sampled_from(["p", "q", "r"])),
            draw(st.integers(min_value=0, max_value=3)),
        )
        for _ in range(n)
    ]


class TestPrivacyGateProperties:
    @given(rows=_quasi_bands())
    @settings(**_SETTINGS)
    def test_composition_matches_python(self, spark, rows):
        from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.quality_checks import (
            privacy_gate_report,
        )

        df = spark.createDataFrame(rows, "q string, band long")
        got = {
            r.q: r
            for r in privacy_gate_report(
                df, ["q"], "band", k=3, l=2, t_num=1, t_den=5
            ).collect()
        }
        per: dict = {}
        for q, b in rows:
            per.setdefault(q, {}).setdefault(b, 0)
            per[q][b] += 1
        bands = sorted({b for _, b in rows})
        m = len(bands)
        tot = len(rows)
        gcum, acc = {}, 0
        for b in bands:
            acc += sum(cats.get(b, 0) for cats in per.values())
            gcum[b] = acc
        assert set(got) == set(per)
        for q, cats in per.items():
            cs = sum(cats.values())
            assert got[q].class_size == cs
            assert got[q].l_distinct == len(cats)
            assert bool(got[q].k_violation) == (cs < 3)
            assert bool(got[q].l_violation) == (len(cats) < 2)
            acc, sumabs = 0, 0
            for b in bands:
                acc += cats.get(b, 0)
                sumabs += abs(acc * tot - gcum[b] * cs)
            if m == 1:
                assert got[q].emd == 0.0
                assert not got[q].t_violation
            else:
                assert got[q].emd == sumabs / (cs * tot * (m - 1))
                assert bool(got[q].t_violation) == (
                    sumabs * 5 > 1 * cs * tot * (m - 1)
                )
            assert bool(got[q].any_violation) == (
                bool(got[q].k_violation)
                or bool(got[q].l_violation)
                or bool(got[q].t_violation)
            )
