"""Hypothesis differentials for round-11 operators: random heavy-tie
samples / graphs vs independent plain-Python references (the SURVEY §5
strategy — brute-force twins on ARBITRARY inputs, not just the hand
fixtures in test_stats/test_fraud_stats/test_graph)."""

from __future__ import annotations

import bisect
import math
from collections import Counter
from fractions import Fraction

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SLOW = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

#: small integer-valued doubles — maximal tie pressure
_vals = st.lists(st.integers(0, 6).map(float), min_size=1, max_size=60)


@SLOW
@given(_vals, _vals)
def test_ks_two_sample_matches_fractions(spark, a, b):
    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.stats import (
        ks_two_sample,
    )

    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v double")
    r = ks_two_sample(df, "g", "v", "a", "b").collect()[0]
    na, nb = len(a), len(b)
    best, best_v = Fraction(-1), None
    for v in sorted(set(a) | set(b)):
        d = abs(
            Fraction(sum(1 for x in a if x <= v), na)
            - Fraction(sum(1 for x in b if x <= v), nb)
        )
        if d > best:
            best, best_v = d, v
    assert (r["n_a"], r["n_b"]) == (na, nb)
    assert r["d_at_value"] == best_v
    num = abs(
        sum(1 for x in a if x <= best_v) * nb
        - sum(1 for x in b if x <= best_v) * na
    )
    assert r["d_stat"] == float(num) / float(na * nb)


@SLOW
@given(_vals, _vals)
def test_mann_whitney_matches_python(spark, a, b):
    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.stats import (
        mann_whitney,
    )

    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v double")
    r = mann_whitney(df, "g", "v", "a", "b").collect()[0]
    pooled = sorted(a + b)
    na, nb = len(a), len(b)
    n = na + nb

    def r2(v):
        lt = bisect.bisect_left(pooled, v)
        eq = bisect.bisect_right(pooled, v) - lt
        return 2 * lt + eq + 1

    u2 = sum(r2(v) for v in a) - na * (na + 1)
    t = sum(c**3 - c for c in Counter(pooled).values())
    s = n**3 - n - t
    assert (r["n_a"], r["n_b"]) == (na, nb)
    assert r["u_a"] == u2 / 2.0
    assert r["auc_a"] == float(u2) / float(2 * na * nb)
    if n > 1 and s > 0:
        z = float(u2 - na * nb) / (
            2.0 * math.sqrt(float(s * na * nb) / float(12 * n * (n - 1)))
        )
        assert r["z"] == z
    else:
        assert r["z"] is None
    # U_a + U_b identity: 2U_a + 2U_b = 2·n_a·n_b
    rb = mann_whitney(df, "g", "v", "b", "a").collect()[0]
    assert r["u_a"] + rb["u_a"] == float(na * nb)


@SLOW
@given(
    st.dictionaries(
        st.sampled_from(["p", "q", "r", "s"]), _vals, min_size=2, max_size=4
    )
)
def test_kruskal_wallis_matches_python(spark, groups):
    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.stats import (
        kruskal_wallis,
    )

    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v double")
    r = kruskal_wallis(df, "g", "v").collect()[0]
    pooled = sorted(v for vs in groups.values() for v in vs)
    n = len(pooled)

    def r2(v):
        lt = bisect.bisect_left(pooled, v)
        eq = bisect.bisect_right(pooled, v) - lt
        return 2 * lt + eq + 1

    s = 0.0
    for g in sorted(groups):
        vs = groups[g]
        r2i = sum(r2(v) for v in vs)
        s += float(r2i * r2i) / float(4 * len(vs))
    h = (12.0 * s) / float(n * (n + 1)) - float(3 * (n + 1))
    t = sum(c**3 - c for c in Counter(pooled).values())
    assert (r["n"], r["n_groups"]) == (n, len(groups))
    assert r["h"] == h
    if n**3 - n - t > 0:
        assert r["h_tie"] == h / (float(n**3 - n - t) / float(n**3 - n))
    else:
        assert r["h_tie"] is None


@SLOW
@given(
    st.lists(
        st.tuples(st.integers(0, 40), st.integers(-500, 500)),
        min_size=2,
        max_size=25,
        unique_by=lambda t: t[0],
    )
)
def test_theil_sen_matches_python(spark, pts):
    import datetime as dt
    import statistics

    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.stats import (
        theil_sen_daily,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [
        ("g", base + dt.timedelta(days=d), c / 100.0) for d, c in pts
    ]
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double"
    )
    r = theil_sen_daily(df).collect()[0]
    epoch0 = dt.date(1970, 1, 1).toordinal()
    xs = sorted(
        (
            (base + dt.timedelta(days=d)).date().toordinal() - epoch0,
            c,
        )
        for d, c in pts
    )
    slopes = [
        (y2 - y1) / (x2 - x1)
        for i, (x1, y1) in enumerate(xs)
        for (x2, y2) in xs[i + 1:]
    ]
    m = statistics.median(slopes)
    resid = [y - m * x for x, y in xs]
    assert r["n_days"] == len(xs)
    assert r["n_pairs"] == len(slopes)
    assert r["slope_cents_per_day"] == m
    assert r["intercept_cents"] == statistics.median(resid)


@SLOW
@given(
    st.lists(st.integers(0, 7), min_size=4, max_size=40),
    st.lists(st.integers(0, 7), min_size=0, max_size=40),
)
def test_lorenz_matches_python_ntile(spark, cents_a, cents_b):
    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.stats import (
        lorenz_concentration,
    )

    cents = cents_a + cents_b
    rows = [(i, c) for i, c in enumerate(cents)]
    B = 4
    df = spark.createDataFrame(rows, "id long, cents long")
    got = {
        r["bucket"]: r
        for r in lorenz_concentration(df, "id", "cents", B).collect()
    }
    srt = sorted(rows, key=lambda t: (t[1], t[0]))
    n = len(srt)
    sizes = [(n // B) + (1 if i < n % B else 0) for i in range(B)]
    total = sum(cents)
    pos, cum_c = 0, 0
    for b, sz in enumerate(sizes, start=1):
        if sz == 0:
            assert b not in got
            continue
        chunk = srt[pos:pos + sz]
        pos += sz
        csum = sum(c for _, c in chunk)
        cum_c += csum
        assert (got[b]["n_entities"], got[b]["cents_total"]) == (sz, csum)
        assert got[b]["cum_cents"] == cum_c
        if total > 0:
            assert got[b]["cum_share_cents"] == float(cum_c) / float(total)
        else:
            assert got[b]["cum_share_cents"] is None


@SLOW
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 5000)),
        min_size=1,
        max_size=60,
    )
)
def test_burstiness_matches_python(spark, evs):
    import datetime as dt

    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.fraud_stats import (
        interevent_burstiness,
    )

    base = dt.datetime(2024, 6, 1)
    rows = [
        (i, u, base + dt.timedelta(seconds=s), 0.0)
        for i, (u, s) in enumerate(evs)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    got = {r["user_id"]: r for r in interevent_burstiness(df).collect()}
    per = {}
    for i, (u, s) in enumerate(evs):
        per.setdefault(u, []).append((s, i))
    for u, lst in per.items():
        if len(lst) < 3:
            assert u not in got
            continue
        lst.sort()  # (epoch_s, event_id) — the operator's ordering
        gaps = [lst[i][0] - lst[i - 1][0] for i in range(1, len(lst))]
        n, s_, ss = len(gaps), sum(gaps), sum(g * g for g in gaps)
        mu = float(s_) / float(n)
        sd = math.sqrt(float(n * ss - s_ * s_)) / float(n)
        r = got[u]
        assert (r["n_events"], r["n_gaps"]) == (len(lst), n)
        assert r["mean_gap_s"] == mu and r["sd_gap_s"] == sd
        if sd + mu > 0:
            assert r["burstiness"] == (sd - mu) / (sd + mu)
        else:
            assert r["burstiness"] is None
