"""Statistical fraud-screening primitives: Benford's-law digit tests
and trailing-time-window velocity rules.

Fraud-analytics extensions of the reference's four static rules
(``/root/reference/scripts/run_pipeline.py:22-43``): auditors' two
standard first-pass screens over a claims/transactions ledger are
(a) first-significant-digit distribution vs Benford's law — fabricated
amounts over-represent high leading digits — and (b) velocity checks —
too many events from one entity inside a short trailing window.

Both are pure column-expression plans (zero Python in the hot path):

* ``benford_profile`` is one scan + one tiny groupBy(group, digit)
  whose output is ≤ 9·|groups| rows; the chi-square statistic uses the
  1e-9-quantized-BIGINT-sum discipline (operators/stats.py::
  chi_square_independence) so the 9-term float sum is
  order-independent and any engine reproduces it bitwise. Expected
  Benford masses log10(1+1/d) enter as pinned ``%.17e`` double
  literals on BOTH engine sides (the playbook's exact-round-trip
  rule), never via each engine's own log10.
* ``velocity_flags`` is one per-key window shuffle with a RANGE frame
  on epoch seconds — the frame is defined by VALUE, not row position,
  so same-second ties are peers on every engine and the result is
  deterministic without a tiebreaker. Trailing sums use exact integer
  cents. At 100 TB this is the same shape as any keyed window: one
  shuffle on the entity key, AQE-splittable, no self-join blowup
  (the naive form is an |events|² time-range self-join).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: log10(1 + 1/d) for d = 1..9, as exact-round-trip literals shared
#: with the SQL oracle (f"{p:.17e}" — exponent form so DuckDB parses
#: DOUBLE, not DECIMAL).
BENFORD_P = [math.log10(1.0 + 1.0 / d) for d in range(1, 10)]

#: chi-square(8 df) 0.99 critical value, pinned identically on both
#: engine sides of the composed risk reports (the comparison operand —
#: not the statistic — so any shared literal works). Lives here so the
#: batch query (plans/data_ops.py) and the streaming twin
#: (streaming/jobs.py) share one definition without a plans<->streaming
#: import cycle.
CHI2_8DF_99 = 20.0902


def benford_profile(
    df: DataFrame,
    value_col: str,
    group_col: str,
) -> DataFrame:
    """Per (group, leading digit 1-9): observed count, group total,
    observed fraction, Benford's expected mass, and the group's
    chi-square goodness-of-fit statistic (repeated on each of the
    group's 9 rows).

    Amounts quantize to integer cents (round half-up, the ledger
    convention shared by every oracle here); the leading digit is the
    first character of the cents integer — exact, no float log10.
    Digits a group never produced still contribute (0−e)²/e: the digit
    spine 1..9 cross-joins the (tiny) group list, so the statistic is
    the true 8-degrees-of-freedom chi-square, not a partial sum.

    Chi-square arithmetic: e_d = N·p_d and (n_d−e_d)²/e_d are IEEE
    doubles with identical operand trees on both engines; each per-
    digit quotient is floor-quantized to 1e-9 and summed as
    decimal(38,0) — order-independent — with ONE final double division
    (Σq/1e9). Rows with non-positive amounts are excluded (no leading
    digit).

    Width bound (the chi_square_independence discipline): the worst
    per-digit quotient is ≈ N·(1−p₉)²/p₉ ≈ 20·N, so the 1e-9-scaled
    BIGINT stage of ``floor`` holds while 20·N·10⁹ < 2⁶³, i.e. group
    sizes N ≲ 4.6·10⁸. Beyond that, lower the quantization scale (the
    statistic is O(N) — nine digits of resolution is far below the
    statistic's own magnitude there); the bound is per GROUP, not per
    table.
    """
    cents = F.round(F.col(value_col) * 100).cast("long")
    obs = (
        df.where(cents > 0)
        .select(
            F.col(group_col).alias("grp"),
            F.substring(cents.cast("string"), 1, 1).cast("int").alias("digit"),
        )
        .groupBy("grp", "digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n_obs"))
    )
    return benford_from_counts(obs, group_col)


def benford_from_counts(obs: DataFrame, group_col: str) -> DataFrame:
    """The digit-spine + chi-square tail of ``benford_profile``, taking
    pre-aggregated observed counts (grp, digit, n_obs) — factored out
    so the STREAMING screen can fold exact per-batch digit counts
    additively (counts are the mergeable sufficient statistic) and
    finish with the identical pinned expression tree; the drained
    stream therefore equals the batch query bit-for-bit."""
    return _benford_chi2_over_spine(
        obs, group_col, list(zip(range(1, 10), BENFORD_P))
    )


def _benford_chi2_over_spine(
    obs: DataFrame, group_col: str, masses: list
) -> DataFrame:
    """Shared digit-spine + quantized chi-square finish for the
    first-digit (spine 1..9) and first-two-digits (spine 10..99)
    Benford screens. ``masses`` is the [(digit, expected_p)] list —
    the expected_p doubles are the SAME Python floats the oracle's
    %.17e literals round-trip to, entering the plan through a
    broadcast spine frame (a join, not a 90-arm CASE, so codegen
    never sees a deep conditional). ``obs`` fans out to the group
    spine AND the count join, so it is persisted once via the bounded
    swap-cache (r16: lineage re-derivation re-ran the data-sized scan
    + digit aggregation per consumer)."""
    from ..cache import plan_key, swap_cache

    obs = swap_cache(plan_key("benford_spine.obs", obs), obs)
    spine_rows = obs.sparkSession.createDataFrame(
        [(int(d), float(p)) for d, p in masses],
        "digit int, expected_p double",
    )
    spine = obs.select("grp").distinct().crossJoin(F.broadcast(spine_rows))
    full = (
        spine.join(obs, ["grp", "digit"], "left")
        .withColumn("n_obs", F.coalesce(F.col("n_obs"), F.lit(0)).cast("long"))
        .withColumn(
            "n_total",
            F.sum("n_obs").over(Window.partitionBy("grp")).cast("long"),
        )
    )
    e = F.col("n_total").cast("double") * F.col("expected_p")
    dev = F.col("n_obs").cast("double") - e
    contrib = dev * dev / e
    q = F.floor(contrib * F.lit(1e9)).cast("decimal(38,0)")
    return (
        full.withColumn(
            "chi2",
            (
                F.sum(q).over(Window.partitionBy("grp")).cast("double")
                / F.lit(1e9)
            ),
        )
        .select(
            F.col("grp").alias(group_col),
            "digit",
            "n_obs",
            "n_total",
            (F.col("n_obs").cast("double") / F.col("n_total").cast("double")).alias(
                "obs_frac"
            ),
            "expected_p",
            "chi2",
        )
        .orderBy(group_col, "digit")
    )


def benford_oracle_case() -> str:
    """The pinned-literal CASE mapping digit → Benford mass, shared by
    the DuckDB oracle so both engines evaluate the SAME doubles."""
    whens = " ".join(
        f"WHEN {d} THEN {p:.17e}" for d, p in zip(range(1, 10), BENFORD_P)
    )
    return f"CASE digit {whens} END"


#: log10(1 + 1/d) for the first-TWO significant digits d = 10..99 —
#: Nigrini's more discriminating F2D test (fabricators who learn to
#: spread first digits still leave second-digit structure).
BENFORD2_P = [math.log10(1.0 + 1.0 / d) for d in range(10, 100)]


def benford_first2_profile(
    df: DataFrame, value_col: str, group_col: str
) -> DataFrame:
    """Per (group, first-two-digits 10..99): observed count, total,
    fraction, the F2D Benford mass log10(1+1/d), and the group's
    89-df chi-square — ``benford_profile``'s discipline on the
    two-digit spine (exact integer cents, string-prefix digits — no
    float log10; the 1e-9-quantized decimal(38,0) chi-square sum).
    Rows with cents < 10 have no two significant digits and are
    excluded, mirroring the > 0 exclusion of the first-digit test.
    Same scale shape: one scan + a ≤ 90·|groups|-row aggregate."""
    cents = F.round(F.col(value_col) * 100).cast("long")
    obs = (
        df.where(cents >= 10)
        .select(
            F.col(group_col).alias("grp"),
            F.substring(cents.cast("string"), 1, 2).cast("int").alias("digit"),
        )
        .groupBy("grp", "digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n_obs"))
    )
    return _benford_chi2_over_spine(
        obs, group_col, list(zip(range(10, 100), BENFORD2_P))
    )


#: χ²₀.₉₉(89) — the two-sided-99% critical value for the 89-df F2D
#: spine, a pinned shared literal (comparison operand, not statistic).
CHI2_99_89DF = 122.9422067982886


def last_digits_profile(
    df: DataFrame,
    value_col: str,
    group_col: str,
    min_cents: int = 1000,
) -> DataFrame:
    """Nigrini's LAST-two-digits uniformity test — the companion to
    the Benford first-digit screens: genuine prices and metered
    amounts have effectively uniform last-two cents digits (00..99,
    expectation 1/100 each), while invented figures over-represent
    round and "psychological" endings (00, 50, 99). Where the F2D
    test catches fabricated MAGNITUDES, this catches fabricated
    ENDINGS — the number-invention tell that survives first-digit
    coaching.

    digit = exact integer cents mod 100; rows with cents <
    ``min_cents`` (default $10) are excluded so the last two digits
    are genuinely insignificant digits of the amount (on small
    amounts they ARE the amount and uniformity is not the null).
    The 99-df chi-square runs on the shared quantized-decimal spine
    machinery (``_benford_chi2_over_spine`` with the exact 1/100
    mass — 0.01 is not dyadic but IS the same double on both
    engines). Same scale shape: one scan + a ≤ 100·|groups|-row
    aggregate."""
    cents = F.round(F.col(value_col) * 100).cast("long")
    obs = (
        df.where(cents >= min_cents)
        .select(
            F.col(group_col).alias("grp"),
            (cents % 100).cast("int").alias("digit"),
        )
        .groupBy("grp", "digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n_obs"))
    )
    return last_digits_from_counts(obs, group_col)


def last_digits_from_counts(obs: DataFrame, group_col: str) -> DataFrame:
    """Chi-square finish of the last-two-digits test from exact
    (grp, digit, n_obs) counts — the mergeable-sufficient-statistic
    split that lets the streaming twin fold counts per micro-batch
    and run THIS identical pinned finish once on the drained state
    (the benford_from_counts discipline)."""
    return _benford_chi2_over_spine(
        obs, group_col, [(d, 0.01) for d in range(100)]
    )


def hhi_concentration(
    df: DataFrame,
    entity_col: str,
    category_col: str,
    min_events: int = 5,
    thr_num: int = 1,
    thr_den: int = 2,
) -> DataFrame:
    """Herfindahl–Hirschman concentration of each entity's activity
    mix (public antitrust statistic repurposed as the behavioral-
    diversity screen): HHI = Σᵢ (nᵢ/n)² over the entity's category
    counts — 1/|categories| for a balanced mix, →1 for a single-
    category automaton. Mule accounts and bots concentrate where
    organic users spread; the flag reads "≥ thr of the probability
    mass squared", i.e. HHI ≥ thr_num/thr_den with n ≥ min_events.

    Exactness: HHI = Σnᵢ²/n² is a ratio of exact integers — Σnᵢ²
    accumulates as decimal(38,0) (nᵢ ≤ 10¹⁸ safe), ONE final IEEE
    division per entity; the flag is the exact integer
    cross-multiplication Σnᵢ²·thr_den ≥ thr_num·n² (never a float
    compare). Scale shape: one map-side-combinable count at
    (entity, category) grain, one roll-up to entity grain — two
    keyed shuffles on the entity, no window, no data-sized join."""
    per = (
        df.select(
            F.col(entity_col).alias("_e"),
            F.col(category_col).alias("_c"),
        )
        .where(F.col("_e").isNotNull() & F.col("_c").isNotNull())
        .groupBy("_e", "_c")
        .agg(F.count(F.lit(1)).cast("long").alias("_n"))
    )
    ent = per.groupBy("_e").agg(
        F.sum("_n").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_categories"),
        F.sum(
            F.col("_n").cast("decimal(38,0)") * F.col("_n").cast("decimal(38,0)")
        )
        .cast("decimal(38,0)")
        .alias("_ss"),
    )
    n2 = F.col("n").cast("decimal(38,0)") * F.col("n").cast("decimal(38,0)")
    return ent.select(
        F.col("_e").alias(entity_col),
        "n",
        "n_categories",
        (F.col("_ss").cast("double") / n2.cast("double")).alias("hhi"),
        (
            (F.col("n") >= min_events)
            & (
                F.col("_ss") * F.lit(thr_den).cast("decimal(38,0)")
                >= F.lit(thr_num).cast("decimal(38,0)") * n2
            )
        ).alias("concentration_flag"),
    ).orderBy(entity_col)


def benford_first2_drift(
    df: DataFrame, value_col: str, ts_col: str
) -> DataFrame:
    """Benford-first2 DRIFT: the Nigrini F2D screen per calendar
    MONTH (VERDICT r15 item 8) — grouping the digit test by time
    bucket instead of by category answers the question the static
    screen cannot: WHEN did fabrication start? A ledger that conforms
    for years and breaks conformity in one quarter localizes the
    suspect period to that quarter.

    Per month: the exact F2D chi-square of ``benford_first2_profile``
    (integer cents, string-prefix digits, 1e-9-quantized decimal
    sums) COLLAPSED to one row (month, n_total, chi2,
    reject_benford) with the decision at the pinned χ²₀.₉₉(89)
    literal — a drift series readable at a glance, |months| rows.

    Scale shape: identical to the static screen — one scan into a
    ≤ 90·|months|-row aggregate (months are a bounded calendar
    domain), then a |months|-row collapse. The month key is a
    yyyy-MM string on both engines."""
    prof = benford_first2_profile(
        df.withColumn(
            "_bucket", F.date_format(F.col(ts_col), "yyyy-MM")
        ),
        value_col,
        "_bucket",
    )
    return (
        prof.groupBy(F.col("_bucket").alias("month"))
        .agg(
            F.max("n_total").cast("long").alias("n_total"),
            F.max("chi2").alias("chi2"),
        )
        .select(
            "month",
            "n_total",
            "chi2",
            (F.col("chi2") > F.lit(CHI2_99_89DF)).alias("reject_benford"),
        )
        .orderBy("month")
    )


def benford2_oracle_case() -> str:
    """The pinned-literal CASE for the two-digit spine, shared with
    the DuckDB oracle (the benford_oracle_case discipline)."""
    whens = " ".join(
        f"WHEN {d} THEN {p:.17e}" for d, p in zip(range(10, 100), BENFORD2_P)
    )
    return f"CASE digit {whens} END"


def velocity_flags(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    window_seconds: int = 3600,
    count_threshold: int = 5,
    cents_threshold: int = 500_00,
) -> DataFrame:
    """Per event: trailing-window activity of its entity — event count
    and exact cents total over the preceding ``window_seconds``
    (inclusive of the current event) — plus the two classic velocity
    flags (count ≥ threshold, spend ≥ threshold).

    RANGE frame on epoch seconds: peers are defined by timestamp VALUE
    (ties all enter each other's frames symmetrically), so the output
    is engine-independent with no tiebreaker column, unlike a ROWS
    frame. One shuffle, on the entity key."""
    epoch_s = F.col(ts_col).cast("long")
    cents = F.round(F.col(value_col) * 100).cast("long")
    base = events.select(
        F.col("event_id"),
        F.col(key_col).alias("entity"),
        epoch_s.alias("epoch_s"),
        cents.alias("cents"),
    )
    w = (
        Window.partitionBy("entity")
        .orderBy("epoch_s")
        .rangeBetween(-window_seconds, 0)
    )
    return base.select(
        "event_id",
        F.col("entity").alias(key_col),
        "epoch_s",
        F.count(F.lit(1)).over(w).cast("long").alias("n_trailing"),
        F.sum("cents").over(w).cast("long").alias("cents_trailing"),
        (F.count(F.lit(1)).over(w) >= count_threshold).alias("velocity_flag"),
        (F.sum("cents").over(w) >= cents_threshold).alias("spend_flag"),
    )


def amount_structuring(
    df: DataFrame,
    key_col: str,
    value_col: str,
    threshold_cents: int = 50_000_00,
    band_frac: float = 0.9,
    round_mod_cents: int = 100,
    min_events: int = 5,
    rate_mult: int = 3,
    min_hits: int = 2,
) -> DataFrame:
    """Amount-pattern screen per entity: STRUCTURING (smurfing) and
    ROUND-NUMBER bias — the two classic ledger-amount tells beyond
    Benford (fraud_stats.py's third screen; extends the reference's
    static amount rule at ``run_pipeline.py:23-25`` from "amount too
    big" to "amounts shaped to avoid the threshold").

    * band_hits — amounts in [band_frac·T, T): deliberately just
      below the reporting threshold T (31 CFR structuring pattern).
    * round_hits — amounts that are exact multiples of
      ``round_mod_cents`` (fabricated figures over-represent round
      numbers; genuine priced ledgers almost never land on them).

    An entity flags when its hit rate is at least ``rate_mult``× the
    LEDGER-WIDE base rate and it has ≥ ``min_hits`` hits — the
    comparison is the exact integer cross-multiplication
    ``hits·g_n ≥ rate_mult·n·g_hits`` in decimal(38,0) (never a float
    rate compare), so the flag is engine-independent at any scale.
    The reported ``*_frac`` ratios are the one pinned IEEE division
    each, for human eyes.

    Plan shape: one scan → one entity-keyed aggregation (conditional
    counts) → a second aggregation over the |entities|-row result for
    the global base rates → broadcast one-row join back. One fact
    shuffle total; the global pass never re-reads the ledger. At
    100 TB: identical — the base-rate reduce is over entities, not
    events."""
    lo = int(threshold_cents * band_frac)
    cents = F.round(F.col(value_col) * 100).cast("long")
    per = (
        df.where(cents > 0)
        .select(
            F.col(key_col).alias("entity"),
            cents.alias("cents"),
        )
        .groupBy("entity")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_amounts"),
            F.sum(
                F.when(
                    (F.col("cents") >= lo) & (F.col("cents") < threshold_cents), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("band_hits"),
            F.sum(
                F.when(F.col("cents") % round_mod_cents == 0, 1).otherwise(0)
            )
            .cast("long")
            .alias("round_hits"),
        )
        .where(F.col("n_amounts") >= min_events)
    )
    glob = per.agg(
        F.sum("n_amounts").cast("decimal(38,0)").alias("g_n"),
        F.sum("band_hits").cast("decimal(38,0)").alias("g_band"),
        F.sum("round_hits").cast("decimal(38,0)").alias("g_round"),
    )
    j = per.crossJoin(F.broadcast(glob))
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    mult = F.lit(rate_mult).cast("decimal(38,0)")
    return j.select(
        F.col("entity").alias(key_col),
        "n_amounts",
        "band_hits",
        (F.col("band_hits").cast("double") / F.col("n_amounts").cast("double")).alias(
            "band_frac"
        ),
        "round_hits",
        (F.col("round_hits").cast("double") / F.col("n_amounts").cast("double")).alias(
            "round_frac"
        ),
        (
            (F.col("band_hits") >= min_hits)
            & (d38("band_hits") * d38("g_n") >= mult * d38("n_amounts") * d38("g_band"))
        ).alias("structuring_flag"),
        (
            (F.col("round_hits") >= min_hits)
            & (
                d38("round_hits") * d38("g_n")
                >= mult * d38("n_amounts") * d38("g_round")
            )
        ).alias("round_flag"),
    )


def dormancy_reactivation(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    id_col: str,
    dormant_days: int = 60,
    spend_cents: int = 400_000_00,
) -> DataFrame:
    """Dormancy-reactivation screen: an account silent for
    ``dormant_days`` that returns with a large transaction — the
    classic account-takeover / mule-activation tell (the temporal
    complement of ``velocity_flags``: too SLOW then too big, instead
    of too fast).

    Per event: integer days since the entity's previous event
    (NULL for its first), plus ``dormant_flag`` (gap ≥ dormant_days)
    and ``reactivation_flag`` (dormant AND this event ≥ spend_cents).
    The lag window orders by (date, id) — the deterministic-tiebreaker
    discipline (same-day events would otherwise make lag
    engine-dependent); the oracle mirrors the same two-key ORDER BY.
    Day arithmetic is exact integer datediff — no timestamp floats.

    One entity-keyed window shuffle, same 100 TB shape as
    velocity_flags."""
    cents = F.round(F.col(value_col) * 100).cast("long")
    base = df.select(
        F.col(id_col).alias("_id"),
        F.col(key_col).alias("entity"),
        F.to_date(F.col(ts_col)).alias("d"),
        cents.alias("cents"),
    )
    w = Window.partitionBy("entity").orderBy("d", "_id")
    gap = F.datediff(F.col("d"), F.lag("d").over(w)).cast("int")
    out = base.select(
        F.col("_id").alias(id_col),
        F.col("entity").alias(key_col),
        F.col("d").alias("event_date"),
        "cents",
        gap.alias("gap_days"),
    )
    dormant = F.coalesce(F.col("gap_days") >= dormant_days, F.lit(False))
    return out.select(
        id_col,
        key_col,
        "event_date",
        "cents",
        "gap_days",
        dormant.alias("dormant_flag"),
        (dormant & (F.col("cents") >= spend_cents)).alias("reactivation_flag"),
    )


def interevent_burstiness(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    min_events: int = 3,
) -> DataFrame:
    """Per-entity inter-event timing profile — the bot-vs-human screen
    (Goh & Barabási burstiness): scripted activity produces near-
    constant gaps (B → −1), human activity is bursty (B → +1).

        B = (σ − μ) / (σ + μ)

    over the entity's inter-event gaps in integer seconds (floor
    epoch deltas — exact). Moments are exact BIGINTs (n, Σg, Σg²);
    the final expression tree is pinned IEEE —
    μ = S/n, σ = sqrt(n·Σg² − S²)/n (that spelling, sqrt then divide,
    is mirrored literally in the twin) — so B reproduces bitwise.
    Entities with fewer than ``min_events`` events (< 2 gaps) are
    excluded; all-zero gaps (every event in the same second: σ = μ =
    0) yield NULL B.

    One entity-keyed window pass for the lag + one keyed aggregation —
    the same single-shuffle shape as velocity_flags. Returns
    (entity, n_events, n_gaps, mean_gap_s, sd_gap_s, burstiness)."""
    from pyspark.sql import Window

    epoch_s = F.col(ts_col).cast("long")
    w = Window.partitionBy("entity").orderBy("epoch_s", "event_id")
    gaps = (
        events.select(
            F.col(key_col).alias("entity"),
            epoch_s.alias("epoch_s"),
            F.col("event_id"),
        )
        .select(
            "entity",
            (F.col("epoch_s") - F.lag("epoch_s").over(w)).alias("gap"),
        )
    )
    m = (
        gaps.groupBy("entity")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.count("gap").cast("long").alias("n_gaps"),
            F.sum("gap").cast("decimal(38,0)").alias("s"),
            F.sum(
                F.col("gap").cast("decimal(18,0)")
                * F.col("gap").cast("decimal(18,0)")
            ).alias("ss"),
        )
        .where(F.col("n_rows") >= min_events)
    )
    n = F.col("n_gaps").cast("decimal(38,0)")
    mu = F.col("s").cast("double") / F.col("n_gaps").cast("double")
    sd = F.sqrt((n * F.col("ss") - F.col("s") * F.col("s")).cast("double")) / F.col(
        "n_gaps"
    ).cast("double")
    return m.select(
        F.col("entity").alias(key_col),
        F.col("n_rows").alias("n_events"),
        "n_gaps",
        mu.alias("mean_gap_s"),
        sd.alias("sd_gap_s"),
        F.when(sd + mu > 0, (sd - mu) / (sd + mu)).alias("burstiness"),
    )


def peer_group_outliers(
    df: DataFrame,
    entity_col: str,
    peer_col: str,
    value_col: str,
    z_threshold: float = 3.0,
    min_peers: int = 10,
) -> DataFrame:
    """Peer-group outlier screen with LEAVE-ONE-OUT moments: each
    entity's mean transaction value compared against its peer group's
    distribution EXCLUDING the entity itself — the fraud-audit form of
    "spends like their cohort?" (including the entity in its own
    baseline masks exactly the big fish the screen exists to catch;
    with exact integer sums the exclusion is free algebra, no second
    pass):

        μ₋e  = (S − s_e) / (N − n_e)
        σ²₋e = (SS − ss_e) / (N − n_e) − μ₋e²        (population)
        z_e  = (x̄_e − μ₋e) / σ₋e

    All moments are exact (cents as BIGINT, squares as decimal(38,0));
    the z tail is one pinned IEEE tree (each exact operand cast to
    double, the subtraction-of-squares spelling mirrored literally by
    the twin). Entities whose peer remainder has fewer than
    ``min_peers`` events or σ₋e = 0 get NULL z and no flag. The
    ``z_threshold`` enters the flag as the same double literal on both
    engines. Width bound: ss_e = Σcents² ≤ n·(2³¹)² needs ~n·4.6e18 —
    decimal(38,0) holds to ~2e19 events per entity; far past any
    ledger.

    Plan shape: ONE entity-grain aggregation of the fact scan (exact
    n/S/SS per entity), one peer-grain roll-up OF THAT (|entities|
    rows, not events), broadcast back — the amount_structuring shape:
    the fact table is never re-scanned. Returns (entity, peer, n_events,
    mean_value, peer_mu, peer_sigma, z, outlier_flag)."""
    d38 = "decimal(38,0)"
    cents = F.round(F.col(value_col) * 100).cast("long")
    per = (
        df.select(
            F.col(entity_col).alias("entity"),
            F.col(peer_col).alias("peer"),
            cents.alias("c"),
        )
        .where(F.col("c").isNotNull())
        .groupBy("entity", "peer")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_e"),
            F.sum("c").cast(d38).alias("s_e"),
            F.sum(F.col("c").cast("decimal(19,0)") * F.col("c").cast("decimal(19,0)"))
            .cast(d38)
            .alias("ss_e"),
        )
    )
    grp = per.groupBy("peer").agg(
        F.sum("n_e").cast(d38).alias("n_g"),
        F.sum("s_e").cast(d38).alias("s_g"),
        F.sum("ss_e").cast(d38).alias("ss_g"),
    )
    j = per.join(grp, "peer")
    n_rest = (F.col("n_g") - F.col("n_e").cast(d38)).cast("double")
    mu = (F.col("s_g") - F.col("s_e")).cast("double") / n_rest
    var = (F.col("ss_g") - F.col("ss_e")).cast("double") / n_rest - mu * mu
    mean_e = F.col("s_e").cast("double") / F.col("n_e").cast("double")
    ok = (F.col("n_g") - F.col("n_e").cast(d38) >= min_peers) & (var > 0)
    z = F.when(ok, (mean_e - mu) / F.sqrt(var))
    return j.select(
        F.col("entity").alias(entity_col),
        F.col("peer").alias(peer_col),
        F.col("n_e").alias("n_events"),
        (mean_e / F.lit(100.0)).alias("mean_value"),
        F.when(ok, mu / F.lit(100.0)).alias("peer_mu"),
        F.when(ok, F.sqrt(var) / F.lit(100.0)).alias("peer_sigma"),
        z.alias("z"),
        F.coalesce(F.abs(z) > F.lit(float(z_threshold)), F.lit(False)).alias(
            "outlier_flag"
        ),
    )


def split_transactions(
    df: DataFrame,
    key_col: str,
    date_col: str,
    value_col: str,
    id_col: str,
    threshold_cents: int = 50_000_00,
    window_days: int = 7,
    min_parts: int = 3,
) -> DataFrame:
    """Split-transaction (smurfing-by-splitting) screen: per ledger
    row, the trailing ``window_days``-day window of the SAME entity's
    SUB-THRESHOLD amounts — count and exact cents sum — with the flag
    firing when the current amount is itself sub-threshold, at least
    ``min_parts`` sub-threshold parts land in the window, and their
    joint total clears the threshold a single transaction would have
    tripped. The classic structuring complement to the static band
    screen (``amount_structuring`` finds amounts SHAPED near the
    threshold; this finds amounts SPLIT under it — 31 CFR 1010.314's
    "structured to evade" pattern over time, extending the reference's
    static amount rule at run_pipeline.py:23-25 to the temporal axis).

    Determinism: the RANGE frame is defined on the DAY VALUE (epoch
    days), so same-day ties are symmetric peers on every engine — no
    tiebreaker column needed (the ``velocity_flags`` discipline); all
    window arithmetic is exact integer cents.

    Scale shape: ONE shuffle on the entity key, then a value-range
    window — no time-range self-join (the naive form is |rows|²), no
    driver participation; identical plan at any corpus size."""
    day = F.unix_date(F.col(date_col).cast("date"))
    cents = F.round(F.col(value_col) * 100).cast("long")
    base = df.select(
        F.col(id_col).alias("_id"),
        F.col(key_col).alias("entity"),
        day.alias("day"),
        cents.alias("cents"),
    )
    sub = (F.col("cents") > 0) & (F.col("cents") < threshold_cents)
    w = (
        Window.partitionBy("entity")
        .orderBy("day")
        .rangeBetween(-(window_days - 1), 0)
    )
    n_parts = F.sum(F.when(sub, 1).otherwise(0)).over(w).cast("long")
    sum_sub = F.sum(F.when(sub, F.col("cents")).otherwise(0)).over(w).cast("long")
    return base.select(
        F.col("_id").alias(id_col),
        F.col("entity").alias(key_col),
        "day",
        "cents",
        n_parts.alias("n_parts_window"),
        sum_sub.alias("cents_window"),
        (
            sub
            & (n_parts >= F.lit(min_parts))
            & (sum_sub >= F.lit(threshold_cents))
        ).alias("split_flag"),
    )


def fdr_alert_ranking(
    scores: DataFrame,
    key_col: str,
    z_col: str = "z",
    n_col: str | None = None,
    alpha_num: int = 5,
    alpha_den: int = 100,
) -> DataFrame:
    """Multiple-testing-corrected alert list: Benjamini-Hochberg FDR
    (Benjamini & Hochberg 1995, public) over DISTRIBUTION-FREE
    Cantelli p-bounds. Every fraud screen that thresholds a z-score
    runs one implicit hypothesis test per entity; screening 10⁶
    entities at a fixed |z| cutoff mass-produces false alerts. This
    operator takes any screen's positive z-scores, bounds each tail
    probability without a normality assumption via the one-sided
    Cantelli inequality — P(X − μ ≥ zσ) ≤ 1/(1+z²), or, when the
    score is a MEAN of ``n_col`` independent events (the peer screen's
    shape, Var(mean) = σ²/n), the correspondingly tighter
    1/(1 + n·z²) — a RATIONAL function of the already-pinned z, so it
    is oracle-exact where a normal CDF would be transcendental — and
    keeps the largest prefix of the p-ascending ranking with
    p_(i) ≤ α·i/m (the BH step-up rule), controlling the
    false-discovery rate at α among the fired alerts. On a clean
    uniform ledger the corrected list is typically EMPTY — that is
    the point of FDR control (the raw |z|>3 screen fires ~0.3% of a
    clean book by construction); the pytest fixture plants signal and
    pins the step-up frontier.

    Exactness: p = 1/(1 + n·(z·z)) is a pinned IEEE tree on the
    already-pinned z; the BH comparison is p·(m·α_den) ≤ i·α_num with
    the integer factors exact in doubles (m·α_den < 2⁵³) —
    bit-reproducible on any engine. Ranking is deterministic under
    (p, key) order. The bound is a distribution-free CONSERVATIVE
    p (independence across an entity's events is the peer-model
    assumption, stated, not hidden); the oracle pins the arithmetic.

    Scale shape: the global p-rank uses the repo's range-bucketed
    prefix-sum rank (operators/stats.py::_rank_rows) — never a
    single-partition window; the scalar m and the step-up cutoff
    i* = max{i : hit} are 1-row aggregates broadcast back. Returns
    (key, z, p_bound, bh_rank, fdr_alert) for every positive-z
    candidate, ordered by bh_rank."""
    from .stats import _rank_rows

    n = (
        F.col(n_col).cast("double")
        if n_col is not None
        else F.lit(1.0)
    )
    cand = scores.where(
        F.col(z_col).isNotNull() & (F.col(z_col) > 0)
    ).select(
        F.col(key_col).alias("_k"),
        F.col(z_col).alias("_z"),
        n.alias("_n"),
    )
    p = F.lit(1.0) / (
        F.lit(1.0) + F.col("_n") * (F.col("_z") * F.col("_z"))
    )
    cand = cand.withColumn("_p", p)
    ranked = _rank_rows(cand, "_p", "_k").select(
        F.col("_id").alias("_k"),
        F.col("_v").alias("_p"),
        F.col("_rank").alias("_i"),
    )
    # _rank_rows drops extra columns; re-join z by key (one broadcastable
    # |alerts|-row join — alerts are screen output, not fact rows)
    ranked = ranked.join(cand.select("_k", "_z"), "_k")
    m = cand.agg(F.count(F.lit(1)).cast("long").alias("_m"))
    j = ranked.crossJoin(F.broadcast(m))
    hit = (
        F.col("_p") * (F.col("_m") * F.lit(alpha_den)).cast("double")
        <= (F.col("_i") * F.lit(alpha_num)).cast("double")
    )
    j = j.withColumn("_hit_i", F.when(hit, F.col("_i")))
    istar = j.agg(F.max("_hit_i").alias("_istar"))
    return (
        j.crossJoin(F.broadcast(istar))
        .select(
            F.col("_k").alias(key_col),
            F.col("_z").alias(z_col),
            F.col("_p").alias("p_bound"),
            F.col("_i").alias("bh_rank"),
            F.coalesce(
                F.col("_i") <= F.col("_istar"), F.lit(False)
            ).alias("fdr_alert"),
        )
        .orderBy("bh_rank")
    )


def round_amount_bias(
    df: DataFrame,
    group_col: str,
    value_col: str,
    round_cents: int = 100_00,
) -> DataFrame:
    """Round-number bias screen: per group, the share of amounts that
    are exact multiples of ``round_cents`` (default whole $100), with
    a one-proportion z against the book-wide round rate. Fabricated or
    negotiated-after-the-fact amounts over-represent round numbers
    relative to organically priced ledgers — the last-digits
    complement of the Benford first-digit screen (``benford_profile``)
    in the standard forensic-accounting playbook (Nigrini's
    number-duplication/round-number tests, public literature).

    Exactness: roundness is decided on exact integer cents
    (``round(value*100)`` cast long — the repo's cents quantization),
    so float representation noise (e.g. 1234.00 stored as
    1233.9999...) cannot flip a multiple; counts are exact BIGINTs and
    z is a pinned IEEE tree on those counts, reproduced term-for-term
    by the SQL oracle.

    Scale shape: one scan + one |groups|-row keyed aggregation + a
    1-row global aggregate broadcast back — agg-cheap at any SF, no
    window, no join on data-sized keys."""
    cents = F.round(F.col(value_col) * 100).cast("long")
    per = (
        df.select(F.col(group_col).alias("grp"), cents.alias("_c"))
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(
                F.when(F.col("_c") % round_cents == 0, 1).otherwise(0)
            )
            .cast("long")
            .alias("n_round"),
        )
    )
    return round_amount_bias_from_counts(per)


def round_amount_bias_from_counts(per: DataFrame) -> DataFrame:
    """The z-screen finish of ``round_amount_bias`` on an exact
    (grp, n, n_round) counts frame — factored out because the counts
    are the ADDITIVE sufficient statistic of the whole test, so the
    streaming twin folds them per micro-batch and runs this finish
    once on the drained state (the benford_from_counts discipline);
    sharing one function keeps the pinned IEEE tree identical on both
    paths."""
    tot = per.agg(
        F.sum("n").cast("long").alias("_tn"),
        F.sum("n_round").cast("long").alias("_tr"),
    )
    p0 = F.col("_tr").cast("double") / F.col("_tn").cast("double")
    nd = F.col("n").cast("double")
    z = (F.col("n_round").cast("double") - nd * p0) / F.sqrt(
        nd * p0 * (F.lit(1.0) - p0)
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "grp",
            "n",
            "n_round",
            (F.col("n_round").cast("double") / nd).alias("round_rate"),
            p0.alias("base_rate"),
            z.alias("z"),
            # 99.5% two-sided normal critical value, pinned literal on
            # both engine sides (comparison operand, not statistic).
            (F.abs(z) > F.lit(2.8070337683438042)).alias("biased"),
        )
        .orderBy("grp")
    )


def cross_entity_duplicates(
    events: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    window_s: int = 604800,
    min_entities: int = 2,
) -> DataFrame:
    """Cross-ENTITY duplicate-amount screen (VERDICT r16 item 6) —
    the counterpart of ``duplicate_charges_events``: that screen
    catches the SAME entity replaying an exact amount; this one
    catches SPLIT-IDENTITY replays, where one actor spreads the same
    exact amount across ≥ ``min_entities`` distinct entities inside
    one review window (mule fan-outs, shared-invoice double claims,
    collusive duplicate billing).

    Exact integer cents make the amount equality float-robust; time
    buckets are ``floor(epoch_s / window_s)`` — the 7-day AP review
    window by default — so the whole screen is ONE map-side-combinable
    aggregation at (cents, bucket) grain: count, exact distinct-entity
    count, and the bucket's first/last epoch second. Rows with
    ``n_entities >= min_entities`` surface, ordered by (cents,
    bucket).

    Scale shape at 100 TB: one keyed shuffle on (cents, bucket) — no
    pair join, no window; the distinct-entity count shuffles the
    (cents, bucket, entity)-deduped slice only (Spark plans the
    distinct aggregate with one Expand). Bucketing trades boundary
    pairs for linearity (a pair straddling two buckets is missed —
    the documented cost of the agg form; the per-entity screen's
    exact lag form complements it)."""
    cents = F.round(F.col(value_col) * 100).cast("long")
    epoch = F.floor(F.unix_timestamp(F.col(ts_col))).cast("long")
    b = events.select(
        F.col(entity_col).alias("_ent"),
        cents.alias("cents"),
        epoch.alias("_s"),
    )
    return (
        b.groupBy(
            "cents", (F.col("_s") - (F.col("_s") % window_s)).alias("win_start_s")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.count_distinct(F.col("_ent")).cast("long").alias("n_entities"),
            F.min("_s").cast("long").alias("first_s"),
            F.max("_s").cast("long").alias("last_s"),
        )
        .where(F.col("n_entities") >= min_entities)
        .orderBy("cents", "win_start_s")
    )


def cross_entity_duplicates_offset(
    events: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    window_s: int = 604800,
    min_entities: int = 2,
) -> DataFrame:
    """Two-grid variant of :func:`cross_entity_duplicates` (VERDICT
    r17 item 3) — closes the documented boundary miss: the single
    fixed ``floor(epoch/window)`` grid drops any duplicate pair that
    straddles a bucket edge. This form buckets every event on TWO
    grids — grid 0 at the canonical phase, grid 1 shifted by
    ``window_s / 2`` — so any two events within ``window_s / 2`` of
    each other are GUARANTEED to share a bucket on at least one grid
    (an event at offset o into a grid-0 window is ≥ window/2 from the
    nearer edge of its grid-1 window whenever it was < window/2 from
    a grid-0 edge, and vice versa — the standard two-offset covering
    argument).

    Shape: each event expands map-side into its two (grid,
    win_start_s) cells — ``win_start_s`` is the window's TRUE start in
    epoch seconds on either grid — then ONE keyed aggregation at
    (grid, cents, win_start_s) grain, exactly the base screen's plan
    with 2× the map rows; still no pair join, no window function,
    linear at any SF. Flagged cells carry their grid so reviewers can
    dedupe overlapping alerts.
    """
    half = window_s // 2
    cents = F.round(F.col(value_col) * 100).cast("long")
    epoch = F.floor(F.unix_timestamp(F.col(ts_col))).cast("long")
    b = events.select(
        F.col(entity_col).alias("_ent"),
        cents.alias("cents"),
        epoch.alias("_s"),
    )
    two = b.select(
        "_ent",
        "cents",
        "_s",
        F.explode(F.array(F.lit(0), F.lit(1))).alias("grid"),
    )
    win_start = F.col("_s") - ((F.col("_s") + F.col("grid") * half) % window_s)
    return (
        two.groupBy("grid", "cents", win_start.alias("win_start_s"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.count_distinct(F.col("_ent")).cast("long").alias("n_entities"),
            F.min("_s").cast("long").alias("first_s"),
            F.max("_s").cast("long").alias("last_s"),
        )
        .where(F.col("n_entities") >= min_entities)
        .orderBy("cents", "win_start_s", "grid")
    )


#: Default per-(prev_type, curr_type) minimum-plausible-gap floors for
#: :func:`impossible_velocity`, in seconds. Any transition not listed
#: falls back to the caller's ``default_floor_s``. The values encode
#: process physics, not statistics: an account cannot complete a
#: purchase 10 s after signing up (KYC/payment entry takes longer), two
#: signups by one entity within a day are re-registration abuse, and
#: back-to-back purchases inside 15 s are faster than any checkout
#: flow — the card-testing signature.
DEFAULT_VELOCITY_FLOORS_S: dict[tuple[str, str], int] = {
    ("signup", "purchase"): 30,
    ("signup", "signup"): 86400,
    ("view", "purchase"): 10,
    ("click", "purchase"): 10,
    ("purchase", "purchase"): 15,
}


def impossible_velocity(
    events: DataFrame,
    entity_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    floors: dict[tuple[str, str], int] | None = None,
    default_floor_s: int = 1,
) -> DataFrame:
    """Impossible-velocity screen (VERDICT r17 item 6a) — the TIMING
    analogue of ``duplicate_charges``: that screen flags the same
    amount repeating too soon; this one flags consecutive same-entity
    events arriving FASTER than the named process allows, regardless
    of amount. Each (previous type → current type) transition carries
    a minimum-plausible-gap floor (``DEFAULT_VELOCITY_FLOORS_S``;
    unlisted transitions fall back to ``default_floor_s``, default 1 s
    — two events by one entity inside the same second are automation,
    whatever their types). Events whose gap to the entity's
    immediately preceding event is strictly below the floor surface
    with both endpoints.

    Shape: ONE entity-keyed lag window (epoch_s with the unique
    event_id tiebreaker, the window discipline) + one BROADCAST join
    against the |floors|-row transition table — no self-join, no
    range join; identical plan at any SF.
    """
    fl = DEFAULT_VELOCITY_FLOORS_S if floors is None else floors
    spark = events.sparkSession
    floors_df = spark.createDataFrame(
        [(p, c, int(s)) for (p, c), s in sorted(fl.items())],
        "prev_type string, curr_type string, floor_s long",
    )
    b = events.select(
        "event_id",
        F.col(entity_col).alias("_ent"),
        F.col(type_col).alias("_ty"),
        F.floor(F.unix_timestamp(F.col(ts_col))).cast("long").alias("epoch_s"),
    )
    w = Window.partitionBy("_ent").orderBy("epoch_s", "event_id")
    lagged = b.select(
        "event_id",
        "_ent",
        "_ty",
        "epoch_s",
        F.lag("event_id").over(w).alias("prev_event_id"),
        F.lag("_ty").over(w).alias("prev_type"),
        F.lag("epoch_s").over(w).alias("prev_s"),
    )
    joined = lagged.join(
        F.broadcast(floors_df),
        (lagged["prev_type"] == floors_df["prev_type"])
        & (lagged["_ty"] == floors_df["curr_type"]),
        "left",
    ).select(
        lagged["event_id"],
        lagged["_ent"],
        lagged["prev_event_id"],
        lagged["prev_type"],
        lagged["_ty"],
        lagged["prev_s"],
        lagged["epoch_s"],
        F.coalesce(floors_df["floor_s"], F.lit(int(default_floor_s)).cast("long")).alias(
            "floor_s"
        ),
    )
    gap = F.col("epoch_s") - F.col("prev_s")
    return (
        joined.where(F.col("prev_s").isNotNull() & (gap < F.col("floor_s")))
        .select(
            "event_id",
            F.col("_ent").alias(entity_col),
            "prev_event_id",
            "prev_type",
            F.col("_ty").alias("curr_type"),
            "prev_s",
            "epoch_s",
            gap.alias("gap_s"),
            "floor_s",
        )
        .orderBy("event_id")
    )


def spending_mix_drift(
    events: DataFrame,
    entity_col: str = "user_id",
    category_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    drift_threshold: float = 0.25,
    min_base_events: int = 5,
) -> DataFrame:
    """Per-entity spending-MIX drift screen (VERDICT r17 item 6b) —
    composes the :func:`hhi_concentration` statistic with the
    snapshot-diff discipline: each entity's category HHI over its
    CURRENT period's spend (the data's last ISO week, found by one
    broadcast 1-row max — the batch-epoch discipline) against the
    same entity's OWN trailing baseline (all prior weeks pooled). An
    account whose mix concentration jumps — a spread organic history
    collapsing into one category, or vice versa — changed hands or
    purpose; absolute HHI alone can't see it because some users are
    legitimately concentrated. The period is the WEEK (not month)
    because review cadence should be shorter than the fraud it hunts;
    it also means any ≥ 2-week ledger exercises the screen.

    Exactness: spend shares use exact integer cents; Σcᵢ² accumulates
    in decimal(38,0), ONE IEEE division per (entity, slice), so
    hhi_cur/hhi_base/drift are bit-reproducible across engines (the
    hhi_concentration discipline); the flag compares those pinned
    doubles against the threshold literal. Entities with zero-total
    slices get NULL hhi (explicit guard, no inf); ``decided`` is
    FALSE for entities new this period, with a thin baseline
    (< ``min_base_events``), or with a zero-total slice, and
    ``drift_flag`` is then FALSE too (both flags non-null — an
    undecidable entity is explicitly not-flagged, never
    silently-flagged).

    Shape: one (entity, slice, category)-keyed map-side-combinable
    agg, one roll-up to (entity, slice), then a |entities|-row
    self-join of the two slices — no window, no data-sized join.
    """
    period = F.date_trunc("week", F.col(ts_col))
    cents = F.round(F.col(value_col) * 100).cast("long")
    b = events.select(
        F.col(entity_col).alias("_e"),
        F.col(category_col).alias("_c"),
        period.alias("_m"),
        cents.alias("_v"),
    ).where(F.col("_e").isNotNull() & F.col("_c").isNotNull() & F.col("_m").isNotNull())
    maxm = b.agg(F.max("_m").alias("_maxm"))
    per = (
        b.crossJoin(F.broadcast(maxm))
        .select("_e", "_c", "_v", (F.col("_m") == F.col("_maxm")).alias("_cur"))
        .groupBy("_e", "_cur", "_c")
        .agg(F.sum("_v").cast("long").alias("_cv"), F.count(F.lit(1)).cast("long").alias("_cn"))
    )
    return mix_drift_from_cells(
        per, entity_col, drift_threshold, min_base_events
    )


def mix_drift_from_cells(
    per: DataFrame,
    entity_col: str = "user_id",
    drift_threshold: float = 0.25,
    min_base_events: int = 5,
) -> DataFrame:
    """The spending-mix drift FINISH over (_e, _cur, _c, _cv, _cn)
    slice cells — the screen's mergeable sufficient statistic (cents
    and counts are additive per cell). Shared verbatim by the batch
    screen and the streaming twin (streaming/jobs.py::
    stream_spending_mix_drift) so the two paths carry the identical
    pinned expression tree — the benford_from_counts discipline."""
    ent = per.groupBy("_e", "_cur").agg(
        F.sum("_cn").cast("long").alias("_n"),
        F.count(F.lit(1)).cast("long").alias("_ncat"),
        F.sum("_cv").cast("long").alias("_tot"),
        F.sum(F.col("_cv").cast("decimal(38,0)") * F.col("_cv").cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("_ss"),
    )

    def _hhi(ss, tot):
        t2 = tot.cast("decimal(38,0)") * tot.cast("decimal(38,0)")
        return F.when(tot != 0, ss.cast("double") / t2.cast("double"))

    cur = ent.where(F.col("_cur")).select(
        F.col("_e"),
        F.col("_n").alias("n_cur"),
        F.col("_ncat").alias("n_categories_cur"),
        F.col("_tot").alias("cents_cur"),
        _hhi(F.col("_ss"), F.col("_tot")).alias("hhi_cur"),
    )
    base = ent.where(~F.col("_cur")).select(
        F.col("_e").alias("_eb"),
        F.col("_n").alias("n_base"),
        F.col("_ncat").alias("n_categories_base"),
        F.col("_tot").alias("cents_base"),
        _hhi(F.col("_ss"), F.col("_tot")).alias("hhi_base"),
    )
    j = cur.join(base, cur["_e"] == base["_eb"], "left").drop("_eb")
    drift = F.col("hhi_cur") - F.col("hhi_base")
    decided = (
        F.col("hhi_cur").isNotNull()
        & F.col("hhi_base").isNotNull()
        & (F.coalesce(F.col("n_base"), F.lit(0)) >= min_base_events)
    )
    return j.select(
        F.col("_e").alias(entity_col),
        "n_cur",
        "n_categories_cur",
        "cents_cur",
        "hhi_cur",
        "n_base",
        "n_categories_base",
        "cents_base",
        "hhi_base",
        drift.alias("hhi_drift"),
        decided.alias("decided"),
        (decided & (F.abs(drift) >= F.lit(float(drift_threshold)))).alias(
            "drift_flag"
        ),
    ).orderBy(entity_col)
