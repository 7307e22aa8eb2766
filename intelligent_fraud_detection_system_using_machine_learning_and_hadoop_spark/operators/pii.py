"""PII detection and redaction over a text corpus.

Training-data-pipeline extension (the reference — ref scripts/
run_pipeline.py — has no text-curation surface): the scrub step every
production pretraining corpus runs before export. Pure JVM column
expressions — ``regexp_count`` / ``regexp_replace`` inside whole-stage
codegen, zero shuffles, no Python — so the op is a linear map at any
corpus size.

Pattern dialect note: the patterns below restrict themselves to the
regex intersection supported identically by Java's engine (Spark),
RE2 (DuckDB oracle), and Python's ``re`` (tests): character classes,
bounded repetition, ``\\b`` word boundaries, ASCII ``\\d``. No
lookaround, no backreferences — those diverge across engines and are
unnecessary for these shapes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Detection patterns, ordered; redaction applies them in this order so
#: e.g. an e-mail is redacted before its domain could half-match
#: another rule. Keys double as redaction placeholders: ``[EMAIL]`` etc.
PII_PATTERNS: dict[str, str] = {
    "email": r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\b\d{3}[- ]\d{3}[- ]\d{4}\b",
    "card": r"\b\d{16}\b",
}


def pii_counts(text_col: Column) -> dict[str, Column]:
    """Per-kind occurrence counts as JVM ``regexp_count`` columns."""
    return {
        f"n_{kind}": F.regexp_count(text_col, F.lit(pat)).cast("long")
        for kind, pat in PII_PATTERNS.items()
    }


def redact_pii(text_col: Column) -> Column:
    """Replace every PII occurrence with its ``[KIND]`` placeholder.
    One chained ``regexp_replace`` per pattern — Catalyst folds the
    chain into a single projection, still one pass over the corpus."""
    out = text_col
    for kind, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, f"[{kind.upper()}]")
    return out


def with_pii_scan(
    df: DataFrame, text_col: str = "text", redacted_col: str = "redacted"
) -> DataFrame:
    """Append per-kind counts, a ``has_pii`` flag, and the redacted
    text. Detection and redaction share one projection; the original
    text column is preserved untouched."""
    counts = pii_counts(F.col(text_col))
    has = None
    for c in counts.values():
        has = c > 0 if has is None else has | (c > 0)
    return df.select(
        "*",
        *[c.alias(n) for n, c in counts.items()],
        has.alias("has_pii"),
        redact_pii(F.col(text_col)).alias(redacted_col),
    )
