"""Sinks (SURVEY.md §2.1 S5–S6).

The reference writes one local CSV via ``to_csv`` (``scripts/
run_pipeline.py:88``, ``train.py:101``). ``write_csv_single`` reproduces
the single-file contract for UI-sized outputs; ``write_parquet`` is the
scale path (partitioned columnar, predicate-pushdown-able on re-read).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_csv_single(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Single-file CSV sink (reference parity; driver-sized outputs only).

    ``coalesce(1)`` funnels through one task — deliberate for a
    UI-download artifact, wrong for bulk output (use ``write_parquet``).
    """
    (
        df.coalesce(1)
        .write.mode(mode)
        .option("header", True)
        .option("dateFormat", "yyyy-MM-dd")
        .csv(path)
    )


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Columnar bulk sink; ``partition_by`` enables partition pruning on scan."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 16,
    path: str | None = None,
    sort_cols: list[str] | None = None,
) -> None:
    """Bucketed (hash-pre-partitioned) table: joins and aggregations on
    the bucket columns between tables with matching bucketing read
    straight into sort-merge join with NO exchange — the shuffle is
    paid once at write time, amortized over every subsequent query.
    The at-scale answer to "this join runs every hour on the same keys".

    Registers ``table`` in the session catalog; ``path`` makes it an
    external table (data outlives the catalog entry).
    """
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines sink (interchange format; parquet remains the scale
    path — JSON pays ~10× on size and parse)."""
    df.write.mode(mode).option("dateFormat", "yyyy-MM-dd").json(path)
