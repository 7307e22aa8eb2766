"""Importance-resampling data selection (DSIR-style).

Training-data-pipeline extension modeled on Xie et al. 2023, "Data
Selection for Language Models via Importance Resampling" (DSIR): score
every raw document by how much more likely its hashed-token features
are under a TARGET distribution (e.g. curated/wiki-like text) than
under the RAW corpus distribution, then keep the top-scoring subset.
The reference repo (a pandas fraud scorer) has no selection surface;
this composes the engine's tokenizer, the engine-portable md5 bucket
(operators/packing.py::md5_bucket) and the quantized-integer scoring
discipline used across the catalog.

Scale shape: features are hashed into ``n_buckets`` buckets, so the
two "language models" are ONE ``n_buckets``-row table (raw + target
counts side by side, aggregated map-side-combined from the exploded
token stream) that broadcast-joins back onto the per-document bucket
counts. Shuffles: (doc, bucket) partial counts, then the per-doc score
roll-up — both keyed by doc_id-dominated keys; the corpus is never
joined to itself and nothing driver-side grows with corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .packing import md5_bucket
from .text import tokens

#: Quantization unit for the per-bucket probability ratio: ratios are
#: floored to integer 1e-6 units so per-document scores are exact
#: BIGINT dot products (order-independent on any partitioning).
_Q = 1e6


def dsir_scores(
    docs: DataFrame,
    target: Column,
    n_buckets: int = 1024,
    log_weights: bool = True,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document importance score of ``docs`` toward the subset
    selected by the boolean column ``target`` (the target distribution
    is estimated from those rows; the raw distribution from all rows).

    Per-bucket add-one-smoothed probabilities:
    p[b] = (cnt[b] + 1) / (total + n_buckets).

    ``log_weights=True`` (default, the DSIR paper's estimator): score =
    Σ_b c_b · (ln p_t[b] − ln p_r[b]) — the log importance weight of
    the document's hashed-unigram bag. ln is transcendental, so this
    path is pinned by differential pytest, not a SQL oracle.

    ``log_weights=False`` (the oracle-parity twin): score =
    Σ_b c_b · floor(1e6 · p_t[b]/p_r[b]) / 1e6 — the linear ratio sum.
    Every operation is IEEE +,−,×,/ on exact operands plus one floor,
    so the score is bit-reproducible against DuckDB. It is a different
    (but monotone-per-bucket) importance proxy, not the paper's log
    weight — use it where cross-engine attestation matters more than
    estimator fidelity.

    Returns (id, is_target, n_tokens, score).
    """
    toks = (
        docs.select(
            F.col(id_col).alias("_id"),
            target.alias("is_target"),
            F.explode(tokens(F.lower(F.col(text_col)))).alias("_tok"),
        )
        .select("_id", "is_target", md5_bucket(F.col("_tok"), n_buckets).alias("_b"))
    )
    dc = toks.groupBy("_id", "is_target", "_b").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    bt = dc.groupBy("_b").agg(
        F.sum("c").cast("long").alias("cr"),
        F.sum(F.when(F.col("is_target"), F.col("c")).otherwise(0))
        .cast("long")
        .alias("ct"),
    )
    tot = bt.agg(
        F.sum("cr").cast("long").alias("total_r"),
        F.sum("ct").cast("long").alias("total_t"),
    )
    p_t = (F.col("ct") + 1).cast("double") / (
        F.col("total_t") + F.lit(n_buckets)
    ).cast("double")
    p_r = (F.col("cr") + 1).cast("double") / (
        F.col("total_r") + F.lit(n_buckets)
    ).cast("double")
    if log_weights:
        weight = (F.log(p_t) - F.log(p_r)).alias("w")
        score = F.sum(F.col("c") * F.col("w")).alias("score")
    else:
        weight = F.floor((p_t / p_r) * F.lit(_Q)).cast("long").alias("w")
        score = (
            F.sum(F.col("c") * F.col("w")).cast("long").cast("double") / F.lit(_Q)
        ).alias("score")
    lm = bt.crossJoin(F.broadcast(tot)).select("_b", weight)
    return (
        dc.join(F.broadcast(lm), "_b")
        .groupBy("_id", "is_target")
        .agg(F.sum("c").cast("long").alias("n_tokens"), score)
        .select(
            F.col("_id").alias(id_col), "is_target", "n_tokens", "score"
        )
    )


def dsir_select(
    docs: DataFrame,
    target: Column,
    k: int,
    n_buckets: int = 1024,
    log_weights: bool = True,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Keep the ``k`` highest-importance documents (ties by ascending
    id so the selection is deterministic). TakeOrderedAndProject — a
    per-partition heap of k, never a global sort."""
    s = dsir_scores(
        docs,
        target,
        n_buckets=n_buckets,
        log_weights=log_weights,
        id_col=id_col,
        text_col=text_col,
    )
    return s.orderBy(F.desc("score"), F.asc(id_col)).limit(k)
