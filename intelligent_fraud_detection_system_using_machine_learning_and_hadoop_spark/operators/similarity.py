"""Embedding similarity search: brute-force cosine top-k (exact
baseline) and LSH-bucketed ANN (scale path).

Training-data-pipeline extensions (BASELINE.json north star). The
vector math stays JVM-side via higher-order functions (zip_with /
aggregate fold) — no Python in the row path; folds are sequential and
deterministic, which the DuckDB oracle mirrors.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm_sq(a):
    return F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 3,
) -> DataFrame:
    """Exact brute-force cosine top-k per query.

    queries is small → broadcast; the corpus is scanned once, scores
    fold JVM-side, and per-query top-k is a window row_number (at real
    scale: replace the window with repartition-by-query + mapPartitions
    heap, or cut the scan with the LSH variant below). Scores are
    rounded to 6 decimals *before* ranking so ordering is reproducible
    across engines; vec_id breaks remaining ties.
    """
    v = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("norm_sq", _norm_sq(F.col("v")))
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).withColumn("qnorm_sq", _norm_sq(F.col("qv")))
    scored = (
        v.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "cos_sim",
            F.round(
                _dot(F.col("v"), F.col("qv"))
                / (F.sqrt(F.col("norm_sq")) * F.sqrt(F.col("qnorm_sq"))),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "vec_id", "cos_sim", F.col("rn").cast("long").alias("rank"))
    )


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes for sign-LSH."""
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_bucket_expr(vec_col, planes: list[list[float]]):
    """Sign-LSH bucket id: bit b = sign(v · plane_b). Charikar '02 —
    collision prob = 1 - angle/π per bit."""
    bits = []
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        bits.append(
            F.when(_dot(vec_col, p) > 0, F.lit(1 << i)).otherwise(F.lit(0))
        )
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket + b
    return bucket.cast("long")


def lsh_cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 3,
    n_planes: int = 8,
    dim: int = 64,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """ANN cosine top-k: multi-table sign-LSH candidate generation, then
    exact rerank of candidates only.

    With T tables of b planes, a neighbor at angle θ is recalled with
    prob 1-(1-(1-θ/π)^b)^T. Only same-bucket pairs join — the corpus
    partitions by (table, bucket), so at 100 TB the join touches
    ~corpus/2^b rows per query per table instead of the full scan.
    """
    tables = [
        random_hyperplanes(dim, n_planes, seed + t * 1000) for t in range(n_tables)
    ]

    def with_buckets(df, idc, vc):
        cols = [
            F.struct(
                F.lit(t).alias("tbl"), lsh_bucket_expr(F.col(vc), tables[t]).alias("bucket")
            )
            for t in range(n_tables)
        ]
        return df.select(
            F.col(idc), F.col(vc), F.explode(F.array(*cols)).alias("tb")
        ).select(idc, vc, F.col("tb.tbl").alias("tbl"), F.col("tb.bucket").alias("bucket"))

    v = vectors.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    vb = with_buckets(v, "vec_id", "v")
    qb = with_buckets(q, "query_id", "qv")
    candidates = (
        vb.join(F.broadcast(qb), ["tbl", "bucket"])
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "qv", "vec_id", "v")
        .distinct()
    )
    scored = candidates.withColumn(
        "cos_sim",
        F.round(
            _dot(F.col("v"), F.col("qv"))
            / (F.sqrt(_norm_sq(F.col("v"))) * F.sqrt(_norm_sq(F.col("qv")))),
            6,
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "vec_id", "cos_sim", F.col("rn").cast("long").alias("rank"))
    )
