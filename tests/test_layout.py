"""Z-order layout operator (operators/layout.py): interleave
correctness and the multi-dimensional locality property that justifies
it at scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.layout import (
    write_zordered,
    zorder_key,
)


def _morton_py(x: int, y: int, bits: int = 10) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_key_matches_reference_bit_interleave(spark):
    import numpy as np

    rng = np.random.RandomState(21)
    pts = [(int(a), int(b)) for a, b in rng.randint(0, 1024, size=(300, 2))]
    df = spark.createDataFrame(pts, "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select(
            "x", "y", zorder_key(F.col("x"), F.col("y")).alias("z")
        ).collect()
    }
    for (x, y), z in got.items():
        assert z == _morton_py(x, y)


def test_zordered_write_gives_tight_2d_envelopes(spark, tmp_path):
    """Each z-range-partitioned file must cover a small 2-D box: the
    mean per-file envelope area should be far below the full domain
    (for an unclustered random layout every file's envelope is ~the
    whole domain). This is the property that makes parquet min/max
    stats prune on either dimension."""
    import numpy as np

    rng = np.random.RandomState(5)
    n, side = 20_000, 256
    pts = [(int(a), int(b)) for a, b in rng.randint(0, side, size=(n, 2))]
    df = spark.createDataFrame(pts, "x long, y long").repartition(8)

    out = str(tmp_path / "zordered")
    write_zordered(df, out, F.col("x"), F.col("y"), n_files=16, bits=8)

    back = spark.read.parquet(out).withColumn(
        "file", F.input_file_name()
    )
    env = (
        back.groupBy("file")
        .agg(
            (F.max("x") - F.min("x")).alias("dx"),
            (F.max("y") - F.min("y")).alias("dy"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    assert sum(r["n"] for r in env) == n
    domain_area = side * side
    mean_area = sum((r["dx"] + 1) * (r["dy"] + 1) for r in env) / len(env)
    # 16 z-range files over a 2-D uniform domain → each covers ~1/16 of
    # the area (plus boundary slack); random layout would give ~1.0
    assert mean_area < 0.25 * domain_area


def test_zonemap_prune_report(spark):
    from pyspark.sql import functions as F

    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.layout import (
        zonemap_prune_report,
    )

    # 3 buckets under 'sorted': [0..9], [10..19], [20..29]; cutoff 20
    # prunes buckets 0 and 1 entirely. 'shuffled' interleaves values so
    # every bucket's max >= 20 -> nothing prunes.
    df = spark.createDataFrame([(i,) for i in range(30)], "v long")
    rep = {
        r["layout"]: r
        for r in zonemap_prune_report(
            df,
            {
                "sorted": F.expr("v div 10"),
                "shuffled": F.expr("v % 3"),
            },
            F.col("v"),
            20,
        ).collect()
    }
    s, h = rep["sorted"], rep["shuffled"]
    assert (s["n_buckets"], s["n_pruned_buckets"]) == (3, 2)
    assert (s["rows_total"], s["rows_pruned"], s["rows_matching"]) == (30, 20, 10)
    assert s["prune_fraction"] == 20.0 / 30.0
    assert (h["n_pruned_buckets"], h["rows_pruned"]) == (0, 0)
    assert h["rows_matching"] == 10  # results identical across layouts


def test_zordered_write_concentrates_selective_reads(spark, tmp_path):
    """Physical evidence for the zone-map story: the same rows written
    (a) round-robin and (b) date-range-clustered; a selective date
    predicate must touch a small fraction of the clustered layout's
    files (measured via input_file_name), while the arrival layout
    scatters it across ~all files."""
    from pyspark.sql import functions as F

    n = 5000
    df = spark.range(n).select(
        F.col("id"),
        F.date_add(F.lit("2020-01-01").cast("date"), (F.col("id") % 1000).cast("int")).alias("d"),
    )
    arrival = str(tmp_path / "arrival")
    clustered = str(tmp_path / "clustered")
    df.repartition(16).write.parquet(arrival)
    df.repartitionByRange(16, "d").sortWithinPartitions("d").write.parquet(clustered)

    cutoff = "2022-06-01"  # selects ~10% of the date range

    def files_touched(path):
        got = (
            spark.read.parquet(path)
            .where(F.col("d") >= F.lit(cutoff).cast("date"))
            .select(F.input_file_name().alias("f"))
            .distinct()
            .count()
        )
        total = (
            spark.read.parquet(path)
            .select(F.input_file_name().alias("f"))
            .distinct()
            .count()
        )
        return got, total

    a_got, a_total = files_touched(arrival)
    c_got, c_total = files_touched(clustered)
    # arrival: matching rows live in EVERY file; clustered: a thin tail
    assert a_got == a_total
    assert c_got <= max(2, c_total // 4)
    # identical answers regardless of layout
    cnt = lambda p: spark.read.parquet(p).where(
        F.col("d") >= F.lit(cutoff).cast("date")
    ).count()
    assert cnt(arrival) == cnt(clustered)
