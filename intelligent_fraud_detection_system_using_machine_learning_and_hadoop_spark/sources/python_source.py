"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API): a
deterministic synthetic claims generator.

The reference ingests claims only from CSV uploads (ref app.py:13-18,
scripts/run_pipeline.py:17); a Spark-native engine additionally wants a
SOURCE-API seam — the public Python DataSource interface added in Spark
4 — so load-testing, demos, and CI can `spark.read.format(...)` a
reproducible claims table of any size with no files at all. This is
the same extension point a production deployment uses to hang a REST
paginator or an internal catalog off `spark.read`.

Scale shape: the generator implements `partitions()`, so Spark plans
one task per partition and each executor synthesizes ONLY its slice —
row `i` of partition `p` is a pure function of (seed, p, i) via md5,
no RNG state, no driver materialization. A billion-row synthetic load
test is `options(rows=1e9, partitions=2048)`.
"""

from __future__ import annotations

import hashlib
from datetime import date, timedelta

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    DateType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

CLAIMS_SCHEMA = StructType(
    [
        StructField("Name", StringType()),
        StructField("Aadhaar", LongType()),
        StructField("ClaimAmount", IntegerType()),
        StructField("SubsidyType", StringType()),
        StructField("Date", DateType()),
    ]
)

_SUBSIDIES = ["Education", "Farming", "Housing", "LPG", "Equipment", "Healthcare"]


def _u64(*parts) -> int:
    h = hashlib.md5(":".join(str(p) for p in parts).encode()).hexdigest()
    return int(h[:16], 16)


class _ClaimsPartition(InputPartition):
    def __init__(self, pid: int, start: int, end: int, seed: int):
        self.pid, self.start, self.end, self.seed = pid, start, end, seed


class SyntheticClaimsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = max(1, int(options.get("partitions", 8)))
        self.seed = int(options.get("seed", 0))

    def partitions(self):
        per = -(-self.n_rows // self.n_parts)  # ceil
        return [
            _ClaimsPartition(p, p * per, min((p + 1) * per, self.n_rows), self.seed)
            for p in range(self.n_parts)
            if p * per < self.n_rows
        ]

    def read(self, partition):
        epoch = date(2024, 1, 1)
        seed = partition.seed
        for i in range(partition.start, partition.end):
            u = _u64(seed, i)
            # ~2% of rows route to a small hot pool of repeat filers
            # (~1% of all holders each filing ~2 claims — frequent-
            # claims rule fodder); every other row gets a unique
            # holder. Ids are 12-digit like the reference's Aadhaar.
            if u % 50 == 0:
                holder = u % (self.n_rows // 100 + 1)
            else:
                holder = self.n_rows + i
            aadhaar = 100000000000 + _u64(seed, "id", holder) % 899999999999
            amount = 500 + _u64(seed, "amt", i) % 499500
            yield (
                f"Holder{holder}",
                aadhaar,
                int(amount),
                _SUBSIDIES[_u64(seed, "sub", i) % len(_SUBSIDIES)],
                epoch + timedelta(days=int(_u64(seed, "d", i) % 365)),
            )


class SyntheticClaimsDataSource(DataSource):
    """`spark.read.format("synthetic_claims")` after
    `spark.dataSource.register(SyntheticClaimsDataSource)`."""

    @classmethod
    def name(cls):
        return "synthetic_claims"

    def schema(self):
        return CLAIMS_SCHEMA

    def reader(self, schema):
        return SyntheticClaimsReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(SyntheticClaimsDataSource)
