"""Explicit schemas for the engine's primary tables.

The reference infers everything via ``pd.read_csv``
(reference ``scripts/run_pipeline.py:17``, ``train.py:11``); a
production engine declares schemas so CSV/Parquet scans never pay an
inference pass and Catalyst can prune/push down against known types.
Column semantics per SURVEY.md §1.2.
"""

from __future__ import annotations

from pyspark.sql import types as T

#: Claims input table (reference ``app.py:52`` documents the expected header
#: ``Name, Aadhaar, ClaimAmount, SubsidyType, Date``).
CLAIMS_SCHEMA = T.StructType(
    [
        T.StructField("Name", T.StringType(), nullable=False),
        # 12-digit national ID exceeds int32 → LongType.
        T.StructField("Aadhaar", T.LongType(), nullable=False),
        T.StructField("ClaimAmount", T.LongType(), nullable=False),
        T.StructField("SubsidyType", T.StringType(), nullable=False),
        T.StructField("Date", T.DateType(), nullable=False),
    ]
)

#: Labeled evaluation table mirroring the reference's
#: ``data/raw/simulated_subsidy_claims_10k.csv`` (FraudLabel is read by no
#: reference code — evaluation only).
CLAIMS_LABELED_SCHEMA = T.StructType(
    CLAIMS_SCHEMA.fields + [T.StructField("FraudLabel", T.IntegerType(), nullable=True)]
)

#: Scored output table (reference ``scripts/run_pipeline.py:82-88``).
SCORED_SCHEMA = T.StructType(
    [
        T.StructField("Name", T.StringType(), nullable=False),
        T.StructField("Aadhaar", T.LongType(), nullable=False),
        T.StructField("ClaimAmount", T.LongType(), nullable=False),
        T.StructField("SubsidyType", T.StringType(), nullable=False),
        T.StructField("Date", T.StringType(), nullable=False),  # yyyy-MM-dd formatted
        T.StructField("RuleFraud", T.StringType(), nullable=False),
        T.StructField("MLFraud", T.StringType(), nullable=False),
        T.StructField("ReconstructionError", T.DoubleType(), nullable=True),
        T.StructField("FraudType", T.StringType(), nullable=False),
    ]
)

#: Driver testdata tables (TPC-H-ish; parquet is self-describing so these
#: names are for catalog convenience, not enforced redeclaration).
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
