"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual catalog lives in
``intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark/plans/``;
this module only adapts it to the driver contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark import (  # noqa: E402
    plans,
)
from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.rules import (  # noqa: E402
    score_claims,
)
from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.plans.catalog import (  # noqa: E402
    ORDERS_RULES,
)
from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.sources.readers import (  # noqa: E402
    read_table,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's full
    fraud-scoring pipeline (4 rules + verdict combination) over orders."""
    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.cache import (
        release_caches,
    )

    orders = read_table(spark, "/root/testdata/sf0.001", "orders")
    scored = score_claims(orders, ORDERS_RULES)
    # long-lived-session hygiene: drop any swap-cache registrations made
    # during plan construction (the returned plan recomputes them
    # correctly — row keys are content-deterministic since r8)
    release_caches()
    return scored.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        "RuleFraud",
        "MLFraud",
        "FraudType",
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return plans.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twins (omitted for non-SQL-expressible ops)."""
    return plans.oracle_sql()
