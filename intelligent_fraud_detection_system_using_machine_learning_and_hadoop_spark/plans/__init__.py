from .catalog import REGISTRY, queries, oracle_sql, bench_queries
from . import data_ops  # noqa: F401  (registers data-pipeline queries)
from . import func_ops  # noqa: F401  (registers scalar-function families)
from . import join_ops  # noqa: F401  (registers as-of/range/interval joins)
from . import ml_ops  # noqa: F401  (registers ML + streaming queries)

__all__ = ["REGISTRY", "queries", "oracle_sql", "bench_queries"]
