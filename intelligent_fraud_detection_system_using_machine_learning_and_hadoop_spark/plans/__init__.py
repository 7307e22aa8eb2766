from .catalog import REGISTRY, queries, oracle_sql, bench_queries

__all__ = ["REGISTRY", "queries", "oracle_sql", "bench_queries"]
