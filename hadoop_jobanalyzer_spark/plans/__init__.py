"""The registered query surface (driver correctness gate + bench queries)."""

from hadoop_jobanalyzer_spark.plans.registry import QUERIES, load_tables, oracle_sql, queries

__all__ = ["QUERIES", "load_tables", "oracle_sql", "queries"]
