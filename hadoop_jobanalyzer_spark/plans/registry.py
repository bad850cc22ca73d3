"""Unified query registry: name -> (spark builder, optional DuckDB oracle).

This is the surface `__spark_entry__.py` exposes to the driver. Queries with
``oracle=None`` are non-SQL-expressible (the driver records a rows-only
check for those).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from hadoop_jobanalyzer_spark.plans.core_queries import CORE_QUERIES
from hadoop_jobanalyzer_spark.plans.tables import load_tables

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, tuple[QueryFn, str | None]] = {}
QUERIES.update(CORE_QUERIES)

try:  # pipeline queries (dedup/similarity/text/multimodal) — added as built
    from hadoop_jobanalyzer_spark.plans.pipeline_queries import PIPELINE_QUERIES

    QUERIES.update(PIPELINE_QUERIES)
except ImportError:  # pragma: no cover
    pass

try:  # extended queries (clustering, sampling, pivots, windows)
    from hadoop_jobanalyzer_spark.plans.extended_queries import EXTENDED_QUERIES

    QUERIES.update(EXTENDED_QUERIES)
except ImportError:  # pragma: no cover
    pass


def queries() -> dict[str, QueryFn]:
    return {name: fn for name, (fn, _) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in QUERIES.items() if sql is not None}


__all__ = ["QUERIES", "queries", "oracle_sql", "load_tables"]
