"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

The real surface lives in ``hadoop_jobanalyzer_spark.plans`` — this module
only adapts it to the driver's interface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hadoop_jobanalyzer_spark.plans import registry as _registry  # noqa: E402

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: multi-way broadcast join + exact-decimal aggregation
    (q03) over the sf0.001 star schema."""
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    return _registry.queries()["q03_region_revenue"](spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator family from SURVEY.md §2 (plus the
    LLM-data-pipeline operators)."""
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents; keys missing here (relative to
    ``queries()``) are non-SQL-expressible and get the rows-only check."""
    return _registry.oracle_sql()
