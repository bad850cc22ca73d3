"""hadoop_jobanalyzer_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of lila/hadoop-jobanalyzer.

The reference (a single-threaded Groovy/Python Hadoop job-history analyzer)
is re-expressed Spark-first: declarative DataFrame plans, Catalyst
optimization, and partition-parallel execution designed for very large
inputs (many job logs / many TB of parquet), while matching the reference's
query semantics on its own fixture logs.

Layers (SURVEY.md §3 "Spark engine lifecycle"):
  sources/    ingest: raw logs -> records DF -> typed jobs/tasks/attempts views
  functions/  column-level expression helpers (counters parse, text, vectors)
  operators/  semantic views & reports (summary, task tables, timeline, dedup,
              similarity, ...)
  plans/      the registered query surface over parquet tables (driver
              correctness gate)
  streaming/  Structured Streaming ingest of arriving job logs
"""

from hadoop_jobanalyzer_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
