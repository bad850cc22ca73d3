"""Semantic views & report operators over the typed history views."""

from hadoop_jobanalyzer_spark.operators.history_reports import (
    job_summary,
    map_table,
    reduce_bytes_table,
    reduce_table,
)
from hadoop_jobanalyzer_spark.operators.timeline import timeline

__all__ = [
    "job_summary",
    "map_table",
    "reduce_bytes_table",
    "reduce_table",
    "timeline",
]
