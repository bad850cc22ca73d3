"""Sources: job-history log ingestion and parquet table registry."""

from hadoop_jobanalyzer_spark.sources.job_history import (
    HistoryViews,
    attempts_view,
    final_attempts,
    jobs_view,
    load_history,
    parse_records,
    read_raw_records,
    records_from_string,
    stage_url,
    tasks_view,
)

__all__ = [
    "HistoryViews",
    "attempts_view",
    "final_attempts",
    "jobs_view",
    "load_history",
    "parse_records",
    "read_raw_records",
    "records_from_string",
    "stage_url",
    "tasks_view",
]
