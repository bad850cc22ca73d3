"""Structured Streaming ingest + stateful operators over arriving job logs."""

from hadoop_jobanalyzer_spark.streaming.history_stream import (
    attempt_finish_counts,
    attempt_sessions,
    dedup_attempts_stream,
    enrich_attempts_stream,
    job_status_stream,
    error_counts_stream,
    latest_success_attempts,
    read_history_stream,
    wasted_counts_stream,
)

__all__ = [
    "attempt_finish_counts",
    "attempt_sessions",
    "dedup_attempts_stream",
    "enrich_attempts_stream",
    "job_status_stream",
    "error_counts_stream",
    "latest_success_attempts",
    "read_history_stream",
    "wasted_counts_stream",
]
