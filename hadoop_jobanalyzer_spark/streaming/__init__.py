"""Structured Streaming: arriving job logs (history_stream), the
star-schema event stream (event_stream), and corpus ingest with
arrival-time incremental dedup (corpus_ingest)."""

from hadoop_jobanalyzer_spark.streaming.corpus_ingest import (
    compact_ingest_delta,
    make_ingest_batch,
    read_ingested_documents,
    start_corpus_ingest,
)

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
from hadoop_jobanalyzer_spark.streaming.sinks import (
    idempotent_batch_writer,
    upsert_batch_writer,
    write_stream_partitioned,
)
from hadoop_jobanalyzer_spark.streaming.event_stream import (
    dedup_events_stream,
    event_window_counts_stream,
    heavy_hitters_stream,
    hll_register_stream,
    kmv_stream,
    pattern_match_stream,
    read_events_stream,
    running_totals_stream,
    scd2_enrich_stream,
    user_sessions_stream,
    view_purchase_join_stream,
    zscore_anomaly_stream,
)

__all__ = [
    "attempt_finish_counts",
    "compact_ingest_delta",
    "make_ingest_batch",
    "read_ingested_documents",
    "start_corpus_ingest",
    "attempt_sessions",
    "dedup_attempts_stream",
    "dedup_events_stream",
    "enrich_attempts_stream",
    "event_window_counts_stream",
    "hll_register_stream",
    "kmv_stream",
    "pattern_match_stream",
    "idempotent_batch_writer",
    "upsert_batch_writer",
    "job_status_stream",
    "error_counts_stream",
    "latest_success_attempts",
    "read_events_stream",
    "read_history_stream",
    "running_totals_stream",
    "scd2_enrich_stream",
    "user_sessions_stream",
    "view_purchase_join_stream",
    "wasted_counts_stream",
    "write_stream_partitioned",
]
