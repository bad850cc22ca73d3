"""Structured Streaming ingest of arriving job-history logs.

The reference is batch-only, but two of its semantics are exactly the
shapes Structured Streaming formalizes (SURVEY.md §2.7):

* last-SUCCESS-attempt supersedes earlier ones  -> keep-latest state
  (:func:`latest_success_attempts`, ``applyInPandasWithState``);
* concurrency-over-time counting               -> watermarked tumbling
  windows (:func:`attempt_finish_counts`).

Ingest reuses the *batch* parse expressions verbatim
(``sources.job_history.parse_records`` is pure Catalyst column logic, so the
same code runs in both modes): each arriving file is one job's whole log
(``wholetext``), split to records and parsed to the same
(source_file, seq, event, attrs) shape. A directory of job logs therefore
behaves as an unbounded table of history events — the 100 TB-scale shape is
"the JobTracker drops finished-job logs into a bucket; the engine keeps
rolling views current" with per-file parallelism and bounded state
(watermarks / explicit state timeouts).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from hadoop_jobanalyzer_spark.sources.job_history import (
    _split_records,
    parse_records,
)


def read_history_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
    unescape: bool = False,
) -> DataFrame:
    """Streaming analog of ``read_raw_records`` + ``parse_records``: watch a
    directory for arriving job-history logs, emit parsed event records.

    One file = one job's complete log, so record reassembly can never
    straddle a micro-batch boundary and ``seq`` (in-file order) is exact —
    the property the keep-latest semantics below depend on. The
    ``binaryFile`` source delivers each file whole (the streaming ``text``
    source ignores ``wholetext`` and would drop multi-physical-line records
    — ERROR stack traces); decode + record split are the same expressions as
    batch.
    """
    reader = spark.readStream.format("binaryFile").schema(
        "path STRING, modificationTime TIMESTAMP, length LONG, content BINARY"
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    raw = reader.load(path)
    records = _split_records(
        raw.select(
            F.col("path").alias("source_file"),
            F.decode(F.col("content"), "UTF-8").alias("value"),
        )
    )
    return parse_records(records, unescape=unescape)


def _attempt_events(parsed: DataFrame) -> DataFrame:
    """Flat per-record attempt projection (no cross-record merge — streaming
    operators fold records incrementally instead)."""
    a = F.col("attrs")
    return parsed.filter(F.col("event").isin("MapAttempt", "ReduceAttempt")).select(
        "source_file",
        "seq",
        F.col("event").alias("kind"),
        a["TASK_ATTEMPT_ID"].alias("attempt_id"),
        a["TASKID"].alias("taskid"),
        a["TASK_TYPE"].alias("task_type"),
        a["TASK_STATUS"].alias("task_status"),
        a["START_TIME"].cast("long").alias("start_time"),
        a["FINISH_TIME"].cast("long").alias("finish_time"),
        a["SHUFFLE_FINISHED"].cast("long").alias("shuffle_finished"),
        a["SORT_FINISHED"].cast("long").alias("sort_finished"),
    )


def attempt_finish_counts(
    parsed: DataFrame,
    window_duration: str = "1 minute",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Watermarked tumbling-window counts of attempt completions per task
    type — the streaming form of the timeline's "what finished when"
    (SURVEY.md §2.7). Late records beyond ``watermark_delay`` are dropped
    and window state is evicted, which bounds memory on an unbounded log
    stream.
    """
    events = (
        _attempt_events(parsed)
        .filter(F.col("finish_time").isNotNull())
        .withColumn("finish_ts", F.timestamp_millis(F.col("finish_time")))
    )
    return (
        events.withWatermark("finish_ts", watermark_delay)
        .groupBy(F.window("finish_ts", window_duration).alias("win"), "task_type")
        .agg(F.count("*").alias("n_finished"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "task_type",
            "n_finished",
        )
    )


def attempt_sessions(
    parsed: DataFrame,
    gap: str = "5 minutes",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Session windows over attempt completions per task type: consecutive
    finishes closer than ``gap`` merge into one session (the streaming
    form of q36's batch sessionization). Works on a stream (with the
    watermark bounding session state) AND on a batch DataFrame (the same
    expression — Spark ignores the watermark in batch), which is what the
    differential test exploits.
    """
    events = (
        _attempt_events(parsed)
        .filter(F.col("finish_time").isNotNull())
        .withColumn("finish_ts", F.timestamp_millis(F.col("finish_time")))
    )
    return (
        events.withWatermark("finish_ts", watermark_delay)
        .groupBy(F.session_window("finish_ts", gap).alias("win"), "task_type")
        .agg(F.count("*").alias("n_finished"))
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "task_type",
            "n_finished",
        )
    )


def job_status_stream(parsed: DataFrame) -> DataFrame:
    """Rolling last-write-wins job merge (reference A1) as a streaming
    aggregation: per job, the latest-by-sequence value of each attribute.
    Emit with ``outputMode("update")`` / ``"complete"``.
    """
    a = F.col("attrs")
    jobs = parsed.filter(F.col("event") == "Job").withColumn("jobid", a["JOBID"])

    def last_of(key: str, typ: str | None = None):
        col = F.max_by(a[key], F.when(a[key].isNotNull(), F.col("seq")))
        return (col.cast(typ) if typ else col).alias(key.lower())

    return jobs.groupBy("source_file", "jobid").agg(
        last_of("JOBNAME"),
        last_of("USER"),
        last_of("JOB_STATUS"),
        last_of("SUBMIT_TIME", "long"),
        last_of("LAUNCH_TIME", "long"),
        last_of("FINISH_TIME", "long"),
        last_of("TOTAL_MAPS", "long"),
        last_of("TOTAL_REDUCES", "long"),
        last_of("FINISHED_MAPS", "long"),
        last_of("FINISHED_REDUCES", "long"),
    )


LATEST_ATTEMPT_OUTPUT_SCHEMA = StructType(
    [
        StructField("source_file", StringType()),
        StructField("taskid", StringType()),
        StructField("attempt_id", StringType()),
        StructField("finish_time", LongType()),
        StructField("shuffle_finished", LongType()),
        StructField("n_success_attempts", LongType()),
    ]
)


def latest_success_attempts(parsed: DataFrame) -> DataFrame:
    """Custom stateful operator: per task, keep the latest (by in-file
    record order) SUCCESS attempt — the reference's ``finalAttempt`` map
    (bin/job_history:276-279) as ``applyInPandasWithState`` keep-latest
    state. State per key is one small tuple, so state-store size is
    O(live tasks), not O(records).

    Non-SQL-expressible in streaming (arbitrary per-group state machine);
    the batch engine's window-dedup (J2) is the differential check.
    """
    events = _attempt_events(parsed).filter(
        (F.col("task_status") == "SUCCESS")
        & F.col("finish_time").isNotNull()
        & ~F.col("task_type").isin("SETUP", "CLEANUP")
    )

    def keep_latest(
        key: tuple[str, str],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            finish_seq, attempt_id, finish_time, shuffle_finished, n_seen = state.get
        else:
            finish_seq, attempt_id, finish_time, shuffle_finished, n_seen = (
                -1,
                None,
                None,
                None,
                0,
            )
        for pdf in pdfs:
            n_seen += len(pdf)
            best = pdf.loc[pdf["seq"].idxmax()]
            if int(best["seq"]) > finish_seq:
                finish_seq = int(best["seq"])
                attempt_id = best["attempt_id"]
                finish_time = _opt_long(best["finish_time"])
                shuffle_finished = _opt_long(best["shuffle_finished"])
        state.update((finish_seq, attempt_id, finish_time, shuffle_finished, n_seen))
        yield pd.DataFrame(
            {
                "source_file": [key[0]],
                "taskid": [key[1]],
                "attempt_id": [attempt_id],
                "finish_time": [finish_time],
                "shuffle_finished": [shuffle_finished],
                "n_success_attempts": [n_seen],
            }
        )

    state_schema = StructType(
        [
            StructField("finish_seq", LongType()),
            StructField("attempt_id", StringType()),
            StructField("finish_time", LongType()),
            StructField("shuffle_finished", LongType()),
            StructField("n_success_attempts", LongType()),
        ]
    )
    return events.groupBy("source_file", "taskid").applyInPandasWithState(
        keep_latest,
        LATEST_ATTEMPT_OUTPUT_SCHEMA,
        state_schema,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def dedup_attempts_stream(
    parsed: DataFrame, watermark_delay: str = "30 minutes"
) -> DataFrame:
    """Streaming exact dedup of attempt records: first record per
    (attempt_id, record kind) wins, duplicates arriving within the
    watermark are dropped and state is evicted past it —
    ``dropDuplicatesWithinWatermark``, the streaming form of the batch
    engine's dropDuplicates/countDistinct family (SURVEY.md O3).
    """
    events = (
        _attempt_events(parsed)
        .filter(F.col("finish_time").isNotNull())
        .withColumn("finish_ts", F.timestamp_millis(F.col("finish_time")))
    )
    return events.withWatermark("finish_ts", watermark_delay).dropDuplicatesWithinWatermark(
        ["attempt_id", "kind"]
    )


def _opt_long(v: Any) -> int | None:
    return None if pd.isna(v) else int(v)


__all__ = [
    "read_history_stream",
    "attempt_finish_counts",
    "dedup_attempts_stream",
    "job_status_stream",
    "latest_success_attempts",
    "LATEST_ATTEMPT_OUTPUT_SCHEMA",
]


def wasted_counts_stream(parsed: DataFrame) -> DataFrame:
    """Streaming form of the wasted-attempt rollup (reference
    ``wastedAttempts``, bin/job_history:205,276-281): per task, finished
    attempts minus the single surviving SUCCESS — every other finish is
    thrown-away work. Plain incremental aggregation (two counters per
    task, no custom state store); emit with ``update``/``complete``.
    SETUP/CLEANUP excluded as in the batch operator.
    """
    ev = _attempt_events(parsed).filter(
        F.col("finish_time").isNotNull()
        & ~F.col("task_type").isin("SETUP", "CLEANUP")
    )
    return (
        ev.groupBy("source_file", "taskid")
        .agg(
            F.count("*").alias("n_finished"),
            F.count(F.when(F.col("task_status") == "SUCCESS", 1)).alias("n_success"),
        )
        .select(
            "source_file",
            "taskid",
            "n_finished",
            (F.col("n_finished") - F.least(F.lit(1), F.col("n_success"))).alias(
                "n_wasted"
            ),
        )
    )


def error_counts_stream(parsed: DataFrame) -> DataFrame:
    """Streaming failure analysis: running counts of failed/killed attempts
    per (task_type, status, exception class) — the incremental form of the
    batch ``error_summary`` report. A failed attempt carries exactly one
    terminal record, so ``count(*)`` over the filtered stream equals the
    batch report's distinct-attempt count (differential-tested). Pure
    incremental aggregation; emit with ``update``/``complete``.
    """
    a = F.col("attrs")
    klass = F.regexp_replace(
        F.regexp_extract(
            F.col("error"), r"([\w$]+(?:\\\.[\w$]+)*(?:Exception|Error))", 1
        ),
        r"\\\.",
        ".",
    )
    failed = (
        parsed.filter(F.col("event").isin("MapAttempt", "ReduceAttempt"))
        .select(
            "source_file",
            a["TASK_TYPE"].alias("task_type"),
            a["TASK_STATUS"].alias("task_status"),
            a["ERROR"].alias("error"),
        )
        .filter(
            F.col("task_status").isin("FAILED", "KILLED") | F.col("error").isNotNull()
        )
    )
    return (
        failed.select(
            "source_file",
            "task_type",
            "task_status",
            F.when(klass != "", klass).alias("error_class"),
        )
        .groupBy("source_file", "task_type", "task_status", "error_class")
        .agg(F.count("*").alias("n_attempts"))
    )


def enrich_attempts_stream(parsed: DataFrame, jobs_static: DataFrame) -> DataFrame:
    """Stream-static enrichment: attach job attributes (user, jobname) from
    a static jobs view (e.g. the history lake) to the live attempt stream.
    Spark plans the static side as a broadcast per micro-batch — the
    canonical pattern for joining a stream against slowly-changing
    dimensions without stateful stream-stream machinery.
    """
    # the static side must be unique per jobid or the join fans attempts
    # out (the same jobid can appear under two source files / duplicate
    # lake ingests); min() is a deterministic pick
    dims = (
        jobs_static.groupBy(F.col("jobid").alias("_jobid"))
        .agg(F.min("user").alias("user"), F.min("jobname").alias("jobname"))
    )
    ev = _attempt_events(parsed).withColumn(
        "jobid",
        F.regexp_replace(F.col("taskid"), r"^task_(\d+_\d+)_.*$", r"job_$1"),
    )
    return ev.join(F.broadcast(dims), ev["jobid"] == dims["_jobid"], "left").drop(
        "_jobid"
    )
