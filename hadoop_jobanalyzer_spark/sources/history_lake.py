"""Persist parsed job history as a partitioned parquet lake.

The multi-job shape (SURVEY.md §7 milestone 5): parse once, persist the
typed views as parquet partitioned by ``jobid``, and run every report over
the lake instead of re-parsing raw logs. At fleet scale (millions of job
logs) this is the difference between O(raw text) and O(pruned columnar):

* per-job queries prune to one partition (``PartitionFilters`` in the
  scan — verified by tests);
* cross-job aggregations read only the columns they touch;
* new logs append their partitions without touching existing ones.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from hadoop_jobanalyzer_spark.sources.job_history import HistoryViews

_VIEW_NAMES = ("jobs", "tasks", "attempts")


def write_history_lake(views: HistoryViews, path: str, mode: str = "append") -> None:
    """Persist jobs/tasks/attempts partitioned by jobid.

    ``append`` is the incremental-ingest default: each newly parsed batch
    of logs adds its job partitions. Dynamic partition overwrite
    (``mode="overwrite"`` with spark.sql.sources.partitionOverwriteMode=
    dynamic) reprocesses selected jobs in place.
    """
    for name in _VIEW_NAMES:
        df = getattr(views, name)
        df.write.mode(mode).partitionBy("jobid").parquet(os.path.join(path, name))


def read_history_lake(spark: SparkSession, path: str) -> HistoryViews:
    """Reopen a persisted lake as HistoryViews (records are not persisted —
    reports only consume the typed views)."""
    jobs = spark.read.parquet(os.path.join(path, "jobs"))
    tasks = spark.read.parquet(os.path.join(path, "tasks"))
    attempts = spark.read.parquet(os.path.join(path, "attempts"))
    return HistoryViews(records=None, jobs=jobs, tasks=tasks, attempts=attempts)


def compact_lake_view(
    spark: SparkSession,
    path: str,
    view: str,
    files_per_partition: int = 1,
) -> tuple[int, int]:
    """Compact one lake view's small files in place.

    Fleet-scale append ingest accumulates one-file-per-batch partitions; a
    scan then pays one task + one footer read per tiny file. Compaction
    rewrites each ``jobid`` partition to ``files_per_partition`` files.
    Uses dynamic partition overwrite so only partitions present in the
    rewrite are replaced — concurrent appends to *other* jobids survive.

    Returns (files_before, files_after) for observability.
    """
    import glob

    view_path = os.path.join(path, view)

    def _count() -> int:
        return len(glob.glob(os.path.join(view_path, "*", "*.parquet")))

    before = _count()
    df = spark.read.parquet(view_path)
    old = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            df.repartition(files_per_partition, "jobid")
            .sortWithinPartitions("jobid")
            .write.mode("overwrite")
            .partitionBy("jobid")
            .parquet(view_path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old)
    return before, _count()
