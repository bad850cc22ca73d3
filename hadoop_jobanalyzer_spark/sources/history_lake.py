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
    """Compact one lake view's small files.

    Fleet-scale append ingest accumulates one-file-per-batch partitions; a
    scan then pays one task + one footer read per tiny file. Compaction
    rewrites each ``jobid`` partition to (at most) ``files_per_partition``
    files: rows are range-partitioned on (jobid, salt) with salt =
    hash(row) % files_per_partition and one target partition per
    (jobid, salt) group, so rows of one jobid actually land in
    ``files_per_partition`` distinct tasks (a bare ``repartition(n,
    "jobid")`` would put the whole jobid in a single task regardless of
    ``n``, and hash-partitioning on the salt can collide salt groups into
    one task). Parallelism scales with #jobs x files_per_partition.

    Crash safety: the compacted view is written to a sibling ``.compacting``
    directory, row counts are verified, and the result is swapped in with
    two filesystem renames — the original is never modified until the
    replacement is complete, so a mid-write failure leaves the live view
    intact. The swap replaces the WHOLE view: do not run compaction
    concurrently with appends to the same view (appends landing between
    read and swap would be dropped).

    Returns (files_before, files_after) for observability.
    """
    from pyspark.sql import functions as F

    view_path = os.path.join(path, view)
    tmp_path = view_path + ".compacting"
    old_path = view_path + ".old"

    # Hadoop FileSystem globbing, not local glob — the counts must be
    # correct for hdfs:///s3a:// paths too (the swap below already is)
    jvm = spark._jvm
    fs = jvm.org.apache.hadoop.fs.FileSystem.get(spark._jsc.hadoopConfiguration())
    hpath = jvm.org.apache.hadoop.fs.Path

    def _count(p: str) -> int:
        statuses = fs.globStatus(hpath(os.path.join(p, "*", "*.parquet")))
        return len(statuses) if statuses is not None else 0

    before = _count(view_path)
    df = spark.read.parquet(view_path)
    n_rows = df.count()
    n_jobs = df.select("jobid").distinct().count()  # column-pruned scan
    # hash() rejects MAP-typed input anywhere in the column (counters is
    # array<struct<..,map<..>>>) — salt on the map-free columns only
    hashable = [c for c, t in df.dtypes if "map<" not in t]
    salt = F.pmod(F.abs(F.hash(*hashable)), F.lit(files_per_partition))
    (
        df.withColumn("_salt", salt)
        .repartitionByRange(max(1, n_jobs * files_per_partition), "jobid", "_salt")
        .sortWithinPartitions("jobid")
        .drop("_salt")
        .write.mode("overwrite")
        .partitionBy("jobid")
        .parquet(tmp_path)
    )
    if spark.read.parquet(tmp_path).count() != n_rows:  # pragma: no cover
        raise RuntimeError(f"compaction row-count mismatch for {view_path}; original left in place")
    # atomic-ish swap via the same Hadoop FileSystem API
    fs.delete(hpath(old_path), True)
    if not fs.rename(hpath(view_path), hpath(old_path)):  # pragma: no cover
        raise RuntimeError(f"compaction swap failed renaming {view_path} aside")
    if not fs.rename(hpath(tmp_path), hpath(view_path)):  # pragma: no cover
        fs.rename(hpath(old_path), hpath(view_path))  # roll back
        raise RuntimeError(f"compaction swap failed installing {tmp_path}; rolled back")
    fs.delete(hpath(old_path), True)
    return before, _count(view_path)


def read_evolved(spark: SparkSession, path: str):
    """Read a parquet dataset whose schema EVOLVED across writes
    (columns added over time) with ``mergeSchema``: the unified schema is
    the union of every file's footer schema, and files lacking a column
    surface NULLs for it.

    Plain ``spark.read.parquet`` takes one file's footer as THE schema
    (fast, but silently drops later-added columns when an old file is
    sampled first); a long-lived ingest lake must opt into the footer
    merge explicitly. At 100 TB the merge reads every footer once —
    schedule-time metadata cost, not data I/O — which is why it is a
    deliberate helper and not the default read path.
    """
    return spark.read.option("mergeSchema", "true").parquet(path)
