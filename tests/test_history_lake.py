"""Partitioned parquet lake: write, reopen, partition pruning, report parity."""

import contextlib
import io

from pyspark.sql import functions as F

from hadoop_jobanalyzer_spark.operators import job_summary, map_table
from hadoop_jobanalyzer_spark.sources import load_history
from hadoop_jobanalyzer_spark.sources.history_lake import (
    read_history_lake,
    write_history_lake,
)


def test_lake_roundtrip_and_partition_pruning(spark, fixture_log1, fixture_log2, tmp_path):
    views = load_history(spark, f"{fixture_log1.rsplit('/', 1)[0]}/*")
    lake = str(tmp_path / "lake")
    write_history_lake(views, lake)
    reopened = read_history_lake(spark, lake)

    # report parity: summary over the lake equals summary over raw logs
    want = {
        r["jobid"]: (r["avg_map_len"], r["num_maps"], r["num_reduces"])
        for r in job_summary(views).collect()
    }
    got = {
        r["jobid"]: (r["avg_map_len"], r["num_maps"], r["num_reduces"])
        for r in job_summary(reopened).collect()
    }
    assert got == want and len(got) == 2

    # per-job query prunes to one jobid partition
    one_job = reopened.tasks.filter(F.col("jobid") == "job_201010291643_0125")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        one_job.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters: [isnotnull(jobid" in plan
    assert map_table(reopened).count() == 512 + 1024

    # append adds partitions without clobbering (same data twice -> 2x rows)
    write_history_lake(views, lake, mode="append")
    assert read_history_lake(spark, lake).jobs.count() == 4


def test_compact_lake_view(spark, tmp_path, fixture_log1, fixture_log2):
    """Appending twice leaves multiple files per partition; compaction
    collapses them and preserves the data exactly."""
    from hadoop_jobanalyzer_spark.sources import load_history
    from hadoop_jobanalyzer_spark.sources.history_lake import (
        compact_lake_view,
        read_history_lake,
        write_history_lake,
    )

    lake = str(tmp_path / "lake")
    write_history_lake(load_history(spark, fixture_log1), lake)
    # two appends of the same job -> two files in that jobid's partition
    # (duplicate rows, deliberately: compaction must preserve them)
    write_history_lake(load_history(spark, fixture_log2), lake)
    write_history_lake(load_history(spark, fixture_log2), lake)

    before_rows = sorted(
        (r["jobid"], r["taskid"]) for r in read_history_lake(spark, lake).tasks.collect()
    )
    nb, na = compact_lake_view(spark, lake, "tasks", files_per_partition=1)
    assert na < nb, (nb, na)
    assert na == 2  # one file per jobid partition
    after_rows = sorted(
        (r["jobid"], r["taskid"]) for r in read_history_lake(spark, lake).tasks.collect()
    )
    assert after_rows == before_rows
    # the original is swapped out wholesale — no stale .compacting/.old left
    leftovers = [p.name for p in tmp_path.glob("lake/tasks.*")]
    assert leftovers == [], leftovers


def test_compact_lake_view_multi_file(spark, tmp_path, fixture_log1):
    """files_per_partition > 1 actually produces multiple files per jobid
    (the shuffle key is salted — a bare repartition(n, jobid) could not)."""
    from hadoop_jobanalyzer_spark.sources import load_history
    from hadoop_jobanalyzer_spark.sources.history_lake import (
        compact_lake_view,
        read_history_lake,
        write_history_lake,
    )

    lake = str(tmp_path / "lake")
    write_history_lake(load_history(spark, fixture_log1), lake)
    before_rows = read_history_lake(spark, lake).tasks.count()
    _, na = compact_lake_view(spark, lake, "tasks", files_per_partition=3)
    assert na == 3  # one jobid partition, salted into 3 files
    assert read_history_lake(spark, lake).tasks.count() == before_rows
