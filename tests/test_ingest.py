"""Ingest unit tests: record reassembly, attr/counters parse, typed views."""

import os

from pyspark.sql import functions as F

from hadoop_jobanalyzer_spark.functions import counter_value
from hadoop_jobanalyzer_spark.sources import (
    load_history,
    parse_records,
    records_from_string,
)

TINY = os.path.join(os.path.dirname(__file__), "data", "tiny_log.txt")


def tiny(spark):
    return load_history(spark, TINY)


def test_record_reassembly_and_event_counts(spark):
    v = tiny(spark)
    counts = {r["event"]: r["count"] for r in v.records.groupBy("event").count().collect()}
    # the multi-line ERROR record must count as ONE MapAttempt record
    assert counts == {"Meta": 1, "Job": 5, "Task": 8, "MapAttempt": 10, "ReduceAttempt": 2}


def test_multiline_error_value(spark):
    v = tiny(spark)
    row = v.attempts.filter(
        F.col("attempt_id") == "attempt_202001010000_0001_m_000001_0"
    ).collect()[0]
    assert "OutOfMemoryError" in row["error"]
    assert "MapTask" in row["error"]  # continuation line made it into the value
    assert row["task_status"] == "FAILED"


def test_escaping_preserved(spark):
    # the reference never unescapes (SURVEY.md §1.1) — parity by default
    v = tiny(spark)
    job = v.jobs.collect()[0]
    assert job["jobname"] == "tiny\\.job"
    assert job["jobconf"] == "hdfs://nn/job\\.xml"
    # opt-in unescape
    parsed = parse_records(
        records_from_string(spark, 'Job JOBID="j1" JOBNAME="a\\.b\\:c" .'), unescape=True
    )
    assert parsed.collect()[0]["attrs"]["JOBNAME"] == "a.b:c"


def test_jobs_last_write_wins(spark):
    job = tiny(spark).jobs.collect()[0]
    assert job["jobid"] == "job_202001010000_0001"
    assert job["job_status"] == "SUCCESS"  # PREP -> RUNNING -> SUCCESS
    assert job["submit_time"] == 1000000
    assert job["launch_time"] == 2000000
    assert job["finish_time"] == 12000000
    assert (job["total_maps"], job["total_reduces"]) == (2, 1)
    assert job["failed_maps"] == 1


def test_tasks_view(spark):
    v = tiny(spark)
    tasks = {r["taskid"]: r for r in v.tasks.collect()}
    assert len(tasks) == 5  # 2 maps, 1 reduce, setup, cleanup
    m0 = tasks["task_202001010000_0001_m_000000"]
    assert m0["task_type"] == "MAP"
    assert m0["jobid"] == "job_202001010000_0001"
    assert m0["splits"] == ["/rack/h1", "/rack/h2"]
    assert (m0["start_time"], m0["finish_time"]) == (3000000, 7201000)
    setup = tasks["task_202001010000_0001_m_000003"]
    assert setup["task_type"] == "SETUP" and setup["splits"] == []


def test_counters_parse(spark):
    v = tiny(spark)
    att = v.attempts.filter(
        F.col("attempt_id") == "attempt_202001010000_0001_m_000000_0"
    ).collect()[0]
    groups = {g["group"]: dict(g["counters"]) for g in att["counters"]}
    # per-group counters only (the reference printNice union bug is fixed)
    assert groups["FileSystemCounters"] == {
        "HDFS_BYTES_READ": 1000,
        "FILE_BYTES_WRITTEN": 2000,
    }
    assert groups["Map-Reduce Framework"] == {"Map input records": 50, "Spilled Records": 0}
    val = v.tasks.filter(F.col("taskid") == "task_202001010000_0001_r_000000").select(
        counter_value(F.col("counters"), "FileSystemCounters", "HDFS_BYTES_WRITTEN").alias("b")
    ).collect()[0]["b"]
    assert val == 4242


def test_final_attempts(spark):
    v = tiny(spark)
    finals = {r["taskid"]: r["attempt_id"] for r in v.final_attempts().collect()}
    assert finals == {
        "task_202001010000_0001_m_000000": "attempt_202001010000_0001_m_000000_0",
        "task_202001010000_0001_m_000001": "attempt_202001010000_0001_m_000001_1",
        "task_202001010000_0001_r_000000": "attempt_202001010000_0001_r_000000_0",
    }  # SETUP/CLEANUP excluded; failed attempt _0 superseded by _1


def test_zero_start_time_normalized(spark):
    log = (
        'MapAttempt TASK_TYPE="MAP" TASKID="task_1_2_m_000000" '
        'TASK_ATTEMPT_ID="attempt_1_2_m_000000_0" START_TIME="0" .'
    )
    from hadoop_jobanalyzer_spark.sources.job_history import attempts_view

    att = attempts_view(parse_records(records_from_string(spark, log))).collect()[0]
    assert att["start_time"] is None  # F5 zero-start filter (bin/job_history:264)


def test_last_record_without_trailing_newline(spark):
    recs = records_from_string(spark, 'Job JOBID="j1" .\nJob JOBID="j1" JOB_STATUS="SUCCESS" .')
    assert recs.count() == 2


def test_fixture_log1_event_counts(spark, fixture_log1):
    v = load_history(spark, fixture_log1)
    counts = {r["event"]: r["count"] for r in v.records.groupBy("event").count().collect()}
    # SURVEY.md §1.1 observed counts
    assert counts == {
        "Meta": 1,
        "Job": 5,
        "Task": 1668,
        "MapAttempt": 1282,
        "ReduceAttempt": 664,
    }
    assert v.tasks.filter(F.col("task_type") == "MAP").count() == 512
    assert v.tasks.filter(F.col("task_type") == "REDUCE").count() == 320
    assert v.final_attempts().count() == 832


def test_jobhistory_datasource_matches_catalyst_parse(spark, fixture_log1, fixture_log2):
    """The registered `jobhistory` format must produce exactly the records
    the Catalyst parse produces (framing, seq numbering, attr maps)."""
    import os

    from hadoop_jobanalyzer_spark.sources.datasource import JobHistoryDataSource
    from hadoop_jobanalyzer_spark.sources.job_history import parse_records, read_raw_records

    spark.dataSource.register(JobHistoryDataSource)
    for log in (fixture_log1, fixture_log2):
        via_ds = spark.read.format("jobhistory").load(log)
        via_engine = parse_records(read_raw_records(spark, log))

        def norm(df):
            rows = [
                (r["seq"], r["event"], tuple(sorted(r["attrs"].items())))
                for r in df.collect()
            ]
            return sorted(rows)

        a, b = norm(via_ds), norm(via_engine)
        assert len(a) > 1000 and a == b, os.path.basename(log)


def test_gzip_log_matches_plain(spark, fixture_log1, tmp_path):
    """Hadoop history logs commonly arrive gzipped; Spark's text source
    decompresses by extension, so the whole-file record split must produce
    identical views from the compressed copy."""
    import gzip
    import shutil

    gz = tmp_path / "log1.txt.gz"
    with open(fixture_log1, "rb") as src, gzip.open(gz, "wb") as dst:
        shutil.copyfileobj(src, dst)
    plain = load_history(spark, fixture_log1)
    zipped = load_history(spark, str(gz))
    want = plain.jobs.drop("source_file").collect()
    got = zipped.jobs.drop("source_file").collect()
    assert got == want
    assert zipped.attempts.count() == plain.attempts.count()
