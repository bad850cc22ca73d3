"""Property-based tests (SURVEY.md §5d): random event logs -> invariants.

Spark jobs per example are expensive, so examples are few but each asserts
several structural invariants at once. The generator emits syntactically
valid job-history logs (the grammar of SURVEY.md §1.1) with random attempt
topology: retries, failures, out-of-order SUCCESS records.
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hadoop_jobanalyzer_spark.operators.timeline import timeline
from hadoop_jobanalyzer_spark.sources.job_history import (
    HistoryViews,
    attempts_view,
    final_attempts,
    jobs_view,
    parse_records,
    records_from_string,
    tasks_view,
)

JOBID = "job_202601010000_0001"


@st.composite
def job_logs(draw):
    """A (log_text, expected) pair: expected maps taskid -> list of
    (attempt_id, status, start, finish) in record order."""
    n_tasks = draw(st.integers(min_value=1, max_value=5))
    base = 1_000_000_000_000
    lines = [
        f'Meta VERSION="1" .',
        f'Job JOBID="{JOBID}" JOBNAME="prop" USER="t" SUBMIT_TIME="{base}" '
        f'LAUNCH_TIME="{base + 1000}" TOTAL_MAPS="{n_tasks}" TOTAL_REDUCES="0" .',
    ]
    expected: dict[str, list] = {}
    for ti in range(n_tasks):
        taskid = f"task_202601010000_0001_m_{ti:06d}"
        lines.append(
            f'Task TASKID="{taskid}" TASK_TYPE="MAP" START_TIME="{base + 2000}" .'
        )
        n_attempts = draw(st.integers(min_value=1, max_value=3))
        expected[taskid] = []
        for ai in range(n_attempts):
            aid = f"{taskid}_{ai}"
            status = draw(st.sampled_from(["SUCCESS", "FAILED", "KILLED"]))
            start = base + draw(st.integers(min_value=2, max_value=50)) * 1000
            dur = draw(st.integers(min_value=1, max_value=60)) * 1000
            finish = start + dur
            lines.append(
                f'MapAttempt TASK_TYPE="MAP" TASKID="{taskid}" '
                f'TASK_ATTEMPT_ID="{aid}" START_TIME="{start}" .'
            )
            lines.append(
                f'MapAttempt TASK_TYPE="MAP" TASKID="{taskid}" '
                f'TASK_ATTEMPT_ID="{aid}" TASK_STATUS="{status}" '
                f'FINISH_TIME="{finish}" .'
            )
            expected[taskid].append((aid, status, start, finish))
        lines.append(
            f'Task TASKID="{taskid}" TASK_TYPE="MAP" TASK_STATUS="SUCCESS" '
            f'FINISH_TIME="{base + 200_000}" .'
        )
    max_finish = max(
        (f for atts in expected.values() for (_, _, _, f) in atts),
        default=base + 10_000,
    )
    lines.append(
        f'Job JOBID="{JOBID}" JOB_STATUS="SUCCESS" FINISH_TIME="{max_finish + 5000}" '
        f'FINISHED_MAPS="{n_tasks}" .'
    )
    return "\n".join(lines) + "\n", expected


def _views(spark, text: str) -> HistoryViews:
    parsed = parse_records(records_from_string(spark, text))
    return HistoryViews(
        records=parsed,
        jobs=jobs_view(parsed),
        tasks=tasks_view(parsed),
        attempts=attempts_view(parsed),
    )


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(job_logs())
def test_parse_and_final_attempt_invariants(spark, log_and_expected):
    text, expected = log_and_expected
    v = _views(spark, text)

    # every record parsed (Meta + 2 Job + per task: 1+2*attempts+1)
    assert v.records.count() == sum(
        1 for line in text.splitlines() if line.endswith(" .")
    )

    # NUM_ATTEMPTS >= 1 and equals distinct attempt ids
    counts = {
        r["taskid"]: r["n"]
        for r in v.attempts.groupBy("taskid")
        .agg(F.countDistinct("attempt_id").alias("n"))
        .collect()
    }
    for taskid, atts in expected.items():
        assert counts[taskid] == len(atts) >= 1

    # final attempt = LAST SUCCESS in record order; absent when none succeed
    finals = {r["taskid"]: r["attempt_id"] for r in final_attempts(v.attempts).collect()}
    for taskid, atts in expected.items():
        succ = [aid for (aid, s, _, _) in atts if s == "SUCCESS"]
        if succ:
            assert finals[taskid] == succ[-1], taskid
        else:
            assert taskid not in finals


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(job_logs())
@pytest.mark.slow
def test_timeline_impls_agree_and_conserve_mass(spark, log_and_expected):
    text, expected = log_and_expected
    v = _views(spark, text)

    sweep = timeline(v, scale=1000, impl="sweep")
    explode = timeline(v, scale=1000, impl="explode")
    assert sweep.exceptAll(explode).count() == 0
    assert explode.exceptAll(sweep).count() == 0

    # mass conservation: sum over buckets of (maps + waste) equals the sum
    # of clamped inclusive interval lengths over all finished attempts
    agg = sweep.agg(
        F.sum(F.col("maps") + F.col("waste")).alias("mass"),
        F.max("t").alias("t_max"),
    ).collect()[0]
    job_finish = max(f for atts in expected.values() for (_, _, _, f) in atts) + 5000
    submit_b, finish_b = 1_000_000_000, job_finish // 1000
    rng = finish_b - submit_b
    want = 0
    for atts in expected.values():
        for (_, _, start, finish) in atts:
            t0 = max(start // 1000 - submit_b, 0)
            t1 = min(finish // 1000 - submit_b, rng)
            if t1 >= t0:
                want += t1 - t0 + 1
    assert agg["mass"] == want
    assert agg["t_max"] == rng
