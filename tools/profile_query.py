"""Runtime shuffle profiler: execute registered queries and report the
MEASURED stage metrics — input/shuffle/spill bytes and task time — from
the Spark UI REST API, per query.

`tools/plan_audit.py` checks the plan SHAPE (exchange counts, join
strategies); this tool checks what those exchanges actually COST at the
current SF. The pair is the "measure, don't guess" loop: a query whose
shuffle-write bytes rival its input bytes is shuffling the corpus (bad at
100 TB); one whose spill is nonzero needs partition-size attention before
a scale-up.

Usage:
    python tools/profile_query.py [sf_dir] [name_prefix...]

One line per query: wall seconds, input bytes, shuffle read/write bytes,
spill bytes, task-time seconds; sorted by shuffle write descending.
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

sys.path.insert(0, ".")


def _get(url: str):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def _fmt(n: float) -> str:
    for unit in ("B", "KB", "MB", "GB"):
        if abs(n) < 1024:
            return f"{n:7.1f}{unit}"
        n /= 1024
    return f"{n:7.1f}TB"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    prefixes = tuple(sys.argv[2:])

    import os

    from hadoop_jobanalyzer_spark.plans.registry import QUERIES
    from hadoop_jobanalyzer_spark.session import get_spark

    # sf0.1+ profiling needs bench-grade heap (the library default is the
    # Spark 1g, sized for the sf0.001/0.01 test surface)
    spark = get_spark(
        extra_conf={
            "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEM", "8g")
        }
    )
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    ui = sc.uiWebUrl
    app_id = sc.applicationId

    names = [
        n for n in sorted(QUERIES) if not prefixes or n.startswith(prefixes)
    ]
    results = []
    for name in names:
        fn, _ = QUERIES[name]
        # metrics must be attributable to THIS query: drop any table a
        # previous query's operator persisted for its own scope
        spark.catalog.clearCache()
        sc.setJobGroup(name, name, interruptOnCancel=False)
        t0 = time.time()
        fn(spark, sf_dir).collect()
        wall = time.time() - t0
        sc.setJobGroup("", "")

        jobs = _get(f"{ui}/api/v1/applications/{app_id}/jobs")
        stage_ids = sorted(
            {
                sid
                for j in jobs
                if j.get("jobGroup") == name
                for sid in j.get("stageIds", [])
            }
        )
        tot = dict.fromkeys(
            (
                "inputBytes",
                "shuffleReadBytes",
                "shuffleWriteBytes",
                "memoryBytesSpilled",
                "diskBytesSpilled",
                "executorRunTime",
            ),
            0,
        )
        for sid in stage_ids:
            try:
                for attempt in _get(
                    f"{ui}/api/v1/applications/{app_id}/stages/{sid}"
                ):
                    for k in tot:
                        tot[k] += attempt.get(k, 0)
            except Exception:
                continue  # skipped stages (reused exchanges) have no attempts
        results.append((name, wall, tot))
        print(
            f"{name}: {wall:5.1f}s  in {_fmt(tot['inputBytes'])}  "
            f"shufW {_fmt(tot['shuffleWriteBytes'])}  "
            f"shufR {_fmt(tot['shuffleReadBytes'])}  "
            f"spill {_fmt(tot['memoryBytesSpilled'] + tot['diskBytesSpilled'])}  "
            f"task {tot['executorRunTime'] / 1000:6.1f}s"
        )

    print()
    print("== by shuffle write ==")
    for name, wall, tot in sorted(
        results, key=lambda r: -r[2]["shuffleWriteBytes"]
    )[:15]:
        print(
            f"{_fmt(tot['shuffleWriteBytes'])}  {name}  "
            f"({_fmt(tot['inputBytes'])} in, {wall:.1f}s)"
        )
    spilled = [r for r in results if r[2]["memoryBytesSpilled"] + r[2]["diskBytesSpilled"] > 0]
    print(f"queries with spill: {len(spilled)}")
    for name, _, tot in spilled:
        print(f"  {name}: {_fmt(tot['memoryBytesSpilled'] + tot['diskBytesSpilled'])}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
