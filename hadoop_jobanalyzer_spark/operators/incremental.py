"""Incremental aggregate maintenance (materialized-view delta merge).

The re-aggregable-state pattern: an aggregate over (n, sum, min, max)-style
measures is a COMMUTATIVE MONOID, so "base aggregate + delta batch" merges
by unioning the two state relations and re-aggregating — the update-time
shuffle is sized by the DELTA (plus touched base keys), never by the full
history. This is the batch form of what the streaming sinks do with MERGE
(streaming/sinks.py) and what q37's multi-resolution rollup exploits
(daily -> monthly is the same merge).

Measures kept exact: counts and decimal sums (engine-portable), min/max.
Averages are NOT state — they derive at read time (sum/n), because a mean
is not mergeable but (n, sum) is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def aggregate_state(df: DataFrame, keys: list[str], value: str) -> DataFrame:
    """Collapse rows to the mergeable per-key state
    (n, sum_val DECIMAL(18,2), min_val, max_val)."""
    v = F.col(value).cast("decimal(18,2)")
    return df.groupBy(*keys).agg(
        F.count("*").alias("n"),
        F.sum(v).alias("sum_val"),
        F.min(v).alias("min_val"),
        F.max(v).alias("max_val"),
    )


def merge_aggregate_states(a: DataFrame, b: DataFrame, keys: list[str]) -> DataFrame:
    """Merge two state relations: union + one re-aggregation. Each input
    row is already one row per key, so the merge shuffle moves state rows
    (tiny), not history."""
    return (
        a.unionByName(b)
        .groupBy(*keys)
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_val").alias("sum_val"),
            F.min("min_val").alias("min_val"),
            F.max("max_val").alias("max_val"),
        )
    )
