"""Approximate aggregates for cardinality/quantile estimation at scale.

Exact distinct counts and percentiles shuffle every value; at 100 TB the
sketch forms are the only affordable first pass (HyperLogLog++ for
cardinality, Greenwald-Khanna for quantiles — both merge associatively, so
partial aggregation applies and the shuffle carries fixed-size sketches,
not values). These cannot hash-match a DuckDB oracle (sketch internals are
engine-specific), so they are exposed as library functions with
tolerance-asserted tests against the exact forms
(tests/test_extended_queries.py) instead of registered oracle queries; the
exact counterparts (q09/q35/q39) remain the correctness-gated surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def approx_distinct(col: str | Column, rsd: float = 0.05) -> Column:
    """HyperLogLog++ distinct-count estimate (relative std dev ``rsd``).
    The shuffle payload is a fixed-size HLL register set per group."""
    return F.approx_count_distinct(col, rsd)


def approx_quantiles(
    df: DataFrame, col: str, probabilities: list[float], relative_error: float = 0.01
) -> list[float]:
    """Greenwald-Khanna quantile estimates; guarantees rank error within
    ``relative_error`` * N. One pass, mergeable per-partition summaries."""
    return df.approxQuantile(col, probabilities, relative_error)
