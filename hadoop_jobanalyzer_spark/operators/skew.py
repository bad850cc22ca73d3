"""Skew-handling aggregation patterns.

Plain skewed SUM/COUNT groupBys need nothing here: Spark's partial (map-
side) aggregation already collapses hot keys before the shuffle, and AQE
splits skewed join partitions. The case partial aggregation canNOT shrink
is exact COUNT(DISTINCT): every distinct value must reach the reducer, so
one hot group key concentrates its whole value set on one task.

``salted_distinct_count`` is the two-phase exact form: salt by a hash of
the *value* (not the group key), so each distinct value lands in exactly
one (key, salt) bucket, per-bucket distinct counts are disjoint, and their
per-key sum is exact. The hot key's value set is now spread over
``n_salts`` reducers; both phases partial-aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_distinct_count(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    n_salts: int = 16,
    out_name: str = "n_distinct",
) -> DataFrame:
    """Exact COUNT(DISTINCT value) per key, skew-spread over n_salts
    buckets. Result is identical to a plain countDistinct — only the
    physical distribution changes (the salt derives from the value hash,
    so salt buckets partition the value space)."""
    salt = F.pmod(F.hash(F.col(value_col)), F.lit(n_salts))
    per_bucket = (
        df.select(*keys, F.col(value_col), salt.alias("_salt"))
        .groupBy(*keys, "_salt")
        .agg(F.countDistinct(value_col).alias("_partial"))
    )
    return per_bucket.groupBy(*keys).agg(F.sum("_partial").alias(out_name))
