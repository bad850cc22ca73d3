"""Small engine utilities shared across operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Fan a narrow scan out to the session's parallelism before CPU-heavy
    per-row work.

    A small parquet file arrives as one input split, which serializes every
    downstream projection (hashing, shingling, feature extraction) onto one
    core. When the scan has fewer partitions than the session's default
    parallelism, round-robin repartition; otherwise no-op — at real corpus
    scale (many files / many row groups) the scan is already parallel and
    this adds nothing.
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
