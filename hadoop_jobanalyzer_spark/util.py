"""Small engine utilities shared across operators."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pair_structs(ids: Column) -> Column:
    """All (id_a < id_b) pairs from a sorted id array — in-bucket candidate
    generation for LSH/inverted-index dedup. O(|bucket|^2) by design; callers
    bound bucket size for the degenerate giant-bucket case at scale."""
    return F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(ids, i + F.lit(2), F.size(ids)),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )


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
