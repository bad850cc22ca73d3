"""Bucketed parquet tables: pre-shuffled storage for co-located joins.

At 100 TB the dominant cost of a fact-to-fact equi-join is the shuffle of
both sides. Bucketing moves that shuffle to write time, once: a table
written with ``bucketBy(n, key)`` is hash-partitioned into ``n`` files per
partition, and Spark's scan reports the hash distribution to Catalyst
(``outputPartitioning``), so a join of two tables bucketed by the same key
and count plans with NO Exchange on either side — verified by
tests/test_bucketed.py. ``sortBy`` additionally pre-orders within buckets,
removing the Sort under a sort-merge join.

Bucketed tables must go through ``saveAsTable`` (the catalog carries the
bucket spec; a plain parquet path write silently loses it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (optionally bucket-sorted) catalog table.

    ``n_buckets`` sizes the parallelism of every future bucket-local join
    and should be chosen for the *target* data volume (buckets are fixed at
    write time; at 100 TB, hundreds-to-thousands so each bucket's files fit
    an executor's memory during the merge).
    """
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(name)


def read_table(spark: SparkSession, name: str) -> DataFrame:
    """Read a catalog table (bucket metadata rides along automatically)."""
    return spark.table(name)
