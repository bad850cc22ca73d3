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
from pyspark.sql import functions as F


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


def table_bucket_spec(spark: SparkSession, name: str):
    """(n_buckets, bucket_cols, sort_cols, location) from the catalog —
    the spec a maintenance rewrite must preserve."""
    info = {
        (r["col_name"] or "").strip(): (r["data_type"] or "").strip()
        for r in spark.sql(f"DESCRIBE FORMATTED {name}").collect()
    }

    def cols(v: str) -> list[str]:
        v = (v or "").strip("[]")
        return [c.strip(" `") for c in v.split(",") if c.strip(" `")]

    return (
        int(info.get("Num Buckets", "0") or 0),
        cols(info.get("Bucket Columns", "")),
        cols(info.get("Sort Columns", "")),
        info.get("Location"),
    )


def data_file_count(spark: SparkSession, name: str) -> int:
    """Number of data files behind a catalog table (fragmentation gauge)."""
    df = spark.table(name)
    return (
        df.select(F.input_file_name().alias("f")).distinct().count()
        if df.limit(1).count()
        else 0
    )


def compact_bucketed_table(spark: SparkSession, name: str) -> dict:
    """Rewrite a bucketed table in place down to ONE file per bucket.

    Every ``saveAsTable(mode="append")`` (snapshot batch appends, ingest
    compaction folds) adds at least one file per touched bucket, and a
    bucket fragmented across K files costs K-way merge reads in every
    bucket-local join. This is the maintenance job that collapses the
    fragmentation: repartitioning by (n_buckets, bucket_cols) aligns rows
    with the bucket hash (same Murmur3 hash on both paths), so each write
    task holds exactly one bucket and emits exactly one file, sorted per
    the spec.

    The input is materialized (``util.materialize`` — eager, so the
    rewrite reads checkpointed blocks, never the files being replaced)
    before the overwrite. The rewrite is NOT atomic: a crash mid-write
    leaves a partial table, which the snapshot manifest's row-count gate
    (`plans/snapshot.read_corpus_snapshot`) refuses to consume — detected,
    not silent; recover by re-publishing or re-running the fold. Run it
    single-writer in the maintenance window, like `compact_ingest_delta`.
    """
    from hadoop_jobanalyzer_spark.util import materialize_eager

    n_buckets, bucket_cols, sort_cols, location = table_bucket_spec(spark, name)
    if not bucket_cols:
        raise ValueError(f"{name} is not a bucketed table")
    files_before = data_file_count(spark, name)
    # materialize FIRST, repartition after: over the live table the scan's
    # bucket partitioning satisfies the repartition's distribution, so
    # Catalyst elides the exchange — and the auto-bucketed-scan heuristic
    # then reads with file-split tasks, writing task x bucket files. The
    # checkpointed frame has no bucket metadata, so the repartition is a
    # real 1-bucket-per-task shuffle (and the overwrite reads checkpointed
    # blocks, never the files it is replacing).
    df = materialize_eager(spark.table(name)).repartition(
        n_buckets, *[F.col(c) for c in bucket_cols]
    )
    write_bucketed(
        df, name, bucket_cols, n_buckets,
        sort_cols=sort_cols or None,
        path=location, mode="overwrite",
    )
    return {
        "table": name,
        "n_buckets": n_buckets,
        "files_before": files_before,
        "files_after": data_file_count(spark, name),
    }
