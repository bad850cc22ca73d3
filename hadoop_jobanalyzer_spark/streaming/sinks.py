"""Streaming file sink with exactly-once file semantics.

Structured Streaming's built-in file sink is append-only and tracks its
own manifest; pipelines that need hive-partitioned output readable by any
engine (DuckDB, Trino, plain parquet readers) use ``foreachBatch`` with an
IDEMPOTENT batch writer instead. Idempotency contract: a micro-batch may
be REPLAYED after a failure (same data, same batch_id); the writer must
land the same files, not duplicates.

The technique here: the batch id becomes a partition column, and the
write uses dynamic partition overwrite — so a replayed batch overwrites
exactly its own ``_batch_id=N/...`` directories and never touches other
batches' output. Readers just read the root (the `_batch_id` column is
dropped or ignored). At 100 TB/day this is also the natural compaction
unit: a maintenance job rewrites old `_batch_id` partitions into larger
files without coordinating with the live stream.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, functions as F


def idempotent_batch_writer(
    path: str, partition_cols: list[str]
) -> Callable[[DataFrame, int], None]:
    """A ``foreachBatch`` function writing each micro-batch as
    hive-partitioned parquet under ``path``, idempotent on replay.

    Rows are repartitioned by the partition columns first (one file per
    output directory per batch — the same no-small-files contract as
    ``sinks.write_partitioned``)."""

    def write(df: DataFrame, batch_id: int) -> None:
        (
            df.withColumn("_batch_id", F.lit(batch_id))
            .repartition(*[F.col(c) for c in partition_cols])
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id", *partition_cols)
            .parquet(path)
        )

    return write


def write_stream_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    checkpoint: str,
):
    """Start an availableNow streaming write of ``df`` into the idempotent
    hive-partitioned layout. Returns the StreamingQuery."""
    return (
        df.writeStream.foreachBatch(idempotent_batch_writer(path, partition_cols))
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def upsert_batch_writer(
    path: str, key_cols: list[str], partition_col: str
) -> Callable[[DataFrame, int], None]:
    """A ``foreachBatch`` function applying each micro-batch as a
    copy-on-write MERGE into a hive-partitioned parquet table
    (``sinks.merge_parquet``) — the streaming CDC-apply shape: the
    stream carries row-level upserts (latest row per key wins within a
    batch), the table converges to one row per key.

    Replay safety comes from merge semantics rather than batch-id
    partitioning: re-applying the same batch anti-joins away the rows it
    already wrote and rewrites the same partitions to identical content,
    so a failure/restart cannot duplicate keys. The first batch
    bootstraps the table with a plain partitioned write.
    """
    from pyspark.sql.window import Window

    from hadoop_jobanalyzer_spark.sinks import merge_parquet, write_partitioned

    def write(df: DataFrame, batch_id: int) -> None:
        # latest row per key within the batch (micro-batches can carry
        # several versions of a key; merge expects one)
        w = Window.partitionBy(*key_cols).orderBy(F.lit(1))
        latest = (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        spark = latest.sparkSession
        try:
            spark.read.parquet(path).limit(1).collect()
            exists = True
        except Exception:
            exists = False
        if not exists:
            write_partitioned(latest, path, [partition_col])
        else:
            merge_parquet(spark, latest, path, key_cols, partition_col)

    return write
