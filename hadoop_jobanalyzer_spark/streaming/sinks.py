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
