"""Training-shard assignment and writing.

The last step of a cleaning pipeline is materializing the corpus as N
equal-ish shards that trainers stream independently. Assignment must be a
pure function of the document key (md5-mod, the same portable construction
as operators/sampling.py) so that re-running the pipeline — or running it
on another engine — produces byte-identical shard membership, and so that
appending new documents never moves previously-assigned ones between
shards (trainers can resume from a manifest).

At 100 TB the write plan matters more than the assignment: `repartition`
on the shard id gives one shuffle to co-locate each shard, then
`partitionBy` emits one file per shard per task. Because every shard's
rows land in exactly one task, each shard directory holds exactly one
file — the layout trainers want (shard = one sequential read).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from hadoop_jobanalyzer_spark.operators.sampling import hash_bucket


def assign_shards(df: DataFrame, key: Column, n_shards: int) -> DataFrame:
    """Add a deterministic ``shard`` column in [0, n_shards)."""
    return df.withColumn("shard", hash_bucket(key, n_shards))


def shard_manifest(
    df: DataFrame, key: Column, n_shards: int, bytes_col: Column
) -> DataFrame:
    """Per-shard manifest: row count, payload bytes, and key range.

    One partial-aggregating groupBy (n_shards groups — tiny shuffle); the
    balance check a pipeline runs before and after writing shards. Key
    range bounds (min/max of the key) let an incremental run verify a
    shard's membership hasn't drifted without re-reading payloads.
    """
    return (
        assign_shards(df, key, n_shards)
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(bytes_col.cast("long")).alias("n_bytes"),
            F.min(key).alias("min_key"),
            F.max(key).alias("max_key"),
        )
        .orderBy("shard")
    )


def write_training_shards(
    df: DataFrame, path: str, key: Column, n_shards: int
) -> None:
    """Write ``df`` as ``path/shard=K/`` parquet, one file per shard.

    ``repartition(n_shards, "shard")`` hashes on the shard id, so a shard's
    rows always land in a single task; ``partitionBy("shard")`` then emits
    exactly one file under each ``shard=K`` directory. Shard-id hash
    collisions only co-locate two shards in one task (two files, separate
    directories) — never split a shard across files.
    """
    (
        assign_shards(df, key, n_shards)
        .repartition(n_shards, "shard")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
