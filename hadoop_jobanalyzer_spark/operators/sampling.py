"""Deterministic, engine-portable sampling for training-data pipelines.

Hash-mod sampling beats ``df.sample`` for pipeline work because membership
is a pure function of the row key: re-running the pipeline (or running it on
another engine — the DuckDB oracles reproduce it exactly) yields the same
sample, additions to the corpus never reshuffle previously-assigned rows,
and train/val/test splits stay disjoint by construction. It is also free at
scale: one md5 per row, no shuffle, fully codegen after the hash.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def hash_bucket(key: Column, mod: int = 100) -> Column:
    """Stable bucket in [0, mod) from the md5 of the key's string form.

    Uses the first 8 md5 hex digits via base-16 conv — the same portable
    construction as the MinHash family (operators/dedup.py), reproducible in
    any engine as ``('0x' || substr(md5(k),1,8))::BIGINT % mod``.
    """
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("long") % mod


def hash_sample(df: DataFrame, key: Column, pct: int, mod: int = 100) -> DataFrame:
    """Keep rows whose hash bucket < pct (a deterministic pct/mod sample)."""
    return df.withColumn("bucket", hash_bucket(key, mod)).filter(F.col("bucket") < pct)


def train_val_test(key: Column, train_pct: int = 80, val_pct: int = 10) -> Column:
    """Deterministic split label ('train' | 'val' | 'test') from the key."""
    b = hash_bucket(key, 100)
    return (
        F.when(b < train_pct, F.lit("train"))
        .when(b < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )
