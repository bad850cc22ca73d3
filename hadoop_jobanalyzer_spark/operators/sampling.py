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


def weighted_sample(
    df: DataFrame,
    key: Column,
    weight: Column,
    expected_rows: int,
) -> DataFrame:
    """Deterministic weighted Bernoulli sample with expected size
    ``expected_rows``: row i is kept iff ``u_i < expected_rows * w_i / W``
    where ``u_i`` is an md5-derived uniform in [0, 1) and ``W`` the total
    weight — the standard Poisson/probability-proportional-to-size design
    for corpus mixing (upweight rare sources, downweight boilerplate).

    Same portability contract as :func:`hash_bucket`: membership is a pure
    function of the key, so reruns, engine ports (the DuckDB oracle), and
    corpus appends never reshuffle prior decisions. ``W`` comes from one
    scalar aggregation (1-row broadcast); everything else is one md5 plus
    codegen double math (IEEE division/multiplication round identically in
    any engine — no ln/pow, whose libm rounding is engine-specific).
    Adds ``_weight`` and ``_p`` (the inclusion probability, for
    Horvitz-Thompson reweighting downstream).
    """
    u = (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("double")
        / F.lit(float(1 << 32))
    )
    tot = df.select(F.sum(weight.cast("double")).alias("_w_total"))
    return (
        df.withColumn("_weight", weight.cast("double"))
        .join(F.broadcast(tot))
        .withColumn(
            "_p",
            F.least(
                F.lit(float(expected_rows)) * F.col("_weight") / F.col("_w_total"),
                F.lit(1.0),
            ),
        )
        .filter(u < F.col("_p"))
        .drop("_w_total")
    )


def train_val_test(key: Column, train_pct: int = 80, val_pct: int = 10) -> Column:
    """Deterministic split label ('train' | 'val' | 'test') from the key."""
    b = hash_bucket(key, 100)
    return (
        F.when(b < train_pct, F.lit("train"))
        .when(b < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )
