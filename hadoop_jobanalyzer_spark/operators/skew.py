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


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: spread each hot join key over ``n_salts``
    reducers.

    Left rows get a deterministic salt from the hash of the whole row's
    non-key columns; right rows are replicated once per salt value. The
    join key becomes (keys..., salt), so a key that concentrated 10% of
    the fact table on one task now spreads over n_salts tasks, at the
    price of an n_salts-times-larger build side — the standard trade when
    AQE's skew splitting can't kick in (e.g. a hash-partitioned shuffle
    feeding a window, or a build side too big to broadcast but replicable).

    Results are row-identical to the plain join (tested). ``how`` supports
    'inner' and 'left' (right-side replication preserves both).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    non_key = [c for c in left.columns if c not in on]
    salt = (
        F.pmod(F.hash(*[F.col(c) for c in non_key]), F.lit(n_salts))
        if non_key
        else F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    )
    l_salted = left.withColumn("_salt", salt)
    r_salted = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return l_salted.join(r_salted, [*on, "_salt"], how).drop("_salt")


def key_skew_profile(df: DataFrame, key: str, top_n: int = 10) -> DataFrame:
    """Hot-key diagnostic: per-key row counts for the ``top_n`` heaviest
    values of ``key``, with each key's share of the table and its ratio to
    the mean per-key count. This is the report you run BEFORE choosing a
    join/agg strategy at scale — it tells you whether a key needs salting
    (``salted_join``), AQE skew splitting, or nothing.

    One partial-aggregating groupBy produces per-key counts; totals reduce
    to a 1-row broadcast; the top-N is a TakeOrdered, never a full sort.
    Output: (key_value, n, share, x_mean) ordered by n desc with the key
    as deterministic tiebreak.
    """
    counts = df.groupBy(F.col(key).cast("string").alias("key_value")).agg(
        F.count("*").alias("n")
    )
    totals = counts.agg(
        F.sum("n").alias("_total"), F.count("*").alias("_n_keys")
    )
    return (
        counts.join(F.broadcast(totals))
        .select(
            "key_value",
            "n",
            F.round(F.col("n") / F.col("_total"), 6).alias("share"),
            F.round(F.col("n") * F.col("_n_keys") / F.col("_total"), 3).alias(
                "x_mean"
            ),
        )
        .orderBy(F.desc("n"), "key_value")
        .limit(top_n)
    )
