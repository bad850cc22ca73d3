"""Join operators Spark lacks as built-ins, composed from DataFrame ops.

As-of join (time-series point lookup): for each left row, the latest right
row with ``right_ts <= left_ts`` per key. Spark has no ASOF JOIN; a naive
non-equi range join explodes to O(left x right) per key. The union-sentinel
plan here is the scalable form:

    union(right-tagged, left-tagged)
      -> window last(value, ignorenulls) over (key ORDER BY ts, side)
      -> keep left rows

Cost: ONE shuffle of |left| + |right| rows on the key, then a linear
window sweep — the same shape Flink/kdb-style as-of implementations use.
Right rows sort before left rows at equal timestamps, so "at or before"
includes ties.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def range_join(
    left: DataFrame,
    right: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
) -> DataFrame:
    """Inner-join left rows to right intervals with ``lo <= value < hi``.

    A naive non-equi join degenerates to a per-key cross product (Spark
    plans it as BroadcastNestedLoopJoin — O(|left| x |right|) comparisons).
    This is the bucketed form: every interval is expanded to the width
    buckets it covers, the join is an equi-join on bucket id, and the exact
    range predicate filters the candidates. ``bucket_width`` should be of
    the order of the typical interval width (narrower -> more interval
    duplication, wider -> more false candidates).

    Inner only: the bucket explode duplicates intervals and the post-join
    range filter would drop outer-extended null rows, so any outer variant
    of this plan yields wrong results by construction.
    """
    bucket = F.floor(F.col(value_col) / F.lit(bucket_width))
    r_buckets = right.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(bucket_width)),
                # hi is exclusive: the bucket containing hi still overlaps
                # [lo, hi) unless hi is exactly on the boundary
                F.floor((F.col(hi_col) - F.lit(1e-9)) / F.lit(bucket_width)),
            )
        ),
    )
    joined = left.withColumn("_bucket", bucket).join(r_buckets, "_bucket", "inner")
    return joined.filter(
        (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    ).drop("_bucket")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right[right_ts] <= left[left_ts]``, matching on the ``on`` key
    columns. Right columns arrive suffixed; unmatched lefts keep nulls
    (left-outer as-of).

    The right side must be unique per (key, right_ts) — pre-dedup it if
    not, or the tie pick is nondeterministic.
    """
    rtag = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
        *[F.lit(None).alias(f"_l_{c}") for c in left.columns],
    )
    ltag = left.select(
        *[F.col(c) for c in on],
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"{c}{suffix}") for c in right_cols],
        *[F.col(c).alias(f"_l_{c}") for c in left.columns],
    )
    w = (
        Window.partitionBy(*on)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = rtag.unionByName(ltag).select(
        "*",
        *[
            F.last(f"{c}{suffix}", ignorenulls=True).over(w).alias(f"_carry_{c}")
            for c in right_cols
        ],
    )
    return carried.filter(F.col("_side") == 1).select(
        *[F.col(f"_l_{c}").alias(c) for c in left.columns],
        *[F.col(f"_carry_{c}").alias(f"{c}{suffix}") for c in right_cols],
    )
