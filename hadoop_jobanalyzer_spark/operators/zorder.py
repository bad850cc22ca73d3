"""Z-order (Morton-curve) clustering for multi-dimensional data skipping.

Parquet min/max pruning only skips files/row-groups when the layout
correlates with the filter column. Sorting by one column gives that column
tight per-file ranges and leaves every other column's range wide; at 100 TB
a range predicate on the *second* dimension scans the whole table. Z-order
interleaves the bits of several quantized dimensions into one sort key, so
a range-sorted layout keeps per-file min/max tight on EVERY participating
dimension at once — the standard lakehouse layout technique (as in Delta
Lake's OPTIMIZE ZORDER BY, re-expressed here as plain codegen expressions +
``repartitionByRange``; no engine extension needed).

Everything is integer math inside whole-stage codegen; the only extra jobs
are one tiny min/max aggregation to fix the quantization ranges and the
range-exchange that ordering any layout requires.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def quantize(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Map ``col`` in [lo, hi] to an integer in [0, 2^bits): exact integer
    arithmetic, monotone, constant when the range collapses."""
    span = (hi - lo) + F.lit(1)
    q = ((col - lo) * F.lit(1 << bits)) / span
    return F.least(F.floor(q).cast("long"), F.lit((1 << bits) - 1))


def interleave_bits(cols: list[Column], bits: int) -> Column:
    """Morton code: bit k of column i lands at position ``k * n + i``.

    Expands to ``n * bits`` codegen AND/shift terms — no UDF, no loop at
    runtime. Supports ``n * bits <= 63`` (fits a signed long).
    """
    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a signed long")
    out = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        for k in range(bits):
            out = out + F.shiftleft(
                F.shiftright(c, k).bitwiseAND(F.lit(1)).cast("long"), k * n + i
            )
    return out


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 16
) -> DataFrame:
    """Attach ``_zvalue``: the Morton code of the named numeric columns,
    each min/max-quantized to ``bits`` bits.

    The ranges come from one scalar aggregation broadcast back over the
    table (a 1-row build side — constant cost at any scale).
    """
    stats = df.agg(
        *[F.min(c).cast("long").alias(f"_lo_{c}") for c in cols],
        *[F.max(c).cast("long").alias(f"_hi_{c}") for c in cols],
    )
    joined = df.join(F.broadcast(stats))
    qs = [
        quantize(
            F.col(c).cast("long"), F.col(f"_lo_{c}"), F.col(f"_hi_{c}"), bits
        )
        for c in cols
    ]
    return joined.withColumn("_zvalue", interleave_bits(qs, bits)).drop(
        *[f"_lo_{c}" for c in cols], *[f"_hi_{c}" for c in cols]
    )


def cluster_by_zorder(
    df: DataFrame, cols: list[str], bits: int = 16, num_files: int | None = None
) -> DataFrame:
    """Return ``df`` laid out in Z-order: range-partitioned and sorted by
    the Morton key, ready to write. Each output file then carries a tight
    min/max envelope on every clustered column, so parquet footer pruning
    skips files for predicates on ANY of them.

    ``num_files`` sets the range-partition count (defaults to the session
    shuffle parallelism). Write with ``.write.parquet(...)`` as usual.
    """
    keyed = zorder_key(df, cols, bits)
    if num_files is not None:
        keyed = keyed.repartitionByRange(num_files, "_zvalue")
    else:
        keyed = keyed.repartitionByRange("_zvalue")
    return keyed.sortWithinPartitions("_zvalue").drop("_zvalue")
