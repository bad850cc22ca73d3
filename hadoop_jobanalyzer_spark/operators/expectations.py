"""Declarative data-quality expectations (Deequ/Great-Expectations shape).

A check suite compiles to ONE aggregate pass per table: every check becomes
a violation-count expression folded into a single ``agg`` (map-side partial
aggregation does almost all the work), and the per-check rows come from an
in-row ``stack`` unpivot of that single aggregate row. At 100 TB this is
exactly one scan + one 1-row exchange per table regardless of how many
checks are attached.

Uniqueness is ``count(col) - count(DISTINCT col)``; Spark plans the
distinct via two-phase expand, so keep the number of *distinct-needing*
checks per table small (each adds an expand duplicate of the scan rows).
Every other check kind is a plain conditional sum.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One expectation over one column.

    kind:
      - ``not_null``  — value must not be NULL
      - ``unique``    — no duplicate non-null values in the column
      - ``between``   — value in [lo, hi] (NULLs ignored)
      - ``in_set``    — value member of ``values`` (NULLs ignored)
      - ``non_negative`` — value >= 0 (NULLs ignored)
      - ``matches``   — value rlike ``pattern`` (NULLs ignored)
    """

    name: str
    column: str
    kind: str
    lo: Any = None
    hi: Any = None
    values: tuple = field(default_factory=tuple)
    pattern: str | None = None


def _violation_expr(c: Check) -> Column:
    col = F.col(c.column)
    if c.kind == "not_null":
        return F.sum(F.when(col.isNull(), 1).otherwise(0))
    if c.kind == "unique":
        return F.count(col) - F.countDistinct(col)
    if c.kind == "between":
        bad = col.isNotNull() & ((col < F.lit(c.lo)) | (col > F.lit(c.hi)))
        return F.sum(F.when(bad, 1).otherwise(0))
    if c.kind == "in_set":
        bad = col.isNotNull() & ~col.isin(list(c.values))
        return F.sum(F.when(bad, 1).otherwise(0))
    if c.kind == "non_negative":
        bad = col.isNotNull() & (col < 0)
        return F.sum(F.when(bad, 1).otherwise(0))
    if c.kind == "matches":
        bad = col.isNotNull() & ~col.rlike(c.pattern)
        return F.sum(F.when(bad, 1).otherwise(0))
    raise ValueError(f"unknown check kind: {c.kind}")


def expectations_report(df: DataFrame, table: str, checks: list[Check]) -> DataFrame:
    """Run a check suite over one table in a single aggregate scan.

    Returns ``(tbl, check_name, n_violations, passed)`` — one row per
    check, exact integer counts (drives both the CI gate and the oracle
    differential).
    """
    aggs = [
        F.coalesce(_violation_expr(c), F.lit(0)).cast("long").alias(f"v{i}")
        for i, c in enumerate(checks)
    ]
    one = df.agg(*aggs)
    stack_args = ", ".join(f"'{c.name}', v{i}" for i, c in enumerate(checks))
    return (
        one.selectExpr(
            f"stack({len(checks)}, {stack_args}) AS (check_name, n_violations)"
        )
        .select(
            F.lit(table).alias("tbl"),
            "check_name",
            "n_violations",
            (F.col("n_violations") == 0).alias("passed"),
        )
    )


def suite_report(tables: dict[str, DataFrame], suite: dict[str, list[Check]]) -> DataFrame:
    """Union of per-table reports — one aggregate pass per table."""
    parts = [
        expectations_report(tables[t], t, checks) for t, checks in suite.items()
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
