"""Differential-test harness mirroring the driver's t2 check: run a Spark
query and its DuckDB oracle on the same parquet, compare row count, column
names, and (column-name-sorted, row-sorted) values."""

from __future__ import annotations

import math
import struct

import duckdb

from hadoop_jobanalyzer_spark.plans.tables import TABLES


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _normalize(df):
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


#: DuckDB types that do not round-trip through pandas as int64 — the driver's
#: representation-sensitive value hash mismatches them against Spark's BIGINT
#: even when every value is equal (round-4 verdict: 27 reds, 31 latent).
_BAD_ORACLE_TYPES = {"HUGEINT", "UHUGEINT"}


def _dtype_kind(dtype) -> str:
    """Coarse dtype class for cross-engine compatibility: the driver hashes
    by representation, so int-vs-float/object on the same column is a fail
    even when values compare numerically equal."""
    k = dtype.kind  # numpy kind: i/u int, f float, b bool, O object, M datetime...
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return "float"
    return k


def oracle_type_problems(con, sql: str) -> list[str]:
    """Plan-only scan (no execution) for oracle output types the driver's
    hash cannot canonicalize against Spark."""
    rel = con.sql(sql)
    return [
        f"oracle column {c} has driver-hostile type {t}"
        for c, t in zip(rel.columns, map(str, rel.types))
        if str(t) in _BAD_ORACLE_TYPES
    ]


def compare(spark_df, con, sql: str, float_tol: float = 0.0) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    problems = oracle_type_problems(con, sql)
    if problems:
        return problems
    ours = spark_df.toPandas()
    theirs = con.execute(sql).df()
    if sorted(ours.columns) != sorted(theirs.columns):
        problems.append(f"columns: spark={sorted(ours.columns)} oracle={sorted(theirs.columns)}")
        return problems
    if len(ours) != len(theirs):
        problems.append(f"row count: spark={len(ours)} oracle={len(theirs)}")
        return problems
    for col in sorted(ours.columns):
        ka, kb = _dtype_kind(ours[col].dtype), _dtype_kind(theirs[col].dtype)
        # any cross-engine dtype-kind split risks the driver's
        # representation-sensitive hash (int-vs-float is the proven killer;
        # bool-vs-int and object-vs-numeric would fail the same way). The
        # full registry measures ZERO kind splits at sf0.01, so this is a
        # pure guard against future drift. Datetime unit differences
        # (ns vs us) share kind 'M' and are driver-green (q132/q138).
        if ka != kb:
            problems.append(
                f"dtype mismatch on {col}: spark={ours[col].dtype} oracle={theirs[col].dtype}"
            )
    if problems:
        return problems
    a, b = _normalize(ours), _normalize(theirs)
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if x is None and y is None:
                continue
            if isinstance(x, float) and isinstance(y, float):
                if math.isnan(x) and math.isnan(y):
                    continue
                if float_tol:
                    if x == y or abs(x - y) <= float_tol:
                        continue
                # default: BIT-exact doubles — `==` would accept -0.0 vs 0.0,
                # which a representation-sensitive hash does not (the full
                # registry measures bit-identical at sf0.01, so this costs
                # nothing and pins the sign-of-zero class)
                elif struct.pack("<d", x) == struct.pack("<d", y):
                    continue
                problems.append(f"{col}[{i}]: spark={x!r} oracle={y!r}")
            elif x != y:
                problems.append(f"{col}[{i}]: spark={x!r} oracle={y!r}")
            if len(problems) >= 5:
                return problems
    return problems


def driver_sql(name: str) -> str | None:
    """The oracle SQL the DRIVER actually runs for ``name``:
    ``registry.oracle_sql()`` applies the BIGINT retype wrapper
    (``_BIGINT_CASTS``), so differential tests must resolve through it —
    a raw module ``Q*_SQL`` constant can carry a HUGEINT output column
    that the wrapper fixes."""
    from hadoop_jobanalyzer_spark.plans import registry

    return registry.oracle_sql().get(name)
