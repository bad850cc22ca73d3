"""Differential-test harness mirroring the driver's t2 check: run a Spark
query and its DuckDB oracle on the same parquet, compare row count, column
names, and (column-name-sorted, row-sorted) values."""

from __future__ import annotations

import math

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


def compare(spark_df, con, sql: str, float_tol: float = 0.0) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    ours = spark_df.toPandas()
    theirs = con.execute(sql).df()
    problems: list[str] = []
    if sorted(ours.columns) != sorted(theirs.columns):
        problems.append(f"columns: spark={sorted(ours.columns)} oracle={sorted(theirs.columns)}")
        return problems
    if len(ours) != len(theirs):
        problems.append(f"row count: spark={len(ours)} oracle={len(theirs)}")
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
                if x == y or (float_tol and abs(x - y) <= float_tol):
                    continue
                problems.append(f"{col}[{i}]: spark={x!r} oracle={y!r}")
            elif x != y:
                problems.append(f"{col}[{i}]: spark={x!r} oracle={y!r}")
            if len(problems) >= 5:
                return problems
    return problems
