"""Parquet table loading for the synthetic star schema (TESTDATA.md)."""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame, SparkSession, functions as F

# Columns written as parquet TIMESTAMP(NANOS) — Spark refuses them unless
# read as raw longs (spark.sql.legacy.parquet.nanosAsLong); we rebuild a
# proper TimestampType (micros, same as DuckDB) losslessly via integer div.
NANO_TS_COLUMNS = {"ts", "l_shipdate", "o_orderdate"}

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


# Keyed on the live session object (weakly — a stopped, collected session
# must not pin its plans, and id() reuse after GC must not serve another
# session's DataFrames). Inner dict: sf_dir -> {table -> DataFrame}.
_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict[str, dict[str, DataFrame]]]" = (
    weakref.WeakKeyDictionary()
)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Read every table and register it as a temp view.

    Parquet scans keep predicate pushdown / column pruning available to every
    query built on top (verified via .explain PushedFilters/ReadSchema).
    DataFrames are immutable plans, so the dict is cached per
    (session, dir) — schema reads and view registration happen once, not
    once per query.
    """
    per_session = _CACHE.setdefault(spark, {})
    if sf_dir in per_session:
        # plans are reusable as-is, but temp views must repoint in case a
        # different sf_dir registered them since (driver runs two SFs in
        # one session)
        for name, df in per_session[sf_dir].items():
            df.createOrReplaceTempView(name)
        return per_session[sf_dir]
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        for col, dtype in df.dtypes:
            if col in NANO_TS_COLUMNS and dtype == "bigint":
                df = df.withColumn(col, F.expr(f"timestamp_micros({col} div 1000)"))
        df.createOrReplaceTempView(name)
        out[name] = df
    per_session[sf_dir] = out
    return out
