"""Bucketed-table tests: the join of two same-key bucketed tables must plan
without a shuffle (the write-time bucketing replaces it)."""

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from hadoop_jobanalyzer_spark.sources.bucketed import read_table, write_bucketed


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture
def no_broadcast(spark):
    """Force the sort-merge path so the Exchange assertion is meaningful
    (tiny test tables would otherwise broadcast)."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")


def test_bucketed_join_has_no_exchange(spark, tmp_path, no_broadcast):
    orders = spark.range(1000).select(
        F.col("id").alias("o_key"), (F.col("id") % 7).alias("o_val")
    )
    items = spark.range(3000).select(
        (F.col("id") % 1000).alias("l_key"), (F.col("id") % 13).alias("l_qty")
    )
    write_bucketed(orders, "t_orders_b", ["o_key"], 8, sort_cols=["o_key"],
                   path=str(tmp_path / "orders"))
    write_bucketed(items, "t_items_b", ["l_key"], 8, sort_cols=["l_key"],
                   path=str(tmp_path / "items"))
    try:
        joined = read_table(spark, "t_orders_b").join(
            read_table(spark, "t_items_b"),
            F.col("o_key") == F.col("l_key"),
        )
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        assert joined.count() == 3000
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_items_b")


def test_bucketed_groupby_has_no_exchange(spark, tmp_path, no_broadcast):
    df = spark.range(1000).select((F.col("id") % 100).alias("k"), F.col("id").alias("v"))
    write_bucketed(df, "t_grp_b", ["k"], 4, path=str(tmp_path / "grp"))
    try:
        agg = read_table(spark, "t_grp_b").groupBy("k").agg(F.sum("v").alias("s"))
        plan = _plan(agg)
        assert "Exchange" not in plan, f"bucketed groupBy still shuffles:\n{plan}"
        assert agg.count() == 100
    finally:
        spark.sql("DROP TABLE IF EXISTS t_grp_b")
