"""Differential tests for the warehouse-shape query set (q188+, the
remaining TPC-H forms adapted to this schema)."""

import pytest

from hadoop_jobanalyzer_spark.plans.warehouse_queries import (
    WAREHOUSE_QUERIES,
    _Q188_SEGMENT,
    _Q191_FRACTION_DEN,
    _Q192_SHARE_DEN,
    _Q192_TOKEN,
)

from tests.oracle_utils import compare, driver_sql, duck_connect


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connect(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(WAREHOUSE_QUERIES))
def test_warehouse_query_matches_oracle(spark, sf_dir, duck, name):
    fn, _ = WAREHOUSE_QUERIES[name]
    sql = driver_sql(name)
    problems = compare(fn(spark, sf_dir), duck, sql)
    assert not problems, f"{name}: {problems}"


@pytest.mark.parametrize("name", sorted(WAREHOUSE_QUERIES))
def test_warehouse_query_nonempty(spark, sf_dir, name):
    fn, _ = WAREHOUSE_QUERIES[name]
    assert fn(spark, sf_dir).count() > 0, f"{name} returned no rows at {sf_dir}"


# --- semantic spot checks ----------------------------------------------------


def test_shipping_priority_is_top10_sorted(spark, sf_dir):
    fn, _ = WAREHOUSE_QUERIES["q188_shipping_priority"]
    rows = fn(spark, sf_dir).collect()
    assert len(rows) == 10
    revs = [r["revenue_c"] for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_important_parts_all_exceed_threshold(spark, sf_dir):
    """Every returned part genuinely holds > 1/DEN of the global value —
    re-derived from the full per-part aggregate, not the query's output."""
    fn, _ = WAREHOUSE_QUERIES["q191_important_parts"]
    rows = fn(spark, sf_dir).collect()
    from pyspark.sql import functions as F

    from hadoop_jobanalyzer_spark.plans.tables import load_tables

    t = load_tables(spark, sf_dir)
    per_part = (
        t["lineitem"]
        .join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_partkey")
        .agg(
            F.sum(
                F.col("l_quantity").cast("long")
                * F.floor(F.col("p_retailprice") * 100).cast("long")
            ).alias("value_c")
        )
    )
    vals = {r["p_partkey"]: r["value_c"] for r in per_part.collect()}
    total = sum(vals.values())
    expected = {k for k, v in vals.items() if v * _Q191_FRACTION_DEN > total}
    assert {r["p_partkey"] for r in rows} == expected


def test_dominant_suppliers_share_bound(spark, sf_dir):
    """No supplier can dominate (> 1/DEN share) more parts than exist in
    the family, and every reported count is >= 1."""
    fn, _ = WAREHOUSE_QUERIES["q192_dominant_suppliers"]
    rows = fn(spark, sf_dir).collect()
    assert all(r["n_dominant_parts"] >= 1 for r in rows)
    # at most DEN-1 suppliers can each hold > 1/DEN of one part's volume,
    # so per part there are < DEN dominant suppliers; sanity: counts sum
    # is bounded by (DEN-1) * family size
    from pyspark.sql import functions as F

    from hadoop_jobanalyzer_spark.plans.tables import load_tables

    fam = (
        load_tables(spark, sf_dir)["part"]
        .filter(F.col("p_name").contains(_Q192_TOKEN))
        .count()
    )
    assert sum(r["n_dominant_parts"] for r in rows) <= (_Q192_SHARE_DEN - 1) * fam


def test_late_priority_split_counts_partition(spark, sf_dir):
    """high + low == total late lines (the CASE split loses nothing)."""
    from pyspark.sql import functions as F

    from hadoop_jobanalyzer_spark.plans.tables import load_tables

    fn, _ = WAREHOUSE_QUERIES["q193_late_priority_split"]
    rows = fn(spark, sf_dir).collect()
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].select("l_orderkey", "l_shipdate")
    orders = t["orders"].select("o_orderkey", "o_orderdate")
    n_late = li.join(
        orders,
        (li["l_orderkey"] == orders["o_orderkey"])
        & (li["l_shipdate"] > orders["o_orderdate"] + F.expr("INTERVAL 60 DAYS")),
    ).count()
    assert sum(r["high_line_count"] + r["low_line_count"] for r in rows) == n_late


def test_rfm_segments_cover_all_customers(spark, sf_dir):
    """Every customer with an order lands in exactly one segment, and all
    segment digits are in 1..4."""
    fn, _ = WAREHOUSE_QUERIES["q203_rfm_segments"]
    rows = fn(spark, sf_dir).collect()
    n_cust = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_custkey").distinct().count()
    )
    assert sum(r["n_customers"] for r in rows) == n_cust
    for r in rows:
        s = r["segment"]
        assert 111 <= s <= 444
        assert all(1 <= int(d) <= 4 for d in str(s))


def test_ship_lag_percentiles_match_numpy(spark, sf_dir):
    """p50/p95 equal the lower-rank order statistics computed directly."""
    import math

    from pyspark.sql import functions as F

    fn, _ = WAREHOUSE_QUERIES["q211_ship_lag_percentiles"]
    rows = {r["o_orderpriority"]: r for r in fn(spark, sf_dir).collect()}
    t_orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    t_li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    lags = (
        t_li.join(t_orders, t_li["l_orderkey"] == t_orders["o_orderkey"])
        .select(
            "o_orderpriority",
            F.datediff("l_shipdate", "o_orderdate").cast("long").alias("lag"),
        )
        .collect()
    )
    by_prio: dict = {}
    for r in lags:
        by_prio.setdefault(r["o_orderpriority"], []).append(r["lag"])
    for prio, vals in by_prio.items():
        vals.sort()
        n = len(vals)
        assert rows[prio]["n_lines"] == n
        assert rows[prio]["p50_lag_days"] == vals[math.ceil(0.5 * n) - 1]
        assert rows[prio]["p95_lag_days"] == vals[math.ceil(0.95 * n) - 1]


def test_supplier_scorecard_shape(spark, sf_dir):
    fn, _ = WAREHOUSE_QUERIES["q212_supplier_scorecard"]
    rows = fn(spark, sf_dir).collect()
    per_nation: dict = {}
    for r in rows:
        per_nation.setdefault(r["n_name"], []).append(r)
    for nation, rs in per_nation.items():
        assert [r["rk"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= 3
        revs = [r["revenue_c"] for r in rs]
        assert revs == sorted(revs, reverse=True)
        assert all(0.0 <= r["late_frac"] <= 1.0 for r in rs)
