"""Differential tests for the behavioural/data-quality query set (q140+)
and the expectations operator behind q143."""

import os

import pytest
from pyspark.sql import Row, functions as F

from hadoop_jobanalyzer_spark.plans.behavior_queries import BEHAVIOR_QUERIES

from tests.oracle_utils import compare, duck_connect


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connect(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(BEHAVIOR_QUERIES))
def test_behavior_query_matches_oracle(spark, sf_dir, duck, name):
    fn, sql = BEHAVIOR_QUERIES[name]
    problems = compare(fn(spark, sf_dir), duck, sql)
    assert not problems, f"{name}: {problems}"


@pytest.mark.parametrize("name", sorted(BEHAVIOR_QUERIES))
def test_behavior_query_nonempty(spark, sf_dir, name):
    fn, _ = BEHAVIOR_QUERIES[name]
    assert fn(spark, sf_dir).count() > 0, f"{name} returned no rows at {sf_dir}"


# --- operator-level unit tests ----------------------------------------------


def test_expectations_every_kind_on_planted_data(spark):
    """Each check kind counts exactly the planted violations."""
    from hadoop_jobanalyzer_spark.operators.expectations import (
        Check,
        expectations_report,
    )

    df = spark.createDataFrame(
        [
            Row(a=None, b=1, c=5, d="x", e=-1, f="ok-1"),
            Row(a=1, b=1, c=50, d="y", e=0, f="ok-2"),
            Row(a=2, b=2, c=200, d="z", e=3, f="bad"),
        ]
    )
    checks = [
        Check("a_not_null", "a", "not_null"),
        Check("b_unique", "b", "unique"),
        Check("c_range", "c", "between", lo=0, hi=100),
        Check("d_in_set", "d", "in_set", values=("x", "y")),
        Check("e_non_negative", "e", "non_negative"),
        Check("f_format", "f", "matches", pattern="^ok-"),
    ]
    got = {
        r["check_name"]: (r["n_violations"], r["passed"])
        for r in expectations_report(df, "t", checks).collect()
    }
    assert got == {
        "a_not_null": (1, False),
        "b_unique": (1, False),
        "c_range": (1, False),
        "d_in_set": (1, False),
        "e_non_negative": (1, False),
        "f_format": (1, False),
    }


def test_expectations_single_scan_per_table(spark, sf_dir):
    """The whole orders suite must compile to ONE scan of orders (plus the
    expand the distinct check adds) — adding checks must not add passes
    over the data."""
    from hadoop_jobanalyzer_spark.plans.behavior_queries import _suite
    from hadoop_jobanalyzer_spark.operators.expectations import expectations_report

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    rep = expectations_report(orders, "orders", _suite()["orders"])
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan


def test_expectations_pass_on_clean_data(spark):
    from hadoop_jobanalyzer_spark.operators.expectations import (
        Check,
        expectations_report,
    )

    df = spark.createDataFrame([Row(x=1), Row(x=2)])
    rep = expectations_report(
        df, "t", [Check("x_unique", "x", "unique"), Check("x_nn", "x", "not_null")]
    ).collect()
    assert all(r["passed"] and r["n_violations"] == 0 for r in rep)


def _clone_sf(sf_dir: str, tmp: str, overrides: dict) -> None:
    """Copy the tiny sf dir, replacing `overrides` tables with written DFs —
    lets hand-case tests run the REAL query path (load_tables reads every
    table eagerly)."""
    import shutil

    from hadoop_jobanalyzer_spark.plans.tables import TABLES

    for t in TABLES:
        if t in overrides:
            overrides[t].write.parquet(f"{tmp}/{t}.parquet")
        else:
            src = f"{sf_dir}/{t}.parquet"
            if os.path.isdir(src):
                shutil.copytree(src, f"{tmp}/{t}.parquet")
            else:
                shutil.copy(src, f"{tmp}/{t}.parquet")


def test_streak_islands_hand_case(spark, sf_dir):
    """Hand-checkable streak: days {1,2,3, 7,8, 12} -> best streak 3."""
    from hadoop_jobanalyzer_spark.plans.behavior_queries import q140_order_streaks
    import datetime

    rows = [
        Row(
            o_custkey=1,
            o_orderdate=datetime.datetime(1995, 1, d),
            o_orderkey=d,
            o_orderstatus="O",
            o_totalprice=1.0,
            o_orderpriority="1-URGENT",
        )
        for d in (1, 2, 3, 7, 8, 12)
    ]
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        _clone_sf(sf_dir, tmp, {"orders": spark.createDataFrame(rows)})
        out = q140_order_streaks(spark, tmp).collect()
    assert [(r["best_streak"], r["n_customers"]) for r in out] == [(3, 1)]


def test_spearman_perfect_and_reversed(spark, sf_dir):
    """rho == 1 for an identical ranking, -1 for a reversed one."""
    import tempfile

    from hadoop_jobanalyzer_spark.plans.behavior_queries import (
        q141_spearman_len_tokens,
    )

    rows = []
    # source "up": token count increases with n_chars (identical order)
    for i in range(5):
        rows.append(
            Row(
                doc_id=i,
                source="up",
                n_chars=10 + i,
                text=" ".join(["w"] * (i + 1)),
                lang="en",
            )
        )
    # source "down": token count decreases as n_chars increases
    for i in range(5):
        rows.append(
            Row(
                doc_id=100 + i,
                source="down",
                n_chars=10 + i,
                text=" ".join(["w"] * (5 - i)),
                lang="en",
            )
        )
    with tempfile.TemporaryDirectory() as tmp:
        docs = spark.createDataFrame(rows).withColumn(
            "n_chars", F.col("n_chars").cast("long")
        )
        _clone_sf(sf_dir, tmp, {"documents": docs})
        out = {
            r["source"]: r["rho"] for r in q141_spearman_len_tokens(spark, tmp).collect()
        }
    assert out["up"] == pytest.approx(1.0)
    assert out["down"] == pytest.approx(-1.0)


def test_benford_shares_sum_to_one(spark, sf_dir):
    from hadoop_jobanalyzer_spark.plans.behavior_queries import (
        q142_benford_order_values,
    )

    rows = q142_benford_order_values(spark, sf_dir).collect()
    assert sum(r["share"] for r in rows) == pytest.approx(1.0)
    assert all(r["digit"] in "123456789" for r in rows)
