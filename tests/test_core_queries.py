"""Differential tests: every registered core query vs its DuckDB oracle
(exact value equality — the driver's t2 gate, replicated locally)."""

import pytest

from hadoop_jobanalyzer_spark.plans.core_queries import CORE_QUERIES

from tests.oracle_utils import compare, driver_sql, duck_connect


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connect(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(CORE_QUERIES))
def test_core_query_matches_oracle(spark, sf_dir, duck, name):
    fn, _ = CORE_QUERIES[name]
    sql = driver_sql(name)
    problems = compare(fn(spark, sf_dir), duck, sql)
    assert not problems, f"{name}: {problems}"


@pytest.mark.parametrize("name", sorted(CORE_QUERIES))
def test_core_query_nonempty(spark, sf_dir, name):
    fn, _ = CORE_QUERIES[name]
    assert fn(spark, sf_dir).count() > 0, f"{name} returned no rows at {sf_dir}"


def test_asof_join_semantics(spark):
    from hadoop_jobanalyzer_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, 10, "p1"), (1, 20, "p2"), (2, 5, "p3")],
        "k long, t long, name string",
    )
    right = spark.createDataFrame(
        [(1, 10, "r@10"), (1, 15, "r@15"), (3, 1, "other")],
        "k long, t long, v string",
    )
    out = {
        r["name"]: r["v_asof"]
        for r in asof_join(left, right, ["k"], "t", "t", ["v"]).collect()
    }
    assert out == {
        "p1": "r@10",   # tie: right at equal ts matches ("at or before")
        "p2": "r@15",   # latest earlier right wins
        "p3": None,     # no right row for key 2 -> left-outer null
    }
