"""Differential tests: every registered core query vs its DuckDB oracle
(exact value equality — the driver's t2 gate, replicated locally)."""

import pytest

from hadoop_jobanalyzer_spark.plans.core_queries import CORE_QUERIES

from tests.oracle_utils import compare, duck_connect


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connect(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(CORE_QUERIES))
def test_core_query_matches_oracle(spark, sf_dir, duck, name):
    fn, sql = CORE_QUERIES[name]
    problems = compare(fn(spark, sf_dir), duck, sql)
    assert not problems, f"{name}: {problems}"


@pytest.mark.parametrize("name", sorted(CORE_QUERIES))
def test_core_query_nonempty(spark, sf_dir, name):
    fn, _ = CORE_QUERIES[name]
    assert fn(spark, sf_dir).count() > 0, f"{name} returned no rows at {sf_dir}"
