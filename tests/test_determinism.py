"""Every registered query must be run-to-run deterministic: the driver's
value-hash comparison (and any production re-run) depends on it. Catches
unstable collect_list ordering, unseeded randomness, and float
re-association leaks that the DuckDB differential cannot see."""

import pytest

from hadoop_jobanalyzer_spark.plans.registry import QUERIES


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_is_deterministic(spark, sf_dir, name):
    fn, _ = QUERIES[name]
    a = [tuple(r) for r in fn(spark, sf_dir).collect()]
    b = [tuple(r) for r in fn(spark, sf_dir).collect()]
    assert sorted(map(repr, a)) == sorted(map(repr, b)), f"{name} varies between runs"
