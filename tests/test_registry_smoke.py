"""Full-registry analysis smoke: every registered query must ANALYZE against
the current parquet files.

This pins the environment-drift class that broke q52 in round 2 (a Spark /
parquet-writer upgrade changed the events ``ts`` column to TIMESTAMP_NTZ and
``F.unix_millis`` rejected it at plan time, without any code change).
Building the DataFrame + forcing ``df.schema`` runs the full analyzer but no
jobs, so the sweep is cheap enough to run on every commit.
"""

import pytest

from hadoop_jobanalyzer_spark.plans.registry import QUERIES


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_analyzes(spark, sf_dir, name):
    fn, _ = QUERIES[name]
    df = fn(spark, sf_dir)
    assert len(df.schema.fields) > 0, f"{name} produced an empty schema"


def test_registry_orders_unverified_first():
    """The driver records only the first 50 registry entries per round; the
    ordering must put never-verified / red queries before stale greens so
    the union of rounds converges and old greens rotate through re-checks."""
    from hadoop_jobanalyzer_spark.plans import registry

    order = list(registry.queries())
    greens = registry._last_green_round()
    ranks = [greens.get(n, 0) for n in order]
    assert ranks == sorted(ranks), "registry order must be stalest-first"
