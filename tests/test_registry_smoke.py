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
    greens, reds = registry._verification_history()

    def bucket(n):
        return 0 if n in reds else (1 if n not in greens else 2)

    buckets = [bucket(n) for n in order]
    assert buckets == sorted(buckets), "reds, then never-verified, then greens"
    green_rounds = [greens[n] for n in order if n in greens]
    assert green_rounds == sorted(green_rounds), "greens must be stalest-first"
    # whatever the artifacts say needs (re-)verification sits at the front:
    # every red, then never-verified queries, fill the 50-row driver cap
    # before any green does (derived from the artifacts, never hardcoded —
    # a name pinned here would start failing the moment the driver records
    # it green and rotation correctly moves it back).
    must_front = [n for n in order if bucket(n) < 2]
    for name in must_front[:50]:
        assert name in order[:50], f"{name} (red/never-verified) outside the cap"
