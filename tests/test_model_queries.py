"""Differential + semantic tests for the model-building queries (q233+)."""

import pytest
from pyspark.sql import functions as F

from hadoop_jobanalyzer_spark.plans.model_queries import MODEL_QUERIES

from tests.oracle_utils import compare, driver_sql, duck_connect


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connect(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(MODEL_QUERIES))
def test_model_query_matches_oracle(spark, sf_dir, duck, name):
    fn, _ = MODEL_QUERIES[name]
    sql = driver_sql(name)
    problems = compare(fn(spark, sf_dir), duck, sql)
    assert not problems, f"{name}: {problems}"


@pytest.mark.parametrize("name", sorted(MODEL_QUERIES))
def test_model_query_nonempty(spark, sf_dir, name):
    fn, _ = MODEL_QUERIES[name]
    assert fn(spark, sf_dir).count() > 0, f"{name} returned no rows at {sf_dir}"


def test_kmeans_iterated_partitions_the_vectors(spark, sf_dir):
    """The final census partitions the embedding table, every cell id is
    one of the k deterministic seeds, and inertia is non-negative."""
    fn, _ = MODEL_QUERIES["q233_kmeans_iterated"]
    rows = fn(spark, sf_dir).collect()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    assert sum(r["n_assigned"] for r in rows) == emb.count()
    seeds = {r["vec_id"] for r in emb.orderBy("vec_id").limit(8).collect()}
    assert {r["cell"] for r in rows} <= seeds
    assert all(r["sse_fixed"] >= 0 for r in rows)


def test_kmeans_iterated_one_round_matches_step_assignment(spark, sf_dir):
    """With rounds=1 there are no centroid updates, so the final census
    must agree with kmeans_step's per-cell assignment counts (the two
    operators share the argmin contract on the same seeds)."""
    from hadoop_jobanalyzer_spark.operators.quantize import kmeans_iterated, kmeans_step

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    one = {
        r["cell"]: r["n_assigned"]
        for r in kmeans_iterated(emb, "vec_id", "embedding", k=8, rounds=1).collect()
    }
    step = {
        r["cell"]: r["n_assigned"]
        for r in kmeans_step(emb, "vec_id", "embedding", k=8).collect()
    }
    assert one == step


def test_kmeans_iterated_refinement_improves_inertia(spark, sf_dir):
    """Lloyd monotonically reduces total SSE; the lattice round-off per
    update is bounded by dims * n per cell — negligible next to the
    assignment gains on this data. Guard the direction, not exact
    monotonicity: three rounds must not end WORSE than the seed
    assignment."""
    from hadoop_jobanalyzer_spark.operators.quantize import kmeans_iterated

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    def sse(rounds):
        return sum(
            r["sse_fixed"]
            for r in kmeans_iterated(emb, "vec_id", "embedding", k=8, rounds=rounds).collect()
        )

    assert sse(3) <= sse(1)


def test_link_prediction_returns_true_non_edges(spark, sf_dir):
    """Every recommended pair must be absent from the co-purchase edge
    list, scored >= 1, and degree columns must match independently
    recomputed vertex degrees."""
    fn, _ = MODEL_QUERIES["q234_link_prediction"]
    out = fn(spark, sf_dir)
    rows = out.collect()
    assert 0 < len(rows) <= 20

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pb"))
    edges = (
        a.join(b, "ok").filter(F.col("pa") < F.col("pb")).select("pa", "pb").distinct()
    )
    edge_set = {(r["pa"], r["pb"]) for r in edges.collect()}
    deg: dict[int, int] = {}
    for pa, pb in edge_set:
        deg[pa] = deg.get(pa, 0) + 1
        deg[pb] = deg.get(pb, 0) + 1
    for r in rows:
        assert (r["id_a"], r["id_b"]) not in edge_set
        assert r["id_a"] < r["id_b"]
        assert r["common_neighbors"] >= 1
        assert r["deg_a"] == deg[r["id_a"]]
        assert r["deg_b"] == deg[r["id_b"]]
    # ranked: (common_neighbors desc, id_a, id_b) total order
    keys = [(-r["common_neighbors"], r["id_a"], r["id_b"]) for r in rows]
    assert keys == sorted(keys)


def test_kmeans_iterated_rejects_nonpositive_rounds(spark, sf_dir):
    """rounds=0 used to silently return the seed-assignment census
    (range(rounds-1) empty + final assignment always running) — the
    contract is now explicit."""
    import pytest

    from hadoop_jobanalyzer_spark.operators.quantize import kmeans_iterated

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    with pytest.raises(ValueError, match="rounds"):
        kmeans_iterated(emb, "vec_id", "embedding", k=4, rounds=0)
