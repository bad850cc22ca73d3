"""Differential tests for the analytics query set (q90-q96) and the
quantize/retrieval operators behind it."""

import pytest
from pyspark.sql import functions as F

from hadoop_jobanalyzer_spark.plans.analytics_queries import ANALYTICS_QUERIES

from tests.oracle_utils import compare, driver_sql, duck_connect


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connect(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ANALYTICS_QUERIES))
def test_analytics_query_matches_oracle(spark, sf_dir, duck, name):
    fn, _ = ANALYTICS_QUERIES[name]
    sql = driver_sql(name)
    problems = compare(fn(spark, sf_dir), duck, sql)
    assert not problems, f"{name}: {problems}"


@pytest.mark.parametrize("name", sorted(ANALYTICS_QUERIES))
def test_analytics_query_nonempty(spark, sf_dir, name):
    fn, _ = ANALYTICS_QUERIES[name]
    assert fn(spark, sf_dir).count() > 0, f"{name} returned no rows at {sf_dir}"


# --- operator-level unit tests ----------------------------------------------


def test_kmeans_step_singleton_cells_have_zero_movement(spark):
    """k vectors, k seeds: every vector is its own centroid, so each cell
    has exactly its seed and the centroid cannot move."""
    from hadoop_jobanalyzer_spark.operators.quantize import kmeans_step

    df = spark.createDataFrame(
        [(i, [float(i), float(-i)]) for i in range(4)],
        "vec_id long, embedding array<float>",
    )
    rows = {r["cell"]: r for r in kmeans_step(df, "vec_id", "embedding", k=4).collect()}
    assert set(rows) == {0, 1, 2, 3}
    for r in rows.values():
        assert r["n_assigned"] == 1
        assert r["l1_move_num"] == 0
        assert r["avg_dim_move"] == 0.0


def test_kmeans_step_assignment_and_movement(spark):
    """Two seed centroids at 0 and 10; two extra vectors near each: the
    new centroid is the member mean and the movement numerator is exact."""
    from hadoop_jobanalyzer_spark.operators.quantize import kmeans_step

    df = spark.createDataFrame(
        [(0, [0.0]), (1, [10.0]), (2, [2.0]), (3, [12.0])],
        "vec_id long, embedding array<float>",
    )
    rows = {r["cell"]: r for r in kmeans_step(df, "vec_id", "embedding", k=2).collect()}
    # cell 0 holds {0, 2}: sum_fixed = 0 + 2000, old = 0, n = 2 -> |2000 - 0| = 2000
    assert rows[0]["n_assigned"] == 2 and rows[0]["l1_move_num"] == 2000
    # avg_dim_move = 2000 / (2 * 1000) / 1 dim = 1.0
    assert rows[0]["avg_dim_move"] == 1.0
    assert rows[1]["n_assigned"] == 2 and rows[1]["l1_move_num"] == 2000


def test_sq8_errors_bounded_by_half_step(spark):
    """Quantization error can never exceed half a bin: with values spanning
    [0, 1] per dim, total_ierr per vector < n_dims * ERR_FIXED / 512."""
    from hadoop_jobanalyzer_spark.operators.quantize import ERR_FIXED, sq8_error_histogram

    df = spark.createDataFrame(
        [(i, [i / 9.0, 1.0 - i / 9.0]) for i in range(10)],
        "vec_id long, embedding array<float>",
    )
    out = sq8_error_histogram(df, "vec_id", "embedding", bucket_width=1).collect()
    assert sum(r["n_vecs"] for r in out) == 10
    max_total = max(r["err_bucket"] for r in out)  # bucket_width=1 -> bucket == total
    assert max_total <= 2 * ERR_FIXED // 512


def test_tfidf_identical_docs_cosine_one(spark):
    from hadoop_jobanalyzer_spark.operators.retrieval import tfidf_cosine_pairs

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "zeta eta theta")],
        "doc_id long, text string",
    )
    rows = tfidf_cosine_pairs(df, "doc_id", "text", threshold=0.0).collect()
    assert [(r["id_a"], r["id_b"], r["cos_sim"]) for r in rows] == [(1, 2, 1.0)]


def test_duplicated_span_catches_within_doc_repeat(spark):
    """A document repeating its own 4-token span is flagged even with no
    other document sharing it — the count-based (not df-based) criterion."""
    from hadoop_jobanalyzer_spark.operators.dedup import duplicated_span_fraction

    rep = " ".join(["a b c d"] * 2)  # 'a b c d a b c d' -> span 'a b c d' x2
    df = spark.createDataFrame(
        [(1, rep), (2, "p q r s t u v w")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in
            duplicated_span_fraction(df, "doc_id", "text", span=4).collect()}
    assert rows[1]["n_dup"] >= 2  # both copies of the repeated window count
    assert rows[2]["n_dup"] == 0


def test_q98_cross_product_exact_past_int64(spark):
    """q98's centroid cross-product (sa*nb - sb*na)^2 passes 2^63 once
    per-label counts reach the tens of thousands (the x100 sweep aborted
    on the ANSI long multiply). Pin the decimal(38,0) path: the same
    expression fragment q98 uses must stay EXACT on magnitudes two
    orders past the long overflow point."""
    from pyspark.sql import functions as F

    # n ~ 2e5 members, s ~ n * 600 lattice units: diff ~ 1.2e12, sq ~ 1.4e24
    sa, na, sb, nb = 120_000_000_000, 200_000, 119_994_000_000, 199_999
    df = spark.createDataFrame(
        [(sa, na, sb, nb)], "sa long, na long, sb long, nb long"
    )
    diff = F.col("sa").cast("decimal(38,0)") * F.col("nb") - F.col("sb").cast(
        "decimal(38,0)"
    ) * F.col("na")
    got = df.select(F.sum(diff * diff).alias("num")).first()["num"]
    expected = (sa * nb - sb * na) ** 2  # exact Python int
    assert int(got) == expected
    assert expected > 2**63  # the case the long path could not represent
