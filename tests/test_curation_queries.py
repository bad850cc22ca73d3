"""Differential + semantic tests for the publication-gate queries (q230+)."""

import pytest
from pyspark.sql import functions as F

from hadoop_jobanalyzer_spark.plans.curation_queries import CURATION_QUERIES

from tests.oracle_utils import compare, driver_sql, duck_connect


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connect(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(CURATION_QUERIES))
def test_curation_query_matches_oracle(spark, sf_dir, duck, name):
    fn, _ = CURATION_QUERIES[name]
    sql = driver_sql(name)
    problems = compare(fn(spark, sf_dir), duck, sql)
    assert not problems, f"{name}: {problems}"


@pytest.mark.parametrize("name", sorted(CURATION_QUERIES))
def test_curation_query_nonempty(spark, sf_dir, name):
    fn, _ = CURATION_QUERIES[name]
    assert fn(spark, sf_dir).count() > 0, f"{name} returned no rows at {sf_dir}"


def test_k_anonymity_accounts_for_every_event(spark, sf_dir):
    """The census partitions the table: per-type n_rows sums to the event
    count, every group has k >= 1, and at-risk mass never exceeds the
    type's total."""
    fn, _ = CURATION_QUERIES["q230_k_anonymity"]
    rows = fn(spark, sf_dir).collect()
    total = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert sum(r["n_rows"] for r in rows) == total
    for r in rows:
        assert r["min_k"] >= 1
        assert 0 <= r["rows_at_risk"] <= r["n_rows"]
        assert r["n_groups"] <= r["n_rows"]


def test_importance_selection_partitions_and_signals(spark, sf_dir):
    """Token accounting must partition the corpus, and the TARGET slice's
    affine fraction must exceed the rest's — guaranteed by construction
    (p_target > p_rest pointwise on the affine word set, so the summed
    target mass on that set strictly dominates the summed rest mass)."""
    fn, _ = CURATION_QUERIES["q232_importance_selection"]
    rows = fn(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    total_tokens = docs.select(
        F.sum(F.size(F.split("text", " ")))
    ).first()[0]
    assert sum(r["total_tokens"] for r in rows) == total_tokens
    assert sum(r["n_docs"] for r in rows) == docs.count()
    target = {"src0", "src1", "src2", "src3"}
    t = [r for r in rows if r["source"] in target]
    rest = [r for r in rows if r["source"] not in target]
    assert t and rest
    aff_t = sum(r["affine_tokens"] for r in t) / sum(r["total_tokens"] for r in t)
    aff_r = sum(r["affine_tokens"] for r in rest) / sum(r["total_tokens"] for r in rest)
    assert aff_t > aff_r


def test_semdedup_manifest_agrees_with_pair_relation(spark, sf_dir):
    """The manifest's drop counts are exactly the distinct larger-id sides
    of the q32 pair relation (same threshold, same cell guard), and
    kept + dropped re-adds to the cell size."""
    from hadoop_jobanalyzer_spark.plans.pipeline_queries import PIPELINE_QUERIES

    fn, _ = CURATION_QUERIES["q231_semdedup_manifest"]
    manifest = {r["label"]: r for r in fn(spark, sf_dir).collect()}
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    sizes = {r["label"]: r["n"] for r in emb.groupBy("label").agg(F.count("*").alias("n")).collect()}
    assert set(manifest) == {lb for lb, n in sizes.items() if n <= 1000}
    for lb, r in manifest.items():
        assert r["n_vecs"] == sizes[lb]
        assert r["n_kept"] + r["n_dropped"] == r["n_vecs"]

    pairs_fn, _ = PIPELINE_QUERIES["q32_embedding_near_dups"]
    pairs = pairs_fn(spark, sf_dir)
    want_drops = (
        pairs.select(F.col("id_b").alias("vec_id"))
        .distinct()
        .join(emb.select("vec_id", "label"), "vec_id")
        .groupBy("label")
        .agg(F.count("*").alias("n"))
    )
    want = {r["label"]: r["n"] for r in want_drops.collect()}
    for lb, r in manifest.items():
        assert r["n_dropped"] == want.get(lb, 0)
