"""Differential + semantic tests for the pipeline-planner query set (q216+)."""

import pytest
from pyspark.sql import functions as F

from hadoop_jobanalyzer_spark.plans.planner_queries import (
    PLANNER_QUERIES,
    _Q216_N_HASHES,
)

from tests.oracle_utils import compare, duck_connect


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connect(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(PLANNER_QUERIES))
def test_planner_query_matches_oracle(spark, sf_dir, duck, name):
    fn, sql = PLANNER_QUERIES[name]
    problems = compare(fn(spark, sf_dir), duck, sql)
    assert not problems, f"{name}: {problems}"


@pytest.mark.parametrize("name", sorted(PLANNER_QUERIES))
def test_planner_query_nonempty(spark, sf_dir, name):
    fn, _ = PLANNER_QUERIES[name]
    assert fn(spark, sf_dir).count() > 0, f"{name} returned no rows at {sf_dir}"


# --- semantic spot checks ----------------------------------------------------


def test_banding_planner_invariants(spark, sf_dir):
    """Every banding row is internally consistent: bands x rows covers the
    hash family, multi-doc buckets are a subset of buckets, and the pair
    workload is at least one pair per multi-doc bucket."""
    fn, _ = PLANNER_QUERIES["q216_lsh_banding_planner"]
    rows = fn(spark, sf_dir).collect()
    assert len(rows) == 6
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    for r in rows:
        assert r["n_bands"] * r["n_rows"] == _Q216_N_HASHES
        assert 0 <= r["n_buckets_multi"] <= r["n_buckets"]
        assert r["pair_slots"] >= r["n_buckets_multi"]
        assert r["max_bucket"] <= n_docs
        # every doc appears in every band of a banding
        assert r["n_buckets"] <= r["n_bands"] * n_docs


def test_compaction_plan_conserves_bytes_and_spans(spark, sf_dir):
    """The plan is a partition of each source's manifest: group bytes sum
    to the source's total text bytes, and file spans never overlap."""
    fn, _ = PLANNER_QUERIES["q217_compaction_plan"]
    rows = fn(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    totals = {
        r["source"]: r["b"]
        for r in docs.groupBy("source")
        .agg(F.sum(F.length("text")).alias("b"))
        .collect()
    }
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r["source"], []).append(r)
    assert set(by_source) == set(totals)
    for src, grps in by_source.items():
        assert sum(g["group_bytes"] for g in grps) == totals[src]
        grps.sort(key=lambda g: g["grp"])
        for a, b in zip(grps, grps[1:]):
            assert a["last_file"] < b["first_file"]
        # the bin rule keeps every group except the last under
        # target + one straggler file
        for g in grps[:-1]:
            assert g["group_bytes"] >= 1


def test_group_kfold_is_leakage_free(spark, sf_dir):
    """No group straddles folds: per-fold group counts sum to the global
    distinct-group count, and doc counts sum to the corpus size."""
    fn, _ = PLANNER_QUERIES["q218_group_kfold"]
    rows = fn(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from hadoop_jobanalyzer_spark.functions.text import tokens
    from hadoop_jobanalyzer_spark.plans.planner_queries import _Q218_PREFIX

    n_groups = (
        docs.select(
            F.md5(F.concat_ws(" ", F.slice(tokens("text"), 1, _Q218_PREFIX)))
        )
        .distinct()
        .count()
    )
    assert sum(r["n_groups"] for r in rows) == n_groups
    assert sum(r["n_docs"] for r in rows) == docs.count()


def test_edge_boilerplate_counts_are_real(spark, sf_dir):
    """Recompute one reported gram's doc count directly."""
    fn, _ = PLANNER_QUERIES["q219_edge_boilerplate"]
    rows = fn(spark, sf_dir).collect()
    assert all(r["n_docs"] >= 2 for r in rows)
    r = rows[0]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w = F.split("text", " ")
    gram = (
        F.concat_ws(" ", F.element_at(w, 1), F.element_at(w, 2))
        if r["kind"] == "head"
        else F.concat_ws(" ", F.element_at(w, -2), F.element_at(w, -1))
    )
    direct = docs.where(
        (F.col("source") == r["source"]) & (gram == r["gram"])
    ).count()
    assert direct == r["n_docs"]
