"""Scale probe: the dedup pipeline on a corpus 10x the sf0.1 document
count, synthesized distributively (spark.range + codegen expressions — no
driver-side data). Verifies the 100 TB-shape claims hold off the tiny
fixtures: bounded candidate generation, planted near-dups recovered, no
driver materialization."""

import pyspark.sql.functions as F
import pytest


@pytest.fixture(scope="module")
def big_corpus(spark):
    """50k docs of 40 pseudo-random words from a 1000-word vocabulary;
    every 100th doc is a near-copy of its predecessor (same text, two
    words perturbed) — the planted near-dup signal."""
    n = 50_000
    words = F.transform(
        F.sequence(F.lit(0), F.lit(39)),
        lambda i: F.concat(
            F.lit("w"), F.pmod(F.hash(F.col("base") * 41 + i * 7), F.lit(1000))
        ),
    )
    docs = (
        spark.range(n)
        .withColumn("base", F.when(F.col("id") % 100 == 99, F.col("id") - 1).otherwise(F.col("id")))
        .withColumn(
            "words",
            F.when(
                F.col("id") % 100 == 99,
                F.concat(F.slice(words, 1, 38), F.array(F.lit("zz1"), F.lit("zz2"))),
            ).otherwise(words),
        )
        .select(F.col("id").alias("doc_id"), F.array_join("words", " ").alias("text"))
    )
    return docs.repartition(32).localCheckpoint()


def test_lsh_pipeline_at_50k_docs(spark, big_corpus):
    from hadoop_jobanalyzer_spark.operators.dedup import near_dup_pairs

    pairs = near_dup_pairs(big_corpus, "doc_id", "text", threshold=0.2)
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs.collect()}
    planted = {(i - 1, i) for i in range(99, 50_000, 100)}
    found = planted & set(got)
    # MinHash recall on ~0.9-Jaccard planted pairs should be near-total
    assert len(found) >= 0.9 * len(planted), (len(found), len(planted))
    # and the candidate set stays bounded: no quadratic blowup beyond the
    # planted structure (allow a small accidental-collision margin)
    assert len(got) <= len(planted) * 3


def test_exact_dedup_at_50k_docs(spark, big_corpus):
    from hadoop_jobanalyzer_spark.operators.dedup import exact_duplicates

    d = exact_duplicates(big_corpus, "doc_id", "text")
    assert d.count() == 50_000
    assert d.filter("is_keeper").count() == 50_000  # perturbed copies differ


def test_ann_at_100k_vectors(spark):
    """Multi-probe LSH kNN over 100k synthesized 64-dim vectors with 100
    planted near-copies of the query vector: the probe set must surface
    mostly planted neighbors, never scanning the corpus quadratically."""
    from hadoop_jobanalyzer_spark.operators.similarity import knn_lsh_multiprobe

    n, dim = 100_000, 64
    base = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: (F.pmod(F.hash(F.col("seed") * 31 + i * 13), F.lit(2000)) - 1000)
        / 1000.0,
    )
    # planted: every 1000th vector reuses the query's seed with a tiny
    # per-coordinate perturbation (cosine ~ 1 to vector 0)
    perturbed = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: (F.pmod(F.hash(i * 13), F.lit(2000)) - 1000) / 1000.0
        + (F.pmod(F.hash(F.col("id") + i), F.lit(100))) / 50_000.0,
    )
    vecs = (
        spark.range(n)
        .withColumn("seed", F.when(F.col("id") % 1000 == 0, F.lit(0)).otherwise(F.col("id")))
        .select(
            F.col("id").alias("vec_id"),
            F.when(F.col("id") % 1000 == 0, perturbed).otherwise(base).alias("embedding"),
        )
        .repartition(32)
        .localCheckpoint()
    )
    hits = knn_lsh_multiprobe(vecs, "vec_id", "embedding", query_id=0, k=10).collect()
    assert len(hits) == 10
    planted = {i for i in range(0, n, 1000)} - {0}
    top = [r["vec_id"] for r in hits]
    assert len(set(top) & planted) >= 8, top  # near-copies dominate top-10
    assert all(r["cos_sim"] > 0.99 for r in hits[:8])


def test_fleet_ingest_300_logs(spark, tmp_path):
    """Many-files ingest: 300 synthesized job logs (templated tiny_log with
    distinct jobids) parse in one pass; per-job reports and the fleet
    rollup see every job — the 'parallelism = number of files' claim off
    the 2-file fixtures."""
    import os

    from hadoop_jobanalyzer_spark.operators import fleet_summary, job_summary
    from hadoop_jobanalyzer_spark.sources import load_history

    tiny = open(os.path.join(os.path.dirname(__file__), "data", "tiny_log.txt")).read()
    d = tmp_path / "fleet"
    d.mkdir()
    for i in range(300):
        new_id = f"job_2020010100{i:02d}_{i:04d}" if i < 100 else f"job_20200101{i:04d}_{i:04d}"
        body = tiny.replace("job_202001010000_0001", new_id).replace(
            "task_202001010000_0001", new_id.replace("job_", "task_")
        ).replace("attempt_202001010000_0001", new_id.replace("job_", "attempt_"))
        if i % 3 == 0:
            body = body.replace('USER="alice"', 'USER="bob"')
        (d / f"log{i:03d}.txt").write_text(body)

    views = load_history(spark, str(d / "*"))
    summary = job_summary(views)
    assert summary.count() == 300
    assert views.tasks.count() == 300 * 5  # 2 maps + 1 reduce + setup + cleanup
    fleet = {r["user"]: r["n_jobs"] for r in fleet_summary(views).collect()}
    assert fleet == {"bob": 100, "alice": 200}


def test_timeseries_spine_at_10x_range(spark, tmp_path):
    """q153 gap-fill and q163 rolling correlation at a 300-day event
    horizon (432k-minute spine, 10x the sf0.1 range, 1M events): the
    spine-window family must stay O(spine) — the shrinking-frame form
    this repo explicitly avoids would be quadratic here and time out."""
    import os
    import shutil

    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(7)
    n = 1_000_000
    start = pd.Timestamp("2024-01-01")
    ts = start + pd.to_timedelta(
        np.sort(rng.randint(0, 300 * 24 * 3600, size=n)), unit="s"
    )
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype="int64"),
            "ts": ts,
            "user_id": rng.randint(0, 5000, size=n).astype("int64"),
            "event_type": rng.choice(
                ["view", "click", "purchase", "signup", "error"], size=n
            ),
            "value": rng.uniform(0.01, 500.0, size=n).round(2),
            "props": ["{}"] * n,
        }
    )
    d = tmp_path / "big_sf"
    d.mkdir()
    src = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata/sf0.001")
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "documents", "embeddings",
    ]:
        shutil.copy(os.path.join(src, f"{t}.parquet"), d / f"{t}.parquet")
    df.to_parquet(d / "events.parquet", coerce_timestamps="us",
                  allow_truncated_timestamps=True)

    from hadoop_jobanalyzer_spark.plans.registry import QUERIES

    gapfill, _ = QUERIES["q153_gapfill_interpolation"]
    rows = gapfill(spark, str(d)).count()
    assert 400_000 < rows <= 300 * 24 * 60  # contiguous minute spine

    rolling, _ = QUERIES["q163_rolling_correlation"]
    hours = rolling(spark, str(d)).count()
    assert 6_000 < hours <= 300 * 24


def test_scale10_build_disjoint_copies(spark, sf_dir, tmp_path):
    """tools/scale10.build_scaled at factor 2 on the tiny fixtures: row
    counts double, key spaces are disjoint across copies (the uniform-
    growth model — join fan-outs preserved, graphs become disjoint
    copies), document text never collides across copies (dedup statistics
    scale linearly instead of planting cross-copy dup cliques), and the
    fixed TPC-H dimensions pass through unscaled."""
    import sys as _sys

    _sys.path.insert(0, "/root/repo/tools")
    from scale10 import build_scaled

    out = str(tmp_path / "x2")
    build_scaled(spark, str(sf_dir), out, factor=2)

    for t, key in [("documents", "doc_id"), ("lineitem", "l_orderkey"),
                   ("events", "event_id")]:
        base = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        big = spark.read.parquet(f"{out}/{t}.parquet")
        assert big.count() == 2 * base.count()
        assert (
            big.select(key).distinct().count()
            == 2 * base.select(key).distinct().count()
        )
        lo = big.filter(F.col(key) < 100_000_000).count()
        hi = big.filter(F.col(key) >= 100_000_000).count()
        assert lo == base.count() and hi == base.count()

    docs = spark.read.parquet(f"{out}/documents.parquet")
    # no text collides across copies: every text value is globally unique
    # exactly as often as it was unique within sf0.001
    base_docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert (
        docs.select("text").distinct().count()
        == 2 * base_docs.select("text").distinct().count()
    )
    # n_chars recomputed for the suffixed copy
    bad = docs.filter(F.length("text") != F.col("n_chars")).count()
    assert bad == 0

    nation = spark.read.parquet(f"{out}/nation.parquet")
    assert nation.count() == spark.read.parquet(f"{sf_dir}/nation.parquet").count()
