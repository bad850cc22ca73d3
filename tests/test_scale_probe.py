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
