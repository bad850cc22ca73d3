"""Training-shard assignment/writing, normalization dedup, and PMI
collocation scoring — planted-example unit tests (the registry oracle
differentials cover the sf corpora)."""

import glob

from pyspark.sql import functions as F

from hadoop_jobanalyzer_spark.functions.text import normalize_text
from hadoop_jobanalyzer_spark.operators.shards import (
    assign_shards,
    shard_manifest,
    write_training_shards,
)
from hadoop_jobanalyzer_spark.plans.tables import load_tables


def test_shard_manifest_partitions_table(spark, sf_dir):
    docs = load_tables(spark, sf_dir)["documents"]
    man = shard_manifest(docs, F.col("doc_id"), 16, F.col("n_chars")).collect()
    assert sum(r["n_rows"] for r in man) == docs.count()
    assert sum(r["n_bytes"] for r in man) == docs.agg(F.sum("n_chars")).first()[0]
    assert {r["shard"] for r in man} <= set(range(16))


def test_assignment_stable_under_append(spark, sf_dir):
    # appending rows never moves previously-assigned rows between shards
    docs = load_tables(spark, sf_dir)["documents"]
    half = docs.filter(F.col("doc_id") % 2 == 0)
    full_a = {
        r["doc_id"]: r["shard"]
        for r in assign_shards(docs, F.col("doc_id"), 8).select("doc_id", "shard").collect()
    }
    half_a = {
        r["doc_id"]: r["shard"]
        for r in assign_shards(half, F.col("doc_id"), 8).select("doc_id", "shard").collect()
    }
    assert all(full_a[k] == v for k, v in half_a.items())


def test_write_training_shards_one_file_per_shard(spark, sf_dir, tmp_path):
    docs = load_tables(spark, sf_dir)["documents"]
    out = str(tmp_path / "shards")
    write_training_shards(docs, out, F.col("doc_id"), 8)
    man = {
        r["shard"]: r["n_rows"]
        for r in shard_manifest(docs, F.col("doc_id"), 8, F.col("n_chars")).collect()
    }
    back = spark.read.parquet(out)
    got = {
        r["shard"]: r["n"]
        for r in back.groupBy("shard").agg(F.count("*").alias("n")).collect()
    }
    assert got == man
    for shard in man:
        files = glob.glob(f"{out}/shard={shard}/*.parquet")
        assert len(files) == 1, f"shard {shard}: {files}"


def test_normalize_text_collapses_variants(spark):
    df = spark.createDataFrame(
        [
            (1, "Hello,  World!"),
            (2, "hello world"),
            (3, "  HELLO -- world??  "),
            (4, "hello worlds"),
        ],
        "doc_id long, text string",
    )
    out = (
        df.select("doc_id", normalize_text("text").alias("norm"))
        .groupBy("norm")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .collect()
    )
    groups = {r["norm"]: r["ids"] for r in out}
    assert groups["hello world"] == [1, 2, 3]
    assert groups["hello worlds"] == [4]


def test_pmi_ranks_planted_collocation_first(spark, monkeypatch):
    # "zx qv" always co-occur (exclusively); "aa bb" co-occur but both
    # words also appear apart -> lower ratio. Common filler pairs last.
    docs = [(i, "zx qv aa bb cc dd", "en", "s", 17) for i in range(5)]
    docs += [(100 + i, "aa cc bb dd cc dd", "en", "s", 17) for i in range(5)]
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    )
    from hadoop_jobanalyzer_spark.plans import tables as tables_mod

    monkeypatch.setattr(
        tables_mod, "load_tables", lambda spark, sf: {"documents": df}
    )
    from hadoop_jobanalyzer_spark.plans import extended_queries as eq

    monkeypatch.setattr(eq, "load_tables", tables_mod.load_tables)
    out = eq.q88_pmi_collocations(spark, "ignored").collect()
    assert (out[0]["w1"], out[0]["w2"]) == ("zx", "qv")
    assert out[0]["c_xy"] == 5
    ranks = {(r["w1"], r["w2"]): i for i, r in enumerate(out)}
    assert ranks[("zx", "qv")] < ranks[("aa", "bb")]
