"""Corpus snapshot publish/read: the durable, co-located form of the two
session caches (see plans/snapshot.py docstring). Publishing must run the
expensive builds once and leave storage every later session can consume
with zero build cost; reading must refuse a partial publish."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from hadoop_jobanalyzer_spark.plans.snapshot import (
    MANIFEST_NAME,
    publish_corpus_snapshot,
    read_corpus_snapshot,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture
def snapshot(spark, tmp_path):
    from hadoop_jobanalyzer_spark.plans.pipeline_queries import release_corpus_dedup
    from hadoop_jobanalyzer_spark.plans.sketch_queries import release_copurchase_edges

    release_corpus_dedup(spark)
    release_copurchase_edges(spark)
    root = str(tmp_path / "snap")
    manifest = publish_corpus_snapshot(spark, SF_DIR, root, n_buckets=4, prefix="t7")
    yield root, manifest
    for name in manifest["tables"]:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_publish_writes_manifest_and_tables(spark, snapshot):
    root, manifest = snapshot
    assert os.path.exists(os.path.join(root, MANIFEST_NAME))
    assert set(manifest["tables"]) == {
        "t7_documents", "t7_dedup_clusters", "t7_copurchase_edges",
    }
    # doc-grain tables share the bucket spec (the co-location contract)
    docs_spec = manifest["tables"]["t7_documents"]
    cl_spec = manifest["tables"]["t7_dedup_clusters"]
    assert (docs_spec["bucket_by"], docs_spec["n_buckets"]) == ("doc_id", 4)
    assert (cl_spec["bucket_by"], cl_spec["n_buckets"]) == ("doc_id", 4)
    # one cluster label per document, all documents present
    assert manifest["tables"]["t7_dedup_clusters"]["rows"] == docs_spec["rows"]
    assert docs_spec["rows"] == spark.read.parquet(f"{SF_DIR}/documents.parquet").count()


def test_read_snapshot_serves_consumers(spark, snapshot):
    root, manifest = snapshot
    t = read_corpus_snapshot(spark, root, prefix="t7")
    assert set(t) == {"documents", "dedup_clusters", "copurchase_edges"}

    # keeper selection over the snapshot == over the session cache
    from hadoop_jobanalyzer_spark.plans.pipeline_queries import corpus_dedup

    _, cc = corpus_dedup(spark, SF_DIR)
    want = sorted(
        map(tuple, cc.groupBy("component").agg(F.min("id").alias("k")).collect())
    )
    got = sorted(
        map(
            tuple,
            t["dedup_clusters"].groupBy("component").agg(F.min("doc_id").alias("k")).collect(),
        )
    )
    assert got == want

    # triangle census from snapshot edges == from the session cache
    from hadoop_jobanalyzer_spark.operators.graph import triangle_stats
    from hadoop_jobanalyzer_spark.plans.sketch_queries import _copurchase_edges

    assert (
        triangle_stats(t["copurchase_edges"], canonical=True).collect()
        == triangle_stats(_copurchase_edges(spark, SF_DIR)).collect()
    )


def test_read_refuses_partial_publish(spark, snapshot):
    root, manifest = snapshot
    path = os.path.join(root, MANIFEST_NAME)
    bad = json.load(open(path))
    bad["tables"]["t7_documents"]["rows"] += 1
    json.dump(bad, open(path, "w"))
    with pytest.raises(ValueError, match="partial or superseded"):
        read_corpus_snapshot(spark, root, prefix="t7")
