"""Corpus snapshot publishing: every derived table the pipelines share,
written ONCE per corpus snapshot as co-located bucketed storage.

The engine keeps two deliberate session caches (the dedup subtree and the
co-purchase edge list) because rebuilding either per query would be
absurd; but a session cache is the WEAK form of that idea — it dies with
the session, and under dynamic allocation it dies with the executors.
The strong form is the lakehouse layout: after ingesting a corpus
snapshot, publish the derived tables as bucketed storage and let every
later session (batch jobs, ad-hoc analysis, the next incremental-dedup
run) read them co-located with zero build cost:

- ``{prefix}_documents``       — the corpus, bucketed by ``doc_id``
- ``{prefix}_dedup_clusters``  — CC labels over verified near-dup pairs,
  bucketed by ``doc_id`` with the SAME count, so the doc-grain
  enrichment join plans with no Exchange on either side
- ``{prefix}_copurchase_edges`` — canonical (src < dst, distinct) edge
  list, bucketed by ``src``; consumed via
  ``triangle_stats(..., canonical=True)`` with no canonize Exchange
- ``{prefix}_minhash_sigs`` — per-doc MinHash signatures (the corpus
  dedup config), bucketed by ``doc_id``: the stored state that makes
  INGEST-TIME dedup O(batch) — a new batch computes signatures for
  itself only and band-joins against this table
  (``incremental_dedup_candidates``), never re-shingling the corpus

A ``_MANIFEST.json`` under ``root`` records what was published (tables,
bucket spec, row counts) so downstream jobs can assert they're reading
the snapshot they expect — the same manifest-gates-consumption pattern
as q206's first-batch manifest.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

MANIFEST_NAME = "_MANIFEST.json"


def publish_corpus_snapshot(
    spark: SparkSession,
    sf_dir: str,
    root: str,
    n_buckets: int = 64,
    prefix: str = "corpus",
) -> dict:
    """Publish the snapshot's derived tables under ``root`` and return
    (and write) the manifest.

    ``n_buckets`` is shared by the two doc_id-bucketed tables — it must
    be, or the co-located join guarantee is lost. Publishing runs the
    LSH + verify + connected-components build and the edge self-join
    exactly once (the point of the exercise); at 100 TB this is the
    once-per-snapshot batch job every downstream pipeline amortizes.
    """
    from hadoop_jobanalyzer_spark.operators.dedup import minhash_signatures
    from hadoop_jobanalyzer_spark.plans.pipeline_queries import (
        _N_HASHES,
        write_dedup_clusters_bucketed,
        write_documents_bucketed,
    )
    from hadoop_jobanalyzer_spark.plans.sketch_queries import (
        write_copurchase_edges_bucketed,
    )
    from hadoop_jobanalyzer_spark.plans.tables import load_tables
    from hadoop_jobanalyzer_spark.sources.bucketed import write_bucketed

    os.makedirs(root, exist_ok=True)
    tables = {
        f"{prefix}_documents": dict(bucket_by="doc_id", n_buckets=n_buckets),
        f"{prefix}_dedup_clusters": dict(bucket_by="doc_id", n_buckets=n_buckets),
        f"{prefix}_copurchase_edges": dict(bucket_by="src", n_buckets=n_buckets),
        f"{prefix}_minhash_sigs": dict(bucket_by="doc_id", n_buckets=n_buckets),
    }
    write_documents_bucketed(
        spark, sf_dir, name=f"{prefix}_documents", n_buckets=n_buckets,
        path=os.path.join(root, "documents"),
    )
    write_dedup_clusters_bucketed(
        spark, sf_dir, name=f"{prefix}_dedup_clusters", n_buckets=n_buckets,
        path=os.path.join(root, "dedup_clusters"),
    )
    write_copurchase_edges_bucketed(
        spark, sf_dir, name=f"{prefix}_copurchase_edges", n_buckets=n_buckets,
        path=os.path.join(root, "copurchase_edges"),
    )
    write_bucketed(
        minhash_signatures(
            load_tables(spark, sf_dir)["documents"], "doc_id", "text",
            n_hashes=_N_HASHES, ngram=3,
        ),
        f"{prefix}_minhash_sigs",
        ["doc_id"],
        n_buckets,
        sort_cols=["doc_id"],
        path=os.path.join(root, "minhash_sigs"),
    )
    for name, spec in tables.items():
        spec["rows"] = spark.table(name).count()
    manifest = {"source": sf_dir, "root": root, "tables": tables}
    _write_manifest(root, manifest)
    return manifest


def _write_manifest(root: str, manifest: dict) -> None:
    with open(os.path.join(root, MANIFEST_NAME), "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
        fh.write("\n")


def incremental_dedup_candidates(
    spark: SparkSession,
    new_docs: DataFrame,
    prefix: str = "corpus",
    max_bucket: int | None = 1000,
):
    """Dedup candidates for a NEW batch against the published snapshot:
    (candidate pairs covering new×old and new×new — never old×old, which
    the snapshot already deduped — and the batch's signatures).

    This is the ingest-time regime the stored ``{prefix}_minhash_sigs``
    table exists for: per batch, cost is O(batch) signature work plus a
    band-key join against the store, independent of corpus size except
    through the (bounded, ``max_bucket``-capped) band buckets. Pass the
    returned ``new_sigs`` to :func:`append_batch_to_snapshot` after the
    batch's keep/drop decision so the next batch sees this one.
    """
    from hadoop_jobanalyzer_spark.operators.dedup import (
        lsh_candidate_pairs_incremental,
    )
    from hadoop_jobanalyzer_spark.plans.pipeline_queries import _BANDS, _N_HASHES

    stored = spark.table(f"{prefix}_minhash_sigs")
    return lsh_candidate_pairs_incremental(
        new_docs, "doc_id", "text", stored,
        n_hashes=_N_HASHES, bands=_BANDS, max_bucket=max_bucket, ngram=3,
    )


def append_batch_to_snapshot(
    spark: SparkSession,
    root: str,
    new_docs: DataFrame,
    new_sigs: DataFrame,
    prefix: str = "corpus",
) -> dict:
    """Append a processed batch to the snapshot's documents + signature
    tables (``saveAsTable`` append with the same bucket spec keeps the
    co-location guarantee) and refresh the manifest's row counts.

    The cluster-label and edge tables are NOT touched: the incremental
    candidate pairs are the dedup decision for the batch, and the global
    tables are rebuilt at the next full publish — the standard
    base-plus-delta lakehouse cadence. The manifest records the appended
    state so ``read_corpus_snapshot`` keeps gating consumption.
    """
    with open(os.path.join(root, MANIFEST_NAME)) as fh:
        manifest = json.load(fh)
    from hadoop_jobanalyzer_spark.sources.bucketed import write_bucketed

    for name, df in (
        (f"{prefix}_documents", new_docs),
        (f"{prefix}_minhash_sigs", new_sigs),
    ):
        spec = manifest["tables"][name]
        write_bucketed(
            df.select(spark.table(name).columns),
            name,
            [spec["bucket_by"]],
            spec["n_buckets"],
            sort_cols=[spec["bucket_by"]],
            mode="append",
        )
        spec["rows"] = spark.table(name).count()
    _write_manifest(root, manifest)
    return manifest


def compact_snapshot(spark: SparkSession, root: str, prefix: str = "corpus") -> dict:
    """Collapse append fragmentation across every table in the snapshot
    manifest (`sources/bucketed.compact_bucketed_table` per table) and
    verify the manifest's row counts still hold afterwards — a rewrite
    that changed cardinality must fail HERE, in the maintenance job,
    not later at a consumer. Returns {table: rewrite stats}."""
    from hadoop_jobanalyzer_spark.sources.bucketed import compact_bucketed_table

    with open(os.path.join(root, MANIFEST_NAME)) as fh:
        manifest = json.load(fh)
    stats = {}
    for name, spec in manifest["tables"].items():
        stats[name] = compact_bucketed_table(spark, name)
        n = spark.table(name).count()
        if n != spec["rows"]:
            raise ValueError(
                f"compaction changed {name}: manifest says {spec['rows']} rows, "
                f"rewrite left {n}"
            )
    return stats


def read_corpus_snapshot(
    spark: SparkSession, root: str, prefix: str = "corpus"
) -> dict[str, DataFrame]:
    """Open a published snapshot: verify the manifest's row counts against
    the catalog tables (a failed or partial publish must not be silently
    consumed) and return {short_name: DataFrame} with bucket metadata
    intact."""
    with open(os.path.join(root, MANIFEST_NAME)) as fh:
        manifest = json.load(fh)
    out: dict[str, DataFrame] = {}
    for name, spec in manifest["tables"].items():
        df = spark.table(name)
        n = df.count()
        if n != spec["rows"]:
            raise ValueError(
                f"snapshot table {name}: manifest says {spec['rows']} rows, "
                f"catalog has {n} — partial or superseded publish"
            )
        out[name.removeprefix(f"{prefix}_")] = df
    return out
