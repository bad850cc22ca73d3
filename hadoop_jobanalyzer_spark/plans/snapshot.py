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
- ``{prefix}_minhash_bands`` — the SAME signatures pre-exploded into the
  banded store layout (`operators/dedup.banded_signatures`), bucketed
  AND sorted by the single ``bkey`` column: the incremental band join
  reads this instead of re-exploding the wide table every batch, and
  the batch's touched-bucket isin pushdown prunes bucket files and row
  groups — the per-batch store read is O(touched buckets), not
  O(corpus). The wide table stays the doc-grain source of truth (it is
  what appends/compaction key by doc_id); the bands table is its
  derived join-optimized projection, appended in lockstep
- ``{prefix}_embeddings`` — the doc-aligned embedding table, bucketed by
  ``vec_id`` with the SAME count as the doc-grain tables: ``vec_id``
  shares the ``doc_id`` domain, and bucket assignment hashes the VALUE,
  so the doc↔embedding join (the semantic-dedup path, q231) plans with
  no Exchange on either side despite the differing column names

A ``_MANIFEST.json`` under ``root`` records what was published (tables,
bucket spec, row counts) so downstream jobs can assert they're reading
the snapshot they expect — the same manifest-gates-consumption pattern
as q206's first-batch manifest.
"""

from __future__ import annotations

import json
import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession

MANIFEST_NAME = "_MANIFEST.json"
LATEST_NAME = "_LATEST"


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
    from hadoop_jobanalyzer_spark.operators.dedup import (
        banded_signatures,
        minhash_signatures,
    )
    from hadoop_jobanalyzer_spark.plans.pipeline_queries import (
        _BANDS,
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
        f"{prefix}_minhash_bands": dict(
            bucket_by="bkey", n_buckets=n_buckets,
            n_hashes=_N_HASHES, bands=_BANDS,
        ),
        f"{prefix}_embeddings": dict(bucket_by="vec_id", n_buckets=n_buckets),
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
    loaded = load_tables(spark, sf_dir)
    write_bucketed(
        minhash_signatures(
            loaded["documents"], "doc_id", "text",
            n_hashes=_N_HASHES, ngram=3,
        ),
        f"{prefix}_minhash_sigs",
        ["doc_id"],
        n_buckets,
        sort_cols=["doc_id"],
        path=os.path.join(root, "minhash_sigs"),
    )
    # the bands table derives from the just-written sigs TABLE (not the
    # lazy signature plan) so the corpus-wide shingle/minhash subtree runs
    # once, at the sigs write, and the band explode reads its output
    write_bucketed(
        banded_signatures(
            spark.table(f"{prefix}_minhash_sigs"), "doc_id",
            n_hashes=_N_HASHES, bands=_BANDS,
        ),
        f"{prefix}_minhash_bands",
        ["bkey"],
        n_buckets,
        sort_cols=["bkey"],
        path=os.path.join(root, "minhash_bands"),
    )
    write_bucketed(
        loaded["embeddings"],
        f"{prefix}_embeddings",
        ["vec_id"],
        n_buckets,
        sort_cols=["vec_id"],
        path=os.path.join(root, "embeddings"),
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

    # prefer the pre-banded bkey-bucketed store (touched-bucket pushdown
    # prunes the scan); fall back to the wide table for snapshots published
    # before the bands table existed. Unlike the per-micro-batch ingest
    # path (corpus_ingest._bands_read_pays), this is a ONE-SHOT call with
    # no manifest in scope: the bands read's small-store fixed overhead
    # (~2x of a sub-second scan, r10 measurement) is paid once, not per
    # batch, so the layout preference is not size-gated here.
    stored_bands = (
        spark.table(f"{prefix}_minhash_bands")
        if spark.catalog.tableExists(f"{prefix}_minhash_bands")
        else None
    )
    stored = None if stored_bands is not None else spark.table(f"{prefix}_minhash_sigs")
    return lsh_candidate_pairs_incremental(
        new_docs, "doc_id", "text", stored,
        n_hashes=_N_HASHES, bands=_BANDS, max_bucket=max_bucket, ngram=3,
        stored_bands=stored_bands,
    )


def refresh_dedup_clusters_incremental(
    spark: SparkSession,
    root: str,
    prefix: str = "corpus",
    threshold: float = 0.2,
    max_bucket: int | None = 1000,
) -> dict:
    """Bring ``{prefix}_dedup_clusters`` up to date with the documents
    table WITHOUT re-running corpus-wide dedup — the maintenance step that
    keeps the label table live across ingest fold-ins (appends touch docs
    and signatures; labels previously went stale until the next full
    publish).

    Self-healing by construction: the unlabeled batch is derived from the
    tables themselves (documents anti-join labels on ``doc_id`` — both
    bucketed by doc_id with the same count, so the anti-join plans with no
    Exchange on either side), never from caller state. A crash between an
    append and this refresh just leaves the batch for the next run;
    re-running after success is a no-op.

    Per batch the work is O(batch): signatures for the missing docs only,
    the incremental band join against the stored signature table, exact
    Jaccard verification on candidates only (same math and threshold
    convention as ``operators/dedup.near_dup_pairs``), then
    ``incremental_connected_components`` — CC restricted to components an
    edge actually touches. The one O(corpus) cost is rewriting the narrow
    (doc_id, component) table, which at 100 TB of text is a per-doc
    16-byte relation; the rewrite is in-place (single-writer maintenance
    window, same contract as ``compact_bucketed_table``) and count-gated
    before the write plan is executed.

    Equivalence note: the result matches a full from-scratch recompute
    (pinned by tests/test_snapshot_cluster_refresh.py) as long as appends
    don't push an existing band bucket over ``max_bucket`` — the cap is a
    candidate-generation guard, and old×old decisions are inherited from
    publish time rather than re-litigated per batch (by design: that is
    what makes the refresh O(batch)).
    """
    from hadoop_jobanalyzer_spark.functions.text import shingles, tokens
    from hadoop_jobanalyzer_spark.operators.dedup import (
        lsh_candidate_pairs_incremental,
    )
    from hadoop_jobanalyzer_spark.operators.graph import (
        incremental_connected_components,
    )
    from hadoop_jobanalyzer_spark.plans.pipeline_queries import _BANDS, _N_HASHES
    from hadoop_jobanalyzer_spark.sources.bucketed import (
        table_bucket_spec,
        write_bucketed,
    )
    from hadoop_jobanalyzer_spark.util import materialize_eager
    from pyspark.sql import functions as F

    labels_name = f"{prefix}_dedup_clusters"
    docs = spark.table(f"{prefix}_documents")
    labels = spark.table(labels_name)
    missing = materialize_eager(
        docs.join(labels.select("doc_id"), "doc_id", "left_anti")
    )
    n_missing = missing.count()
    stats = {"new_docs": n_missing, "candidates": 0, "verified": 0}
    if n_missing == 0:
        stats["rows"] = labels.count()
        return stats

    # exclude the missing docs from the store on BOTH layouts (they are
    # the new batch; old x old is out of contract). The anti-join is
    # batch-scaled on the right, and the bands path's bkey pushdown
    # filter passes through it to the bucket-pruned scan. One-shot
    # refresh, so the bands layout is preferred unconditionally — the
    # small-store fixed overhead the per-batch ingest gate
    # (corpus_ingest._bands_read_pays) avoids is paid once here.
    if spark.catalog.tableExists(f"{prefix}_minhash_bands"):
        stored_sigs, stored_bands = None, spark.table(
            f"{prefix}_minhash_bands"
        ).join(missing.select("doc_id"), "doc_id", "left_anti")
    else:
        stored_sigs, stored_bands = spark.table(f"{prefix}_minhash_sigs").join(
            missing.select("doc_id"), "doc_id", "left_anti"
        ), None
    cands, _ = lsh_candidate_pairs_incremental(
        missing, "doc_id", "text", stored_sigs,
        n_hashes=_N_HASHES, bands=_BANDS, max_bucket=max_bucket, ngram=3,
        stored_bands=stored_bands,
    )
    cands = materialize_eager(cands.select("id_a", "id_b"))
    stats["candidates"] = cands.count()
    # exact-Jaccard verify on candidates only; shingle sets are built for
    # pair endpoints alone (semi-join prunes the corpus scan)
    need = (
        cands.select(F.col("id_a").alias("doc_id"))
        .union(cands.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    doc_sets = (
        docs.join(need, "doc_id", "left_semi")
        .select("doc_id", shingles(tokens("text"), 3).alias("_shs"))
    )
    verified = (
        cands.join(
            doc_sets.select(F.col("doc_id").alias("id_a"), F.col("_shs").alias("_sa")),
            "id_a",
        )
        .join(
            doc_sets.select(F.col("doc_id").alias("id_b"), F.col("_shs").alias("_sb")),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("_sa", "_sb")).alias("_nc"),
            F.size("_sa").alias("_na"),
            F.size("_sb").alias("_nb"),
        )
        .withColumn(
            "_j", F.round(F.col("_nc") / (F.col("_na") + F.col("_nb") - F.col("_nc")), 3)
        )
        .filter((F.col("_nc") > 0) & (F.col("_j") >= threshold))
        .select("id_a", "id_b")
    )
    verified = materialize_eager(verified)
    stats["verified"] = verified.count()

    new_labels = incremental_connected_components(
        labels, verified, src="id_a", dst="id_b",
        new_nodes=missing.select("doc_id"), id_col="doc_id",
    )
    # materialize BEFORE the overwrite: the plan reads the very table it
    # replaces (the compact_bucketed_table trap), and the count gate must
    # measure the exact rows the write will emit
    new_labels = materialize_eager(new_labels.select("doc_id", "component"))
    n_total = new_labels.count()
    n_docs = docs.count()
    if n_total != n_docs:
        raise ValueError(
            f"incremental label refresh produced {n_total} rows for "
            f"{n_docs} documents; {labels_name} NOT rewritten"
        )
    n_buckets, bucket_cols, sort_cols, location = table_bucket_spec(spark, labels_name)
    write_bucketed(
        new_labels.repartition(n_buckets, *[F.col(c) for c in bucket_cols]),
        labels_name,
        bucket_cols,
        n_buckets,
        sort_cols=sort_cols or None,
        path=location,
        mode="overwrite",
    )
    stats["rows"] = n_total
    manifest_path = os.path.join(root, MANIFEST_NAME)
    if os.path.exists(manifest_path):
        with open(manifest_path) as fh:
            manifest = json.load(fh)
        if labels_name in manifest.get("tables", {}):
            manifest["tables"][labels_name]["rows"] = n_total
            _write_manifest(root, manifest)
    return stats


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

    The cluster-label and edge tables are NOT touched here: the
    incremental candidate pairs are the dedup decision for the batch.
    Labels are brought current by
    :func:`refresh_dedup_clusters_incremental` (O(batch) maintenance,
    self-healing from the tables themselves); the edge table is rebuilt at
    the next full publish. The manifest records the appended state so
    ``read_corpus_snapshot`` keeps gating consumption.
    """
    with open(os.path.join(root, MANIFEST_NAME)) as fh:
        manifest = json.load(fh)
    from hadoop_jobanalyzer_spark.operators.dedup import banded_signatures
    from hadoop_jobanalyzer_spark.sources.bucketed import write_bucketed

    targets = [
        (f"{prefix}_documents", new_docs),
        (f"{prefix}_minhash_sigs", new_sigs),
    ]
    bands_name = f"{prefix}_minhash_bands"
    if bands_name in manifest["tables"]:
        # the bands projection appends in lockstep with the wide table
        # (its banding config rides in the manifest entry)
        spec = manifest["tables"][bands_name]
        targets.append(
            (bands_name, banded_signatures(
                new_sigs, "doc_id",
                n_hashes=spec["n_hashes"], bands=spec["bands"],
            ))
        )
    for name, df in targets:
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


# ---------------------------------------------------------------------------
# Versioned publishes: atomic pointer commit, time-travel reads, vacuum.
#
# The flat layout above is single-writer/single-version: a re-publish
# overwrites the live tables in place, so a reader racing the writer can see
# partial state (the manifest gate DETECTS it, but the snapshot is
# unavailable until the publish finishes), and `compact_bucketed_table`'s
# in-place rewrite documents the same non-atomicity. The versioned layout is
# the standard lakehouse fix: every publish writes a COMPLETE new tree under
# ``root/v{N}/`` with per-version catalog names (``{prefix}_v{N}_documents``),
# then commits by atomically renaming a pointer file (``root/_LATEST``) onto
# the new version. Readers resolve the pointer first, so they only ever see
# fully-committed trees; a writer crash leaves an orphan ``v{N}`` directory
# that no pointer references — invisible to readers, reclaimed by vacuum.
#
# ``os.replace`` is atomic on POSIX filesystems (rename(2)); on an object
# store the same commit is a conditional PUT of the pointer object — the
# layout translates, only the one-line commit primitive changes.
# ---------------------------------------------------------------------------


def list_versions(root: str) -> list[int]:
    """Sorted version numbers with a ``v{N}`` directory under ``root``
    (committed or not — commitment is the pointer's business)."""
    if not os.path.isdir(root):
        return []
    out = []
    for name in os.listdir(root):
        m = re.fullmatch(r"v(\d+)", name)
        if m and os.path.isdir(os.path.join(root, name)):
            out.append(int(m.group(1)))
    return sorted(out)


def latest_version(root: str) -> int | None:
    """The committed version the ``_LATEST`` pointer references, or None
    if nothing has ever been committed."""
    path = os.path.join(root, LATEST_NAME)
    if not os.path.exists(path):
        return None
    with open(path) as fh:
        return int(json.load(fh)["version"])


def version_dir(root: str, version: int) -> str:
    return os.path.join(root, f"v{version}")


def _commit_pointer(root: str, version: int) -> None:
    """Atomically point ``root/_LATEST`` at ``version`` (write-temp +
    rename — readers see the old pointer or the new one, never a torn
    write)."""
    tmp = os.path.join(root, f".{LATEST_NAME}.v{version}.tmp")
    with open(tmp, "w") as fh:
        json.dump({"version": version}, fh)
        fh.write("\n")
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, os.path.join(root, LATEST_NAME))


def publish_snapshot_version(
    spark: SparkSession,
    sf_dir: str,
    root: str,
    n_buckets: int = 64,
    prefix: str = "corpus",
) -> dict:
    """Publish a NEW snapshot version under ``root/v{N}`` and commit the
    pointer. Readers on the previous version are never disturbed: the new
    tree is complete (manifest written last within the tree) before the
    one-step pointer rename makes it visible.

    Version numbers only grow — an orphan directory from a crashed publish
    occupies its number forever (vacuum reclaims the space, not the
    number), so a version id is globally unambiguous in logs and
    manifests."""
    versions = list_versions(root)
    v = (versions[-1] if versions else 0) + 1
    vroot = version_dir(root, v)
    manifest = publish_corpus_snapshot(
        spark, sf_dir, vroot, n_buckets=n_buckets, prefix=f"{prefix}_v{v}"
    )
    manifest["version"] = v
    _write_manifest(vroot, manifest)
    _commit_pointer(root, v)
    return manifest


def read_latest_snapshot(
    spark: SparkSession, root: str, prefix: str = "corpus"
) -> dict[str, DataFrame]:
    """Resolve the ``_LATEST`` pointer and open that version through the
    manifest row-count gate. Raises if nothing was ever committed."""
    v = latest_version(root)
    if v is None:
        raise ValueError(f"no committed snapshot version under {root}")
    return read_corpus_snapshot(spark, version_dir(root, v), prefix=f"{prefix}_v{v}")


def read_snapshot_version(
    spark: SparkSession, root: str, version: int, prefix: str = "corpus"
) -> dict[str, DataFrame]:
    """Time-travel read: open a SPECIFIC committed version, regardless of
    where the ``_LATEST`` pointer sits — the audit/debug/repro path
    ("re-run the eval against the corpus we trained on"). Goes through the
    same manifest row-count gate as a latest read; raises on an orphan
    (crashed publish) or unknown version."""
    vroot = version_dir(root, version)
    if not os.path.exists(os.path.join(vroot, MANIFEST_NAME)):
        raise ValueError(
            f"version {version} under {root} is not a committed snapshot "
            "(no manifest — unknown version or crashed publish)"
        )
    return read_corpus_snapshot(spark, vroot, prefix=f"{prefix}_v{version}")


def rollback_snapshot_to_version(root: str, version: int) -> int:
    """Point ``_LATEST`` back at an older committed version — the one-line
    undo for a bad publish (content bug discovered after commit). Storage
    is untouched, and vacuum never removes versions newer than the pointer
    target — the rolled-back-from version stays on disk (so rolling
    FORWARD again is just another rollback call) until a later publish
    moves the pointer past it and retention reclaims it. Only committed
    versions are valid targets (an orphan tree may be half-written).
    Returns the version now live."""
    vroot = version_dir(root, version)
    if not os.path.exists(os.path.join(vroot, MANIFEST_NAME)):
        raise ValueError(
            f"cannot roll back to {version} under {root}: not a committed "
            "version"
        )
    _commit_pointer(root, version)
    return version


def compact_snapshot_to_new_version(
    spark: SparkSession, root: str, prefix: str = "corpus"
) -> dict:
    """Atomic compaction: rewrite the LATEST version's tables, one file per
    bucket, into a brand-new version and commit the pointer.

    This is the maintenance form `compact_bucketed_table`'s docstring asks
    for: the in-place rewrite is fine in a single-writer window, but a
    crash mid-rewrite leaves the live version partial. Copy-compacting
    into ``v{N+1}`` keeps the old version intact until the pointer flips —
    a crash anywhere leaves readers on the old version and an orphan
    directory for vacuum. Row counts are verified per table BEFORE the
    commit; a rewrite that changed cardinality aborts with the pointer
    untouched."""
    from hadoop_jobanalyzer_spark.sources.bucketed import (
        table_bucket_spec,
        write_bucketed,
    )
    from hadoop_jobanalyzer_spark.util import materialize_eager
    from pyspark.sql import functions as F

    cur = latest_version(root)
    if cur is None:
        raise ValueError(f"no committed snapshot version under {root}")
    with open(os.path.join(version_dir(root, cur), MANIFEST_NAME)) as fh:
        old = json.load(fh)

    v = list_versions(root)[-1] + 1
    vroot = version_dir(root, v)
    os.makedirs(vroot, exist_ok=True)
    old_prefix, new_prefix = f"{prefix}_v{cur}", f"{prefix}_v{v}"
    tables: dict[str, dict] = {}
    for old_name, spec in old["tables"].items():
        short = old_name.removeprefix(f"{old_prefix}_")
        new_name = f"{new_prefix}_{short}"
        # sort spec lives in the catalog, not the manifest (edges sort
        # src,dst while bucketing by src alone) — preserve it exactly
        _, bucket_cols, sort_cols, _ = table_bucket_spec(spark, old_name)
        # materialize first so the shuffle is real (see compact_bucketed_table)
        df = materialize_eager(spark.table(old_name)).repartition(
            spec["n_buckets"], *[F.col(c) for c in bucket_cols]
        )
        write_bucketed(
            df, new_name, bucket_cols, spec["n_buckets"],
            sort_cols=sort_cols or None, path=os.path.join(vroot, short),
        )
        n = spark.table(new_name).count()
        if n != spec["rows"]:
            raise ValueError(
                f"compaction changed {old_name} -> {new_name}: "
                f"{spec['rows']} rows became {n}; pointer NOT moved"
            )
        tables[new_name] = dict(spec)
    manifest = {
        "source": old.get("source"), "root": vroot, "tables": tables,
        "version": v, "compacted_from": cur,
    }
    _write_manifest(vroot, manifest)
    _commit_pointer(root, v)
    return manifest


def vacuum_snapshot_versions(
    spark: SparkSession, root: str, keep: int = 2, prefix: str = "corpus"
) -> dict:
    """Reclaim storage from old and orphaned versions; never touch the
    pointer's target or anything newer than it.

    Removal set: committed history older than the newest ``keep``
    committed versions (time-travel retention), plus orphan directories
    (no manifest — a crashed publish) STRICTLY older than the pointer
    target. An orphan newer than the pointer may be a publish in flight
    and is left alone — at 100 TB the cost of a day's extra storage is
    nothing next to deleting a concurrent writer's half-written tree.
    Catalog entries for removed versions are dropped alongside the
    files."""
    cur = latest_version(root)
    if cur is None:
        raise ValueError(f"no committed snapshot version under {root}")
    committed, orphans = [], []
    for v in list_versions(root):
        if os.path.exists(os.path.join(version_dir(root, v), MANIFEST_NAME)):
            committed.append(v)
        else:
            orphans.append(v)
    doomed = [v for v in committed if v <= cur][:-max(keep, 1)]
    doomed += [v for v in orphans if v < cur]
    removed = []
    for v in sorted(doomed):
        vroot = version_dir(root, v)
        mpath = os.path.join(vroot, MANIFEST_NAME)
        if os.path.exists(mpath):
            with open(mpath) as fh:
                names = list(json.load(fh)["tables"])
        else:  # orphan: drop whatever the crashed publish registered
            names = [
                t.name for t in spark.catalog.listTables()
                if t.name.startswith(f"{prefix}_v{v}_")
            ]
        for name in names:
            spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(vroot)
        removed.append(v)
    return {"removed": removed, "kept": [v for v in committed if v not in removed]}


def snapshot_diff(
    spark: SparkSession, root: str, v_old: int, v_new: int, prefix: str = "corpus"
) -> DataFrame:
    """Per-document change audit between two committed versions:
    ``(doc_id, status)`` with status in added / removed / changed /
    unchanged (text-hash comparison).

    One full-outer join on ``doc_id`` over the two versions' document
    tables. Both are bucketed by ``doc_id``, so with equal bucket counts
    the join is bucket-co-located — no Exchange on either side
    (plan-pinned by tests/test_snapshot.py); the md5 projection is
    column-pruned to (doc_id, text) at the scan. This is the cheap answer
    to "what did that publish actually change?" — at 100 TB it reads two
    column pairs and shuffles nothing."""
    from pyspark.sql import functions as F

    old = spark.table(f"{prefix}_v{v_old}_documents").select(
        "doc_id", F.md5("text").alias("_h_old")
    )
    new = spark.table(f"{prefix}_v{v_new}_documents").select(
        "doc_id", F.md5("text").alias("_h_new")
    )
    return old.join(new, "doc_id", "full_outer").select(
        "doc_id",
        F.when(F.col("_h_old").isNull(), F.lit("added"))
        .when(F.col("_h_new").isNull(), F.lit("removed"))
        .when(F.col("_h_old") != F.col("_h_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
    )


def snapshot_diff_summary(
    spark: SparkSession, root: str, v_old: int, v_new: int, prefix: str = "corpus"
) -> dict[str, int]:
    """Counts by diff status — the one-line publish audit."""
    rows = (
        snapshot_diff(spark, root, v_old, v_new, prefix)
        .groupBy("status").count().collect()
    )
    out = {"added": 0, "removed": 0, "changed": 0, "unchanged": 0}
    out.update({r["status"]: r["count"] for r in rows})
    return out


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
