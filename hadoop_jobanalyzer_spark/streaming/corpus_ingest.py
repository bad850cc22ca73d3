"""Streaming corpus ingest: incremental dedup at arrival time.

The batch-side snapshot layer (`plans/snapshot.py`) publishes the corpus
and its MinHash signature table once per snapshot; this module is the
ARRIVAL path. Documents land as files, a Structured Streaming query picks
them up in micro-batches, dedups each batch against everything already
ingested (published base + previously-ingested delta), and lands the
batch's keep/drop decisions and the kept docs/signatures in a replay-safe
delta area. A separate compaction job folds the delta into the bucketed
base tables — the base-plus-delta cadence the snapshot layer documents.

Replay safety WITHOUT a commit ledger: every per-batch write is
partitioned by ``_batch_id`` with dynamic partition overwrite (the
`streaming/sinks.py` idempotent-writer contract), so a replayed
micro-batch overwrites exactly its own partitions and never duplicates.
The stream never appends to the bucketed snapshot tables directly —
`saveAsTable(mode="append")` is NOT idempotent under micro-batch replay.

Three replay subtleties this module gets right (all pinned by
tests/test_corpus_ingest_stream.py):

- **A replayed batch must not dedup against its own half-written
  output.** The delta read inside the batch function prunes
  ``_batch_id >= current`` at the PATH level (the partition directories
  are never listed into the read), otherwise a crash-then-replay of
  batch N would see N's own docs in the delta and drop the whole batch
  as self-duplicates.
- **A replayed batch must not let its predecessor's torn files poison
  the delta read.** An abrupt kill mid-write leaves corrupt parquet
  under the killed batch's own partition; a whole-directory read then
  throws during schema inference, and treating that as "no delta yet"
  (the pre-r10 behavior) silently deduped the replay against the base
  only — duplicates of delta docs sailed through. Path-level pruning
  excludes exactly the torn partitions (they always belong to batch ids
  >= the replaying batch), and any residual read error now FAILS the
  micro-batch — replay-safe — instead of corrupting decisions.
- **Compaction is idempotent, not transactional.** It appends
  delta-minus-base (a doc_id anti-join, bucket-co-located on both sides)
  into the base tables, refreshes the manifest, then clears the delta.
  A crash between append and clear re-runs safely: the anti-join finds
  nothing left to append. Compaction is a single-writer maintenance job;
  don't run it concurrently with a live ingest stream over the same root.

Scale notes (100 TB regime): per batch, cost is O(batch) signature work
plus a band-key join against the signature store — never a corpus
re-shingle (`operators/dedup.lsh_candidate_pairs_incremental`). When the
snapshot publishes the pre-banded ``{prefix}_minhash_bands`` table
(bkey-bucketed + sorted) AND the store is large enough for pruning to
pay (``BANDS_MIN_STORE_ROWS`` — measured: the pruned read carries ~2x
per-batch fixed overhead that a small store's wide scan never costs),
the store side of that join is read through the batch's touched-bucket
pushdown filter — bucket files and row groups that no batch document
can collide with are never read, so the per-batch store READ is
O(touched buckets) too, not a full scan. Band
buckets are capped (``max_bucket``), so a pathological boilerplate band
cannot quadratically explode a batch. Delta files accumulate one
directory per micro-batch; compaction is the no-small-files backstop and
restores the bucket co-location guarantee for downstream joins.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DELTA_DIRS = ("ingest_delta/documents", "ingest_delta/minhash_sigs",
              "ingest_delta/decisions")


def _delta_path(root: str, kind: str) -> str:
    return os.path.join(root, "ingest_delta", kind)


def _read_delta(
    spark: SparkSession, root: str, kind: str, before_batch: int | None = None
) -> DataFrame | None:
    """Delta frame for ``kind`` (with its ``_batch_id`` partition column),
    or None when no qualifying batch partition has landed yet.

    ``before_batch`` selects partitions with ``_batch_id < before_batch``
    AT THE PATH LEVEL, not as a post-read filter. That distinction is the
    r10 kill-soak fix: an abruptly killed batch N leaves TORN parquet
    under its own ``_batch_id=N`` directory, and a whole-directory read
    on replay then throws while inferring schema from the corrupt
    footers — before r10 that exception was swallowed as "no delta yet",
    so the replayed batch silently deduped against the BASE ONLY and
    KEPT duplicates of earlier-delta docs (observed: one copy shard
    retained, zero recorded hits, ~1-in-2 soak runs). Torn files can
    only exist in partitions of batches that never completed
    ``foreachBatch`` — ids >= the replaying batch — so path-pruning them
    is exact, and the replay's own dynamic overwrite rewrites them.

    The listing is explicitly refreshed first: path reads share the
    session FileStatusCache, and a listing cached during an interrupted
    write can outlive the write that later completes the partition
    (observed in r9 as batch N+1 missing batch N's committed directory;
    state on disk was complete, only the cached listing was stale).

    Read errors now PROPAGATE: with torn-partition pruning in place, a
    failure here means committed data is unreadable (or IO is flaking),
    and failing the micro-batch is replay-safe while a silently wrong
    dedup decision is permanent corpus corruption."""
    path = _delta_path(root, kind)
    if not os.path.isdir(path):
        return None
    parts = []
    for d in os.listdir(path):
        if not d.startswith("_batch_id="):
            continue
        if before_batch is not None and int(d.split("=", 1)[1]) >= before_batch:
            continue
        parts.append(os.path.join(path, d))
    if not parts:
        return None
    spark.catalog.refreshByPath(path)
    return spark.read.option("basePath", path).parquet(*sorted(parts))


# The pruned bands read only PAYS above this store size. Measured
# (tools/ingest_probe.py --layout both, r10, stores of 5e2..5e5 docs —
# a 1000x range): the wide scan+explode stays ~flat and sub-second at
# every locally buildable store, while the bands read carries ~2x
# per-batch FIXED overhead (touched-key collect + bucketed multi-file
# listing + at toy scale nothing to row-group-prune). The wide path's
# O(store) term only clears that overhead once the banded store has
# row groups to skip — order 1e7+ band rows (the 100 TB regime it was
# built for). Below the threshold a batch reads the wide table; the
# bands table keeps APPENDING in lockstep either way (append is
# batch-scaled), so the pruned path activates seamlessly — and
# reversibly — as the store grows past the threshold.
BANDS_MIN_STORE_ROWS = 10_000_000


def _bands_read_pays(root: str, bands_table: str) -> bool:
    """True when the published bands store is large enough that the
    touched-bucket pruned read beats the wide scan+explode (threshold
    env-overridable: HJA_BANDS_MIN_STORE_ROWS; set 0 to force the
    pruned path, e.g. in tests)."""
    import json

    from hadoop_jobanalyzer_spark.plans.snapshot import MANIFEST_NAME

    threshold = int(
        os.environ.get("HJA_BANDS_MIN_STORE_ROWS", str(BANDS_MIN_STORE_ROWS))
    )
    if threshold <= 0:
        return True
    manifest_path = os.path.join(root, MANIFEST_NAME)
    try:
        with open(manifest_path) as fh:
            rows = int(json.load(fh)["tables"][bands_table]["rows"])
    except (OSError, KeyError, ValueError, TypeError):
        # Unknown size: take the measured-fast wide path — but say so.
        # At the store sizes this gate was built for, a manifest glitch
        # silently degrading every micro-batch to a full wide store scan
        # would look like an unexplained throughput collapse.
        import logging

        logging.getLogger(__name__).warning(
            "bands table %s exists but its size could not be read from %s; "
            "falling back to the wide signature-store scan for this batch",
            bands_table, manifest_path,
        )
        return False
    return rows >= threshold


def make_ingest_batch(
    root: str,
    prefix: str = "corpus",
    min_shared_bands: int = 1,
    max_bucket: int | None = 1000,
) -> Callable[[DataFrame, int], None]:
    """Build the ``foreachBatch`` function for a corpus-ingest stream.

    Per micro-batch of documents (same schema as ``{prefix}_documents``;
    doc_ids globally unique by ingest contract):

    1. MinHash signatures for the BATCH ONLY; LSH band-join against the
       published signature table plus the already-kept delta signatures
       from batches ``< batch_id`` (replay prune — see module docstring).
    2. Keep/drop: a new doc drops when it shares >= ``min_shared_bands``
       bands with any already-ingested doc, or with a smaller-doc_id doc
       of the same batch (deterministic leader-keeps rule, the same
       min-id convention as the corpus dedup clusters).
    3. Land kept docs, kept docs' signatures, and the full decision audit
       (one row per batch doc) under ``root/ingest_delta``, each
       partitioned by ``_batch_id`` with dynamic overwrite.

    Only KEPT docs' signatures enter the delta store: a future doc
    near-duplicating a dropped doc is caught through the kept
    representative it was dropped against (banding is not transitive, but
    the representative shares the very bands that caused the drop for
    exact and near-exact duplicates — and the global rebuild at the next
    full publish is the corrector, per the snapshot layer's contract).
    """
    from hadoop_jobanalyzer_spark.operators.dedup import (
        banded_signatures,
        lsh_candidate_pairs_incremental,
    )
    from hadoop_jobanalyzer_spark.plans.pipeline_queries import _BANDS, _N_HASHES

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # before_batch prunes self/torn partitions at the path level (see
        # _read_delta); the residual filter is defense-in-depth only
        delta_sigs = _read_delta(spark, root, "minhash_sigs", before_batch=batch_id)
        if delta_sigs is not None:
            delta_sigs = delta_sigs.filter(F.col("_batch_id") < batch_id)

        stored_sigs = stored_bands = None
        if spark.catalog.tableExists(f"{prefix}_minhash_bands") and _bands_read_pays(
            root, f"{prefix}_minhash_bands"
        ):
            # pre-banded bkey-bucketed store: the touched-bucket pushdown
            # prunes the base scan; the (delta-scaled) delta sigs are
            # banded here — the filter pushes through the union to the
            # base side, and the delta side is small by the compaction
            # cadence contract
            stored_bands = spark.table(f"{prefix}_minhash_bands")
            if delta_sigs is not None:
                stored_bands = stored_bands.unionByName(
                    banded_signatures(
                        delta_sigs, "doc_id", n_hashes=_N_HASHES, bands=_BANDS
                    )
                )
        else:
            stored_sigs = spark.table(f"{prefix}_minhash_sigs")
            if delta_sigs is not None:
                stored_sigs = stored_sigs.unionByName(
                    delta_sigs.select(stored_sigs.columns)
                )

        pairs, new_sigs = lsh_candidate_pairs_incremental(
            batch_df, "doc_id", "text", stored_sigs,
            n_hashes=_N_HASHES, bands=_BANDS, max_bucket=max_bucket, ngram=3,
            stored_bands=stored_bands,
        )
        new_ids = batch_df.select("doc_id")
        flagged = (
            pairs.filter(F.col("n_shared_bands") >= min_shared_bands)
            # classify each partner: id_a < id_b always, and a batch id is
            # "new"; a pair drops id_b when both are new (leader keeps),
            # and drops the new side when the partner is already ingested
            .join(
                new_ids.select(F.col("doc_id").alias("id_a"), F.lit(True).alias("_a_new")),
                "id_a", "left",
            )
            .join(
                new_ids.select(F.col("doc_id").alias("id_b"), F.lit(True).alias("_b_new")),
                "id_b", "left",
            )
            .select(
                F.when(F.col("_a_new") & F.col("_b_new"), F.col("id_b"))
                .when(F.col("_a_new").isNotNull() & F.col("_b_new").isNull(), F.col("id_a"))
                .when(F.col("_a_new").isNull() & F.col("_b_new").isNotNull(), F.col("id_b"))
                .alias("doc_id"),
                (F.col("_a_new").isNotNull() & F.col("_b_new").isNotNull()).alias("_vs_new"),
            )
            .where(F.col("doc_id").isNotNull())
            .groupBy("doc_id")
            .agg(
                F.sum(F.when(~F.col("_vs_new"), 1).otherwise(0)).alias("n_old_hits"),
                F.sum(F.when(F.col("_vs_new"), 1).otherwise(0)).alias("n_new_hits"),
            )
        )
        decisions = (
            batch_df.select("doc_id")
            .join(flagged, "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce("n_old_hits", F.lit(0)).alias("n_old_hits"),
                F.coalesce("n_new_hits", F.lit(0)).alias("n_new_hits"),
                (F.coalesce("n_old_hits", F.lit(0)) + F.coalesce("n_new_hits", F.lit(0)) == 0)
                .alias("kept"),
            )
        )
        # all three writes hang off the same decision frame — evaluate the
        # LSH join once, not once per sink
        decisions = decisions.persist()
        try:
            kept_ids = decisions.filter("kept").select("doc_id")
            _overwrite_batch(
                batch_df.join(kept_ids, "doc_id", "left_semi"),
                _delta_path(root, "documents"), batch_id,
            )
            _overwrite_batch(
                new_sigs.join(kept_ids, "doc_id", "left_semi"),
                _delta_path(root, "minhash_sigs"), batch_id,
            )
            _overwrite_batch(decisions, _delta_path(root, "decisions"), batch_id)
        finally:
            decisions.unpersist()

    return ingest


def _overwrite_batch(df: DataFrame, path: str, batch_id: int) -> None:
    """Land one batch's rows under ``path/_batch_id=N`` — dynamic partition
    overwrite makes a replayed batch rewrite exactly its own directory."""
    (
        df.withColumn("_batch_id", F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("_batch_id")
        .parquet(path)
    )


def start_corpus_ingest(
    spark: SparkSession,
    docs_path: str | None,
    root: str,
    checkpoint: str,
    prefix: str = "corpus",
    max_files_per_trigger: int = 1,
    min_shared_bands: int = 1,
    max_bucket: int | None = 1000,
    stream: DataFrame | None = None,
):
    """Start an ``availableNow`` ingest pass over the parquet document
    files under ``docs_path``. Returns the StreamingQuery; rerun with the
    same checkpoint to pick up files that arrived since the last pass.

    Arrivals in another format compose through ``stream``: pass any
    streaming DataFrame carrying the document columns (e.g.
    ``sources.corpus.read_jsonl_corpus_stream`` for JSONL shards, or the
    WARC datasource piped through a payload-to-text projection) and
    ``docs_path`` is ignored. The batch function only needs the
    ``{prefix}_documents`` columns present."""
    if stream is None:
        stream = (
            spark.readStream.schema(spark.table(f"{prefix}_documents").schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(docs_path)
        )
    return (
        stream.writeStream.foreachBatch(
            make_ingest_batch(root, prefix, min_shared_bands, max_bucket)
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def start_corpus_ingest_latest(
    spark: SparkSession,
    docs_path: str | None,
    snapshot_root: str,
    checkpoint: str,
    prefix: str = "corpus",
    **kwargs,
):
    """Ingest against the LATEST committed version of a versioned snapshot
    (`plans/snapshot.publish_snapshot_version`): resolve the ``_LATEST``
    pointer, then run :func:`start_corpus_ingest` with that version's
    directory and per-version table names.

    The ingest delta lands INSIDE the version directory, so each version
    owns its whole lifecycle: a later publish starts a clean ingest lane
    against the new version while an in-flight stream keeps draining into
    the old one, and vacuuming a version reclaims its delta with it. The
    checkpoint is caller-owned — use a fresh checkpoint per version (a
    checkpoint binds the stream to the batch function it started with)."""
    from hadoop_jobanalyzer_spark.plans.snapshot import latest_version, version_dir

    v = latest_version(snapshot_root)
    if v is None:
        raise ValueError(f"no committed snapshot version under {snapshot_root}")
    return start_corpus_ingest(
        spark, docs_path, version_dir(snapshot_root, v), checkpoint,
        prefix=f"{prefix}_v{v}", **kwargs,
    )


def read_ingested_documents(
    spark: SparkSession, root: str, prefix: str = "corpus"
) -> DataFrame:
    """The live corpus view: published base plus the kept delta docs."""
    base = spark.table(f"{prefix}_documents")
    delta = _read_delta(spark, root, "documents")
    if delta is None:
        return base
    return base.unionByName(delta.select(base.columns))


def compact_ingest_delta(
    spark: SparkSession, root: str, prefix: str = "corpus",
    refresh_clusters: bool = False,
) -> dict | None:
    """Fold the ingest delta into the bucketed base tables and clear it.

    Appends delta-minus-base (doc_id anti-join; both sides bucketed by
    doc_id, so the join is co-located) through
    `plans/snapshot.append_batch_to_snapshot`, which preserves the bucket
    spec and refreshes the manifest's row counts. Idempotent: re-running
    after a crash between append and clear appends nothing. Returns the
    refreshed manifest, or None when there was no delta to fold.

    ``refresh_clusters=True`` additionally runs
    `plans/snapshot.refresh_dedup_clusters_incremental` after the fold, so
    the dedup-label table stays current at O(batch) cost instead of going
    stale until the next full publish. The refresh derives its work from
    the tables themselves, so a crash between the fold and the refresh
    heals on the next invocation (or on a standalone refresh call).
    """
    from hadoop_jobanalyzer_spark.plans.snapshot import append_batch_to_snapshot
    from hadoop_jobanalyzer_spark.util import materialize_eager

    delta_docs = _read_delta(spark, root, "documents")
    delta_sigs = _read_delta(spark, root, "minhash_sigs")
    if delta_docs is None or delta_sigs is None:
        return None
    base = spark.table(f"{prefix}_documents")
    # materialize BEFORE appending: the anti-joins read the very tables the
    # append mutates, and a lazy frame would re-evaluate against the
    # already-appended table at write time — the sigs append would then
    # anti-join its own rows away (found by the compaction test)
    new_docs = materialize_eager(
        delta_docs.join(base.select("doc_id"), "doc_id", "left_anti")
    )
    new_sigs = materialize_eager(
        delta_sigs.join(base.select("doc_id"), "doc_id", "left_anti")
    )
    manifest = append_batch_to_snapshot(spark, root, new_docs, new_sigs, prefix)
    # the appended rows are durable and counted in the manifest; the delta
    # (including the decision audit for compacted batches) has served its
    # purpose — clear so the next stream pass starts from an empty delta
    shutil.rmtree(os.path.join(root, "ingest_delta"), ignore_errors=True)
    if refresh_clusters:
        from hadoop_jobanalyzer_spark.plans.snapshot import (
            refresh_dedup_clusters_incremental,
        )

        manifest["cluster_refresh"] = refresh_dedup_clusters_incremental(
            spark, root, prefix=prefix
        )
    return manifest
