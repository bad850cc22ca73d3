"""Small engine utilities shared across operators."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# Interior-plan capture for the fleet plan audit. A checkpointed frame
# prints as `Scan ExistingRDD` (and a persisted one as InMemoryTableScan)
# in every downstream explain, so joins INTERIOR to a materialization are
# invisible to an `.explain()` on a query's final frame — the r10 audit's
# documented blind spot. tools/plan_audit.py (and the plan-quality
# canaries) set PLAN_CAPTURE to a list while constructing a query; every
# frame the engine materializes or session-caches then appends its
# formatted physical plan here for the same fatal-broadcast/cartesian
# classification the top-level plan gets. None (the default) costs one
# `is not None` check per materialize call.
PLAN_CAPTURE: list[str] | None = None


def formatted_plan(df: DataFrame) -> str:
    """``df.explain("formatted")`` as a string (no stdout redirection)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[union-attr]
        df._jdf.queryExecution(), "formatted"
    )


def capture_plan(df: DataFrame) -> None:
    """Record ``df``'s physical plan if an audit capture is active."""
    if PLAN_CAPTURE is not None:
        PLAN_CAPTURE.append(formatted_plan(df))


def pair_structs(ids: Column) -> Column:
    """All (id_a < id_b) pairs from a sorted id array — in-bucket candidate
    generation for LSH/inverted-index dedup. O(|bucket|^2) by design; callers
    bound bucket size for the degenerate giant-bucket case at scale."""
    return F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(ids, i + F.lit(2), F.size(ids)),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )


def epoch_ms(col: Column | str) -> Column:
    """Epoch milliseconds from any timestamp flavor.

    Parquet written by different writers surfaces as TIMESTAMP or
    TIMESTAMP_NTZ depending on the writer and Spark version, and
    ``F.unix_millis`` is strict about NTZ. The session timezone is pinned
    UTC (session.py), so NTZ->LTZ via an explicit cast is value-preserving
    and matches DuckDB's ``epoch_ms``. Every epoch-math consumer in the
    engine goes through this helper so a writer-side type drift can never
    break a plan again.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_millis(c.cast("timestamp"))


def epoch_s(col: Column | str) -> Column:
    """Epoch seconds (floor) from any timestamp flavor; see ``epoch_ms``."""
    return (epoch_ms(col) / 1000).cast("long")


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Fan a narrow scan out to the session's parallelism before CPU-heavy
    per-row work.

    A small parquet file arrives as one input split, which serializes every
    downstream projection (hashing, shingling, feature extraction) onto one
    core. When the scan has fewer partitions than the session's default
    parallelism, round-robin repartition; otherwise no-op — at real corpus
    scale (many files / many row groups) the scan is already parallel and
    this adds nothing.
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def materialize(df: DataFrame, eager: bool = False) -> DataFrame:
    """Compute-once a reused subtree with truncated lineage — the engine's
    ONE materialization primitive for per-operator reuse (the two bounded
    session caches keep explicit ``.persist()`` with eviction hooks).

    Durability is session-configured, not hard-coded at call sites:

    - **Checkpoint dir set** (``sc.setCheckpointDir(...)`` — the cluster
      deployment contract): reliable ``checkpoint()``. Blocks live on the
      shared filesystem (hdfs://, s3a://), so an executor loss or
      dynamic-allocation decommission recomputes nothing and fails
      nothing. Checkpoint files are reclaimed on frame GC because
      ``session.ENGINE_CONF`` ships
      ``spark.cleaner.referenceTracking.cleanCheckpoints=true`` — keep
      that set on foreign sessions or the files accumulate.
      This path is always EAGER and persist-wrapped: a reliable
      checkpoint otherwise runs the subtree TWICE (the action computes
      the rows, then ``ReliableRDDCheckpointData`` re-runs the lineage
      to write the checkpoint files), and the second, independent
      evaluation is what downstream consumers would read — a correctness
      hazard for any nondeterministic subtree. Persisting around an
      eager checkpoint makes the write job read the cached blocks: one
      compute, one cache read, and the checkpoint captures the SAME
      evaluation the first action saw.
    - **No checkpoint dir** (single-node / test / bench sessions):
      ``localCheckpoint()``. Executor-local, zero-copy-fast, and
      ContextCleaner-owned — blocks release when the frame is GC'd, so
      per-call use cannot leak CacheManager entries (the r4 leak class).
      The known trade: localCheckpoint blocks are unreplicated, so on a
      multi-executor session WITHOUT a checkpoint dir an executor loss is
      unrecoverable — long-lived cluster jobs must set a checkpoint dir.

    ``eager`` applies to the localCheckpoint path only (lazy by default:
    materializes on the consumer's first action, one pass; pass
    ``eager=True`` inside iterative loops that must pin a round before
    measuring convergence). The reliable path ignores it — see above.
    Either way the child prints as ``Scan ExistingRDD`` in the formatted
    plan, so downstream shuffle budgets (tests/test_plan_quality.py) are
    unaffected.
    """
    capture_plan(df)  # the plan a checkpoint would otherwise hide for good
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        # skip the wrap when the caller already persisted the frame: the
        # existing cache equally de-duplicates the two checkpoint jobs,
        # and unpersisting here would evict the CALLER's cache
        already_cached = df.storageLevel.useMemory or df.storageLevel.useDisk
        if not already_cached:
            df.persist()
        try:
            return df.checkpoint(eager=True)
        finally:
            if not already_cached:
                df.unpersist()
    return df.localCheckpoint(eager=eager)


def materialize_eager(df: DataFrame) -> DataFrame:
    """``materialize(df, eager=True)`` in ``.transform()``-friendly form."""
    return materialize(df, eager=True)


def bucketed_global_rank(
    df: DataFrame,
    bucket: Column,
    order_within: list[Column],
    out: str = "rk",
) -> DataFrame:
    """Global 1-based rank by (``bucket`` asc, ``order_within``) WITHOUT a
    single-partition window: the scalable form of ``ROW_NUMBER() OVER
    (ORDER BY ...)`` whenever the leading sort key has bounded
    cardinality (an md5 hex prefix, a length, a date).

    The global rank decomposes into (a) a row_number WITHIN each bucket
    (parallel windows, one shuffle partitioned by bucket) plus (b) the
    bucket's global offset, a prefix sum over the bucket-count aggregate
    (tiny: one row per distinct bucket — ITS single-partition window
    touches the bucket table, not the data). This is exactly how a
    distributed sort assigns stable global positions — range partitions
    + local ranks + partition offsets — expressed declaratively.

    An engine-independent oracle can use the plain global ROW_NUMBER
    over the same total order: the ranks are identical by construction.
    """
    from pyspark.sql.window import Window

    bucketed = df.withColumn("_bkt", bucket)
    counts = bucketed.groupBy("_bkt").agg(F.count("*").alias("_n"))
    offsets = counts.select(
        "_bkt",
        (
            F.sum("_n").over(
                Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
            )
        ).alias("_off"),
    ).fillna(0, subset=["_off"])
    local = Window.partitionBy("_bkt").orderBy(*order_within)
    return (
        bucketed.withColumn("_lrk", F.row_number().over(local))
        .join(F.broadcast(offsets), "_bkt")
        .withColumn(out, (F.col("_off") + F.col("_lrk")).cast("long"))
        .drop("_bkt", "_lrk", "_off")
    )
