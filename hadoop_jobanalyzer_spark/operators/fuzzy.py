"""Blocked fuzzy (edit-distance) matching.

An all-pairs levenshtein join is O(n^2) and never survives corpus scale.
The standard shape is *blocking*: a cheap deterministic key (language +
length band here; phonetic keys, sorted-token prefixes, or LSH buckets in
general) partitions the corpus so the quadratic comparison runs only
inside blocks, and the per-pair cost is bounded by comparing fixed-length
prefixes. Both the blocking join and the levenshtein expression are
JVM-side Catalyst operations — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from hadoop_jobanalyzer_spark.util import materialize, spread


def blocked_levenshtein_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block: Column,
    prefix_len: int = 40,
    max_dist: int = 8,
    max_block: int | None = None,
) -> DataFrame:
    """All (id_a < id_b) pairs within a block whose ``prefix_len``-char
    prefixes are within ``max_dist`` edits.

    ``block`` is the blocking key expression (evaluated against ``df``'s
    columns). Near-miss pairs straddling a block boundary are the method's
    documented recall tradeoff — callers wanting boundary overlap pass a
    coarser or doubled key. Output: id_a, id_b, lev.

    Cost model: Σ C(|block|, 2) — per-block cardinality grows LINEARLY
    with corpus size for a fixed key (lang × length-band densifies, it
    doesn't widen), so the pair join is quadratic in growth unless the
    caller bounds it (measured: ×10 corpus → 13.5× wall, tools/scale10
    fleet sweep). ``max_block`` is that bound — blocks larger than the
    cap are dropped whole before the self-join, the same giant-bucket
    guard the LSH/shingle operators apply (``max_bucket``): an over-cap
    block is the degenerate "everything looks alike" case where
    edit-distance pairs stop being informative. At corpus scale pass a
    cap (or a higher-entropy key); None preserves exact semantics for
    bounded inputs.
    """
    keyed = spread(df).select(
        F.col(id_col),
        block.alias("_blk"),
        F.substring(F.col(text_col), 1, prefix_len).alias("_pfx"),
    )
    if max_block is not None:
        sized = keyed.groupBy("_blk").agg(F.count("*").alias("_bsz"))
        keyed = (
            keyed.join(sized.filter(F.col("_bsz") <= max_block), "_blk")
            .drop("_bsz")
        )
        # the capped table feeds both sides of the self-join below;
        # without this each side recomputes the scan + block-size
        # aggregate + cap join (multi-consumer rule)
        keyed = materialize(keyed)
    a = keyed.select(
        F.col("_blk"), F.col(id_col).alias("id_a"), F.col("_pfx").alias("_pfx_a")
    )
    b = keyed.select(
        F.col("_blk"), F.col(id_col).alias("id_b"), F.col("_pfx").alias("_pfx_b")
    )
    if max_block is not None:
        # CAPPED, the build side is TRULY bounded by construction:
        # <= |block-key domain| x max_block rows at any corpus scale
        # (over-cap blocks drop whole before the join), so the broadcast
        # is asserted explicitly — dispositioned in tools/plan_audit.py.
        # The r10 shuffle-hash pin tried here first measured 3.9x slower
        # at sf0.1 for zero scale benefit; bound-backed broadcasts stay.
        b = F.broadcast(b)
    else:
        # UNCAPPED, per-block cardinality densifies linearly with the
        # corpus and the materialized table's copied estimate is not a
        # real size — the q235 runtime-broadcast abort class (r10 audit):
        # pin shuffle-hash.
        b = b.hint("shuffle_hash")
    return (
        a.join(b, "_blk")
        .filter(F.col("id_a") < F.col("id_b"))
        # levenshtein's optional threshold arg short-circuits rows whose
        # distance exceeds max_dist (returns -1) instead of filling the
        # full DP matrix — cheaper than computing then filtering.
        .withColumn("lev", F.levenshtein("_pfx_a", "_pfx_b", max_dist))
        .filter(F.col("lev") >= 0)
        .select("id_a", "id_b", "lev")
        .orderBy("id_a", "id_b")
    )
