"""Iterative graph operators: connected components for dedup clustering.

The production use is near-duplicate *clustering*: LSH+Jaccard emits pairs
(edges); turning pairs into dedup groups ("keep one doc per component") is a
connected-components problem. The reference has no graph surface at all —
this is part of the training-data-pipeline extension layer.

Algorithm: min-label propagation with pointer jumping (label <- label of
label each round), so convergence is O(log(longest path)) rounds instead of
O(diameter). Each round is two shuffles (neighbor-min groupBy + the
pointer-jump self-join) over a (node, label) table that never exceeds one
row per node — the shape that survives 100 TB. Lineage is truncated every
round with ``localCheckpoint`` (on a real cluster, set a checkpoint dir and
use ``checkpoint`` for fault tolerance); convergence is detected with one
count per round, which is a driver action by necessity — every distributed
CC implementation (GraphX, GraphFrames) pays the same per-round barrier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    nodes: DataFrame | None = None,
    id_col: str = "id",
    max_iter: int = 50,
) -> DataFrame:
    """Label each node with the minimum node id reachable from it.

    ``edges`` is undirected (one direction per pair is enough — it is
    symmetrized here). ``nodes`` optionally supplies the full node universe
    (single-column ``id_col``) so isolated nodes get their own singleton
    component; otherwise the universe is the set of edge endpoints.

    Returns a DataFrame (``id_col``, ``component``).
    """
    a = F.col(src).alias("_a")
    b = F.col(dst).alias("_b")
    sym = edges.select(a, b).union(edges.select(b.alias("_a"), a.alias("_b"))).distinct()
    # Materialize the edge list once: the loop re-reads it every round, and
    # without this each iteration would recompute the (possibly expensive)
    # upstream pipeline that produced the edges — e.g. the full LSH+Jaccard
    # dedup when clustering near-dup pairs.
    sym = sym.localCheckpoint(eager=True)

    if nodes is None:
        universe = sym.select(F.col("_a").alias(id_col)).distinct()
    else:
        universe = nodes.select(F.col(id_col)).distinct()

    labels = universe.select(F.col(id_col), F.col(id_col).alias("component"))
    labels = labels.localCheckpoint(eager=True)

    for _ in range(max_iter):
        # 1 shuffle: min label over direct neighbors
        neigh = (
            sym.join(labels.select(F.col(id_col).alias("_b"), "component"), "_b")
            .groupBy("_a")
            .agg(F.min("component").alias("_nmin"))
        )
        # the pre-round label rides along as _old so convergence needs no
        # extra join against the previous table
        stepped = (
            labels.join(neigh.withColumnRenamed("_a", id_col), id_col, "left")
            .select(
                F.col(id_col),
                F.least(F.col("component"), F.coalesce("_nmin", "component")).alias(
                    "component"
                ),
                F.col("component").alias("_old"),
            )
        )
        # pointer jumping: component <- component(component). Every label is
        # itself a node id, so the inner self-join is total.
        jumped = (
            stepped.alias("x")
            .join(
                stepped.select(
                    F.col(id_col).alias("_lid"), F.col("component").alias("_lcomp")
                ),
                F.col("x.component") == F.col("_lid"),
            )
            .select(
                F.col(f"x.{id_col}"),
                F.least("x.component", "_lcomp").alias("component"),
                F.col("x._old").alias("_old"),
            )
        )
        # lazy checkpoint + count: one action both materializes the round
        # (truncating lineage) and measures convergence
        jumped = jumped.localCheckpoint(eager=False)
        changed = jumped.filter(F.col("component") != F.col("_old")).count()
        labels = jumped.select(id_col, "component")
        if changed == 0:
            break
    return labels


def component_sizes(components: DataFrame, id_col: str = "id") -> DataFrame:
    """(id, component) -> (id, component, cluster_size)."""
    sizes = components.groupBy("component").agg(F.count("*").alias("cluster_size"))
    return components.join(sizes, "component").select(id_col, "component", "cluster_size")
