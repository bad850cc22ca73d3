"""incremental_connected_components == full CC over the union graph.

The operator's contract is exact equivalence with recomputing
connected_components over (old edges ∪ new edges) on the full node
universe — these tests pin it on the shapes that break naive
implementations: a batch edge bridging two old components, a new id
smaller than every old label (the min must propagate INTO the old
component), isolated new nodes, edges between two new nodes, and the
empty batch.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_jobanalyzer_spark.operators.graph import (
    connected_components,
    incremental_connected_components,
)


def _labels(spark, rows):
    return spark.createDataFrame(rows, "id long, component long")


def _edges(spark, pairs):
    return spark.createDataFrame(pairs or [(None, None)], "src long, dst long").filter(
        F.col("src").isNotNull()
    )


def _nodes(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "id long")


def _full_recompute(spark, old_edges, new_edges, all_ids):
    edges = _edges(spark, old_edges + new_edges)
    return connected_components(edges, nodes=_nodes(spark, all_ids))


def _assert_same(inc_df, full_df):
    inc = sorted(tuple(r) for r in inc_df.collect())
    full = sorted(tuple(r) for r in full_df.collect())
    assert inc == full


def _run(spark, old_edges, old_ids, new_edges, new_ids):
    old = connected_components(_edges(spark, old_edges), nodes=_nodes(spark, old_ids))
    inc = incremental_connected_components(
        old, _edges(spark, new_edges), new_nodes=_nodes(spark, new_ids)
    )
    full = _full_recompute(spark, old_edges, new_edges, sorted(set(old_ids) | set(new_ids)))
    _assert_same(inc, full)
    return inc


def test_bridge_two_old_components(spark):
    # 10-11-12 and 20-21 are separate; new doc 30 pairs with both sides
    _run(
        spark,
        old_edges=[(10, 11), (11, 12), (20, 21)],
        old_ids=[10, 11, 12, 20, 21, 40],
        new_edges=[(30, 12), (30, 20)],
        new_ids=[30],
    )


def test_new_id_smaller_than_old_min(spark):
    # the new node is the smallest id in its merged component — its id
    # must become the label of every old member
    inc = _run(
        spark,
        old_edges=[(10, 11)],
        old_ids=[10, 11],
        new_edges=[(5, 11)],
        new_ids=[5],
    )
    got = {r["id"]: r["component"] for r in inc.collect()}
    assert got == {5: 5, 10: 5, 11: 5}


def test_isolated_new_nodes_and_untouched_components(spark):
    inc = _run(
        spark,
        old_edges=[(10, 11), (20, 21)],
        old_ids=[10, 11, 20, 21, 30],
        new_edges=[(40, 41)],  # purely new-x-new edge
        new_ids=[40, 41, 42],  # 42 is isolated
    )
    got = {r["id"]: r["component"] for r in inc.collect()}
    assert got[40] == 40 and got[41] == 40 and got[42] == 42
    # untouched components keep their labels
    assert got[10] == 10 and got[20] == 20 and got[30] == 30


def test_chain_of_component_merges(spark):
    # one batch whose edges chain three old components plus a new node
    _run(
        spark,
        old_edges=[(10, 11), (20, 21), (30, 31)],
        old_ids=[10, 11, 20, 21, 30, 31],
        new_edges=[(11, 21), (21, 50), (50, 31)],
        new_ids=[50],
    )


def test_empty_batch_is_identity(spark):
    old = connected_components(
        _edges(spark, [(10, 11)]), nodes=_nodes(spark, [10, 11, 12])
    )
    inc = incremental_connected_components(
        old, _edges(spark, []), new_nodes=_nodes(spark, [])
    )
    _assert_same(inc, old)
