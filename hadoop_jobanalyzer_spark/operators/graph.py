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
round with ``util.materialize`` — reliable ``checkpoint()`` when the session
has a checkpoint dir (the cluster deployment contract), executor-local
``localCheckpoint()`` otherwise; convergence is detected with one
count per round, which is a driver action by necessity — every distributed
CC implementation (GraphX, GraphFrames) pays the same per-round barrier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from hadoop_jobanalyzer_spark.util import materialize, materialize_eager


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
    component; otherwise the universe is the set of edge endpoints. When
    given, ``nodes`` must contain every edge endpoint (the documented
    "full universe" contract — every in-repo caller passes the population
    its edges were mined from).

    Returns a DataFrame (``id_col``, ``component``).
    """
    a = F.col(src).alias("_a")
    b = F.col(dst).alias("_b")
    sym = edges.select(a, b).union(edges.select(b.alias("_a"), a.alias("_b"))).distinct()
    # Materialize the edge list once: the loop re-reads it every round, and
    # without this each iteration would recompute the (possibly expensive)
    # upstream pipeline that produced the edges — e.g. the full LSH+Jaccard
    # dedup when clustering near-dup pairs.
    sym = sym.transform(materialize_eager)

    # The iteration only ever moves labels along edges, so it runs over
    # edge ENDPOINTS only: an isolated node keeps its own id forever and
    # can neither influence nor be influenced by any other label. With a
    # corpus-sized ``nodes`` universe and a sparse edge set (the dedup
    # clustering regime: near-dup pairs touch a small fraction of docs)
    # this turns the three per-round joins from corpus-scaled into
    # endpoint-scaled; the isolated nodes (nodes ∖ endpoints — the
    # anti-join below) are appended as self-labeled rows after the loop.
    # The anti-join pins shuffle-hash with the endpoint side as build:
    # endpoints are corpus-scaled in general and ride the materialized
    # edge frame's copied estimate (the q235 broadcast-abort class).
    endpoints = sym.select(F.col("_a").alias(id_col)).distinct()
    universe = endpoints
    isolated = None
    if nodes is not None:
        isolated = nodes.select(F.col(id_col)).distinct().join(
            endpoints.hint("shuffle_hash"), id_col, "left_anti"
        )

    labels = universe.select(F.col(id_col), F.col(id_col).alias("component"))
    labels = labels.transform(materialize_eager)

    # Every join in the round is pinned shuffle-hash: edges and labels
    # are both corpus-scaled, and both are materialized frames whose
    # LogicalRDD COPIES the original plan's size estimate (r10 finding)
    # — an unhinted round let the planner statically broadcast the edge
    # table on one round and the full label-update subplan on another
    # (seen at sf0.001 by the interior-plan audit; the q235 x100 abort
    # class). SHJ builds per-partition tables on the narrow build side
    # and needs no stats to be right at any scale.
    for rnd in range(max_iter):
        # 1 shuffle: min label over direct neighbors. Round 1 collapses
        # algebraically — the initial labeling is component(v) = v, so
        # the min over neighbor LABELS is just the min neighbor id: one
        # aggregation over the (already _materialized_) edge list, no
        # label join (§2.4).
        if rnd == 0:
            neigh = sym.groupBy("_a").agg(F.min("_b").alias("_nmin"))
        else:
            neigh = (
                sym.join(
                    labels.select(F.col(id_col).alias("_b"), "component").hint(
                        "shuffle_hash"
                    ),
                    "_b",
                )
                .groupBy("_a")
                .agg(F.min("component").alias("_nmin"))
            )
        # the pre-round label rides along as _old so convergence needs no
        # extra join against the previous table
        stepped = (
            labels.join(
                neigh.withColumnRenamed("_a", id_col).hint("shuffle_hash"),
                id_col,
                "left",
            )
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
                ).hint("shuffle_hash"),
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
        jumped = jumped.transform(materialize)
        changed = jumped.filter(F.col("component") != F.col("_old")).count()
        labels = jumped.select(id_col, "component")
        if changed == 0:
            break
    if isolated is not None:
        labels = labels.unionByName(
            isolated.select(F.col(id_col), F.col(id_col).alias("component"))
        )
    return labels


def incremental_connected_components(
    old_labels: DataFrame,
    new_edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    new_nodes: DataFrame | None = None,
    id_col: str = "id",
    max_iter: int = 50,
) -> DataFrame:
    """Update a connected-components labeling for a batch of NEW edges and
    nodes without re-running CC over the corpus.

    ``old_labels`` is a prior :func:`connected_components` result
    (``id_col``, ``component`` — component is the min reachable id, so
    every label is itself a member id). ``new_edges`` are undirected pairs
    whose endpoints may be old ids, new ids, or both; ``new_nodes``
    optionally supplies batch ids that appear in no edge so they get
    singleton components. New node ids must be disjoint from
    ``old_labels``' ids (the ingest path guarantees this — the fold-in
    appends delta-minus-base).

    The labeling is recomputed only for AFFECTED components — those
    containing an endpoint of a new edge. Each affected old component is
    contracted to its star (member ↔ leader edges, which preserve exactly
    its connectivity), the stars are unioned with the new edges, and the
    plain CC loop runs over that subgraph: O(batch + touched-component
    membership) work, with iteration count governed by how the new edges
    chain components together, not by corpus diameter. Unaffected rows of
    ``old_labels`` pass through untouched. Cost profile at scale: two
    broadcast-joined scans of ``old_labels`` (the touched-id semi-join and
    the affected-member filter — no corpus shuffle), plus the subgraph
    loop. Equivalent to full CC over (old edges ∪ new edges) — pinned by
    tests/test_graph_incremental.py against a ground-truth recompute.

    Sizing: ``touched`` and ``affected`` ride a broadcast, so this is the
    right tool for ingest-sized batches (up to millions of edges), not
    for a corpus-sized backfill — past the broadcast threshold a plain
    :func:`connected_components` recompute is both simpler and faster.

    Returns the complete new labeling (``id_col``, ``component``).
    """
    edges = new_edges.select(
        F.col(src).cast("long").alias("_a"), F.col(dst).cast("long").alias("_b")
    )
    touched = (
        edges.select(F.col("_a").alias(id_col))
        .union(edges.select(F.col("_b").alias(id_col)))
        .distinct()
        .transform(materialize_eager)
    )
    # components holding a touched OLD id; batch-sized, so broadcast both
    # plan legs — old_labels is scanned twice but never shuffled
    affected = (
        old_labels.join(F.broadcast(touched), id_col, "left_semi")
        .select("component")
        .distinct()
        .transform(materialize_eager)
    )
    members = old_labels.join(F.broadcast(affected), "component", "left_semi")
    stars = members.filter(F.col(id_col) != F.col("component")).select(
        F.col(id_col).alias("_a"), F.col("component").alias("_b")
    )
    universe = members.select(id_col).union(touched.select(id_col))
    if new_nodes is not None:
        universe = universe.union(new_nodes.select(F.col(id_col).cast("long")))
    sub_labels = connected_components(
        stars.union(edges),
        src="_a",
        dst="_b",
        nodes=universe.distinct(),
        id_col=id_col,
        max_iter=max_iter,
    )
    untouched = old_labels.join(F.broadcast(affected), "component", "left_anti")
    return untouched.select(id_col, "component").unionByName(sub_labels)


def component_sizes(components: DataFrame, id_col: str = "id") -> DataFrame:
    """(id, component) -> (id, component, cluster_size)."""
    sizes = components.groupBy("component").agg(F.count("*").alias("cluster_size"))
    return components.join(sizes, "component").select(id_col, "component", "cluster_size")


def triangle_stats(
    edges: DataFrame, src: str = "src", dst: str = "dst", canonical: bool = False
) -> DataFrame:
    """Global triangle census over an undirected edge list: one row
    ``(n_edges, n_wedges, n_triangles)``.

    Input may contain duplicates and either orientation; it is canonized
    to distinct unordered pairs first. Pass ``canonical=True`` when the
    input is ALREADY distinct with ``src < dst`` (the stored contract of
    ``write_copurchase_edges_bucketed``) to skip the canonize shuffle —
    the census then starts straight from storage with no Exchange before
    the degree aggregate. Triangles are counted by the
    **degree-oriented edge iterator** (Cohen 2009; Schank's forward
    algorithm — the scheme distributed triangle counters converge on):

    1. direct each edge from its (degree, id)-smaller endpoint, which
       bounds every out-degree by ~sqrt(2m) even on hub vertices;
    2. build the sorted out-adjacency array per vertex;
    3. for each oriented edge (s, t), count common out-neighbors with an
       IN-ROW ``array_intersect`` — each triangle is counted exactly once
       at its two lowest-ordered vertices.

    The wedge set (sum of C(deg, 2) — 147M for this corpus's 1.2M-edge
    co-purchase graph, i.e. 100x the edges) is never materialized; the
    heaviest intermediate is the adjacency table, one row per vertex
    with a sqrt(m)-bounded array. Any consistent total order counts each
    triangle exactly once, so the result matches an id-ordered oracle
    bit for bit.

    Shuffles: distinct canonize, degree agg, orientation join, adjacency
    agg, two adjacency joins. All equi-joins, all PINNED shuffle-hash
    with the degree/adjacency side as the build (r10; they were
    deliberately unhinted through r9): the degree and adjacency
    relations are corpus-scaled (one row per vertex), and their
    materialized frames carry COPIED plan estimates, not real sizes —
    the estimate class whose runtime broadcast abort killed q235 at x100
    (r9). A hinted SHJ needs no stats to be right at any scale, and it
    drops the sort-merge sorts the unhinted plan ran at test SF. The
    edge list, degree table, oriented list, and adjacency table each
    feed 2+ branches, so each is lazily materialize-d for the operator's
    scope (ContextCleaner releases the blocks when the result frame is
    dropped; adj materialized since r10 — it feeds both probe joins,
    which previously re-ran its aggregate through full lineage). The
    three scalars are 1-row aggregates combined by broadcast join — no
    driver-side action.
    """
    if canonical:
        # caller guarantees distinct src < dst rows (e.g. a bucketed edge
        # table): read them as-is — no canonize Exchange, no materialize
        # (storage already serves multiple branches cheaply)
        e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    else:
        e = (
            edges.select(
                F.least(F.col(src), F.col(dst)).alias("a"),
                F.greatest(F.col(src), F.col(dst)).alias("b"),
            )
            .filter(F.col("a") != F.col("b"))
            .distinct()
            .transform(materialize)
        )
    deg = (
        e.select(F.col("a").alias("v"))
        .unionAll(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("d"))
        .transform(materialize)
    )
    # sum(d) = 2|E|; d*(d-1) is even — both /2 divisions exact below 2^53
    scalars = deg.agg(
        F.coalesce((F.sum("d") / 2).cast("long"), F.lit(0)).alias("n_edges"),
        F.coalesce(
            (F.sum(F.col("d") * (F.col("d") - F.lit(1))) / 2).cast("long"), F.lit(0)
        ).alias("n_wedges"),
    )

    # degree-orient: direct each edge from its (d, v)-smaller endpoint
    da = deg.select(F.col("v").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("v").alias("b"), F.col("d").alias("db"))
    oriented = (
        e.join(da.hint("shuffle_hash"), "a")
        .join(db.hint("shuffle_hash"), "b")
        .select(
            F.when(
                (F.col("da") < F.col("db"))
                | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("s"), F.col("b").alias("t")),
            )
            .otherwise(F.struct(F.col("b").alias("s"), F.col("a").alias("t")))
            .alias("e")
        )
        .select("e.s", "e.t")
        .transform(materialize)
    )
    adj = (
        oriented.groupBy("s")
        .agg(F.array_sort(F.collect_list("t")).alias("nb"))
        .transform(materialize)
    )
    tri_row = (
        oriented.join(
            adj.select(F.col("s").alias("_as"), F.col("nb").alias("nb_s")).hint(
                "shuffle_hash"
            ),
            F.col("s") == F.col("_as"),
        )
        .join(
            adj.select(F.col("s").alias("_at"), F.col("nb").alias("nb_t")).hint(
                "shuffle_hash"
            ),
            F.col("t") == F.col("_at"),
        )
        .select(F.size(F.array_intersect("nb_s", "nb_t")).alias("c"))
        .agg(F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n_triangles"))
    )

    return scalars.join(F.broadcast(tri_row))


def pagerank_fixed(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    scale: int = 1 << 20,
    canonical: bool = False,
) -> DataFrame:
    """Fixed-point PageRank over an undirected edge list: ``iters`` exact
    integer power iterations with damping 0.85 expressed as the rational
    17/20 (Page et al. 1999; the integer form makes every iteration
    bit-reproducible on any engine — no float accumulation anywhere).

    Update rule (all integer):
        contrib(v) = floor(r(v) / deg(v))
        r'(v)     = floor(0.15 * scale) + floor(17 * sum_in(contrib) / 20)

    Ranks stay below n * scale, so 64-bit arithmetic never overflows for
    any corpus this engine targets. Per iteration: one broadcast-able
    join against the degree table and ONE shuffle (the neighbor-sum
    groupBy) over the symmetrized edge list — the same per-round cost
    every distributed PageRank (GraphX, Pregel) pays. The loop unrolls
    into a single plan (no driver actions, no convergence barrier —
    fixed iteration count is the deterministic contract).

    Pass ``canonical=True`` when ``edges`` is already a distinct a<b pair
    list (the co-purchase cache shape): the two union branches are then
    disjoint and self-loop-free by construction, so the symmetrize-side
    dedup shuffle is skipped entirely.

    Returns (v, rank_fixed) for every node.
    """
    a = F.col(src).alias("_a")
    b = F.col(dst).alias("_b")
    sym = edges.select(a, b).union(edges.select(b.alias("_a"), a.alias("_b")))
    if not canonical:
        sym = sym.filter(F.col("_a") != F.col("_b")).distinct()
    # partition by the contribution key once: every iteration's
    # edge x contrib join reuses this layout instead of re-shuffling the
    # (large) edge list per round. Lazy materialize, not persist():
    # it materializes on first action, every unrolled round reuses the
    # blocks, AND the blocks are released by the ContextCleaner when the
    # frame is dropped — a CacheManager .persist() here leaks one edge +
    # one degree cache per CALL with no owner to unpersist them.
    sym = sym.repartition("_a").transform(materialize)
    deg = (
        sym.groupBy(F.col("_a").alias("v"))
        .agg(F.count("*").alias("d"))
        .transform(materialize)
    )
    base = int(0.15 * scale)  # floor(0.15 * 2^20) = 157286

    ranks = deg.select("v", F.lit(scale).cast("long").alias("r"))
    # every loop join is pinned shuffle-hash: ranks/deg/contrib/sums are
    # all corpus-scaled (one row per node) and ride size estimates COPIED
    # from the materialized edge frame, compounding across the unrolled
    # rounds — an estimate that dips under the broadcast threshold at
    # some scale is the q235 x100 abort class (a runtime broadcast of a
    # per-node table). SHJ needs no stats, reuses sym's _a-hash layout
    # (only the contrib side exchanges), and drops the per-round sorts
    # the unhinted plan ran at test SF.
    for it in range(iters):
        # Round 1 collapses algebraically: every initial rank is the
        # constant ``scale``, so contrib = floor(scale / d) is a pure
        # projection of the degree table — no ranks × deg join (§2.4).
        if it == 0:
            contrib = deg.select(
                "v", F.floor(F.lit(scale) / F.col("d")).cast("long").alias("_c")
            )
        else:
            contrib = ranks.join(deg.hint("shuffle_hash"), "v").select(
                "v", F.floor(F.col("r") / F.col("d")).cast("long").alias("_c")
            )
        sums = (
            sym.join(contrib.hint("shuffle_hash"), F.col("_a") == F.col("v"))
            .groupBy(F.col("_b").alias("v"))
            .agg(F.sum("_c").alias("_s"))
        )
        ranks = deg.join(sums.hint("shuffle_hash"), "v", "left").select(
            "v",
            (
                F.lit(base)
                + F.floor(F.lit(17) * F.coalesce(F.col("_s"), F.lit(0)) / 20)
            )
            .cast("long")
            .alias("r"),
        )
    return ranks.select("v", F.col("r").alias("rank_fixed"))


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 2,
    canonical: bool = False,
) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007) with a fully
    deterministic update: each round every node adopts the most frequent
    label among its neighbours, ties broken by the SMALLEST label — the
    argmax is a (count desc, label asc) ``min_by`` over exact counts, so
    any engine reproduces the same communities bit-for-bit.

    A fixed round count is the contract (like ``pagerank_fixed``): no
    convergence barrier, the loop unrolls into one plan.  Per round: one
    shuffle to count (neighbour, label) votes and one ``min_by`` argmax
    reusing that grouping's partitioning — the Pregel per-superstep cost.
    The symmetrized edge list is partitioned by the vote-source key once
    and locally checkpointed, so every round's join reuses the layout and
    the blocks are released when the result frame is dropped.

    Pass ``canonical=True`` for a distinct a<b pair list (skips the
    symmetrize-side dedup shuffle).  Returns (v, label) for every node
    that has at least one edge.
    """
    a = F.col(src).alias("_a")
    b = F.col(dst).alias("_b")
    sym = edges.select(a, b).union(edges.select(b.alias("_a"), a.alias("_b")))
    if not canonical:
        sym = sym.filter(F.col("_a") != F.col("_b")).distinct()
    # lazy materialize, not persist(): same reuse across the unrolled
    # rounds, but released on GC instead of leaking one cache per call
    sym = sym.repartition("_a").transform(materialize)

    if rounds <= 0:
        return sym.select(F.col("_a").alias("v")).distinct().select(
            "v", F.col("v").alias("label")
        )
    # Round 1 collapses algebraically: the initial labeling is
    # label(v) = v, and ``sym`` is a DISTINCT symmetric edge list, so
    # every (node, neighbor-label) vote group holds exactly one row —
    # all counts are 1 and the (count desc, label asc) argmax is simply
    # the MINIMUM neighbor id. One narrow single-column aggregation
    # replaces the initial-label distinct, the vote join, and the two
    # grouping exchanges of a generic round (§2.4 — remove shuffles the
    # algebra already answers).
    labels = sym.groupBy(F.col("_b").alias("v")).agg(F.min("_a").alias("label"))
    # the vote join is pinned shuffle-hash: labels is corpus-scaled (one
    # row per node) over the materialized edge frame's copied estimate —
    # pin, don't trust a near-threshold estimate (the q235 doctrine; see
    # pagerank_fixed above). sym's _a-hash layout is reused, so only the
    # label side exchanges per round.
    for _ in range(rounds - 1):
        votes = (
            sym.join(labels.hint("shuffle_hash"), F.col("_a") == F.col("v"))
            .groupBy(F.col("_b").alias("v"), "label")
            .agg(F.count("*").alias("_n"))
        )
        # argmax by (count desc, label asc): pack into one orderable key —
        # min over (-count, label) lexicographic via min_by on a struct
        labels = votes.groupBy("v").agg(
            F.min_by("label", F.struct((-F.col("_n")).alias("k1"), F.col("label").alias("k2"))).alias(
                "label"
            )
        )
    return labels


def common_neighbor_candidates(
    edges: DataFrame,
    shard_mod: int = 50,
    shard_rem: int = 0,
    topk: int = 20,
) -> DataFrame:
    """Link prediction by common-neighbor counting (Liben-Nowell & Kleinberg
    CIKM'03): the highest-scoring NON-edges — pairs the graph does not
    connect but many shared neighbors vouch for — ranked for edge
    recommendation / graph completion.

    ``edges`` is a canonical distinct (src < dst) undirected pair list
    (the co-purchase cache shape).  Exhaustive wedge enumeration costs
    ``sum_c deg(c)^2`` — quadratic in density — so the operator computes
    the exact scores for ONE deterministic wedge-center shard
    (``center % shard_mod == shard_rem``): every wedge is owned by exactly
    one center vertex, making the full computation embarrassingly parallel
    across the ``shard_mod`` shards, each a run of this operator.  A
    production sweep unions the per-shard pair counts before ranking; the
    registered query demonstrates one shard end-to-end (scores are the
    exact common-neighbor counts *within the shard's centers* — the same
    estimator a sampled-centers Adamic/Adar pass uses).

    Scale shape: the wedge self-join fans out per shard center only
    (~deg^2 / shard_mod of the total), the pair groupBy partial-aggregates,
    the existing-edge anti-join runs on the (a, b) key, and the degree
    table joins AFTER the top-k cut — 2 x topk broadcast-sized rows, never
    a corpus-wide three-way join.

    Output: ``(id_a, id_b, common_neighbors, deg_a, deg_b)`` — all
    integers — the ``topk`` best candidates by
    ``(common_neighbors DESC, id_a, id_b)`` (total order: deterministic).
    """
    src, dst = F.col("src"), F.col("dst")
    sym = edges.select(src.alias("_a"), dst.alias("_b")).union(
        edges.select(dst.alias("_a"), src.alias("_b"))
    )
    # deg is probed twice (deg_a/deg_b below); both probes re-aggregate
    # from the (persisted) edge cache, which measures CHEAPER than a
    # materialize here — the checkpoint write is a serialized extra job
    # per invocation, while the re-aggregation pipelines into each probe.
    deg = sym.groupBy(F.col("_a").alias("v")).agg(F.count("*").alias("d"))
    nb = sym.filter(F.col("_a") % shard_mod == shard_rem)
    # The wedge self-join stays UNHINTED deliberately: nb rides the
    # PERSISTED edge cache, whose InMemoryRelation stats are measured
    # bytes, not a fanout-blind guess — a truth-backed estimate (the r10
    # classifier rule), so the planner broadcasts the shard slice only
    # while it genuinely fits and flips to a shuffle join as the corpus
    # grows. Pinning shuffle-hash here measured 2x SLOWER at sf0.1
    # (3.95 -> 7.64 s: two exchanges of nb plus a separate join stage,
    # versus a single broadcast stage that pipelines scan -> fanout ->
    # partial agg).
    pairs = (
        nb.select(F.col("_a").alias("_c"), F.col("_b").alias("id_a"))
        .join(nb.select(F.col("_a").alias("_c"), F.col("_b").alias("id_b")), "_c")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("common_neighbors"))
    )
    known = edges.select(src.alias("id_a"), dst.alias("id_b"))
    # the existing-edge anti-join is pinned shuffle-hash too (known is the
    # full corpus-scaled edge list); the pair groupBy above already hash-
    # partitioned the probe side by (id_a, id_b), so only `known`
    # exchanges here.
    top = (
        pairs.join(known.hint("shuffle_hash"), ["id_a", "id_b"], "left_anti")
        .orderBy(F.desc("common_neighbors"), "id_a", "id_b")
        .limit(topk)
    )
    # the top-k relation is <= topk rows BY CONSTRUCTION (a bound the
    # planner may lose through the join below) — broadcast it explicitly
    # (truth-backed, the q50/q233 doctrine) so the corpus-scaled degree
    # table is only probed, never built or shuffled.
    withdeg = deg.select(F.col("v").alias("id_a"), F.col("d").alias("deg_a")).join(
        F.broadcast(top), "id_a"
    )
    return (
        deg.select(F.col("v").alias("id_b"), F.col("d").alias("deg_b"))
        .join(F.broadcast(withdeg), "id_b")
        .select("id_a", "id_b", "common_neighbors", "deg_a", "deg_b")
        .orderBy(F.desc("common_neighbors"), "id_a", "id_b")
    )
