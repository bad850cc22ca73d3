"""Embedding similarity search: brute-force top-k and LSH/IVF scale paths.

Brute-force is the correctness baseline (O(N) per query — fine for one
query vector, unusable for all-pairs). The scale paths bound the candidate
set first:

* random-hyperplane LSH: integer-quantized signatures (functions.vectors)
  bucket the corpus; a query only scans its bucket(s);
* IVF-style cell restriction: any coarse partition key (here the ``label``
  column stands in for a nearest-centroid assignment) prunes the scan —
  with parquet partitioned by cell, partition pruning makes this I/O-level.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from hadoop_jobanalyzer_spark.functions.vectors import (
    cosine,
    hyperplanes,
    lsh_signature,
    to_double,
)


def _query_vec(df: DataFrame, id_col: str, vec_col: str, query_id: int) -> DataFrame:
    return df.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("_qv")
    )


def knn_brute_force(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_id: int,
    k: int = 10,
    round_to: int = 4,
) -> DataFrame:
    """Top-k by cosine to the query embedding (excluded from results).

    The 1-row query side is broadcast — no shuffle; the scan stays
    partition-parallel. Ties on the rounded cosine break by id.
    """
    q = _query_vec(df, id_col, vec_col, query_id)
    cos = F.round(cosine(to_double(F.col(vec_col)), to_double(F.col("_qv"))), round_to)
    return (
        df.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != query_id)
        .select(F.col(id_col), cos.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), id_col)
        .limit(k)
    )


def lsh_buckets(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 7,
) -> DataFrame:
    """Corpus bucketed by hyperplane signature: (id, bucket)."""
    planes = hyperplanes(n_planes, dim, seed)
    return df.select(
        F.col(id_col), lsh_signature(F.col(vec_col), planes).alias("bucket")
    )


def knn_lsh(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_id: int,
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
    round_to: int = 4,
) -> DataFrame:
    """ANN: exact cosine ranking restricted to the query's LSH bucket."""
    buckets = lsh_buckets(df, id_col, vec_col, n_planes, dim)
    qb = buckets.filter(F.col(id_col) == query_id).select(
        F.col("bucket").alias("_qb")
    )
    candidates = (
        buckets.join(F.broadcast(qb), F.col("bucket") == F.col("_qb"))
        .select(id_col)
        .join(df, id_col)
    )
    return knn_brute_force(candidates, id_col, vec_col, query_id, k, round_to)


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.9,
    cell_col: str | None = None,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 7,
    round_to: int = 4,
    max_bucket: int | None = 1000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, candidate-bounded.

    Bucket the corpus (by ``cell_col`` — an IVF-style coarse assignment —
    or by hyperplane LSH when no cell column exists), generate candidate
    pairs *within* buckets (never corpus x corpus), then verify with exact
    cosine >= ``threshold``. Per-vector squared norms are computed once in
    the projection, so each candidate pair costs a single dot-product fold.
    ``max_bucket`` bounds the O(|bucket|^2) degenerate case (ON by
    default, 1000; ``None`` opts out).
    Output: id_a < id_b, cos_sim (rounded).
    """
    from hadoop_jobanalyzer_spark.functions.vectors import _fold_sum
    from hadoop_jobanalyzer_spark.util import pair_structs, spread

    df = spread(df)
    if cell_col is not None:
        keyed = df.select(F.col(id_col), F.col(cell_col).alias("bucket"))
    else:
        keyed = lsh_buckets(df, id_col, vec_col, n_planes, dim, seed)
    buckets = (
        keyed.groupBy("bucket")
        .agg(F.sort_array(F.collect_list(id_col)).alias("_ids"))
        .filter(F.size("_ids") > 1)
    )
    if max_bucket is not None:
        buckets = buckets.filter(F.size("_ids") <= max_bucket)
    pairs = buckets.select(F.explode(pair_structs(F.col("_ids"))).alias("p")).select(
        F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b")
    )
    v = to_double(F.col(vec_col))
    sides = df.select(
        F.col(id_col).alias("_id"), v.alias("_v"), _fold_sum(F.transform(v, lambda x: x * x)).alias("_n2")
    )
    va = sides.select(F.col("_id").alias("id_a"), F.col("_v").alias("_va"), F.col("_n2").alias("_na"))
    vb = sides.select(F.col("_id").alias("id_b"), F.col("_v").alias("_vb"), F.col("_n2").alias("_nb"))
    # same float ops as cosine(): dot / sqrt(na * nb) — norms precomputed
    cos = F.round(
        _fold_sum(F.zip_with(F.col("_va"), F.col("_vb"), lambda x, y: x * y))
        / F.sqrt(F.col("_na") * F.col("_nb")),
        round_to,
    )
    return (
        pairs.join(va, "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b", cos.alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
        .orderBy("id_a", "id_b")
    )


def knn_ivf_cell(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    cell_col: str,
    query_id: int,
    k: int = 5,
    round_to: int = 4,
) -> DataFrame:
    """IVF-lite: search only the query's coarse cell (partition-prunable)."""
    qcell = df.filter(F.col(id_col) == query_id).select(
        F.col(cell_col).alias("_qc")
    )
    cell = df.join(F.broadcast(qcell), F.col(cell_col) == F.col("_qc")).drop("_qc")
    return knn_brute_force(cell, id_col, vec_col, query_id, k, round_to)


def knn_lsh_multiprobe(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_id: int,
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
    round_to: int = 4,
) -> DataFrame:
    """Multi-probe ANN: exact cosine ranking over the query's LSH bucket
    plus every bucket within Hamming distance 1 of it.

    Single-bucket LSH misses neighbors whose signature differs by one
    near-zero hyperplane projection; probing the n_planes adjacent buckets
    recovers most of that recall for (n_planes+1)/2^n_planes of the corpus
    scanned. The probe set is n_planes+1 rows — broadcast to an equi-join
    on bucket id, so the corpus is still scanned once and shuffled never.
    The vector pull-back join is pinned shuffle-hash with the candidate
    id list as the build: candidates are a FIXED FRACTION of the corpus
    ((n_planes+1)/2^n_planes), riding a filter estimate — at scale an
    unhinted broadcast of that list is the q235 abort class (r10 audit).
    """
    buckets = lsh_buckets(df, id_col, vec_col, n_planes, dim)
    qb = buckets.filter(F.col(id_col) == query_id).select(F.col("bucket").alias("_qb"))
    masks = F.array(F.lit(0), *[F.lit(2**i) for i in range(n_planes)])
    probes = qb.select(
        F.explode(masks).alias("_mask"), "_qb"
    ).select(F.col("_qb").bitwiseXOR(F.col("_mask")).alias("_pb"))
    candidates = (
        buckets.join(F.broadcast(probes), F.col("bucket") == F.col("_pb"))
        .select(id_col)
        .hint("shuffle_hash")
        .join(df, id_col)
    )
    return knn_brute_force(candidates, id_col, vec_col, query_id, k, round_to)


def assign_cells(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_cells: int = 16,
    round_to: int = 6,
) -> DataFrame:
    """IVF coarse quantizer: (id, cell) = nearest centroid by cosine.

    Centroids are the ``n_cells`` lowest-id vectors — deterministic and
    engine-reproducible (a production pipeline would k-means or sample
    them offline; the *assignment pass* is identical either way: broadcast
    centroids x one corpus scan, no shuffle of the corpus). Ties on the
    rounded cosine break toward the lowest centroid id.
    """
    from pyspark.sql.window import Window

    cents = (
        df.orderBy(id_col)
        .limit(n_cells)
        .select(F.col(id_col).alias("_cid"), to_double(F.col(vec_col)).alias("_cv"))
    )
    cos = F.round(cosine(to_double(F.col(vec_col)), F.col("_cv")), round_to)
    w = Window.partitionBy(id_col).orderBy(F.desc("_cos"), "_cid")
    return (
        df.select(id_col, vec_col)
        .crossJoin(F.broadcast(cents))
        .select(F.col(id_col), F.col("_cid"), cos.alias("_cos"))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(F.col(id_col), F.col("_cid").alias("cell"))
    )


def knn_ivf_assigned(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_id: int,
    k: int = 5,
    n_cells: int = 16,
    round_to: int = 4,
) -> DataFrame:
    """IVF ANN with a *computed* coarse quantizer: assign every vector to
    its nearest-centroid cell (:func:`assign_cells`), then search only the
    query's cell. With the assignment persisted and the corpus partitioned
    by cell, the cell restriction is partition pruning at the scan."""
    cells = assign_cells(df, id_col, vec_col, n_cells)
    assigned = df.join(cells, id_col)
    return knn_ivf_cell(assigned, id_col, vec_col, "cell", query_id, k, round_to)
