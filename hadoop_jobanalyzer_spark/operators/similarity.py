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
