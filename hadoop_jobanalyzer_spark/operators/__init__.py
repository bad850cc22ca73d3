"""Semantic views & report operators over the typed history views."""

from hadoop_jobanalyzer_spark.operators.dedup import (
    boilerplate_ngram_fraction,
    exact_duplicates,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_near_dup_pairs,
)
from hadoop_jobanalyzer_spark.operators.history_reports import (
    error_summary,
    fleet_summary,
    job_summary,
    map_table,
    reduce_bytes_table,
    reduce_table,
    wasted_attempts,
    wasted_summary,
)
from hadoop_jobanalyzer_spark.operators.similarity import (
    embedding_near_dup_pairs,
    knn_brute_force,
    knn_ivf_cell,
    knn_lsh,
    lsh_buckets,
)
from hadoop_jobanalyzer_spark.operators.retrieval import bm25_topk
from hadoop_jobanalyzer_spark.operators.timeline import timeline
from hadoop_jobanalyzer_spark.operators.zorder import cluster_by_zorder, zorder_key

__all__ = [
    "bm25_topk",
    "boilerplate_ngram_fraction",
    "cluster_by_zorder",
    "embedding_near_dup_pairs",
    "error_summary",
    "exact_duplicates",
    "fleet_summary",
    "job_summary",
    "knn_brute_force",
    "knn_ivf_cell",
    "knn_lsh",
    "lsh_buckets",
    "lsh_candidate_pairs",
    "map_table",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "reduce_bytes_table",
    "reduce_table",
    "simhash_near_dup_pairs",
    "timeline",
    "zorder_key",
    "wasted_attempts",
    "wasted_summary",
]
