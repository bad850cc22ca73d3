"""Semantic views & report operators over the typed history views."""

from hadoop_jobanalyzer_spark.operators.dedup import (
    exact_duplicates,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
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
from hadoop_jobanalyzer_spark.operators.timeline import timeline

__all__ = [
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
    "timeline",
    "wasted_attempts",
    "wasted_summary",
]
