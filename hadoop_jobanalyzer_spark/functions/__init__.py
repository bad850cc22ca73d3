"""Column-level expression helpers (pure Catalyst expressions; no UDFs)."""

from hadoop_jobanalyzer_spark.functions.counters import counter_value, parse_counters
from hadoop_jobanalyzer_spark.functions.text import (
    avg_token_len,
    bow_fingerprint,
    distinct_token_count,
    lang_id,
    shingles,
    simhash32,
    simhash_table,
    stopword_ratio,
    token_count,
    tokens,
    winnow_fingerprints,
)
from hadoop_jobanalyzer_spark.functions.vectors import (
    cosine,
    dot,
    hyperplanes,
    lsh_signature,
    norm2,
    quantized,
)

__all__ = [
    "avg_token_len",
    "bow_fingerprint",
    "cosine",
    "counter_value",
    "distinct_token_count",
    "dot",
    "hyperplanes",
    "lang_id",
    "lsh_signature",
    "norm2",
    "parse_counters",
    "quantized",
    "shingles",
    "simhash32",
    "simhash_table",
    "stopword_ratio",
    "token_count",
    "tokens",
    "winnow_fingerprints",
]
