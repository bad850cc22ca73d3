"""Column-level expression helpers (pure Catalyst expressions; no UDFs)."""

from hadoop_jobanalyzer_spark.functions.counters import counter_value, parse_counters

__all__ = ["parse_counters", "counter_value"]
