"""Curation/publication-gate queries q230+: the audits a pipeline runs
before RELEASING a dataset — privacy (k-anonymity over quasi-identifiers)
and the semantic-dedup decision manifest (the keep/drop layer over the
embedding near-dup pairs, the way q204 is the decision layer over the
MinHash pairs).

Same contract as every other plan module: (DataFrame builder, DuckDB
oracle SQL) pairs, exact integer accumulation, one float division at most
at the end, deterministic ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_jobanalyzer_spark.plans.tables import load_tables


# --- q230: k-anonymity census over event quasi-identifiers -------------------


def q230_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit before publishing the events table: rows are
    grouped by the quasi-identifier triple (event_type, hour-of-day,
    value band) a re-identification attack could join on, and each event
    type reports its smallest group size (min_k — the table's k for that
    type), group count, and how many rows sit in groups below k=5.

    Value bands are exact-integer (cents // 5000, i.e. 50-currency-unit
    bands) — the repo's standard float-free banding, so Spark and the
    oracle band identically. Two shuffles: QI groupBy (partial-agg,
    scales with distinct QI count, bounded by type x 24 x bands), then a
    tiny per-type rollup. No windows, no joins — safe at any scale."""
    ev = load_tables(spark, sf_dir)["events"]
    band = F.floor(
        F.round(F.col("value") * 100).cast("long") / F.lit(5000)
    ).cast("long")
    groups = (
        ev.select(
            "event_type",
            F.hour("ts").alias("hod"),
            band.alias("value_band"),
        )
        .groupBy("event_type", "hod", "value_band")
        .agg(F.count("*").alias("k"))
    )
    return (
        groups.groupBy("event_type")
        .agg(
            F.count("*").alias("n_groups"),
            F.min("k").alias("min_k"),
            F.sum("k").alias("n_rows"),
            F.sum(F.when(F.col("k") < 5, F.col("k")).otherwise(0)).alias(
                "rows_at_risk"
            ),
        )
        .orderBy("event_type")
    )


Q230_SQL = """
WITH groups AS (
  SELECT event_type, hour(ts) AS hod,
         CAST(FLOOR(CAST(ROUND(value * 100) AS BIGINT) / 5000) AS BIGINT)
           AS value_band,
         COUNT(*) AS k
  FROM events
  GROUP BY 1, 2, 3
)
SELECT event_type,
       COUNT(*) AS n_groups,
       MIN(k) AS min_k,
       SUM(k) AS n_rows,
       SUM(CASE WHEN k < 5 THEN k ELSE 0 END) AS rows_at_risk
FROM groups
GROUP BY event_type
ORDER BY event_type
"""


# --- q231: semantic-dedup decision manifest ----------------------------------


def q231_semdedup_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style retention manifest: within each coarse cell (the
    ``label`` IVF assignment), vectors with an exact-cosine >= 0.4 pair
    to a smaller vec_id are DROPPED (min-id leader keeps, the same
    convention as the corpus dedup clusters); per cell, report size,
    drops, and keeps.

    Decision layer over the q32 pair relation: candidates are generated
    within cells only (never corpus x corpus) with the standard
    max_bucket=1000 giant-cell guard — over-cap cells are deferred to
    the banded path and excluded here, mirrored exactly in the oracle.
    """
    from hadoop_jobanalyzer_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    emb = load_tables(spark, sf_dir)["embeddings"]
    pairs = embedding_near_dup_pairs(
        emb, "vec_id", "embedding", threshold=0.4, cell_col="label"
    )
    dropped = (
        pairs.select(F.col("id_b").alias("vec_id"))
        .distinct()
        .join(emb.select("vec_id", "label"), "vec_id")
        .groupBy("label")
        .agg(F.count("*").alias("n_dropped"))
    )
    cells = (
        emb.groupBy("label")
        .agg(F.count("*").alias("n_vecs"))
        .filter(F.col("n_vecs") <= 1000)
    )
    return (
        cells.join(dropped, "label", "left")
        .select(
            "label",
            "n_vecs",
            F.coalesce("n_dropped", F.lit(0)).alias("n_dropped"),
            (F.col("n_vecs") - F.coalesce("n_dropped", F.lit(0))).alias("n_kept"),
        )
        .orderBy("label")
    )


Q231_SQL = """
WITH b AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
-- mirror the operator's default max_bucket=1000 giant-cell guard
keep AS (SELECT label FROM b GROUP BY label HAVING COUNT(*) <= 1000),
p AS (
  SELECT a.label AS label, c.vec_id AS id_b,
         ROUND(list_sum(list_transform(list_zip(a.v, c.v), x -> x[1] * x[2]))
               / sqrt(list_sum(list_transform(a.v, x -> x * x))
                      * list_sum(list_transform(c.v, x -> x * x))), 4) AS cos_sim
  FROM b a JOIN keep k ON a.label = k.label
  JOIN b c ON a.label = c.label AND a.vec_id < c.vec_id
),
drops AS (
  SELECT label, COUNT(DISTINCT id_b) AS n_dropped
  FROM p WHERE cos_sim >= 0.4 GROUP BY label
),
cells AS (
  SELECT b.label, COUNT(*) AS n_vecs
  FROM b JOIN keep k ON b.label = k.label
  GROUP BY b.label
)
SELECT cells.label, n_vecs,
       COALESCE(n_dropped, 0) AS n_dropped,
       n_vecs - COALESCE(n_dropped, 0) AS n_kept
FROM cells LEFT JOIN drops ON cells.label = drops.label
ORDER BY cells.label
"""


CURATION_QUERIES = {
    "q230_k_anonymity": (q230_k_anonymity, Q230_SQL),
    "q231_semdedup_manifest": (q231_semdedup_manifest, Q231_SQL),
}
