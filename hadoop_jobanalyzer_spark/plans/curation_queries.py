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


# --- q232: importance-weighted data selection (DSIR-style) -------------------


_TARGET_SOURCES = ("src0", "src1", "src2", "src3")


def q232_importance_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance-weighted data selection readout, the DSIR idea (Xie et
    al., "Data Selection for Language Models via Importance Resampling",
    2023) in the repo's exact-integer form: designate a TARGET slice of
    the corpus (sources src0–src3, the stand-in for "looks like the eval
    distribution"), estimate per-token target vs. rest unigram
    distributions, and score every source by the fraction of its token
    mass on words where p_target(w) > p_rest(w). High-affinity sources
    are what importance resampling would upsample.

    Exactness: the p_target > p_rest comparison is cross-multiplied in
    DECIMAL(19,0) — ct·S_tot > cs·T_tot — so both engines decide every
    word identically with no float in the loop (bigint would overflow the
    cross-product at ~1e13 corpus tokens; decimal carries 38 digits). One
    float division at the end, rounded.

    Plan shape: one tokenize/explode pass into a (source, word) count
    (the only corpus-sized shuffle), word stats derived FROM that table
    (small second shuffle on word), totals as a 1-row broadcast
    (allow-listed BNLJ), final per-source rollup. No per-document pass at
    all — the affinity rollup works on (source, word) grain, which is
    bounded by vocab × sources.
    """
    from hadoop_jobanalyzer_spark.functions.text import tokens
    from hadoop_jobanalyzer_spark.util import materialize

    docs = load_tables(spark, sf_dir)["documents"]
    # the (source, word) count is the ONE corpus-sized pass; three plan
    # branches consume it (word stats, totals, the affinity join), so
    # materialize it once — without this the tokenize/explode/shuffle
    # subtree runs per branch (the q66-class recompute trap)
    sw = (
        docs.select("source", F.explode(tokens("text")).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count("*").alias("cnt"))
        .transform(materialize)
    )
    is_t = F.col("source").isin(*_TARGET_SOURCES)
    wstats = sw.groupBy("tok").agg(
        F.sum(F.when(is_t, F.col("cnt")).otherwise(0)).cast("long").alias("ct"),
        F.sum(F.when(~is_t, F.col("cnt")).otherwise(0)).cast("long").alias("cs"),
    ).transform(materialize)
    totals = wstats.agg(
        F.sum("ct").cast("decimal(19,0)").alias("t_tot"),
        F.sum("cs").cast("decimal(19,0)").alias("s_tot"),
    )
    aff = (
        # wstats is vocabulary-scaled with a fanout-blind copied estimate
        # — pinned shuffle-hash (q235 class, r10 audit)
        sw.join(wstats.hint("shuffle_hash"), "tok")
        .crossJoin(F.broadcast(totals))
        .select(
            "source",
            "cnt",
            (
                F.col("ct").cast("decimal(19,0)") * F.col("s_tot")
                > F.col("cs").cast("decimal(19,0)") * F.col("t_tot")
            ).alias("affine"),
        )
    )
    sel = aff.groupBy("source").agg(
        F.sum(F.when(F.col("affine"), F.col("cnt")).otherwise(0))
        .cast("long")
        .alias("affine_tokens"),
        F.sum("cnt").cast("long").alias("total_tokens"),
    )
    nd = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    return (
        nd.join(sel, "source")
        .select(
            "source",
            "n_docs",
            "affine_tokens",
            "total_tokens",
            F.round(
                F.col("affine_tokens") / F.col("total_tokens"), 4
            ).alias("affinity"),
        )
        .orderBy("source")
    )


Q232_SQL = """
WITH sw AS (
  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM (SELECT source, UNNEST(string_split(text, ' ')) AS tok FROM documents)
  GROUP BY source, tok
),
wstats AS (
  SELECT tok,
         CAST(SUM(CASE WHEN source IN ('src0','src1','src2','src3')
                       THEN cnt ELSE 0 END) AS BIGINT) AS ct,
         CAST(SUM(CASE WHEN source IN ('src0','src1','src2','src3')
                       THEN 0 ELSE cnt END) AS BIGINT) AS cs
  FROM sw GROUP BY tok
),
tot AS (
  SELECT CAST(SUM(ct) AS DECIMAL(19,0)) AS t_tot,
         CAST(SUM(cs) AS DECIMAL(19,0)) AS s_tot
  FROM wstats
),
aff AS (
  SELECT sw.source, sw.cnt,
         (CAST(w.ct AS DECIMAL(19,0)) * tot.s_tot
          > CAST(w.cs AS DECIMAL(19,0)) * tot.t_tot) AS affine
  FROM sw JOIN wstats w USING (tok) CROSS JOIN tot
),
sel AS (
  SELECT source,
         CAST(SUM(CASE WHEN affine THEN cnt ELSE 0 END) AS BIGINT)
           AS affine_tokens,
         CAST(SUM(cnt) AS BIGINT) AS total_tokens
  FROM aff GROUP BY source
),
nd AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY source)
SELECT nd.source, n_docs, affine_tokens, total_tokens,
       ROUND(affine_tokens / CAST(total_tokens AS DOUBLE), 4) AS affinity
FROM nd JOIN sel ON nd.source = sel.source
ORDER BY nd.source
"""


CURATION_QUERIES = {
    "q230_k_anonymity": (q230_k_anonymity, Q230_SQL),
    "q231_semdedup_manifest": (q231_semdedup_manifest, Q231_SQL),
    "q232_importance_selection": (q232_importance_selection, Q232_SQL),
}
