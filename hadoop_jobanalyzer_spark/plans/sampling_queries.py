"""Corpus curation extensions q235-q238: exact containment dedup,
deterministic mixture interleave, per-source n-gram novelty, and
inter-filter agreement.

These extend the training-data-pipeline surface (no reference
counterpart — the reference is a job-history analyzer; these are the
LLM-corpus operations the brief adds as first-class components):

* q235 — the asymmetric companion of the exact Jaccard self-join
  (q123): directed near-containment pairs, the quotation/boilerplate/
  digest-inclusion duplicates Jaccard misses when sizes are skewed.
* q236 — a deterministic single-epoch proportional mixture schedule:
  every source's documents spread evenly across the epoch in a seeded
  order, the schedule a trainer's data loader replays identically on
  every host.
* q237 — marginal novelty per source: how many distinct n-grams each
  source adds given a fixed inclusion order — the measured answer to
  "what does this source buy us" during corpus composition.
* q238 — exact Cohen's kappa between the cheap quality filters:
  chance-corrected redundancy, the "do these two filters measure the
  same thing" readout before paying for both at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hadoop_jobanalyzer_spark.plans.tables import load_tables

# --- q235: exact directed containment pairs ----------------------------------

_CONT_NGRAM = 3
_CONT_T = (8, 10)


def q235_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT directed set-containment self-join at
    ``|A∩B|/|A| >= 0.8`` over word 3-shingles via the prefix-filter
    containment variant (operators/setsim.prefix_filter_containment_pairs).
    The oracle computes the naive exhaustive directed join; result-set
    equality is the containment prefix-filter losslessness theorem."""
    from hadoop_jobanalyzer_spark.operators.setsim import (
        prefix_filter_containment_pairs,
    )

    docs = load_tables(spark, sf_dir)["documents"]
    return prefix_filter_containment_pairs(
        docs, "doc_id", "text", ngram=_CONT_NGRAM, threshold=_CONT_T
    )


Q235_SQL = f"""
WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
       FROM words, UNNEST(generate_series(1, len(w) - 2)) AS t(i)),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id <> b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, n_common, sa.n AS n_a, sb.n AS n_b,
       ROUND(CAST(n_common AS DOUBLE) / CAST(sa.n AS DOUBLE), 3) AS containment
FROM common
JOIN sizes sa ON id_a = sa.doc_id
JOIN sizes sb ON id_b = sb.doc_id
WHERE {_CONT_T[1]} * n_common >= {_CONT_T[0]} * sa.n
ORDER BY id_a, id_b
"""


# --- q236: deterministic proportional mixture schedule -----------------------

_MIX_HEAD = 100


def q236_mixture_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first ``_MIX_HEAD`` positions of a deterministic single-epoch
    proportional mixture order: within each source, documents take a
    seeded shuffle rank r (md5 order — no RNG state, any worker
    recomputes it); the schedule key ``r / n_source`` spreads each
    source evenly over (0, 1], so every prefix of the epoch holds each
    source in proportion and all sources finish together.

    Keys are double divisions of int64s well under 2^53, identical under
    IEEE rounding on any engine; ties (equal-size sources produce equal
    keys) break deterministically by (source, rank).  The head is a
    TakeOrdered top-k — no global sort, no 1-partition window over the
    corpus; the rank window shuffles once on source.
    Output: (pos, source, doc_id), pos 1..HEAD."""
    docs = load_tables(spark, sf_dir)["documents"]
    per_src = Window.partitionBy("source").orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    ranked = docs.select(
        "source",
        "doc_id",
        F.row_number().over(per_src).alias("_r"),
        F.count("*").over(Window.partitionBy("source")).alias("_n"),
    )
    keyed = ranked.select(
        "source",
        "doc_id",
        (F.col("_r").cast("double") / F.col("_n").cast("double")).alias("_key"),
        "_r",
    )
    head = keyed.orderBy("_key", "source", "_r").limit(_MIX_HEAD)
    pos_w = Window.orderBy("_key", "source", "_r")  # over HEAD rows only
    return head.select(
        F.row_number().over(pos_w).alias("pos"), "source", "doc_id"
    ).orderBy("pos")


Q236_SQL = f"""
WITH ranked AS (
  SELECT source, doc_id,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS r,
         COUNT(*) OVER (PARTITION BY source) AS n
  FROM documents
),
keyed AS (
  SELECT source, doc_id,
         CAST(r AS DOUBLE) / CAST(n AS DOUBLE) AS key, r
  FROM ranked
)
SELECT ROW_NUMBER() OVER (ORDER BY key, source, r) AS pos, source, doc_id
FROM keyed
ORDER BY key, source, r
LIMIT {_MIX_HEAD}
"""


# --- q237: per-source marginal n-gram novelty --------------------------------


def q237_source_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marginal novelty under a fixed inclusion order (source name
    ascending): a distinct word-3-gram is credited to the FIRST source
    that contains it; each source then reports its distinct-gram count,
    how many it introduced, and the novelty rate — the diminishing-
    returns curve of corpus composition (a source whose grams all
    appeared earlier adds vocabulary nothing).

    Plan: one shingle explode -> distinct (source, gram) (the only
    corpus-sized shuffle, partial-aggregated; materialized once — it
    feeds both the per-source census and the first-source argmin), a
    min(source) per gram on that reduced domain, and two source-grain
    census joins (source-count rows, broadcast).
    Output: (source, n_grams, n_novel, novelty_pct), source ascending."""
    from hadoop_jobanalyzer_spark.functions.text import shingles, tokens
    from hadoop_jobanalyzer_spark.util import materialize, spread

    docs = spread(load_tables(spark, sf_dir)["documents"])
    sg = (
        docs.select(
            "source",
            F.explode(shingles(tokens(F.col("text")), 3)).alias("s"),
        )
        .distinct()
        .transform(materialize)
    )
    per_source = sg.groupBy("source").agg(F.count("*").alias("n_grams"))
    novel = (
        sg.groupBy("s")
        .agg(F.min("source").alias("source"))
        .groupBy("source")
        .agg(F.count("*").alias("n_novel"))
    )
    return (
        per_source.join(F.broadcast(novel), "source", "left")
        .select(
            "source",
            "n_grams",
            F.coalesce("n_novel", F.lit(0)).alias("n_novel"),
            F.round(
                100.0
                * F.coalesce("n_novel", F.lit(0)).cast("double")
                / F.col("n_grams").cast("double"),
                2,
            ).alias("novelty_pct"),
        )
        .orderBy("source")
    )


Q237_SQL = """
WITH words AS (SELECT source, string_split(text, ' ') AS w FROM documents),
sg AS (SELECT DISTINCT source, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
       FROM words, UNNEST(generate_series(1, len(w) - 2)) AS t(i)),
firsts AS (SELECT s, MIN(source) AS first_source FROM sg GROUP BY s),
per_source AS (SELECT source, COUNT(*) AS n_grams FROM sg GROUP BY source),
novel AS (SELECT first_source AS source, COUNT(*) AS n_novel FROM firsts GROUP BY 1)
SELECT p.source, p.n_grams, COALESCE(n.n_novel, 0) AS n_novel,
       ROUND(100.0 * COALESCE(n.n_novel, 0) / p.n_grams, 2) AS novelty_pct
FROM per_source p LEFT JOIN novel n ON p.source = n.source
ORDER BY p.source
"""


SAMPLING_QUERIES = {
    "q235_containment_pairs": (q235_containment_pairs, Q235_SQL),
    "q236_mixture_schedule": (q236_mixture_schedule, Q236_SQL),
    "q237_source_novelty": (q237_source_novelty, Q237_SQL),
}


# --- q238: inter-filter agreement (exact Cohen's kappa) ----------------------

_K_MIN_CHARS = 200  # same thresholds as the q205 ablation grid
_K_MIN_WORDS = 30
_BPE_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def q238_filter_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Cohen's kappa between the three cheap quality filters
    (q205's flags: min chars, min words, digit-heaviness) — chance-
    corrected agreement. Kappa near 1 means two filters are redundant
    (drop the dearer one); near 0 means they encode independent signals
    and compose.

    Exact integer core: with marginals a1/a0 and b1/b0 over N docs,
    ``kappa = (N*(n11+n00) - (a1*b1 + a0*b0)) / (N^2 - (a1*b1 + a0*b0))``
    — numerator and denominator are exact integers; products run in
    decimal(38,0) so N up to ~1e19 never overflows (the q98 idiom; the
    oracle's HUGEINT marginal products match). One codegen scan, ONE
    1-row aggregate, in-row kappa per pair, a 3-row unpivot.
    Output: (pair, n_docs, n_agree, kappa), pair ascending."""
    docs = load_tables(spark, sf_dir)["documents"]
    words = F.size(F.split("text", " ")).cast("long")
    digit_runs = F.size(F.regexp_extract_all("text", F.lit("[0-9]+"), 0)).cast("long")
    bpe = F.size(F.regexp_extract_all("text", F.lit(_BPE_RE), 0)).cast("long")
    flags = docs.select(
        (F.col("n_chars") >= _K_MIN_CHARS).cast("long").alias("fa"),
        (words >= _K_MIN_WORDS).cast("long").alias("fb"),
        (digit_runs * 5 <= bpe).cast("long").alias("fc"),
    )
    g = flags.agg(
        F.count("*").alias("n"),
        F.sum("fa").alias("a1"),
        F.sum("fb").alias("b1"),
        F.sum("fc").alias("c1"),
        F.sum((F.col("fa") == F.col("fb")).cast("long")).alias("ab"),
        F.sum((F.col("fa") == F.col("fc")).cast("long")).alias("ac"),
        F.sum((F.col("fb") == F.col("fc")).cast("long")).alias("bc"),
    )

    dec = "decimal(38,0)"

    def kappa(agree, x1, y1):
        n = F.col("n").cast(dec)
        chance = x1.cast(dec) * y1.cast(dec) + (F.col("n") - x1).cast(dec) * (
            F.col("n") - y1
        ).cast(dec)
        num = n * agree.cast(dec) - chance
        den = n * n - chance
        # a constant filter (all-true or all-false marginal) makes chance
        # == n^2 and kappa 0/0-undefined — report NULL, engine-portably,
        # instead of an engine-specific NaN/Inf
        return F.when(
            den != F.lit(0).cast(dec),
            F.round(num.cast("double") / den.cast("double"), 6),
        )

    pairs = g.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("len~words").alias("pair"),
                    F.col("n").alias("n_docs"),
                    F.col("ab").alias("n_agree"),
                    kappa(F.col("ab"), F.col("a1"), F.col("b1")).alias("kappa"),
                ),
                F.struct(
                    F.lit("len~clean").alias("pair"),
                    F.col("n").alias("n_docs"),
                    F.col("ac").alias("n_agree"),
                    kappa(F.col("ac"), F.col("a1"), F.col("c1")).alias("kappa"),
                ),
                F.struct(
                    F.lit("words~clean").alias("pair"),
                    F.col("n").alias("n_docs"),
                    F.col("bc").alias("n_agree"),
                    kappa(F.col("bc"), F.col("b1"), F.col("c1")).alias("kappa"),
                ),
            )
        ).alias("r")
    ).select("r.*").orderBy("pair")
    return pairs


Q238_SQL = f"""
WITH flags AS (
  SELECT CAST(n_chars >= {_K_MIN_CHARS} AS BIGINT) AS fa,
         CAST(len(string_split(text, ' ')) >= {_K_MIN_WORDS} AS BIGINT) AS fb,
         CAST(len(regexp_extract_all(text, '[0-9]+')) * 5
              <= len(regexp_extract_all(text, '{_BPE_RE}')) AS BIGINT) AS fc
  FROM documents
),
g AS (
  SELECT COUNT(*) AS n, SUM(fa) AS a1, SUM(fb) AS b1, SUM(fc) AS c1,
         SUM(CASE WHEN fa = fb THEN 1 ELSE 0 END) AS ab,
         SUM(CASE WHEN fa = fc THEN 1 ELSE 0 END) AS ac,
         SUM(CASE WHEN fb = fc THEN 1 ELSE 0 END) AS bc
  FROM flags
),
pairs AS (
  SELECT 'len~words' AS pair, n AS n_docs, ab AS n_agree,
         CASE WHEN n * n = a1 * b1 + (n - a1) * (n - b1) THEN NULL ELSE
           ROUND(CAST(n * ab - (a1 * b1 + (n - a1) * (n - b1)) AS DOUBLE)
                 / CAST(n * n - (a1 * b1 + (n - a1) * (n - b1)) AS DOUBLE), 6) END AS kappa
  FROM g
  UNION ALL
  SELECT 'len~clean', n, ac,
         CASE WHEN n * n = a1 * c1 + (n - a1) * (n - c1) THEN NULL ELSE
           ROUND(CAST(n * ac - (a1 * c1 + (n - a1) * (n - c1)) AS DOUBLE)
                 / CAST(n * n - (a1 * c1 + (n - a1) * (n - c1)) AS DOUBLE), 6) END
  FROM g
  UNION ALL
  SELECT 'words~clean', n, bc,
         CASE WHEN n * n = b1 * c1 + (n - b1) * (n - c1) THEN NULL ELSE
           ROUND(CAST(n * bc - (b1 * c1 + (n - b1) * (n - c1)) AS DOUBLE)
                 / CAST(n * n - (b1 * c1 + (n - b1) * (n - c1)) AS DOUBLE), 6) END
  FROM g
)
SELECT pair, CAST(n_docs AS BIGINT) AS n_docs, CAST(n_agree AS BIGINT) AS n_agree, kappa
FROM pairs ORDER BY pair
"""

SAMPLING_QUERIES["q238_filter_agreement"] = (q238_filter_agreement, Q238_SQL)


# --- q241: embedding quality audit -------------------------------------------


def q241_embedding_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding hygiene census before an index build or a
    training run: vector count, degenerate (zero-norm) vectors, vectors
    whose quantized form is an exact duplicate of another vector
    ANYWHERE in the table (collapsed embeddings — a broken encoder run
    or an upstream dedup miss), and the norm envelope.

    Everything is on the 1/1000 fixed-point lattice (the repo's
    engine-portable vector contract): norms are exact BIGINT
    sum-of-squares, duplicate detection groups on the quantized array
    itself (no float equality anywhere). One quantize pass, one
    array-keyed count aggregate, one join back, one label-grain census.
    Output: (label, n_vecs, n_zero_norm, n_dup_vectors,
    min_norm2, max_norm2), label ascending."""
    from hadoop_jobanalyzer_spark.functions.vectors import quantized
    from hadoop_jobanalyzer_spark.util import materialize

    emb = load_tables(spark, sf_dir)["embeddings"]
    q = emb.select(
        "label",
        "vec_id",
        quantized(F.col("embedding")).alias("qv"),
    ).transform(materialize)
    norm2 = F.aggregate(
        "qv", F.lit(0).cast("long"), lambda acc, x: acc + x * x
    ).alias("norm2")
    # pinned shuffle-hash: both sides are corpus-scaled (the planner
    # chose the full materialized vector table as the broadcast build
    # off its copied estimate — q235 class, r10 audit)
    counts = q.groupBy("qv").agg(F.count("*").alias("n_same"))
    return (
        q.join(counts.hint("shuffle_hash"), "qv")
        .select("label", norm2, (F.col("n_same") > 1).cast("long").alias("is_dup"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            F.sum((F.col("norm2") == 0).cast("long")).alias("n_zero_norm"),
            F.sum("is_dup").alias("n_dup_vectors"),
            F.min("norm2").alias("min_norm2"),
            F.max("norm2").alias("max_norm2"),
        )
        .orderBy("label")
    )


Q241_SQL = """
WITH q AS (
  SELECT label, vec_id,
         list_transform(embedding,
                        x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
  FROM embeddings
),
counts AS (SELECT qv, COUNT(*) AS n_same FROM q GROUP BY qv),
per AS (
  SELECT q.label,
         list_sum(list_transform(q.qv, x -> x * x)) AS norm2,
         CASE WHEN c.n_same > 1 THEN 1 ELSE 0 END AS is_dup
  FROM q JOIN counts c ON q.qv = c.qv
)
SELECT label,
       COUNT(*) AS n_vecs,
       CAST(SUM(CASE WHEN norm2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_norm,
       CAST(SUM(is_dup) AS BIGINT) AS n_dup_vectors,
       CAST(MIN(norm2) AS BIGINT) AS min_norm2,
       CAST(MAX(norm2) AS BIGINT) AS max_norm2
FROM per
GROUP BY label ORDER BY label
"""

SAMPLING_QUERIES["q241_embedding_audit"] = (q241_embedding_audit, Q241_SQL)
