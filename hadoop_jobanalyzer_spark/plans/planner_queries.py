"""Pipeline-planning queries q216+: the meta-level reports a corpus team
runs BEFORE committing to an expensive configuration — LSH banding
selection from measured bucket volumes, small-file compaction planning,
leakage-proof group k-fold splits, and template (header/footer)
boilerplate detection.

Same contract as the other plan modules: (DataFrame builder, DuckDB
oracle SQL) pairs, integer-exact accumulation, deterministic ordering,
engine-portable md5 hashing only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hadoop_jobanalyzer_spark.functions.text import tokens
from hadoop_jobanalyzer_spark.operators.dedup import (
    MINHASH_P,
    _minhash_params,
    minhash_signatures,
)
from hadoop_jobanalyzer_spark.plans.pipeline_queries import near_dup_ctes
from hadoop_jobanalyzer_spark.plans.tables import load_tables
from hadoop_jobanalyzer_spark.util import materialize

# --- q216: LSH banding planner ------------------------------------------------

# One 24-hash MinHash family, every (bands x rows) factorization of it.
_Q216_N_HASHES = 24
_Q216_BANDINGS = [(2, 12), (3, 8), (4, 6), (6, 4), (8, 3), (12, 2)]


def q216_lsh_banding_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-driven LSH banding selection: for every (bands, rows)
    factorization of one 24-hash MinHash family, measure the bucket
    profile the banding would actually produce on THIS corpus — bucket
    count, multi-doc bucket count, largest bucket, and the pair-generation
    workload sum_buckets C(sz, 2) (the exact number of candidate-pair
    slots the verify stage would have to shuffle).

    This is the planning step run before q23/q34: theory gives the
    S-curve, but candidate VOLUME (the cost side) is data-dependent —
    skewed corpora blow up low-rows bandings.  Signatures are computed
    once; all six bandings explode from the same signature row (35
    structs/doc, in-row), so the whole grid costs one signature pass +
    one (bands, band, key) shuffle of counts — no pair is ever
    materialized.  Scales: workload is computed from bucket SIZES, which
    is why this planner is runnable at 100 TB while the q23 pair dump is
    not.
    """
    docs = load_tables(spark, sf_dir)["documents"]
    sigs = minhash_signatures(
        docs, "doc_id", "text", n_hashes=_Q216_N_HASHES, ngram=3
    ).na.drop()
    structs = [
        F.struct(
            F.lit(bands).alias("n_bands"),
            F.lit(b).alias("band"),
            F.concat_ws(
                "|", *[F.col(f"mh{b * rows + r}") for r in range(rows)]
            ).alias("bh"),
        )
        for bands, rows in _Q216_BANDINGS
        for b in range(bands)
    ]
    buckets = (
        sigs.select(F.explode(F.array(*structs)).alias("k"))
        .groupBy("k.n_bands", "k.band", "k.bh")
        .agg(F.count("*").alias("sz"))
    )
    return (
        buckets.groupBy("n_bands")
        .agg(
            F.count("*").alias("n_buckets"),
            F.sum((F.col("sz") > 1).cast("long")).alias("n_buckets_multi"),
            F.max("sz").alias("max_bucket"),
            # integral div end-to-end (mirrors the oracle's //): a float
            # /2 then cast would misround for giant buckets
            F.sum(
                F.call_function("div", F.col("sz") * (F.col("sz") - 1), F.lit(2).cast("long"))
            ).alias("pair_slots"),
        )
        .select(
            "n_bands",
            F.call_function(
                "div", F.lit(_Q216_N_HASHES).cast("long"), F.col("n_bands").cast("long")
            ).alias("n_rows"),
            "n_buckets",
            "n_buckets_multi",
            "max_bucket",
            "pair_slots",
        )
        .orderBy("n_bands")
    )


def _q216_sql() -> str:
    mins = ", ".join(
        f"MIN(({a} * h + {b}) % {MINHASH_P}) AS mh{i}"
        for i, (a, b) in enumerate(_minhash_params(_Q216_N_HASHES))
    )
    banded = " UNION ALL ".join(
        "SELECT {bands} AS n_bands, {b} AS band, {concat} AS bh FROM m".format(
            bands=bands,
            b=b,
            concat=" || '|' || ".join(f"mh{b * rows + r}" for r in range(rows)),
        )
        for bands, rows in _Q216_BANDINGS
        for b in range(bands)
    )
    return f"""
WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
       FROM words, UNNEST(generate_series(1, len(w) - 2)) AS t(i)),
hashed AS (SELECT doc_id,
                  ('0x' || substr(md5(s), 1, 8))::BIGINT % {MINHASH_P} AS h
           FROM sh),
m AS (SELECT doc_id, {mins} FROM hashed GROUP BY doc_id),
banded AS ({banded}),
b AS (SELECT n_bands, band, bh, COUNT(*) AS sz FROM banded GROUP BY 1, 2, 3)
SELECT n_bands,
       {_Q216_N_HASHES} // n_bands AS n_rows,
       COUNT(*) AS n_buckets,
       SUM(CASE WHEN sz > 1 THEN 1 ELSE 0 END) AS n_buckets_multi,
       MAX(sz) AS max_bucket,
       -- integer // throughout: CAST(double AS BIGINT) ROUNDS in DuckDB but
       -- TRUNCATES in Spark, and a float SUM misrounds for huge buckets;
       -- the outer CAST only narrows the SUM-widened HUGEINT
       CAST(SUM(sz * (sz - 1) // 2) AS BIGINT) AS pair_slots
FROM b
GROUP BY n_bands
ORDER BY n_bands
"""


# --- q217: small-file compaction plan -----------------------------------------

_Q217_DOCS_PER_FILE = 20  # synthesize a file manifest from doc_id ranges
_Q217_TARGET_BYTES = 1024  # compaction group target


def q217_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lakehouse small-file compaction planner: bin-pack each source's
    files (in file order) into rewrite groups of ~``_Q217_TARGET_BYTES``.

    The file manifest is synthesized from the documents table (every
    ``_Q217_DOCS_PER_FILE`` doc_ids per source = one file, size = text
    bytes); a real deployment feeds the parquet footer manifest in.  The
    plan uses the streaming bin-pack rule — group g owns the files whose
    preceding cumulative bytes land in target*[g, g+1) — one window pass,
    no iteration, deterministic.  Scales: the window runs over the FILE
    manifest (metadata grain, ~1 row per 100 MB of data), partitioned by
    source, never over the data itself.
    Output per (source, grp): file span, file count, group bytes.
    """
    docs = load_tables(spark, sf_dir)["documents"]
    files = (
        docs.groupBy(
            "source",
            (F.col("doc_id") - F.col("doc_id") % _Q217_DOCS_PER_FILE).alias(
                "file_id"
            ),
        )
        .agg(F.count("*").alias("n_docs"), F.sum(F.length("text")).alias("bytes"))
    )
    w = (
        Window.partitionBy("source")
        .orderBy("file_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    planned = files.withColumn(
        "grp",
        F.floor(
            F.coalesce(F.sum("bytes").over(w), F.lit(0)) / _Q217_TARGET_BYTES
        ),
    )
    return (
        planned.groupBy("source", "grp")
        .agg(
            F.min("file_id").alias("first_file"),
            F.max("file_id").alias("last_file"),
            F.count("*").alias("n_files"),
            F.sum("bytes").alias("group_bytes"),
        )
        .orderBy("source", "grp")
    )


Q217_SQL = f"""
WITH files AS (
  SELECT source,
         doc_id - doc_id % {_Q217_DOCS_PER_FILE} AS file_id,
         COUNT(*) AS n_docs, SUM(LEN(text)) AS bytes
  FROM documents GROUP BY 1, 2
),
planned AS (
  SELECT *,
         CAST(FLOOR(COALESCE(SUM(bytes) OVER (
             PARTITION BY source ORDER BY file_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) / {_Q217_TARGET_BYTES}) AS BIGINT) AS grp
  FROM files
)
SELECT source, grp, MIN(file_id) AS first_file, MAX(file_id) AS last_file,
       COUNT(*) AS n_files, SUM(bytes) AS group_bytes
FROM planned
GROUP BY source, grp
ORDER BY source, grp
"""


# --- q218: leakage-proof group k-fold -----------------------------------------

_Q218_K = 5
_Q218_PREFIX = 8  # docs sharing this token prefix are one leakage group


def q218_group_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-aware k-fold assignment (the GroupKFold discipline): docs
    that share an ``_Q218_PREFIX``-token prefix — template/near-dup
    suspects — are ONE group, and the whole group lands in one fold, so
    no near-duplicate ever straddles a train/eval boundary.

    Fold = md5(group fingerprint) mod k: deterministic, append-stable
    (new docs never move old groups), engine-portable.  One in-row
    fingerprint pass + one fold aggregate; the group-distinct count is a
    2-phase partial aggregate.  Output per fold: group/doc/token counts.
    """
    docs = load_tables(spark, sf_dir)["documents"]
    w = tokens("text")
    grp = F.md5(F.concat_ws(" ", F.slice(w, 1, _Q218_PREFIX)))
    tagged = docs.select(
        grp.alias("grp"),
        F.size(w).alias("toks"),
    ).withColumn(
        "fold",
        F.conv(F.substring(F.md5(F.col("grp")), 1, 8), 16, 10).cast("long")
        % _Q218_K,
    )
    return (
        tagged.groupBy("fold")
        .agg(
            F.countDistinct("grp").alias("n_groups"),
            F.count("*").alias("n_docs"),
            F.sum("toks").alias("n_tokens"),
        )
        .orderBy("fold")
    )


Q218_SQL = f"""
WITH tagged AS (
  SELECT md5(array_to_string(string_split(text, ' ')[1:{_Q218_PREFIX}], ' ')) AS grp,
         LEN(string_split(text, ' ')) AS toks
  FROM documents
),
folded AS (
  SELECT grp, toks,
         ('0x' || substr(md5(grp), 1, 8))::BIGINT % {_Q218_K} AS fold
  FROM tagged
)
SELECT fold, COUNT(DISTINCT grp) AS n_groups, COUNT(*) AS n_docs,
       SUM(toks) AS n_tokens
FROM folded
GROUP BY fold
ORDER BY fold
"""


# --- q219: header/footer boilerplate census -----------------------------------

_Q219_MIN_DOCS = 2


def q219_edge_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Template boilerplate detector: the leading and trailing 2-token
    grams that repeat across documents of the same source — the
    header/footer signature a scraped-corpus cleaner strips before
    training (cf. the per-line dedup rule in RefinedWeb/Gopher cleaning).

    Both edge grams are computed in-row (no explode of the body), so the
    shuffle carries exactly 2 short grams per doc regardless of document
    length; one aggregate + the final sort.  Output: (source, kind, gram,
    n_docs) for grams seen in >= {_Q219_MIN_DOCS} docs of one source.
    """
    docs = load_tables(spark, sf_dir)["documents"]
    w = tokens("text")
    edges = docs.select(
        "source",
        F.explode(
            F.array(
                F.struct(
                    F.lit("head").alias("kind"),
                    F.concat_ws(
                        " ", F.element_at(w, 1), F.element_at(w, 2)
                    ).alias("gram"),
                ),
                F.struct(
                    F.lit("tail").alias("kind"),
                    F.concat_ws(
                        " ", F.element_at(w, -2), F.element_at(w, -1)
                    ).alias("gram"),
                ),
            )
        ).alias("e"),
    ).where(F.size(w) >= 2)
    return (
        edges.groupBy("source", F.col("e.kind").alias("kind"), F.col("e.gram").alias("gram"))
        .agg(F.count("*").alias("n_docs"))
        .where(F.col("n_docs") >= _Q219_MIN_DOCS)
        .orderBy("source", "kind", "gram")
    )


Q219_SQL = f"""
WITH w AS (SELECT source, string_split(text, ' ') AS w FROM documents),
edges AS (
  SELECT source, 'head' AS kind, w[1] || ' ' || w[2] AS gram
  FROM w WHERE len(w) >= 2
  UNION ALL
  SELECT source, 'tail', w[len(w) - 1] || ' ' || w[len(w)]
  FROM w WHERE len(w) >= 2
)
SELECT source, kind, gram, COUNT(*) AS n_docs
FROM edges
GROUP BY source, kind, gram
HAVING COUNT(*) >= {_Q219_MIN_DOCS}
ORDER BY source, kind, gram
"""


# --- q220: contrastive negative sampling --------------------------------------

_Q220_N_ANCHORS = 4
_Q220_K_NEG = 3


def q220_negative_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for contrastive training: for each
    of ``_Q220_N_ANCHORS`` seeded anchor docs, the ``_Q220_K_NEG``
    md5-ranked negatives drawn from OUTSIDE the anchor's leakage group
    (the q218 prefix fingerprint) — random-but-reproducible negatives
    that can never be a near-duplicate of their anchor.

    The anchor set is a bounded seeded selection (TakeOrdered on the md5
    rank — top-k, never a full sort), broadcast against the corpus; the
    per-anchor ranking window partitions on anchor_id, so state is
    #anchors x corpus rows — bounded by the anchor budget, which is the
    knob that keeps this runnable at 100 TB.
    Output: (anchor_id, neg_id, rnk), k rows per anchor.
    """
    docs = load_tables(spark, sf_dir)["documents"]
    grp = F.md5(F.concat_ws(" ", F.slice(tokens("text"), 1, _Q218_PREFIX)))
    tagged = docs.select("doc_id", grp.alias("grp"))
    anchors = (
        tagged.orderBy(
            F.md5(F.concat_ws(":", F.col("doc_id"), F.lit("anchor"))), "doc_id"
        )
        .limit(_Q220_N_ANCHORS)
        .select(
            F.col("doc_id").alias("anchor_id"), F.col("grp").alias("anchor_grp")
        )
    )
    ranked = (
        F.broadcast(anchors)
        .join(tagged, F.col("grp") != F.col("anchor_grp"))
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("anchor_id").orderBy(
                    F.md5(F.concat_ws(":", F.col("anchor_id"), F.col("doc_id"))),
                    "doc_id",
                )
            ),
        )
    )
    return (
        ranked.where(F.col("rnk") <= _Q220_K_NEG)
        .select("anchor_id", F.col("doc_id").alias("neg_id"), "rnk")
        .orderBy("anchor_id", "rnk")
    )


Q220_SQL = f"""
WITH tagged AS (
  SELECT doc_id,
         md5(array_to_string(string_split(text, ' ')[1:{_Q218_PREFIX}], ' ')) AS grp
  FROM documents
),
anchors AS (
  SELECT doc_id AS anchor_id, grp AS anchor_grp
  FROM tagged
  ORDER BY md5(CAST(doc_id AS VARCHAR) || ':anchor'), doc_id
  LIMIT {_Q220_N_ANCHORS}
),
ranked AS (
  SELECT a.anchor_id, t.doc_id AS neg_id,
         ROW_NUMBER() OVER (
           PARTITION BY a.anchor_id
           ORDER BY md5(CAST(a.anchor_id AS VARCHAR) || ':' || CAST(t.doc_id AS VARCHAR)),
                    t.doc_id
         ) AS rnk
  FROM anchors a
  JOIN tagged t ON t.grp <> a.anchor_grp
)
SELECT anchor_id, neg_id, rnk
FROM ranked WHERE rnk <= {_Q220_K_NEG}
ORDER BY anchor_id, rnk
"""


# --- q221: context-length truncation planner ----------------------------------

_Q221_CTX_LENS = [32, 64, 128]


def q221_truncation_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-length planning: for each candidate sequence length, the
    per-source fraction of tokens a train-time truncation would discard —
    the report that decides the packing length before a training run.

    The (source, ctx) grid is produced by an in-row 3-struct explode of
    per-doc token counts (no join, no second scan); one aggregate, exact
    integer token accounting, a single float division per output row.
    """
    docs = load_tables(spark, sf_dir)["documents"]
    toks = F.size(tokens("text"))
    grid = docs.select(
        "source",
        toks.alias("toks"),
        F.explode(
            F.array(*[F.lit(c) for c in _Q221_CTX_LENS])
        ).alias("ctx_len"),
    )
    return (
        grid.groupBy("source", "ctx_len")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum((F.col("toks") > F.col("ctx_len")).cast("long")).alias(
                "docs_over"
            ),
            F.sum("toks").alias("total_tokens"),
            F.sum(
                F.greatest(F.col("toks") - F.col("ctx_len"), F.lit(0))
            ).alias("tokens_lost"),
        )
        .withColumn(
            "loss_frac", F.col("tokens_lost") / F.col("total_tokens")
        )
        .orderBy("source", "ctx_len")
    )


Q221_SQL = f"""
WITH grid AS (
  SELECT source, LEN(string_split(text, ' ')) AS toks, ctx_len
  FROM documents, UNNEST([{", ".join(map(str, _Q221_CTX_LENS))}]) AS t(ctx_len)
)
SELECT source, ctx_len, COUNT(*) AS n_docs,
       SUM(CASE WHEN toks > ctx_len THEN 1 ELSE 0 END) AS docs_over,
       SUM(toks) AS total_tokens,
       SUM(GREATEST(toks - ctx_len, 0)) AS tokens_lost,
       SUM(GREATEST(toks - ctx_len, 0)) / SUM(toks) AS loss_frac
FROM grid
GROUP BY source, ctx_len
ORDER BY source, ctx_len
"""


# --- q222: dedup threshold sweep ----------------------------------------------


def q222_dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaccard-threshold selection from ONE LSH+verify pass: histogram of
    verified candidate-pair similarities in exact tenth-bins, with the
    running pair count at-or-above each bin — the sweep a dedup operator
    reads to pick its threshold, without re-running the pipeline per
    candidate value.

    Bins are integer-exact (``10*n_common DIV union``, never a float
    floor); the cumulative is a 10-row window.  Costs exactly one q34
    pipeline run (threshold 0) regardless of how many thresholds are
    under consideration — that amortization is the point at 100 TB.
    """
    from hadoop_jobanalyzer_spark.operators.dedup import near_dup_pairs

    docs = load_tables(spark, sf_dir)["documents"]
    pairs = near_dup_pairs(
        docs, "doc_id", "text", n_hashes=8, bands=4, ngram=3, threshold=0.0
    )
    binned = pairs.select(
        (
            (F.lit(10) * F.col("n_common"))
            / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
        )
        .cast("long")
        .alias("bin")
    )
    hist = binned.groupBy("bin").agg(F.count("*").alias("n_pairs"))
    w = Window.orderBy(F.col("bin").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        hist.withColumn("n_pairs_ge", F.sum("n_pairs").over(w))
        .select(
            "bin",
            (F.col("bin") / F.lit(10.0)).alias("threshold_lo"),
            "n_pairs",
            "n_pairs_ge",
        )
        .orderBy("bin")
    )


def _q222_sql() -> str:
    return f"""
WITH {near_dup_ctes(0.0)},
binned AS (
  SELECT CAST((10 * n_common) // (n_a + n_b - n_common) AS BIGINT) AS bin
  FROM verified
),
hist AS (SELECT bin, COUNT(*) AS n_pairs FROM binned GROUP BY bin)
SELECT bin, bin / 10.0 AS threshold_lo, n_pairs,
       SUM(n_pairs) OVER (ORDER BY bin DESC
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS n_pairs_ge
FROM hist
ORDER BY bin
"""


# --- q223: watermark-delay planner --------------------------------------------


def q223_watermark_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-delay selection for streaming ingest: replay each event
    type's stream in a seeded-shuffled arrival order (the md5 permutation
    a replay harness uses to simulate network disorder), measure how late
    each event arrives behind the running event-time high-watermark, and
    report the smallest power-of-two delay budget that captures >= 95% of
    events — the number `withWatermark` actually needs.

    Lateness buckets are exact BIT LENGTHS (base-2 string conversion, the
    q106 pattern — no libm log); the 95% crossing is an integer
    cross-multiplication (20*cum >= 19*n) over the tiny per-type bucket
    table.  The per-type running max is inherently sequential — this
    diagnostic runs over a bounded replay window (a day / an hour), never
    the full corpus; the per-type window is the simulation, not the
    production path.
    Output: (event_type, n_events, n_late, max_late_ms, p95_delay_ms).
    """
    from hadoop_jobanalyzer_spark.util import epoch_ms

    events = load_tables(spark, sf_dir)["events"]
    arr = F.md5(F.concat_ws(":", F.col("event_id"), F.lit("arrival")))
    w = (
        Window.partitionBy("event_type")
        .orderBy(arr, "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ms = epoch_ms("ts")
    late = F.greatest(
        F.coalesce(F.max(ms).over(w) - ms, F.lit(0)), F.lit(0)
    )
    lates = events.select("event_type", late.alias("late_ms"))
    bucket = F.when(F.col("late_ms") == 0, F.lit(0)).otherwise(
        F.length(F.conv(F.col("late_ms").cast("string"), 10, 2))
    )
    hist = lates.groupBy("event_type", bucket.alias("b")).agg(
        F.count("*").alias("n"), F.max("late_ms").alias("mx")
    )
    tw = Window.partitionBy("event_type")
    cw = Window.partitionBy("event_type").orderBy("b").rowsBetween(
        Window.unboundedPreceding, 0
    )
    stats = (
        hist.withColumn("n_events", F.sum("n").over(tw))
        .withColumn("n_late", F.sum(F.when(F.col("b") > 0, F.col("n")).otherwise(0)).over(tw))
        .withColumn("max_late_ms", F.max("mx").over(tw))
        .withColumn("cum", F.sum("n").over(cw))
        .where(F.lit(20) * F.col("cum") >= F.lit(19) * F.col("n_events"))
    )
    best = stats.groupBy("event_type", "n_events", "n_late", "max_late_ms").agg(
        F.min("b").alias("p95_b")
    )
    return best.select(
        "event_type",
        "n_events",
        "n_late",
        "max_late_ms",
        F.when(F.col("p95_b") == 0, F.lit(0).cast("long"))
        .otherwise(F.expr("shiftleft(CAST(1 AS BIGINT), p95_b) - 1"))
        .alias("p95_delay_ms"),
    ).orderBy("event_type")


Q223_SQL = """
WITH lates AS (
  SELECT event_type,
         GREATEST(COALESCE(MAX(epoch_ms(ts)) OVER (
             PARTITION BY event_type
             ORDER BY md5(CAST(event_id AS VARCHAR) || ':arrival'), event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) - epoch_ms(ts), 0), 0) AS late_ms
  FROM events
),
hist AS (
  SELECT event_type,
         CASE WHEN late_ms = 0 THEN 0
              ELSE LENGTH(format('{:b}', late_ms)) END AS b,
         COUNT(*) AS n, MAX(late_ms) AS mx
  FROM lates GROUP BY 1, 2
),
stats AS (
  SELECT event_type, b, n, mx,
         SUM(n) OVER (PARTITION BY event_type) AS n_events,
         SUM(CASE WHEN b > 0 THEN n ELSE 0 END)
           OVER (PARTITION BY event_type) AS n_late,
         MAX(mx) OVER (PARTITION BY event_type) AS max_late_ms,
         SUM(n) OVER (PARTITION BY event_type ORDER BY b
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM hist
)
SELECT event_type, n_events, n_late, max_late_ms,
       CASE WHEN MIN(b) = 0 THEN 0
            ELSE (1::BIGINT << MIN(b)) - 1 END AS p95_delay_ms
FROM stats
WHERE 20 * cum >= 19 * n_events
GROUP BY event_type, n_events, n_late, max_late_ms
ORDER BY event_type
"""


# --- q224: join-strategy advisor ----------------------------------------------

# (table, [(column, kind)]) with kind 's' = string (exact byte length) and
# 'n' = fixed-width 8-byte numeric/timestamp — the advisor's width model.
_Q224_SCHEMAS = [
    ("customer", [("c_custkey", "n"), ("c_name", "s"), ("c_nationkey", "n"), ("c_acctbal", "n"), ("c_mktsegment", "s")]),
    ("lineitem", [("l_orderkey", "n"), ("l_partkey", "n"), ("l_suppkey", "n"), ("l_linenumber", "n"), ("l_quantity", "n"), ("l_extendedprice", "n"), ("l_discount", "n"), ("l_tax", "n"), ("l_returnflag", "s"), ("l_linestatus", "s"), ("l_shipdate", "n")]),
    ("nation", [("n_nationkey", "n"), ("n_name", "s"), ("n_regionkey", "n")]),
    ("orders", [("o_orderkey", "n"), ("o_custkey", "n"), ("o_orderstatus", "s"), ("o_totalprice", "n"), ("o_orderdate", "n"), ("o_orderpriority", "s")]),
    ("part", [("p_partkey", "n"), ("p_name", "s"), ("p_brand", "s"), ("p_type", "s"), ("p_size", "n"), ("p_retailprice", "n")]),
    ("region", [("r_regionkey", "n"), ("r_name", "s")]),
    ("supplier", [("s_suppkey", "n"), ("s_name", "s"), ("s_nationkey", "n"), ("s_acctbal", "n")]),
]
_Q224_BROADCAST_BYTES = 10_000_000
_Q224_SHUFFLE_BYTES = 1_000_000_000


def q224_join_strategy_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AQE-style join-side sizing from exact byte accounting: per table,
    the row count and an estimated in-memory size (exact string lengths +
    8 bytes per fixed-width column), classified against the broadcast
    (10 MB) and plain-shuffle (1 GB) thresholds a planner would use.

    This is the advisory the engine's own `spark.sql.autoBroadcastJoin
    Threshold` applies at plan time, made inspectable — the query a
    capacity reviewer runs before pinning `broadcast()` hints.  Seven
    independent single-row aggregates (each a pushed-down scan of only
    the measured columns) unioned driver-side; no join, no shuffle
    beyond each 1-row fold.
    Output: (table_name, n_rows, est_bytes, strategy).
    """
    t = load_tables(spark, sf_dir)
    parts = []
    for name, cols in _Q224_SCHEMAS:
        width = sum(
            (F.length(F.col(c)) if kind == "s" else F.lit(8))
            for c, kind in cols
        )
        parts.append(
            t[name].agg(
                F.lit(name).alias("table_name"),
                F.count("*").alias("n_rows"),
                F.sum(width).alias("est_bytes"),
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u.select(
        "table_name",
        "n_rows",
        "est_bytes",
        F.when(F.col("est_bytes") <= _Q224_BROADCAST_BYTES, F.lit("broadcast"))
        .when(F.col("est_bytes") <= _Q224_SHUFFLE_BYTES, F.lit("shuffle"))
        .otherwise(F.lit("shuffle_aqe_skew"))
        .alias("strategy"),
    ).orderBy("table_name")


def _q224_sql() -> str:
    selects = []
    for name, cols in _Q224_SCHEMAS:
        width = " + ".join(
            f"LENGTH({c})" if kind == "s" else "8" for c, kind in cols
        )
        selects.append(
            f"SELECT '{name}' AS table_name, COUNT(*) AS n_rows, "
            f"SUM({width}) AS est_bytes FROM {name}"
        )
    body = " UNION ALL ".join(selects)
    return f"""
WITH sizes AS ({body})
SELECT table_name, n_rows, est_bytes,
       CASE WHEN est_bytes <= {_Q224_BROADCAST_BYTES} THEN 'broadcast'
            WHEN est_bytes <= {_Q224_SHUFFLE_BYTES} THEN 'shuffle'
            ELSE 'shuffle_aqe_skew' END AS strategy
FROM sizes
ORDER BY table_name
"""


# --- q225: write-size planner -------------------------------------------------

_Q225_TARGET_BYTES = 65536


def q225_write_size_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Output-file sizing before a partitioned write: per source, the
    repartition count that lands `write_partitioned` files at
    ~``_Q225_TARGET_BYTES`` — ceil(bytes/target) in exact integers — and
    the docs-per-file that implies.  The planner half of the
    `sinks.write_partitioned` feature: run this, pass `n_files` to the
    writer's repartition, and small-file sprawl (the q217 cleanup) never
    happens in the first place.
    """
    docs = load_tables(spark, sf_dir)["documents"]
    return (
        docs.groupBy("source")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("bytes"))
        .select(
            "source",
            "n_docs",
            "bytes",
            F.floor(
                (F.col("bytes") + _Q225_TARGET_BYTES - 1) / _Q225_TARGET_BYTES
            ).alias("n_files"),
        )
        .withColumn("docs_per_file", F.floor(F.col("n_docs") / F.col("n_files")))
        .orderBy("source")
    )


Q225_SQL = f"""
SELECT source, COUNT(*) AS n_docs, SUM(n_chars) AS bytes,
       (SUM(n_chars) + {_Q225_TARGET_BYTES} - 1) // {_Q225_TARGET_BYTES} AS n_files,
       COUNT(*) // ((SUM(n_chars) + {_Q225_TARGET_BYTES} - 1) // {_Q225_TARGET_BYTES})
         AS docs_per_file
FROM documents
GROUP BY source
ORDER BY source
"""


# --- q226: session-timeout grid -----------------------------------------------

_Q226_TIMEOUTS_S = [60, 300, 900]


def q226_session_timeout_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-gap timeout selection from one pass: for each candidate
    idle timeout, the session count and mean events-per-session the q36
    sessionizer (or the streaming session window) would produce —
    n_sessions(t) = n_users + #(gaps > t), so every candidate timeout is
    three conditional counts over ONE lag-window pass, folded to a single
    row and unpivoted in-row to the grid.
    Output: (timeout_s, n_sessions, events_per_session).
    """
    from hadoop_jobanalyzer_spark.util import epoch_ms

    events = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ms = epoch_ms("ts")
    gaps = events.select(
        "user_id", (ms - F.lag(ms).over(w)).alias("gap_ms")
    )
    folded = gaps.agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        *[
            F.sum((F.col("gap_ms") > t * 1000).cast("long")).alias(f"c{t}")
            for t in _Q226_TIMEOUTS_S
        ],
    )
    grid = folded.select(
        "n_events",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("timeout_s"),
                        (F.col("n_users") + F.col(f"c{t}")).alias("n_sessions"),
                    )
                    for t in _Q226_TIMEOUTS_S
                ]
            )
        ).alias("g"),
    )
    return grid.select(
        F.col("g.timeout_s").alias("timeout_s"),
        F.col("g.n_sessions").alias("n_sessions"),
        (F.col("n_events") / F.col("g.n_sessions")).alias("events_per_session"),
    ).orderBy("timeout_s")


def _q226_sql() -> str:
    cs = ", ".join(
        f"SUM(CASE WHEN gap_ms > {t} * 1000 THEN 1 ELSE 0 END) AS c{t}"
        for t in _Q226_TIMEOUTS_S
    )
    rows = " UNION ALL ".join(
        f"SELECT {t} AS timeout_s, n_users + c{t} AS n_sessions, "
        f"n_events / (n_users + c{t}) AS events_per_session FROM folded"
        for t in _Q226_TIMEOUTS_S
    )
    return f"""
WITH gaps AS (
  SELECT user_id,
         epoch_ms(ts) - LAG(epoch_ms(ts))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_ms
  FROM events
),
folded AS (
  SELECT COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users, {cs}
  FROM gaps
)
SELECT * FROM ({rows}) ORDER BY timeout_s
"""


# --- q227: hopping-window aggregates ------------------------------------------

_Q227_WIN_MS = 600_000  # 10-minute windows ...
_Q227_HOP_MS = 300_000  # ... hopping every 5 minutes (each event in 2)


def q227_hopping_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) window aggregates in batch — the overlap-window
    shape of `F.window(ts, '10 minutes', '5 minutes')` / Structured
    Streaming, expressed portably: with window = 2 x hop, every event
    belongs to exactly two hop-aligned windows, produced by an in-row
    2-struct explode (never a range join against a window spine).

    The shuffle carries (window_start, event_type) cells — 2 rows per
    event regardless of window width — and sums are exact DECIMAL with
    one final round.  Output: (window_start_ms, event_type, n_events,
    total_value).
    """
    from hadoop_jobanalyzer_spark.util import epoch_ms

    events = load_tables(spark, sf_dir)["events"]
    ms = epoch_ms("ts")
    wins = events.select(
        "event_type",
        F.col("value").cast("decimal(18,4)").alias("v"),
        F.explode(
            F.array(
                *[
                    (
                        (F.floor(ms / _Q227_HOP_MS) - i) * _Q227_HOP_MS
                    ).alias("w")
                    for i in (0, 1)
                ]
            )
        ).alias("window_start_ms"),
    )
    return (
        wins.groupBy("window_start_ms", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("v"), 2).cast("double").alias("total_value"),
        )
        .orderBy("window_start_ms", "event_type")
    )


Q227_SQL = f"""
WITH wins AS (
  SELECT event_type, CAST(value AS DECIMAL(18,4)) AS v,
         (epoch_ms(ts) // {_Q227_HOP_MS} - i) * {_Q227_HOP_MS} AS window_start_ms
  FROM events, UNNEST([0, 1]) AS t(i)
)
SELECT window_start_ms, event_type, COUNT(*) AS n_events,
       CAST(ROUND(SUM(v), 2) AS DOUBLE) AS total_value
FROM wins
GROUP BY window_start_ms, event_type
ORDER BY window_start_ms, event_type
"""


# --- q228: per-language distinctive terms (rational log-odds) -----------------

_Q228_TOP_K = 5


def q228_distinctive_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The top-k most DISTINCTIVE tokens per language by smoothed odds
    ratio against the rest of the corpus — the per-class keyword report
    (Monroe et al.'s log-odds family) a corpus card prints per language.

    The ranking statistic is the rank-equivalent rational form
    (c_l + 1)(N_r + V) / (c_r + 1)(N_l + V) — integer cross products,
    one float division at the end, no libm log anywhere, so Spark and
    the oracle order identically (ties broken by token asc).  One
    (lang, token) count shuffle feeds both the per-token rest-counts
    (re-agg of the same table) and the per-lang totals (broadcast);
    the top-k window runs per language over the scored table.
    Output: (lang, token, c_lang, c_rest, score).
    """
    docs = load_tables(spark, sf_dir)["documents"]
    # the (lang, token) count table feeds four consumers (scored join,
    # per-token totals, per-lang totals, vocab fold) — persist it so the
    # corpus-wide explode+agg subtree executes once, not four times
    cnt = (
        docs.select("lang", F.explode(tokens("text")).alias("token"))
        .groupBy("lang", "token")
        .agg(F.count("*").alias("c"))
        .transform(materialize)
    )
    tok_tot = cnt.groupBy("token").agg(F.sum("c").alias("ct"))
    lang_tot = cnt.groupBy("lang").agg(F.sum("c").alias("nl"))
    vocab = tok_tot.agg(
        F.count("*").alias("v"), F.sum("ct").alias("n")
    )
    scored = (
        # tok_tot is vocabulary-scaled over the materialized count table's
        # fanout-blind copied estimate — pinned shuffle-hash (q235 class,
        # r10 audit); lang_tot stays an explicit bounded-domain broadcast
        cnt.join(tok_tot.hint("shuffle_hash"), "token")
        .join(F.broadcast(lang_tot), "lang")
        .crossJoin(F.broadcast(vocab))
        .select(
            "lang",
            "token",
            F.col("c").alias("c_lang"),
            (F.col("ct") - F.col("c")).alias("c_rest"),
            (
                (F.col("c") + 1)
                * (F.col("n") - F.col("nl") + F.col("v"))
            ).alias("_num"),
            (
                (F.col("ct") - F.col("c") + 1) * (F.col("nl") + F.col("v"))
            ).alias("_den"),
        )
    )
    w = Window.partitionBy("lang").orderBy(
        (F.col("_num") / F.col("_den")).desc(), "token"
    )
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= _Q228_TOP_K)
        .select(
            "lang",
            "token",
            "c_lang",
            "c_rest",
            (F.col("_num") / F.col("_den")).alias("score"),
        )
        .orderBy("lang", F.col("score").desc(), "token")
    )


Q228_SQL = f"""
WITH cnt AS (
  SELECT lang, tok AS token, COUNT(*) AS c
  FROM (SELECT lang, UNNEST(string_split(text, ' ')) AS tok FROM documents)
  GROUP BY 1, 2
),
tok_tot AS (SELECT token, SUM(c) AS ct FROM cnt GROUP BY 1),
lang_tot AS (SELECT lang, SUM(c) AS nl FROM cnt GROUP BY 1),
vocab AS (SELECT COUNT(*) AS v, SUM(ct) AS n FROM tok_tot),
scored AS (
  SELECT cnt.lang, cnt.token, cnt.c AS c_lang, tok_tot.ct - cnt.c AS c_rest,
         (cnt.c + 1) * (vocab.n - lang_tot.nl + vocab.v) AS num,
         (tok_tot.ct - cnt.c + 1) * (lang_tot.nl + vocab.v) AS den
  FROM cnt
  JOIN tok_tot USING (token)
  JOIN lang_tot USING (lang)
  CROSS JOIN vocab
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY CAST(num AS DOUBLE) / den DESC, token ASC
         ) AS rk
  FROM scored
)
SELECT lang, token, c_lang, c_rest, CAST(num AS DOUBLE) / den AS score
FROM ranked WHERE rk <= {_Q228_TOP_K}
ORDER BY lang, score DESC, token
"""


# --- q229: quality-vs-duplication calibration ---------------------------------

_Q229_BUCKETS = 5


def q229_quality_dup_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram for a quality score against a duplication
    signal: docs are ranked by lexical diversity (distinct-token ratio),
    cut into quintiles by the exact rank formula, and each bucket reports
    its observed template-duplication rate (the q218 prefix-fingerprint
    group having >1 member).  A cleaner uses this to check that the
    cheap quality score actually orders the dup-heavy mass last before
    trusting it as a gate.

    The global rank uses `util.bucketed_global_rank` (parallel bucket
    windows + tiny offset prefix sum — never a 1-partition ORDER BY);
    the dup flag is one group-size aggregate over the in-row
    fingerprint.  Integer bucket math, one division per output row.
    Output: (bucket, n_docs, n_dup, dup_frac).
    """
    from hadoop_jobanalyzer_spark.util import bucketed_global_rank

    docs = load_tables(spark, sf_dir)["documents"]
    w = tokens("text")
    grp = F.md5(F.concat_ws(" ", F.slice(w, 1, _Q218_PREFIX)))
    base = docs.select(
        "doc_id",
        grp.alias("grp"),
        # scaled-integer diversity: distinct tokens per 10^6 tokens —
        # exact integer ordering, no float rank key (floor division on
        # both engines; the numerator stays < 2^53 so the double floor
        # is exact)
        F.floor(
            F.size(F.array_distinct(w)).cast("long")
            * 1_000_000
            / F.size(w)
        ).alias("div_ppm"),
    )
    gsz = base.groupBy("grp").agg(F.count("*").alias("gsz"))
    # bucketed_global_rank consumes its input three ways (in-bucket
    # window, bucket counts, total) — persist the doc-grain flag table
    flagged = (
        # gsz is one row per fingerprint group (corpus-scaled) over the
        # doc scan's estimate — pinned shuffle-hash (q235 class, r10)
        base.join(gsz.hint("shuffle_hash"), "grp")
        .select(
            "doc_id", "div_ppm", (F.col("gsz") > 1).cast("long").alias("is_dup")
        )
        .transform(materialize)
    )
    ranked = bucketed_global_rank(
        flagged,
        bucket=F.floor(F.col("div_ppm") / 100_000),
        order_within=[F.col("div_ppm"), F.col("doc_id")],
        out="rk",
    )
    n_total = ranked.agg(F.count("*").alias("n"))
    return (
        ranked.crossJoin(F.broadcast(n_total))
        .select(
            F.floor(
                (_Q229_BUCKETS * (F.col("rk") - 1)) / F.col("n")
            ).alias("bucket"),
            "is_dup",
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("is_dup").alias("n_dup"),
        )
        .withColumn("dup_frac", F.col("n_dup") / F.col("n_docs"))
        .orderBy("bucket")
    )


Q229_SQL = f"""
WITH base AS (
  SELECT doc_id,
         md5(array_to_string(string_split(text, ' ')[1:{_Q218_PREFIX}], ' ')) AS grp,
         (CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
              * 1000000) // len(string_split(text, ' ')) AS div_ppm
  FROM documents
),
gsz AS (SELECT grp, COUNT(*) AS gsz FROM base GROUP BY 1),
flagged AS (
  SELECT doc_id, div_ppm, CASE WHEN gsz > 1 THEN 1 ELSE 0 END AS is_dup
  FROM base JOIN gsz USING (grp)
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY div_ppm, doc_id) AS rk,
         COUNT(*) OVER () AS n
  FROM flagged
)
SELECT CAST(FLOOR(({_Q229_BUCKETS} * (rk - 1)) / n) AS BIGINT) AS bucket,
       COUNT(*) AS n_docs, SUM(is_dup) AS n_dup,
       SUM(is_dup) / COUNT(*) AS dup_frac
FROM ranked
GROUP BY 1
ORDER BY 1
"""


PLANNER_QUERIES = {
    "q216_lsh_banding_planner": (q216_lsh_banding_planner, _q216_sql()),
    "q217_compaction_plan": (q217_compaction_plan, Q217_SQL),
    "q218_group_kfold": (q218_group_kfold, Q218_SQL),
    "q219_edge_boilerplate": (q219_edge_boilerplate, Q219_SQL),
    "q220_negative_samples": (q220_negative_samples, Q220_SQL),
    "q221_truncation_planner": (q221_truncation_planner, Q221_SQL),
    "q222_dedup_threshold_sweep": (q222_dedup_threshold_sweep, _q222_sql()),
    "q223_watermark_planner": (q223_watermark_planner, Q223_SQL),
    "q224_join_strategy_advisor": (q224_join_strategy_advisor, _q224_sql()),
    "q225_write_size_planner": (q225_write_size_planner, Q225_SQL),
    "q226_session_timeout_grid": (q226_session_timeout_grid, _q226_sql()),
    "q227_hopping_windows": (q227_hopping_windows, Q227_SQL),
    "q228_distinctive_terms": (q228_distinctive_terms, Q228_SQL),
    "q229_quality_dup_calibration": (q229_quality_dup_calibration, Q229_SQL),
}
