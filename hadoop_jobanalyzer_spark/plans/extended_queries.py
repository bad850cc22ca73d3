"""Extended queries: dedup clustering, corpus statistics, deterministic
sampling, pivots, moving windows, and deciles — each as a (DataFrame
builder, DuckDB oracle) pair like the core and pipeline sets.

These widen the engine surface past the reference's fixed reports
(SURVEY.md §2.5 notes the free generalizations; the clustering/sampling
entries belong to the training-data-pipeline layer). Determinism rules are
the ones from core_queries: exact decimal money sums, integer-only ranking
keys where possible, unique-key tiebreaks on every ordering, md5-based
portable hashing (never engine-native hash functions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hadoop_jobanalyzer_spark.functions.text import token_count, tokens
from hadoop_jobanalyzer_spark.operators.fuzzy import blocked_levenshtein_pairs
from hadoop_jobanalyzer_spark.operators.graph import component_sizes
from hadoop_jobanalyzer_spark.operators.sampling import (
    hash_bucket,
    train_val_test,
    weighted_sample,
)
from hadoop_jobanalyzer_spark.plans.pipeline_queries import (
    _BANDS,
    _N_HASHES,
    _WORDS,
    near_dup_ctes,
)
from hadoop_jobanalyzer_spark.plans.tables import load_tables
from hadoop_jobanalyzer_spark.util import epoch_ms, materialize, spread


def _dec(col: str, scale: int = 2) -> F.Column:
    return F.col(col).cast(f"decimal(18,{scale})")


def _dbl(col: F.Column) -> F.Column:
    return col.cast("double")


# --- q40: near-dup clustering (connected components) -------------------------


def q40_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs -> undirected graph -> connected components: every
    document labeled with its dedup cluster (min doc_id reachable) and the
    cluster size. Singletons are their own component. This is the step that
    turns pairwise similarity into "keep one per group" at corpus scale.
    Pairs + labels come from the session's materialized dedup subtree
    (pipeline_queries.corpus_dedup) — built once, joined by five queries."""
    from hadoop_jobanalyzer_spark.plans.pipeline_queries import corpus_dedup

    _, cc = corpus_dedup(spark, sf_dir)
    return (
        component_sizes(cc, id_col="id")
        .select(F.col("id").alias("doc_id"), "component", "cluster_size")
        .orderBy("doc_id")
    )


def _q40_sql() -> str:
    # Transitive closure via recursive CTE: component(n) = min id reachable
    # from n. UNION (distinct) guarantees termination; component sizes join
    # back on the labels.
    return f"""
WITH RECURSIVE {near_dup_ctes()},
edges AS (
  SELECT id_a AS s, id_b AS d FROM verified
  UNION
  SELECT id_b AS s, id_a AS d FROM verified
),
reach(n, m) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT r.n, e.d FROM reach r JOIN edges e ON e.s = r.m
),
comp AS (SELECT n AS doc_id, MIN(m) AS component FROM reach GROUP BY n),
csize AS (SELECT component, COUNT(*) AS cluster_size FROM comp GROUP BY component)
SELECT doc_id, comp.component, cluster_size
FROM comp JOIN csize USING (component)
ORDER BY doc_id
"""


# --- q41/q42: corpus vocabulary and per-doc top terms ------------------------


def q41_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: top 50 tokens by occurrence count (tie-break on
    the token itself so the cut is deterministic). One explode + one
    partial-aggregating groupBy — the canonical word-count shape."""
    t = load_tables(spark, sf_dir)
    tok = spread(t["documents"]).select(
        "doc_id", F.explode(tokens("text")).alias("token")
    )
    return (
        tok.groupBy("token")
        .agg(F.count("*").alias("n_occurrences"), F.countDistinct("doc_id").alias("n_docs"))
        .orderBy(F.desc("n_occurrences"), "token")
        .limit(50)
    )


Q41_SQL = """
WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
SELECT token, COUNT(*) AS n_occurrences, COUNT(DISTINCT doc_id) AS n_docs
FROM w GROUP BY token
ORDER BY n_occurrences DESC, token
LIMIT 50
"""


def q42_doc_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top 3 distinctive terms per document, TF-IDF-shaped but integer-only
    for cross-engine determinism: rank by term frequency desc, document
    frequency asc (rarer = more distinctive), token asc.

    Document frequency is a count-window over the tf rows rather than a
    groupBy + re-join: Spark does not materialize shared subplans, so the
    join form would scan + explode the corpus twice; the window form costs
    one extra shuffle of the (already corpus-reduced) tf table instead."""
    t = load_tables(spark, sf_dir)
    tok = spread(t["documents"]).select(
        "doc_id", F.explode(tokens("text")).alias("token")
    )
    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    w = Window.partitionBy("doc_id").orderBy(F.desc("tf"), F.asc("df"), F.asc("token"))
    return (
        tf.withColumn("df", F.count("*").over(Window.partitionBy("token")))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "token", "tf", "df", "rnk")
        .orderBy("doc_id", "rnk")
    )


Q42_SQL = """
WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM w GROUP BY doc_id, token),
dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
ranked AS (
  SELECT doc_id, tf.token, tf, df,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tf DESC, df ASC, tf.token ASC) AS rnk
  FROM tf JOIN dfreq ON tf.token = dfreq.token
)
SELECT doc_id, token, tf, df, rnk FROM ranked WHERE rnk <= 3 ORDER BY doc_id, rnk
"""


# --- q43: deterministic stratified train/val/test split ----------------------


def q43_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment from md5(doc_id):
    membership is a pure function of the key, so re-runs and engine ports
    reproduce it exactly and corpus growth never reshuffles old rows.
    Output: per (lang, split) document counts."""
    t = load_tables(spark, sf_dir)
    return (
        t["documents"]
        .withColumn("split", train_val_test(F.col("doc_id")))
        .groupBy("lang", "split")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("lang", "split")
    )


Q43_SQL = """
WITH b AS (
  SELECT lang,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS bucket
  FROM documents
)
SELECT lang,
       CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
       COUNT(*) AS n_docs
FROM b GROUP BY 1, 2 ORDER BY lang, split
"""


# --- q44: pivot (daily x event_type counts) ----------------------------------

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q44_daily_event_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event counts pivoted to one column per event type. The pivot
    value list is explicit, so the schema is fixed at plan time (no extra
    distinct-values job) — required for a stable driver schema and the
    right call at scale anyway."""
    t = load_tables(spark, sf_dir)
    out = (
        t["events"]
        .withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
        .groupBy("day")
        .pivot("event_type", _EVENT_TYPES)
        .count()
        .na.fill(0, [*_EVENT_TYPES])
    )
    for et in _EVENT_TYPES:
        out = out.withColumnRenamed(et, f"n_{et}")
    return out.orderBy("day")


Q44_SQL = f"""
SELECT strftime(ts, '%Y-%m-%d') AS day,
  {", ".join(f"COUNT(CASE WHEN event_type = '{et}' THEN 1 END) AS n_{et}" for et in _EVENT_TYPES)}
FROM events GROUP BY 1 ORDER BY day
"""


# --- q45: 7-day moving window over daily revenue -----------------------------


def q45_moving_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily order revenue with a 7-day trailing window (sum + avg).

    Money goes through exact decimal sums (summation order invariant), and
    the window frame is ROWS-based over a unique day key, so both engines
    fold identical values in identical order. The day-grain series is tiny
    at any SF — the single-partition window after the partial-agg'd daily
    rollup is the correct plan, not a scale bug."""
    t = load_tables(spark, sf_dir)
    daily = (
        t["orders"]
        .groupBy(F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"))
        .agg(F.sum(_dec("o_totalprice")).alias("rev"))
    )
    w = Window.orderBy("day").rowsBetween(-6, 0)
    return daily.select(
        "day",
        _dbl(F.round("rev", 2)).alias("day_revenue"),
        _dbl(F.round(F.sum("rev").over(w), 2)).alias("revenue_7d"),
        F.round(_dbl(F.sum("rev").over(w)) / F.count("*").over(w), 2).alias("avg_7d"),
    ).orderBy("day")


Q45_SQL = """
WITH daily AS (
  SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders GROUP BY 1
)
SELECT day,
  CAST(ROUND(rev, 2) AS DOUBLE) AS day_revenue,
  CAST(ROUND(SUM(rev) OVER w, 2) AS DOUBLE) AS revenue_7d,
  ROUND(CAST(SUM(rev) OVER w AS DOUBLE) / COUNT(*) OVER w, 2) AS avg_7d
FROM daily
WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
ORDER BY day
"""


# --- q46: customer spend deciles (ntile) -------------------------------------


def q46_customer_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers bucketed into spend deciles (ntile over an exact decimal
    total with a unique custkey tiebreak), then per-decile stats."""
    t = load_tables(spark, sf_dir)
    spend = (
        t["orders"]
        .groupBy("o_custkey")
        .agg(F.sum(_dec("o_totalprice")).alias("spend"))
    )
    w = Window.orderBy("spend", "o_custkey")
    return (
        spend.withColumn("decile", F.ntile(10).over(w))
        .groupBy("decile")
        .agg(
            F.count("*").alias("n_customers"),
            _dbl(F.round(F.min("spend"), 2)).alias("min_spend"),
            _dbl(F.round(F.max("spend"), 2)).alias("max_spend"),
            _dbl(F.round(F.sum("spend"), 2)).alias("sum_spend"),
        )
        .orderBy("decile")
    )


Q46_SQL = """
WITH spend AS (
  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
  FROM orders GROUP BY o_custkey
),
d AS (SELECT *, NTILE(10) OVER (ORDER BY spend, o_custkey) AS decile FROM spend)
SELECT decile, COUNT(*) AS n_customers,
  CAST(ROUND(MIN(spend), 2) AS DOUBLE) AS min_spend,
  CAST(ROUND(MAX(spend), 2) AS DOUBLE) AS max_spend,
  CAST(ROUND(SUM(spend), 2) AS DOUBLE) AS sum_spend
FROM d GROUP BY decile ORDER BY decile
"""


# --- q47: grouping sets with grouping() ---------------------------------------


def q47_status_priority_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed grouping sets (by status, by priority, grand total) with
    grouping() flags — one shuffle computes all three group-bys (Catalyst
    expands then partial-aggregates; at scale this replaces three scans)."""
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .groupingSets(
            [["o_orderstatus"], ["o_orderpriority"], []],
            "o_orderstatus", "o_orderpriority",
        )
        .agg(
            F.grouping("o_orderstatus").alias("g_status"),
            F.grouping("o_orderpriority").alias("g_priority"),
            F.count("*").alias("n_orders"),
            _dbl(F.round(F.sum(_dec("o_totalprice")), 2)).alias("total"),
        )
        .orderBy("g_status", "g_priority", "o_orderstatus", "o_orderpriority")
    )


Q47_SQL = """
SELECT o_orderstatus, o_orderpriority,
  GROUPING(o_orderstatus) AS g_status,
  GROUPING(o_orderpriority) AS g_priority,
  COUNT(*) AS n_orders,
  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
ORDER BY g_status, g_priority, o_orderstatus, o_orderpriority
"""


# --- q48: calendar rollup (ISO day-of-week) ----------------------------------


def q48_dow_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by ISO day-of-week. Calendar conventions differ per engine
    (Spark dayofweek is 1=Sunday, DuckDB's is 0=Sunday) — the portable
    formulation is ISO (1=Monday) plus the locale-stable 'Mon' label."""
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .groupBy(
            (F.weekday("o_orderdate") + F.lit(1)).alias("isodow"),
            F.date_format("o_orderdate", "E").alias("dow"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            _dbl(F.round(F.sum(_dec("o_totalprice")), 2)).alias("total"),
        )
        .orderBy("isodow")
    )


Q48_SQL = """
SELECT isodow(o_orderdate) AS isodow, strftime(o_orderdate, '%a') AS dow,
       COUNT(*) AS n_orders,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total
FROM orders GROUP BY 1, 2 ORDER BY isodow
"""


# --- q49: JSON path extraction ------------------------------------------------


def q49_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type stats over a JSON property column via JSON-path
    extraction (get_json_object — JVM-side, no UDF), the schema-on-read
    companion to q17's regex form."""
    t = load_tables(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        t["events"]
        .select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


Q49_SQL = """
SELECT event_type,
       COUNT(k) AS n_with_k, CAST(SUM(k) AS BIGINT) AS sum_k, MAX(k) AS max_k
FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
GROUP BY event_type ORDER BY event_type
"""


# --- q50: blocked fuzzy (levenshtein) pairs ----------------------------------


def q50_fuzzy_prefix_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked edit-distance join: same-language, same-length-band documents
    whose 40-char prefixes are within 8 edits.

    Registered CAPPED (``max_block=500``): the (lang x length-band) key has
    a fixed 30-key domain, so per-block cardinality densifies linearly with
    the corpus and within-block pairs grow quadratically (measured 13.5x
    wall at x10 data when uncapped — SCALE_SWEEP_r06). Blocks over the cap
    are dropped whole, identically in the DuckDB oracle, so the contract
    stays exact; at sf0.01 (max block 54) and sf0.1 (max block 451) the cap
    is above every block and output is bit-identical to the uncapped form.
    """
    t = load_tables(spark, sf_dir)
    block = F.concat_ws("|", F.col("lang"), (F.col("n_chars") / 100).cast("long"))
    return blocked_levenshtein_pairs(
        t["documents"], "doc_id", "text", block,
        prefix_len=40, max_dist=8, max_block=500,
    )


Q50_SQL = """
WITH keyed AS (
  SELECT doc_id, lang || '|' || CAST(n_chars // 100 AS VARCHAR) AS blk,
         substr(text, 1, 40) AS pfx
  FROM documents
),
capped AS (
  SELECT doc_id, blk, pfx
  FROM (SELECT keyed.*, COUNT(*) OVER (PARTITION BY blk) AS bsz FROM keyed)
  WHERE bsz <= 500
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, levenshtein(a.pfx, b.pfx) AS lev
FROM capped a JOIN capped b ON a.blk = b.blk AND a.doc_id < b.doc_id
WHERE levenshtein(a.pfx, b.pfx) <= 8
ORDER BY id_a, id_b
"""


# --- q51: top-k per group (window rank after join+agg) -----------------------


def q51_top_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top 3 parts by revenue within each brand: broadcast dim join ->
    partial-agg'd revenue per (brand, part) -> per-brand window rank with a
    unique tiebreak. The window shuffles the already-aggregated table (one
    row per part), never the fact table."""
    t = load_tables(spark, sf_dir)
    one = F.lit(1).cast("decimal(8,4)")
    rev = (
        t["lineitem"]
        .join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_partkey")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (one - F.col("l_discount").cast("decimal(18,4)"))
            ).alias("rev")
        )
    )
    w = Window.partitionBy("p_brand").orderBy(F.desc("rev"), F.asc("p_partkey"))
    return (
        rev.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "p_brand", "p_partkey",
            _dbl(F.round("rev", 2)).alias("revenue"), "rnk",
        )
        .orderBy("p_brand", "rnk")
    )


Q51_SQL = """
WITH rev AS (
  SELECT p_brand, p_partkey,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS rev
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY p_brand, p_partkey
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY rev DESC, p_partkey ASC) AS rnk
  FROM rev
)
SELECT p_brand, p_partkey, CAST(ROUND(rev, 2) AS DOUBLE) AS revenue, rnk
FROM ranked WHERE rnk <= 3 ORDER BY p_brand, rnk
"""


# --- q52: lead/lag gap analysis ----------------------------------------------


def q52_event_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event gaps per user (lag over a unique (ts, event_id) order),
    aggregated per event type. Integer millisecond arithmetic end-to-end."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        t["events"]
        .withColumn("prev_ms", F.lag(epoch_ms("ts")).over(w))
        .withColumn("gap_ms", epoch_ms("ts") - F.col("prev_ms"))
        .filter(F.col("gap_ms").isNotNull())
    )
    return (
        gaps.groupBy("event_type")
        .agg(
            F.count("*").alias("n_gaps"),
            F.round(F.sum("gap_ms") / F.count("*"), 1).alias("avg_gap_ms"),
            F.max("gap_ms").alias("max_gap_ms"),
        )
        .orderBy("event_type")
    )


Q52_SQL = """
WITH g AS (
  SELECT event_type,
         epoch_ms(ts) - LAG(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_ms
  FROM events
)
SELECT event_type, COUNT(*) AS n_gaps,
       ROUND(SUM(gap_ms) / COUNT(*), 1) AS avg_gap_ms,
       MAX(gap_ms) AS max_gap_ms
FROM g WHERE gap_ms IS NOT NULL
GROUP BY event_type ORDER BY event_type
"""


# --- q53: unpivot (wide -> long) ---------------------------------------------

_UNPIVOT_METRICS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def q53_lineitem_unpivot_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide->long unpivot of the lineitem measures, then per-metric totals.
    ``unpivot`` is a zero-shuffle projection (each input row emits k rows);
    the only shuffle is the final 4-group aggregate."""
    t = load_tables(spark, sf_dir)
    casted = t["lineitem"].select(
        *[F.col(c).cast("decimal(18,4)").alias(c) for c in _UNPIVOT_METRICS]
    )
    return (
        casted.unpivot([], _UNPIVOT_METRICS, "metric", "val")
        .groupBy("metric")
        .agg(
            F.count("*").alias("n"),
            _dbl(F.round(F.sum("val"), 2)).alias("total"),
        )
        .orderBy("metric")
    )


Q53_SQL = f"""
WITH long AS (
  {" UNION ALL ".join(
    f"SELECT '{c}' AS metric, CAST({c} AS DECIMAL(18,4)) AS val FROM lineitem"
    for c in _UNPIVOT_METRICS
  )}
)
SELECT metric, COUNT(*) AS n, CAST(ROUND(SUM(val), 2) AS DOUBLE) AS total
FROM long GROUP BY metric ORDER BY metric
"""


# --- q54: multimodal frame sampling ------------------------------------------

_FRAME_LEN, _FRAME_STRIDE = 64, 32


def q54_frame_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing end to end: payloads -> 1->N Arrow-batched
    frame extraction -> per-frame md5 + per-doc frame stats. The corpus is
    ASCII, so the byte-slicing oracle is expressible as SQL substr."""
    from hadoop_jobanalyzer_spark.operators.multimodal import attach_payload, frame_sample

    t = load_tables(spark, sf_dir)
    # sort BEFORE the pandas stage: an orderBy after mapInPandas makes the
    # range partitioner's sampling pass execute the Python stage twice.
    # Row order is not part of the result contract (the driver's compare
    # sorts rows), so no output sort is needed.
    frames = frame_sample(
        attach_payload(t["documents"], "doc_id", "text").sortWithinPartitions("doc_id"),
        frame_len=_FRAME_LEN, stride=_FRAME_STRIDE,
    )
    return frames.select("doc_id", "frame_idx", F.md5("frame").alias("frame_md5"))


Q54_SQL = f"""
WITH offs AS (
  SELECT doc_id, text, UNNEST(generate_series(0, strlen(text) - 1, {_FRAME_STRIDE})) AS off
  FROM documents
)
SELECT doc_id, off // {_FRAME_STRIDE} AS frame_idx,
       md5(substr(text, off + 1, {_FRAME_LEN})) AS frame_md5
FROM offs ORDER BY doc_id, frame_idx
"""


def q70_frame_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document frame dedup: the multimodal analog of exact text
    dedup — hash every sampled frame, keep hashes seen in more than one
    document. One groupBy over the frame stream (map-side partial); at
    video scale this is how repeated intros/stock footage are found."""
    from hadoop_jobanalyzer_spark.operators.multimodal import attach_payload, frame_sample

    frames = frame_sample(
        attach_payload(load_tables(spark, sf_dir)["documents"], "doc_id", "text")
        .sortWithinPartitions("doc_id"),
        frame_len=_FRAME_LEN, stride=_FRAME_STRIDE,
    )
    return (
        frames.select("doc_id", F.md5("frame").alias("frame_md5"))
        .groupBy("frame_md5")
        .agg(
            F.count("*").alias("n_frames"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
        )
        .filter(F.col("n_docs") > 1)
        .orderBy("frame_md5")
    )


Q70_SQL = f"""
WITH offs AS (
  SELECT doc_id, text, UNNEST(generate_series(0, strlen(text) - 1, {_FRAME_STRIDE})) AS off
  FROM documents
)
SELECT md5(substr(text, off + 1, {_FRAME_LEN})) AS frame_md5,
       COUNT(*) AS n_frames,
       COUNT(DISTINCT doc_id) AS n_docs,
       MIN(doc_id) AS first_doc
FROM offs
GROUP BY 1 HAVING COUNT(DISTINCT doc_id) > 1
ORDER BY frame_md5
"""


_CLEAN_MIN_TOKENS, _CLEAN_MAX_TOKENS = 30, 1000
_CLEAN_SAMPLE_PCT = 80  # deterministic hash-mod keep rate, percent


def q71_clean_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end training-data cleaning funnel as ONE composed plan:

        quality gate (token-count band)
          -> exact dedup keeper (min doc_id per md5)
          -> near-dup cluster keeper (doc_id == CC component label)
          -> deterministic hash-mod sample

    Output is the funnel: one row of per-stage survivor counts — the
    number every data-curation run reports. Each stage is the operator
    already verified on its own (q24/q20/q40/q43 lineage); this query
    checks that the composition stays one coherent, shuffle-sane plan.
    """
    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    w = tokens("text")

    # per-doc stage flags in ONE frame -> one lazy aggregation (five
    # driver-side counts would re-execute the shared lineage five times)
    q_flag = token_count(w).between(_CLEAN_MIN_TOKENS, _CLEAN_MAX_TOKENS)
    flags = docs.select("doc_id", F.md5("text").alias("_h"), q_flag.alias("_q"))
    exact_w = Window.partitionBy("_h")
    flags = flags.withColumn(
        "_e",
        F.col("_q")
        & (F.col("doc_id") == F.min(F.when(F.col("_q"), F.col("doc_id"))).over(exact_w)),
    )

    from hadoop_jobanalyzer_spark.plans.pipeline_queries import corpus_dedup

    _, cc = corpus_dedup(spark, sf_dir)
    keepers = cc.filter(F.col("id") == F.col("component")).select(
        F.col("id").alias("doc_id"), F.lit(True).alias("_k")
    )
    flags = flags.join(keepers, "doc_id", "left").withColumn(
        "_nd", F.col("_e") & F.coalesce(F.col("_k"), F.lit(False))
    )
    flags = flags.withColumn(
        "_s", F.col("_nd") & (hash_bucket(F.col("doc_id")) < _CLEAN_SAMPLE_PCT)
    )

    cnt = lambda c: F.count(F.when(F.col(c), 1))  # noqa: E731
    return flags.agg(
        F.count("*").alias("n_total"),
        cnt("_q").alias("n_quality"),
        cnt("_e").alias("n_exact"),
        cnt("_nd").alias("n_neardup"),
        cnt("_s").alias("n_sampled"),
    )


def _q71_sql() -> str:
    return f"""
WITH RECURSIVE {near_dup_ctes()},
edges AS (
  SELECT id_a AS s, id_b AS d FROM verified
  UNION
  SELECT id_b AS s, id_a AS d FROM verified
),
reach(n, mm) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT r.n, e.d FROM reach r JOIN edges e ON e.s = r.mm
),
comp AS (SELECT n AS doc_id, MIN(mm) AS component FROM reach GROUP BY n),
quality AS (
  SELECT doc_id, text FROM documents
  WHERE len({_WORDS}) BETWEEN {_CLEAN_MIN_TOKENS} AND {_CLEAN_MAX_TOKENS}
),
exact AS (
  SELECT doc_id FROM (
    SELECT doc_id, MIN(doc_id) OVER (PARTITION BY md5(text)) AS min_id
    FROM quality
  ) WHERE doc_id = min_id
),
neardup AS (
  SELECT e.doc_id FROM exact e JOIN comp c USING (doc_id)
  WHERE c.doc_id = c.component
),
sampled AS (
  SELECT doc_id FROM neardup
  WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100
        < {_CLEAN_SAMPLE_PCT}
)
SELECT (SELECT COUNT(*) FROM documents) AS n_total,
       (SELECT COUNT(*) FROM quality) AS n_quality,
       (SELECT COUNT(*) FROM exact) AS n_exact,
       (SELECT COUNT(*) FROM neardup) AS n_neardup,
       (SELECT COUNT(*) FROM sampled) AS n_sampled
"""


def q72_source_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation dashboard view: per (source, lang), corpus volume and mean
    quality signals. One scan, one partial-aggregating groupBy."""
    t = load_tables(spark, sf_dir)
    w = tokens("text")
    per_doc = t["documents"].select(
        "source",
        "lang",
        token_count(w).alias("_n"),
        (F.size(F.array_distinct(w)) / F.size(w)).alias("_ttr"),
    )
    return (
        per_doc.groupBy("source", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("_n"), 2).alias("avg_tokens"),
            F.round(F.avg("_ttr"), 4).alias("avg_ttr"),
        )
        .orderBy("source", "lang")
    )


Q72_SQL = f"""
WITH per_doc AS (
  SELECT source, lang, len({_WORDS}) AS n,
         len(list_distinct({_WORDS}))::DOUBLE / len({_WORDS}) AS ttr
  FROM documents
)
SELECT source, lang, COUNT(*) AS n_docs,
       ROUND(AVG(n), 2) AS avg_tokens, ROUND(AVG(ttr), 4) AS avg_ttr
FROM per_doc GROUP BY source, lang ORDER BY source, lang
"""


def q73_bpe_pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The distributed core of BPE merge learning (operators/bpe.py): the
    top-8 weighted adjacent symbol pairs of the initial character
    vocabulary. Row 1 IS the first BPE merge (same argmax + lexicographic
    tie-break as ``learn_bpe``), so the driver oracle pins the corpus-sized
    pass of the trainer exactly; the bounded driver-side merge *loop* stays
    library-side, differential-tested against an independent pure-Python
    classic-BPE implementation in tests/test_bpe.py (example-based +
    property-based).

    Scale shape: one corpus pass (word counts), then all pair work runs
    over the Zipf-bounded vocabulary — pairs are built in-row (zip_with of
    two slices) and exploded once, weighted by the word count.
    """
    from hadoop_jobanalyzer_spark.operators.bpe import EOW

    t = load_tables(spark, sf_dir)
    vocab = (
        t["documents"]
        .select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("n"))
    )
    s = F.concat(F.split("w", ""), F.array(F.lit(EOW)))
    pair = F.zip_with(
        F.slice(s, 1, F.size(s) - 1),
        F.slice(s, 2, F.size(s) - 1),
        lambda l, r: F.struct(l.alias("lsym"), r.alias("rsym")),
    )
    return (
        vocab.select("n", F.explode(pair).alias("p"))
        .groupBy(F.col("p.lsym").alias("lsym"), F.col("p.rsym").alias("rsym"))
        .agg(F.sum("n").alias("weighted_count"))
        .orderBy(F.desc("weighted_count"), "lsym", "rsym")
        .limit(8)
    )


Q73_SQL = """
WITH v AS (
  SELECT w, COUNT(*) AS n
  FROM (SELECT UNNEST(string_split(text, ' ')) AS w FROM documents)
  WHERE w <> '' GROUP BY w
),
syms AS (
  SELECT n, list_append(string_split_regex(w, ''), '</w>') AS s FROM v
),
pairs AS (
  SELECT s[i] AS lsym, s[i + 1] AS rsym, n
  FROM syms, UNNEST(generate_series(1, len(s) - 1)) AS t(i)
)
SELECT lsym, rsym, CAST(SUM(n) AS BIGINT) AS weighted_count
FROM pairs GROUP BY lsym, rsym
ORDER BY weighted_count DESC, lsym, rsym LIMIT 8
"""


# --- q55: document chunking (training-context windows) -----------------------

_CHUNK_LEN, _CHUNK_STRIDE = 32, 24  # tokens; stride < len -> 8-token overlap


def q55_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split documents into overlapping fixed-token chunks (the training
    pretokenization shape). Chunk starts are a ``sequence`` per doc and the
    slices stay in-row until one explode — all codegen, no UDF; output rows
    carry (doc, chunk_idx, n_tokens, md5) so the hash is checkable."""
    t = load_tables(spark, sf_dir)
    w = tokens("text")
    starts = F.sequence(F.lit(0), F.greatest(F.size(w) - 1, F.lit(0)), F.lit(_CHUNK_STRIDE))
    chunks = (
        spread(t["documents"])
        .select("doc_id", w.alias("_w"), F.explode(starts).alias("_start"))
        .select(
            "doc_id",
            (F.col("_start") / _CHUNK_STRIDE).cast("long").alias("chunk_idx"),
            F.slice("_w", F.col("_start") + 1, _CHUNK_LEN).alias("_chunk"),
        )
    )
    return chunks.select(
        "doc_id",
        "chunk_idx",
        F.size("_chunk").alias("n_tokens"),
        F.md5(F.concat_ws(" ", "_chunk")).alias("chunk_md5"),
    ).orderBy("doc_id", "chunk_idx")


Q55_SQL = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
starts AS (
  SELECT doc_id, toks, UNNEST(generate_series(0, GREATEST(len(toks) - 1, 0), {_CHUNK_STRIDE})) AS s
  FROM w
)
SELECT doc_id, s // {_CHUNK_STRIDE} AS chunk_idx,
       len(toks[s + 1 : s + {_CHUNK_LEN}]) AS n_tokens,
       md5(array_to_string(toks[s + 1 : s + {_CHUNK_LEN}], ' ')) AS chunk_md5
FROM starts ORDER BY doc_id, chunk_idx
"""


# --- q56: greedy token packing into fixed budgets ----------------------------

_PACK_BUDGET, _N_SHARDS = 2048, 8


def q56_token_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign documents to fixed-token-budget training packs: shard by a
    deterministic key, then pack_id = floor(cumulative tokens / budget)
    within each shard (running-sum window). Sharding keeps the window
    parallel — the single-partition global-order window is exactly what
    this avoids at corpus scale."""
    t = load_tables(spark, sf_dir)
    n_tok = F.size(tokens("text"))
    shard = (F.col("doc_id") % _N_SHARDS).alias("shard")
    w = Window.partitionBy("shard").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        t["documents"]
        .select("doc_id", shard, n_tok.alias("n_tokens"))
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .withColumn("pack_id", ((F.col("cum_tokens") - 1) / _PACK_BUDGET).cast("long"))
        .orderBy("doc_id")
    )


Q56_SQL = f"""
WITH d AS (
  SELECT doc_id, doc_id % {_N_SHARDS} AS shard, len(string_split(text, ' ')) AS n_tokens
  FROM documents
)
SELECT doc_id, shard, n_tokens,
       CAST(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens,
       CAST((SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1) // {_PACK_BUDGET} AS BIGINT) AS pack_id
FROM d ORDER BY doc_id
"""


# --- q57: SQL front door (scalar + IN subqueries) ----------------------------

_Q57 = """
SELECT c_custkey, c_mktsegment,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS spend
FROM customer JOIN orders ON o_custkey = c_custkey
WHERE c_nationkey IN (SELECT n_nationkey FROM nation
                      WHERE n_regionkey = (SELECT MIN(r_regionkey) FROM region))
GROUP BY c_custkey, c_mktsegment
HAVING SUM(CAST(o_totalprice AS DECIMAL(18,2))) >
       (SELECT AVG(CAST(o_totalprice AS DECIMAL(18,2))) FROM orders) * 5
ORDER BY c_custkey
"""


def q57_big_spenders_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL front door: every table is registered as a temp view, so the
    engine's surface includes full Spark SQL — scalar subqueries, IN
    subqueries, HAVING. Catalyst rewrites the IN to a semi join and the
    scalars to broadcast one-row joins (same physical shapes as the
    DataFrame API; the plan guard suite applies)."""
    load_tables(spark, sf_dir)
    return spark.sql(_Q57)


# --- q58: distribution windows (percent_rank / cume_dist) --------------------


def q58_spend_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank and cume_dist over customer spend (unique-key order;
    the ratios are exact small-integer divisions, identical per engine)."""
    t = load_tables(spark, sf_dir)
    spend = (
        t["orders"].groupBy("o_custkey").agg(F.sum(_dec("o_totalprice")).alias("spend"))
    )
    w = Window.orderBy("spend", "o_custkey")
    return (
        spend.select(
            "o_custkey",
            _dbl(F.round("spend", 2)).alias("spend"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
        )
        .orderBy("o_custkey")
    )


Q58_SQL = """
WITH spend AS (
  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
  FROM orders GROUP BY o_custkey
)
SELECT o_custkey, CAST(ROUND(spend, 2) AS DOUBLE) AS spend,
       ROUND(PERCENT_RANK() OVER (ORDER BY spend, o_custkey), 6) AS pct_rank,
       ROUND(CUME_DIST() OVER (ORDER BY spend, o_custkey), 6) AS cume
FROM spend ORDER BY o_custkey
"""


# --- q59: array aggregation ---------------------------------------------------


def q59_user_event_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user profile via array aggregation: the sorted distinct event
    types as one string (portable form of collect_set), plus counts."""
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy("user_id")
        .agg(
            F.array_join(F.array_sort(F.collect_set("event_type")), ",").alias("types"),
            F.countDistinct("event_type").alias("n_types"),
            F.count("*").alias("n_events"),
        )
        .orderBy("user_id")
    )


Q59_SQL = """
SELECT user_id,
       array_to_string(list_sort(list_distinct(list(event_type))), ',') AS types,
       COUNT(DISTINCT event_type) AS n_types,
       COUNT(*) AS n_events
FROM events GROUP BY user_id ORDER BY user_id
"""


# --- q67: source-balanced deterministic downsampling -------------------------


_BAL_MOD = 10_000  # rate resolution for the hash-mod keep decision


def q67_source_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixing: downsample every ``source`` to the smallest source's
    volume with deterministic hash-mod membership — re-runs (and the DuckDB
    oracle) keep exactly the same documents, and growing one source never
    reshuffles another's sample.

    Per-source counts are a partial agg; the min is a window over that tiny
    aggregate (no second scan); rates join back broadcast. The corpus scan
    itself stays single-pass + codegen.
    """
    t = load_tables(spark, sf_dir)
    counts = t["documents"].groupBy("source").agg(F.count("*").alias("n_docs"))
    w = Window.partitionBy()
    rates = counts.select(
        "source",
        "n_docs",
        F.floor(F.lit(_BAL_MOD) * F.min("n_docs").over(w) / F.col("n_docs")).alias(
            "_rate"
        ),
    )
    kept = (
        t["documents"]
        .join(F.broadcast(rates), "source")
        .filter(hash_bucket(F.col("doc_id"), _BAL_MOD) < F.col("_rate"))
    )
    return (
        kept.groupBy("source", "n_docs")
        .agg(F.count("*").alias("n_kept"))
        .select(
            "source",
            "n_docs",
            "n_kept",
            F.round(F.col("n_kept") / F.col("n_docs"), 4).alias("kept_frac"),
        )
        .orderBy("source")
    )


Q67_SQL = f"""
WITH counts AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
rates AS (
  SELECT source, n_docs,
         CAST(FLOOR({_BAL_MOD} * (MIN(n_docs) OVER ()) / n_docs) AS BIGINT) AS rate
  FROM counts
),
kept AS (
  SELECT d.source, r.n_docs
  FROM documents d JOIN rates r USING (source)
  WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT % {_BAL_MOD} < r.rate
)
SELECT source, n_docs, COUNT(*) AS n_kept,
       ROUND(COUNT(*)::DOUBLE / n_docs, 4) AS kept_frac
FROM kept GROUP BY source, n_docs ORDER BY source
"""


# --- q68: end-to-end dedup summary -------------------------------------------


def q68_dedup_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The number that matters after dedup: corpus size before/after keeping
    one document per near-dup cluster (cluster keeper = min doc_id), and
    the largest cluster as the skew indicator. Labels come from the
    session's materialized dedup subtree (pipeline_queries.corpus_dedup)."""
    from hadoop_jobanalyzer_spark.plans.pipeline_queries import corpus_dedup

    _, cc = corpus_dedup(spark, sf_dir)
    # aggregate component sizes, then reduce — no window (a window over
    # component would add a sort for what is just a two-level groupBy)
    comp_sizes = cc.groupBy("component").agg(F.count("*").alias("_n"))
    return comp_sizes.agg(
        F.sum("_n").alias("n_docs"),
        F.count("*").alias("n_kept"),
        (F.sum("_n") - F.count("*")).alias("n_dropped"),
        F.max("_n").alias("max_cluster"),
    )


Q68_SQL = f"""
WITH RECURSIVE {near_dup_ctes()},
edges AS (
  SELECT id_a AS s, id_b AS d FROM verified
  UNION
  SELECT id_b AS s, id_a AS d FROM verified
),
reach(n, m) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT r.n, e.d FROM reach r JOIN edges e ON e.s = r.m
),
comp AS (SELECT n AS doc_id, MIN(m) AS component FROM reach GROUP BY n),
csz AS (SELECT component, COUNT(*) AS n FROM comp GROUP BY component)
SELECT CAST(SUM(n) AS BIGINT) AS n_docs,
       COUNT(*) AS n_kept,
       CAST(SUM(n) - COUNT(*) AS BIGINT) AS n_dropped,
       MAX(n) AS max_cluster
FROM csz
"""


def q76_zorder_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout profile for orders clustered on (custkey, price):
    each 8-bit Morton bucket's row count and per-dimension envelope. The
    envelopes are what parquet footer pruning sees after
    ``cluster_by_zorder`` — tight on BOTH dimensions at once (the
    data-skipping property; file-level assertion in tests/test_zorder.py).
    Money quantizes via exact integer cents, and the bucket profile is
    integer-only, so the oracle hashes exactly."""
    from hadoop_jobanalyzer_spark.operators.zorder import zorder_key

    orders = load_tables(spark, sf_dir)["orders"].select(
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    keyed = zorder_key(orders, ["o_custkey", "cents"], bits=8)
    return (
        keyed.groupBy(F.shiftright("_zvalue", 8).alias("z_bucket"))
        .agg(
            F.count("*").alias("n"),
            F.min("o_custkey").alias("min_custkey"),
            F.max("o_custkey").alias("max_custkey"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
        )
        .orderBy("z_bucket")
    )


def _q76_sql() -> str:
    interleave = " + ".join(
        f"(((q{i + 1} >> {k}) & 1) << {k * 2 + i})"
        for i in range(2)
        for k in range(8)
    )
    return f"""
WITH t AS (SELECT o_custkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
s AS (SELECT MIN(o_custkey) AS lo1, MAX(o_custkey) AS hi1,
             MIN(cents) AS lo2, MAX(cents) AS hi2 FROM t),
q AS (SELECT o_custkey, cents,
       LEAST(CAST(FLOOR(((o_custkey - lo1) * 256) / (hi1 - lo1 + 1)) AS BIGINT), 255) AS q1,
       LEAST(CAST(FLOOR(((cents - lo2) * 256) / (hi2 - lo2 + 1)) AS BIGINT), 255) AS q2
      FROM t, s),
z AS (SELECT o_custkey, cents, {interleave} AS zvalue FROM q)
SELECT zvalue >> 8 AS z_bucket, COUNT(*) AS n,
       MIN(o_custkey) AS min_custkey, MAX(o_custkey) AS max_custkey,
       MIN(cents) AS min_cents, MAX(cents) AS max_cents
FROM z GROUP BY 1 ORDER BY 1
"""


def q77_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view -> click -> purchase: users counted
    at stage k only if each event happened at-or-after the previous
    stage's first event. Three partial-aggregating groupBys joined on the
    (small) surviving user sets — AQE broadcasts each step."""
    e = load_tables(spark, sf_dir)["events"]
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") >= F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") >= F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )

    def stage(df: DataFrame, label: str) -> DataFrame:
        return df.agg(F.count("*").alias("n_users")).select(
            F.lit(label).alias("stage"), "n_users"
        )

    return (
        stage(v, "1_view")
        .unionByName(stage(c, "2_view_click"))
        .unionByName(stage(p, "3_view_click_purchase"))
        .orderBy("stage")
    )


Q77_SQL = """
WITH v AS (SELECT user_id, MIN(ts) AS tv FROM events WHERE event_type = 'view' GROUP BY 1),
c AS (SELECT e.user_id, MIN(e.ts) AS tc FROM events e
      JOIN v ON e.user_id = v.user_id AND e.ts >= v.tv
      WHERE e.event_type = 'click' GROUP BY 1),
p AS (SELECT e.user_id, MIN(e.ts) AS tp FROM events e
      JOIN c ON e.user_id = c.user_id AND e.ts >= c.tc
      WHERE e.event_type = 'purchase' GROUP BY 1)
SELECT '1_view' AS stage, COUNT(*) AS n_users FROM v
UNION ALL SELECT '2_view_click', COUNT(*) FROM c
UNION ALL SELECT '3_view_click_purchase', COUNT(*) FROM p
ORDER BY stage
"""


def q78_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted Bernoulli sample of documents, weight =
    n_chars, expected 200 rows (operators/sampling.weighted_sample) — the
    corpus-mixing primitive. No ln/pow anywhere, so the md5-uniform and
    the inclusion threshold reproduce bit-exactly in any IEEE engine."""
    docs = load_tables(spark, sf_dir)["documents"]
    return (
        weighted_sample(docs, F.col("doc_id"), F.col("n_chars"), expected_rows=200)
        .select("doc_id", "n_chars", F.round("_p", 6).alias("p"))
        .orderBy("doc_id")
    )


Q78_SQL = """
WITH w AS (SELECT doc_id, n_chars, CAST(n_chars AS DOUBLE) AS wt FROM documents),
t AS (SELECT SUM(wt) AS total FROM w),
s AS (SELECT doc_id, n_chars,
             LEAST(200 * wt / total, 1.0) AS p,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0 AS u
      FROM w, t)
SELECT doc_id, n_chars, ROUND(p, 6) AS p FROM s WHERE u < p ORDER BY doc_id
"""


def q79_copurchase_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket pair mining over lineitem: top 20 co-ordered part
    pairs by support, with lift. The self-join is keyed on l_orderkey, so
    fan-out is bounded by order size (C(lines,2) per order — never a
    part x part product); per-part counts and the order total are partial
    aggregations, the total a 1-row broadcast.

    The distinct basket table feeds FOUR consumers (both self-join sides,
    per-part counts, the order total), so it is computed once: repartition
    by the join key first — HashPartitioning(l_orderkey) satisfies the
    dedup's (l_orderkey, l_partkey) clustering, so the distinct costs ONE
    shuffle — then a lazy materialize pins that layout, making the
    self-join exchange-free and the countDistinct(orderkey) map-side."""
    li = (
        load_tables(spark, sf_dir)["lineitem"]
        .select("l_orderkey", "l_partkey")
        .repartition("l_orderkey")
        .dropDuplicates(["l_orderkey", "l_partkey"])
        .transform(materialize)
    )
    # all three corpus-scaled joins pinned shuffle-hash (q235 class, r10
    # audit): the self-join rides the materialized table's copied
    # estimate (an unhinted plan broadcast one whole side at small SF,
    # silently defeating the exchange-free co-partitioned layout), and
    # the per-part count tables are part-scaled aggregates. The pins are
    # exchange-free here: both self-join sides keep the l_orderkey
    # partitioning, and the pc joins ride the pair aggregate's hashing.
    pairs = (
        li.alias("a")
        .join(
            li.alias("b").hint("shuffle_hash"),
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count("*").alias("n_ab"))
    )
    pc = li.groupBy("l_partkey").agg(F.count("*").alias("n"))
    total = li.select(F.countDistinct("l_orderkey").alias("n_orders"))
    return (
        pairs.join(pc.select(F.col("l_partkey").alias("part_a"), F.col("n").alias("n_a")).hint("shuffle_hash"), "part_a")
        .join(pc.select(F.col("l_partkey").alias("part_b"), F.col("n").alias("n_b")).hint("shuffle_hash"), "part_b")
        .join(F.broadcast(total))
        .select(
            "part_a",
            "part_b",
            "n_ab",
            "n_a",
            "n_b",
            F.round(
                (F.col("n_ab") * F.col("n_orders")) / (F.col("n_a") * F.col("n_b")), 4
            ).alias("lift"),
        )
        .orderBy(F.desc("n_ab"), "part_a", "part_b")
        .limit(20)
    )


Q79_SQL = """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS n_ab
          FROM li a JOIN li b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2),
pc AS (SELECT l_partkey, COUNT(*) AS n FROM li GROUP BY 1),
t AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM li)
SELECT part_a, part_b, n_ab, pa.n AS n_a, pb.n AS n_b,
       ROUND((n_ab * n_orders) / (pa.n * pb.n), 4) AS lift
FROM pairs
JOIN pc pa ON part_a = pa.l_partkey
JOIN pc pb ON part_b = pb.l_partkey, t
ORDER BY n_ab DESC, part_a, part_b
LIMIT 20
"""


_BM25_TERMS = ["dup", "key", "window"]  # rare + mid + common df at every sf


def q80_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword retrieval: top-10 documents for a 3-term query under
    rational-idf BM25 (operators/retrieval.py — no explode, one corpus
    scan, 1-row stats broadcast, TakeOrderedAndProject top-k)."""
    from hadoop_jobanalyzer_spark.operators.retrieval import bm25_topk

    docs = load_tables(spark, sf_dir)["documents"]
    return bm25_topk(docs, "doc_id", "text", _BM25_TERMS, k=10)


def _q80_sql() -> str:
    from hadoop_jobanalyzer_spark.operators.retrieval import bm25_sql

    return bm25_sql("documents", "doc_id", "text", _BM25_TERMS, k=10)


_BOILER_N = 3
_BOILER_MIN_DF = 5


def q81_boilerplate_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-boilerplate mass per document: fraction of each doc's
    3-gram occurrences whose 3-gram appears in >= 5 distinct docs (the
    Gopher/RefinedWeb duplicated-ngram quality filter). Broadcast-joined
    boilerplate set; shingles explode once, generator-only."""
    from hadoop_jobanalyzer_spark.operators.dedup import boilerplate_ngram_fraction

    docs = load_tables(spark, sf_dir)["documents"]
    return boilerplate_ngram_fraction(
        docs, "doc_id", "text", ngram=_BOILER_N, min_df=_BOILER_MIN_DF
    )


Q81_SQL = f"""
WITH words AS (SELECT doc_id, {_WORDS} AS w FROM documents),
sh AS (SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
       FROM words, UNNEST(generate_series(1, len(w) - 2)) AS t(i)),
boiler AS (SELECT s FROM sh GROUP BY s
           HAVING COUNT(DISTINCT doc_id) >= {_BOILER_MIN_DF}),
sizes AS (SELECT doc_id, COUNT(*) AS n_ngrams FROM sh GROUP BY 1),
hits AS (SELECT doc_id, COUNT(*) AS n_boiler FROM sh
         WHERE s IN (SELECT s FROM boiler) GROUP BY 1)
SELECT doc_id, n_ngrams,
       COALESCE(n_boiler, 0) AS n_boiler,
       ROUND(COALESCE(n_boiler, 0) / n_ngrams, 4) AS boiler_frac
FROM sizes LEFT JOIN hits USING (doc_id)
ORDER BY doc_id
"""


_PER_SOURCE_M = 20


def q82_bounded_source_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-m-per-source deterministic sample: rank docs inside each
    source by (md5(doc_id), doc_id) and keep the first 20. The fixed-size
    complement to q67's rate-based balancing — 'give me 10k docs from
    every source for eval' — reproducible across engines and appends of
    OTHER sources (a source's ranking depends only on its own members)."""
    docs = load_tables(spark, sf_dir)["documents"]
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.select("source", "doc_id", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= _PER_SOURCE_M)
        .orderBy("source", "rank")
    )


Q82_SQL = f"""
WITH ranked AS (
  SELECT source, doc_id,
         ROW_NUMBER() OVER (
           PARTITION BY source ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS rank
  FROM documents
)
SELECT source, doc_id, rank FROM ranked
WHERE rank <= {_PER_SOURCE_M}
ORDER BY source, rank
"""


def q83_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key diagnostic over events.user_id (operators/skew.
    key_skew_profile): top-10 heaviest keys with share and ratio-to-mean —
    the pre-flight report that decides salting vs AQE vs nothing."""
    from hadoop_jobanalyzer_spark.operators.skew import key_skew_profile

    ev = load_tables(spark, sf_dir)["events"]
    return key_skew_profile(ev, "user_id", top_n=10)


Q83_SQL = """
WITH counts AS (
  SELECT CAST(user_id AS VARCHAR) AS key_value, COUNT(*) AS n
  FROM events GROUP BY 1
),
totals AS (SELECT CAST(SUM(n) AS BIGINT) AS _total, COUNT(*) AS _n_keys FROM counts)
SELECT key_value, n,
       ROUND(n / _total, 6) AS share,
       ROUND(n * _n_keys / _total, 3) AS x_mean
FROM counts, totals
ORDER BY n DESC, key_value
LIMIT 10
"""


def q84_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source median quality gate: keep each source's top half of
    documents by lexical diversity (distinct-token count — an integer
    ranking key, so the cut is engine-exact with no float percentile).
    Keeps rank <= ceil(count/2) by (n_distinct desc, doc_id asc): the
    adaptive threshold form of quality filtering — each source is judged
    against its own distribution, not one global constant."""
    from hadoop_jobanalyzer_spark.functions.text import distinct_token_count

    docs = load_tables(spark, sf_dir)["documents"]
    scored = docs.select(
        "source", "doc_id", distinct_token_count(tokens("text")).alias("n_distinct")
    )
    w = Window.partitionBy("source").orderBy(F.desc("n_distinct"), "doc_id")
    cnt = Window.partitionBy("source")
    return (
        scored.select(
            "source",
            "doc_id",
            "n_distinct",
            F.row_number().over(w).alias("_rn"),
            F.count("*").over(cnt).alias("_cnt"),
        )
        .filter(F.col("_rn") <= (F.col("_cnt") + 1) / 2)
        .select("source", "doc_id", "n_distinct")
        .orderBy("source", "doc_id")
    )


Q84_SQL = f"""
WITH scored AS (
  SELECT source, doc_id, LEN(list_distinct({_WORDS})) AS n_distinct
  FROM documents
),
ranked AS (
  SELECT source, doc_id, n_distinct,
         ROW_NUMBER() OVER (
           PARTITION BY source ORDER BY n_distinct DESC, doc_id
         ) AS _rn,
         COUNT(*) OVER (PARTITION BY source) AS _cnt
  FROM scored
)
SELECT source, doc_id, n_distinct FROM ranked
WHERE _rn <= (_cnt + 1) / 2
ORDER BY source, doc_id
"""


_MANIFEST_SHARDS = 16


def q85_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard manifest (operators/shards.shard_manifest): assign
    every document to one of 16 shards by md5-mod of doc_id, then per-shard
    row count, payload bytes, and key range — the balance report a
    pipeline runs before materializing training shards. One tiny shuffle
    (16 groups, partial-aggregated)."""
    from hadoop_jobanalyzer_spark.operators.shards import shard_manifest

    docs = load_tables(spark, sf_dir)["documents"]
    return shard_manifest(docs, F.col("doc_id"), _MANIFEST_SHARDS, F.col("n_chars"))


Q85_SQL = f"""
WITH s AS (
  SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
           % {_MANIFEST_SHARDS} AS shard,
         doc_id, n_chars
  FROM documents
)
SELECT shard, COUNT(*) AS n_rows, CAST(SUM(n_chars) AS BIGINT) AS n_bytes,
       MIN(doc_id) AS min_key, MAX(doc_id) AS max_key
FROM s GROUP BY shard ORDER BY shard
"""


def q86_normalized_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization-based exact dedup (functions/text.normalize_text):
    lowercase / strip punctuation / collapse whitespace, then group on the
    canonical form — catches casing/punctuation/spacing variants that raw
    exact dedup (q20) misses. Per-doc keeper verdict (the q20 shape, on
    the canonical key): doc_id, canonical-form md5 + length, and
    is_keeper = "first doc_id in my group". Pure codegen normalization +
    one window over the md5 — the cheapest pass of a cleaning pipeline,
    run before MinHash."""
    from hadoop_jobanalyzer_spark.functions.text import normalize_text

    docs = load_tables(spark, sf_dir)["documents"]
    w = Window.partitionBy("norm_key")
    return (
        docs.select(
            "doc_id",
            F.md5(normalize_text("text")).alias("norm_key"),
            F.length(normalize_text("text")).alias("norm_len"),
        )
        .select(
            "doc_id",
            "norm_key",
            "norm_len",
            (F.col("doc_id") == F.min("doc_id").over(w)).alias("is_keeper"),
        )
        .orderBy("doc_id")
    )


Q86_SQL = """
WITH n AS (
  SELECT doc_id,
         trim(regexp_replace(
           regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
           ' +', ' ', 'g')) AS norm
  FROM documents
)
SELECT doc_id, md5(norm) AS norm_key, LEN(norm) AS norm_len,
       doc_id = MIN(doc_id) OVER (PARTITION BY md5(norm)) AS is_keeper
FROM n ORDER BY doc_id
"""


def q87_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: users grouped by their first-event week,
    counted distinct in each subsequent week offset — the activation/
    retention triangle. Cohort label is the Monday of the user's first
    event week (date_trunc 'week' — ISO Monday in both engines); offsets
    are integer floor(day-diff / 7), so the whole key is exact integer
    arithmetic. Two shuffles: min-per-user, then the cohort x offset
    distinct count."""
    ev = load_tables(spark, sf_dir)["events"].select(
        "user_id", F.col("ts").cast("date").alias("d")
    )
    firsts = ev.groupBy("user_id").agg(F.min("d").alias("first_d"))
    return (
        ev.join(firsts, "user_id")
        .select(
            F.date_format(F.date_trunc("week", "first_d"), "yyyy-MM-dd").alias(
                "cohort_week"
            ),
            F.floor(F.datediff("d", "first_d") / 7).alias("week_off"),
            "user_id",
        )
        .groupBy("cohort_week", "week_off")
        .agg(F.count_distinct("user_id").alias("n_users"))
        .orderBy("cohort_week", "week_off")
    )


Q87_SQL = """
WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
firsts AS (SELECT user_id, MIN(d) AS first_d FROM ev GROUP BY user_id)
SELECT strftime(date_trunc('week', first_d), '%Y-%m-%d') AS cohort_week,
       CAST(floor(date_diff('day', first_d, d) / 7.0) AS BIGINT) AS week_off,
       COUNT(DISTINCT ev.user_id) AS n_users
FROM ev JOIN firsts USING (user_id)
GROUP BY 1, 2 ORDER BY 1, 2
"""


_PMI_MIN_COUNT = 5
_PMI_TOP = 20


def q88_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top collocations by PMI over the corpus: adjacent word pairs scored
    by how much more often they co-occur than their unigram frequencies
    predict. Score is the PMI ratio ((c_xy * N_uni) * N_uni) /
    ((N_bi * c_x) * c_y) — log-free (rank-equivalent, and ln's libm
    rounding is engine-specific), left-associated double math so both
    engines round identically. Unigram counts join back to bigrams twice
    — pinned shuffle-hash: the vocabulary is Zipf-SMALL but not bounded
    (Heaps — it grows with the corpus), and both builds ride the
    explode's fanout-blind estimate (q235 class, r10 audit). Totals are
    a 1-row broadcast."""
    docs = load_tables(spark, sf_dir)["documents"]
    words = docs.select(tokens("text").alias("w"))
    uni = (
        words.select(F.explode("w").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
    )
    length = F.greatest(F.size("w") - 1, F.lit(0))
    bi = (
        words.select(
            F.explode(
                F.arrays_zip(
                    F.slice("w", 1, length).alias("w1"),
                    F.slice("w", 2, length).alias("w2"),
                )
            ).alias("p")
        )
        .groupBy(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .agg(F.count("*").alias("c_xy"))
        .filter(F.col("c_xy") >= _PMI_MIN_COUNT)
    )
    totals = uni.agg(F.sum("c").alias("n_uni")).crossJoin(
        words.select(F.sum(length).alias("n_bi"))
    )
    ux = uni.select(F.col("tok").alias("w1"), F.col("c").alias("c_x"))
    uy = uni.select(F.col("tok").alias("w2"), F.col("c").alias("c_y"))
    scored = (
        bi.join(ux.hint("shuffle_hash"), "w1")
        .join(uy.hint("shuffle_hash"), "w2")
        .join(F.broadcast(totals))
        .select(
            "w1",
            "w2",
            "c_xy",
            F.round(
                (F.col("c_xy").cast("double") * F.col("n_uni") * F.col("n_uni"))
                / (F.col("n_bi").cast("double") * F.col("c_x") * F.col("c_y")),
                6,
            ).alias("pmi_ratio"),
        )
    )
    return scored.orderBy(F.desc("pmi_ratio"), "w1", "w2").limit(_PMI_TOP)


Q88_SQL = f"""
WITH words AS (SELECT {_WORDS} AS w FROM documents),
uni AS (
  SELECT u.tok, COUNT(*) AS c
  FROM words, unnest(w) AS u(tok) GROUP BY u.tok
),
bi AS (
  SELECT w[i] AS w1, w[i+1] AS w2, COUNT(*) AS c_xy
  FROM words, unnest(range(1, len(w))) AS r(i)
  GROUP BY 1, 2 HAVING COUNT(*) >= {_PMI_MIN_COUNT}
),
totals AS (
  SELECT (SELECT CAST(SUM(c) AS BIGINT) FROM uni) AS n_uni,
         (SELECT CAST(SUM(greatest(len(w) - 1, 0)) AS BIGINT) FROM words) AS n_bi
)
SELECT w1, w2, c_xy,
       ROUND((CAST(c_xy AS DOUBLE) * n_uni * n_uni)
             / (CAST(n_bi AS DOUBLE) * ux.c * uy.c), 6) AS pmi_ratio
FROM bi
JOIN uni ux ON bi.w1 = ux.tok
JOIN uni uy ON bi.w2 = uy.tok
CROSS JOIN totals
ORDER BY pmi_ratio DESC, w1, w2 LIMIT {_PMI_TOP}
"""


def q89_embedding_norm_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding QA: histogram of L2 norms at 0.1 resolution, with
    per-bucket vector count and distinct labels — the sanity report before
    any cosine-similarity stage (unnormalized or degenerate embeddings
    poison ANN). The squared-norm fold runs left-to-right over the array
    in both engines (identical IEEE rounding), no shuffle until the
    16-ish-bucket groupBy."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    sq = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        emb.select(
            F.floor(F.sqrt(sq) * 10).alias("bucket"),
            "vec_id",
            "label",
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_vecs"),
            F.count_distinct("label").alias("n_labels"),
        )
        .select(
            (F.col("bucket") / 10.0).alias("norm_lo"),
            "n_vecs",
            "n_labels",
        )
        .orderBy("norm_lo")
    )


Q89_SQL = """
WITH n AS (
  SELECT vec_id, label,
         CAST(floor(sqrt(list_reduce(
           list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
           (acc, x) -> acc + x)) * 10) AS BIGINT) AS bucket
  FROM embeddings
)
SELECT bucket / 10.0 AS norm_lo, COUNT(*) AS n_vecs,
       COUNT(DISTINCT label) AS n_labels
FROM n GROUP BY bucket ORDER BY norm_lo
"""


EXTENDED_QUERIES = {
    "q40_dedup_clusters": (q40_dedup_clusters, _q40_sql()),
    "q41_vocabulary": (q41_vocabulary, Q41_SQL),
    "q42_doc_top_terms": (q42_doc_top_terms, Q42_SQL),
    "q43_split_counts": (q43_split_counts, Q43_SQL),
    "q44_daily_event_pivot": (q44_daily_event_pivot, Q44_SQL),
    "q45_moving_revenue": (q45_moving_revenue, Q45_SQL),
    "q46_customer_deciles": (q46_customer_deciles, Q46_SQL),
    "q47_status_priority_grouping_sets": (q47_status_priority_grouping_sets, Q47_SQL),
    "q48_dow_revenue": (q48_dow_revenue, Q48_SQL),
    "q49_json_props": (q49_json_props, Q49_SQL),
    "q50_fuzzy_prefix_pairs": (q50_fuzzy_prefix_pairs, Q50_SQL),
    "q51_top_parts_per_brand": (q51_top_parts_per_brand, Q51_SQL),
    "q52_event_gap_stats": (q52_event_gap_stats, Q52_SQL),
    "q53_lineitem_unpivot_stats": (q53_lineitem_unpivot_stats, Q53_SQL),
    "q54_frame_samples": (q54_frame_samples, Q54_SQL),
    "q55_doc_chunks": (q55_doc_chunks, Q55_SQL),
    "q56_token_packing": (q56_token_packing, Q56_SQL),
    "q57_big_spenders_sql": (q57_big_spenders_sql, _Q57),
    "q58_spend_distribution": (q58_spend_distribution, Q58_SQL),
    "q59_user_event_profiles": (q59_user_event_profiles, Q59_SQL),
    "q67_source_balance": (q67_source_balance, Q67_SQL),
    "q68_dedup_summary": (q68_dedup_summary, Q68_SQL),
    "q70_frame_dedup": (q70_frame_dedup, Q70_SQL),
    "q71_clean_pipeline": (q71_clean_pipeline, _q71_sql()),
    "q72_source_profile": (q72_source_profile, Q72_SQL),
    "q73_bpe_pair_stats": (q73_bpe_pair_stats, Q73_SQL),
    "q76_zorder_buckets": (q76_zorder_buckets, _q76_sql()),
    "q77_event_funnel": (q77_event_funnel, Q77_SQL),
    "q78_weighted_sample": (q78_weighted_sample, Q78_SQL),
    "q79_copurchase_lift": (q79_copurchase_lift, Q79_SQL),
    "q80_bm25_search": (q80_bm25_search, _q80_sql()),
    "q81_boilerplate_fraction": (q81_boilerplate_fraction, Q81_SQL),
    "q82_bounded_source_sample": (q82_bounded_source_sample, Q82_SQL),
    "q83_key_skew_profile": (q83_key_skew_profile, Q83_SQL),
    "q84_quality_gate": (q84_quality_gate, Q84_SQL),
    "q85_shard_manifest": (q85_shard_manifest, Q85_SQL),
    "q86_normalized_dedup": (q86_normalized_dedup, Q86_SQL),
    "q87_retention_cohorts": (q87_retention_cohorts, Q87_SQL),
    "q88_pmi_collocations": (q88_pmi_collocations, Q88_SQL),
    "q89_embedding_norm_histogram": (q89_embedding_norm_histogram, Q89_SQL),
}
