"""Analytics queries q90-q96: embedding quantization QA, a k-means step,
sparse tf-idf cosine pairs, the Lee-et-al duplicated-span audit, and three
relational additions (revenue share, inactive-rich anti-join, value
outliers).

Same contract as the other plan modules: each query is a (DataFrame
builder, DuckDB oracle SQL) pair; determinism rules are the repo-wide ones
— exact decimal money math, integer fixed-point for anything accumulated
across rows, single-chain double ops only at the very end (identical
parenthesization in both engines), unique-key tiebreaks on every ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hadoop_jobanalyzer_spark.plans.tables import load_tables


def _dec(col: str, scale: int = 2) -> F.Column:
    return F.col(col).cast(f"decimal(18,{scale})")


# --- q90: int8 scalar-quantization reconstruction error ----------------------

_SQ8_BUCKET = 8192


def q90_sq8_error_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reconstruction-error audit for int8 scalar quantization of the
    embedding corpus (operators/quantize.sq8_error_histogram): per-dim
    min/max reduce to one broadcast row, per-vector error is an integer
    in-row fold, only the ~dozen-bucket histogram shuffles."""
    from hadoop_jobanalyzer_spark.operators.quantize import sq8_error_histogram

    emb = load_tables(spark, sf_dir)["embeddings"]
    return sq8_error_histogram(emb, "vec_id", "embedding", _SQ8_BUCKET)


Q90_SQL = f"""
WITH ex AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
         CAST(ROUND(CAST(UNNEST(embedding) AS DOUBLE) * 2048) AS BIGINT) AS xi
  FROM embeddings
),
stats AS (SELECT dim, MIN(xi) AS mn, MAX(xi) AS mx FROM ex GROUP BY dim),
e AS (
  SELECT vec_id,
         CASE WHEN mx > mn THEN
           ABS((xi - mn) * 512
               - (2 * LEAST(255, ((xi - mn) * 256) // (mx - mn)) + 1) * (mx - mn))
         ELSE 0 END AS ierr
  FROM ex JOIN stats USING (dim)
),
v AS (SELECT vec_id, SUM(ierr) AS total FROM e GROUP BY vec_id)
SELECT total // {_SQ8_BUCKET} AS err_bucket, COUNT(*) AS n_vecs,
       CAST(SUM(total) AS BIGINT) AS sum_err_fixed
FROM v GROUP BY 1 ORDER BY 1
"""


# --- q91: one k-means (Lloyd) refinement step --------------------------------

_KMEANS_K = 8


def q91_kmeans_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Lloyd iteration over the embeddings (operators/quantize.
    kmeans_step): broadcast-centroid in-row argmin assignment (integer
    fixed-point distances), partial-aggregated per-(cell, dim) sums, exact
    integer centroid-movement numerators."""
    from hadoop_jobanalyzer_spark.operators.quantize import kmeans_step

    emb = load_tables(spark, sf_dir)["embeddings"]
    return kmeans_step(emb, "vec_id", "embedding", _KMEANS_K)


Q91_SQL = f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
  FROM embeddings
),
c AS (SELECT vec_id AS cid, qv AS cv FROM q WHERE vec_id < {_KMEANS_K}),
d AS (
  SELECT q.vec_id, c.cid,
         list_sum(list_transform(generate_series(1, len(qv)),
                                 i -> (qv[i] - cv[i]) * (qv[i] - cv[i]))) AS dist
  FROM q CROSS JOIN c
),
a AS (
  SELECT vec_id, cid,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
  FROM d
),
ex AS (
  SELECT a.cid AS cell, generate_subscripts(q.qv, 1) AS dim, UNNEST(q.qv) AS xi
  FROM q JOIN (SELECT vec_id, cid FROM a WHERE rn = 1) a USING (vec_id)
),
sums AS (SELECT cell, dim, SUM(xi) AS s, COUNT(*) AS n FROM ex GROUP BY cell, dim),
cd AS (SELECT cid AS cell, generate_subscripts(cv, 1) AS dim, UNNEST(cv) AS ci FROM c)
SELECT cell, MAX(n) AS n_assigned,
       CAST(SUM(ABS(s - ci * n)) AS BIGINT) AS l1_move_num,
       ROUND(CAST(SUM(ABS(s - ci * n)) AS DOUBLE) / (MAX(n) * 1000) / COUNT(*), 6) AS avg_dim_move
FROM sums JOIN cd USING (cell, dim)
GROUP BY cell ORDER BY cell
"""


# --- q92: supplier-nation revenue share --------------------------------------


def q92_nation_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue share per supplier nation with a share floor — the market-
    share report shape (grouped agg + total-over-window + ratio filter).
    Supplier and nation broadcast; the total is a window over the 25-row
    aggregate, never a second corpus scan."""
    t = load_tables(spark, sf_dir)
    rev = _dec("l_extendedprice", 2) * (F.lit(1).cast("decimal(8,4)") - F.col("l_discount").cast("decimal(18,4)"))
    nation_rev = (
        t["lineitem"]
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.sum(rev).alias("_rev"))
    )
    total = F.sum("_rev").over(Window.partitionBy())
    share = F.round(F.col("_rev").cast("double") / F.col("_total").cast("double") * 100, 4)
    return (
        nation_rev.withColumn("_total", total)
        .select(
            "n_name",
            F.round(F.col("_rev"), 2).cast("double").alias("revenue"),
            share.alias("share_pct"),
        )
        .filter(F.col("share_pct") >= 2.0)
        .orderBy(F.desc("share_pct"), "n_name")
    )


Q92_SQL = """
WITH nr AS (
  SELECT n_name,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS rev
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  GROUP BY n_name
),
w AS (SELECT n_name, rev, SUM(rev) OVER () AS total FROM nr)
SELECT n_name, CAST(ROUND(rev, 2) AS DOUBLE) AS revenue,
       ROUND(CAST(rev AS DOUBLE) / CAST(total AS DOUBLE) * 100, 4) AS share_pct
FROM w
WHERE ROUND(CAST(rev AS DOUBLE) / CAST(total AS DOUBLE) * 100, 4) >= 2.0
ORDER BY share_pct DESC, n_name
"""


# --- q93: above-average-balance customers with no orders ---------------------


_CHURN_CUTOFF = "2001-01-01"


def q93_rich_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Churned high-value customers: above-average account balance and NO
    order since the cutoff, grouped by nation (the TPC-H Q22 shape on this
    schema): anti join against a date-filtered order set + scalar aggregate
    subquery. The average comparison is the exact cross-multiplied form
    ``bal * n > total`` — no decimal division anywhere; the anti join's
    build side is pre-filtered so the shuffle carries only recent orders."""
    t = load_tables(spark, sf_dir)
    stats = t["customer"].agg(
        F.count("*").alias("_n"), F.sum(_dec("c_acctbal", 2)).alias("_total")
    )
    rich = (
        t["customer"]
        .crossJoin(F.broadcast(stats))
        .filter(_dec("c_acctbal", 2) * F.col("_n") > F.col("_total"))
    )
    recent = t["orders"].filter(F.col("o_orderdate") >= F.lit(_CHURN_CUTOFF))
    inactive = rich.join(
        recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    )
    return (
        inactive.join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum(_dec("c_acctbal", 2)), 2).cast("double").alias("total_bal"),
        )
        .orderBy("n_name")
    )


Q93_SQL = """
WITH stats AS (
  SELECT COUNT(*) AS n, SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS total
  FROM customer
),
rich AS (
  SELECT c_custkey, c_nationkey, c_acctbal
  FROM customer, stats
  WHERE CAST(c_acctbal AS DECIMAL(18,2)) * n > total
),
inactive AS (
  SELECT * FROM rich
  WHERE NOT EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '2001-01-01')
)
SELECT n_name, COUNT(*) AS n_customers,
       CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_bal
FROM inactive JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name ORDER BY n_name
"""


# --- q94: duplicated-span audit (exact substring dedup signal) ---------------

_SPAN_LEN = 16


def q94_duplicated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-span mass (operators/dedup.
    duplicated_span_fraction): fraction of 16-token windows occurring >= 2
    times corpus-wide — the Lee-et-al exact-substring dedup audit."""
    from hadoop_jobanalyzer_spark.operators.dedup import duplicated_span_fraction

    docs = load_tables(spark, sf_dir)["documents"]
    return duplicated_span_fraction(docs, "doc_id", "text", span=_SPAN_LEN)


_SPAN_EXPR = " || ' ' || ".join(f"w[i+{j}]" for j in range(_SPAN_LEN))

Q94_SQL = f"""
WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (
  SELECT doc_id, md5({_SPAN_EXPR}) AS s
  FROM words, UNNEST(generate_series(1, len(w) - {_SPAN_LEN - 1})) AS t(i)
),
dup AS (SELECT s FROM sh GROUP BY s HAVING COUNT(*) >= 2),
sizes AS (SELECT doc_id, COUNT(*) AS n_spans FROM sh GROUP BY 1),
hits AS (SELECT doc_id, COUNT(*) AS n_dup FROM sh
         WHERE s IN (SELECT s FROM dup) GROUP BY 1)
SELECT doc_id, n_spans, COALESCE(n_dup, 0) AS n_dup,
       ROUND(COALESCE(n_dup, 0) / n_spans, 4) AS dup_frac
FROM sizes LEFT JOIN hits USING (doc_id)
ORDER BY doc_id
"""


# --- q95: sparse tf-idf cosine pairs -----------------------------------------

_TFIDF_THRESHOLD = 0.5


def q95_tfidf_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-free related-document pairs by sparse tf-idf cosine
    (operators/retrieval.tfidf_cosine_pairs): integer quantized-idf
    weights, posting-list-bounded pair generation, one final double
    division per pair."""
    from hadoop_jobanalyzer_spark.operators.retrieval import tfidf_cosine_pairs

    docs = load_tables(spark, sf_dir)["documents"]
    return tfidf_cosine_pairs(docs, "doc_id", "text", threshold=_TFIDF_THRESHOLD)


Q95_SQL = f"""
WITH toks AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS t FROM documents),
tf AS (SELECT doc_id, t, COUNT(*) AS tf FROM toks WHERE t <> '' GROUP BY doc_id, t),
nd AS (SELECT COUNT(*) AS n FROM documents),
tw AS (
  SELECT t, COUNT(*) AS df,
         LEAST(CAST(FLOOR((SELECT n FROM nd) / COUNT(*)) AS BIGINT), 1000) AS w
  FROM tf GROUP BY t
),
norms AS (
  SELECT doc_id, SUM(tf.tf * tf.tf * w * w) AS n2
  FROM tf JOIN tw USING (t) GROUP BY doc_id
),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(SUM(a.tf * b.tf * w * w) AS BIGINT) AS num
  FROM tf a JOIN tf b USING (t) JOIN tw USING (t)
  WHERE a.doc_id < b.doc_id AND tw.df BETWEEN 2 AND 1000
  GROUP BY 1, 2
)
SELECT id_a, id_b, num,
       CAST(na.n2 AS BIGINT) AS na, CAST(nb.n2 AS BIGINT) AS nb,
       ROUND(CAST(num AS DOUBLE) / SQRT(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)), 4) AS cos_sim
FROM pairs
JOIN norms na ON na.doc_id = id_a
JOIN norms nb ON nb.doc_id = id_b
WHERE ROUND(CAST(num AS DOUBLE) / SQRT(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)), 4) >= {_TFIDF_THRESHOLD}
ORDER BY id_a, id_b
"""


# --- q96: per-type event-value outliers --------------------------------------


def q96_event_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score outliers (|z| > 3) of event values within each event type —
    the anomaly-detection pass over a metrics stream. Moments are exact
    decimal sums; z is the cross-multiplied integer-exact form
    ``(v*n - S) / sqrt(n*Q - S^2)`` evaluated in doubles only at the end,
    so no cross-row float accumulation exists."""
    t = load_tables(spark, sf_dir)
    v = _dec("value", 2)
    stats = t["events"].groupBy("event_type").agg(
        F.count("*").alias("_n"),
        F.sum(v).alias("_s"),
        F.sum(v * v).alias("_q"),
    )
    vd = v.cast("double")
    nd = F.col("_n").cast("double")
    sd = F.col("_s").cast("double")
    qd = F.col("_q").cast("double")
    den = nd * qd - sd * sd
    z = F.round((vd * nd - sd) / F.sqrt(den), 3)
    return (
        t["events"]
        .join(F.broadcast(stats), "event_type")
        .filter(den > 0)
        .withColumn("z", z)
        .filter(F.abs(F.col("z")) > 3.0)
        .select("event_id", "event_type", F.round(v, 2).cast("double").alias("value"), "z")
        .orderBy("event_id")
    )


Q96_SQL = """
WITH stats AS (
  SELECT event_type, COUNT(*) AS n,
         SUM(CAST(value AS DECIMAL(18,2))) AS s,
         SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS q
  FROM events GROUP BY event_type
),
z AS (
  SELECT event_id, e.event_type,
         CAST(ROUND(CAST(value AS DECIMAL(18,2)), 2) AS DOUBLE) AS value,
         ROUND((CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) * CAST(n AS DOUBLE) - CAST(s AS DOUBLE))
               / SQRT(CAST(n AS DOUBLE) * CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)), 3) AS z
  FROM events e JOIN stats USING (event_type)
  WHERE CAST(n AS DOUBLE) * CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) > 0
)
SELECT event_id, event_type, value, z FROM z
WHERE ABS(z) > 3.0 ORDER BY event_id
"""


# --- q97: vocabulary coverage curve (Zipf / tokenizer sizing) ----------------

_VOCAB_CUTOFFS = [1, 2, 4, 8, 16, 32, 64]
_VOCAB_TOPK = 100_000


def q97_vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative token-mass coverage of the top-k vocabulary at power-of-
    two cutoffs — the Zipf curve a tokenizer/vocab-size decision reads.

    Scale shape: one explode + term count (the only corpus-sized work),
    then a TakeOrdered top-``_VOCAB_TOPK`` bound BEFORE the only ordered
    prefix-sum window, so the single-partition window ever sees at most
    ``_VOCAB_TOPK`` rows regardless of corpus size. Total token mass is a
    1-row broadcast. Coverage is an exact-integer ratio with one final
    double division.
    Output: (cutoff, n_terms, covered_tokens, coverage_pct).
    """
    docs = load_tables(spark, sf_dir)["documents"]
    from hadoop_jobanalyzer_spark.functions.text import tokens

    counts = (
        docs.select(F.explode(tokens("text")).alias("t"))
        .filter(F.col("t") != "")
        .groupBy("t")
        .agg(F.count("*").alias("n"))
    )
    top = counts.orderBy(F.desc("n"), "t").limit(_VOCAB_TOPK)
    w = Window.orderBy(F.desc("n"), "t").rowsBetween(Window.unboundedPreceding, 0)
    ranked = top.select(
        F.row_number().over(Window.orderBy(F.desc("n"), F.col("t"))).alias("rank"),
        F.sum("n").over(w).alias("cum"),
    )
    total = counts.agg(F.sum("n").alias("_total"))
    cuts = F.array(*[F.lit(c) for c in _VOCAB_CUTOFFS])
    return (
        ranked.select(F.explode(cuts).alias("cutoff"), "rank", "cum")
        .filter(F.col("rank") <= F.col("cutoff"))
        .groupBy("cutoff")
        .agg(F.max("rank").alias("n_terms"), F.max("cum").alias("covered_tokens"))
        .crossJoin(F.broadcast(total))
        .select(
            "cutoff",
            "n_terms",
            "covered_tokens",
            F.round(
                F.col("covered_tokens").cast("double") / F.col("_total").cast("double") * 100,
                4,
            ).alias("coverage_pct"),
        )
        .orderBy("cutoff")
    )


Q97_SQL = f"""
WITH counts AS (
  SELECT t, COUNT(*) AS n
  FROM (SELECT UNNEST(string_split(text, ' ')) AS t FROM documents)
  WHERE t <> '' GROUP BY t
),
ranked AS (
  SELECT ROW_NUMBER() OVER (ORDER BY n DESC, t) AS rank,
         SUM(n) OVER (ORDER BY n DESC, t
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM counts ORDER BY n DESC, t LIMIT {_VOCAB_TOPK}
),
total AS (SELECT SUM(n) AS total FROM counts)
SELECT cutoff, MAX(rank) AS n_terms,
       CAST(MAX(cum) AS BIGINT) AS covered_tokens,
       ROUND(CAST(MAX(cum) AS DOUBLE) / CAST(MAX(total) AS DOUBLE) * 100, 4) AS coverage_pct
FROM ranked, UNNEST({_VOCAB_CUTOFFS}) AS c(cutoff), total
WHERE rank <= cutoff
GROUP BY cutoff ORDER BY cutoff
"""


# --- q98: label-centroid separation ------------------------------------------


def q98_label_centroid_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise L2 distances between per-label embedding centroids — the
    class-separation QA before trusting ``label`` as an IVF partition or a
    classifier target.

    Exact-integer core: vectors quantize to 1/1000 fixed point, per-(label,
    dim) sums are exact longs, and the centroid difference uses the
    cross-multiplied form ``s_a * n_b - s_b * n_a`` so no division happens
    before the final per-pair sqrt. The cross-multiplied square is
    ``(n_a * n_b * gap)^2`` — at x100 corpus size that passed 2^63 and
    the ANSI long multiply overflowed (found by the fleet x100 sweep), so
    the product runs in decimal(38,0): exact integer arithmetic to 1e38,
    matching the oracle, whose SUM(xi) is already HUGEINT (int128) and
    whose products therefore never left int128. Everything after the one
    posexplode aggregation is label-pair-sized, and the decimal work is
    label-pair x dim-sized — never corpus-sized.
    Output: label_a < label_b, n_a, n_b, dist (rounded 6).
    """
    from hadoop_jobanalyzer_spark.functions.vectors import quantized

    emb = load_tables(spark, sf_dir)["embeddings"]
    sums = (
        emb.select(F.col("label"), F.posexplode(quantized(F.col("embedding"))).alias("dim", "xi"))
        .groupBy("label", "dim")
        .agg(F.sum("xi").alias("s"), F.count("*").alias("n"))
    )
    a = sums.select(
        F.col("label").alias("label_a"), "dim",
        F.col("s").alias("sa"), F.col("n").alias("na"),
    )
    b = sums.select(
        F.col("label").alias("label_b"), "dim",
        F.col("s").alias("sb"), F.col("n").alias("nb"),
    )
    diff = F.col("sa").cast("decimal(38,0)") * F.col("nb") - F.col("sb").cast(
        "decimal(38,0)"
    ) * F.col("na")
    num = F.sum(diff * diff)
    return (
        a.join(b, "dim")
        .filter(F.col("label_a") < F.col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(
            F.max("na").alias("n_a"),
            F.max("nb").alias("n_b"),
            num.alias("_num"),
        )
        .select(
            "label_a",
            "label_b",
            "n_a",
            "n_b",
            F.round(
                F.sqrt(F.col("_num").cast("double")) / (F.col("n_a") * F.col("n_b")) / 1000,
                6,
            ).alias("dist"),
        )
        .orderBy("label_a", "label_b")
    )


Q98_SQL = """
WITH q AS (
  SELECT label,
         list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
  FROM embeddings
),
sums AS (
  SELECT label, dim, SUM(xi) AS s, COUNT(*) AS n
  FROM (SELECT label, generate_subscripts(qv, 1) AS dim, UNNEST(qv) AS xi FROM q)
  GROUP BY label, dim
)
SELECT a.label AS label_a, b.label AS label_b,
       MAX(a.n) AS n_a, MAX(b.n) AS n_b,
       ROUND(SQRT(CAST(SUM((a.s * b.n - b.s * a.n) * (a.s * b.n - b.s * a.n)) AS DOUBLE))
             / (MAX(a.n) * MAX(b.n)) / 1000, 6) AS dist
FROM sums a JOIN sums b USING (dim)
WHERE a.label < b.label
GROUP BY a.label, b.label
ORDER BY label_a, label_b
"""


# --- q99: order-to-ship fulfillment lag --------------------------------------


def q99_fulfillment_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority order-to-ship lag stats (datediff over the order join).
    Day lags are exact integers; the mean is one final double division."""
    t = load_tables(spark, sf_dir)
    lag_days = F.datediff(
        F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
    )
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(lag_days).alias("_sum_days"),
            F.min(lag_days).alias("min_days"),
            F.max(lag_days).alias("max_days"),
        )
        .select(
            "o_orderpriority",
            "n_lines",
            F.round(
                F.col("_sum_days").cast("double") / F.col("n_lines").cast("double"), 2
            ).alias("avg_days"),
            "min_days",
            "max_days",
        )
        .orderBy("o_orderpriority")
    )


Q99_SQL = """
WITH j AS (
  SELECT o_orderpriority,
         datediff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS lag
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
)
SELECT o_orderpriority, COUNT(*) AS n_lines,
       ROUND(CAST(SUM(lag) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 2) AS avg_days,
       MIN(lag) AS min_days, MAX(lag) AS max_days
FROM j GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# --- q100: embedding covariance / correlation (exact integer core) -----------

_COV_DIMS = 16  # leading dims profiled; upper triangle = 136 pairs


def q100_embedding_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise correlation of the leading embedding dimensions — the
    redundancy/whitening QA before PCA or product quantization (highly
    correlated dims waste codebook bits).

    Exact core: vectors quantize to 1/1000 fixed point; per-pair sums
    (sum_x, sum_y, sum_xy, and per-dim sum_x2) are exact longs; the
    centered covariance uses the cross-multiplied form
    ``n*sum_xy - sum_x*sum_y`` and correlation divides by the matching
    exact variance numerators — a single composed double expression at
    the end. In-row upper-triangle pair construction (one explode of
    ~dims^2/2 integer structs per row, straight into a partial-aggregating
    groupBy: the shuffle carries 136 rows per partition). At true corpus
    scale the documented knob is a deterministic md5-mod row sample ahead
    of this operator (covariance estimation needs no full pass; sampling
    also keeps the int64 headroom).
    Output: (dim_i < dim_j, n, cov_num, corr).
    """
    from hadoop_jobanalyzer_spark.functions.vectors import quantized

    emb = load_tables(spark, sf_dir)["embeddings"]
    q = quantized(F.slice(F.col("embedding"), 1, _COV_DIMS))
    pairs = F.flatten(
        F.transform(
            q,
            lambda x, i: F.transform(
                F.slice(q, i + F.lit(1), F.size(q) - i),
                lambda y, j: F.struct(
                    i.alias("i"),
                    (i + j).alias("j"),
                    x.alias("x"),
                    y.alias("y"),
                ),
            ),
        )
    )
    sums = (
        emb.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.i").alias("dim_i"), F.col("p.j").alias("dim_j"))
        .agg(
            F.count("*").alias("n"),
            F.sum("p.x").alias("sx"),
            F.sum("p.y").alias("sy"),
            F.sum(F.col("p.x") * F.col("p.y")).alias("sxy"),
            F.sum(F.col("p.x") * F.col("p.x")).alias("sxx"),
            F.sum(F.col("p.y") * F.col("p.y")).alias("syy"),
        )
    )
    cov_num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    var_x = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    var_y = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return (
        sums.filter(F.col("dim_i") < F.col("dim_j"))
        .select(
            "dim_i",
            "dim_j",
            "n",
            cov_num.alias("cov_num"),
            F.round(
                cov_num.cast("double")
                / F.sqrt(var_x.cast("double") * var_y.cast("double")),
                6,
            ).alias("corr"),
        )
        .orderBy("dim_i", "dim_j")
    )


Q100_SQL = f"""
WITH q AS (
  SELECT list_transform(embedding[1:{_COV_DIMS}],
                        x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
  FROM embeddings
),
ex AS (
  SELECT i.i AS dim_i, j.j AS dim_j, qv[i.i + 1] AS x, qv[j.j + 1] AS y
  FROM q,
       UNNEST(generate_series(0, {_COV_DIMS - 1})) AS i(i),
       UNNEST(generate_series(0, {_COV_DIMS - 1})) AS j(j)
  WHERE i.i < j.j
),
sums AS (
  SELECT dim_i, dim_j, COUNT(*) AS n,
         SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
         SUM(x * x) AS sxx, SUM(y * y) AS syy
  FROM ex GROUP BY dim_i, dim_j
)
SELECT dim_i, dim_j, n,
       CAST(n * sxy - sx * sy AS BIGINT) AS cov_num,
       ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
             / SQRT(CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS corr
FROM sums ORDER BY dim_i, dim_j
"""


# --- q101: calendar gap detection --------------------------------------------


def q101_missing_minutes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minutes inside the stream's [min, max] range with ZERO events — the
    pipeline-outage detector (a time-series monitor reads absence, which
    no groupBy over present rows can produce). The minute spine is a
    ``sequence`` explode off the 1-row min/max aggregate; observed minutes
    anti-join it. All-integer epoch-minute arithmetic; the spine size is
    the time range, not the corpus size.
    Output: (missing_minute_epoch, minute_utc)."""
    from hadoop_jobanalyzer_spark.util import epoch_s

    events = load_tables(spark, sf_dir)["events"]
    minute = F.floor(epoch_s("ts") / 60).cast("long")
    bounds = events.agg(
        F.min(minute).alias("_lo"), F.max(minute).alias("_hi")
    )
    spine = bounds.select(
        F.explode(F.sequence(F.col("_lo"), F.col("_hi"))).alias("m")
    )
    observed = events.select(minute.alias("m")).distinct()
    return (
        spine.join(observed, "m", "left_anti")
        .select(
            F.col("m").alias("missing_minute_epoch"),
            F.from_unixtime(F.col("m") * 60, "yyyy-MM-dd HH:mm").alias("minute_utc"),
        )
        .orderBy("missing_minute_epoch")
    )


Q101_SQL = """
WITH mins AS (
  SELECT CAST(FLOOR(epoch(ts)) AS BIGINT) // 60 AS m FROM events
),
bounds AS (SELECT MIN(m) AS lo, MAX(m) AS hi FROM mins),
spine AS (SELECT UNNEST(generate_series(lo, hi)) AS m FROM bounds)
SELECT m AS missing_minute_epoch,
       strftime(to_timestamp(m * 60), '%Y-%m-%d %H:%M') AS minute_utc
FROM spine
WHERE m NOT IN (SELECT DISTINCT m FROM mins)
ORDER BY missing_minute_epoch
"""


# --- q102: table profiler (data-quality report) ------------------------------

_PROFILE_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"]


def q102_orders_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column null/distinct profile of the orders table — the
    data-quality report every ingest runs first. ONE aggregate row
    computes every per-column statistic in a single scan (count + null
    count + exact distinct per column), then unpivots in-row to the
    (column, stats) long form; no per-column scans, no shuffle beyond the
    aggregate's partials.
    Output: (col_name, n_rows, n_null, n_distinct)."""
    t = load_tables(spark, sf_dir)
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in _PROFILE_COLS:
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"_null_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"_dist_{c}"))
    one = t["orders"].agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("_n").alias("n_rows"),
                F.col(f"_null_{c}").alias("n_null"),
                F.col(f"_dist_{c}").alias("n_distinct"),
            )
            for c in _PROFILE_COLS
        ]
    )
    return (
        one.select(F.explode(rows).alias("r"))
        .select("r.col_name", "r.n_rows", "r.n_null", "r.n_distinct")
        .orderBy("col_name")
    )


Q102_SQL = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS col_name, COUNT(*) AS n_rows,
       COUNT(*) FILTER ({c} IS NULL) AS n_null,
       COUNT(DISTINCT {c}) AS n_distinct FROM orders"""
    for c in _PROFILE_COLS
) + "\nORDER BY col_name"


# --- q103: winsorized robust stats (exact order-statistic selection) ---------


def q103_winsorized_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type robust value stats: exact p05/p95 order statistics selected
    by rank (no interpolation — engine-independent), then the winsorized
    mean over values clamped into [p05, p95].

    Exact everywhere: values are integer cents; the percentile INDEX is
    ``floor(p * (n-1)) + 1`` (identical float-on-int expression both
    engines); selection is a rank equality, not quantile interpolation
    (interpolation formulas differ subtly across engines). One sort window
    per group + a tiny stats join-back; the winsorized mean divides once
    at the end.
    Output: (event_type, n, p05, p95, winsorized_mean).
    """
    t = load_tables(spark, sf_dir)
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    w = Window.partitionBy("event_type").orderBy("_c", "event_id")
    ranked = (
        t["events"]
        .select("event_type", "event_id", cents.alias("_c"))
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count("*").over(Window.partitionBy("event_type")))
    )
    idx05 = (F.floor(F.lit(0.05) * (F.col("_n") - 1)) + 1).cast("long")
    idx95 = (F.floor(F.lit(0.95) * (F.col("_n") - 1)) + 1).cast("long")
    stats = ranked.groupBy("event_type").agg(
        F.max("_n").alias("n"),
        F.max(F.when(F.col("_rn") == idx05, F.col("_c"))).alias("p05"),
        F.max(F.when(F.col("_rn") == idx95, F.col("_c"))).alias("p95"),
    )
    clamped = F.least(F.greatest(F.col("_c"), F.col("p05")), F.col("p95"))
    return (
        ranked.join(F.broadcast(stats), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("n").alias("n"),
            F.max("p05").alias("p05"),
            F.max("p95").alias("p95"),
            F.round(
                F.sum(clamped).cast("double") / F.max("n").cast("double") / 100, 4
            ).alias("winsorized_mean"),
        )
        .orderBy("event_type")
    )


Q103_SQL = """
WITH ranked AS (
  SELECT event_type, event_id,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT), event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
),
stats AS (
  SELECT event_type, MAX(n) AS n,
         MAX(CASE WHEN rn = CAST(FLOOR(0.05 * (n - 1)) AS BIGINT) + 1 THEN c END) AS p05,
         MAX(CASE WHEN rn = CAST(FLOOR(0.95 * (n - 1)) AS BIGINT) + 1 THEN c END) AS p95
  FROM ranked GROUP BY event_type
)
SELECT r.event_type, MAX(s.n) AS n, MAX(s.p05) AS p05, MAX(s.p95) AS p95,
       ROUND(CAST(SUM(LEAST(GREATEST(r.c, s.p05), s.p95)) AS DOUBLE)
             / CAST(MAX(s.n) AS DOUBLE) / 100, 4) AS winsorized_mean
FROM ranked r JOIN stats s USING (event_type)
GROUP BY r.event_type ORDER BY r.event_type
"""


# --- q105-shape: per-type value trend (exact least-squares slope) ------------


def q104_value_trends(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares slope of event value over time, per event type — the
    drift/trend detector. The regression moments are exact longs (x =
    hours since the global minimum hour, bounded by the time RANGE, so
    ``n*sum_xy`` stays far inside int64 at any row count; y = integer
    cents) and the slope is the cross-multiplied closed form
    ``(n*sxy - sx*sy) / (n*sxx - sx^2)`` — a single composed double
    expression at the end.
    Output: (event_type, n, slope_cents_per_hour).
    """
    from hadoop_jobanalyzer_spark.util import epoch_s

    t = load_tables(spark, sf_dir)
    hour = F.floor(epoch_s("ts") / 3600).cast("long")
    base = t["events"].agg(F.min(hour).alias("_h0"))
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    prepped = (
        t["events"]
        .crossJoin(F.broadcast(base))
        .select(
            "event_type",
            (hour - F.col("_h0")).alias("x"),
            cents.alias("y"),
        )
    )
    sums = prepped.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return (
        sums.filter(den > 0)
        .select(
            "event_type",
            "n",
            F.round(num.cast("double") / den.cast("double"), 6).alias(
                "slope_cents_per_hour"
            ),
        )
        .orderBy("event_type")
    )


Q104_SQL = """
WITH base AS (
  SELECT MIN(CAST(FLOOR(epoch(ts)) AS BIGINT) // 3600) AS h0 FROM events
),
p AS (
  SELECT event_type,
         CAST(FLOOR(epoch(ts)) AS BIGINT) // 3600 - h0 AS x,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
  FROM events, base
),
sums AS (
  SELECT event_type, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * y) AS sxy, SUM(x * x) AS sxx
  FROM p GROUP BY event_type
)
SELECT event_type, n,
       ROUND(CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE), 6)
         AS slope_cents_per_hour
FROM sums WHERE n * sxx - sx * sx > 0 ORDER BY event_type
"""


# --- q105: event-type transition matrix (first-order Markov) -----------------


def q105_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user consecutive event-type transition counts and probabilities
    — the first-order Markov profile of the event stream (session-flow
    analytics; also the sanity check before sequence-model training data
    is extracted). One lead window per user, a tiny (k x k) aggregate, and
    the row-normalizing total is a window over that aggregate, never a
    second scan. The probability is one final double division.
    Output: (from_type, to_type, n, prob)."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        t["events"]
        .select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
    )
    counts = pairs.groupBy("from_type", "to_type").agg(F.count("*").alias("n"))
    total = F.sum("n").over(Window.partitionBy("from_type"))
    return (
        counts.withColumn("_row_total", total)
        .select(
            "from_type",
            "to_type",
            "n",
            F.round(F.col("n").cast("double") / F.col("_row_total").cast("double"), 4).alias("prob"),
        )
        .orderBy("from_type", "to_type")
    )


Q105_SQL = """
WITH pairs AS (
  SELECT event_type AS from_type,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
  FROM events
),
counts AS (
  SELECT from_type, to_type, COUNT(*) AS n
  FROM pairs WHERE to_type IS NOT NULL
  GROUP BY from_type, to_type
)
SELECT from_type, to_type, n,
       ROUND(CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE), 4) AS prob
FROM counts ORDER BY from_type, to_type
"""


# --- q106: inter-arrival time histogram (log2 buckets, exact) ----------------


def q106_interarrival_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log2-bucketed inter-arrival gaps per user — the burstiness profile
    of the stream (capacity planning reads the tail buckets; a uniform
    synthetic stream shows a tight band). The bucket is the BIT LENGTH of
    the millisecond gap via base-2 string conversion — exact integer
    bucketing, immune to the ``floor(log2(2^k))`` float-boundary hazard
    that differs across libm implementations.
    Output: (gap_bits, n, min_gap_ms, max_gap_ms)."""
    from hadoop_jobanalyzer_spark.util import epoch_ms

    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        t["events"]
        .select((epoch_ms("ts") - F.lag(epoch_ms("ts")).over(w)).alias("gap_ms"))
        .filter(F.col("gap_ms").isNotNull())
    )
    bits = F.length(F.conv(F.col("gap_ms").cast("string"), 10, 2))
    return (
        gaps.groupBy(bits.alias("gap_bits"))
        .agg(
            F.count("*").alias("n"),
            F.min("gap_ms").alias("min_gap_ms"),
            F.max("gap_ms").alias("max_gap_ms"),
        )
        .orderBy("gap_bits")
    )


Q106_SQL = """
WITH g AS (
  SELECT epoch_ms(ts) - LAG(epoch_ms(ts))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_ms
  FROM events
)
SELECT CAST(LENGTH(format('{:b}', gap_ms)) AS INTEGER) AS gap_bits,
       COUNT(*) AS n, MIN(gap_ms) AS min_gap_ms, MAX(gap_ms) AS max_gap_ms
FROM g WHERE gap_ms IS NOT NULL
GROUP BY 1 ORDER BY 1
"""


# --- q107: per-source doc-length deciles (distribution drift) ----------------


def q107_source_length_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document-length deciles by exact order-statistic
    selection — the distribution-shift detector between corpus sources
    (a new crawl whose decile profile diverges from its source's history
    gets quarantined before training). Same rank-equality selection as
    q103 (no interpolation); the decile index expression is identical
    float-on-int in both engines. One sort window per source over a
    (source, n_chars) projection.
    Output: (source, decile, n_chars_at)."""
    docs = load_tables(spark, sf_dir)["documents"]
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    ranked = (
        docs.select("source", "doc_id", "n_chars")
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count("*").over(Window.partitionBy("source")))
    )
    deciles = F.array(*[F.lit(d) for d in range(1, 10)])
    idx = (F.floor(F.col("decile") / 10.0 * (F.col("_n") - 1)) + 1).cast("long")
    return (
        ranked.select("source", "n_chars", "_rn", "_n", F.explode(deciles).alias("decile"))
        .filter(F.col("_rn") == idx)
        .select("source", "decile", F.col("n_chars").alias("n_chars_at"))
        .orderBy("source", "decile")
    )


Q107_SQL = """
WITH ranked AS (
  SELECT source, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY source) AS n
  FROM documents
)
SELECT source, decile, n_chars AS n_chars_at
FROM ranked, UNNEST(generate_series(1, 9)) AS d(decile)
WHERE rn = CAST(FLOOR(decile / 10.0 * (n - 1)) AS BIGINT) + 1
ORDER BY source, decile
"""


# --- q108: year-over-year revenue growth -------------------------------------


def q108_yoy_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yearly revenue per order priority with year-over-year growth — the
    lag-over-aggregate reporting shape. Revenue sums are exact decimals;
    growth is one final double division against the lagged exact value.
    Output: (o_orderpriority, year, revenue, yoy_pct)."""
    t = load_tables(spark, sf_dir)
    yearly = (
        t["orders"]
        .groupBy(
            "o_orderpriority",
            F.year(F.col("o_orderdate").cast("date")).alias("year"),
        )
        .agg(F.sum(_dec("o_totalprice", 2)).alias("_rev"))
    )
    w = Window.partitionBy("o_orderpriority").orderBy("year")
    prev = F.lag("_rev").over(w)
    return yearly.select(
        "o_orderpriority",
        "year",
        F.round(F.col("_rev"), 2).cast("double").alias("revenue"),
        F.round(
            (F.col("_rev").cast("double") - prev.cast("double"))
            / prev.cast("double") * 100,
            4,
        ).alias("yoy_pct"),
    ).orderBy("o_orderpriority", "year")


Q108_SQL = """
WITH yearly AS (
  SELECT o_orderpriority, YEAR(CAST(o_orderdate AS DATE)) AS year,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders GROUP BY 1, 2
)
SELECT o_orderpriority, year,
       CAST(ROUND(rev, 2) AS DOUBLE) AS revenue,
       ROUND((CAST(rev AS DOUBLE)
              - CAST(LAG(rev) OVER (PARTITION BY o_orderpriority ORDER BY year) AS DOUBLE))
             / CAST(LAG(rev) OVER (PARTITION BY o_orderpriority ORDER BY year) AS DOUBLE) * 100, 4) AS yoy_pct
FROM yearly ORDER BY o_orderpriority, year
"""


# --- q109: cross-source contamination matrix ---------------------------------


def q109_source_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pair counts between corpus SOURCES — the
    contamination/licensing matrix (which feeds duplicate which; a high
    off-diagonal cell means one source republishes another, and a dedup
    policy should keep only one). Rides the production LSH+verify pipeline
    (q34) and joins the per-doc source labels onto the verified pairs —
    pair volume, not corpus volume, so the source join is tiny.
    Output: (source_a <= source_b, n_pairs, avg_jaccard)."""
    from hadoop_jobanalyzer_spark.operators.dedup import near_dup_pairs
    from hadoop_jobanalyzer_spark.plans.pipeline_queries import _BANDS, _N_HASHES

    docs = load_tables(spark, sf_dir)["documents"]
    pairs = near_dup_pairs(
        docs, "doc_id", "text", n_hashes=_N_HASHES, bands=_BANDS, ngram=3, threshold=0.2
    )
    src = docs.select("doc_id", "source")
    labeled = (
        pairs.join(src.select(F.col("doc_id").alias("id_a"), F.col("source").alias("_sa")), "id_a")
        .join(src.select(F.col("doc_id").alias("id_b"), F.col("source").alias("_sb")), "id_b")
        .select(
            F.least("_sa", "_sb").alias("source_a"),
            F.greatest("_sa", "_sb").alias("source_b"),
            "jaccard",
        )
    )
    return (
        labeled.groupBy("source_a", "source_b")
        .agg(
            F.count("*").alias("n_pairs"),
            # round-to-nearest, not cast-truncation: 0.287*1000 is
            # 286.99999... in IEEE and the two engines truncate/round
            # casts differently
            F.round(F.sum(F.round(F.col("jaccard") * 1000).cast("long")) / F.count("*") / 1000, 4).alias("avg_jaccard"),
        )
        .orderBy("source_a", "source_b")
    )


def _q109_sql() -> str:
    from hadoop_jobanalyzer_spark.plans.pipeline_queries import near_dup_ctes

    return f"""
WITH {near_dup_ctes()},
labeled AS (
  SELECT LEAST(da.source, db.source) AS source_a,
         GREATEST(da.source, db.source) AS source_b,
         v.jaccard
  FROM verified v
  JOIN documents da ON v.id_a = da.doc_id
  JOIN documents db ON v.id_b = db.doc_id
)
SELECT source_a, source_b, COUNT(*) AS n_pairs,
       ROUND(SUM(CAST(ROUND(jaccard * 1000) AS BIGINT)) / COUNT(*) / 1000, 4) AS avg_jaccard
FROM labeled GROUP BY source_a, source_b
ORDER BY source_a, source_b
"""


# --- q110: quantized-surprisal quality score ---------------------------------


def q110_doc_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean token surprisal under the corpus unigram model,
    QUANTIZED to integer bits — the CCNet-style LM quality filter with the
    log made engine-exact: a token's surprisal is the bit length of
    ``N_total // n_token`` (monotone in -log p, computed by base-2 string
    conversion — no libm). Low scores = boilerplate-heavy/common-token
    docs; high = rare-token (or noisy) docs; both tails get reviewed.

    One explode for counts, one explode joined against the term table,
    integer per-doc sums, one final division. The term join is pinned
    shuffle-hash with term_bits as the build: unhinted, the planner
    chose the EXPLODED TOKEN STREAM as the broadcast build off its
    fanout-blind size estimate (r10 audit) — the worst possible q235-
    class pick — and the vocabulary side, while much smaller, still
    grows without bound (Heaps), so neither side may ride a broadcast.
    Output: (doc_id, n_tokens, avg_surprisal_bits)."""
    from hadoop_jobanalyzer_spark.functions.text import tokens

    docs = load_tables(spark, sf_dir)["documents"]
    toks = docs.select("doc_id", F.explode(tokens("text")).alias("t")).filter(
        F.col("t") != ""
    )
    counts = toks.groupBy("t").agg(F.count("*").alias("n_t"))
    total = counts.agg(F.sum("n_t").alias("_n"))
    # FLOOR, not cast: Spark's double->long cast truncates while DuckDB's
    # rounds — floor is the same in both
    bits = F.length(
        F.conv(F.floor(F.col("_n") / F.col("n_t")).cast("long").cast("string"), 10, 2)
    ).cast("long")
    term_bits = counts.crossJoin(F.broadcast(total)).select("t", bits.alias("bits"))
    return (
        toks.join(term_bits.hint("shuffle_hash"), "t")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(
                F.sum("bits").cast("double") / F.count("*").cast("double"), 4
            ).alias("avg_surprisal_bits"),
        )
        .orderBy("doc_id")
    )


Q110_SQL = """
WITH toks AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS t FROM documents
),
filt AS (SELECT * FROM toks WHERE t <> ''),
counts AS (SELECT t, COUNT(*) AS n_t FROM filt GROUP BY t),
total AS (SELECT SUM(n_t) AS n FROM counts),
term_bits AS (
  SELECT t, CAST(LENGTH(format('{:b}', CAST(FLOOR(n / n_t) AS BIGINT))) AS BIGINT) AS bits
  FROM counts, total
)
SELECT doc_id, COUNT(*) AS n_tokens,
       ROUND(CAST(SUM(bits) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 4) AS avg_surprisal_bits
FROM filt JOIN term_bits USING (t)
GROUP BY doc_id ORDER BY doc_id
"""


# --- q111: last-observation-carried-forward ----------------------------------


def q111_last_purchase_carried_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCF imputation: at every event, the user's most recent purchase
    amount so far (null until their first purchase) — the gap-filling
    window shape (``last(..., ignorenulls=True)`` over an unbounded
    preceding frame) that time-series feature pipelines run everywhere.
    Output: (event_id, user_id, event_type, last_purchase_value), capped
    to the first 2000 events by id to keep the driver payload bounded."""
    t = load_tables(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    locf = F.last(
        F.when(
            F.col("event_type") == "purchase",
            (F.col("value").cast("decimal(18,2)")).cast("double"),
        ),
        ignorenulls=True,
    ).over(w)
    return (
        t["events"]
        .select("event_id", "user_id", "event_type", "ts", locf.alias("last_purchase_value"))
        .filter(F.col("event_id") < 2000)
        .select("event_id", "user_id", "event_type", "last_purchase_value")
        .orderBy("event_id")
    )


Q111_SQL = """
SELECT event_id, user_id, event_type, last_purchase_value
FROM (
  SELECT event_id, user_id, event_type,
         LAST_VALUE(CASE WHEN event_type = 'purchase'
                         THEN CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase_value
  FROM events
)
WHERE event_id < 2000 ORDER BY event_id
"""


# --- q112: keep-best dedup policy --------------------------------------------


def q112_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup with a KEEP-BEST policy: within each normalized-content
    group, keep the LONGEST document (ties -> lowest doc_id) instead of
    the minimum id — the production-realistic policy ("keep the fullest
    copy") layered on the q86 canonicalization. One window over the
    canonical hash; rank keys are integers so the verdict is
    engine-exact.
    Output: (doc_id, canon_md5, n_chars, is_keeper)."""
    from hadoop_jobanalyzer_spark.functions.text import normalize_text

    docs = load_tables(spark, sf_dir)["documents"]
    canon = F.md5(normalize_text(F.col("text")))
    w = Window.partitionBy("canon_md5").orderBy(F.desc("n_chars"), "doc_id")
    return (
        docs.select("doc_id", canon.alias("canon_md5"), "n_chars")
        .withColumn("is_keeper", F.row_number().over(w) == 1)
        .orderBy("doc_id")
    )


Q112_SQL = """
WITH c AS (
  SELECT doc_id,
         md5(trim(regexp_replace(
           regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
           ' +', ' ', 'g'))) AS canon_md5,
         n_chars
  FROM documents
)
SELECT doc_id, canon_md5, n_chars,
       ROW_NUMBER() OVER (PARTITION BY canon_md5
                          ORDER BY n_chars DESC, doc_id) = 1 AS is_keeper
FROM c ORDER BY doc_id
"""


# --- q113: audience overlap between event types ------------------------------


def q113_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaccard overlap of the distinct-user audiences of every event-type
    pair — the segmentation report behind "do purchasers also click?".
    The corpus-sized work is ONE distinct over (type, user); the pairwise
    intersection is a self-join of that reduced table and the union sizes
    come from exact integer counts (|A|+|B|-|A∩B|), so the only float op
    is the final division.
    Output: (type_a < type_b, n_a, n_b, n_both, jaccard)."""
    t = load_tables(spark, sf_dir)
    tu = t["events"].select("event_type", "user_id").distinct()
    sizes = tu.groupBy("event_type").agg(F.count("*").alias("n"))
    both = (
        tu.alias("a")
        .join(
            tu.select(F.col("event_type").alias("_bt"), "user_id").alias("b"),
            "user_id",
        )
        .filter(F.col("event_type") < F.col("_bt"))
        .groupBy(F.col("event_type").alias("type_a"), F.col("_bt").alias("type_b"))
        .agg(F.count("*").alias("n_both"))
    )
    sa = sizes.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    return (
        both.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            "n_both",
            F.round(
                F.col("n_both").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_both")).cast("double"),
                4,
            ).alias("jaccard"),
        )
        .orderBy("type_a", "type_b")
    )


Q113_SQL = """
WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
sizes AS (SELECT event_type, COUNT(*) AS n FROM tu GROUP BY event_type),
inter AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, COUNT(*) AS n_both
  FROM tu a JOIN tu b ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT type_a, type_b, sa.n AS n_a, sb.n AS n_b, n_both,
       ROUND(CAST(n_both AS DOUBLE) / CAST(sa.n + sb.n - n_both AS DOUBLE), 4) AS jaccard
FROM inter
JOIN sizes sa ON sa.event_type = type_a
JOIN sizes sb ON sb.event_type = type_b
ORDER BY type_a, type_b
"""


# --- q114: shingle document-frequency spectrum -------------------------------


def q114_shingle_df_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log2-bucketed spectrum of 3-gram document frequencies — the tuning
    input for every df-thresholded knob in the dedup layer (boilerplate
    min_df, stop-shingle caps): the analyst reads where the mass sits
    before picking a cutoff. Distinct shingles explode once; df is a
    two-phase count-distinct; the bucket is the exact base-2 bit length
    (the q106 technique). Output: (df_bits, n_shingles, max_df)."""
    from hadoop_jobanalyzer_spark.functions.text import shingles, tokens

    docs = load_tables(spark, sf_dir)["documents"]
    sh = docs.select(F.col("doc_id"), F.explode(shingles(tokens("text"), 3)).alias("s"))
    df_tab = sh.groupBy("s").agg(F.count_distinct("doc_id").alias("df"))
    bits = F.length(F.conv(F.col("df").cast("string"), 10, 2)).cast("long")
    return (
        df_tab.groupBy(bits.alias("df_bits"))
        .agg(F.count("*").alias("n_shingles"), F.max("df").alias("max_df"))
        .orderBy("df_bits")
    )


Q114_SQL = """
WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
       FROM words, UNNEST(generate_series(1, len(w) - 2)) AS t(i)),
dfs AS (SELECT s, COUNT(DISTINCT doc_id) AS df FROM sh GROUP BY s)
SELECT CAST(LENGTH(format('{:b}', df)) AS BIGINT) AS df_bits,
       COUNT(*) AS n_shingles, MAX(df) AS max_df
FROM dfs GROUP BY 1 ORDER BY 1
"""


# --- q115: user value concentration (Pareto curve) ---------------------------

_PARETO_CUTOFFS = [10, 100, 1000]
_PARETO_TOPK = 100_000


def q115_user_value_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of total event value contributed by the top-k users — the
    Pareto/whale-concentration report. Same scale discipline as q97: the
    TakeOrdered top-``_PARETO_TOPK`` bound runs BEFORE the only ordered
    prefix-sum window, and per-user totals are exact integer cents so the
    running sum is order-safe; the share is one final double division
    against the 1-row exact total.
    Output: (cutoff, n_users, value_share_pct)."""
    t = load_tables(spark, sf_dir)
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    per_user = t["events"].groupBy("user_id").agg(F.sum(cents).alias("v"))
    top = per_user.orderBy(F.desc("v"), "user_id").limit(_PARETO_TOPK)
    w = Window.orderBy(F.desc("v"), "user_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    ranked = top.select(
        F.row_number().over(Window.orderBy(F.desc("v"), F.col("user_id"))).alias("rank"),
        F.sum("v").over(w).alias("cum"),
    )
    total = per_user.agg(F.sum("v").alias("_total"))
    cuts = F.array(*[F.lit(c) for c in _PARETO_CUTOFFS])
    return (
        ranked.select(F.explode(cuts).alias("cutoff"), "rank", "cum")
        .filter(F.col("rank") <= F.col("cutoff"))
        .groupBy("cutoff")
        .agg(F.max("rank").alias("n_users"), F.max("cum").alias("_cum"))
        .crossJoin(F.broadcast(total))
        .select(
            "cutoff",
            "n_users",
            F.round(
                F.col("_cum").cast("double") / F.col("_total").cast("double") * 100, 4
            ).alias("value_share_pct"),
        )
        .orderBy("cutoff")
    )


Q115_SQL = f"""
WITH per_user AS (
  SELECT user_id, SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS v
  FROM events GROUP BY user_id
),
ranked AS (
  SELECT ROW_NUMBER() OVER (ORDER BY v DESC, user_id) AS rank,
         SUM(v) OVER (ORDER BY v DESC, user_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM per_user ORDER BY v DESC, user_id LIMIT {_PARETO_TOPK}
),
total AS (SELECT SUM(v) AS total FROM per_user)
SELECT cutoff, MAX(rank) AS n_users,
       ROUND(CAST(MAX(cum) AS DOUBLE) / CAST(MAX(total) AS DOUBLE) * 100, 4) AS value_share_pct
FROM ranked, UNNEST({_PARETO_CUTOFFS}) AS c(cutoff), total
WHERE rank <= cutoff
GROUP BY cutoff ORDER BY cutoff
"""


# --- q116: per-source id-density (ingest QA) ---------------------------------


def q116_source_id_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source doc_id span vs count — the ingest-QA check that catches
    silent drops: a source whose id range holds many more ids than rows
    lost documents somewhere upstream (or was filtered — either way the
    density says how much). One partial-aggregated pass; the density is a
    single final division over exact integers.
    Output: (source, n_docs, min_id, max_id, id_density)."""
    docs = load_tables(spark, sf_dir)["documents"]
    return (
        docs.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
        .select(
            "source",
            "n_docs",
            "min_id",
            "max_id",
            F.round(
                F.col("n_docs").cast("double")
                / (F.col("max_id") - F.col("min_id") + 1).cast("double"),
                4,
            ).alias("id_density"),
        )
        .orderBy("source")
    )


Q116_SQL = """
SELECT source, COUNT(*) AS n_docs, MIN(doc_id) AS min_id, MAX(doc_id) AS max_id,
       ROUND(CAST(COUNT(*) AS DOUBLE) / CAST(MAX(doc_id) - MIN(doc_id) + 1 AS DOUBLE), 4) AS id_density
FROM documents GROUP BY source ORDER BY source
"""


# --- q117: event-props key-presence matrix -----------------------------------

_PROPS_KEYS = ["k", "src", "tag"]


def q117_props_key_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fraction of events per type carrying each JSON props key — the
    semi-structured schema-drift report (a key whose presence drops for
    one event type flags a producer change). Presence probes are pure
    codegen get_json_object null checks in ONE aggregate pass; the long
    form unpivots in-row (the q102 technique).
    Output: (event_type, key, n_events, n_present, present_frac)."""
    t = load_tables(spark, sf_dir)
    aggs = [F.count(F.lit(1)).alias("_n")]
    for k in _PROPS_KEYS:
        aggs.append(
            F.count(F.get_json_object("props", f"$.{k}")).alias(f"_p_{k}")
        )
    one = t["events"].groupBy("event_type").agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(k).alias("key"),
                F.col("_n").alias("n_events"),
                F.col(f"_p_{k}").alias("n_present"),
            )
            for k in _PROPS_KEYS
        ]
    )
    return (
        one.select("event_type", F.explode(rows).alias("r"))
        .select(
            "event_type",
            "r.key",
            "r.n_events",
            "r.n_present",
            F.round(
                F.col("r.n_present").cast("double") / F.col("r.n_events").cast("double"),
                4,
            ).alias("present_frac"),
        )
        .orderBy("event_type", "key")
    )


Q117_SQL = "\nUNION ALL\n".join(
    f"""SELECT event_type, '{k}' AS key, COUNT(*) AS n_events,
       COUNT(json_extract_string(props, '$.{k}')) AS n_present,
       ROUND(CAST(COUNT(json_extract_string(props, '$.{k}')) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 4) AS present_frac
FROM events GROUP BY event_type"""
    for k in _PROPS_KEYS
) + "\nORDER BY event_type, key"


ANALYTICS_QUERIES = {
    "q90_sq8_error_histogram": (q90_sq8_error_histogram, Q90_SQL),
    "q91_kmeans_step": (q91_kmeans_step, Q91_SQL),
    "q92_nation_revenue_share": (q92_nation_revenue_share, Q92_SQL),
    "q93_rich_inactive_customers": (q93_rich_inactive_customers, Q93_SQL),
    "q94_duplicated_spans": (q94_duplicated_spans, Q94_SQL),
    "q95_tfidf_cosine_pairs": (q95_tfidf_cosine_pairs, Q95_SQL),
    "q96_event_value_outliers": (q96_event_value_outliers, Q96_SQL),
    "q97_vocab_coverage_curve": (q97_vocab_coverage_curve, Q97_SQL),
    "q98_label_centroid_distances": (q98_label_centroid_distances, Q98_SQL),
    "q99_fulfillment_lag": (q99_fulfillment_lag, Q99_SQL),
    "q100_embedding_correlations": (q100_embedding_correlations, Q100_SQL),
    "q101_missing_minutes": (q101_missing_minutes, Q101_SQL),
    "q102_orders_profile": (q102_orders_profile, Q102_SQL),
    "q103_winsorized_value_stats": (q103_winsorized_value_stats, Q103_SQL),
    "q104_value_trends": (q104_value_trends, Q104_SQL),
    "q105_event_transitions": (q105_event_transitions, Q105_SQL),
    "q106_interarrival_histogram": (q106_interarrival_histogram, Q106_SQL),
    "q107_source_length_deciles": (q107_source_length_deciles, Q107_SQL),
    "q108_yoy_revenue_growth": (q108_yoy_revenue_growth, Q108_SQL),
    "q109_source_contamination": (q109_source_contamination, _q109_sql()),
    "q110_doc_surprisal": (q110_doc_surprisal, Q110_SQL),
    "q111_last_purchase_carried_forward": (q111_last_purchase_carried_forward, Q111_SQL),
    "q112_dedup_keep_best": (q112_dedup_keep_best, Q112_SQL),
    "q113_audience_overlap": (q113_audience_overlap, Q113_SQL),
    "q114_shingle_df_spectrum": (q114_shingle_df_spectrum, Q114_SQL),
    "q115_user_value_concentration": (q115_user_value_concentration, Q115_SQL),
    "q116_source_id_density": (q116_source_id_density, Q116_SQL),
    "q117_props_key_presence": (q117_props_key_presence, Q117_SQL),
}
