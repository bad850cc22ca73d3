"""Mining / timeseries queries q153+: gap-fill linear interpolation,
banded edit-distance near-dups, argmin supplier selection, dormant-segment
profiling, next-word branching statistics, and sign-random-projection LSH.

Same contract as the other plan modules: each query is a (DataFrame
builder, DuckDB oracle SQL) pair, and the repo-wide determinism rules
apply — integer/exact-decimal cross-row accumulation, float division only
once at the end with identical parenthesization in both engines, ties
broken by a deterministic id.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hadoop_jobanalyzer_spark.plans.tables import load_tables
from hadoop_jobanalyzer_spark.util import epoch_s, materialize


# --- q153: minute gap-fill with linear interpolation -------------------------


def q153_gapfill_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucket gap-fill: the per-minute event-value series with every
    missing minute filled by linear interpolation between its observed
    neighbours — the hypertable `interpolate()` semantics.

    The spine is one `sequence(min,max)` explode of a 1-row bounds
    aggregate (never a per-row explode), so spine size is the time range,
    not the event count.  Neighbour lookup is two ignore-nulls window
    passes over the spine (prev = last observed before, next = first
    observed after), not a self-join.  The interpolated value stays exact:
    `filled_num = prev*(gap) + (delta)*(offset)` is BIGINT arithmetic on
    integer cents, and the single float division `filled_num/denom`
    happens once, at the end, identically in both engines.
    Output: (minute, is_gap, n_events, filled_num, denom, filled_cents),
    minute ascending."""
    events = load_tables(spark, sf_dir)["events"]
    obs = (
        events.select(
            F.floor(epoch_s("ts") / 60).cast("long").alias("minute"),
            F.floor(F.col("value") * 100).cast("long").alias("cents"),
        )
        .groupBy("minute")
        .agg(F.count("*").alias("n_events"), F.sum("cents").alias("cents"))
    )
    bounds = obs.agg(F.min("minute").alias("mn"), F.max("minute").alias("mx"))
    spine = bounds.select(F.explode(F.sequence("mn", "mx")).alias("minute"))
    base = spine.join(obs, "minute", "left")

    # Both neighbour lookups use GROWING frames (unboundedPreceding .. -1):
    # the "next observed" side runs over the REVERSED ordering rather than
    # a (1, unboundedFollowing) frame — Spark evaluates shrinking frames by
    # recomputing the aggregate per row (O(n^2) over the spine; measured
    # 57 s at sf0.1), while growing frames update incrementally (O(n)).
    before = Window.orderBy("minute").rowsBetween(Window.unboundedPreceding, -1)
    after_rev = Window.orderBy(F.desc("minute")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    obs_minute = F.when(F.col("cents").isNotNull(), F.col("minute"))
    filled = (
        base.withColumn("prev_c", F.last("cents", ignorenulls=True).over(before))
        .withColumn("prev_m", F.last(obs_minute, ignorenulls=True).over(before))
        .withColumn("next_c", F.last("cents", ignorenulls=True).over(after_rev))
        .withColumn("next_m", F.last(obs_minute, ignorenulls=True).over(after_rev))
    )
    is_gap = F.col("cents").isNull()
    num = F.when(
        is_gap,
        F.col("prev_c") * (F.col("next_m") - F.col("prev_m"))
        + (F.col("next_c") - F.col("prev_c")) * (F.col("minute") - F.col("prev_m")),
    ).otherwise(F.col("cents"))
    denom = F.when(is_gap, F.col("next_m") - F.col("prev_m")).otherwise(F.lit(1))
    return filled.select(
        "minute",
        is_gap.alias("is_gap"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        num.alias("filled_num"),
        denom.cast("long").alias("denom"),
        (num / denom.cast("double")).alias("filled_cents"),
    ).orderBy("minute")


Q153_SQL = """
WITH obs AS (
  SELECT CAST(FLOOR(epoch(ts)) AS BIGINT) // 60 AS minute,
         COUNT(*) AS n_events,
         SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS cents
  FROM events GROUP BY 1
),
bounds AS (SELECT MIN(minute) AS mn, MAX(minute) AS mx FROM obs),
spine AS (SELECT UNNEST(generate_series(mn, mx)) AS minute FROM bounds),
base AS (
  SELECT s.minute, o.n_events, o.cents
  FROM spine s LEFT JOIN obs o ON o.minute = s.minute
),
nb AS (
  SELECT minute, n_events, cents,
         LAST_VALUE(cents IGNORE NULLS) OVER (
           ORDER BY minute ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS prev_c,
         LAST_VALUE(CASE WHEN cents IS NOT NULL THEN minute END IGNORE NULLS)
           OVER (ORDER BY minute
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_m,
         FIRST_VALUE(cents IGNORE NULLS) OVER (
           ORDER BY minute ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING
         ) AS next_c,
         FIRST_VALUE(CASE WHEN cents IS NOT NULL THEN minute END IGNORE NULLS)
           OVER (ORDER BY minute
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_m
  FROM base
)
SELECT minute,
       cents IS NULL AS is_gap,
       COALESCE(n_events, 0) AS n_events,
       CASE WHEN cents IS NULL
            THEN prev_c * (next_m - prev_m) + (next_c - prev_c) * (minute - prev_m)
            ELSE cents END AS filled_num,
       CAST(CASE WHEN cents IS NULL THEN next_m - prev_m ELSE 1 END AS BIGINT)
         AS denom,
       CAST(CASE WHEN cents IS NULL
            THEN prev_c * (next_m - prev_m) + (next_c - prev_c) * (minute - prev_m)
            ELSE cents END AS DOUBLE)
       / CAST(CASE WHEN cents IS NULL THEN next_m - prev_m ELSE 1 END AS DOUBLE)
         AS filled_cents
FROM nb ORDER BY minute
"""


# --- q154: edit-distance near-dup part names ---------------------------------


def q154_part_name_edit_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levenshtein near-duplicate pairs over the part-name domain.

    Edit distance is quadratic per comparison, so the scale move is to
    collapse to the DISTINCT attribute domain first: part names are a
    Zipf-small vocabulary (64 distinct at sf0.1 for 20k rows), so the
    pairwise comparison runs on the deduplicated domain and the row
    multiplicities multiply back in (`n_pairs = cnt_a * cnt_b`).  At
    100 TB the domain of a categorical attribute stays bounded while rows
    grow — the pair stage's cost is O(|domain|^2), not O(rows^2).
    Output: (name_a, name_b, dist, n_pairs), dist/name_a/name_b asc."""
    part = load_tables(spark, sf_dir)["part"]
    names = part.groupBy(F.col("p_name").alias("name")).agg(
        F.count("*").alias("cnt")
    )
    a = names.select(F.col("name").alias("name_a"), F.col("cnt").alias("cnt_a"))
    b = names.select(F.col("name").alias("name_b"), F.col("cnt").alias("cnt_b"))
    pairs = a.join(F.broadcast(b), F.col("name_a") < F.col("name_b"))
    return (
        pairs.withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= 3)
        .select(
            "name_a",
            "name_b",
            "dist",
            (F.col("cnt_a") * F.col("cnt_b")).alias("n_pairs"),
        )
        .orderBy("dist", "name_a", "name_b")
    )


Q154_SQL = """
WITH names AS (SELECT p_name AS name, COUNT(*) AS cnt FROM part GROUP BY 1)
SELECT a.name AS name_a, b.name AS name_b,
       levenshtein(a.name, b.name) AS dist,
       a.cnt * b.cnt AS n_pairs
FROM names a JOIN names b ON a.name < b.name
WHERE levenshtein(a.name, b.name) <= 3
ORDER BY dist, name_a, name_b
"""


# --- q155: cheapest supplier per part (argmin join, TPC-H Q2 shape) ----------


def q155_cheapest_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per part, the supplier with the lowest realized unit price — the
    TPC-H Q2 correlated-min shape, rewritten as one aggregate plus a
    ranking window instead of a correlated subquery re-scan.

    Cross-row sums stay integer (price cents, floored unit quantities);
    the unit price is ONE division of those exact integers, and because
    IEEE division is correctly rounded the ranking order is identical in
    both engines; ties break on s_suppkey.  The window partitions by the
    same key the aggregate grouped on, so ranking adds only the partkey
    re-shuffle — no join back, no second scan of lineitem.
    Output: (p_partkey, best_suppkey, cost_cents, qty, unit_price),
    p_partkey ascending."""
    li = load_tables(spark, sf_dir)["lineitem"]
    per = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(
            F.floor(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100
            ).cast("long")
        ).alias("cost_cents"),
        F.sum(F.floor("l_quantity").cast("long")).alias("qty"),
    )
    unit = per.withColumn(
        "unit_price", F.col("cost_cents") / F.col("qty").cast("double")
    )
    w = Window.partitionBy("l_partkey").orderBy("unit_price", "l_suppkey")
    return (
        unit.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("l_suppkey").alias("best_suppkey"),
            "cost_cents",
            "qty",
            "unit_price",
        )
        .orderBy("p_partkey")
    )


Q155_SQL = """
WITH per AS (
  SELECT l_partkey, l_suppkey,
         SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT))
           AS cost_cents,
         SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS qty
  FROM lineitem GROUP BY 1, 2
),
ranked AS (
  SELECT l_partkey, l_suppkey, cost_cents, qty,
         CAST(cost_cents AS DOUBLE) / CAST(qty AS DOUBLE) AS unit_price,
         ROW_NUMBER() OVER (
           PARTITION BY l_partkey
           ORDER BY CAST(cost_cents AS DOUBLE) / CAST(qty AS DOUBLE), l_suppkey
         ) AS rn
  FROM per
)
SELECT l_partkey AS p_partkey, l_suppkey AS best_suppkey,
       cost_cents, qty, unit_price
FROM ranked WHERE rn = 1 ORDER BY p_partkey
"""


# --- q156: dormant above-average customers per segment (TPC-H Q22 shape) -----


def q156_dormant_segment_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per market segment: customers whose balance is strictly above their
    segment's average but who placed no order in the trailing 90 days of
    the dataset — the TPC-H Q22 'rich but dormant' shape.

    The scalar 'segment average' subquery is a tiny broadcast aggregate,
    and the comparison is the cross-multiplied integer form
    `bal_cents * n > total_cents` (no division, exact).  The recency
    cutoff derives from a 1-row MAX broadcast, so the activity side is a
    date-filtered DISTINCT that an anti join consumes — no correlated
    re-scan per customer.
    Output: (c_mktsegment, n_dormant, bal_cents), segment ascending."""
    t = load_tables(spark, sf_dir)
    cust = t["customer"].withColumn(
        "bal_cents", F.floor(F.col("c_acctbal") * 100).cast("long")
    )
    seg = cust.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_seg"), F.sum("bal_cents").alias("total_cents")
    )
    rich = cust.join(F.broadcast(seg), "c_mktsegment").filter(
        F.col("bal_cents") * F.col("n_seg") > F.col("total_cents")
    )
    orders = t["orders"]
    mx = orders.agg(F.max("o_orderdate").alias("mxd"))
    active = (
        orders.crossJoin(F.broadcast(mx))
        .filter(F.col("o_orderdate") >= F.col("mxd") - F.expr("INTERVAL 90 DAYS"))
        .select("o_custkey")
        .distinct()
    )
    dormant = rich.join(
        active, rich["c_custkey"] == active["o_custkey"], "left_anti"
    )
    return (
        dormant.groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_dormant"), F.sum("bal_cents").alias("bal_cents"))
        .orderBy("c_mktsegment")
    )


Q156_SQL = """
WITH cust AS (
  SELECT c_custkey, c_mktsegment,
         CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS bal_cents
  FROM customer
),
seg AS (
  SELECT c_mktsegment, COUNT(*) AS n_seg, SUM(bal_cents) AS total_cents
  FROM cust GROUP BY 1
),
rich AS (
  SELECT c.c_custkey, c.c_mktsegment, c.bal_cents
  FROM cust c JOIN seg s USING (c_mktsegment)
  WHERE c.bal_cents * s.n_seg > s.total_cents
),
active AS (
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_orderdate >= (SELECT MAX(o_orderdate) FROM orders) - INTERVAL 90 DAY
)
SELECT c_mktsegment, COUNT(*) AS n_dormant, SUM(bal_cents) AS bal_cents
FROM rich r
WHERE NOT EXISTS (SELECT 1 FROM active a WHERE a.o_custkey = r.c_custkey)
GROUP BY 1 ORDER BY c_mktsegment
"""


# --- q157: next-word branching factor (n-gram LM backoff diagnostic) ---------


def q157_next_word_branching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For the 20 highest-traffic leading words: how many distinct
    continuations follow it, and how dominant is the top one — the
    branching-factor table an n-gram LM uses to decide backoff.

    Bigrams come from the in-row shifted-index explode (each token
    produces one (w[i], w[i+1]) row — no self-join).  Everything after
    the bigram count is keyed by the left word, so the distinct-count,
    the total, and the argmax window all share one shuffle domain.  The
    top-continuation argmax is a ROW_NUMBER with a (count desc, word asc)
    deterministic tie-break, and `top_share` is the single end-stage
    division of exact counts.
    Output: (word, total, n_continuations, top_next, top_share),
    total desc / word asc, limit 20."""
    docs = load_tables(spark, sf_dir)["documents"]
    # split once in a codegen projection; the (interpreted) transform
    # lambda then only indexes the array instead of re-splitting the text
    # per element
    bigrams = (
        docs.select(F.split("text", " ").alias("_w"))
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(_w) - 1),"
                    " i -> struct(_w[i - 1] AS l, _w[i] AS r))"
                )
            ).alias("bg")
        )
        .select("bg.l", "bg.r")
    )
    pair_counts = bigrams.groupBy("l", "r").agg(F.count("*").alias("c"))
    rank = Window.partitionBy("l").orderBy(F.desc("c"), F.asc("r"))
    per_left = (
        pair_counts.withColumn("rn", F.row_number().over(rank))
        .groupBy("l")
        .agg(
            F.sum("c").alias("total"),
            F.count("*").alias("n_continuations"),
            F.max(F.when(F.col("rn") == 1, F.col("r"))).alias("top_next"),
            F.max(F.when(F.col("rn") == 1, F.col("c"))).alias("top_c"),
        )
    )
    return (
        per_left.select(
            F.col("l").alias("word"),
            "total",
            "n_continuations",
            "top_next",
            (F.col("top_c") / F.col("total").cast("double")).alias("top_share"),
        )
        .orderBy(F.desc("total"), F.asc("word"))
        .limit(20)
    )


Q157_SQL = """
WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
bigrams AS (
  SELECT w[i] AS l, w[i + 1] AS r
  FROM words, UNNEST(generate_series(1, len(w) - 1)) AS g(i)
),
pair_counts AS (SELECT l, r, COUNT(*) AS c FROM bigrams GROUP BY 1, 2),
ranked AS (
  SELECT l, r, c,
         ROW_NUMBER() OVER (PARTITION BY l ORDER BY c DESC, r ASC) AS rn
  FROM pair_counts
),
per_left AS (
  SELECT l, SUM(c) AS total, COUNT(*) AS n_continuations,
         MAX(CASE WHEN rn = 1 THEN r END) AS top_next,
         MAX(CASE WHEN rn = 1 THEN c END) AS top_c
  FROM ranked GROUP BY 1
)
SELECT l AS word, total, n_continuations, top_next,
       CAST(top_c AS DOUBLE) / CAST(total AS DOUBLE) AS top_share
FROM per_left ORDER BY total DESC, word ASC LIMIT 20
"""


# --- q158: sign-random-projection LSH buckets over embeddings ----------------

_SRP_PLANES = 16
_SRP_DIM = 64


def _srp_sign(plane: int, dim: int) -> int:
    """Deterministic Rademacher +-1, derived from a public hash so both
    engines (and any re-run) see the same hyperplanes."""
    h = hashlib.md5(f"srp:{plane}:{dim}".encode()).hexdigest()
    return 1 if int(h[0], 16) < 8 else -1


_SRP_SIGNS = [
    [_srp_sign(p, d) for d in range(_SRP_DIM)] for p in range(_SRP_PLANES)
]


def q158_srp_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH hash-quality diagnostic: 16-bit Rademacher sign-random-projection
    buckets with per-bucket LABEL PURITY (`n_labels`) — the tuning relation
    for the SRP family whose occupancy histogram q28 reports.  Where q28
    answers "are the 8-plane buckets balanced?", this answers "do 16
    Rademacher planes keep same-label vectors together?" — the
    recall-proxy a pipeline checks before trusting SRP blocking.

    The hyperplanes are module-level +-1 constants derived from md5, so
    the projection is `zip_with` multiply + in-row integer fold over the
    1/1000-quantized vector — exact BIGINT per plane, zero joins, one
    shuffle for the histogram.  At 100 TB bucket sizes and purity together
    bound the candidate-pair volume and recall of the near-dup stage.
    Output: (bucket, n_vecs, n_labels), bucket ascending."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    q = F.transform(
        "embedding", lambda x: F.floor(x.cast("double") * 1000).cast("long")
    )
    quant = emb.select("vec_id", "label", q.alias("q"))
    bucket = None
    for p, signs in enumerate(_SRP_SIGNS):
        lit_signs = F.array(*[F.lit(s) for s in signs])
        dot = F.aggregate(
            F.zip_with("q", lit_signs, lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        bit = F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return (
        quant.select(bucket.alias("bucket"), "label")
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_vecs"),
            F.count_distinct("label").alias("n_labels"),
        )
        .orderBy("bucket")
    )


def _srp_plane_sql(p: int, signs: list[int]) -> str:
    lits = ", ".join(str(s) for s in signs)
    return (
        f"CASE WHEN list_sum(list_transform(range(1, {_SRP_DIM + 1}),"
        f" i -> q[i] * ([{lits}])[i])) > 0 THEN {1 << p} ELSE 0 END"
    )


Q158_SQL = f"""
WITH quant AS (
  SELECT vec_id, label,
         list_transform(embedding,
                        x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
  FROM embeddings
),
hashed AS (
  SELECT label,
         {" + ".join(_srp_plane_sql(p, s) for p, s in enumerate(_SRP_SIGNS))}
           AS bucket
  FROM quant
)
SELECT bucket, COUNT(*) AS n_vecs, COUNT(DISTINCT label) AS n_labels
FROM hashed GROUP BY 1 ORDER BY bucket
"""


# --- q159: hybrid retrieval — reciprocal rank fusion -------------------------

_RRF_K = 60
_RRF_TERMS = ["dup", "key", "window"]  # same query as q80 (rare/mid/common df)
_RRF_DEPTH = 20


def q159_hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search: fuse the BM25 keyword ranking (q80's engine) with
    the embedding cosine ranking (q27's engine, vec_id == doc_id) by
    reciprocal rank fusion `score = sum 1/(60 + rank)` — the standard
    lexical+dense combiner.

    Both input rankings are deterministic (rounded scores with id
    tie-breaks), each is already a top-`DEPTH` relation before the fuse,
    so the full-outer join touches at most 2*DEPTH rows — driver-side
    cost is nil and the heavy lifting stays in the two bounded retrieval
    plans.  The RRF contributions are per-row IEEE divisions of exact
    small integers (identical in both engines); no cross-row float sums
    (at most two doubles add per row, same order both sides).
    Output: (doc_id, bm25_rank, cos_rank, rrf_score), top 10 by score
    desc / doc_id asc."""
    from hadoop_jobanalyzer_spark.operators.retrieval import bm25_topk
    from hadoop_jobanalyzer_spark.operators.similarity import knn_brute_force

    t = load_tables(spark, sf_dir)
    w_bm = Window.orderBy(F.desc("score"), "doc_id")
    bm = (
        bm25_topk(t["documents"], "doc_id", "text", _RRF_TERMS, k=_RRF_DEPTH)
        .withColumn("bm25_rank", F.row_number().over(w_bm))
        .select("doc_id", "bm25_rank")
    )
    w_nn = Window.orderBy(F.desc("cos_sim"), "vec_id")
    nn = (
        knn_brute_force(t["embeddings"], "vec_id", "embedding", query_id=0, k=_RRF_DEPTH)
        .withColumn("cos_rank", F.row_number().over(w_nn))
        .select(F.col("vec_id").alias("doc_id"), "cos_rank")
    )
    fused = bm.join(nn, "doc_id", "full_outer")
    contrib = lambda c: F.when(  # noqa: E731
        F.col(c).isNotNull(), F.lit(1.0) / (F.lit(_RRF_K) + F.col(c))
    ).otherwise(F.lit(0.0))
    return (
        fused.select(
            "doc_id",
            "bm25_rank",
            "cos_rank",
            (contrib("bm25_rank") + contrib("cos_rank")).alias("rrf_score"),
        )
        .orderBy(F.desc("rrf_score"), "doc_id")
        .limit(10)
    )


def _q159_sql() -> str:
    from hadoop_jobanalyzer_spark.operators.retrieval import bm25_sql

    bm = bm25_sql("documents", "doc_id", "text", _RRF_TERMS, k=_RRF_DEPTH)
    return f"""
WITH bm_top AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS bm25_rank
  FROM ({bm})
),
q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
cos_all AS (
  SELECT vec_id AS doc_id,
         ROUND(
           list_sum(list_transform(list_zip(e.embedding::DOUBLE[], q.qv),
                                   x -> x[1] * x[2]))
           / sqrt(list_sum(list_transform(e.embedding::DOUBLE[], x -> x * x))
                  * list_sum(list_transform(q.qv, x -> x * x)))
         , 4) AS cos_sim
  FROM embeddings e, q WHERE vec_id != 0
),
nn_top AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY cos_sim DESC, doc_id) AS cos_rank
  FROM (SELECT * FROM cos_all ORDER BY cos_sim DESC, doc_id LIMIT {_RRF_DEPTH})
)
SELECT COALESCE(b.doc_id, n.doc_id) AS doc_id, b.bm25_rank, n.cos_rank,
       COALESCE(CAST(1 AS DOUBLE) / ({_RRF_K} + b.bm25_rank), 0.0)
       + COALESCE(CAST(1 AS DOUBLE) / ({_RRF_K} + n.cos_rank), 0.0) AS rrf_score
FROM bm_top b FULL OUTER JOIN nn_top n ON b.doc_id = n.doc_id
ORDER BY rrf_score DESC, doc_id LIMIT 10
"""


# --- q160: seasonal-baseline anomaly flags -----------------------------------


def q160_hourly_anomaly_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal anomaly detection: each (day, hour-of-day) event count is
    compared against that hour-of-day's cross-day baseline; cells more
    than 2 population standard deviations out are flagged.

    The day x hour grid comes from two tiny derived dimensions (distinct
    days x 24 literal hours — a broadcast, never a per-event explode), so
    zero-event cells participate in the baseline instead of silently
    biasing it.  Moments stay exact: the anomaly test is the
    cross-multiplied integer form `dev^2 > 4 * (n*Q - S^2)` (z^2 > 4 with
    population variance), and the reported z is one sqrt + one division
    of exact integers, both correctly rounded and engine-identical.
    Output: (day, hour, c, n_days, dev, var_num, z, is_anomaly),
    day/hour ascending."""
    events = load_tables(spark, sf_dir)["events"]
    s = F.floor(epoch_s("ts")).cast("long")
    cells = (
        events.select(
            (s / 86400).cast("long").alias("day"),
            ((s % 86400) / 3600).cast("long").alias("hour"),
        )
        .groupBy("day", "hour")
        .agg(F.count("*").alias("c"))
    )
    days = cells.select("day").distinct()
    hours = spark.range(24).select(F.col("id").alias("hour"))
    grid = days.crossJoin(F.broadcast(hours))
    full = grid.join(cells, ["day", "hour"], "left").fillna(0, ["c"])
    stats = full.groupBy("hour").agg(
        F.count("*").alias("n_days"),
        F.sum("c").alias("s_sum"),
        F.sum(F.col("c") * F.col("c")).alias("q_sum"),
    )
    j = full.join(F.broadcast(stats), "hour")
    dev = F.col("c") * F.col("n_days") - F.col("s_sum")
    var_num = F.col("n_days") * F.col("q_sum") - F.col("s_sum") * F.col("s_sum")
    z = F.when(
        var_num > 0, dev.cast("double") / F.sqrt(var_num.cast("double"))
    ).otherwise(F.lit(0.0))
    return j.select(
        "day",
        "hour",
        "c",
        "n_days",
        dev.alias("dev"),
        var_num.alias("var_num"),
        z.alias("z"),
        ((dev * dev > 4 * var_num) & (var_num > 0)).alias("is_anomaly"),
    ).orderBy("day", "hour")


Q160_SQL = """
WITH cells AS (
  SELECT CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS day,
         (CAST(FLOOR(epoch(ts)) AS BIGINT) % 86400) // 3600 AS hour,
         COUNT(*) AS c
  FROM events GROUP BY 1, 2
),
grid AS (
  SELECT d.day, h.hour
  FROM (SELECT DISTINCT day FROM cells) d
  CROSS JOIN (SELECT UNNEST(generate_series(0, 23)) AS hour) h
),
full_grid AS (
  SELECT g.day, g.hour, COALESCE(c.c, 0) AS c
  FROM grid g LEFT JOIN cells c ON c.day = g.day AND c.hour = g.hour
),
stats AS (
  SELECT hour, COUNT(*) AS n_days, SUM(c) AS s_sum, SUM(c * c) AS q_sum
  FROM full_grid GROUP BY 1
)
SELECT f.day, f.hour, f.c, s.n_days,
       f.c * s.n_days - s.s_sum AS dev,
       s.n_days * s.q_sum - s.s_sum * s.s_sum AS var_num,
       CASE WHEN s.n_days * s.q_sum - s.s_sum * s.s_sum > 0
            THEN CAST(f.c * s.n_days - s.s_sum AS DOUBLE)
                 / sqrt(CAST(s.n_days * s.q_sum - s.s_sum * s.s_sum AS DOUBLE))
            ELSE 0.0 END AS z,
       (f.c * s.n_days - s.s_sum) * (f.c * s.n_days - s.s_sum)
         > 4 * (s.n_days * s.q_sum - s.s_sum * s.s_sum)
       AND s.n_days * s.q_sum - s.s_sum * s.s_sum > 0 AS is_anomaly
FROM full_grid f JOIN stats s USING (hour)
ORDER BY day, hour
"""


# --- q161: nation-pair trade volume (TPC-H Q7 shape) -------------------------


def q161_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue flowing between (supplier nation, customer nation) pairs
    per ship-year — the TPC-H Q7 'volume shipping' shape.

    Join order follows fact-table discipline: lineitem keeps its partition
    count while orders joins on orderkey (the only big-big shuffle); the
    customer->nation and supplier->nation lookups are dimension broadcasts
    so no additional fact shuffle happens.  Revenue accumulates as exact
    integer cents, per-row floored before the sum.
    Output: (supp_nation, cust_nation, ship_year, revenue_cents),
    ordered by the three keys."""
    t = load_tables(spark, sf_dir)
    nation = t["nation"].select("n_nationkey", "n_name")
    cust = (
        t["customer"]
        .join(
            F.broadcast(nation.withColumnRenamed("n_name", "cust_nation")),
            t["customer"]["c_nationkey"] == nation["n_nationkey"],
        )
        .select("c_custkey", "cust_nation")
    )
    supp = (
        t["supplier"]
        .join(
            F.broadcast(nation.withColumnRenamed("n_name", "supp_nation")),
            t["supplier"]["s_nationkey"] == nation["n_nationkey"],
        )
        .select("s_suppkey", "supp_nation")
    )
    li = t["lineitem"].select(
        "l_orderkey",
        "l_suppkey",
        F.year("l_shipdate").alias("ship_year"),
        F.floor(
            F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100
        ).cast("long").alias("rev_cents"),
    )
    orders = t["orders"].select("o_orderkey", "o_custkey")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .groupBy("supp_nation", "cust_nation", "ship_year")
        .agg(F.sum("rev_cents").alias("revenue_cents"))
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


Q161_SQL = """
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS ship_year,
       SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT))
         AS revenue_cents
FROM lineitem
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation cn ON cn.n_nationkey = c_nationkey
JOIN nation sn ON sn.n_nationkey = s_nationkey
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


# --- q162: customer spend rank functions -------------------------------------


def q162_customer_spend_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complete rank-function surface over customer lifetime spend:
    rank, dense_rank, percent_rank, cume_dist, and ntile(10) in one
    window pass.

    All five functions share ONE global sort (Spark plans a single
    Window over one Exchange), spend is exact integer cents so ties are
    value-true, and the two fractional measures are the engines' own
    rank-arithmetic — deterministic because rank/row-count inputs are
    integers and the division is single IEEE.
    Output: (c_custkey, spend_cents, rnk, drnk, prnk, cume, decile),
    spend desc / custkey asc."""
    t = load_tables(spark, sf_dir)
    spend = (
        t["orders"]
        .groupBy("o_custkey")
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias(
                "spend_cents"
            )
        )
    )
    w = Window.orderBy(F.desc("spend_cents"))
    wt = Window.orderBy(F.desc("spend_cents"), F.asc("o_custkey"))
    return (
        spend.select(
            F.col("o_custkey").alias("c_custkey"),
            "spend_cents",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.percent_rank().over(w).alias("prnk"),
            F.cume_dist().over(w).alias("cume"),
            F.ntile(10).over(wt).alias("decile"),
        )
        .orderBy(F.desc("spend_cents"), F.asc("c_custkey"))
    )


Q162_SQL = """
WITH spend AS (
  SELECT o_custkey,
         SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS spend_cents
  FROM orders GROUP BY 1
)
SELECT o_custkey AS c_custkey, spend_cents,
       RANK() OVER (ORDER BY spend_cents DESC) AS rnk,
       DENSE_RANK() OVER (ORDER BY spend_cents DESC) AS drnk,
       PERCENT_RANK() OVER (ORDER BY spend_cents DESC) AS prnk,
       CUME_DIST() OVER (ORDER BY spend_cents DESC) AS cume,
       NTILE(10) OVER (ORDER BY spend_cents DESC, o_custkey ASC) AS decile
FROM spend
ORDER BY spend_cents DESC, c_custkey ASC
"""


# --- q163: rolling cross-series correlation ----------------------------------

_ROLL_W = 24  # hours


def q163_rolling_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 24-hour Pearson correlation between the hourly view series
    and the hourly purchase series — the co-movement monitor between two
    metrics a pipeline alerts on.

    Both series land on one zero-filled hour spine (1-row bounds
    sequence, like q153), so every rolling frame has exactly `_ROLL_W`
    rows and the five moment sums (Sx, Sy, Sxx, Syy, Sxy) are EXACT
    integer window sums sharing one global-ordering pass.  The correlation
    itself is per-row IEEE arithmetic on those exact integers (two sqrts,
    one multiply, one division — identical operand order in both engines);
    zero-variance frames yield NULL explicitly.
    Output: (hour, views, purchases, corr_num, corr), full frames only,
    hour ascending."""
    events = load_tables(spark, sf_dir)["events"]
    hour = F.floor(epoch_s("ts") / 3600).cast("long").alias("hour")
    counts = (
        events.filter(F.col("event_type").isin("view", "purchase"))
        .groupBy(hour)
        .agg(
            F.count(F.when(F.col("event_type") == "view", True)).alias("x"),
            F.count(F.when(F.col("event_type") == "purchase", True)).alias("y"),
        )
    )
    bounds = counts.agg(F.min("hour").alias("mn"), F.max("hour").alias("mx"))
    spine = bounds.select(F.explode(F.sequence("mn", "mx")).alias("hour"))
    series = spine.join(counts, "hour", "left").fillna(0, ["x", "y"])

    w = Window.orderBy("hour").rowsBetween(-(_ROLL_W - 1), Window.currentRow)
    rolled = series.select(
        "hour",
        F.col("x").alias("views"),
        F.col("y").alias("purchases"),
        F.row_number().over(Window.orderBy("hour")).alias("rn"),
        F.sum("x").over(w).alias("sx"),
        F.sum("y").over(w).alias("sy"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(w).alias("syy"),
        F.sum(F.col("x") * F.col("y")).over(w).alias("sxy"),
    ).filter(F.col("rn") >= _ROLL_W)
    n = F.lit(_ROLL_W)
    num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = n * F.col("syy") - F.col("sy") * F.col("sy")
    corr = F.when(
        (vx > 0) & (vy > 0),
        num.cast("double") / (F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double"))),
    )
    return rolled.select(
        "hour", "views", "purchases", num.alias("corr_num"), corr.alias("corr")
    ).orderBy("hour")


Q163_SQL = f"""
WITH counts AS (
  SELECT CAST(FLOOR(epoch(ts)) AS BIGINT) // 3600 AS hour,
         COUNT(*) FILTER (event_type = 'view') AS x,
         COUNT(*) FILTER (event_type = 'purchase') AS y
  FROM events
  WHERE event_type IN ('view', 'purchase')
  GROUP BY 1
),
bounds AS (SELECT MIN(hour) AS mn, MAX(hour) AS mx FROM counts),
spine AS (SELECT UNNEST(generate_series(mn, mx)) AS hour FROM bounds),
series AS (
  SELECT s.hour, COALESCE(c.x, 0) AS x, COALESCE(c.y, 0) AS y
  FROM spine s LEFT JOIN counts c ON c.hour = s.hour
),
rolled AS (
  SELECT hour, x AS views, y AS purchases,
         ROW_NUMBER() OVER (ORDER BY hour) AS rn,
         SUM(x) OVER w AS sx, SUM(y) OVER w AS sy,
         SUM(x * x) OVER w AS sxx, SUM(y * y) OVER w AS syy,
         SUM(x * y) OVER w AS sxy
  FROM series
  WINDOW w AS (ORDER BY hour ROWS BETWEEN {_ROLL_W - 1} PRECEDING AND CURRENT ROW)
)
SELECT hour, views, purchases,
       {_ROLL_W} * sxy - sx * sy AS corr_num,
       CASE WHEN {_ROLL_W} * sxx - sx * sx > 0 AND {_ROLL_W} * syy - sy * sy > 0
            THEN CAST({_ROLL_W} * sxy - sx * sy AS DOUBLE)
                 / (sqrt(CAST({_ROLL_W} * sxx - sx * sx AS DOUBLE))
                    * sqrt(CAST({_ROLL_W} * syy - sy * sy AS DOUBLE)))
       END AS corr
FROM rolled WHERE rn >= {_ROLL_W} ORDER BY hour
"""


# --- q164: weighted median ---------------------------------------------------


def q164_weighted_median_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median order value per order priority, weighted by the
    order's line-item count — the weighted order statistic (smallest value
    whose cumulative weight reaches half the total).

    One join assigns weights, one aggregate collapses to the
    (priority, value) domain, and one cumulative window ordered by value
    finds the crossing point `2*cum >= total` — all integer comparisons
    (no division), so the selected row is exact in both engines.  This is
    the same selection-by-rank discipline as q103's winsorized stats,
    generalized to weights.
    Output: (o_orderpriority, total_weight, median_cents), priority asc."""
    t = load_tables(spark, sf_dir)
    li_w = t["lineitem"].groupBy("l_orderkey").agg(F.count("*").alias("w"))
    orders = t["orders"].select(
        "o_orderkey",
        "o_orderpriority",
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    vals = (
        orders.join(li_w, orders["o_orderkey"] == li_w["l_orderkey"])
        .groupBy("o_orderpriority", "cents")
        .agg(F.sum("w").alias("w"))
    )
    wp = Window.partitionBy("o_orderpriority")
    wc = (
        Window.partitionBy("o_orderpriority")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        vals.withColumn("total_w", F.sum("w").over(wp))
        .withColumn("cum_w", F.sum("w").over(wc))
        .filter(F.col("cum_w") * 2 >= F.col("total_w"))
        .groupBy("o_orderpriority")
        .agg(
            F.max("total_w").alias("total_weight"),
            F.min("cents").alias("median_cents"),
        )
        .orderBy("o_orderpriority")
    )


Q164_SQL = """
WITH li_w AS (SELECT l_orderkey, COUNT(*) AS w FROM lineitem GROUP BY 1),
vals AS (
  SELECT o_orderpriority, CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents,
         SUM(w) AS w
  FROM orders JOIN li_w ON l_orderkey = o_orderkey
  GROUP BY 1, 2
),
cum AS (
  SELECT o_orderpriority, cents, w,
         SUM(w) OVER (PARTITION BY o_orderpriority) AS total_w,
         SUM(w) OVER (PARTITION BY o_orderpriority ORDER BY cents
                      ROWS UNBOUNDED PRECEDING) AS cum_w
  FROM vals
)
SELECT o_orderpriority, MAX(total_w) AS total_weight,
       MIN(cents) AS median_cents
FROM cum WHERE cum_w * 2 >= total_w
GROUP BY 1 ORDER BY o_orderpriority
"""


# --- q165: local supplier volume (TPC-H Q5 shape) ----------------------------


def q165_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue served by suppliers in the CUSTOMER's own nation, per
    region and nation — the TPC-H Q5 'local supplier volume' shape, the
    one classic join tree that threads region -> nation -> customer ->
    orders -> lineitem -> supplier with an equality between two dimension
    paths.

    The nation==nation constraint is applied as an equi-condition on the
    two broadcast dimension lookups, so the fact table still shuffles
    only once (orderkey join); region/nation/supplier/customer are all
    broadcast.  Revenue accumulates as exact floored cents.
    Output: (r_name, n_name, revenue_cents), region/nation asc."""
    t = load_tables(spark, sf_dir)
    nr = (
        t["nation"]
        .join(
            F.broadcast(t["region"]),
            t["nation"]["n_regionkey"] == t["region"]["r_regionkey"],
        )
        .select("n_nationkey", "n_name", "r_name")
    )
    cust = t["customer"].select("c_custkey", F.col("c_nationkey").alias("cnat"))
    supp = t["supplier"].select("s_suppkey", F.col("s_nationkey").alias("snat"))
    li = t["lineitem"].select(
        "l_orderkey",
        "l_suppkey",
        F.floor(
            F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100
        ).cast("long").alias("rev_cents"),
    )
    orders = t["orders"].select("o_orderkey", "o_custkey")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .filter(F.col("cnat") == F.col("snat"))
        .join(F.broadcast(nr), F.col("cnat") == nr["n_nationkey"])
        .groupBy("r_name", "n_name")
        .agg(F.sum("rev_cents").alias("revenue_cents"))
        .orderBy("r_name", "n_name")
    )


Q165_SQL = """
SELECT r_name, n_name,
       SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT))
         AS revenue_cents
FROM lineitem
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
JOIN nation ON n_nationkey = c_nationkey
JOIN region ON r_regionkey = n_regionkey
GROUP BY 1, 2 ORDER BY 1, 2
"""


# --- q166: recency-decayed engagement score ----------------------------------


def q166_decayed_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user engagement score with one-day half-life decay:
    `score = sum(value_cents >> age_days)` — each event's contribution
    halves per day of age, computed as an integer bit-shift so the
    cross-row accumulation stays EXACT (the determinism rule forbids a
    float `0.5^age` running sum).

    The anchor day is a 1-row MAX broadcast; the shift and the sum are
    codegen integer ops, one shuffle on user_id.  Halving-by-shift is the
    standard exact form of exponential decay for monetary integers —
    engine-portable and replay-stable (append-only streams can maintain
    it incrementally by re-anchoring per day).
    Output: (user_id, n_events, score), score desc / user_id asc."""
    events = load_tables(spark, sf_dir)["events"]
    day = F.floor(epoch_s("ts") / 86400).cast("long")
    base = events.select(
        "user_id",
        day.alias("day"),
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    mx = base.agg(F.max("day").alias("mxd"))
    return (
        base.crossJoin(F.broadcast(mx))
        # F.shiftright only takes a literal shift; the per-row age shift
        # needs the SQL form
        .select(
            "user_id",
            F.expr("shiftright(cents, cast(mxd - day as int))").alias("contrib"),
        )
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"), F.sum("contrib").alias("score"))
        .orderBy(F.desc("score"), "user_id")
    )


Q166_SQL = """
WITH base AS (
  SELECT user_id,
         CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS day,
         CAST(FLOOR(value * 100) AS BIGINT) AS cents
  FROM events
),
mx AS (SELECT MAX(day) AS mxd FROM base)
SELECT user_id, COUNT(*) AS n_events,
       SUM(cents >> CAST(mxd - day AS INTEGER)) AS score
FROM base, mx
GROUP BY user_id
ORDER BY score DESC, user_id
"""


# --- q167: funnel completion-time quartiles ----------------------------------

_FUNNEL_MS = 2 * 24 * 3600 * 1000  # same per-hop bound as q148


def q167_funnel_duration_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quartiles of the view->click->purchase completion time — the
    time-to-convert distribution over q148's strict-contiguity matches.

    Matches come from the same two-leads-one-window CEP shape as q148
    (no self-join); durations collapse to a (duration, count) domain and
    the quartiles are rank-crossing selections (`4*cum >= k*n`, all
    integer — the q164 weighted-median discipline applied at three cut
    points), so no interpolation and no float compare anywhere.
    Output: one row (n_matches, q1_ms, median_ms, q3_ms)."""
    from hadoop_jobanalyzer_spark.util import epoch_ms

    events = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ms = epoch_ms("ts")
    s = events.select(
        "user_id",
        "event_type",
        ms.alias("ms0"),
        F.lead("event_type", 1).over(w).alias("ty1"),
        F.lead(ms, 1).over(w).alias("ms1"),
        F.lead("event_type", 2).over(w).alias("ty2"),
        F.lead(ms, 2).over(w).alias("ms2"),
    )
    durs = (
        s.filter(
            (F.col("event_type") == "view")
            & (F.col("ty1") == "click")
            & (F.col("ty2") == "purchase")
            & (F.col("ms1") - F.col("ms0") <= _FUNNEL_MS)
            & (F.col("ms2") - F.col("ms1") <= _FUNNEL_MS)
        )
        .select((F.col("ms2") - F.col("ms0")).alias("dur"))
        .groupBy("dur")
        .agg(F.count("*").alias("c"))
    )
    total = durs.agg(F.sum("c").alias("n"))
    wc = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = durs.withColumn("cum", F.sum("c").over(wc)).crossJoin(F.broadcast(total))
    return cum.agg(
        F.max("n").alias("n_matches"),
        F.min(F.when(F.col("cum") * 4 >= F.col("n"), F.col("dur"))).alias("q1_ms"),
        F.min(F.when(F.col("cum") * 2 >= F.col("n"), F.col("dur"))).alias("median_ms"),
        F.min(F.when(F.col("cum") * 4 >= F.col("n") * 3, F.col("dur"))).alias("q3_ms"),
    )


Q167_SQL = f"""
WITH s AS (
  SELECT user_id, event_type, epoch_ms(ts) AS ms0,
         LEAD(event_type, 1) OVER w AS ty1,
         LEAD(epoch_ms(ts), 1) OVER w AS ms1,
         LEAD(event_type, 2) OVER w AS ty2,
         LEAD(epoch_ms(ts), 2) OVER w AS ms2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
durs AS (
  SELECT ms2 - ms0 AS dur, COUNT(*) AS c
  FROM s
  WHERE event_type = 'view' AND ty1 = 'click' AND ty2 = 'purchase'
    AND ms1 - ms0 <= {_FUNNEL_MS} AND ms2 - ms1 <= {_FUNNEL_MS}
  GROUP BY 1
),
cum AS (
  SELECT dur, c,
         SUM(c) OVER (ORDER BY dur ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(c) OVER () AS n
  FROM durs
)
SELECT MAX(n) AS n_matches,
       MIN(CASE WHEN cum * 4 >= n THEN dur END) AS q1_ms,
       MIN(CASE WHEN cum * 2 >= n THEN dur END) AS median_ms,
       MIN(CASE WHEN cum * 4 >= n * 3 THEN dur END) AS q3_ms
FROM cum
"""


# --- q168: ANN recall audit --------------------------------------------------


def q168_ann_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the two blocking-based ANN methods against the
    brute-force cosine ground truth for the standard query vector — the
    audit that decides whether SRP buckets / IVF cells are trustworthy
    before they gate a 100 TB similarity join.

    Ground truth is q27's top-10 (10 rows, broadcast); each method's
    candidate set is one codegen filter against a 1-row broadcast (the
    query's bucket / label).  Counts are exact integers; recall and
    precision are single end divisions.
    Output: (method, n_candidates, n_hits, recall), method ascending."""
    from hadoop_jobanalyzer_spark.operators.similarity import (
        knn_brute_force,
        lsh_buckets,
    )

    emb = load_tables(spark, sf_dir)["embeddings"]
    top10 = knn_brute_force(emb, "vec_id", "embedding", query_id=0, k=10).select(
        "vec_id"
    )
    buckets = lsh_buckets(emb, "vec_id", "embedding")
    qb = buckets.filter(F.col("vec_id") == 0).select(F.col("bucket").alias("qbucket"))
    srp_cand = (
        buckets.crossJoin(F.broadcast(qb))
        .filter((F.col("bucket") == F.col("qbucket")) & (F.col("vec_id") != 0))
        .select("vec_id")
    )
    ql = emb.filter(F.col("vec_id") == 0).select(F.col("label").alias("qlabel"))
    ivf_cand = (
        emb.crossJoin(F.broadcast(ql))
        .filter((F.col("label") == F.col("qlabel")) & (F.col("vec_id") != 0))
        .select("vec_id")
    )

    def audit(cand: DataFrame, method: str) -> DataFrame:
        n_cand = cand.agg(F.count("*").alias("n_candidates"))
        hits = (
            cand.join(F.broadcast(top10), "vec_id")
            .agg(F.count("*").alias("n_hits"))
        )
        return (
            n_cand.crossJoin(F.broadcast(hits))
            .select(
                F.lit(method).alias("method"),
                "n_candidates",
                "n_hits",
                (F.col("n_hits") / F.lit(10.0)).alias("recall"),
            )
        )

    return (
        audit(ivf_cand, "ivf_label")
        .unionByName(audit(srp_cand, "srp_bucket"))
        .orderBy("method")
    )


def _q168_sql() -> str:
    from hadoop_jobanalyzer_spark.operators.similarity import hyperplanes

    terms = []
    for i, plane in enumerate(hyperplanes(8, 64, seed=7)):
        arr = "[" + ", ".join(str(v) for v in plane) + "]::BIGINT[]"
        terms.append(
            f"(CASE WHEN list_sum(list_transform(list_zip(embedding::DOUBLE[], {arr}), "
            f"x -> CAST(ROUND(x[1] * 1000) AS BIGINT) * x[2])) >= 0 "
            f"THEN CAST({2**i} AS BIGINT) ELSE 0 END)"
        )
    bucket = " + ".join(terms)
    return f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
cos_all AS (
  SELECT vec_id,
         ROUND(
           list_sum(list_transform(list_zip(e.embedding::DOUBLE[], q.qv),
                                   x -> x[1] * x[2]))
           / sqrt(list_sum(list_transform(e.embedding::DOUBLE[], x -> x * x))
                  * list_sum(list_transform(q.qv, x -> x * x)))
         , 4) AS cos_sim
  FROM embeddings e, q WHERE vec_id != 0
),
top10 AS (SELECT vec_id FROM cos_all ORDER BY cos_sim DESC, vec_id LIMIT 10),
buckets AS (SELECT vec_id, ({bucket}) AS bucket FROM embeddings),
qb AS (SELECT bucket FROM buckets WHERE vec_id = 0),
srp_cand AS (
  SELECT b.vec_id FROM buckets b, qb WHERE b.bucket = qb.bucket AND b.vec_id != 0
),
ql AS (SELECT label FROM embeddings WHERE vec_id = 0),
ivf_cand AS (
  SELECT e.vec_id FROM embeddings e, ql WHERE e.label = ql.label AND e.vec_id != 0
)
SELECT 'ivf_label' AS method,
       (SELECT COUNT(*) FROM ivf_cand) AS n_candidates,
       (SELECT COUNT(*) FROM ivf_cand JOIN top10 USING (vec_id)) AS n_hits,
       CAST((SELECT COUNT(*) FROM ivf_cand JOIN top10 USING (vec_id)) AS DOUBLE)
         / 10.0 AS recall
UNION ALL
SELECT 'srp_bucket',
       (SELECT COUNT(*) FROM srp_cand),
       (SELECT COUNT(*) FROM srp_cand JOIN top10 USING (vec_id)),
       CAST((SELECT COUNT(*) FROM srp_cand JOIN top10 USING (vec_id)) AS DOUBLE)
         / 10.0
ORDER BY method
"""


# --- q169: dedup candidate precision/recall audit ----------------------------


def q169_dedup_candidate_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall of the MinHash-LSH candidate pairs (q23's
    pipeline) against the exact n-gram Jaccard ground truth (q22) — the
    tuning audit for the bands/rows knobs before LSH gates a corpus-scale
    dedup.

    Both pair sets come from the SAME registered operators with the same
    parameters, so this is a pure composition: three bounded counts plus
    two end divisions.  At 100 TB the audit runs on a hash-mod sample of
    the corpus; the operators' bucket caps bound both pair sets.
    Output: one row (n_candidates, n_truth, n_hits, cand_precision,
    truth_recall)."""
    from hadoop_jobanalyzer_spark.operators.dedup import (
        lsh_candidate_pairs,
        ngram_jaccard_pairs,
    )

    docs = load_tables(spark, sf_dir)["documents"]
    # each pair set feeds two consumers (its own count + the hit join) —
    # lazy materialize computes each once; ContextCleaner releases the
    # blocks when the result frame is dropped
    truth = (
        ngram_jaccard_pairs(docs, "doc_id", "text", ngram=3, threshold=0.2)
        .select("id_a", "id_b")
        .transform(materialize)
    )
    cand = (
        lsh_candidate_pairs(docs, "doc_id", "text", n_hashes=8, bands=4, ngram=3)
        .select("id_a", "id_b")
        .transform(materialize)
    )
    n_cand = cand.agg(F.count("*").alias("n_candidates"))
    n_truth = truth.agg(F.count("*").alias("n_truth"))
    # pinned shuffle-hash: both pair sets are corpus-scaled materialized
    # frames whose copied estimates are fanout-blind (q235 class, r10)
    n_hits = (
        cand.join(truth.hint("shuffle_hash"), ["id_a", "id_b"])
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        n_cand.crossJoin(F.broadcast(n_truth))
        .crossJoin(F.broadcast(n_hits))
        .select(
            "n_candidates",
            "n_truth",
            "n_hits",
            (F.col("n_hits") / F.col("n_candidates").cast("double")).alias(
                "cand_precision"
            ),
            (F.col("n_hits") / F.col("n_truth").cast("double")).alias("truth_recall"),
        )
    )


def _q169_sql() -> str:
    from hadoop_jobanalyzer_spark.plans.pipeline_queries import Q22_SQL, _q23_sql

    return f"""
WITH truth AS (SELECT id_a, id_b FROM ({Q22_SQL})),
cand AS (SELECT id_a, id_b FROM ({_q23_sql()}))
SELECT (SELECT COUNT(*) FROM cand) AS n_candidates,
       (SELECT COUNT(*) FROM truth) AS n_truth,
       (SELECT COUNT(*) FROM cand JOIN truth USING (id_a, id_b)) AS n_hits,
       CAST((SELECT COUNT(*) FROM cand JOIN truth USING (id_a, id_b)) AS DOUBLE)
         / CAST((SELECT COUNT(*) FROM cand) AS DOUBLE) AS cand_precision,
       CAST((SELECT COUNT(*) FROM cand JOIN truth USING (id_a, id_b)) AS DOUBLE)
         / CAST((SELECT COUNT(*) FROM truth) AS DOUBLE) AS truth_recall
"""


# --- q170: disjunctive band revenue (TPC-H Q19 shape) ------------------------

_Q170_BANDS = [
    ("Brand#1", 1, 15, 1, 11),
    ("Brand#2", 16, 30, 10, 20),
    ("Brand#3", 31, 50, 20, 30),
]


def q170_band_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue matching any of three (brand, size-range, quantity-range)
    bands — the TPC-H Q19 disjunctive-predicate shape, reported per band
    so each disjunct's contribution is visible.

    The part side is a broadcast dimension; the disjunction lives in ONE
    post-join case expression assigning the band id, so the fact table is
    scanned once and never unioned per band.  A lineitem quantity
    prefilter (the union of the quantity ranges) still pushes down to the
    scan.  Revenue is exact floored cents.
    Output: (band, n_items, revenue_cents), band ascending."""
    t = load_tables(spark, sf_dir)
    part = t["part"].select("p_partkey", "p_brand", "p_size")
    qty_lo = min(b[3] for b in _Q170_BANDS)
    qty_hi = max(b[4] for b in _Q170_BANDS)
    li = t["lineitem"].filter(
        (F.col("l_quantity") >= qty_lo) & (F.col("l_quantity") <= qty_hi)
    )
    band = None
    for i, (brand, slo, shi, qlo, qhi) in enumerate(_Q170_BANDS):
        cond = (
            (F.col("p_brand") == brand)
            & (F.col("p_size") >= slo)
            & (F.col("p_size") <= shi)
            & (F.col("l_quantity") >= qlo)
            & (F.col("l_quantity") <= qhi)
        )
        band = F.when(cond, F.lit(i + 1)) if band is None else band.when(cond, F.lit(i + 1))
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .withColumn("band", band)
        .filter(F.col("band").isNotNull())
        .groupBy("band")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(
                F.floor(
                    F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100
                ).cast("long")
            ).alias("revenue_cents"),
        )
        .orderBy("band")
    )


def _q170_sql() -> str:
    cases = " ".join(
        f"WHEN p_brand = '{brand}' AND p_size BETWEEN {slo} AND {shi} "
        f"AND l_quantity BETWEEN {qlo} AND {qhi} THEN {i + 1}"
        for i, (brand, slo, shi, qlo, qhi) in enumerate(_Q170_BANDS)
    )
    qty_lo = min(b[3] for b in _Q170_BANDS)
    qty_hi = max(b[4] for b in _Q170_BANDS)
    return f"""
WITH banded AS (
  SELECT CASE {cases} END AS band,
         CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)
           AS rev_cents
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE l_quantity BETWEEN {qty_lo} AND {qty_hi}
)
SELECT band, COUNT(*) AS n_items, SUM(rev_cents) AS revenue_cents
FROM banded WHERE band IS NOT NULL
GROUP BY 1 ORDER BY band
"""


# --- q171: returned-item revenue per customer (TPC-H Q10 shape) --------------


def q171_returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top 20 customers by revenue lost to returned items (l_returnflag =
    'R') with their nation — the TPC-H Q10 shape.

    The return-flag filter pushes into the lineitem scan before the only
    fact-fact join (orderkey); customer and nation are broadcasts.  The
    top-20 is a TakeOrderedAndProject on (revenue desc, custkey) — exact
    cents, deterministic tie-break.
    Output: (c_custkey, c_name, n_name, revenue_cents), top 20."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].filter(F.col("l_returnflag") == "R").select(
        "l_orderkey",
        F.floor(
            F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100
        ).cast("long").alias("rev_cents"),
    )
    orders = t["orders"].select("o_orderkey", "o_custkey")
    cust = t["customer"].select("c_custkey", "c_name", "c_nationkey")
    nation = t["nation"].select("n_nationkey", "n_name")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), F.col("o_custkey") == cust["c_custkey"])
        .join(F.broadcast(nation), F.col("c_nationkey") == nation["n_nationkey"])
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum("rev_cents").alias("revenue_cents"))
        .orderBy(F.desc("revenue_cents"), "c_custkey")
        .limit(20)
    )


Q171_SQL = """
SELECT c_custkey, c_name, n_name,
       SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT))
         AS revenue_cents
FROM lineitem
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation ON n_nationkey = c_nationkey
WHERE l_returnflag = 'R'
GROUP BY 1, 2, 3
ORDER BY revenue_cents DESC, c_custkey
LIMIT 20
"""


# --- q172: source vocabulary overlap -----------------------------------------


def q172_source_vocab_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary Jaccard between every pair of corpus sources — the
    dataset-level similarity matrix (are two ingest feeds drawing from
    the same distribution?), complementing the doc-level cross-source
    near-dup matrix of q109.

    One distinct pass collapses to the (source, token) domain; the pair
    stage self-joins ON TOKEN within that reduced domain, so fan-out per
    token is bounded by the source count (20), not the corpus.  Sizes
    join back from a per-source aggregate and the Jaccard is a single
    end division.
    Output: (source_a, source_b, n_common, n_a, n_b, jaccard),
    source_a/source_b ascending."""
    docs = load_tables(spark, sf_dir)["documents"]
    st = (
        docs.select("source", F.explode(F.split("text", " ")).alias("tok"))
        .distinct()
    )
    sizes = st.groupBy("source").agg(F.count("*").alias("n_vocab"))
    a = st.select(F.col("source").alias("source_a"), "tok")
    b = st.select(F.col("source").alias("source_b"), "tok")
    # pinned shuffle-hash: the (source, token) relation is vocabulary-
    # scaled (Heaps — grows without bound) and rides the explode's
    # fanout-blind estimate (q235 class, r10 audit)
    common = (
        a.join(b.hint("shuffle_hash"), "tok")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("source").alias("source_a"), F.col("n_vocab").alias("n_a"))
    sb = sizes.select(F.col("source").alias("source_b"), F.col("n_vocab").alias("n_b"))
    return (
        common.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_common",
            "n_a",
            "n_b",
            (
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double")
            ).alias("jaccard"),
        )
        .orderBy("source_a", "source_b")
    )


Q172_SQL = """
WITH st AS (
  SELECT DISTINCT source, UNNEST(string_split(text, ' ')) AS tok FROM documents
),
sizes AS (SELECT source, COUNT(*) AS n_vocab FROM st GROUP BY 1),
common AS (
  SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS n_common
  FROM st a JOIN st b ON a.tok = b.tok AND a.source < b.source
  GROUP BY 1, 2
)
SELECT source_a, source_b, n_common, sa.n_vocab AS n_a, sb.n_vocab AS n_b,
       CAST(n_common AS DOUBLE) / CAST(sa.n_vocab + sb.n_vocab - n_common AS DOUBLE)
         AS jaccard
FROM common
JOIN sizes sa ON sa.source = source_a
JOIN sizes sb ON sb.source = source_b
ORDER BY source_a, source_b
"""


# --- q173: cohort LTV curves -------------------------------------------------


def q173_cohort_ltv_curves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly-cohort lifetime-value curves: customers grouped by their
    first-order month, cumulative revenue tracked per month offset — the
    monetary counterpart of q87's retention triangle.

    The cohort key and offset are exact integer month indexes
    (year*12 + month), revenue is exact cents, and the cumulative curve
    is one per-cohort window over the already-aggregated
    (cohort, offset) grid — three shuffles total, all on small derived
    domains after the first per-customer MIN.
    Output: (cohort_month, month_off, cohort_size, n_active,
    revenue_cents, cum_revenue_cents), cohort/offset ascending."""
    orders = load_tables(spark, sf_dir)["orders"].select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("m_idx"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    firsts = orders.groupBy("o_custkey").agg(F.min("m_idx").alias("first_m"))
    cohort_sizes = firsts.groupBy("first_m").agg(F.count("*").alias("cohort_size"))
    cells = (
        orders.join(firsts, "o_custkey")
        .groupBy(
            F.col("first_m").alias("cohort_m"),
            (F.col("m_idx") - F.col("first_m")).alias("month_off"),
        )
        .agg(
            F.count_distinct("o_custkey").alias("n_active"),
            F.sum("cents").alias("revenue_cents"),
        )
    )
    wc = (
        Window.partitionBy("cohort_m")
        .orderBy("month_off")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        cells.join(
            F.broadcast(cohort_sizes),
            cells["cohort_m"] == cohort_sizes["first_m"],
        )
        .select(
            F.col("cohort_m").alias("cohort_month"),
            "month_off",
            "cohort_size",
            "n_active",
            "revenue_cents",
            F.sum("revenue_cents").over(wc).alias("cum_revenue_cents"),
        )
        .orderBy("cohort_month", "month_off")
    )


Q173_SQL = """
WITH orders_m AS (
  SELECT o_custkey,
         CAST(EXTRACT(year FROM o_orderdate) * 12
              + EXTRACT(month FROM o_orderdate) AS BIGINT) AS m_idx,
         CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
firsts AS (SELECT o_custkey, MIN(m_idx) AS first_m FROM orders_m GROUP BY 1),
cohort_sizes AS (SELECT first_m, COUNT(*) AS cohort_size FROM firsts GROUP BY 1),
cells AS (
  SELECT f.first_m AS cohort_m, o.m_idx - f.first_m AS month_off,
         COUNT(DISTINCT o.o_custkey) AS n_active,
         SUM(o.cents) AS revenue_cents
  FROM orders_m o JOIN firsts f USING (o_custkey)
  GROUP BY 1, 2
)
SELECT c.cohort_m AS cohort_month, c.month_off, s.cohort_size, c.n_active,
       c.revenue_cents,
       SUM(c.revenue_cents) OVER (
         PARTITION BY c.cohort_m ORDER BY c.month_off
         ROWS UNBOUNDED PRECEDING) AS cum_revenue_cents
FROM cells c JOIN cohort_sizes s ON s.first_m = c.cohort_m
ORDER BY cohort_month, month_off
"""


# --- q174: temporal point-in-interval lookup join ----------------------------


def q174_temporal_lookup_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval (bitemporal lookup) join: every event of the
    SCD2-tracked users lands on the dimension row whose validity interval
    `[valid_from, valid_to)` covers its timestamp — the query every
    warehouse runs against a type-2 dimension (q138 builds it; this
    consumes it).

    The join carries the user equi-key alongside the two range
    predicates, so Spark plans a hash/sort-merge join on user with the
    range as residual — never a nested loop; per-user interval counts are
    bounded by that user's change count.  Rolled up to one row per
    (user, state, valid_from) so the result is the per-interval activity
    profile.
    Output: (user_id, state, valid_from, n_events, value_cents),
    user/valid_from ascending."""
    from hadoop_jobanalyzer_spark.plans.sketch_queries import SKETCH_QUERIES

    scd2 = SKETCH_QUERIES["q138_scd2_intervals"][0](spark, sf_dir)
    ev = (
        load_tables(spark, sf_dir)["events"]
        .filter(F.col("user_id") < 50)
        .select(
            F.col("user_id").alias("e_user"),
            "ts",
            F.floor(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    joined = ev.join(
        scd2,
        (F.col("e_user") == scd2["user_id"])
        & (F.col("ts") >= scd2["valid_from"])
        & (F.col("ts") < scd2["valid_to"]),
    )
    return (
        joined.groupBy("user_id", "state", "valid_from")
        .agg(F.count("*").alias("n_events"), F.sum("cents").alias("value_cents"))
        .orderBy("user_id", "valid_from")
    )


Q174_SQL = """
WITH ev AS (
  SELECT user_id, event_type AS state, ts, event_id
  FROM events WHERE user_id < 50
),
changes AS (
  SELECT user_id, state, ts, event_id,
         LAG(state) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS _prev
  FROM ev
),
scd2 AS (
  SELECT user_id, state, ts AS valid_from,
         COALESCE(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                  TIMESTAMP '2200-01-01 00:00:00') AS valid_to
  FROM changes WHERE _prev IS NULL OR _prev != state
),
pts AS (
  SELECT user_id, ts, CAST(FLOOR(value * 100) AS BIGINT) AS cents
  FROM events WHERE user_id < 50
)
SELECT s.user_id, s.state, s.valid_from,
       COUNT(*) AS n_events, SUM(p.cents) AS value_cents
FROM pts p JOIN scd2 s
  ON p.user_id = s.user_id AND p.ts >= s.valid_from AND p.ts < s.valid_to
GROUP BY 1, 2, 3 ORDER BY s.user_id, s.valid_from
"""


# --- q175: group-wise Pearson correlation ------------------------------------


def q175_brand_discount_qty_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation between discount and quantity PER BRAND — the
    group-wise correlation matrix cell (is deeper discounting moving
    volume for this brand?), complementing the rolling global form
    (q163) and the rank-based form (q141).

    Discounts quantize to exact basis points per row; all six moment
    sums are integer aggregates in ONE per-brand pass (part is a
    dimension broadcast), and the correlation is per-row IEEE arithmetic
    on those exact integers.  Zero-variance groups yield NULL.
    Output: (p_brand, n_items, corr_num, corr), brand ascending."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].select(
        "l_partkey",
        F.floor(F.col("l_discount") * 100).cast("long").alias("x"),
        F.floor("l_quantity").cast("long").alias("y"),
    )
    part = t["part"].select("p_partkey", "p_brand")
    m = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("y") * F.col("y")).alias("syy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
        )
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    corr = F.when(
        (vx > 0) & (vy > 0),
        num.cast("double") / (F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double"))),
    )
    return m.select(
        "p_brand",
        F.col("n").alias("n_items"),
        num.alias("corr_num"),
        corr.alias("corr"),
    ).orderBy("p_brand")


Q175_SQL = """
WITH m AS (
  SELECT p_brand, COUNT(*) AS n,
         SUM(CAST(FLOOR(l_discount * 100) AS BIGINT)) AS sx,
         SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS sy,
         SUM(CAST(FLOOR(l_discount * 100) AS BIGINT)
             * CAST(FLOOR(l_discount * 100) AS BIGINT)) AS sxx,
         SUM(CAST(FLOOR(l_quantity) AS BIGINT)
             * CAST(FLOOR(l_quantity) AS BIGINT)) AS syy,
         SUM(CAST(FLOOR(l_discount * 100) AS BIGINT)
             * CAST(FLOOR(l_quantity) AS BIGINT)) AS sxy
  FROM lineitem JOIN part ON p_partkey = l_partkey
  GROUP BY 1
)
SELECT p_brand, n AS n_items,
       n * sxy - sx * sy AS corr_num,
       CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
            THEN CAST(n * sxy - sx * sy AS DOUBLE)
                 / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                    * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
       END AS corr
FROM m ORDER BY p_brand
"""


# --- q176: frequent triple itemsets ------------------------------------------

def q176_frequent_part_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top frequent 3-itemsets over order baskets (market-basket mining
    one level above q79's pair lift / q120's triangle census).

    The triple fan-out is generated WITHIN baskets by a double
    self-join on the order key with `p1 < p2 < p3` — C(basket,3) rows
    per order, bounded by basket size (~7), never a cross-basket
    product.  Distinct-per-basket first so duplicate lineitems of the
    same part can't inflate support.  The top-20 cut is a
    TakeOrderedAndProject with full key tie-break, so the result is
    deterministic at any support level (no data-dependent threshold).
    Output: (p1, p2, p3, support), support desc / keys asc, limit 20."""
    li = (
        load_tables(spark, sf_dir)["lineitem"]
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p1"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p2"))
    c = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p3"))
    triples = (
        a.join(b, "ok")
        .filter(F.col("p1") < F.col("p2"))
        .join(c, "ok")
        .filter(F.col("p2") < F.col("p3"))
        .groupBy("p1", "p2", "p3")
        .agg(F.count("*").alias("support"))
    )
    return triples.orderBy(F.desc("support"), "p1", "p2", "p3").limit(20)


Q176_SQL = """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
triples AS (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2, c.l_partkey AS p3,
         COUNT(*) AS support
  FROM li a
  JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  JOIN li c ON a.l_orderkey = c.l_orderkey AND b.l_partkey < c.l_partkey
  GROUP BY 1, 2, 3
)
SELECT p1, p2, p3, support
FROM triples ORDER BY support DESC, p1, p2, p3 LIMIT 20
"""


# --- q177: quality pass rates with Wilson bounds -----------------------------

_Q177_LO, _Q177_HI = 200, 2000  # absolute doc-length gate (Gopher-style)


def q177_quality_pass_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source pass rate of an absolute quality gate (document length
    in [200, 2000] chars) with a Wilson 95% interval — the uncertainty-
    aware ingest scoreboard (a source at 80% over 10 docs is NOT the
    same evidence as 80% over 10,000; the interval says so).

    Counts are one aggregate scan; the Wilson bounds (z=2, so z^2=4 stays
    integer) are per-row IEEE arithmetic on the exact (k, n) pair with
    identical operand order in both engines — the repo's standard
    final-expression float discipline.
    Output: (source, n_docs, n_pass, rate, wilson_lo, wilson_hi),
    source ascending."""
    docs = load_tables(spark, sf_dir)["documents"]
    agg = docs.groupBy("source").agg(
        F.count("*").alias("n"),
        F.count(
            F.when(
                (F.col("n_chars") >= _Q177_LO) & (F.col("n_chars") <= _Q177_HI), True
            )
        ).alias("k"),
    )
    n, k = F.col("n"), F.col("k")
    half = F.lit(2.0) * F.sqrt((k * (n - k)) / n + F.lit(1.0))
    return agg.select(
        "source",
        n.alias("n_docs"),
        k.alias("n_pass"),
        (k / n.cast("double")).alias("rate"),
        ((k + 2 - half) / (n + 4)).alias("wilson_lo"),
        ((k + 2 + half) / (n + 4)).alias("wilson_hi"),
    ).orderBy("source")


Q177_SQL = f"""
WITH agg AS (
  SELECT source, COUNT(*) AS n,
         COUNT(*) FILTER (n_chars BETWEEN {_Q177_LO} AND {_Q177_HI}) AS k
  FROM documents GROUP BY 1
)
SELECT source, n AS n_docs, k AS n_pass,
       k / CAST(n AS DOUBLE) AS rate,
       (k + 2 - 2.0 * sqrt((k * (n - k)) / n + 1.0)) / (n + 4) AS wilson_lo,
       (k + 2 + 2.0 * sqrt((k * (n - k)) / n + 1.0)) / (n + 4) AS wilson_hi
FROM agg ORDER BY source
"""


# --- q178: deterministic A/B experiment readout ------------------------------


def q178_ab_experiment_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic A/B assignment and per-arm readout: users split by
    md5 parity (the engine-portable bucketing every operator here uses),
    purchase behaviour aggregated per arm — the experiment-analysis shape
    where assignment must be REPRODUCIBLE across engines, runs, and
    backfills (no RAND(), ever).

    All cross-row sums are exact (counts, integer cents, integer squared
    cents for the variance numerator). The variance numerator
    ``n*q - s^2`` grows as (rows x cents)^2 and passed 2^63 at x100 data
    (the fleet x100 sweep aborted on the ANSI long multiply), so it is
    computed in decimal(38,0) — exact to 1e38, matching the oracle's
    HUGEINT — and the emitted column is the population variance itself
    (numerator / n^2), one double division at the end like the mean.
    Output: (arm, n_users, n_events, value_cents, var_cents2,
    mean_cents), arm ascending."""
    from hadoop_jobanalyzer_spark.operators.sampling import hash_bucket

    ev = load_tables(spark, sf_dir)["events"].filter(
        F.col("event_type") == "purchase"
    )
    base = ev.select(
        hash_bucket(F.col("user_id"), 2).alias("arm"),
        "user_id",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    agg = base.groupBy("arm").agg(
        F.count_distinct("user_id").alias("n_users"),
        F.count("*").alias("n"),
        F.sum("cents").alias("s"),
        F.sum(F.col("cents") * F.col("cents")).alias("q"),
    )
    var_num = F.col("n").cast("decimal(38,0)") * F.col("q") - F.col("s").cast(
        "decimal(38,0)"
    ) * F.col("s")
    return agg.select(
        "arm",
        "n_users",
        F.col("n").alias("n_events"),
        F.col("s").alias("value_cents"),
        F.round(
            var_num.cast("double")
            / (F.col("n").cast("double") * F.col("n").cast("double")),
            6,
        ).alias("var_cents2"),
        (F.col("s") / F.col("n").cast("double")).alias("mean_cents"),
    ).orderBy("arm")


Q178_SQL = """
WITH base AS (
  SELECT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 2 AS arm,
         user_id,
         CAST(FLOOR(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
),
agg AS (
  SELECT arm, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n,
         SUM(cents) AS s, SUM(cents * cents) AS q
  FROM base GROUP BY 1
)
SELECT arm, n_users, n AS n_events, s AS value_cents,
       ROUND(CAST(n * q - s * s AS DOUBLE)
             / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6) AS var_cents2,
       s / CAST(n AS DOUBLE) AS mean_cents
FROM agg ORDER BY arm
"""


# --- q179-q183: remaining expressible TPC-H shapes ---------------------------


def q179_forecast_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: revenue delta from a discount band in one ship
    year — the canonical zero-join, full-pushdown aggregate.  Every
    predicate (date range, discount band, quantity cap) reaches the
    parquet scan (asserted in the plan guard), so at 100 TB the query
    reads only row groups whose footer envelopes intersect the band.
    Revenue is exact cents from the per-row floored product.
    Output: one row (n_items, revenue_cents)."""
    li = load_tables(spark, sf_dir)["lineitem"]
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.count("*").alias("n_items"),
            F.sum(
                F.floor(F.col("l_extendedprice") * F.col("l_discount") * 100).cast(
                    "long"
                )
            ).alias("revenue_cents"),
        )
    )


Q179_SQL = """
SELECT COUNT(*) AS n_items,
       SUM(CAST(FLOOR(l_extendedprice * l_discount * 100) AS BIGINT))
         AS revenue_cents
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


def q180_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: the PROMO part type's share of each ship-month's
    revenue — conditional aggregation over one dimension-broadcast join,
    with the share as the single end division of exact cents.
    Output: (ship_month, promo_cents, total_cents, promo_share),
    month ascending."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].select(
        "l_partkey",
        F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"),
        F.floor(
            F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100
        ).cast("long").alias("rev_cents"),
    )
    part = t["part"].select("p_partkey", "p_type")
    j = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
    return (
        j.groupBy("ship_month")
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", F.col("rev_cents")).otherwise(0)).alias(
                "promo_cents"
            ),
            F.sum("rev_cents").alias("total_cents"),
        )
        .select(
            "ship_month",
            "promo_cents",
            "total_cents",
            (F.col("promo_cents") / F.col("total_cents").cast("double")).alias(
                "promo_share"
            ),
        )
        .orderBy("ship_month")
    )


Q180_SQL = """
SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
       SUM(CASE WHEN p_type = 'PROMO'
                THEN CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)
                ELSE 0 END) AS promo_cents,
       SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT))
         AS total_cents,
       SUM(CASE WHEN p_type = 'PROMO'
                THEN CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)
                ELSE 0 END)
         / CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT))
                AS DOUBLE) AS promo_share
FROM lineitem JOIN part ON p_partkey = l_partkey
GROUP BY 1 ORDER BY ship_month
"""

_Q181_MIN_QTY = 250


def q181_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers behind the largest-volume orders
    (basket quantity above a threshold) — the HAVING-then-join-back
    decorrelation.  The heavy side is one per-order aggregate; only the
    qualifying order keys (a tiny filtered set) join back to orders and
    the customer dimension.
    Output: (c_custkey, c_name, o_orderkey, order_qty, o_totalprice_cents),
    qty desc / orderkey asc."""
    t = load_tables(spark, sf_dir)
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum(F.floor("l_quantity").cast("long")).alias("order_qty"))
        .filter(F.col("order_qty") > _Q181_MIN_QTY)
    )
    orders = t["orders"].select(
        "o_orderkey",
        "o_custkey",
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("o_totalprice_cents"),
    )
    cust = t["customer"].select("c_custkey", "c_name")
    return (
        big.join(orders, big["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), F.col("o_custkey") == cust["c_custkey"])
        .select("c_custkey", "c_name", "o_orderkey", "order_qty", "o_totalprice_cents")
        .orderBy(F.desc("order_qty"), "o_orderkey")
    )


Q181_SQL = f"""
WITH big AS (
  SELECT l_orderkey, SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS order_qty
  FROM lineitem GROUP BY 1
  HAVING SUM(CAST(FLOOR(l_quantity) AS BIGINT)) > {_Q181_MIN_QTY}
)
SELECT c_custkey, c_name, o_orderkey, order_qty,
       CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS o_totalprice_cents
FROM big
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY order_qty DESC, o_orderkey
"""


def q182_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: the distribution of orders-per-customer — a LEFT
    join from the customer dimension so zero-order customers count in
    the 0 bucket, then a count-of-counts.

    The per-customer order count aggregates BELOW the join (the classic
    Q13 pushdown): the join carries one pre-counted row per ordering
    customer instead of every raw order row.  Joining raw orders first
    was 10x the rows through the join once the customer side outgrew the
    broadcast threshold — the fleet x100 sweep measured it at 106x wall
    for 100x data (the plan-flip step, not true super-linearity); with
    the pushdown the join is customer-grain on both sides at any scale.
    Output: (n_orders, n_customers), customer count desc / n_orders desc."""
    t = load_tables(spark, sf_dir)
    ocnt = (
        t["orders"]
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(F.count("*").alias("_n"))
    )
    per_cust = (
        t["customer"]
        .select("c_custkey")
        .join(ocnt, "c_custkey", "left")
        .select(F.coalesce(F.col("_n"), F.lit(0).cast("long")).alias("n_orders"))
    )
    return (
        per_cust.groupBy("n_orders")
        .agg(F.count("*").alias("n_customers"))
        .orderBy(F.desc("n_customers"), F.desc("n_orders"))
    )


Q182_SQL = """
WITH ocnt AS (
  SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY 1
),
per_cust AS (
  SELECT c_custkey, COALESCE(n, 0) AS n_orders
  FROM customer LEFT JOIN ocnt ON o_custkey = c_custkey
)
SELECT n_orders, COUNT(*) AS n_customers
FROM per_cust GROUP BY 1
ORDER BY n_customers DESC, n_orders DESC
"""


def q183_top_supplier_per_quarter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the top revenue supplier(s) per ship quarter —
    the 'equal to a scalar MAX subquery' pattern, decorrelated to a
    per-quarter window MAX so ties are kept exactly as Q15 requires and
    the revenue aggregate is computed once, not once per supplier.
    Output: (quarter, s_suppkey, s_name, revenue_cents), quarter asc /
    suppkey asc."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].select(
        "l_suppkey",
        F.concat(
            F.year("l_shipdate").cast("string"),
            F.lit("-Q"),
            F.quarter("l_shipdate").cast("string"),
        ).alias("quarter"),
        F.floor(
            F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100
        ).cast("long").alias("rev_cents"),
    )
    rev = li.groupBy("quarter", "l_suppkey").agg(
        F.sum("rev_cents").alias("revenue_cents")
    )
    w = Window.partitionBy("quarter")
    supp = t["supplier"].select("s_suppkey", "s_name")
    return (
        rev.withColumn("_mx", F.max("revenue_cents").over(w))
        .filter(F.col("revenue_cents") == F.col("_mx"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp["s_suppkey"])
        .select("quarter", "s_suppkey", "s_name", "revenue_cents")
        .orderBy("quarter", "s_suppkey")
    )


Q183_SQL = """
WITH rev AS (
  SELECT CAST(EXTRACT(year FROM l_shipdate) AS VARCHAR) || '-Q'
           || CAST(EXTRACT(quarter FROM l_shipdate) AS VARCHAR) AS quarter,
         l_suppkey,
         SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT))
           AS revenue_cents
  FROM lineitem GROUP BY 1, 2
),
mx AS (
  SELECT quarter, l_suppkey, revenue_cents,
         MAX(revenue_cents) OVER (PARTITION BY quarter) AS _mx
  FROM rev
)
SELECT quarter, s_suppkey, s_name, revenue_cents
FROM mx JOIN supplier ON s_suppkey = l_suppkey
WHERE revenue_cents = _mx
ORDER BY quarter, s_suppkey
"""


# --- q184: exact per-label medoids via applyInPandas -------------------------


MEDOID_MAX_GROUP = 2_000_000  # ~2 GB of 64-dim int64 rows per pandas task


def q184_label_medoids(
    spark: SparkSession, sf_dir: str, max_group: int = MEDOID_MAX_GROUP
) -> DataFrame:
    """Exact medoid per label: the member vector minimizing the sum of
    squared L2 distances to its label-mates — the IVF/cluster refinement
    step (a medoid, unlike the centroid, IS a corpus vector, so it can
    seed retrieval or deduplication directly).

    This is the repo's grouped-map Arrow boundary (``applyInPandas``):
    each label group crosses to pandas ONCE and numpy evaluates the sums
    via the exact algebraic identity
    ``sum_j ||x_i - x_j||^2 = n*||x_i||^2 + sum_j ||x_j||^2 - 2*x_i.S``
    (``S = sum_j x_j``) — O(n*d) per group, NOT the naive O(n^2) Gram
    matrix (r9: the quadratic form OOM'd a single executor on a skewed
    label and dominated the x100 sweep at slope 76.7). Vectors are
    1/1000-quantized int64, so the math is EXACT and engine-portable
    (the DuckDB oracle recomputes the same integer sums relationally).

    Scale contract, now in code rather than prose: a group larger than
    ``max_group`` is reduced to a DETERMINISTIC pseudo-random sample of
    ``max_group`` members (Knuth-hash order on vec_id, so the result is
    independent of partitioning) before the medoid math — one hot label
    cannot materialize unbounded memory in its task. ``n_members``
    always reports the TRUE group size; ``sum_sq_dist`` is over the
    sample when capped (the default cap is far above any test SF, so
    oracle differentials are exact).
    Output: (label, medoid_vec_id, n_members, sum_sq_dist), label asc."""
    import pandas as pd

    emb = load_tables(spark, sf_dir)["embeddings"]
    q = F.transform(
        "embedding", lambda x: F.floor(x.cast("double") * 1000).cast("long")
    )
    quant = emb.select("label", "vec_id", q.alias("q"))

    def medoid(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        true_n = len(pdf)
        if true_n > max_group:
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            # lexsort: hash-order selection, vec_id tiebreak — never frame
            # position, which would reintroduce partition dependence
            order = np.lexsort((ids, (ids * 2654435761) & 0xFFFFFFFF))
            pdf = pdf.iloc[order[:max_group]]
        x = np.stack(pdf["q"].to_numpy()).astype(np.int64)
        n = len(pdf)
        norms = (x * x).sum(axis=1)
        sums = n * norms + norms.sum() - 2 * (x @ x.sum(axis=0))
        order = sorted(range(n), key=lambda i: (sums[i], pdf["vec_id"].iat[i]))
        best = order[0]
        return pd.DataFrame(
            {
                "label": [int(pdf["label"].iat[0])],
                "medoid_vec_id": [int(pdf["vec_id"].iat[best])],
                "n_members": [true_n],
                "sum_sq_dist": [int(sums[best])],
            }
        )

    out_schema = "label int, medoid_vec_id long, n_members long, sum_sq_dist long"
    return (
        quant.groupBy("label").applyInPandas(medoid, out_schema).orderBy("label")
    )


Q184_SQL = """
WITH quant AS (
  SELECT label, vec_id,
         list_transform(embedding,
                        x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
  FROM embeddings
),
sums AS (
  SELECT a.label, a.vec_id,
         COALESCE(SUM(list_sum(list_transform(range(1, 65),
                  i -> (a.q[i] - b.q[i]) * (a.q[i] - b.q[i])))), 0) AS s
  FROM quant a
  LEFT JOIN quant b ON a.label = b.label AND a.vec_id != b.vec_id
  GROUP BY 1, 2
),
ranked AS (
  SELECT label, vec_id, s,
         ROW_NUMBER() OVER (PARTITION BY label ORDER BY s, vec_id) AS rn,
         COUNT(*) OVER (PARTITION BY label) AS n_members
  FROM sums
)
SELECT label, vec_id AS medoid_vec_id, n_members, s AS sum_sq_dist
FROM ranked WHERE rn = 1 ORDER BY label
"""


# --- q185: relaxed (bounded-gap) funnel conversion ---------------------------

_Q185_MAX_GAP_EVENTS = 5
_Q185_WITHIN_MS = 2 * 24 * 3600 * 1000


def q185_relaxed_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-gap funnel: a view converts if a purchase by the same user
    occurs within the next 5 EVENTS (any types between) and 2 days — the
    MATCH_RECOGNIZE `A (ANY){0,k} B` quantifier, relaxing q148's strict
    contiguity.

    The k-lookahead is k LEAD columns over ONE per-user window (no
    self-join, no array collect); the existence test is a k-way OR the
    optimizer folds into one codegen expression.  Per-user conversion
    counts are exact integers; the rate is the single end division.
    Output: (user_id, n_views, n_converted, convert_rate), user asc."""
    from hadoop_jobanalyzer_spark.util import epoch_ms

    events = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ms = epoch_ms("ts")
    cols = [F.col("user_id"), F.col("event_type"), ms.alias("ms0")]
    for j in range(1, _Q185_MAX_GAP_EVENTS + 1):
        cols.append(F.lead("event_type", j).over(w).alias(f"ty{j}"))
        cols.append(F.lead(ms, j).over(w).alias(f"ms{j}"))
    s = events.select(*cols)
    converted = None
    for j in range(1, _Q185_MAX_GAP_EVENTS + 1):
        hit = (F.col(f"ty{j}") == "purchase") & (
            F.col(f"ms{j}") - F.col("ms0") <= _Q185_WITHIN_MS
        )
        converted = hit if converted is None else (converted | hit)
    views = s.filter(F.col("event_type") == "view")
    return (
        views.groupBy("user_id")
        .agg(
            F.count("*").alias("n_views"),
            F.count(F.when(converted, True)).alias("n_converted"),
        )
        .select(
            "user_id",
            "n_views",
            "n_converted",
            (F.col("n_converted") / F.col("n_views").cast("double")).alias(
                "convert_rate"
            ),
        )
        .orderBy("user_id")
    )


def _q185_sql() -> str:
    k, t = _Q185_MAX_GAP_EVENTS, _Q185_WITHIN_MS
    leads = ",\n         ".join(
        f"LEAD(event_type, {j}) OVER w AS ty{j},\n"
        f"         LEAD(epoch_ms(ts), {j}) OVER w AS ms{j}"
        for j in range(1, k + 1)
    )
    hits = " OR ".join(
        f"(ty{j} = 'purchase' AND ms{j} - ms0 <= {t})" for j in range(1, k + 1)
    )
    return f"""
WITH s AS (
  SELECT user_id, event_type, epoch_ms(ts) AS ms0,
         {leads}
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, COUNT(*) AS n_views,
       COUNT(*) FILTER ({hits}) AS n_converted,
       COUNT(*) FILTER ({hits}) / CAST(COUNT(*) AS DOUBLE) AS convert_rate
FROM s WHERE event_type = 'view'
GROUP BY 1 ORDER BY user_id
"""


# --- q186: late-order priority census (TPC-H Q4 shape) -----------------------

_Q186_LATE_DAYS = 90


def q186_late_order_priority_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders with AT LEAST ONE late line item (shipped
    more than 90 days after the order date), counted per order priority —
    the correlated EXISTS decorrelated to a LEFT SEMI join.

    The semi join keeps the fact side single-scan and never duplicates an
    order with several late items (the trap a plain inner join + distinct
    would pay a shuffle to undo).  The lateness predicate compares two
    timestamp columns directly — no epoch math needed.
    Output: (o_orderpriority, n_late_orders), priority ascending."""
    t = load_tables(spark, sf_dir)
    orders = t["orders"].select("o_orderkey", "o_orderpriority", "o_orderdate")
    li = t["lineitem"].select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders["o_orderkey"] == li["l_orderkey"])
        & (
            li["l_shipdate"]
            > orders["o_orderdate"] + F.expr(f"INTERVAL {_Q186_LATE_DAYS} DAYS")
        ),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_late_orders"))
        .orderBy("o_orderpriority")
    )


Q186_SQL = f"""
SELECT o_orderpriority, COUNT(*) AS n_late_orders
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey
    AND l_shipdate > o_orderdate + INTERVAL {_Q186_LATE_DAYS} DAY
)
GROUP BY 1 ORDER BY o_orderpriority
"""


# --- q187: OHLC time-series bars ---------------------------------------------

_Q187_BAR_S = 300  # 5-minute bars


def q187_five_minute_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC resampling: the purchase-value stream rolled into 5-minute
    bars with open/high/low/close/volume — the hypertable `time_bucket`
    + first/last aggregation every metrics store runs.

    Open and close are first/last BY EVENT TIME with the event id as the
    deterministic tie-break, computed via `min_by`/`max_by` over a
    (epoch_ms, event_id) packed ordering key — one aggregate pass, no
    ranking window, no self-join.  Values are exact integer cents;
    the mean is the single end division.
    Output: (bar, n_trades, open_c, high_c, low_c, close_c, mean_c),
    bar ascending."""
    from hadoop_jobanalyzer_spark.util import epoch_ms

    events = load_tables(spark, sf_dir)["events"].filter(
        F.col("event_type") == "purchase"
    )
    base = events.select(
        (F.floor(epoch_s("ts") / _Q187_BAR_S)).cast("long").alias("bar"),
        # packed total order: ms * 2^20 + event_id (ids fit comfortably)
        (epoch_ms("ts") * F.lit(1 << 20) + F.col("event_id")).alias("ord"),
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    return (
        base.groupBy("bar")
        .agg(
            F.count("*").alias("n_trades"),
            F.min_by("cents", "ord").alias("open_c"),
            F.max("cents").alias("high_c"),
            F.min("cents").alias("low_c"),
            F.max_by("cents", "ord").alias("close_c"),
            F.sum("cents").alias("_sum"),
        )
        .select(
            "bar",
            "n_trades",
            "open_c",
            "high_c",
            "low_c",
            "close_c",
            (F.col("_sum") / F.col("n_trades").cast("double")).alias("mean_c"),
        )
        .orderBy("bar")
    )


Q187_SQL = f"""
WITH base AS (
  SELECT CAST(FLOOR(epoch(ts)) AS BIGINT) // {_Q187_BAR_S} AS bar,
         epoch_ms(ts) * {1 << 20} + event_id AS ord,
         CAST(FLOOR(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
)
SELECT bar, COUNT(*) AS n_trades,
       arg_min(cents, ord) AS open_c,
       MAX(cents) AS high_c,
       MIN(cents) AS low_c,
       arg_max(cents, ord) AS close_c,
       SUM(cents) / CAST(COUNT(*) AS DOUBLE) AS mean_c
FROM base GROUP BY 1 ORDER BY bar
"""


MINING_QUERIES = {
    "q153_gapfill_interpolation": (q153_gapfill_interpolation, Q153_SQL),
    "q154_part_name_edit_pairs": (q154_part_name_edit_pairs, Q154_SQL),
    "q155_cheapest_supplier_per_part": (q155_cheapest_supplier_per_part, Q155_SQL),
    "q156_dormant_segment_profile": (q156_dormant_segment_profile, Q156_SQL),
    "q157_next_word_branching": (q157_next_word_branching, Q157_SQL),
    "q158_srp_lsh_buckets": (q158_srp_lsh_buckets, Q158_SQL),
    "q159_hybrid_search_rrf": (q159_hybrid_search_rrf, _q159_sql()),
    "q160_hourly_anomaly_flags": (q160_hourly_anomaly_flags, Q160_SQL),
    "q161_nation_trade_volume": (q161_nation_trade_volume, Q161_SQL),
    "q162_customer_spend_ranks": (q162_customer_spend_ranks, Q162_SQL),
    "q163_rolling_correlation": (q163_rolling_correlation, Q163_SQL),
    "q164_weighted_median_value": (q164_weighted_median_value, Q164_SQL),
    "q165_local_supplier_volume": (q165_local_supplier_volume, Q165_SQL),
    "q166_decayed_engagement": (q166_decayed_engagement, Q166_SQL),
    "q167_funnel_duration_quartiles": (q167_funnel_duration_quartiles, Q167_SQL),
    "q168_ann_recall_audit": (q168_ann_recall_audit, _q168_sql()),
    "q169_dedup_candidate_audit": (q169_dedup_candidate_audit, _q169_sql()),
    "q170_band_revenue": (q170_band_revenue, _q170_sql()),
    "q171_returned_item_customers": (q171_returned_item_customers, Q171_SQL),
    "q172_source_vocab_jaccard": (q172_source_vocab_jaccard, Q172_SQL),
    "q173_cohort_ltv_curves": (q173_cohort_ltv_curves, Q173_SQL),
    "q174_temporal_lookup_join": (q174_temporal_lookup_join, Q174_SQL),
    "q175_brand_discount_qty_corr": (q175_brand_discount_qty_corr, Q175_SQL),
    "q176_frequent_part_triples": (q176_frequent_part_triples, Q176_SQL),
    "q177_quality_pass_rates": (q177_quality_pass_rates, Q177_SQL),
    "q178_ab_experiment_readout": (q178_ab_experiment_readout, Q178_SQL),
    "q179_forecast_revenue_delta": (q179_forecast_revenue_delta, Q179_SQL),
    "q180_promo_revenue_share": (q180_promo_revenue_share, Q180_SQL),
    "q181_large_volume_customers": (q181_large_volume_customers, Q181_SQL),
    "q182_order_count_distribution": (q182_order_count_distribution, Q182_SQL),
    "q183_top_supplier_per_quarter": (q183_top_supplier_per_quarter, Q183_SQL),
    "q184_label_medoids": (q184_label_medoids, Q184_SQL),
    "q185_relaxed_funnel_conversion": (q185_relaxed_funnel_conversion, _q185_sql()),
    "q186_late_order_priority_census": (q186_late_order_priority_census, Q186_SQL),
    "q187_five_minute_bars": (q187_five_minute_bars, Q187_SQL),
}
