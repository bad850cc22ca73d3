"""Behavioural / data-quality queries q140+: gaps-and-islands streaks,
Spearman rank correlation, Benford first-digit QA, and the declarative
expectations engine.

Same contract as the other plan modules: each query is a (DataFrame
builder, DuckDB oracle SQL) pair, and the repo-wide determinism rules
apply — integer/exact-decimal cross-row accumulation, float division only
once at the end with identical parenthesization in both engines, ties
broken by a deterministic id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hadoop_jobanalyzer_spark.plans.tables import load_tables
from hadoop_jobanalyzer_spark.util import materialize


# --- q140: longest consecutive-day order streaks (gaps & islands) ------------


def q140_order_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest run of consecutive order-days per customer, histogrammed.

    The gaps-and-islands idiom: distinct (customer, epoch-day), then
    ``day - row_number()`` is constant within a consecutive run, so one
    per-customer window turns runs into group keys — no self-join, no
    sequence materialization. Scales: the distinct and the window share
    the customer-keyed shuffle domain, and everything after the first
    aggregate is one-row-per-customer sized.
    Output: (best_streak, n_customers), streak ascending."""
    orders = load_tables(spark, sf_dir)["orders"]
    days = (
        orders.select(
            "o_custkey",
            F.datediff(
                F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
            ).alias("day"),
        )
        .dropDuplicates()
    )
    w = Window.partitionBy("o_custkey").orderBy("day")
    streaks = (
        days.withColumn("island", F.col("day") - F.row_number().over(w))
        .groupBy("o_custkey", "island")
        .agg(F.count("*").alias("run_len"))
        .groupBy("o_custkey")
        .agg(F.max("run_len").alias("best_streak"))
    )
    return (
        streaks.groupBy("best_streak")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("best_streak")
    )


Q140_SQL = """
WITH days AS (
  SELECT DISTINCT o_custkey,
         CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS day
  FROM orders
),
runs AS (
  SELECT o_custkey,
         day - ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY day) AS island
  FROM days
),
best AS (
  SELECT o_custkey, MAX(run_len) AS best_streak
  FROM (SELECT o_custkey, island, COUNT(*) AS run_len
        FROM runs GROUP BY o_custkey, island)
  GROUP BY o_custkey
)
SELECT best_streak, COUNT(*) AS n_customers
FROM best GROUP BY best_streak ORDER BY best_streak
"""


# --- q141: Spearman rank correlation (chars vs tokens, per source) -----------


def q141_spearman_len_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rho between document char length and token count, per
    source — the rank-based drift detector (robust to outliers, no float
    moments). Ranks are ``row_number`` with doc_id tiebreak (identical in
    both engines), the d^2 sum is an exact BIGINT, and rho performs its
    single float division at the very end. One exchange: both rank
    windows share the source partitioning."""
    docs = load_tables(spark, sf_dir)["documents"]
    d = docs.select(
        "doc_id",
        "source",
        "n_chars",
        F.size(F.split("text", " ")).alias("n_tokens"),
    )
    wc = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    wt = Window.partitionBy("source").orderBy("n_tokens", "doc_id")
    r = d.withColumn("rc", F.row_number().over(wc)).withColumn(
        "rt", F.row_number().over(wt)
    )
    g = r.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(
            (F.col("rc") - F.col("rt")) * (F.col("rc") - F.col("rt"))
        ).alias("s_d2"),
    )
    n = F.col("n_docs")
    rho = F.lit(1.0) - (F.lit(6.0) * F.col("s_d2")) / (n * (n * n - F.lit(1)))
    return g.select("source", "n_docs", "s_d2", rho.alias("rho")).orderBy("source")


Q141_SQL = """
WITH d AS (
  SELECT doc_id, source, n_chars, LEN(STRING_SPLIT(text, ' ')) AS n_tokens
  FROM documents
),
r AS (
  SELECT source,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rc,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_tokens, doc_id) AS rt
  FROM d
),
g AS (
  SELECT source, COUNT(*) AS n_docs, SUM((rc - rt) * (rc - rt)) AS s_d2
  FROM r GROUP BY source
)
SELECT source, n_docs, s_d2,
       1.0 - (6.0 * s_d2) / (n_docs * (n_docs * n_docs - 1)) AS rho
FROM g ORDER BY source
"""


# --- q142: Benford first-digit audit -----------------------------------------


def q142_benford_order_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of order values — the classic
    fabricated-data / unit-drift audit. The digit comes from the INTEGER
    part (floor -> bigint -> string), never from float formatting, so both
    engines bucket identically; the share is one IEEE division over a
    9-row window. One aggregate scan."""
    orders = load_tables(spark, sf_dir)["orders"]
    digit = F.substring(
        F.floor("o_totalprice").cast("long").cast("string"), 1, 1
    ).alias("digit")
    counts = orders.select(digit).groupBy("digit").agg(F.count("*").alias("n"))
    share = (F.col("n") / F.sum("n").over(Window.partitionBy())).alias("share")
    return counts.select("digit", "n", share).orderBy("digit")


Q142_SQL = """
WITH c AS (
  SELECT SUBSTR(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS digit,
         COUNT(*) AS n
  FROM orders GROUP BY 1
)
SELECT digit, n, n / SUM(n) OVER () AS share
FROM c ORDER BY digit
"""


# --- q143: declarative expectations report -----------------------------------


def _suite():
    from hadoop_jobanalyzer_spark.operators.expectations import Check

    return {
        "orders": [
            Check("orderkey_not_null", "o_orderkey", "not_null"),
            Check("orderkey_unique", "o_orderkey", "unique"),
            Check("totalprice_non_negative", "o_totalprice", "non_negative"),
            Check("status_in_set", "o_orderstatus", "in_set", values=("O", "F", "P")),
            Check("priority_format", "o_orderpriority", "matches", pattern="^[1-5]-"),
        ],
        "customer": [
            Check("custkey_unique", "c_custkey", "unique"),
            Check("name_format", "c_name", "matches", pattern="^Customer#"),
            Check("acctbal_non_negative", "c_acctbal", "non_negative"),
        ],
        "lineitem": [
            Check("quantity_range", "l_quantity", "between", lo=1, hi=50),
            Check("discount_range", "l_discount", "between", lo=0.0, hi=0.1),
        ],
        "events": [
            Check("event_id_unique", "event_id", "unique"),
            Check("value_non_negative", "value", "non_negative"),
        ],
    }


def q143_expectations_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality gate over four tables (operators/expectations.py):
    each table's whole check suite folds into ONE aggregate scan, and the
    per-check rows are an in-row stack unpivot of that single aggregate
    row — constraint count never adds passes over the data. The
    acctbal_non_negative check is intentionally violated by the data
    (negative balances exist) so the report exercises the failure path."""
    from hadoop_jobanalyzer_spark.operators.expectations import suite_report

    tables = load_tables(spark, sf_dir)
    return suite_report(tables, _suite()).orderBy("tbl", "check_name")


Q143_SQL = """
WITH checks AS (
  SELECT 'orders' AS tbl, 'orderkey_not_null' AS check_name,
         COUNT(*) FILTER (o_orderkey IS NULL) AS n_violations FROM orders
  UNION ALL
  SELECT 'orders', 'orderkey_unique',
         COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) FROM orders
  UNION ALL
  SELECT 'orders', 'totalprice_non_negative',
         COUNT(*) FILTER (o_totalprice < 0) FROM orders
  UNION ALL
  SELECT 'orders', 'status_in_set',
         COUNT(*) FILTER (o_orderstatus NOT IN ('O', 'F', 'P')) FROM orders
  UNION ALL
  SELECT 'orders', 'priority_format',
         COUNT(*) FILTER (NOT regexp_matches(o_orderpriority, '^[1-5]-')) FROM orders
  UNION ALL
  SELECT 'customer', 'custkey_unique',
         COUNT(c_custkey) - COUNT(DISTINCT c_custkey) FROM customer
  UNION ALL
  SELECT 'customer', 'name_format',
         COUNT(*) FILTER (NOT regexp_matches(c_name, '^Customer#')) FROM customer
  UNION ALL
  SELECT 'customer', 'acctbal_non_negative',
         COUNT(*) FILTER (c_acctbal < 0) FROM customer
  UNION ALL
  SELECT 'lineitem', 'quantity_range',
         COUNT(*) FILTER (l_quantity < 1 OR l_quantity > 50) FROM lineitem
  UNION ALL
  SELECT 'lineitem', 'discount_range',
         COUNT(*) FILTER (l_discount < 0.0 OR l_discount > 0.1) FROM lineitem
  UNION ALL
  SELECT 'events', 'event_id_unique',
         COUNT(event_id) - COUNT(DISTINCT event_id) FROM events
  UNION ALL
  SELECT 'events', 'value_non_negative',
         COUNT(*) FILTER ("value" < 0) FROM events
)
SELECT tbl, check_name, n_violations, n_violations = 0 AS passed
FROM checks ORDER BY tbl, check_name
"""


# --- q144: small-quantity revenue (TPC-H Q17 shape) --------------------------


def q144_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue locked in small-quantity lines of one brand (TPC-H Q17
    shape): the correlated ``l_quantity < 0.2 * AVG(per part)`` subquery
    decorrelates into a per-part aggregate joined back to lineitem. The
    threshold is the cross-multiplied integer form ``5*qty*cnt < sum_qty``
    (quantities are integer-valued), money sums in DECIMAL(18,2), and the
    Q17 ``/7.0`` division happens once at the end. The brand-filtered part
    dim broadcasts; the only repeated shuffle key is l_partkey."""
    t = load_tables(spark, sf_dir)
    li, part = t["lineitem"], t["part"]
    per_part = li.groupBy("l_partkey").agg(
        F.sum("l_quantity").alias("sq"), F.count("*").alias("cnt")
    )
    brand_parts = part.filter(F.col("p_brand") == "Brand#4").select("p_partkey")
    small = (
        li.join(F.broadcast(brand_parts), li.l_partkey == brand_parts.p_partkey)
        .join(per_part, "l_partkey")
        .filter(
            F.lit(5) * F.col("l_quantity") * F.col("cnt") < F.col("sq")
        )
    )
    rev = F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
    return small.agg(
        F.count("*").alias("n_small_lines"),
        rev.cast("double").alias("revenue"),
        (rev.cast("double") / F.lit(7.0)).alias("avg_yearly"),
    )


Q144_SQL = """
WITH pa AS (
  SELECT l_partkey, SUM(l_quantity) AS sq, COUNT(*) AS cnt
  FROM lineitem GROUP BY 1
)
SELECT COUNT(*) AS n_small_lines,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly
FROM lineitem l
JOIN part p ON p_partkey = l.l_partkey AND p_brand = 'Brand#4'
JOIN pa ON pa.l_partkey = l.l_partkey
WHERE 5 * l_quantity * cnt < sq
"""


# --- q145: sole-late-supplier count (TPC-H Q21 shape) ------------------------


def q145_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who were the ONLY late shipper on multi-supplier orders
    (TPC-H Q21 shape). The double correlated EXISTS / NOT EXISTS
    decorrelates into aggregation: per (order, supplier) a late flag, per
    order the supplier count and late-supplier count, keep
    ``n_supp >= 2 AND n_late = 1`` and charge the one late supplier. Late
    means shipped > 60 days after order date (integer day math). All
    counts are exact integers; the supplier dim broadcasts at the end."""
    t = load_tables(spark, sf_dir)
    li, orders, supp = t["lineitem"], t["orders"], t["supplier"]
    late_flag = (
        F.datediff(
            F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
        )
        > 60
    ).cast("int")
    per_os = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select("l_orderkey", "l_suppkey", late_flag.alias("late"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("late").alias("late"))
    )
    per_order = per_os.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"), F.sum("late").alias("n_late")
    )
    blamed = (
        per_os.filter(F.col("late") == 1)
        .join(
            per_order.filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1)),
            "l_orderkey",
        )
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("numwait"))
    )
    return (
        blamed.join(F.broadcast(supp), blamed.l_suppkey == supp.s_suppkey)
        .select("s_name", "numwait")
        .orderBy(F.desc("numwait"), "s_name")
        .limit(10)
    )


Q145_SQL = """
WITH per_os AS (
  SELECT l_orderkey, l_suppkey,
         MAX(CASE WHEN CAST(l_shipdate AS DATE) - CAST(o_orderdate AS DATE) > 60
                  THEN 1 ELSE 0 END) AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2
),
per_order AS (
  SELECT l_orderkey, COUNT(*) AS n_supp, SUM(late) AS n_late
  FROM per_os GROUP BY 1
)
SELECT s_name, COUNT(*) AS numwait
FROM per_os
JOIN per_order USING (l_orderkey)
JOIN supplier ON s_suppkey = l_suppkey
WHERE late = 1 AND n_supp >= 2 AND n_late = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name LIMIT 10
"""


# --- q146/q147: bitmap audience index ----------------------------------------

_BM_BITS = 62  # bits per word — stay clear of the BIGINT sign bit


def _bitmap_relation(ev: DataFrame) -> DataFrame:
    """types x words bitmap relation (unordered) — see q146."""
    return (
        ev.select(
            "event_type",
            (F.col("user_id") / _BM_BITS).cast("long").alias("word"),
            F.expr(f"shiftleft(1L, CAST(user_id % {_BM_BITS} AS INT))").alias("bit"),
        )
        .groupBy("event_type", "word")
        .agg(F.expr("bit_or(bit)").alias("bits"))
    )


def q146_audience_bitmaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience membership as a bitmap index (roaring-bitmap shape): per
    event type, user ids pack into 62-bit words via
    ``bit_or(1 << (id % 62))`` keyed by ``id // 62``. ``bit_or`` is
    idempotent, so no distinct pass is needed — one partially-aggregated
    scan collapses any event volume to types x (max_id/62) words, and the
    relation is re-aggregable (daily -> monthly is the same bit_or).
    Intersections/unions over audiences become word-wise bit math (q147)
    instead of distinct-joins over raw ids — the 100 TB audience-overlap
    plan."""
    ev = load_tables(spark, sf_dir)["events"]
    return _bitmap_relation(ev).orderBy("event_type", "word")


Q146_SQL = f"""
SELECT event_type, user_id // {_BM_BITS} AS word,
       BIT_OR(1::BIGINT << CAST(user_id % {_BM_BITS} AS INTEGER)) AS bits
FROM events
GROUP BY 1, 2
ORDER BY event_type, word
"""


def q147_bitmap_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise audience overlap computed ENTIRELY in bitmap space: join
    the q146 word relation on word for each type pair and popcount the
    AND. The oracle is the naive DISTINCT self-join — equality of the two
    is the correctness proof of the bitmap algebra. At scale the bitmap
    side joins types x words rows (thousands) where the naive plan joins
    distinct (type, user) rows (billions). The bitmap relation is built
    ONCE and persisted — the pair join and both size lookups read the
    cached types-x-words rows instead of re-scanning events."""
    ev = load_tables(spark, sf_dir)["events"]
    bm = _bitmap_relation(ev).transform(materialize)
    a = bm.select(
        F.col("event_type").alias("type_a"), "word", F.col("bits").alias("ba")
    )
    b = bm.select(
        F.col("event_type").alias("type_b"), "word", F.col("bits").alias("bb")
    )
    # pinned shuffle-hash: the bitmap relation is types x WORDS — word
    # vocabulary grows with the corpus, and the materialized frame's
    # copied estimate is fanout-blind (q235 class, r10 audit)
    pairs = (
        a.join(b.hint("shuffle_hash"), "word")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.sum(F.expr("bit_count(ba & bb)")).alias("n_common"))
    )
    sizes = bm.groupBy("event_type").agg(
        F.sum(F.expr("bit_count(bits)")).alias("n_users")
    )
    return (
        pairs.join(
            F.broadcast(sizes).withColumnRenamed("event_type", "type_a"), "type_a"
        )
        .withColumnRenamed("n_users", "n_a")
        .join(
            F.broadcast(sizes).withColumnRenamed("event_type", "type_b"), "type_b"
        )
        .withColumnRenamed("n_users", "n_b")
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            "n_common",
            (
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
            ).alias("jaccard"),
        )
        .orderBy("type_a", "type_b")
    )


Q147_SQL = """
WITH u AS (SELECT DISTINCT event_type, user_id FROM events),
sz AS (SELECT event_type, COUNT(*) AS n_users FROM u GROUP BY 1),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, COUNT(*) AS n_common
  FROM u a JOIN u b ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT type_a, type_b, sa.n_users AS n_a, sb.n_users AS n_b, n_common,
       n_common / (sa.n_users + sb.n_users - n_common) AS jaccard
FROM pairs
JOIN sz sa ON sa.event_type = type_a
JOIN sz sb ON sb.event_type = type_b
ORDER BY type_a, type_b
"""


# --- q148: CEP sequence pattern matching -------------------------------------

_FUNNEL_STEPS = ["view", "click", "purchase"]
# per-hop bound: 2 days — the synthetic stream's per-user inter-arrival
# median is ~7 h, so minutes-scale bounds match nothing
_FUNNEL_WITHIN_MS = 172_800_000


def q148_funnel_pattern_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-contiguity view>click>purchase matches per user within a
    2-day per-hop bound — the MATCH_RECOGNIZE / Flink-CEP shape
    (operators/cep.py): k-1 leads over one per-user window shuffle, no
    self-join, overlap-reporting (skip-to-next-row) semantics. Unlike the
    q77 funnel (stage reachability, any gaps) this demands the exact
    consecutive sequence.
    Output: (user_id, n_matches) for matched users, user ascending."""
    from hadoop_jobanalyzer_spark.operators.cep import pattern_match_counts

    ev = load_tables(spark, sf_dir)["events"]
    return pattern_match_counts(
        ev, _FUNNEL_STEPS, _FUNNEL_WITHIN_MS
    ).orderBy("user_id")


Q148_SQL = f"""
WITH s AS (
  SELECT user_id, event_type, epoch_ms(ts) AS ms0,
         LEAD(event_type, 1) OVER w AS ty1,
         LEAD(epoch_ms(ts), 1) OVER w AS ms1,
         LEAD(event_type, 2) OVER w AS ty2,
         LEAD(epoch_ms(ts), 2) OVER w AS ms2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, COUNT(*) AS n_matches
FROM s
WHERE event_type = 'view' AND ty1 = 'click' AND ty2 = 'purchase'
  AND ms1 - ms0 <= {_FUNNEL_WITHIN_MS} AND ms2 - ms1 <= {_FUNNEL_WITHIN_MS}
GROUP BY user_id ORDER BY user_id
"""


# --- q149: time-weighted average value (TWAP) --------------------------------


def q149_time_weighted_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user time-weighted average event value: each value is held for
    the interval until the user's next event (lead over one per-user
    window) and weighted by that duration. Accumulation is exact — values
    quantize to integer millis (floor(value*1000), identical IEEE mult in
    both engines), weights are integer ms, and the single float division
    happens at the end: twap = wsum / (1000.0 * total_ms).
    Output: (user_id, n_intervals, total_ms, twap), user ascending."""
    from hadoop_jobanalyzer_spark.util import epoch_ms

    ev = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    iv = (
        ev.select(
            "user_id",
            "event_id",
            "ts",
            F.floor(F.col("value") * 1000).cast("long").alias("mv"),
            epoch_ms("ts").alias("ms"),
        )
        .withColumn("next_ms", F.lead("ms").over(w))
        .filter(F.col("next_ms").isNotNull())
        .withColumn("dt", F.col("next_ms") - F.col("ms"))
    )
    g = iv.groupBy("user_id").agg(
        F.count("*").alias("n_intervals"),
        F.sum("dt").alias("total_ms"),
        F.sum(F.col("mv") * F.col("dt")).alias("wsum"),
    )
    return g.select(
        "user_id",
        "n_intervals",
        "total_ms",
        (F.col("wsum") / (F.lit(1000.0) * F.col("total_ms"))).alias("twap"),
    ).orderBy("user_id")


Q149_SQL = """
WITH iv AS (
  SELECT user_id,
         CAST(FLOOR("value" * 1000) AS BIGINT) AS mv,
         epoch_ms(ts) AS ms,
         LEAD(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ms
  FROM events
),
g AS (
  SELECT user_id, COUNT(*) AS n_intervals,
         SUM(next_ms - ms) AS total_ms,
         SUM(mv * (next_ms - ms)) AS wsum
  FROM iv WHERE next_ms IS NOT NULL GROUP BY user_id
)
SELECT user_id, n_intervals, total_ms, wsum / (1000.0 * total_ms) AS twap
FROM g ORDER BY user_id
"""


# --- q150: Kolmogorov-Smirnov drift per source -------------------------------


def q150_ks_length_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample KS statistic of each source's document-length
    distribution against the pooled corpus — the distribution-shift gate a
    training pipeline runs per ingest source.

    Step functions only jump at support points, and every source's support
    is a subset of the pooled support, so the max of |F_s - F_g| is taken
    over the (sources x pooled-distinct-lengths) grid — two tiny derived
    dimensions cross-joined, never the corpus. Both CDFs stay as integer
    cumulative counts; the comparison is the cross-multiplied numerator
    |cum_s * N - cum_g * n_s| (exact BIGINT), and the single float
    division producing D happens at the end.
    Output: (source, n_docs, d_num, denom, ks_d), source ascending."""
    docs = load_tables(spark, sf_dir)["documents"]
    counts = docs.groupBy("source", "n_chars").agg(F.count("*").alias("c"))
    vals = docs.select("n_chars").distinct()
    srcs = docs.groupBy("source").agg(F.count("*").alias("n_s"))
    total = docs.agg(F.count("*").alias("n_g"))

    grid = srcs.crossJoin(F.broadcast(vals))
    joined = grid.join(counts, ["source", "n_chars"], "left").fillna(0, ["c"])
    w_s = (
        Window.partitionBy("source")
        .orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = joined.withColumn("cum_s", F.sum("c").over(w_s))

    g_counts = docs.groupBy("n_chars").agg(F.count("*").alias("gc"))
    w_g = Window.orderBy("n_chars").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    g_cum = g_counts.withColumn("cum_g", F.sum("gc").over(w_g)).select(
        "n_chars", "cum_g"
    )

    full = cum.join(F.broadcast(g_cum), "n_chars").crossJoin(F.broadcast(total))
    per_src = full.groupBy("source", "n_s", "n_g").agg(
        F.max(
            F.abs(F.col("cum_s") * F.col("n_g") - F.col("cum_g") * F.col("n_s"))
        ).alias("d_num")
    )
    return per_src.select(
        "source",
        F.col("n_s").alias("n_docs"),
        "d_num",
        (F.col("n_s") * F.col("n_g")).alias("denom"),
        (F.col("d_num") / (F.col("n_s") * F.col("n_g")).cast("double")).alias("ks_d"),
    ).orderBy("source")


Q150_SQL = """
WITH counts AS (
  SELECT source, n_chars, COUNT(*) AS c FROM documents GROUP BY 1, 2
),
vals AS (SELECT DISTINCT n_chars FROM documents),
srcs AS (SELECT source, COUNT(*) AS n_s FROM documents GROUP BY 1),
total AS (SELECT COUNT(*) AS n_g FROM documents),
grid AS (SELECT source, n_s, n_chars FROM srcs CROSS JOIN vals),
cum AS (
  SELECT g.source, g.n_s, g.n_chars,
         SUM(COALESCE(c.c, 0)) OVER (
           PARTITION BY g.source ORDER BY g.n_chars
           ROWS UNBOUNDED PRECEDING) AS cum_s
  FROM grid g LEFT JOIN counts c ON c.source = g.source AND c.n_chars = g.n_chars
),
gcum AS (
  SELECT n_chars,
         SUM(gc) OVER (ORDER BY n_chars ROWS UNBOUNDED PRECEDING) AS cum_g
  FROM (SELECT n_chars, COUNT(*) AS gc FROM documents GROUP BY 1)
),
per_src AS (
  SELECT source, n_s, n_g,
         MAX(ABS(cum_s * n_g - cum_g * n_s)) AS d_num
  FROM cum JOIN gcum USING (n_chars) CROSS JOIN total
  GROUP BY 1, 2, 3
)
SELECT source, n_s AS n_docs, d_num, n_s * n_g AS denom,
       d_num / CAST(n_s * n_g AS DOUBLE) AS ks_d
FROM per_src ORDER BY source
"""


# --- q151: incremental aggregate maintenance ---------------------------------

_IVM_SPLIT = "1999-01-01"


def q151_incremental_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-view delta merge (operators/incremental.py): the
    pre-split daily revenue aggregate is the persisted base state, the
    post-split orders are the arriving delta; merging unions the two
    one-row-per-key STATE relations and re-aggregates — at scale the
    update shuffle moves state rows, never the history. The query output
    is the merged view; the oracle is the from-scratch aggregate over all
    orders, so equality IS the maintenance-correctness proof.
    Output: (day, n, revenue, min_price, max_price), day ascending."""
    from hadoop_jobanalyzer_spark.operators.incremental import (
        aggregate_state,
        merge_aggregate_states,
    )

    orders = load_tables(spark, sf_dir)["orders"].withColumn(
        "day", F.col("o_orderdate").cast("date").cast("string")
    )
    split = F.lit(_IVM_SPLIT)
    base = aggregate_state(orders.filter(F.col("day") < split), ["day"], "o_totalprice")
    delta = aggregate_state(
        orders.filter(F.col("day") >= split), ["day"], "o_totalprice"
    )
    merged = merge_aggregate_states(base, delta, ["day"])
    return merged.select(
        "day",
        "n",
        F.col("sum_val").cast("double").alias("revenue"),
        F.col("min_val").cast("double").alias("min_price"),
        F.col("max_val").cast("double").alias("max_price"),
    ).orderBy("day")


Q151_SQL = """
SELECT CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS day,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       CAST(MIN(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS min_price,
       CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS max_price
FROM orders
GROUP BY 1 ORDER BY day
"""


# --- q152: rolling 30-day active users ---------------------------------------

_ROLL_DAYS = 30


def q152_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact rolling 30-day distinct active users per observation day.
    Rolling DISTINCT cannot ride a window frame (distinct state is not
    subtractable), so each (user, day) activity row is exploded to the
    <=30 observation days it supports — the horizon-explode trick: fan-out
    bounded by the horizon, then one countDistinct per day. The activity
    relation is deduped FIRST so the explode multiplies distinct
    (user, day) rows, not raw events. Observation days outside the data
    range are clipped via a 1-row min/max broadcast.
    Output: (obs_day, n_active), day ascending."""
    ev = load_tables(spark, sf_dir)["events"]
    ud = (
        ev.select(
            "user_id",
            F.datediff(
                F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
            ).alias("day"),
        )
        .distinct()
    )
    bounds = ud.agg(
        F.min("day").alias("min_day"), F.max("day").alias("max_day")
    )
    fanned = (
        ud.withColumn(
            "obs_day",
            F.explode(F.sequence(F.col("day"), F.col("day") + (_ROLL_DAYS - 1))),
        )
        .crossJoin(F.broadcast(bounds))
        .filter(F.col("obs_day") <= F.col("max_day"))
    )
    return (
        fanned.groupBy("obs_day")
        .agg(F.countDistinct("user_id").alias("n_active"))
        .orderBy("obs_day")
    )


Q152_SQL = f"""
WITH ud AS (
  SELECT DISTINCT user_id,
         CAST(ts AS DATE) - DATE '1970-01-01' AS day
  FROM events
),
bounds AS (SELECT MAX(day) AS max_day FROM ud),
fanned AS (
  SELECT user_id, day + g.offs AS obs_day
  FROM ud, (SELECT UNNEST(generate_series(0, {_ROLL_DAYS - 1})) AS offs) g
)
SELECT obs_day, COUNT(DISTINCT user_id) AS n_active
FROM fanned, bounds
WHERE obs_day <= max_day
GROUP BY obs_day ORDER BY obs_day
"""


# --- q199: weekly cohort retention matrix ------------------------------------


def q199_retention_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic N-week retention triangle: users cohorted by the week of
    their FIRST event; each later week's retention is the fraction of the
    cohort active that week.

    Weeks are exact integer epoch-week indexes (epoch_s // 604800 — no
    calendar/locale dependence).  First-event lookup is one user-keyed
    aggregate; the (user, cohort, offset) activity set is deduped BEFORE
    counting so a chatty user counts once per week; cohort sizes come
    from the offset-0 diagonal of the SAME aggregate (no second scan).
    The retention rate is the single end division of exact counts.
    Output: (cohort_week, week_offset, n_active, cohort_size, retention),
    cohort asc / offset asc."""
    from hadoop_jobanalyzer_spark.util import epoch_s

    events = load_tables(spark, sf_dir)["events"]
    weekly = events.select(
        "user_id", (epoch_s("ts") / 604800).cast("long").alias("week")
    )
    first = weekly.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    active = (
        weekly.join(first, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .distinct()
        .groupBy("cohort_week", "week_offset")
        .agg(F.count("*").alias("n_active"))
    )
    sizes = active.filter(F.col("week_offset") == 0).select(
        "cohort_week", F.col("n_active").alias("cohort_size")
    )
    return (
        active.join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "n_active",
            "cohort_size",
            (F.col("n_active") / F.col("cohort_size").cast("double")).alias(
                "retention"
            ),
        )
        .orderBy("cohort_week", "week_offset")
    )


Q199_SQL = """
WITH weekly AS (
  SELECT DISTINCT user_id,
         CAST(FLOOR(epoch(ts)) AS BIGINT) // 604800 AS week
  FROM events
),
first AS (SELECT user_id, MIN(week) AS cohort_week FROM weekly GROUP BY 1),
active AS (
  SELECT cohort_week, week - cohort_week AS week_offset,
         COUNT(DISTINCT weekly.user_id) AS n_active
  FROM weekly JOIN first ON weekly.user_id = first.user_id
  GROUP BY 1, 2
)
SELECT a.cohort_week, a.week_offset, a.n_active,
       s.n_active AS cohort_size,
       a.n_active / CAST(s.n_active AS DOUBLE) AS retention
FROM active a
JOIN active s ON s.cohort_week = a.cohort_week AND s.week_offset = 0
ORDER BY a.cohort_week, a.week_offset
"""


# --- q200: rolling 7-day median of daily revenue ------------------------------


def q200_rolling_median_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day (lower) median of daily order revenue over a
    contiguous day spine — the robust trend line a dashboard overlays on
    noisy daily totals.

    The spine is a `sequence(min_day, max_day)` explode of a 1-row
    bounds aggregate (missing days participate as exact zeros, so the
    window is truly 7 CALENDAR days, not 7 observed rows).  The median
    is exact order-statistic selection: sort the <=7 collected BIGINT
    cents in-row and take element (k+1)//2 — no interpolation, no float
    accumulation; both engines sort the same integers.
    Output: (day, revenue_c, med7_c), day ascending."""
    t = load_tables(spark, sf_dir)
    daily = (
        t["orders"]
        .select(
            F.date_trunc("DAY", "o_orderdate").alias("d"),
            F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .groupBy("d")
        .agg(F.sum("cents").alias("revenue_c"))
    )
    bounds = daily.agg(
        F.min("d").alias("lo"), F.max("d").alias("hi")
    )
    spine = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))
        ).alias("day")
    )
    grid = spine.join(daily, spine["day"] == daily["d"], "left").select(
        "day", F.coalesce(F.col("revenue_c"), F.lit(0)).alias("revenue_c")
    )
    w = Window.orderBy("day").rowsBetween(-6, 0)
    vals = F.array_sort(F.collect_list("revenue_c").over(w))
    return grid.select(
        "day",
        "revenue_c",
        F.element_at(vals, ((F.size(vals) + 1) / 2).cast("int")).alias("med7_c"),
    ).orderBy("day")


Q200_SQL = """
WITH daily AS (
  SELECT date_trunc('day', o_orderdate) AS d,
         SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS revenue_c
  FROM orders GROUP BY 1
),
spine AS (
  SELECT UNNEST(generate_series(MIN(d), MAX(d), INTERVAL 1 DAY)) AS day
  FROM daily
),
grid AS (
  SELECT day, COALESCE(revenue_c, 0) AS revenue_c
  FROM spine LEFT JOIN daily ON daily.d = spine.day
),
rolled AS (
  SELECT day, revenue_c,
         list_sort(list(revenue_c) OVER (
           ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS vals
  FROM grid
)
SELECT day, revenue_c, vals[(len(vals) + 1) // 2] AS med7_c
FROM rolled ORDER BY day
"""


# --- q207: functional-dependency audit ----------------------------------------


def q207_fd_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-inference data profiling: do candidate functional
    dependencies actually hold?  For each candidate LHS -> RHS, count
    the LHS values that map to MORE than one RHS value — zero violations
    means the FD holds and the column pair is safe to normalize out.

    Each FD is one (LHS, distinct-RHS) aggregate — partial aggregation
    collapses to the LHS domain before the exchange; the three audits
    union into one 3-row report.
    Output: (fd, n_lhs, n_violating, violation_rate), fd ascending."""
    t = load_tables(spark, sf_dir)

    def audit(df: DataFrame, lhs: str, rhs: str, name: str) -> DataFrame:
        per = df.groupBy(lhs).agg(F.countDistinct(rhs).alias("n_rhs"))
        return per.agg(
            F.lit(name).alias("fd"),
            F.count("*").alias("n_lhs"),
            F.sum((F.col("n_rhs") > 1).cast("long")).alias("n_violating"),
        ).select(
            "fd",
            "n_lhs",
            "n_violating",
            (F.col("n_violating") / F.col("n_lhs").cast("double")).alias(
                "violation_rate"
            ),
        )

    parts = [
        audit(t["part"], "p_brand", "p_type", "part: brand -> type"),
        audit(t["part"], "p_name", "p_brand", "part: name -> brand"),
        audit(t["events"], "user_id", "event_type", "events: user -> type"),
    ]
    out = parts[0]
    for df in parts[1:]:
        out = out.unionByName(df)
    return out.orderBy("fd")


Q207_SQL = """
WITH a1 AS (
  SELECT 'part: brand -> type' AS fd, COUNT(*) AS n_lhs,
         SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS n_violating
  FROM (SELECT p_brand, COUNT(DISTINCT p_type) AS n_rhs FROM part GROUP BY 1)
),
a2 AS (
  SELECT 'part: name -> brand' AS fd, COUNT(*) AS n_lhs,
         SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS n_violating
  FROM (SELECT p_name, COUNT(DISTINCT p_brand) AS n_rhs FROM part GROUP BY 1)
),
a3 AS (
  SELECT 'events: user -> type' AS fd, COUNT(*) AS n_lhs,
         SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS n_violating
  FROM (SELECT user_id, COUNT(DISTINCT event_type) AS n_rhs FROM events GROUP BY 1)
)
SELECT fd, n_lhs, n_violating,
       n_violating / CAST(n_lhs AS DOUBLE) AS violation_rate
FROM (SELECT * FROM a1 UNION ALL SELECT * FROM a2 UNION ALL SELECT * FROM a3)
ORDER BY fd
"""


# --- q208: funnel-order integrity audit ----------------------------------------


def q208_funnel_order_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-order sanity census: per user, does the first purchase
    precede the first view?  Classifies every purchasing user as
    view_first / purchase_first / purchase_only (plus view_only users
    who never bought) — the integrity check that catches client-side
    clock skew or dropped instrumentation before it poisons funnel
    metrics downstream.

    One conditional min aggregate per user (epoch-ms integers), then a
    4-row census; ties (purchase at the same ms as the first view) count
    as view_first, matching the funnel queries' >= semantics.
    Output: (order_class, n_users), class ascending."""
    from hadoop_jobanalyzer_spark.util import epoch_ms

    ev = load_tables(spark, sf_dir)["events"]
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", epoch_ms("ts"))).alias("v"),
        F.min(F.when(F.col("event_type") == "purchase", epoch_ms("ts"))).alias("p"),
    )
    cls = (
        F.when(F.col("p").isNull() & F.col("v").isNotNull(), F.lit("view_only"))
        .when(F.col("p").isNotNull() & F.col("v").isNull(), F.lit("purchase_only"))
        .when(F.col("p") >= F.col("v"), F.lit("view_first"))
        .when(F.col("p") < F.col("v"), F.lit("purchase_first"))
        .otherwise(F.lit("no_funnel_events"))
    )
    return (
        per_user.select(cls.alias("order_class"))
        .groupBy("order_class")
        .agg(F.count("*").alias("n_users"))
        .orderBy("order_class")
    )


Q208_SQL = """
WITH per_user AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN epoch_ms(ts) END) AS v,
         MIN(CASE WHEN event_type = 'purchase' THEN epoch_ms(ts) END) AS p
  FROM events GROUP BY 1
)
SELECT CASE
         WHEN p IS NULL AND v IS NOT NULL THEN 'view_only'
         WHEN p IS NOT NULL AND v IS NULL THEN 'purchase_only'
         WHEN p >= v THEN 'view_first'
         WHEN p < v THEN 'purchase_first'
         ELSE 'no_funnel_events'
       END AS order_class,
       COUNT(*) AS n_users
FROM per_user
GROUP BY 1 ORDER BY order_class
"""


# --- q209: join-size forecast (cardinality + skew before the join) -----------


def q209_join_size_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimizer-style join diagnostics computed EXACTLY before running
    the join: for each candidate equi-join, the output cardinality
    (sum over keys of count_left * count_right) and the largest single
    key's contribution — the number that predicts a skewed straggler
    partition before it happens.

    Each side collapses to its key-count table first (partial agg), so
    the "forecast" join joins count tables, never facts; the forecast
    for a fact-fact join costs two aggregates plus a key-domain join.
    Output: (join_name, n_keys, join_rows, max_key_rows, skew_ratio),
    join ascending; skew_ratio = max key contribution / mean."""
    t = load_tables(spark, sf_dir)

    def forecast(left: DataFrame, lk: str, right: DataFrame, rk: str, name: str):
        cl = left.groupBy(F.col(lk).alias("k")).agg(F.count("*").alias("ca"))
        cr = right.groupBy(F.col(rk).alias("k")).agg(F.count("*").alias("cb"))
        per_key = cl.join(cr, "k").select(
            "k", (F.col("ca") * F.col("cb")).alias("rows")
        )
        return per_key.agg(
            F.lit(name).alias("join_name"),
            F.count("*").alias("n_keys"),
            F.sum("rows").alias("join_rows"),
            F.max("rows").alias("max_key_rows"),
        ).select(
            "join_name",
            "n_keys",
            "join_rows",
            "max_key_rows",
            (
                F.col("max_key_rows")
                * F.col("n_keys")
                / F.col("join_rows").cast("double")
            ).alias("skew_ratio"),
        )

    parts = [
        forecast(t["orders"], "o_orderkey", t["lineitem"], "l_orderkey",
                 "orders x lineitem on orderkey"),
        forecast(t["lineitem"], "l_partkey", t["lineitem"], "l_partkey",
                 "lineitem x lineitem on partkey"),
        forecast(t["events"], "user_id", t["events"], "user_id",
                 "events x events on user_id"),
    ]
    out = parts[0]
    for df in parts[1:]:
        out = out.unionByName(df)
    return out.orderBy("join_name")


Q209_SQL = """
WITH f1 AS (
  SELECT 'orders x lineitem on orderkey' AS join_name,
         COUNT(*) AS n_keys, SUM(rows) AS join_rows, MAX(rows) AS max_key_rows
  FROM (
    SELECT a.k, a.ca * b.cb AS rows
    FROM (SELECT o_orderkey AS k, COUNT(*) AS ca FROM orders GROUP BY 1) a
    JOIN (SELECT l_orderkey AS k, COUNT(*) AS cb FROM lineitem GROUP BY 1) b
      USING (k)
  )
),
f2 AS (
  SELECT 'lineitem x lineitem on partkey' AS join_name,
         COUNT(*) AS n_keys, SUM(rows) AS join_rows, MAX(rows) AS max_key_rows
  FROM (
    SELECT a.k, a.ca * b.cb AS rows
    FROM (SELECT l_partkey AS k, COUNT(*) AS ca FROM lineitem GROUP BY 1) a
    JOIN (SELECT l_partkey AS k, COUNT(*) AS cb FROM lineitem GROUP BY 1) b
      USING (k)
  )
),
f3 AS (
  SELECT 'events x events on user_id' AS join_name,
         COUNT(*) AS n_keys, SUM(rows) AS join_rows, MAX(rows) AS max_key_rows
  FROM (
    SELECT a.k, a.ca * b.cb AS rows
    FROM (SELECT user_id AS k, COUNT(*) AS ca FROM events GROUP BY 1) a
    JOIN (SELECT user_id AS k, COUNT(*) AS cb FROM events GROUP BY 1) b
      USING (k)
  )
)
SELECT join_name, n_keys, join_rows, max_key_rows,
       max_key_rows * n_keys / CAST(join_rows AS DOUBLE) AS skew_ratio
FROM (SELECT * FROM f1 UNION ALL SELECT * FROM f2 UNION ALL SELECT * FROM f3)
ORDER BY join_name
"""


# --- q210: cumulative user-adoption curve --------------------------------------


def q210_adoption_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct-user growth by day: how many users have EVER
    been seen as of each day — the adoption curve behind every "total
    users" dashboard tile, computed without a cumulative-distinct scan.

    Distinct-accumulation rewrites to first-seen-day: one per-user min
    aggregate, a per-day count of first appearances, and a running sum
    over the contiguous day spine (missing days carry the curve flat).
    The spine window is day-grain, never event-grain.
    Output: (day, n_new, n_total), day ascending."""
    from hadoop_jobanalyzer_spark.util import epoch_s

    ev = load_tables(spark, sf_dir)["events"]
    first = ev.groupBy("user_id").agg(
        F.min((epoch_s("ts") / 86400).cast("long")).alias("d")
    )
    per_day = first.groupBy("d").agg(F.count("*").alias("n_new"))
    bounds = ev.agg(
        F.min((epoch_s("ts") / 86400).cast("long")).alias("lo"),
        F.max((epoch_s("ts") / 86400).cast("long")).alias("hi"),
    )
    spine = bounds.select(F.explode(F.sequence("lo", "hi")).alias("day"))
    grid = spine.join(per_day, spine["day"] == per_day["d"], "left").select(
        "day", F.coalesce(F.col("n_new"), F.lit(0)).alias("n_new")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return grid.select(
        "day", "n_new", F.sum("n_new").over(w).alias("n_total")
    ).orderBy("day")


Q210_SQL = """
WITH first AS (
  SELECT user_id, MIN(CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400) AS d
  FROM events GROUP BY 1
),
per_day AS (SELECT d, COUNT(*) AS n_new FROM first GROUP BY 1),
bounds AS (
  SELECT MIN(CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400) AS lo,
         MAX(CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400) AS hi
  FROM events
),
spine AS (SELECT UNNEST(generate_series(lo, hi)) AS day FROM bounds),
grid AS (
  SELECT day, COALESCE(n_new, 0) AS n_new
  FROM spine LEFT JOIN per_day ON per_day.d = spine.day
)
SELECT day, n_new,
       SUM(n_new) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS n_total
FROM grid ORDER BY day
"""


# --- q239: weekly growth accounting (new / retained / resurrected / churned) --


def q239_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential growth accounting by epoch week: every active user is
    classified NEW (first week ever), RETAINED (also active the prior
    week) or RESURRECTED (active before, but not the prior week), and
    every user active in week w but not w+1 counts as CHURNED at w+1 —
    the additive identity behind every growth dashboard
    (active(w) = new + retained + resurrected;
    active(w) - retained(w+1) = churned(w+1)).

    q199's cohort triangle answers "how does a cohort decay"; this is
    the week-over-week state machine.  One distinct (user, week) pass,
    one user-keyed window for lag/lead/first (a single shuffle), a 1-row
    max-week broadcast to stop churn accounting at the horizon, and two
    week-grain censuses joined full-outer (week-count-sized).
    Output: (week, n_new, n_retained, n_resurrected, n_churned), week
    ascending; weeks are exact integer epoch-week indexes."""
    from hadoop_jobanalyzer_spark.util import epoch_s

    ev = load_tables(spark, sf_dir)["events"]
    uw = (
        ev.select("user_id", (epoch_s("ts") / 604800).cast("long").alias("wk"))
        .distinct()
        .transform(materialize)
    )
    max_wk = uw.agg(F.max("wk").alias("max_wk"))
    w = Window.partitionBy("user_id").orderBy("wk")
    per = uw.crossJoin(F.broadcast(max_wk)).select(
        "wk",
        "max_wk",
        F.lag("wk").over(w).alias("prev"),
        F.lead("wk").over(w).alias("nxt"),
        # running min over the wk-ascending frame == the user's first week
        # on every row, and it shares lag/lead's window shuffle (a plain
        # partitionBy-only min would plan its own exchange)
        F.min("wk").over(w).alias("first"),
    )
    # ONE pass from the single window: each row emits its activity
    # contribution at week wk and, when the user goes silent next week
    # (inside the horizon), a churn contribution at week wk+1 — then one
    # aggregate.  The alternative (separate active/churn censuses joined
    # full-outer) re-runs the window pipeline per consumer.
    zero = F.lit(0).cast("long")
    activity = F.struct(
        F.col("wk").alias("week"),
        (F.col("wk") == F.col("first")).cast("long").alias("new"),
        # NULL prev (first week ever) must count as 0, not NULL-propagate
        F.coalesce((F.col("prev") == F.col("wk") - 1).cast("long"), zero).alias("ret"),
        (F.col("prev").isNotNull() & (F.col("prev") < F.col("wk") - 1))
        .cast("long")
        .alias("res"),
        zero.alias("chu"),
    )
    churn_row = F.when(
        (F.col("nxt").isNull() | (F.col("nxt") > F.col("wk") + 1))
        & (F.col("wk") + 1 <= F.col("max_wk")),
        F.array(
            F.struct(
                (F.col("wk") + 1).alias("week"),
                zero.alias("new"),
                zero.alias("ret"),
                zero.alias("res"),
                F.lit(1).cast("long").alias("chu"),
            )
        ),
    ).otherwise(F.array().cast("array<struct<week:bigint,new:bigint,ret:bigint,res:bigint,chu:bigint>>"))
    return (
        per.select(F.explode(F.concat(F.array(activity), churn_row)).alias("c"))
        .select("c.*")
        .groupBy("week")
        .agg(
            F.sum("new").alias("n_new"),
            F.sum("ret").alias("n_retained"),
            F.sum("res").alias("n_resurrected"),
            F.sum("chu").alias("n_churned"),
        )
        .orderBy("week")
    )


Q239_SQL = """
WITH uw AS (
  SELECT DISTINCT user_id, CAST(FLOOR(epoch(ts) / 604800) AS BIGINT) AS wk
  FROM events
),
per AS (
  SELECT user_id, wk,
         LAG(wk) OVER (PARTITION BY user_id ORDER BY wk) AS prev,
         LEAD(wk) OVER (PARTITION BY user_id ORDER BY wk) AS nxt,
         MIN(wk) OVER (PARTITION BY user_id) AS first
  FROM uw
),
active AS (
  SELECT wk AS week,
         SUM(CASE WHEN wk = first THEN 1 ELSE 0 END) AS n_new,
         SUM(CASE WHEN prev = wk - 1 THEN 1 ELSE 0 END) AS n_retained,
         SUM(CASE WHEN prev IS NOT NULL AND prev < wk - 1 THEN 1 ELSE 0 END) AS n_resurrected
  FROM per GROUP BY wk
),
churned AS (
  SELECT wk + 1 AS week, COUNT(*) AS n_churned
  FROM per
  WHERE (nxt IS NULL OR nxt > wk + 1) AND wk + 1 <= (SELECT MAX(wk) FROM uw)
  GROUP BY wk + 1
)
SELECT COALESCE(a.week, c.week) AS week,
       CAST(COALESCE(n_new, 0) AS BIGINT) AS n_new,
       CAST(COALESCE(n_retained, 0) AS BIGINT) AS n_retained,
       CAST(COALESCE(n_resurrected, 0) AS BIGINT) AS n_resurrected,
       CAST(COALESCE(n_churned, 0) AS BIGINT) AS n_churned
FROM active a FULL OUTER JOIN churned c ON a.week = c.week
ORDER BY week
"""


BEHAVIOR_QUERIES = {
    "q140_order_streaks": (q140_order_streaks, Q140_SQL),
    "q141_spearman_len_tokens": (q141_spearman_len_tokens, Q141_SQL),
    "q142_benford_order_values": (q142_benford_order_values, Q142_SQL),
    "q143_expectations_report": (q143_expectations_report, Q143_SQL),
    "q144_small_quantity_revenue": (q144_small_quantity_revenue, Q144_SQL),
    "q145_sole_late_supplier": (q145_sole_late_supplier, Q145_SQL),
    "q146_audience_bitmaps": (q146_audience_bitmaps, Q146_SQL),
    "q147_bitmap_audience_overlap": (q147_bitmap_audience_overlap, Q147_SQL),
    "q148_funnel_pattern_matches": (q148_funnel_pattern_matches, Q148_SQL),
    "q149_time_weighted_value": (q149_time_weighted_value, Q149_SQL),
    "q150_ks_length_drift": (q150_ks_length_drift, Q150_SQL),
    "q151_incremental_daily_revenue": (q151_incremental_daily_revenue, Q151_SQL),
    "q152_rolling_active_users": (q152_rolling_active_users, Q152_SQL),
    "q199_retention_matrix": (q199_retention_matrix, Q199_SQL),
    "q200_rolling_median_revenue": (q200_rolling_median_revenue, Q200_SQL),
    "q207_fd_audit": (q207_fd_audit, Q207_SQL),
    "q208_funnel_order_integrity": (q208_funnel_order_integrity, Q208_SQL),
    "q209_join_size_forecast": (q209_join_size_forecast, Q209_SQL),
    "q210_adoption_curve": (q210_adoption_curve, Q210_SQL),
    "q239_growth_accounting": (q239_growth_accounting, Q239_SQL),
}
