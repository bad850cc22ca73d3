"""Core analytic queries over the synthetic star schema.

One entry per SURVEY.md §2 operator family, each as a (DataFrame builder,
DuckDB oracle SQL) pair. The builders are the *engine surface* — idiomatic
DataFrame plans that Catalyst optimizes (predicate pushdown into the parquet
scan, broadcast joins for dims, partial aggregation) — and the oracles are
independent ANSI-SQL restatements for differential testing.

Cross-engine determinism rules (these queries hash-compare against DuckDB):

* money aggregates go through exact DECIMAL casts before SUM — double
  summation order differs between engines and would make rounded results
  flaky; decimal sums are exact, so the final cast-to-double is bit-identical;
* every float output is rounded, every top-k ordered with a unique-key
  tiebreak, timestamps are emitted as formatted strings or epoch longs;
* column aliases match the oracle exactly (driver sorts columns by name).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hadoop_jobanalyzer_spark.plans.tables import load_tables
from hadoop_jobanalyzer_spark.util import epoch_s


def _dec(col: str | Column, scale: int = 4) -> Column:
    col = F.col(col) if isinstance(col, str) else col
    return col.cast(f"decimal(18,{scale})")


def _dbl(col: Column) -> Column:
    return col.cast("double")


def _revenue() -> Column:
    """sum(extendedprice * (1-discount)) with exact decimal arithmetic.

    The exact decimal sum is rounded to scale 2 *before* the double cast:
    a wide-scale decimal -> double conversion rounds differently in DuckDB
    (int128 scaling in floating point) than in Spark (BigDecimal), while a
    scale-2 decimal below 2^53 converts identically in both."""
    one = F.lit(1).cast("decimal(8,4)")
    return _dbl(F.round(F.sum(_dec("l_extendedprice", 2) * (one - _dec("l_discount"))), 2))


_REVENUE_SQL = (
    "CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * "
    "(CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE)"
)


# --- A3/A4/F8: grouped aggregation with filters pushed to the scan ----------


def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    one = F.lit(1).cast("decimal(8,4)")
    disc_price = _dec("l_extendedprice", 2) * (one - _dec("l_discount"))
    charge = disc_price * (one + _dec("l_tax"))
    return (
        t["lineitem"]
        .filter(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dbl(F.round(F.sum(_dec("l_quantity", 2)), 2)).alias("sum_qty"),
            _dbl(F.round(F.sum(_dec("l_extendedprice", 2)), 2)).alias("sum_base_price"),
            _dbl(F.round(F.sum(disc_price), 2)).alias("sum_disc_price"),
            _dbl(F.round(F.sum(charge), 2)).alias("sum_charge"),
            F.round(_dbl(F.sum(_dec("l_quantity", 2))) / F.count("*"), 2).alias("avg_qty"),
            F.round(_dbl(F.sum(_dec("l_extendedprice", 2))) / F.count("*"), 2).alias("avg_price"),
            F.round(_dbl(F.sum(_dec("l_discount"))) / F.count("*"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q01_SQL = """
SELECT l_returnflag, l_linestatus,
  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_base_price,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS sum_disc_price,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(18,4)))
      * (CAST(1 AS DECIMAL(8,4)) + CAST(l_tax AS DECIMAL(18,4)))), 2) AS DOUBLE) AS sum_charge,
  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 2) AS avg_qty,
  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 2) AS avg_price,
  ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 4) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# --- J-family: 3-way join + agg + top-k --------------------------------------


def q02_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    cutoff = F.lit("1998-01-01").cast("timestamp")
    return (
        t["lineitem"]
        .filter(F.col("l_shipdate") > cutoff)
        .join(t["orders"].filter(F.col("o_orderdate") < cutoff), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(t["customer"].filter(F.col("c_mktsegment") == "BUILDING")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"), "o_orderpriority")
        .agg(_revenue().alias("revenue"))
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


Q02_SQL = f"""
SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_orderpriority,
       {_REVENUE_SQL} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


# --- 6-table join with broadcast dims (reference has only id-equi joins;
#     this is the generalized surface, SURVEY.md §2.5 note) ------------------


def q03_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    lo = F.lit("1996-01-01").cast("timestamp")
    dims = (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
    )
    return (
        t["lineitem"]
        .join(
            t["orders"].filter(F.col("o_orderdate") >= lo),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(dims), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("n_name")
        .agg(_revenue().alias("revenue"), F.count("*").alias("n_items"))
        .orderBy(F.desc("revenue"), "n_name")
    )


Q03_SQL = f"""
SELECT n_name, {_REVENUE_SQL} AS revenue, COUNT(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


def q04_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            _revenue().alias("revenue"),
            F.count("*").alias("n_items"),
            _dbl(F.round(F.sum(_dec("l_quantity", 2)), 2)).alias("total_qty"),
        )
        .orderBy("p_brand")
    )


Q04_SQL = f"""
SELECT p_brand, {_REVENUE_SQL} AS revenue, COUNT(*) AS n_items,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_qty
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
ORDER BY p_brand
"""


# --- J3: semi / anti joins ---------------------------------------------------


def q05_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    open_orders = t["orders"].filter(F.col("o_orderstatus") == "O")
    return (
        t["customer"]
        .join(open_orders, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


Q05_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
ORDER BY c_custkey
"""


def q06_customers_without_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    big = t["orders"].filter(F.col("o_totalprice") > 450000)
    return (
        t["customer"]
        .join(big, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", F.round("c_acctbal", 2).alias("c_acctbal"))
        .orderBy("c_custkey")
    )


Q06_SQL = """
SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS c_acctbal
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 450000)
ORDER BY c_custkey
"""


# --- J2/W1: window dedup (the final-attempt pattern on business data) --------


def q07_last_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
    return (
        t["orders"]
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "o_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_totalprice",
        )
        .orderBy("o_custkey")
    )


Q07_SQL = """
SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_totalprice
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders
) WHERE rn = 1
ORDER BY o_custkey
"""


# --- A1: last-write-wins merge over an event stream --------------------------


def q08_last_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        t["events"]
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("user_id", "event_type", "value")
        .orderBy("user_id")
    )


Q08_SQL = """
SELECT user_id, event_type, value
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
ORDER BY user_id
"""


# --- A2/O3: distinct counting ------------------------------------------------


def q09_distinct_users_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count("*").alias("n_events"),
        )
        .orderBy("event_type")
    )


Q09_SQL = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
FROM events GROUP BY event_type ORDER BY event_type
"""


# --- tumbling-window counts (streaming-shaped, batch-executed — §2.7) --------


def q10_event_minute_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy(
            F.date_format(F.date_trunc("minute", "ts"), "yyyy-MM-dd HH:mm").alias("minute"),
            "event_type",
        )
        .agg(F.count("*").alias("n"))
        .orderBy("minute", "event_type")
    )


Q10_SQL = """
SELECT strftime(date_trunc('minute', ts), '%Y-%m-%d %H:%M') AS minute, event_type, COUNT(*) AS n
FROM events GROUP BY 1, 2 ORDER BY minute, event_type
"""


# --- A9: interval-overlap concurrency histogram on business events ----------


def q11_event_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each event is an interval [ts, ts+floor(value) seconds]; count
    concurrent events per minute bucket — the timeline operator's semantics
    (end-inclusive buckets) applied to the synthetic stream."""
    t = load_tables(spark, sf_dir)
    s0 = epoch_s("ts")
    m0 = F.floor(s0 / 60)
    m1 = F.floor((s0 + F.floor("value").cast("long")) / 60)
    return (
        t["events"]
        .select("event_type", F.explode(F.sequence(m0, m1)).alias("minute"))
        .groupBy("minute", "event_type")
        .agg(F.count("*").alias("concurrent"))
        .orderBy("minute", "event_type")
    )


Q11_SQL = """
WITH iv AS (
  SELECT event_type,
         CAST(FLOOR(epoch(ts)) AS BIGINT) AS s0,
         CAST(FLOOR(epoch(ts)) AS BIGINT) + CAST(FLOOR(value) AS BIGINT) AS s1
  FROM events
)
SELECT m.minute, iv.event_type, COUNT(*) AS concurrent
FROM iv, UNNEST(generate_series(s0 // 60, s1 // 60)) AS m(minute)
GROUP BY m.minute, iv.event_type
ORDER BY m.minute, iv.event_type
"""


# --- grouping sets (free generalization, SURVEY.md §2.5) ---------------------


def q12_orders_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            _dbl(F.round(F.sum(_dec("o_totalprice", 2)), 2)).alias("total"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "total",
        )
        .orderBy("status", "priority")
    )


Q12_SQL = """
SELECT COALESCE(o_orderstatus, 'ALL') AS status, COALESCE(o_orderpriority, 'ALL') AS priority,
       COUNT(*) AS n_orders, CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total
FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
ORDER BY status, priority
"""


def q13_orders_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
        )
        .orderBy("status", "priority")
    )


Q13_SQL = """
SELECT COALESCE(o_orderstatus, 'ALL') AS status, COALESCE(o_orderpriority, 'ALL') AS priority,
       COUNT(*) AS n_orders
FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
ORDER BY status, priority
"""


# --- O1/O2: total-order sort + limit ----------------------------------------


def q14_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(10)
    )


Q14_SQL = """
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


# --- set operations ----------------------------------------------------------


def q15_viewers_who_clicked(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    view = t["events"].filter(F.col("event_type") == "view").select("user_id")
    click = t["events"].filter(F.col("event_type") == "click").select("user_id")
    return view.intersect(click).orderBy("user_id")


Q15_SQL = """
SELECT user_id FROM events WHERE event_type = 'view'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'click'
ORDER BY user_id
"""


def q16_view_days_without_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user, day) pairs that saw views but no purchase — EXCEPT over a
    composite key."""
    t = load_tables(spark, sf_dir)
    day = F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day")
    view = t["events"].filter(F.col("event_type") == "view").select("user_id", day)
    buy = t["events"].filter(F.col("event_type") == "purchase").select("user_id", day)
    return view.subtract(buy).orderBy("user_id", "day")


Q16_SQL = """
SELECT user_id, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day
FROM events WHERE event_type = 'view'
EXCEPT
SELECT user_id, strftime(date_trunc('day', ts), '%Y-%m-%d')
FROM events WHERE event_type = 'purchase'
ORDER BY user_id, day
"""


# --- A8 analog: structured-payload field extraction --------------------------


def q17_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    k = F.regexp_extract("props", r'"k":\s*(\d+)', 1).cast("long")
    return (
        t["events"]
        .select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.round(F.avg("k"), 2).alias("avg_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


Q17_SQL = r"""
SELECT event_type,
       CAST(SUM(k) AS BIGINT) AS sum_k, ROUND(AVG(k), 2) AS avg_k, MAX(k) AS max_k
FROM (SELECT event_type, CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT) AS k FROM events)
GROUP BY event_type ORDER BY event_type
"""


# --- F8: epoch scale projection + exact decimal value stats ------------------


def q18_hourly_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    hour = F.floor(epoch_s("ts") / 3600)
    return (
        t["events"]
        .groupBy(hour.alias("hour"))
        .agg(
            F.count("*").alias("n"),
            _dbl(F.round(F.sum(_dec("value", 2)), 2)).alias("sum_value"),
        )
        .orderBy("hour")
    )


Q18_SQL = """
SELECT CAST(FLOOR(epoch(ts)) AS BIGINT) // 3600 AS hour, COUNT(*) AS n,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_value
FROM events GROUP BY 1 ORDER BY hour
"""


# --- as-of join (operator Spark lacks — operators/joins.py) ------------------


def q19_last_view_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each purchase event, the same user's most recent view at or
    before it — the as-of join, oracled by DuckDB's native ASOF JOIN."""
    from hadoop_jobanalyzer_spark.operators.joins import asof_join

    t = load_tables(spark, sf_dir)
    views = t["events"].filter(F.col("event_type") == "view")
    # unique per (user, ts): keep the max event_id on timestamp ties
    w = Window.partitionBy("user_id", "ts").orderBy(F.desc("event_id"))
    views = (
        views.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("user_id", "ts", "event_id")
    )
    purchases = t["events"].filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    out = asof_join(
        purchases, views, on=["user_id"], left_ts="ts", right_ts="ts",
        right_cols=["event_id", "ts"],
    )
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("purchase_ts"),
        F.col("event_id_asof").alias("view_event_id"),
        F.date_format("ts_asof", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("view_ts"),
    ).orderBy("event_id")


Q19_SQL = """
WITH v AS (
  SELECT user_id, ts, MAX(event_id) AS event_id
  FROM events WHERE event_type = 'view' GROUP BY user_id, ts
),
p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
SELECT p.event_id,
       p.user_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
       v.event_id AS view_event_id,
       strftime(v.ts, '%Y-%m-%d %H:%M:%S.%f') AS view_ts
FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND v.ts <= p.ts
ORDER BY p.event_id
"""


# --- exact percentiles (interpolated — identical definition both engines) ----


def q35_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(value, 0.95)"), 4).alias("p95"),
            F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
        )
        .orderBy("event_type")
    )


Q35_SQL = """
SELECT event_type,
       ROUND(quantile_cont(value, 0.5), 4) AS p50,
       ROUND(quantile_cont(value, 0.95), 4) AS p95,
       ROUND(quantile_cont(value, 0.99), 4) AS p99
FROM events GROUP BY event_type ORDER BY event_type
"""


# --- sessionization (session_window — gap-based grouping) --------------------


def q36_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per user: number of activity sessions under a 1-hour inactivity gap
    and total events — Spark's session_window (the batch form of the
    streaming session-window operator)."""
    t = load_tables(spark, sf_dir)
    sessions = (
        t["events"]
        .groupBy(F.session_window("ts", "1 hour").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
    )
    return (
        sessions.groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
            F.max("n_events").alias("max_session_events"),
        )
        .orderBy("user_id")
    )


Q36_SQL = """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   >= INTERVAL 1 HOUR
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sess AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
),
per_session AS (
  SELECT user_id, session_id, COUNT(*) AS n_events
  FROM sess GROUP BY user_id, session_id
)
SELECT user_id, COUNT(*) AS n_sessions, CAST(SUM(n_events) AS BIGINT) AS n_events,
       MAX(n_events) AS max_session_events
FROM per_session GROUP BY user_id ORDER BY user_id
"""


# --- multi-resolution time rollup (hypertable continuous-aggregate shape) ----


def q37_multires_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minute/hour/day rollups of the event stream from ONE raw scan: the
    minute aggregate is computed once, each minute row fans out to its
    three (resolution, coarser bucket) assignments, and one small
    re-aggregation produces every resolution. A naive union of three
    groupBys would scan the raw events three times (Spark does not
    auto-materialize shared subplans); this shape scans once and the
    re-rollup touches O(minutes) rows — the continuous-aggregate pattern.
    """
    t = load_tables(spark, sf_dir)
    minute = (
        t["events"]
        .groupBy(F.date_trunc("minute", "ts").alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            _dbl(F.round(F.sum(_dec("value", 2)), 2)).alias("sum_value"),
        )
    )
    fanout = minute.select(
        F.explode(
            F.array(
                F.struct(F.lit("minute").alias("resolution"), F.col("bucket").alias("bucket")),
                F.struct(F.lit("hour").alias("resolution"), F.date_trunc("hour", "bucket").alias("bucket")),
                F.struct(F.lit("day").alias("resolution"), F.date_trunc("day", "bucket").alias("bucket")),
            )
        ).alias("rb"),
        "n",
        "sum_value",
    )
    return (
        fanout.groupBy(F.col("rb.resolution").alias("resolution"), F.col("rb.bucket").alias("bucket"))
        .agg(
            F.sum("n").alias("n"),
            _dbl(F.round(F.sum(_dec("sum_value", 2)), 2)).alias("sum_value"),
        )
        .select(
            "resolution",
            F.date_format("bucket", "yyyy-MM-dd HH:mm").alias("bucket"),
            "n",
            "sum_value",
        )
        .orderBy("resolution", "bucket")
    )


Q37_SQL = """
WITH minute AS (
  SELECT date_trunc('minute', ts) AS bucket, COUNT(*) AS n,
         CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_value
  FROM events GROUP BY 1
),
hour AS (
  SELECT date_trunc('hour', bucket) AS bucket, CAST(SUM(n) AS BIGINT) AS n,
         CAST(ROUND(SUM(CAST(sum_value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_value
  FROM minute GROUP BY 1
),
day AS (
  SELECT date_trunc('day', bucket) AS bucket, CAST(SUM(n) AS BIGINT) AS n,
         CAST(ROUND(SUM(CAST(sum_value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_value
  FROM minute GROUP BY 1
)
SELECT 'minute' AS resolution, strftime(bucket, '%Y-%m-%d %H:%M') AS bucket, n, sum_value FROM minute
UNION ALL
SELECT 'hour', strftime(bucket, '%Y-%m-%d %H:%M'), n, sum_value FROM hour
UNION ALL
SELECT 'day', strftime(bucket, '%Y-%m-%d %H:%M'), n, sum_value FROM day
ORDER BY resolution, bucket
"""


# --- range join (bucketed non-equi join) -------------------------------------

_PRICE_BANDS = [
    ("b0_100k", 0, 100_000),
    ("b100_200k", 100_000, 200_000),
    ("b200_300k", 200_000, 300_000),
    ("b300_400k", 300_000, 400_000),
    ("b400_500k", 400_000, 500_000),
    ("b500k_up", 500_000, 10_000_000),
]


def q38_price_band_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders classified into price bands via the bucketed range join
    (operators/joins.range_join) — never a nested-loop theta join."""
    from hadoop_jobanalyzer_spark.operators.joins import range_join

    t = load_tables(spark, sf_dir)
    # A 6-row constant table: build it as a SQL VALUES LocalRelation (pure
    # JVM LocalTableScan) rather than createDataFrame(list), whose
    # Python-RDD scan (applySchemaToPythonRDD) forces a Python worker
    # spawn to serve 6 literal rows — measured 7-13 s per bench pass on a
    # slow-fork host vs ~0 for the local relation (guide §4: no JVM<->
    # Python boundary for work built-ins can do).
    bands = spark.sql(
        "SELECT band, CAST(lo AS BIGINT) AS lo, CAST(hi AS BIGINT) AS hi "
        "FROM (VALUES "
        + ", ".join(f"('{b}', {lo}, {hi})" for b, lo, hi in _PRICE_BANDS)
        + ") AS bands(band, lo, hi)"
    )
    return (
        range_join(
            t["orders"].select("o_orderkey", "o_totalprice"),
            bands,
            value_col="o_totalprice",
            lo_col="lo",
            hi_col="hi",
            bucket_width=100_000,
        )
        .groupBy("band")
        .agg(
            F.count("*").alias("n_orders"),
            _dbl(F.round(F.sum(_dec("o_totalprice", 2)), 2)).alias("total"),
        )
        .orderBy("band")
    )


_BANDS_VALUES = ", ".join(f"('{b}', {lo}, {hi})" for b, lo, hi in _PRICE_BANDS)

Q38_SQL = f"""
WITH bands(band, lo, hi) AS (VALUES {_BANDS_VALUES})
SELECT band, COUNT(*) AS n_orders,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total
FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
GROUP BY band ORDER BY band
"""


# --- skew-safe exact distinct (salted two-phase) -----------------------------


def q39_salted_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users per event type via value-hash salting — the
    skew-spread execution of q09's countDistinct (identical result, the
    hot key's value set fans over 16 reducers instead of one)."""
    from hadoop_jobanalyzer_spark.operators.skew import salted_distinct_count

    t = load_tables(spark, sf_dir)
    return salted_distinct_count(
        t["events"], ["event_type"], "user_id", n_salts=16, out_name="n_users"
    ).orderBy("event_type")


Q39_SQL = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type ORDER BY event_type
"""


CORE_QUERIES: dict[str, tuple] = {
    "q01_pricing_summary": (q01_pricing_summary, Q01_SQL),
    "q02_shipping_priority": (q02_shipping_priority, Q02_SQL),
    "q03_region_revenue": (q03_region_revenue, Q03_SQL),
    "q04_brand_revenue": (q04_brand_revenue, Q04_SQL),
    "q05_customers_with_orders": (q05_customers_with_orders, Q05_SQL),
    "q06_customers_without_big_orders": (q06_customers_without_big_orders, Q06_SQL),
    "q07_last_order_per_customer": (q07_last_order_per_customer, Q07_SQL),
    "q08_last_event_per_user": (q08_last_event_per_user, Q08_SQL),
    "q09_distinct_users_per_type": (q09_distinct_users_per_type, Q09_SQL),
    "q10_event_minute_counts": (q10_event_minute_counts, Q10_SQL),
    "q11_event_concurrency": (q11_event_concurrency, Q11_SQL),
    "q12_orders_rollup": (q12_orders_rollup, Q12_SQL),
    "q13_orders_cube": (q13_orders_cube, Q13_SQL),
    "q14_top_orders": (q14_top_orders, Q14_SQL),
    "q15_viewers_who_clicked": (q15_viewers_who_clicked, Q15_SQL),
    "q16_view_days_without_purchase": (q16_view_days_without_purchase, Q16_SQL),
    "q17_props_stats": (q17_props_stats, Q17_SQL),
    "q18_hourly_value_stats": (q18_hourly_value_stats, Q18_SQL),
    "q19_last_view_before_purchase": (q19_last_view_before_purchase, Q19_SQL),
    "q35_value_percentiles": (q35_value_percentiles, Q35_SQL),
    "q36_user_sessions": (q36_user_sessions, Q36_SQL),
    "q37_multires_rollup": (q37_multires_rollup, Q37_SQL),
    "q38_price_band_counts": (q38_price_band_counts, Q38_SQL),
    "q39_salted_distinct_users": (q39_salted_distinct_users, Q39_SQL),
}
