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


BEHAVIOR_QUERIES = {
    "q140_order_streaks": (q140_order_streaks, Q140_SQL),
    "q141_spearman_len_tokens": (q141_spearman_len_tokens, Q141_SQL),
    "q142_benford_order_values": (q142_benford_order_values, Q142_SQL),
    "q143_expectations_report": (q143_expectations_report, Q143_SQL),
}
