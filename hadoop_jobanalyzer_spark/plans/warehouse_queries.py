"""Warehouse-shape queries q188+: the remaining classic TPC-H forms the
registry had not yet expressed, adapted to this star schema (which has no
partsupp table or l_shipmode column — the adaptations keep each query's
*plan shape* intact: the decorrelated scalar subquery, the NOT-IN anti
join, the nested per-group threshold, the conditional split aggregate).

Same contract as the other plan modules: each query is a (DataFrame
builder, DuckDB oracle SQL) pair; cross-row accumulation stays in BIGINT
(floored cents / cent-pct units), float division happens at most once at
the end, and every ordering carries a deterministic tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hadoop_jobanalyzer_spark.plans.tables import load_tables

# Integer revenue in floored cents: identical IEEE per-element math in both
# engines, then exact BIGINT accumulation (the repo-wide determinism rule).
# Built lazily — Column construction needs a live session in this build.
def _rev_cents():
    return F.floor(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100
    ).cast("long")


_REV_CENTS_SQL = "CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)"


# --- q188: shipping-priority top 10 (TPC-H Q3 shape) -------------------------

_Q188_SEGMENT = "BUILDING"
_Q188_CUTOFF = "1998-06-15"


def q188_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: the 10 highest-revenue orders from one market
    segment that were placed before the cutoff but still had line items
    shipping after it.

    Join order is chosen for the 100 TB case: customer is filtered to one
    segment BEFORE its join to orders (Catalyst pushes the predicate into
    the scan), orders is date-filtered at the scan, and the surviving
    order keys meet the date-filtered lineitem last, so the only big-big
    shuffle is orders><lineitem on the join key both sides already
    aggregate on.  The final top-10 is a TakeOrderedAndProject (per
    partition top-k + driver merge), never a full sort.
    Output: (o_orderkey, revenue_c, o_orderdate, o_orderpriority),
    revenue descending, orderkey the tie-break."""
    t = load_tables(spark, sf_dir)
    cust = t["customer"].filter(F.col("c_mktsegment") == _Q188_SEGMENT).select(
        "c_custkey"
    )
    orders = t["orders"].filter(F.col("o_orderdate") < F.lit(_Q188_CUTOFF)).select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    li = t["lineitem"].filter(F.col("l_shipdate") > F.lit(_Q188_CUTOFF)).select(
        "l_orderkey", _rev_cents().alias("rev_c")
    )
    return (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"], "left_semi")
        .join(li, orders["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum("rev_c").alias("revenue_c"))
        .select("o_orderkey", "revenue_c", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue_c").desc(), "o_orderkey")
        .limit(10)
    )


Q188_SQL = f"""
SELECT o_orderkey,
       SUM({_REV_CENTS_SQL}) AS revenue_c,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = '{_Q188_SEGMENT}'
  AND o_orderdate < TIMESTAMP '{_Q188_CUTOFF}'
  AND l_shipdate  > TIMESTAMP '{_Q188_CUTOFF}'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue_c DESC, o_orderkey
LIMIT 10
"""


# --- q189: product-margin by nation and year (TPC-H Q9 shape) ----------------

_Q189_TOKEN = "red"


def q189_product_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per supplier nation per order year for parts
    whose name contains one token.  With no partsupp table, unit cost is
    the part's retail price: profit = revenue - retailprice*quantity, all
    in BIGINT cent units (the retail term scales by the same 100 as the
    floored revenue cents so the subtraction is exact).

    Scale shape: part is filtered by the token BEFORE joining (name
    predicates prune at the scan; the filtered dim then broadcasts),
    nation is a broadcast, and the two genuinely large joins —
    lineitem><orders on orderkey — are the unavoidable fact shuffles.
    Output: (n_name, o_year, profit_c) ordered by nation, year desc."""
    t = load_tables(spark, sf_dir)
    part = t["part"].filter(F.col("p_name").contains(_Q189_TOKEN)).select(
        "p_partkey", F.floor(F.col("p_retailprice") * 100).cast("long").alias("cost_c")
    )
    nation = t["nation"].select("n_nationkey", "n_name")
    supp = t["supplier"].select("s_suppkey", "s_nationkey")
    orders = t["orders"].select(
        "o_orderkey", F.year("o_orderdate").cast("long").alias("o_year")
    )
    li = t["lineitem"].select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        _rev_cents().alias("rev_c"),
        F.col("l_quantity").cast("long").alias("qty"),
    )
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .withColumn("profit_line_c", F.col("rev_c") - F.col("qty") * F.col("cost_c"))
        .groupBy("n_name", "o_year")
        .agg(F.sum("profit_line_c").alias("profit_c"))
        .orderBy("n_name", F.col("o_year").desc())
    )


Q189_SQL = f"""
SELECT n_name,
       CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
       SUM({_REV_CENTS_SQL}
           - CAST(l_quantity AS BIGINT) * CAST(FLOOR(p_retailprice * 100) AS BIGINT)
       ) AS profit_c
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_name LIKE '%{_Q189_TOKEN}%'
GROUP BY 1, 2
ORDER BY n_name, o_year DESC
"""


# --- q190: supplier census per part attribute (TPC-H Q16 shape) --------------

_Q190_EXCL_BRAND = "Brand#13"
_Q190_EXCL_TYPE = "PROMO"
_Q190_SIZES = (1, 9, 14, 19, 23, 36, 45, 49)


def q190_part_supplier_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers can ship each
    (brand, type, size) combination, excluding one brand, one type, all
    but eight sizes, and "complaint" suppliers (negative account balance
    stands in for the comment-match; the NOT IN becomes a broadcast anti
    join, the shape Spark plans for NOT IN on a non-nullable key).

    The distinct (attrs, suppkey) set is reduced BEFORE the counting
    aggregate — one exchange on the part key (the lineitem><part join),
    then the distinct+count pipeline reuses that partitioning.
    Output: (p_brand, p_type, p_size, supplier_cnt), count descending,
    attrs the tie-break."""
    t = load_tables(spark, sf_dir)
    part = t["part"].filter(
        (F.col("p_brand") != _Q190_EXCL_BRAND)
        & (F.col("p_type") != _Q190_EXCL_TYPE)
        & F.col("p_size").isin(*_Q190_SIZES)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    complainers = t["supplier"].filter(F.col("s_acctbal") < 0).select("s_suppkey")
    li = t["lineitem"].select("l_partkey", "l_suppkey")
    return (
        li.join(
            F.broadcast(complainers),
            li["l_suppkey"] == complainers["s_suppkey"],
            "left_anti",
        )
        .join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .select("p_brand", "p_type", "p_size", "l_suppkey")
        .distinct()
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count("*").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


Q190_SQL = f"""
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> '{_Q190_EXCL_BRAND}'
  AND p_type <> '{_Q190_EXCL_TYPE}'
  AND p_size IN {_Q190_SIZES}
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# --- q191: high-value parts vs global threshold (TPC-H Q11 shape) ------------

_Q191_FRACTION_DEN = 2000  # keep parts holding > 1/2000 of total value


def q191_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose total shipped value exceeds a fixed
    fraction of the global shipped value — the decorrelated scalar
    subquery (HAVING > SUM(...)*f) planned as a 1-row broadcast joined
    against the per-part aggregate.

    Shipped value stays integer (quantity x floored retail cents), so the
    threshold test is the exact cross-multiplied form
    ``part_value * DEN > total`` — no float division anywhere.  The
    per-part aggregate is one exchange on l_partkey; the global total
    REUSES that aggregate (a second stage over the grouped result, not a
    second scan of lineitem).
    Output: (p_partkey, value_c) value descending, partkey tie-break."""
    t = load_tables(spark, sf_dir)
    part = t["part"].select(
        "p_partkey", F.floor(F.col("p_retailprice") * 100).cast("long").alias("unit_c")
    )
    li = t["lineitem"].select("l_partkey", F.col("l_quantity").cast("long").alias("qty"))
    per_part = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy("p_partkey")
        .agg(F.sum(F.col("qty") * F.col("unit_c")).alias("value_c"))
    )
    total = per_part.agg(F.sum("value_c").alias("total_c"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("value_c") * _Q191_FRACTION_DEN > F.col("total_c"))
        .select("p_partkey", "value_c")
        .orderBy(F.col("value_c").desc(), "p_partkey")
    )


Q191_SQL = f"""
WITH per_part AS (
  SELECT p_partkey,
         SUM(CAST(l_quantity AS BIGINT) * CAST(FLOOR(p_retailprice * 100) AS BIGINT))
           AS value_c
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY p_partkey
)
SELECT p_partkey, value_c
FROM per_part
WHERE value_c * {_Q191_FRACTION_DEN} > (SELECT SUM(value_c) FROM per_part)
ORDER BY value_c DESC, p_partkey
"""


# --- q192: dominant suppliers of a part family (TPC-H Q20 shape) -------------

_Q192_TOKEN = "blue"
_Q192_SHARE_DEN = 10  # dominant = shipped more than 1/10 of the part's volume


def q192_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who dominate the supply of any part in
    one name family — shipped more than a fixed share of that part's
    total volume.  (partsupp availability becomes shipped-volume share;
    the nested per-part aggregate threshold survives intact.)

    The per-(part, supplier) aggregate is one exchange; the per-part
    total comes from a window over that SAME partitioning (zero extra
    shuffle, since partkey prefixes the grouping key).  The share test is
    the cross-multiplied integer form.  Supplier names attach by
    broadcast at the very end, after the heavy side has collapsed to at
    most one row per supplier.
    Output: (s_suppkey, s_name, n_dominant_parts), count descending,
    suppkey tie-break."""
    t = load_tables(spark, sf_dir)
    fam = t["part"].filter(F.col("p_name").contains(_Q192_TOKEN)).select("p_partkey")
    li = t["lineitem"].select(
        "l_partkey", "l_suppkey", F.col("l_quantity").cast("long").alias("qty")
    )
    per_ps = (
        li.join(F.broadcast(fam), li["l_partkey"] == fam["p_partkey"], "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("qty").alias("qty_sp"))
    )
    part_total = Window.partitionBy("l_partkey")
    dominant = (
        per_ps.withColumn("qty_part", F.sum("qty_sp").over(part_total))
        .filter(F.col("qty_sp") * _Q192_SHARE_DEN > F.col("qty_part"))
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("n_dominant_parts"))
    )
    supp = t["supplier"].select("s_suppkey", "s_name")
    return (
        dominant.join(F.broadcast(supp), dominant["l_suppkey"] == supp["s_suppkey"])
        .select("s_suppkey", "s_name", "n_dominant_parts")
        .orderBy(F.col("n_dominant_parts").desc(), "s_suppkey")
    )


Q192_SQL = f"""
WITH per_ps AS (
  SELECT l_partkey, l_suppkey, SUM(CAST(l_quantity AS BIGINT)) AS qty_sp
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%{_Q192_TOKEN}%')
  GROUP BY l_partkey, l_suppkey
),
dominant AS (
  SELECT l_suppkey, COUNT(*) AS n_dominant_parts
  FROM (
    SELECT l_partkey, l_suppkey, qty_sp,
           SUM(qty_sp) OVER (PARTITION BY l_partkey) AS qty_part
    FROM per_ps
  )
  WHERE qty_sp * {_Q192_SHARE_DEN} > qty_part
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, n_dominant_parts
FROM dominant JOIN supplier ON l_suppkey = s_suppkey
ORDER BY n_dominant_parts DESC, s_suppkey
"""


# --- q193: late-shipment priority split per quarter (TPC-H Q12 shape) --------

_Q193_LATE_DAYS = 60
_Q193_HIGH = ("1-URGENT", "2-HIGH")


def q193_late_priority_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: among line items shipped more than N days after
    their order date, how many belong to high-priority orders vs the
    rest, per ship quarter (the ship-mode axis becomes ship quarter —
    the conditional CASE-WHEN split aggregate over a fact><fact join is
    the preserved shape).

    One orderkey shuffle joins the two facts; the lateness predicate
    applies DURING the join (no post-join filter stage), and the split is
    two conditional sums in a single aggregate pass.
    Output: (ship_q, high_line_count, low_line_count), quarter ascending."""
    t = load_tables(spark, sf_dir)
    orders = t["orders"].select("o_orderkey", "o_orderpriority", "o_orderdate")
    li = t["lineitem"].select("l_orderkey", "l_shipdate")
    is_high = F.col("o_orderpriority").isin(*_Q193_HIGH).cast("long")
    joined = li.join(
        orders,
        (li["l_orderkey"] == orders["o_orderkey"])
        & (
            li["l_shipdate"]
            > orders["o_orderdate"] + F.expr(f"INTERVAL {_Q193_LATE_DAYS} DAYS")
        ),
    )
    return (
        joined.select(
            F.concat(
                F.year("l_shipdate").cast("string"),
                F.lit("-Q"),
                F.quarter("l_shipdate").cast("string"),
            ).alias("ship_q"),
            is_high.alias("is_high"),
        )
        .groupBy("ship_q")
        .agg(
            F.sum("is_high").alias("high_line_count"),
            F.sum(F.lit(1) - F.col("is_high")).alias("low_line_count"),
        )
        .orderBy("ship_q")
    )


Q193_SQL = f"""
SELECT CAST(EXTRACT(year FROM l_shipdate) AS VARCHAR) || '-Q' ||
         CAST(EXTRACT(quarter FROM l_shipdate) AS VARCHAR) AS ship_q,
       SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
         AS high_line_count,
       SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END)
         AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL {_Q193_LATE_DAYS} DAY
GROUP BY 1 ORDER BY ship_q
"""


# --- q203: RFM customer segmentation ------------------------------------------

_Q203_Q = 4  # quartiles


def q203_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation census: every customer scored 1-4 on Recency
    (last order day), Frequency (order count) and Monetary (lifetime
    cents), segment = 100*R + 10*F + M — the classic CRM grid.

    Quartiles are assigned by the explicit rank formula
    ``floor(4*(rank-1)/n) + 1`` (not NTILE, whose uneven-remainder
    fill is awkward to reproduce rank-free), with ranks from
    `util.bucketed_global_rank` — parallel bucket windows over the
    per-customer aggregate, never a single-partition sort over all
    customers. All accumulation is BIGINT (days, counts, cents); the
    avg monetary is the single end division.
    Output: (segment, n_customers, avg_monetary_c), segment asc."""
    from hadoop_jobanalyzer_spark.util import bucketed_global_rank, epoch_s

    orders = load_tables(spark, sf_dir)["orders"]
    per_cust = orders.groupBy("o_custkey").agg(
        F.max((epoch_s("o_orderdate") / 86400).cast("long")).alias("r_day"),
        F.count("*").alias("f_cnt"),
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias("m_c"),
    )
    ranked = bucketed_global_rank(
        per_cust, F.col("r_day"), [F.col("o_custkey").asc()], out="rk_r"
    )
    ranked = bucketed_global_rank(
        ranked, F.col("f_cnt"), [F.col("o_custkey").asc()], out="rk_f"
    )
    ranked = bucketed_global_rank(
        ranked,
        (F.col("m_c") / 100000).cast("long"),
        [F.col("m_c").asc(), F.col("o_custkey").asc()],
        out="rk_m",
    )
    n = per_cust.agg(F.count("*").alias("n_cust"))

    def quart(rk):
        return (
            F.floor(F.lit(_Q203_Q) * (F.col(rk) - 1) / F.col("n_cust")) + 1
        ).cast("long")

    return (
        ranked.join(F.broadcast(n))
        .select(
            (
                quart("rk_r") * 100 + quart("rk_f") * 10 + quart("rk_m")
            ).alias("segment"),
            "m_c",
        )
        .groupBy("segment")
        .agg(
            F.count("*").alias("n_customers"),
            (F.sum("m_c") / F.count("*").cast("double")).alias("avg_monetary_c"),
        )
        .orderBy("segment")
    )


Q203_SQL = f"""
WITH per_cust AS (
  SELECT o_custkey,
         MAX(CAST(FLOOR(epoch(o_orderdate)) AS BIGINT) // 86400) AS r_day,
         COUNT(*) AS f_cnt,
         SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS m_c
  FROM orders GROUP BY 1
),
ranked AS (
  SELECT *,
         ROW_NUMBER() OVER (ORDER BY r_day ASC, o_custkey ASC) AS rk_r,
         ROW_NUMBER() OVER (ORDER BY f_cnt ASC, o_custkey ASC) AS rk_f,
         ROW_NUMBER() OVER (ORDER BY m_c // 100000 ASC, m_c ASC, o_custkey ASC)
           AS rk_m,
         COUNT(*) OVER () AS n_cust
  FROM per_cust
)
SELECT ({_Q203_Q} * (rk_r - 1) // n_cust + 1) * 100
       + ({_Q203_Q} * (rk_f - 1) // n_cust + 1) * 10
       + ({_Q203_Q} * (rk_m - 1) // n_cust + 1) AS segment,
       COUNT(*) AS n_customers,
       SUM(m_c) / CAST(COUNT(*) AS DOUBLE) AS avg_monetary_c
FROM ranked
GROUP BY 1 ORDER BY segment
"""


# --- q211: ship-lag percentiles per priority -----------------------------------


def q211_ship_lag_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50/p95 of order-to-ship lag (days) per order priority —
    the SLA table, with percentiles as true order statistics.

    Scale shape: per-GROUP percentiles are NOT a per-group sort — lags
    are integer days, so the (priority, lag) count table is tiny
    (priorities x distinct lags); the rank-crossing selection
    (min lag whose running count reaches ceil(q*n)) runs its windows
    over THAT table. The only big operation is the orderkey fact join.
    Output: (o_orderpriority, n_lines, p50_lag_days, p95_lag_days),
    priority ascending."""
    t = load_tables(spark, sf_dir)
    orders = t["orders"].select("o_orderkey", "o_orderpriority", "o_orderdate")
    li = t["lineitem"].select("l_orderkey", "l_shipdate")
    lags = li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).select(
        "o_orderpriority",
        F.datediff("l_shipdate", "o_orderdate").cast("long").alias("lag"),
    )
    counts = lags.groupBy("o_orderpriority", "lag").agg(F.count("*").alias("c"))
    w_cum = (
        Window.partitionBy("o_orderpriority")
        .orderBy("lag")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_tot = Window.partitionBy("o_orderpriority")
    cum = counts.select(
        "o_orderpriority",
        "lag",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(w_tot).alias("n"),
    )
    # rank crossing: min lag with cum*dnm >= q_num*n (integer compare)
    p50 = F.min(F.when(F.col("cum") * 2 >= F.col("n"), F.col("lag")))
    p95 = F.min(F.when(F.col("cum") * 20 >= F.col("n") * 19, F.col("lag")))
    return (
        cum.groupBy("o_orderpriority")
        .agg(
            F.max("n").alias("n_lines"),
            p50.alias("p50_lag_days"),
            p95.alias("p95_lag_days"),
        )
        .orderBy("o_orderpriority")
    )


Q211_SQL = """
WITH lags AS (
  SELECT o_orderpriority,
         CAST(date_diff('day', o_orderdate, l_shipdate) AS BIGINT) AS lag
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
counts AS (
  SELECT o_orderpriority, lag, COUNT(*) AS c FROM lags GROUP BY 1, 2
),
cum AS (
  SELECT o_orderpriority, lag,
         SUM(c) OVER (PARTITION BY o_orderpriority ORDER BY lag
                      ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(c) OVER (PARTITION BY o_orderpriority) AS n
  FROM counts
)
SELECT o_orderpriority, MAX(n) AS n_lines,
       MIN(CASE WHEN cum * 2 >= n THEN lag END) AS p50_lag_days,
       MIN(CASE WHEN cum * 20 >= n * 19 THEN lag END) AS p95_lag_days
FROM cum
GROUP BY 1 ORDER BY o_orderpriority
"""


# --- q212: supplier scorecard (top 3 per nation) --------------------------------

_Q212_LATE_DAYS = 60
_Q212_TOP = 3


def q212_supplier_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier scorecard: revenue, shipped-line count, and late-line
    fraction per supplier, ranked within nation; the top 3 earners per
    nation survive. The multi-metric dimension rollup every procurement
    dashboard runs.

    One orderkey fact join computes revenue and lateness in the same
    pass; the ranking window runs over the SUPPLIER-grain aggregate
    (bounded by the dimension size, not the fact table). Supplier and
    nation attach by broadcast.
    Output: (n_name, s_name, revenue_c, n_lines, late_frac, rk),
    nation asc / rank asc."""
    t = load_tables(spark, sf_dir)
    orders = t["orders"].select("o_orderkey", "o_orderdate")
    li = t["lineitem"].select("l_orderkey", "l_suppkey", "l_shipdate",
                              _rev_cents().alias("rev_c"))
    late = (
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr(f"INTERVAL {_Q212_LATE_DAYS} DAYS")
    ).cast("long")
    per_supp = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("l_suppkey")
        .agg(
            F.sum("rev_c").alias("revenue_c"),
            F.count("*").alias("n_lines"),
            F.sum(late).alias("n_late"),
        )
    )
    supp = t["supplier"].select("s_suppkey", "s_name", "s_nationkey")
    nation = t["nation"].select("n_nationkey", "n_name")
    scored = (
        per_supp.join(F.broadcast(supp), per_supp["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
    )
    w = Window.partitionBy("n_name").orderBy(
        F.col("revenue_c").desc(), F.col("s_suppkey").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= _Q212_TOP)
        .select(
            "n_name",
            "s_name",
            "revenue_c",
            "n_lines",
            (F.col("n_late") / F.col("n_lines").cast("double")).alias("late_frac"),
            "rk",
        )
        .orderBy("n_name", "rk")
    )


Q212_SQL = f"""
WITH per_supp AS (
  SELECT l_suppkey,
         SUM({_REV_CENTS_SQL}) AS revenue_c,
         COUNT(*) AS n_lines,
         SUM(CASE WHEN l_shipdate > o_orderdate + INTERVAL {_Q212_LATE_DAYS} DAY
                  THEN 1 ELSE 0 END) AS n_late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1
),
scored AS (
  SELECT n_name, s_name, s_suppkey, revenue_c, n_lines, n_late
  FROM per_supp
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
)
SELECT n_name, s_name, revenue_c, n_lines,
       n_late / CAST(n_lines AS DOUBLE) AS late_frac, rk
FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (
           PARTITION BY n_name ORDER BY revenue_c DESC, s_suppkey ASC
         ) AS BIGINT) AS rk
  FROM scored
)
WHERE rk <= {_Q212_TOP}
ORDER BY n_name, rk
"""


# --- q240: order-total financial reconciliation ------------------------------


def q240_order_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Financial reconciliation census: recompute every order's total
    from its lineitems under the TPC-H pricing identity
    ``sum(extendedprice * (1 - discount) * (1 + tax))`` and bucket
    orders by how far ``o_totalprice`` drifts — the close-the-books
    audit that catches a broken ETL join or a currency/rounding bug
    before it reaches revenue reporting. Orders with no lineitems land
    in bucket -1 (referential hole; amount-less).

    Exact integer model: prices to cents and rates to integer percent
    once (the only rounding), so the recomputed total is an exact
    BIGINT in 1e-8 units and the drift comparison is integer equality —
    engine-portable, unlike recomputing in floats. One lineitem
    aggregate (partial, order-keyed), a broadcast-sized drift census:
    bucket = decimal digit count of the drift in cents (0 = exact).
    Output: (drift_bucket, n_orders, max_drift_cents), bucket asc."""
    t = load_tables(spark, sf_dir)
    cents = lambda c: F.round(F.col(c) * 100).cast("long")  # noqa: E731
    l = (
        t["lineitem"]
        .select(
            "l_orderkey",
            (
                cents("l_extendedprice")
                * (100 - cents("l_discount"))
                * (100 + cents("l_tax"))
            ).alias("line_e8"),
        )
        .groupBy("l_orderkey")
        .agg(F.sum("line_e8").alias("recomputed_e8"))
    )
    joined = t["orders"].join(
        l, F.col("o_orderkey") == F.col("l_orderkey"), "left"
    )
    # integer cents via integer division — never a double in the money path
    drift_cents = F.expr(
        "abs(recomputed_e8 - cast(round(o_totalprice * 100) as bigint) * 10000) div 10000"
    )
    bucket = (
        F.when(F.col("recomputed_e8").isNull(), F.lit(-1))
        .when(drift_cents == 0, F.lit(0))
        .otherwise(F.length(drift_cents.cast("string")))
    )
    return (
        joined.select(
            bucket.cast("int").alias("drift_bucket"),
            F.coalesce(drift_cents, F.lit(0)).alias("_d"),
        )
        .groupBy("drift_bucket")
        .agg(
            F.count("*").alias("n_orders"),
            F.max("_d").alias("max_drift_cents"),
        )
        .orderBy("drift_bucket")
    )


Q240_SQL = """
WITH l AS (
  SELECT l_orderkey,
         SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))
             * (100 + CAST(ROUND(l_tax * 100) AS BIGINT))) AS recomputed_e8
  FROM lineitem GROUP BY 1
),
j AS (
  SELECT o.o_orderkey, l.recomputed_e8,
         ABS(l.recomputed_e8 - CAST(ROUND(o.o_totalprice * 100) AS BIGINT) * 10000) // 10000 AS d
  FROM orders o LEFT JOIN l ON o.o_orderkey = l.l_orderkey
)
SELECT CAST(CASE WHEN recomputed_e8 IS NULL THEN -1
            WHEN d = 0 THEN 0
            ELSE LENGTH(CAST(d AS VARCHAR)) END AS INTEGER) AS drift_bucket,
       COUNT(*) AS n_orders,
       CAST(MAX(COALESCE(d, 0)) AS BIGINT) AS max_drift_cents
FROM j
GROUP BY 1 ORDER BY 1
"""


WAREHOUSE_QUERIES = {
    "q188_shipping_priority": (q188_shipping_priority, Q188_SQL),
    "q189_product_margin": (q189_product_margin, Q189_SQL),
    "q190_part_supplier_census": (q190_part_supplier_census, Q190_SQL),
    "q191_important_parts": (q191_important_parts, Q191_SQL),
    "q192_dominant_suppliers": (q192_dominant_suppliers, Q192_SQL),
    "q193_late_priority_split": (q193_late_priority_split, Q193_SQL),
    "q203_rfm_segments": (q203_rfm_segments, Q203_SQL),
    "q211_ship_lag_percentiles": (q211_ship_lag_percentiles, Q211_SQL),
    "q212_supplier_scorecard": (q212_supplier_scorecard, Q212_SQL),
    "q240_order_reconciliation": (q240_order_reconciliation, Q240_SQL),
}
