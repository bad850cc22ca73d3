"""Differential tests for the behavioural/data-quality query set (q140+)
and the expectations operator behind q143."""

import os

import pytest
from pyspark.sql import Row, functions as F

from hadoop_jobanalyzer_spark.plans.behavior_queries import BEHAVIOR_QUERIES

from tests.oracle_utils import compare, driver_sql, duck_connect


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connect(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(BEHAVIOR_QUERIES))
def test_behavior_query_matches_oracle(spark, sf_dir, duck, name):
    fn, _ = BEHAVIOR_QUERIES[name]
    sql = driver_sql(name)
    problems = compare(fn(spark, sf_dir), duck, sql)
    assert not problems, f"{name}: {problems}"


@pytest.mark.parametrize("name", sorted(BEHAVIOR_QUERIES))
def test_behavior_query_nonempty(spark, sf_dir, name):
    fn, _ = BEHAVIOR_QUERIES[name]
    assert fn(spark, sf_dir).count() > 0, f"{name} returned no rows at {sf_dir}"


# --- operator-level unit tests ----------------------------------------------


def test_expectations_every_kind_on_planted_data(spark):
    """Each check kind counts exactly the planted violations."""
    from hadoop_jobanalyzer_spark.operators.expectations import (
        Check,
        expectations_report,
    )

    df = spark.createDataFrame(
        [
            Row(a=None, b=1, c=5, d="x", e=-1, f="ok-1"),
            Row(a=1, b=1, c=50, d="y", e=0, f="ok-2"),
            Row(a=2, b=2, c=200, d="z", e=3, f="bad"),
        ]
    )
    checks = [
        Check("a_not_null", "a", "not_null"),
        Check("b_unique", "b", "unique"),
        Check("c_range", "c", "between", lo=0, hi=100),
        Check("d_in_set", "d", "in_set", values=("x", "y")),
        Check("e_non_negative", "e", "non_negative"),
        Check("f_format", "f", "matches", pattern="^ok-"),
    ]
    got = {
        r["check_name"]: (r["n_violations"], r["passed"])
        for r in expectations_report(df, "t", checks).collect()
    }
    assert got == {
        "a_not_null": (1, False),
        "b_unique": (1, False),
        "c_range": (1, False),
        "d_in_set": (1, False),
        "e_non_negative": (1, False),
        "f_format": (1, False),
    }


def test_expectations_single_scan_per_table(spark, sf_dir):
    """The whole orders suite must compile to ONE scan of orders (plus the
    expand the distinct check adds) — adding checks must not add passes
    over the data."""
    from hadoop_jobanalyzer_spark.plans.behavior_queries import _suite
    from hadoop_jobanalyzer_spark.operators.expectations import expectations_report

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    rep = expectations_report(orders, "orders", _suite()["orders"])
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan


def test_expectations_pass_on_clean_data(spark):
    from hadoop_jobanalyzer_spark.operators.expectations import (
        Check,
        expectations_report,
    )

    df = spark.createDataFrame([Row(x=1), Row(x=2)])
    rep = expectations_report(
        df, "t", [Check("x_unique", "x", "unique"), Check("x_nn", "x", "not_null")]
    ).collect()
    assert all(r["passed"] and r["n_violations"] == 0 for r in rep)


def _clone_sf(sf_dir: str, tmp: str, overrides: dict) -> None:
    """Copy the tiny sf dir, replacing `overrides` tables with written DFs —
    lets hand-case tests run the REAL query path (load_tables reads every
    table eagerly)."""
    import shutil

    from hadoop_jobanalyzer_spark.plans.tables import TABLES

    for t in TABLES:
        if t in overrides:
            overrides[t].write.parquet(f"{tmp}/{t}.parquet")
        else:
            src = f"{sf_dir}/{t}.parquet"
            if os.path.isdir(src):
                shutil.copytree(src, f"{tmp}/{t}.parquet")
            else:
                shutil.copy(src, f"{tmp}/{t}.parquet")


def test_streak_islands_hand_case(spark, sf_dir):
    """Hand-checkable streak: days {1,2,3, 7,8, 12} -> best streak 3."""
    from hadoop_jobanalyzer_spark.plans.behavior_queries import q140_order_streaks
    import datetime

    rows = [
        Row(
            o_custkey=1,
            o_orderdate=datetime.datetime(1995, 1, d),
            o_orderkey=d,
            o_orderstatus="O",
            o_totalprice=1.0,
            o_orderpriority="1-URGENT",
        )
        for d in (1, 2, 3, 7, 8, 12)
    ]
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        _clone_sf(sf_dir, tmp, {"orders": spark.createDataFrame(rows)})
        out = q140_order_streaks(spark, tmp).collect()
    assert [(r["best_streak"], r["n_customers"]) for r in out] == [(3, 1)]


def test_spearman_perfect_and_reversed(spark, sf_dir):
    """rho == 1 for an identical ranking, -1 for a reversed one."""
    import tempfile

    from hadoop_jobanalyzer_spark.plans.behavior_queries import (
        q141_spearman_len_tokens,
    )

    rows = []
    # source "up": token count increases with n_chars (identical order)
    for i in range(5):
        rows.append(
            Row(
                doc_id=i,
                source="up",
                n_chars=10 + i,
                text=" ".join(["w"] * (i + 1)),
                lang="en",
            )
        )
    # source "down": token count decreases as n_chars increases
    for i in range(5):
        rows.append(
            Row(
                doc_id=100 + i,
                source="down",
                n_chars=10 + i,
                text=" ".join(["w"] * (5 - i)),
                lang="en",
            )
        )
    with tempfile.TemporaryDirectory() as tmp:
        docs = spark.createDataFrame(rows).withColumn(
            "n_chars", F.col("n_chars").cast("long")
        )
        _clone_sf(sf_dir, tmp, {"documents": docs})
        out = {
            r["source"]: r["rho"] for r in q141_spearman_len_tokens(spark, tmp).collect()
        }
    assert out["up"] == pytest.approx(1.0)
    assert out["down"] == pytest.approx(-1.0)


def test_bitmap_popcount_equals_distinct(spark, sf_dir):
    """Popcount of the per-type bitmap == exact countDistinct(user_id):
    the bitmap relation loses nothing."""
    from hadoop_jobanalyzer_spark.plans.behavior_queries import q146_audience_bitmaps

    bm = q146_audience_bitmaps(spark, sf_dir)
    got = {
        r["event_type"]: r["n"]
        for r in bm.groupBy("event_type")
        .agg(F.sum(F.expr("bit_count(bits)")).alias("n"))
        .collect()
    }
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert got == exact


def test_bitmap_relation_is_reaggregable(spark, sf_dir):
    """bit_or of two half-corpus bitmap relations == the full-corpus
    relation (the daily->monthly merge property)."""
    from hadoop_jobanalyzer_spark.plans.behavior_queries import _BM_BITS

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")

    def bitmap(df):
        return (
            df.select(
                "event_type",
                (F.col("user_id") / _BM_BITS).cast("long").alias("word"),
                F.expr(f"shiftleft(1L, CAST(user_id % {_BM_BITS} AS INT))").alias("bit"),
            )
            .groupBy("event_type", "word")
            .agg(F.expr("bit_or(bit)").alias("bits"))
        )

    full = bitmap(ev)
    lo = bitmap(ev.filter("event_id % 2 = 0"))
    hi = bitmap(ev.filter("event_id % 2 = 1"))
    merged = (
        lo.unionByName(hi)
        .groupBy("event_type", "word")
        .agg(F.expr("bit_or(bits)").alias("bits"))
    )
    assert merged.exceptAll(full).count() == 0
    assert full.exceptAll(merged).count() == 0


def test_q145_blames_exactly_one_supplier_per_counted_order(spark, sf_dir):
    """Every order contributing to numwait has >= 2 suppliers and exactly
    one late one — re-derived independently via SQL over the raw tables."""
    from hadoop_jobanalyzer_spark.plans.behavior_queries import q145_sole_late_supplier
    from hadoop_jobanalyzer_spark.plans.tables import load_tables

    load_tables(spark, sf_dir)
    total = q145_sole_late_supplier(spark, sf_dir).agg(F.sum("numwait")).first()[0]
    check = spark.sql(
        """
        WITH per_os AS (
          SELECT l_orderkey, l_suppkey,
                 MAX(CASE WHEN datediff(CAST(l_shipdate AS DATE),
                                        CAST(o_orderdate AS DATE)) > 60
                          THEN 1 ELSE 0 END) AS late
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          GROUP BY 1, 2
        )
        SELECT COUNT(*) FROM (
          SELECT l_orderkey FROM per_os
          GROUP BY l_orderkey
          HAVING COUNT(*) >= 2 AND SUM(late) = 1
        )
        """
    ).first()[0]
    # numwait total counts (order, late-supplier) pairs; with exactly one
    # late supplier per qualifying order the totals must agree — except
    # suppliers outside the top-10 cut. So bound: top-10 sum <= qualifying
    # orders, and both are positive.
    assert 0 < total <= check


def test_benford_shares_sum_to_one(spark, sf_dir):
    from hadoop_jobanalyzer_spark.plans.behavior_queries import (
        q142_benford_order_values,
    )

    rows = q142_benford_order_values(spark, sf_dir).collect()
    assert sum(r["share"] for r in rows) == pytest.approx(1.0)
    assert all(r["digit"] in "123456789" for r in rows)


def test_cep_hand_sequence(spark):
    """Contiguity is strict: v,c,p matches; v,x,c,p does not."""
    import datetime

    from hadoop_jobanalyzer_spark.operators.cep import pattern_matches

    t0 = datetime.datetime(2024, 1, 1)

    def ev(i, ty):
        return Row(
            user_id=1,
            event_id=i,
            ts=t0 + datetime.timedelta(minutes=i),
            event_type=ty,
        )

    # user 1: view(0) click(1) purchase(2) -> match at 0
    # then view(3) error(4) click(5) purchase(6) -> NO match at 3 (gap event)
    rows = [
        ev(0, "view"), ev(1, "click"), ev(2, "purchase"),
        ev(3, "view"), ev(4, "error"), ev(5, "click"), ev(6, "purchase"),
    ]
    out = pattern_matches(
        spark.createDataFrame(rows), ["view", "click", "purchase"], 10**9
    ).collect()
    assert [(r["user_id"], r["start_event_id"]) for r in out] == [(1, 0)]


def test_cep_time_bound_excludes_slow_hops(spark):
    import datetime

    from hadoop_jobanalyzer_spark.operators.cep import pattern_matches

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        Row(user_id=1, event_id=0, ts=t0, event_type="view"),
        Row(
            user_id=1,
            event_id=1,
            ts=t0 + datetime.timedelta(hours=2),
            event_type="click",
        ),
    ]
    fast = pattern_matches(
        spark.createDataFrame(rows), ["view", "click"], within_ms=3 * 3600 * 1000
    ).count()
    slow = pattern_matches(
        spark.createDataFrame(rows), ["view", "click"], within_ms=3600 * 1000
    ).count()
    assert (fast, slow) == (1, 0)


def test_twap_hand_case(spark):
    """value 2.0 held 10s then 4.0 held 30s -> twap of intervals uses the
    STARTING value of each interval: (2*10 + 4*30)/40 = 3.5."""
    import datetime

    from hadoop_jobanalyzer_spark.plans.behavior_queries import (
        q149_time_weighted_value,
    )

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        Row(user_id=1, event_id=0, ts=t0, event_type="view", value=2.0,
            props="{}"),
        Row(user_id=1, event_id=1, ts=t0 + datetime.timedelta(seconds=10),
            event_type="view", value=4.0, props="{}"),
        Row(user_id=1, event_id=2, ts=t0 + datetime.timedelta(seconds=40),
            event_type="view", value=9.0, props="{}"),
    ]
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        _clone_sf(
            "/root/testdata/sf0.001", tmp, {"events": spark.createDataFrame(rows)}
        )
        out = q149_time_weighted_value(spark, tmp).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_intervals"] == 2 and r["total_ms"] == 40_000
    assert r["twap"] == pytest.approx(3.5)


def test_ks_drift_bounds_and_self_zero(spark, sf_dir):
    """KS D is in [0,1]; a corpus with ONE source has D == 0 against the
    pool (its CDF is the pooled CDF)."""
    from hadoop_jobanalyzer_spark.plans.behavior_queries import q150_ks_length_drift

    rows = q150_ks_length_drift(spark, sf_dir).collect()
    assert rows and all(0.0 <= r["ks_d"] <= 1.0 for r in rows)

    import tempfile

    one = [
        Row(doc_id=i, text="a b c", lang="en", source="only", n_chars=5 + (i % 3))
        for i in range(10)
    ]
    with tempfile.TemporaryDirectory() as tmp:
        _clone_sf(sf_dir, tmp, {"documents": spark.createDataFrame(one)})
        out = q150_ks_length_drift(spark, tmp).collect()
    assert len(out) == 1 and out[0]["ks_d"] == 0.0 and out[0]["d_num"] == 0


def test_incremental_merge_equals_full_recompute(spark, sf_dir):
    """Merging base+delta aggregate states reproduces the from-scratch
    aggregate exactly, for several split points."""
    from hadoop_jobanalyzer_spark.operators.incremental import (
        aggregate_state,
        merge_aggregate_states,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumn(
        "day", F.col("o_orderdate").cast("date").cast("string")
    )
    full = aggregate_state(orders, ["day"], "o_totalprice")
    for split in ("1996-06-15", "2000-01-01"):
        base = aggregate_state(
            orders.filter(F.col("day") < split), ["day"], "o_totalprice"
        )
        delta = aggregate_state(
            orders.filter(F.col("day") >= split), ["day"], "o_totalprice"
        )
        merged = merge_aggregate_states(base, delta, ["day"])
        assert merged.exceptAll(full).count() == 0
        assert full.exceptAll(merged).count() == 0


def test_incremental_merge_is_associative(spark, sf_dir):
    """Three-way split merged in two different orders gives identical
    state — the property that makes daily->monthly->yearly rollups safe."""
    from hadoop_jobanalyzer_spark.operators.incremental import (
        aggregate_state,
        merge_aggregate_states,
    )

    ev = spark.read.parquet(f"{sf_dir}/orders.parquet")
    parts = [
        aggregate_state(
            ev.filter(F.col("o_orderkey") % 3 == i), ["o_orderstatus"], "o_totalprice"
        )
        for i in range(3)
    ]
    left = merge_aggregate_states(
        merge_aggregate_states(parts[0], parts[1], ["o_orderstatus"]),
        parts[2],
        ["o_orderstatus"],
    )
    right = merge_aggregate_states(
        parts[0],
        merge_aggregate_states(parts[1], parts[2], ["o_orderstatus"]),
        ["o_orderstatus"],
    )
    assert left.exceptAll(right).count() == 0
    assert right.exceptAll(left).count() == 0


def test_rolling_active_matches_direct_window(spark, sf_dir):
    """The horizon-explode rolling distinct equals a direct per-day
    'distinct users in [d-29, d]' computation."""
    from hadoop_jobanalyzer_spark.plans.behavior_queries import (
        _ROLL_DAYS,
        q152_rolling_active_users,
    )

    got = {
        r["obs_day"]: r["n_active"]
        for r in q152_rolling_active_users(spark, sf_dir).collect()
    }
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ud = (
        ev.select(
            "user_id",
            F.datediff(
                F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
            ).alias("day"),
        )
        .distinct()
        .collect()
    )
    by_day = {}
    for r in ud:
        by_day.setdefault(r["day"], set()).add(r["user_id"])
    lo, hi = min(by_day), max(by_day)
    want = {}
    for d in range(lo, hi + 1):
        users = set()
        for dd in range(d - _ROLL_DAYS + 1, d + 1):
            users |= by_day.get(dd, set())
        if users:
            want[d] = len(users)
    assert got == want


def test_retention_matrix_diagonal_is_one(spark, sf_dir):
    """Offset 0 retention is exactly 1.0 for every cohort, retention never
    exceeds 1, and cohort sizes sum to the distinct-user count."""
    fn, _ = BEHAVIOR_QUERIES["q199_retention_matrix"]
    rows = fn(spark, sf_dir).collect()
    diag = [r for r in rows if r["week_offset"] == 0]
    assert all(r["retention"] == 1.0 for r in diag)
    assert all(0 < r["retention"] <= 1.0 for r in rows)
    users = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id").distinct().count()
    )
    assert sum(r["cohort_size"] for r in diag) == users


def test_rolling_median_bounds(spark, sf_dir):
    """The 7-day median lies within [min, max] of the window and equals
    the daily value on any day whose whole window is constant."""
    fn, _ = BEHAVIOR_QUERIES["q200_rolling_median_revenue"]
    rows = fn(spark, sf_dir).collect()
    days = [r["revenue_c"] for r in rows]
    for i, r in enumerate(rows):
        window = days[max(0, i - 6) : i + 1]
        assert min(window) <= r["med7_c"] <= max(window)
        assert r["med7_c"] == sorted(window)[(len(window) - 1) // 2]


def test_fd_audit_known_dependencies(spark, sf_dir):
    """name -> brand has far fewer violating LHS values than user -> type
    (a user always emits several event types), and rates are in [0,1]."""
    fn, _ = BEHAVIOR_QUERIES["q207_fd_audit"]
    rows = {r["fd"]: r for r in fn(spark, sf_dir).collect()}
    assert len(rows) == 3
    for r in rows.values():
        assert 0.0 <= r["violation_rate"] <= 1.0
        assert r["n_violating"] <= r["n_lhs"]
    assert rows["events: user -> type"]["violation_rate"] >= 0.5


def test_funnel_order_census_covers_all_users(spark, sf_dir):
    fn, _ = BEHAVIOR_QUERIES["q208_funnel_order_integrity"]
    rows = fn(spark, sf_dir).collect()
    users = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id").distinct().count()
    )
    assert sum(r["n_users"] for r in rows) == users
    assert {r["order_class"] for r in rows} <= {
        "view_only", "purchase_only", "view_first", "purchase_first",
        "no_funnel_events",
    }


def test_join_forecast_equals_actual_join_size(spark, sf_dir):
    """The forecast join_rows EQUALS the materialized join's row count
    (it is the exact sum-of-products identity, not an estimate)."""
    fn, _ = BEHAVIOR_QUERIES["q209_join_size_forecast"]
    rows = {r["join_name"]: r for r in fn(spark, sf_dir).collect()}
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    actual = orders.join(li, orders["o_orderkey"] == li["l_orderkey"]).count()
    assert rows["orders x lineitem on orderkey"]["join_rows"] == actual
    for r in rows.values():
        assert r["skew_ratio"] >= 1.0  # max >= mean always


def test_adoption_curve_monotone_and_totals(spark, sf_dir):
    fn, _ = BEHAVIOR_QUERIES["q210_adoption_curve"]
    rows = fn(spark, sf_dir).collect()
    totals = [r["n_total"] for r in rows]
    assert totals == sorted(totals)
    users = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id").distinct().count()
    )
    assert totals[-1] == users
    assert sum(r["n_new"] for r in rows) == users
