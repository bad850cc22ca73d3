"""Differential tests for the mining/timeseries query set (q153+)."""

import pytest
from pyspark.sql import functions as F

from hadoop_jobanalyzer_spark.plans.mining_queries import (
    MINING_QUERIES,
    _SRP_SIGNS,
)

from tests.oracle_utils import compare, driver_sql, duck_connect


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connect(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(MINING_QUERIES))
def test_mining_query_matches_oracle(spark, sf_dir, duck, name):
    fn, _ = MINING_QUERIES[name]
    sql = driver_sql(name)
    problems = compare(fn(spark, sf_dir), duck, sql)
    assert not problems, f"{name}: {problems}"


@pytest.mark.parametrize("name", sorted(MINING_QUERIES))
def test_mining_query_nonempty(spark, sf_dir, name):
    fn, _ = MINING_QUERIES[name]
    assert fn(spark, sf_dir).count() > 0, f"{name} returned no rows at {sf_dir}"


# --- semantic spot checks ----------------------------------------------------


def test_gapfill_interpolates_linearly(spark, sf_dir):
    """Every gap row's filled value lies between its neighbours' values
    (linear interpolation is monotone within a gap), and observed rows
    pass through unchanged: denom == 1 and filled_num == cents sum."""
    fn, _ = MINING_QUERIES["q153_gapfill_interpolation"]
    rows = fn(spark, sf_dir).collect()
    assert rows == sorted(rows, key=lambda r: r["minute"])
    # spine is contiguous
    minutes = [r["minute"] for r in rows]
    assert minutes == list(range(minutes[0], minutes[-1] + 1))
    for r in rows:
        if not r["is_gap"]:
            assert r["denom"] == 1
            assert r["filled_cents"] == float(r["filled_num"])
        else:
            assert r["n_events"] == 0 and r["denom"] >= 2


def test_edit_pairs_symmetric_free_and_bounded(spark, sf_dir):
    """Each unordered name pair appears once (name_a < name_b) and the
    distance bound holds."""
    fn, _ = MINING_QUERIES["q154_part_name_edit_pairs"]
    rows = fn(spark, sf_dir).collect()
    seen = set()
    for r in rows:
        assert r["name_a"] < r["name_b"]
        assert 1 <= r["dist"] <= 3
        key = (r["name_a"], r["name_b"])
        assert key not in seen
        seen.add(key)


def test_cheapest_supplier_is_unique_per_part(spark, sf_dir):
    fn, _ = MINING_QUERIES["q155_cheapest_supplier_per_part"]
    df = fn(spark, sf_dir)
    n = df.count()
    assert df.select("p_partkey").distinct().count() == n


def test_dormant_profile_is_subset_of_rich(spark, sf_dir):
    """Dormant counts can never exceed the above-average population of the
    segment."""
    fn, _ = MINING_QUERIES["q156_dormant_segment_profile"]
    got = {r["c_mktsegment"]: r["n_dormant"] for r in fn(spark, sf_dir).collect()}
    from hadoop_jobanalyzer_spark.plans.tables import load_tables

    cust = load_tables(spark, sf_dir)["customer"]
    seg_sizes = {
        r["c_mktsegment"]: r["n"]
        for r in cust.groupBy("c_mktsegment").agg(F.count("*").alias("n")).collect()
    }
    for seg, n_dormant in got.items():
        assert 0 < n_dormant <= seg_sizes[seg]


def test_branching_top_share_bounds(spark, sf_dir):
    fn, _ = MINING_QUERIES["q157_next_word_branching"]
    rows = fn(spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        assert 0.0 < r["top_share"] <= 1.0
        assert r["n_continuations"] <= r["total"]


def test_rrf_scores_decompose(spark, sf_dir):
    """Every fused score equals the sum of its two rank contributions and
    at least one source rank is present per row."""
    fn, _ = MINING_QUERIES["q159_hybrid_search_rrf"]
    for r in fn(spark, sf_dir).collect():
        a = 1.0 / (60 + r["bm25_rank"]) if r["bm25_rank"] is not None else 0.0
        b = 1.0 / (60 + r["cos_rank"]) if r["cos_rank"] is not None else 0.0
        assert r["bm25_rank"] is not None or r["cos_rank"] is not None
        assert r["rrf_score"] == a + b


def test_hourly_anomaly_grid_is_complete(spark, sf_dir):
    """All 24 hours appear for every day, and flagged cells really are
    >2 population sigma from their hour's mean."""
    import math

    fn, _ = MINING_QUERIES["q160_hourly_anomaly_flags"]
    rows = fn(spark, sf_dir).collect()
    days = {r["day"] for r in rows}
    assert len(rows) == 24 * len(days)
    for r in rows:
        if r["var_num"] > 0:
            z = r["dev"] / math.sqrt(r["var_num"])
            assert r["is_anomaly"] == (abs(z) > 2.0)


def test_trade_volume_totals(spark, sf_dir):
    """Nation-pair revenue must sum to total lineitem revenue (every line
    item has exactly one customer and supplier nation)."""
    from hadoop_jobanalyzer_spark.plans.tables import load_tables

    fn, _ = MINING_QUERIES["q161_nation_trade_volume"]
    got = fn(spark, sf_dir).agg(F.sum("revenue_cents")).collect()[0][0]
    li = load_tables(spark, sf_dir)["lineitem"]
    want = li.select(
        F.floor(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100)
        .cast("long")
        .alias("c")
    ).agg(F.sum("c")).collect()[0][0]
    assert got == want


def test_spend_ranks_invariants(spark, sf_dir):
    """rank >= dense_rank, percent_rank/cume in [0,1], deciles 1..10."""
    fn, _ = MINING_QUERIES["q162_customer_spend_ranks"]
    rows = fn(spark, sf_dir).collect()
    n = len(rows)
    for r in rows:
        assert r["rnk"] >= r["drnk"]
        assert 0.0 <= r["prnk"] <= 1.0 and 0.0 < r["cume"] <= 1.0
        assert 1 <= r["decile"] <= 10
    assert rows[0]["rnk"] == 1 and rows[0]["prnk"] == 0.0
    assert rows[-1]["cume"] == 1.0
    assert n == len({r["c_custkey"] for r in rows})


def test_rolling_correlation_bounds_and_frames(spark, sf_dir):
    """corr in [-1, 1] (or NULL on zero variance) and only full 24-row
    frames are emitted."""
    fn, _ = MINING_QUERIES["q163_rolling_correlation"]
    rows = fn(spark, sf_dir).collect()
    assert rows, "no full frames"
    hours = [r["hour"] for r in rows]
    assert hours == list(range(hours[0], hours[-1] + 1))
    for r in rows:
        if r["corr"] is not None:
            assert -1.0 - 1e-12 <= r["corr"] <= 1.0 + 1e-12


def test_weighted_median_is_weighted_crossing(spark, sf_dir):
    """Recompute each priority's weighted median driver-side from raw
    data; the query's pick must match the 2*cum >= total crossing."""
    from hadoop_jobanalyzer_spark.plans.tables import load_tables

    fn, _ = MINING_QUERIES["q164_weighted_median_value"]
    got = {r["o_orderpriority"]: r for r in fn(spark, sf_dir).collect()}
    t = load_tables(spark, sf_dir)
    li_w = t["lineitem"].groupBy("l_orderkey").agg(F.count("*").alias("w"))
    raw = (
        t["orders"]
        .join(li_w, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            "o_orderpriority",
            F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
            "w",
        )
        .collect()
    )
    byp = {}
    for r in raw:
        byp.setdefault(r["o_orderpriority"], []).append((r["cents"], r["w"]))
    for prio, pairs in byp.items():
        pairs.sort()
        total = sum(w for _, w in pairs)
        cum = 0
        for cents, w in pairs:
            cum += w
            if 2 * cum >= total:
                assert got[prio]["median_cents"] == cents
                assert got[prio]["total_weight"] == total
                break


def test_local_volume_subset_of_trade_volume(spark, sf_dir):
    """Q5's local revenue total equals the same-nation diagonal of q161's
    nation-pair trade matrix."""
    fn5, _ = MINING_QUERIES["q165_local_supplier_volume"]
    fn7, _ = MINING_QUERIES["q161_nation_trade_volume"]
    local = fn5(spark, sf_dir).agg(F.sum("revenue_cents")).collect()[0][0]
    diag = (
        fn7(spark, sf_dir)
        .filter(F.col("supp_nation") == F.col("cust_nation"))
        .agg(F.sum("revenue_cents"))
        .collect()[0][0]
    )
    assert local == diag


def test_decayed_engagement_bounds(spark, sf_dir):
    """Score never exceeds the undecayed total and is monotone under the
    shift: score <= sum(cents); every user appears once."""
    from hadoop_jobanalyzer_spark.plans.tables import load_tables

    fn, _ = MINING_QUERIES["q166_decayed_engagement"]
    rows = fn(spark, sf_dir).collect()
    totals = {
        r["user_id"]: r["t"]
        for r in load_tables(spark, sf_dir)["events"]
        .groupBy("user_id")
        .agg(F.sum(F.floor(F.col("value") * 100).cast("long")).alias("t"))
        .collect()
    }
    assert len(rows) == len(totals)
    for r in rows:
        assert 0 <= r["score"] <= totals[r["user_id"]]


def test_funnel_quartiles_ordered_and_consistent(spark, sf_dir):
    """Quartiles are ordered, and n_matches equals q148's total match
    count (same CEP semantics)."""
    fn, _ = MINING_QUERIES["q167_funnel_duration_quartiles"]
    r = fn(spark, sf_dir).collect()[0]
    assert 0 <= r["q1_ms"] <= r["median_ms"] <= r["q3_ms"]
    from hadoop_jobanalyzer_spark.plans.behavior_queries import BEHAVIOR_QUERIES

    q148, _ = BEHAVIOR_QUERIES["q148_funnel_pattern_matches"]
    total = q148(spark, sf_dir).agg(F.sum("n_matches")).collect()[0][0]
    assert r["n_matches"] == total


def test_ann_recall_in_bounds(spark, sf_dir):
    fn, _ = MINING_QUERIES["q168_ann_recall_audit"]
    rows = fn(spark, sf_dir).collect()
    assert [r["method"] for r in rows] == ["ivf_label", "srp_bucket"]
    for r in rows:
        assert 0 <= r["n_hits"] <= min(10, r["n_candidates"])
        assert r["recall"] == r["n_hits"] / 10.0


def test_dedup_audit_consistency(spark, sf_dir):
    """Hits can't exceed either set; ratios reproduce from the counts."""
    fn, _ = MINING_QUERIES["q169_dedup_candidate_audit"]
    r = fn(spark, sf_dir).collect()[0]
    assert r["n_hits"] <= min(r["n_candidates"], r["n_truth"])
    assert r["cand_precision"] == r["n_hits"] / r["n_candidates"]
    assert r["truth_recall"] == r["n_hits"] / r["n_truth"]
    assert r["n_truth"] > 0 and r["n_candidates"] > 0


def test_band_revenue_bands_disjoint_exhaustive(spark, sf_dir):
    """Each matched line item lands in exactly one band (disjuncts are
    disjoint by brand), and band revenue is positive."""
    fn, _ = MINING_QUERIES["q170_band_revenue"]
    rows = fn(spark, sf_dir).collect()
    assert {r["band"] for r in rows} <= {1, 2, 3}
    for r in rows:
        assert r["revenue_cents"] > 0 and r["n_items"] > 0


def test_returned_item_top20_subset_semantics(spark, sf_dir):
    """Every reported customer's revenue must be >= any non-reported
    customer's returned revenue (it is a true top-20)."""
    fn, _ = MINING_QUERIES["q171_returned_item_customers"]
    rows = fn(spark, sf_dir).collect()
    assert len(rows) == 20
    revs = [r["revenue_cents"] for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_source_vocab_jaccard_pairs_complete(spark, sf_dir):
    """All source pairs appear exactly once with jaccard in (0, 1]."""
    from hadoop_jobanalyzer_spark.plans.tables import load_tables

    fn, _ = MINING_QUERIES["q172_source_vocab_jaccard"]
    rows = fn(spark, sf_dir).collect()
    n_src = load_tables(spark, sf_dir)["documents"].select("source").distinct().count()
    assert len(rows) == n_src * (n_src - 1) // 2
    for r in rows:
        assert r["source_a"] < r["source_b"]
        assert 0.0 < r["jaccard"] <= 1.0
        assert r["n_common"] <= min(r["n_a"], r["n_b"])


def test_cohort_ltv_curves_monotone(spark, sf_dir):
    """Cumulative revenue is non-decreasing within each cohort, active
    counts never exceed cohort size, and offset 0 exists per cohort."""
    fn, _ = MINING_QUERIES["q173_cohort_ltv_curves"]
    rows = fn(spark, sf_dir).collect()
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r["cohort_month"], []).append(r)
    for cohort, rs in by_cohort.items():
        assert rs[0]["month_off"] == 0
        cums = [r["cum_revenue_cents"] for r in rs]
        assert cums == sorted(cums)
        for r in rs:
            assert 0 < r["n_active"] <= r["cohort_size"]


def test_temporal_lookup_partitions_events(spark, sf_dir):
    """The SCD2 intervals partition each tracked user's timeline: every
    event lands in exactly one interval, so per-interval counts sum to
    the user's event count."""
    from hadoop_jobanalyzer_spark.plans.tables import load_tables

    fn, _ = MINING_QUERIES["q174_temporal_lookup_join"]
    got = {}
    for r in fn(spark, sf_dir).collect():
        got[r["user_id"]] = got.get(r["user_id"], 0) + r["n_events"]
    want = {
        r["user_id"]: r["n"]
        for r in load_tables(spark, sf_dir)["events"]
        .filter(F.col("user_id") < 50)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want


def test_brand_corr_bounds(spark, sf_dir):
    fn, _ = MINING_QUERIES["q175_brand_discount_qty_corr"]
    rows = fn(spark, sf_dir).collect()
    assert len(rows) >= 20
    for r in rows:
        if r["corr"] is not None:
            assert -1.0 - 1e-12 <= r["corr"] <= 1.0 + 1e-12
            assert (r["corr"] > 0) == (r["corr_num"] > 0) or r["corr_num"] == 0


def test_frequent_triples_are_within_baskets(spark, sf_dir):
    """Each reported triple's support equals the number of distinct
    orders containing ALL THREE parts (recomputed driver-side for the
    top row), and keys are strictly ordered."""
    from hadoop_jobanalyzer_spark.plans.tables import load_tables

    fn, _ = MINING_QUERIES["q176_frequent_part_triples"]
    rows = fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["p1"] < r["p2"] < r["p3"] and r["support"] >= 1
    top = rows[0]
    li = load_tables(spark, sf_dir)["lineitem"]
    orders_with = None
    for pk in (top["p1"], top["p2"], top["p3"]):
        s = {
            r["l_orderkey"]
            for r in li.filter(F.col("l_partkey") == pk)
            .select("l_orderkey")
            .distinct()
            .collect()
        }
        orders_with = s if orders_with is None else orders_with & s
    assert len(orders_with) == top["support"]


def test_wilson_bounds_bracket_rate(spark, sf_dir):
    fn, _ = MINING_QUERIES["q177_quality_pass_rates"]
    for r in fn(spark, sf_dir).collect():
        assert 0.0 <= r["wilson_lo"] <= r["rate"] <= r["wilson_hi"] <= 1.0
        assert r["n_pass"] <= r["n_docs"]


def test_ab_arms_partition_users(spark, sf_dir):
    """Both arms exist, arm assignment is md5-deterministic (re-derived
    driver-side), and the arms partition the purchasing users."""
    import hashlib

    from hadoop_jobanalyzer_spark.plans.tables import load_tables

    fn, _ = MINING_QUERIES["q178_ab_experiment_readout"]
    rows = fn(spark, sf_dir).collect()
    assert [r["arm"] for r in rows] == [0, 1]
    users = {
        r["user_id"]
        for r in load_tables(spark, sf_dir)["events"]
        .filter(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .collect()
    }
    by_arm = {0: 0, 1: 0}
    for u in users:
        by_arm[int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16) % 2] += 1
    assert {r["arm"]: r["n_users"] for r in rows} == by_arm
    for r in rows:
        assert r["var_cents2"] >= 0


def test_promo_share_bounds_and_totals(spark, sf_dir):
    """Promo share in [0,1]; promo + non-promo cents equal q161-style
    total lineitem revenue per month union."""
    fn, _ = MINING_QUERIES["q180_promo_revenue_share"]
    rows = fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["promo_share"] <= 1.0
        assert r["promo_cents"] <= r["total_cents"]


def test_large_volume_orders_exceed_threshold(spark, sf_dir):
    fn, _ = MINING_QUERIES["q181_large_volume_customers"]
    rows = fn(spark, sf_dir).collect()
    assert rows
    assert all(r["order_qty"] > 250 for r in rows)
    assert len({r["o_orderkey"] for r in rows}) == len(rows)


def test_order_count_distribution_masses(spark, sf_dir):
    """Bucket masses sum to the customer count, and weighted bucket sum
    equals the order count."""
    from hadoop_jobanalyzer_spark.plans.tables import load_tables

    fn, _ = MINING_QUERIES["q182_order_count_distribution"]
    rows = fn(spark, sf_dir).collect()
    t = load_tables(spark, sf_dir)
    assert sum(r["n_customers"] for r in rows) == t["customer"].count()
    assert sum(r["n_orders"] * r["n_customers"] for r in rows) == t["orders"].count()


def test_top_supplier_is_the_max_with_ties(spark, sf_dir):
    """Within each quarter every reported supplier has the quarter's MAX
    revenue (ties kept), and every quarter present in lineitem appears."""
    fn, _ = MINING_QUERIES["q183_top_supplier_per_quarter"]
    rows = fn(spark, sf_dir).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["quarter"], set()).add(r["revenue_cents"])
    assert by_q and all(len(v) == 1 for v in by_q.values())


def test_medoid_is_argmin_of_its_group(spark, sf_dir):
    """Recompute one label's medoid driver-side with brute-force integer
    math; the grouped-map result must be that exact argmin, and every
    label appears once."""
    import math

    from hadoop_jobanalyzer_spark.plans.tables import load_tables

    fn, _ = MINING_QUERIES["q184_label_medoids"]
    rows = fn(spark, sf_dir).collect()
    emb = load_tables(spark, sf_dir)["embeddings"]
    assert len(rows) == emb.select("label").distinct().count()
    lbl = rows[0]["label"]
    members = [
        (r["vec_id"], [math.floor(float(x) * 1000) for x in r["embedding"]])
        for r in emb.filter(F.col("label") == lbl).collect()
    ]
    best = None
    for vid, q in members:
        s = sum(
            sum((a - b) * (a - b) for a, b in zip(q, q2))
            for vid2, q2 in members
            if vid2 != vid
        )
        if best is None or (s, vid) < best:
            best = (s, vid)
    got = rows[0]
    assert (got["sum_sq_dist"], got["medoid_vec_id"]) == best
    assert got["n_members"] == len(members)


def test_medoid_group_cap_bounds_task_memory(spark, sf_dir):
    """Planted skew: with max_group below the biggest label's size, the
    capped path must (a) still return one row per label, (b) report the
    TRUE member count, and (c) pick the medoid of the documented
    deterministic Knuth-hash sample — so one hot label can never
    materialize an unbounded frame in its task, and the result does not
    depend on partitioning."""
    import math

    from hadoop_jobanalyzer_spark.plans.mining_queries import q184_label_medoids
    from hadoop_jobanalyzer_spark.plans.tables import load_tables

    emb = load_tables(spark, sf_dir)["embeddings"]
    sizes = {r["label"]: r["n"] for r in emb.groupBy("label").count().withColumnRenamed("count", "n").collect()}
    cap = max(2, min(sizes.values()) // 2)  # strictly below every group
    rows = {r["label"]: r for r in q184_label_medoids(spark, sf_dir, max_group=cap).collect()}
    assert set(rows) == set(sizes)
    assert all(rows[lbl]["n_members"] == sizes[lbl] for lbl in sizes)

    # driver-side recompute of the capped medoid for one label using the
    # same deterministic sample rule (hash-order on vec_id, first `cap`)
    lbl = sorted(sizes)[0]
    members = [
        (r["vec_id"], [math.floor(float(x) * 1000) for x in r["embedding"]])
        for r in emb.filter(F.col("label") == lbl).collect()
    ]
    members.sort(key=lambda m: ((m[0] * 2654435761) & 0xFFFFFFFF, m[0]))
    sample = sorted(members[:cap])  # restore id order; hash order only selects
    best = None
    for vid, q in sample:
        s = sum(
            sum((a - b) * (a - b) for a, b in zip(q, q2))
            for vid2, q2 in sample
            if vid2 != vid
        )
        if best is None or (s, vid) < best:
            best = (s, vid)
    got = rows[lbl]
    assert (got["sum_sq_dist"], got["medoid_vec_id"]) == best

    # partition-independence: a second run over a differently-partitioned
    # session state must reproduce byte-identical rows
    again = {r["label"]: r for r in q184_label_medoids(spark, sf_dir, max_group=cap).collect()}
    assert again == rows


def test_relaxed_funnel_dominates_strict(spark, sf_dir):
    """The bounded-gap funnel admits every strict-contiguity conversion:
    any user with a q148 strict view->click->purchase match converts here
    too, and rates stay in [0,1]."""
    from hadoop_jobanalyzer_spark.plans.behavior_queries import BEHAVIOR_QUERIES

    fn, _ = MINING_QUERIES["q185_relaxed_funnel_conversion"]
    rows = {r["user_id"]: r for r in fn(spark, sf_dir).collect()}
    for r in rows.values():
        assert 0 <= r["n_converted"] <= r["n_views"]
        assert 0.0 <= r["convert_rate"] <= 1.0
    strict, _ = BEHAVIOR_QUERIES["q148_funnel_pattern_matches"]
    for s in strict(spark, sf_dir).collect():
        assert rows[s["user_id"]]["n_converted"] >= 1


def test_late_order_census_never_double_counts(spark, sf_dir):
    """Semi-join semantics: the census total can never exceed the number
    of distinct orders, even though late orders often have several late
    items."""
    from hadoop_jobanalyzer_spark.plans.tables import load_tables

    fn, _ = MINING_QUERIES["q186_late_order_priority_census"]
    rows = fn(spark, sf_dir).collect()
    assert rows
    total = sum(r["n_late_orders"] for r in rows)
    n_orders = load_tables(spark, sf_dir)["orders"].count()
    assert 0 < total <= n_orders


def test_ohlc_bar_invariants(spark, sf_dir):
    """low <= open/close <= high in every bar; open/close recomputed
    driver-side for the busiest bar."""
    from hadoop_jobanalyzer_spark.plans.tables import load_tables
    from hadoop_jobanalyzer_spark.util import epoch_ms, epoch_s

    fn, _ = MINING_QUERIES["q187_five_minute_bars"]
    rows = fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["low_c"] <= r["open_c"] <= r["high_c"]
        assert r["low_c"] <= r["close_c"] <= r["high_c"]
        assert r["low_c"] <= r["mean_c"] <= r["high_c"]
    busiest = max(rows, key=lambda r: r["n_trades"])
    ev = (
        load_tables(spark, sf_dir)["events"]
        .filter(F.col("event_type") == "purchase")
        .select(
            F.floor(epoch_s("ts") / 300).cast("long").alias("bar"),
            epoch_ms("ts").alias("ms"),
            "event_id",
            F.floor(F.col("value") * 100).cast("long").alias("cents"),
        )
        .filter(F.col("bar") == busiest["bar"])
        .collect()
    )
    ordered = sorted(ev, key=lambda r: (r["ms"], r["event_id"]))
    assert ordered[0]["cents"] == busiest["open_c"]
    assert ordered[-1]["cents"] == busiest["close_c"]
    assert len(ordered) == busiest["n_trades"]


def test_srp_planes_are_balanced_rademacher(spark, sf_dir):
    """The fixed hyperplanes are +-1 only and roughly balanced (md5 bit
    parity), and every vector lands in exactly one bucket."""
    flat = [s for plane in _SRP_SIGNS for s in plane]
    assert set(flat) <= {1, -1}
    pos = sum(1 for s in flat if s == 1)
    assert 0.35 < pos / len(flat) < 0.65
    fn, _ = MINING_QUERIES["q158_srp_lsh_buckets"]
    df = fn(spark, sf_dir)
    from hadoop_jobanalyzer_spark.plans.tables import load_tables

    n_vecs = load_tables(spark, sf_dir)["embeddings"].count()
    assert df.agg(F.sum("n_vecs")).collect()[0][0] == n_vecs
