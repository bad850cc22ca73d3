"""Unified query registry: name -> (spark builder, optional DuckDB oracle).

This is the surface `__spark_entry__.py` exposes to the driver. Queries with
``oracle=None`` are non-SQL-expressible (the driver records a rows-only
check for those).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from hadoop_jobanalyzer_spark.plans.core_queries import CORE_QUERIES
from hadoop_jobanalyzer_spark.plans.tables import load_tables

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, tuple[QueryFn, str | None]] = {}
QUERIES.update(CORE_QUERIES)

try:  # pipeline queries (dedup/similarity/text/multimodal) — added as built
    from hadoop_jobanalyzer_spark.plans.pipeline_queries import PIPELINE_QUERIES

    QUERIES.update(PIPELINE_QUERIES)
except ImportError:  # pragma: no cover
    pass

try:  # extended queries (clustering, sampling, pivots, windows)
    from hadoop_jobanalyzer_spark.plans.extended_queries import EXTENDED_QUERIES

    QUERIES.update(EXTENDED_QUERIES)
except ImportError:  # pragma: no cover
    pass

try:  # analytics queries (quantization, k-means, tf-idf, span dedup)
    from hadoop_jobanalyzer_spark.plans.analytics_queries import ANALYTICS_QUERIES

    QUERIES.update(ANALYTICS_QUERIES)
except ImportError:  # pragma: no cover
    pass

try:  # sketch/graph/search queries (HLL, KMV, triangles, phrase, setsim)
    from hadoop_jobanalyzer_spark.plans.sketch_queries import SKETCH_QUERIES

    QUERIES.update(SKETCH_QUERIES)
except ImportError:  # pragma: no cover
    pass

try:  # warehouse shapes (remaining TPC-H forms: Q3/Q9/Q11/Q12/Q16/Q20)
    from hadoop_jobanalyzer_spark.plans.warehouse_queries import WAREHOUSE_QUERIES

    QUERIES.update(WAREHOUSE_QUERIES)
except ImportError:  # pragma: no cover
    pass

try:  # corpus analytics (TV distance, fertility, mixing, LPA, inverted index)
    from hadoop_jobanalyzer_spark.plans.corpus_queries import CORPUS_QUERIES

    QUERIES.update(CORPUS_QUERIES)
except ImportError:  # pragma: no cover
    pass

try:  # behavioural / data-quality queries (streaks, Spearman, Benford, expectations)
    from hadoop_jobanalyzer_spark.plans.behavior_queries import BEHAVIOR_QUERIES

    QUERIES.update(BEHAVIOR_QUERIES)
except ImportError:  # pragma: no cover
    pass

try:  # mining / timeseries queries (gapfill, edit-distance, argmin, SRP-LSH)
    from hadoop_jobanalyzer_spark.plans.mining_queries import MINING_QUERIES

    QUERIES.update(MINING_QUERIES)
except ImportError:  # pragma: no cover
    pass

try:  # pipeline planners (LSH banding, compaction, group k-fold, boilerplate)
    from hadoop_jobanalyzer_spark.plans.planner_queries import PLANNER_QUERIES

    QUERIES.update(PLANNER_QUERIES)
except ImportError:  # pragma: no cover
    pass

try:  # publication gates (k-anonymity, semantic-dedup manifest)
    from hadoop_jobanalyzer_spark.plans.curation_queries import CURATION_QUERIES

    QUERIES.update(CURATION_QUERIES)
except ImportError:  # pragma: no cover
    pass

try:  # model-building (iterated k-means codebook, link prediction)
    from hadoop_jobanalyzer_spark.plans.model_queries import MODEL_QUERIES

    QUERIES.update(MODEL_QUERIES)
except ImportError:  # pragma: no cover
    pass

try:  # curation extensions (containment dedup, mixture schedule, novelty)
    from hadoop_jobanalyzer_spark.plans.sampling_queries import SAMPLING_QUERIES

    QUERIES.update(SAMPLING_QUERIES)
except ImportError:  # pragma: no cover
    pass

# The driver's correctness gate records at most 50 queries per round, in
# registry iteration order (CORRECTNESS_r01.json stopped at exactly the
# first 50 of 59).  To make the union of rounds cover everything AND keep
# re-checking old greens against environment drift, order the registry:
#   1. never-verified or red queries (new work + known breakage) first,
#   2. then greens by ascending last-verified round (stalest first).
# The history is read from the driver's own CORRECTNESS_r*.json artifacts
# at the repo root, so each round's ordering rotates automatically.
import json as _json
from pathlib import Path as _Path

_REPO_ROOT = _Path(__file__).resolve().parents[2]


def _verification_history() -> tuple[dict[str, int], set[str]]:
    """(greens, reds): query name -> latest round the driver verified it
    fully green (no error, rows+schema match, hash not a recorded
    mismatch), plus the set of queries whose LATEST driver record is red.
    A RED result in a round at or after the last green resets the query —
    a fixed regression must re-verify immediately, not queue behind the
    stale-green rotation."""
    greens: dict[str, int] = {}
    reds: dict[str, int] = {}
    for p in sorted(_REPO_ROOT.glob("CORRECTNESS_r*.json")):
        try:
            rnd = int(p.stem.rsplit("_r", 1)[1])
            data = _json.loads(p.read_text())
        except (ValueError, IndexError, OSError, _json.JSONDecodeError):
            continue
        for name, rec in data.items():
            if not isinstance(rec, dict):
                continue
            green = (
                rec.get("err") is None
                and rec.get("rows_match") is True
                and rec.get("schema_match") is True
                and rec.get("hash_match") is not False
            )
            if green:
                greens[name] = max(rnd, greens.get(name, 0))
            else:
                reds[name] = max(rnd, reds.get(name, 0))
    still_green = {
        name: rnd
        for name, rnd in greens.items()
        if reds.get(name, -1) < rnd
    }
    still_red = {n for n in reds if n not in still_green}
    return still_green, still_red


def _priority_order(names: list[str]) -> list[str]:
    """Known-red first (a fix must prove itself in the very next round),
    then never-verified (new queries), then greens stalest-first. The
    driver records only the first ~50 registry entries per round, so this
    ordering decides what gets (re-)verified."""
    greens, reds = _verification_history()

    def num(n: str) -> int:
        digits = "".join(ch for ch in n[1:] if ch.isdigit() or ch == "_").split("_")[0]
        return int(digits) if digits.isdigit() else 10**9

    def rank(n: str) -> tuple[int, int, int, str]:
        if n in reds:
            return (0, 0, num(n), n)
        if n not in greens:
            return (1, 0, num(n), n)
        return (2, greens[n], num(n), n)

    return sorted(names, key=rank)


def queries() -> dict[str, QueryFn]:
    return {name: QUERIES[name][0] for name in _priority_order(list(QUERIES))}


# DuckDB silently widens SUM over INTEGER/BIGINT to HUGEINT (int128).  The
# driver's value hash canonicalizes by each engine's own representation, so a
# HUGEINT oracle column hash-mismatches Spark's BIGINT even when every value
# is bit-identical (HUGEINT does not round-trip as int64 through pandas — it
# degrades to float64/object, so 4363 hashes as 4363.0).  Every column listed
# here is an integer aggregate whose values fit comfortably in int64 (the
# Spark side computes the same value as LongType); the cast only fixes the
# declared type.  `tools/hugeint_scan.py` + tests/test_registry_smoke.py keep
# this list exhaustive: any oracle that leaks a HUGEINT output column fails
# the suite.
_BIGINT_CASTS: dict[str, tuple[str, ...]] = {
    "q141_spearman_len_tokens": ("s_d2",),
    "q149_time_weighted_value": ("total_ms",),
    "q150_ks_length_drift": ("d_num",),
    "q153_gapfill_interpolation": ("filled_num",),
    "q155_cheapest_supplier_per_part": ("cost_cents", "qty"),
    "q156_dormant_segment_profile": ("bal_cents",),
    "q157_next_word_branching": ("total",),
    "q160_hourly_anomaly_flags": ("dev", "var_num"),
    "q161_nation_trade_volume": ("revenue_cents",),
    "q162_customer_spend_ranks": ("spend_cents",),
    "q163_rolling_correlation": ("corr_num",),
    "q164_weighted_median_value": ("total_weight",),
    "q165_local_supplier_volume": ("revenue_cents",),
    "q166_decayed_engagement": ("score",),
    "q167_funnel_duration_quartiles": ("n_matches",),
    "q170_band_revenue": ("revenue_cents",),
    "q171_returned_item_customers": ("revenue_cents",),
    "q173_cohort_ltv_curves": ("revenue_cents", "cum_revenue_cents"),
    "q174_temporal_lookup_join": ("value_cents",),
    "q175_brand_discount_qty_corr": ("corr_num",),
    "q178_ab_experiment_readout": ("value_cents",),
    "q179_forecast_revenue_delta": ("revenue_cents",),
    "q180_promo_revenue_share": ("promo_cents", "total_cents"),
    "q181_large_volume_customers": ("order_qty",),
    "q183_top_supplier_per_quarter": ("revenue_cents",),
    "q184_label_medoids": ("sum_sq_dist",),
    "q188_shipping_priority": ("revenue_c",),
    "q189_product_margin": ("profit_c",),
    "q191_important_parts": ("value_c",),
    "q193_late_priority_split": ("high_line_count", "low_line_count"),
    "q194_source_tv_distance": ("tv_num",),
    "q195_token_fertility": ("n_words", "n_tokens"),
    "q196_mixing_apportionment": ("n_tokens", "base_alloc", "alloc"),
    "q200_rolling_median_revenue": ("revenue_c", "med7_c"),
    "q201_epoch_shuffle_audit": ("sum_fold", "xor_fold"),
    "q202_batch_padding_efficiency": ("n_tokens", "pad_tokens"),
    "q204_dedup_token_savings": ("n_removed", "tokens_total", "tokens_saved"),
    "q205_filter_ablation": ("n_tokens",),
    "q207_fd_audit": ("n_violating",),
    "q209_join_size_forecast": ("join_rows",),
    "q210_adoption_curve": ("n_total",),
    "q211_ship_lag_percentiles": ("n_lines",),
    "q212_supplier_scorecard": ("revenue_c",),
    "q213_lang_source_residuals": ("dev",),
    "q214_value_gini": ("total_c",),
    "q215_training_mix_manifest": ("tokens_selected",),
    "q216_lsh_banding_planner": ("n_buckets_multi",),
    "q217_compaction_plan": ("group_bytes",),
    "q218_group_kfold": ("n_tokens",),
    "q221_truncation_planner": ("docs_over", "total_tokens", "tokens_lost"),
    "q222_dedup_threshold_sweep": ("n_pairs_ge",),
    "q223_watermark_planner": ("n_events", "n_late"),
    "q224_join_strategy_advisor": ("est_bytes",),
    "q225_write_size_planner": ("bytes", "n_files", "docs_per_file"),
    "q226_session_timeout_grid": ("n_sessions",),
    "q228_distinctive_terms": ("c_rest",),
    "q229_quality_dup_calibration": ("n_dup",),
    "q230_k_anonymity": ("n_rows", "rows_at_risk"),
    "q90_sq8_error_histogram": ("err_bucket",),
}


def _retype_bigint(sql: str, cols: tuple[str, ...]) -> str:
    """Wrap an oracle so the listed columns leave as BIGINT, not HUGEINT.
    ``SELECT * REPLACE`` keeps column order/names and touches only the
    declared type; the int128 arithmetic inside stays exact."""
    replaces = ", ".join(f'CAST("{c}" AS BIGINT) AS "{c}"' for c in cols)
    return f"SELECT * REPLACE ({replaces}) FROM (\n{sql}\n) AS _retyped"


def oracle_sql() -> dict[str, str]:
    return {
        name: _retype_bigint(sql, _BIGINT_CASTS[name]) if name in _BIGINT_CASTS else sql
        for name, (_, sql) in QUERIES.items()
        if sql is not None
    }


__all__ = ["QUERIES", "queries", "oracle_sql", "load_tables"]
