"""Differential + semantic tests for the extension queries: q235
containment, q236 mixture schedule, q237 source novelty, q238 filter
kappa, plus the q239-q241 invariants (growth accounting, order
reconciliation, embedding audit)."""

import pytest
from pyspark.sql import functions as F

from hadoop_jobanalyzer_spark.plans.sampling_queries import SAMPLING_QUERIES

from tests.oracle_utils import compare, driver_sql, duck_connect


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connect(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(SAMPLING_QUERIES))
def test_sampling_query_matches_oracle(spark, sf_dir, duck, name):
    fn, _ = SAMPLING_QUERIES[name]
    sql = driver_sql(name)
    problems = compare(fn(spark, sf_dir), duck, sql)
    assert not problems, f"{name}: {problems}"


@pytest.mark.parametrize("name", sorted(SAMPLING_QUERIES))
def test_sampling_query_nonempty(spark, sf_dir, name):
    fn, _ = SAMPLING_QUERIES[name]
    assert fn(spark, sf_dir).count() > 0, f"{name} returned no rows at {sf_dir}"


def test_containment_is_superset_of_jaccard_pairs(spark, sf_dir):
    """Semantic invariant linking q235 to q123: any UNDIRECTED pair with
    Jaccard >= t also has containment >= t in both directions (the union
    is at least as large as either set), so the Jaccard pair set at a
    threshold embeds in the directed containment pair set at the same
    threshold."""
    from hadoop_jobanalyzer_spark.operators.setsim import (
        prefix_filter_containment_pairs,
        prefix_filter_jaccard_pairs,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    jac = {
        (r["id_a"], r["id_b"])
        for r in prefix_filter_jaccard_pairs(
            docs, "doc_id", "text", ngram=3, threshold=(8, 10)
        ).collect()
    }
    cont = {
        (r["id_a"], r["id_b"])
        for r in prefix_filter_containment_pairs(
            docs, "doc_id", "text", ngram=3, threshold=(8, 10)
        ).collect()
    }
    for a, b in jac:
        assert (a, b) in cont and (b, a) in cont, (a, b)


def test_containment_catches_size_skewed_inclusion(spark):
    """The asymmetric case Jaccard misses: a short doc quoted verbatim
    inside a much longer one has containment 1.0 but tiny Jaccard."""
    from hadoop_jobanalyzer_spark.operators.setsim import (
        prefix_filter_containment_pairs,
        prefix_filter_jaccard_pairs,
    )

    short = "alpha beta gamma delta epsilon zeta"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(40))
    long = filler + " " + short + " " + " ".join(f"z{i} q{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, short), (2, long)], "doc_id long, text string"
    )
    cont = prefix_filter_containment_pairs(
        docs, "doc_id", "text", ngram=3, threshold=(9, 10)
    ).collect()
    directed = {(r["id_a"], r["id_b"]): r["containment"] for r in cont}
    assert directed.get((1, 2)) == 1.0  # short fully inside long
    assert (2, 1) not in directed  # long is NOT inside short
    jac = prefix_filter_jaccard_pairs(
        docs, "doc_id", "text", ngram=3, threshold=(9, 10)
    ).collect()
    assert not jac  # Jaccard at the same threshold sees nothing


def test_mixture_schedule_prefix_is_proportional(spark, sf_dir):
    """Every source appears in the schedule head in proportion: with S
    equal-size sources, the first k*S positions hold exactly k docs of
    each source (equal keys r/n break ties by source name, giving a
    round-robin sweep per rank)."""
    fn, _ = SAMPLING_QUERIES["q236_mixture_schedule"]
    rows = fn(spark, sf_dir).collect()
    n_src = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "source"
    ).distinct().count()
    full_sweeps = len(rows) // n_src
    from collections import Counter

    head = Counter(r["source"] for r in rows[: full_sweeps * n_src])
    assert set(head.values()) == {full_sweeps}


def test_source_novelty_totals(spark, sf_dir):
    """Novel counts partition the distinct-gram domain: sum(n_novel) ==
    global distinct gram count, and the first source (order ascending)
    is 100% novel by construction."""
    from hadoop_jobanalyzer_spark.functions.text import shingles, tokens

    fn, _ = SAMPLING_QUERIES["q237_source_novelty"]
    rows = fn(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_distinct = (
        docs.select(F.explode(shingles(tokens(F.col("text")), 3)).alias("s"))
        .select("s")
        .distinct()
        .count()
    )
    assert sum(r["n_novel"] for r in rows) == n_distinct
    first = min(rows, key=lambda r: r["source"])
    assert first["n_novel"] == first["n_grams"]
    assert first["novelty_pct"] == 100.0


def test_filter_agreement_kappa_bounds(spark, sf_dir):
    """Kappa is chance-corrected: bounded by 1, and n_agree never
    exceeds n_docs; perfect self-agreement would be 1 (spot-verified by
    recomputing one pair from the raw flags)."""
    fn, _ = SAMPLING_QUERIES["q238_filter_agreement"]
    rows = {r["pair"]: r for r in fn(spark, sf_dir).collect()}
    assert set(rows) == {"len~words", "len~clean", "words~clean"}
    for r in rows.values():
        assert r["n_agree"] <= r["n_docs"]
        assert -1.0 <= r["kappa"] <= 1.0
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    words = F.size(F.split("text", " ")).cast("long")
    flags = docs.select(
        (F.col("n_chars") >= 200).cast("long").alias("fa"),
        (words >= 30).cast("long").alias("fb"),
    ).collect()
    n = len(flags)
    a1 = sum(r["fa"] for r in flags)
    b1 = sum(r["fb"] for r in flags)
    agree = sum(1 for r in flags if r["fa"] == r["fb"])
    chance = a1 * b1 + (n - a1) * (n - b1)
    expect = round((n * agree - chance) / (n * n - chance), 6)
    assert rows["len~words"]["n_agree"] == agree
    assert rows["len~words"]["kappa"] == expect


def test_growth_accounting_identities(spark, sf_dir):
    """Growth accounting must satisfy its defining identities:
    active(w) = new + retained + resurrected equals the distinct active
    user count that week, and churned(w+1) = active(w) - retained(w+1)
    inside the horizon."""
    from hadoop_jobanalyzer_spark.plans.behavior_queries import BEHAVIOR_QUERIES
    from hadoop_jobanalyzer_spark.util import epoch_s

    fn, _ = BEHAVIOR_QUERIES["q239_growth_accounting"]
    rows = {r["week"]: r for r in fn(spark, sf_dir).collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    actual = {
        r["wk"]: r["n"]
        for r in ev.select("user_id", (epoch_s("ts") / 604800).cast("long").alias("wk"))
        .distinct()
        .groupBy("wk")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert set(rows) == set(actual)
    for wk, r in rows.items():
        assert r["n_new"] + r["n_retained"] + r["n_resurrected"] == actual[wk], wk
    weeks = sorted(rows)
    for prev_w, w in zip(weeks, weeks[1:]):
        if w == prev_w + 1:
            active_prev = actual[prev_w]
            assert rows[w]["n_churned"] == active_prev - rows[w]["n_retained"], w


def test_order_reconciliation_covers_every_order(spark, sf_dir):
    """The drift census partitions the orders table: bucket counts sum to
    the order count, and bucket -1 equals the orders with no lineitems."""
    from hadoop_jobanalyzer_spark.plans.warehouse_queries import WAREHOUSE_QUERIES

    fn, _ = WAREHOUSE_QUERIES["q240_order_reconciliation"]
    rows = fn(spark, sf_dir).collect()
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    assert sum(r["n_orders"] for r in rows) == orders.count()
    n_orphan = orders.join(
        li, orders["o_orderkey"] == li["l_orderkey"], "left_anti"
    ).count()
    by_bucket = {r["drift_bucket"]: r["n_orders"] for r in rows}
    assert by_bucket.get(-1, 0) == n_orphan


def test_embedding_audit_flags_planted_defects(spark):
    """A planted zero vector and an exact duplicate pair must surface in
    the right label's counters."""
    from hadoop_jobanalyzer_spark.plans.sampling_queries import q241_embedding_audit
    import os, tempfile

    from tests.conftest import TESTDATA

    d = tempfile.mkdtemp()
    # load_tables reads the whole star schema — link the real tables,
    # override only embeddings with the planted frame
    for f in os.listdir(TESTDATA):
        if f.endswith(".parquet") and not f.startswith("embeddings"):
            os.symlink(os.path.join(TESTDATA, f), os.path.join(d, f))
    rows = [
        (1, [0.5, 0.25], 0),
        (2, [0.0, 0.0], 0),          # zero-norm
        (3, [0.125, -0.5], 1),
        (4, [0.125, -0.5], 1),       # duplicate pair
        (5, [0.3, 0.4], 1),
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(os.path.join(d, "embeddings.parquet"))
    out = {r["label"]: r for r in q241_embedding_audit(spark, d).collect()}
    assert out[0]["n_zero_norm"] == 1 and out[0]["n_dup_vectors"] == 0
    assert out[1]["n_zero_norm"] == 0 and out[1]["n_dup_vectors"] == 2
    assert out[0]["min_norm2"] == 0
