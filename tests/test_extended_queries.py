"""Differential + unit tests for the extended query set (q40-q46) and the
graph/sampling operators behind it."""

import pytest
from pyspark.sql import functions as F

from hadoop_jobanalyzer_spark.operators.graph import component_sizes, connected_components
from hadoop_jobanalyzer_spark.operators.sampling import hash_bucket, hash_sample
from hadoop_jobanalyzer_spark.plans.extended_queries import EXTENDED_QUERIES

from tests.oracle_utils import compare, driver_sql, duck_connect


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connect(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(EXTENDED_QUERIES))
def test_extended_query_matches_oracle(spark, sf_dir, duck, name):
    fn, _ = EXTENDED_QUERIES[name]
    sql = driver_sql(name)
    if sql is None:
        pytest.skip("rows-only entry (non-SQL-expressible; own differential)")
    problems = compare(fn(spark, sf_dir), duck, sql)
    assert not problems, f"{name}: {problems}"


@pytest.mark.parametrize("name", sorted(EXTENDED_QUERIES))
def test_extended_query_nonempty(spark, sf_dir, name):
    fn, _ = EXTENDED_QUERIES[name]
    assert fn(spark, sf_dir).count() > 0, f"{name} returned no rows at {sf_dir}"


# --- connected components unit tests ----------------------------------------


def _cc(spark, edges, nodes=None):
    edf = spark.createDataFrame(edges, "src long, dst long")
    ndf = spark.createDataFrame([(n,) for n in nodes], "id long") if nodes else None
    out = connected_components(edf, nodes=ndf)
    return {r["id"]: r["component"] for r in out.collect()}

def test_cc_path_graph(spark):
    # a long path exercises pointer jumping (min label must travel the chain)
    got = _cc(spark, [(i, i + 1) for i in range(1, 12)])
    assert got == {i: 1 for i in range(1, 13)}


def test_cc_two_components_and_singleton(spark):
    got = _cc(spark, [(1, 2), (2, 3), (10, 11)], nodes=[1, 2, 3, 10, 11, 99])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 99: 99}


def test_cc_star_and_cycle(spark):
    got = _cc(spark, [(5, 1), (5, 2), (5, 3), (7, 8), (8, 9), (9, 7)])
    assert got == {1: 1, 2: 1, 3: 1, 5: 1, 7: 7, 8: 7, 9: 7}


def test_cc_empty_edges_with_nodes(spark):
    edf = spark.createDataFrame([], "src long, dst long")
    ndf = spark.createDataFrame([(1,), (2,)], "id long")
    out = {r["id"]: r["component"] for r in connected_components(edf, nodes=ndf).collect()}
    assert out == {1: 1, 2: 2}


def test_component_sizes(spark):
    edf = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    out = component_sizes(connected_components(edf), id_col="id")
    assert {(r["id"], r["cluster_size"]) for r in out.collect()} == {(1, 3), (2, 3), (3, 3)}


# --- property-based: CC vs union-find, frame reassembly ----------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _union_find(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-label normalization
    out = {}
    for x in range(n_nodes):
        r = find(x)
        out.setdefault(r, []).append(x)
    return {x: min(grp) for r, grp in out.items() for x in grp}


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.integers(min_value=2, max_value=30).flatmap(
        lambda n: st.tuples(
            st.just(n),
            st.lists(
                st.tuples(
                    st.integers(min_value=0, max_value=n - 1),
                    st.integers(min_value=0, max_value=n - 1),
                ),
                max_size=40,
            ),
        )
    )
)
def test_cc_matches_union_find(spark, n_and_edges):
    n, edges = n_and_edges
    edges = [(a, b) for a, b in edges if a != b]
    expected = _union_find(n, edges)
    edf = spark.createDataFrame(edges or [(0, 0)], "src long, dst long")
    ndf = spark.createDataFrame([(i,) for i in range(n)], "id long")
    got = {
        r["id"]: r["component"]
        for r in connected_components(edf, nodes=ndf).collect()
    }
    assert got == expected


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.binary(min_size=1, max_size=200), st.integers(min_value=1, max_value=64))
def test_frame_reassembly_roundtrip(spark, payload, frame_len):
    """With stride == frame_len, concatenating the frames in order must
    reproduce the payload exactly (lossless tiling)."""
    from hadoop_jobanalyzer_spark.operators.multimodal import frame_sample

    df = spark.createDataFrame([(1, bytearray(payload))], "doc_id long, payload binary")
    rows = frame_sample(df, frame_len=frame_len, stride=frame_len).collect()
    rows.sort(key=lambda r: r["frame_idx"])
    assert b"".join(bytes(r["frame"]) for r in rows) == payload


# --- multimodal frame/thumbnail plumbing -------------------------------------


def test_frame_sample_shapes(spark):
    from hadoop_jobanalyzer_spark.operators.multimodal import frame_sample

    df = spark.createDataFrame(
        [(1, bytearray(b"a" * 100)), (2, bytearray(b"xy"))],
        "doc_id long, payload binary",
    )
    rows = frame_sample(df, frame_len=64, stride=32).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: offsets 0,32,64,96 -> 4 frames; lens 64,64,36,4
    assert [len(bytes(r["frame"])) for r in sorted(by_doc[1], key=lambda r: r["frame_idx"])] == [64, 64, 36, 4]
    # doc 2: single short frame
    assert len(by_doc[2]) == 1 and bytes(by_doc[2][0]["frame"]) == b"xy"


def test_fake_thumbnail_deterministic(spark):
    from hadoop_jobanalyzer_spark.operators.multimodal import fake_thumbnail

    df = spark.createDataFrame(
        [(1, bytearray(bytes(range(32))))], "doc_id long, payload binary"
    )
    thumb = bytes(fake_thumbnail(df, factor=8).first()["thumb"])
    assert thumb == bytes([0, 8, 16, 24])


# --- approximate aggregate tolerance tests -----------------------------------


def test_approx_distinct_within_rsd(spark, sf_dir):
    from hadoop_jobanalyzer_spark.functions.approx import approx_distinct
    from hadoop_jobanalyzer_spark.plans.tables import load_tables

    ev = load_tables(spark, sf_dir)["events"]
    exact = ev.select(F.countDistinct("user_id")).first()[0]
    est = ev.select(approx_distinct("user_id", rsd=0.02)).first()[0]
    assert abs(est - exact) <= max(0.08 * exact, 2), (est, exact)


def test_approx_quantiles_within_rank_error(spark, sf_dir):
    from hadoop_jobanalyzer_spark.functions.approx import approx_quantiles
    from hadoop_jobanalyzer_spark.plans.tables import load_tables

    ev = load_tables(spark, sf_dir)["events"]
    vals = sorted(r["value"] for r in ev.select("value").collect())
    n = len(vals)
    for p, est in zip([0.1, 0.5, 0.9], approx_quantiles(ev, "value", [0.1, 0.5, 0.9], 0.01)):
        # GK guarantee: returned value's rank within (p +- relative_error) * n
        lo = vals[max(0, int((p - 0.02) * n) - 1)]
        hi = vals[min(n - 1, int((p + 0.02) * n) + 1)]
        assert lo <= est <= hi, (p, est, lo, hi)


# --- sampling unit tests -----------------------------------------------------


def test_hash_bucket_range_and_determinism(spark):
    df = spark.range(500).select(hash_bucket(F.col("id")).alias("b"))
    rows = [r["b"] for r in df.collect()]
    assert all(0 <= b < 100 for b in rows)
    rows2 = [r["b"] for r in df.collect()]
    assert rows == rows2


def test_hash_sample_disjoint_strata(spark):
    df = spark.range(1000)
    kept = hash_sample(df, F.col("id"), 10)
    n = kept.count()
    assert 40 <= n <= 200  # ~10% of 1000, generous tolerance
    # complement: pct=10 sample is a subset of pct=50 sample (nesting property)
    wide = {r["id"] for r in hash_sample(df, F.col("id"), 50).collect()}
    assert {r["id"] for r in kept.collect()} <= wide


def test_weighted_sample_contracts(spark):
    """weighted_sample: deterministic, ~expected size, zero-weight rows
    never kept, saturated weights (p clamped to 1) always kept."""
    from hadoop_jobanalyzer_spark.operators.sampling import weighted_sample

    df = spark.range(1000).select(
        F.col("id"), F.when(F.col("id") < 900, F.lit(1.0)).otherwise(F.lit(0.0)).alias("w")
    )
    kept = weighted_sample(df, F.col("id"), F.col("w"), expected_rows=100)
    ids = {r["id"] for r in kept.collect()}
    # zero-weight rows (id >= 900) can never be sampled
    assert all(i < 900 for i in ids)
    assert 40 <= len(ids) <= 200  # ~100 expected, generous tolerance
    # deterministic: identical membership on rerun
    assert {r["id"] for r in kept.collect()} == ids
    # p is a valid probability everywhere
    ps = [r["_p"] for r in kept.collect()]
    assert all(0.0 < p <= 1.0 for p in ps)

    # one giant weight saturates (p==1) and is always kept
    df2 = spark.range(10).select(
        F.col("id"), F.when(F.col("id") == 3, F.lit(1e9)).otherwise(F.lit(1.0)).alias("w")
    )
    kept2 = weighted_sample(df2, F.col("id"), F.col("w"), expected_rows=5)
    rows2 = {r["id"]: r["_p"] for r in kept2.collect()}
    assert 3 in rows2 and rows2[3] == 1.0


def test_source_balance_deterministic_and_monotone(spark):
    """Hash-mod sampling contracts: (1) re-running selects the same docs;
    (2) growing source B never changes which of source A's docs are kept
    (only A's own rate changes if the min moves)."""
    from pyspark.sql import functions as F

    from hadoop_jobanalyzer_spark.operators.sampling import hash_bucket

    rows = [(i, "a" if i < 40 else "b") for i in range(100)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    mod = 10_000

    def kept_ids(frame, rate_for):
        return {
            r["doc_id"]
            for r in frame.withColumn("_b", hash_bucket(F.col("doc_id"), mod))
            .filter(F.col("_b") < rate_for(frame))
            .collect()
        }

    # source a (40 docs) is the min; b keeps 40/60 of its docs
    rate_b = mod * 40 // 60
    b = df.filter("source = 'b'")
    first = kept_ids(b, lambda _: rate_b)
    again = kept_ids(b, lambda _: rate_b)
    assert first == again and 0 < len(first) < 60
    # raising b's rate (e.g. corpus rebalance) only ADDS members
    fuller = kept_ids(b, lambda _: mod * 50 // 60)
    assert first <= fuller


def test_entropy_bounds(spark, sf_dir):
    """0 <= entropy <= ln(n_types) for every doc (equality at uniform)."""
    import math

    from hadoop_jobanalyzer_spark.plans.extended_queries import EXTENDED_QUERIES
    from hadoop_jobanalyzer_spark.plans.pipeline_queries import PIPELINE_QUERIES

    ent = {r["doc_id"]: r["entropy"] for r in PIPELINE_QUERIES["q64_token_entropy"][0](spark, sf_dir).collect()}
    types = {r["doc_id"]: r["n_types"] for r in PIPELINE_QUERIES["q62_repetition_signals"][0](spark, sf_dir).collect()}
    assert ent.keys() == types.keys()
    for d, e in ent.items():
        # entropy is rounded to 4 decimals: allow half-ulp of that rounding
        assert -1e-9 <= e <= math.log(types[d]) + 5e-5, (d, e, types[d])


def test_salted_join_matches_plain_join(spark):
    """salted_join must be row-identical to the plain join while spreading
    a hot key over n_salts reducer buckets."""
    from pyspark.sql import functions as F

    from hadoop_jobanalyzer_spark.operators.skew import salted_join

    # 90% of fact rows share one hot key
    fact = spark.createDataFrame(
        [(i, "hot" if i % 10 else f"k{i}", i * 1.5) for i in range(1000)],
        ["id", "k", "v"],
    )
    dim = spark.createDataFrame(
        [("hot", "HOT"), ("k10", "T"), ("k20", "U"), ("missing", "X")],
        ["k", "label"],
    )
    plain = fact.join(dim, "k").select("id", "k", "v", "label")
    salted = salted_join(fact, dim, ["k"], n_salts=8).select("id", "k", "v", "label")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))
    # left join keeps unmatched fact rows exactly once
    plain_l = fact.join(dim, "k", "left")
    salted_l = salted_join(fact, dim, ["k"], n_salts=8, how="left")
    assert salted_l.count() == plain_l.count() == 1000
    # and the hot key's rows really spread across salt buckets
    spread_check = (
        fact.withColumn("_salt", F.pmod(F.hash("id", "v"), F.lit(8)))
        .filter("k = 'hot'").select("_salt").distinct().count()
    )
    assert spread_check > 1


def test_blocked_levenshtein_max_block_guard(spark):
    """max_block drops over-cap blocks WHOLE before the self-join (the
    LSH max_bucket pattern applied to the fuzzy blocked join): a giant
    block contributes zero pairs instead of C(n,2), and None preserves
    exact semantics."""
    from pyspark.sql import functions as F

    from hadoop_jobanalyzer_spark.operators.fuzzy import blocked_levenshtein_pairs

    rows = [(i, "big", "alpha beta gamma") for i in range(5)] + [
        (10, "small", "delta one"),
        (11, "small", "delta two"),
        (12, "small", "delta ten"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "blk", "text"])

    uncapped = blocked_levenshtein_pairs(
        docs, "doc_id", "text", F.col("blk"), prefix_len=20, max_dist=8
    ).collect()
    assert len(uncapped) == 10 + 3  # C(5,2) big + C(3,2) small

    capped = blocked_levenshtein_pairs(
        docs, "doc_id", "text", F.col("blk"), prefix_len=20, max_dist=8, max_block=4
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in capped} == {(10, 11), (10, 12), (11, 12)}
