"""Property-based invariants for the sketch / graph / setsim operators
(q118-q131): each operator's core guarantee checked over randomized
inputs against an independent pure-Python evaluation."""

from itertools import combinations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# small random undirected graphs as edge lists over <=8 vertices
graphs = st.lists(
    st.tuples(st.integers(0, 7), st.integers(0, 7)),
    min_size=1,
    max_size=20,
)


def _canon(edges):
    return {(min(a, b), max(a, b)) for a, b in edges if a != b}


@settings(**_SETTINGS)
@given(graphs)
def test_triangle_census_matches_brute_force(spark, edges):
    from hadoop_jobanalyzer_spark.operators.graph import triangle_stats

    e = _canon(edges)
    df = spark.createDataFrame(list(edges), "src long, dst long")
    row = triangle_stats(df).collect()[0]

    verts = {v for p in e for v in p}
    tri = sum(
        1
        for a, b, c in combinations(sorted(verts), 3)
        if {(a, b), (b, c), (a, c)} <= e
    )
    deg = {v: sum(1 for p in e if v in p) for v in verts}
    wedges = sum(d * (d - 1) // 2 for d in deg.values())
    assert row["n_edges"] == len(e)
    assert row["n_wedges"] == wedges
    assert row["n_triangles"] == tri


@settings(**_SETTINGS)
@given(graphs)
def test_pagerank_fixed_matches_pure_python(spark, edges):
    from hadoop_jobanalyzer_spark.operators.graph import pagerank_fixed

    e = _canon(edges)
    if not e:
        return
    df = spark.createDataFrame(list(e), "src long, dst long")
    got = {r["v"]: r["rank_fixed"] for r in pagerank_fixed(df, iters=2).collect()}

    nbrs = {}
    for a, b in e:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    scale, base = 1 << 20, int(0.15 * (1 << 20))
    r = {v: scale for v in nbrs}
    for _ in range(2):
        c = {v: r[v] // len(nbrs[v]) for v in nbrs}
        r = {v: base + (17 * sum(c[u] for u in nbrs[v])) // 20 for v in nbrs}
    assert got == r


# random corpora from a small alphabet so overlaps actually occur
texts = st.lists(
    st.lists(st.sampled_from("abcdef"), min_size=2, max_size=10).map(" ".join),
    min_size=2,
    max_size=8,
)


@settings(**_SETTINGS)
@given(texts)
def test_prefix_filter_join_is_lossless(spark, docs):
    """Prefix-filtered exact Jaccard join == naive all-pairs evaluation
    for every random corpus (the AllPairs losslessness theorem)."""
    from hadoop_jobanalyzer_spark.operators.setsim import prefix_filter_jaccard_pairs

    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"], r["n_common"])
        for r in prefix_filter_jaccard_pairs(
            df, "doc_id", "text", ngram=2, threshold=(1, 2)
        ).collect()
    }

    def sh(t):
        w = t.split()
        return {" ".join(w[i : i + 2]) for i in range(len(w) - 1)}

    want = set()
    for i, j in combinations(range(len(docs)), 2):
        a, b = sh(docs[i]), sh(docs[j])
        if not a or not b:
            continue
        inter = len(a & b)
        if 2 * inter >= len(a | b):
            want.add((i, j, inter))
    assert got == want


@settings(**_SETTINGS)
@given(st.lists(st.text(alphabet="xyz -", min_size=0, max_size=40), min_size=1, max_size=6))
def test_cdc_chunks_always_cover(spark, texts_in):
    """Chunks always concatenate back to the document, for arbitrary
    content including short and empty strings."""
    from hadoop_jobanalyzer_spark.functions.text import cdc_boundaries, cdc_chunks_from

    df = spark.createDataFrame(
        list(enumerate(texts_in)), "doc_id long, text string"
    )
    rows = (
        df.withColumn("_b", cdc_boundaries("text"))
        .select("text", cdc_chunks_from("text", "_b").alias("chunks"))
        .collect()
    )
    for r in rows:
        assert "".join(r["chunks"]) == r["text"]


@settings(**_SETTINGS)
@given(
    st.lists(st.integers(0, 40), min_size=1, max_size=40),
    st.lists(st.integers(0, 40), min_size=0, max_size=40),
)
def test_hll_register_merge_is_union(spark, xs, ys):
    """register_table(A) merged with register_table(B) by MAX equals
    register_table(A ∪ B) — for arbitrary overlapping multisets."""
    from pyspark.sql import functions as F

    from hadoop_jobanalyzer_spark.operators.sketches import hll_register_table

    a = spark.createDataFrame([("g", x) for x in xs], "grp string, k long")
    b = spark.createDataFrame([("g", y) for y in ys], "grp string, k long") if ys else None
    both = a if b is None else a.unionAll(b)
    merged = (
        hll_register_table(a, "grp", "k")
        .unionAll(hll_register_table(b, "grp", "k") if b is not None else hll_register_table(a, "grp", "k").limit(0))
        .groupBy("grp", "register")
        .agg(F.max("max_rho").alias("max_rho"))
    )
    full = hll_register_table(both, "grp", "k")
    assert {tuple(r) for r in merged.collect()} == {tuple(r) for r in full.collect()}


# --- space-saving heavy-hitter merge (pure state logic, no Spark) ------------

streams = st.lists(
    st.lists(st.integers(0, 30), min_size=0, max_size=40),
    min_size=1,
    max_size=8,
)


@given(streams, st.integers(1, 12))
@settings(max_examples=200, deadline=None)
def test_space_saving_merge_invariants(batches, capacity):
    """Against exact counts over ANY batch split: mass conservation,
    overcount-only with err as the bound, bounded size, and the
    no-missed-heavy-hitter guarantee."""
    from collections import Counter

    from hadoop_jobanalyzer_spark.streaming.event_stream import space_saving_merge

    table: dict[str, list[int]] = {}
    truth: Counter = Counter()
    for batch in batches:
        counts = Counter(str(x) for x in batch)
        truth.update(counts)
        space_saving_merge(table, dict(counts), capacity)

    total = sum(truth.values())
    assert len(table) <= capacity
    assert sum(est for est, _ in table.values()) == total
    for k, (est, err) in table.items():
        assert est >= truth[k] >= est - err
    for k, c in truth.items():
        if c * capacity > total:
            assert k in table, f"missed heavy hitter {k}"


@given(streams, st.integers(1, 12))
@settings(max_examples=100, deadline=None)
def test_space_saving_merge_batch_split_insensitive_when_exact(batches, capacity):
    """With capacity >= distinct keys the table is exact regardless of
    how the stream was batched."""
    from collections import Counter

    from hadoop_jobanalyzer_spark.streaming.event_stream import space_saving_merge

    truth = Counter(str(x) for b in batches for x in b)
    if len(truth) > capacity:
        return
    table: dict[str, list[int]] = {}
    for batch in batches:
        space_saving_merge(table, dict(Counter(str(x) for x in batch)), capacity)
    assert {k: v[0] for k, v in table.items()} == dict(truth)
    assert all(v[1] == 0 for v in table.values())
