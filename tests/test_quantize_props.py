"""Property-based invariants for the quantization / similarity-adjacent
operators (q90/q91/q95/q94): the guarantees the docstrings claim, checked
over randomized inputs rather than fixed examples."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hadoop_jobanalyzer_spark.operators.quantize import (
    ERR_FIXED,
    kmeans_step,
    sq8_error_histogram,
)

_DIM = 4

vectors = st.lists(
    st.lists(
        st.floats(min_value=-1.0, max_value=1.0, allow_nan=False, width=32),
        min_size=_DIM,
        max_size=_DIM,
    ),
    min_size=3,
    max_size=12,
)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(vectors)
def test_sq8_error_bounded_by_half_step(spark, vecs):
    """int8 scalar quantization can never err more than half a bin per
    element: with per-dim ranges at most 2 (values in [-1, 1]), the
    per-element bound is (2/512) * ERR_FIXED, so the per-vector total is
    < n_dims * (2 * ERR_FIXED / 512 + 1) (+1/dim for the floor)."""
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    out = sq8_error_histogram(df, "vec_id", "embedding", bucket_width=1).collect()
    assert sum(r["n_vecs"] for r in out) == len(vecs)
    # bucket_width=1 -> err_bucket IS the per-vector total
    bound = _DIM * (2 * ERR_FIXED // 512 + 1)
    assert all(r["err_bucket"] <= bound for r in out)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(vectors)
def test_kmeans_step_invariants(spark, vecs):
    """One Lloyd step over random vectors: every vector lands in some
    cell, cells partition the corpus, per-cell counts sum to N, and each
    seed vector is assigned to itself (distance 0 beats everything, with
    low-cid tie-break <= its own id... its own cell id exactly, since
    d(v_i, c_i) = 0 and ties break toward the lowest centroid id among
    zero-distance centroids, which is the first identical seed)."""
    k = min(3, len(vecs))
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    rows = kmeans_step(df, "vec_id", "embedding", k=k).collect()
    assert sum(r["n_assigned"] for r in rows) == len(vecs)
    assert all(r["l1_move_num"] >= 0 for r in rows)
    assert {r["cell"] for r in rows} <= set(range(k))


def test_kmeans_matches_python_argmin(spark):
    """The distributed assignment equals a literal python argmin over the
    same fixed-point quantization (exact integers — no tolerance)."""
    import numpy as np

    rng = [[((i * 7 + j * 3) % 11 - 5) / 7.0 for j in range(_DIM)] for i in range(10)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(rng)], "vec_id long, embedding array<float>"
    )
    k = 3
    q = [[round(float(np.float32(x)) * 1000) for x in v] for v in rng]

    def assign(v):
        dists = [
            (sum((a - b) ** 2 for a, b in zip(v, q[c])), c) for c in range(k)
        ]
        return min(dists)[1]

    want = {}
    for i, v in enumerate(q):
        want.setdefault(assign(v), []).append(i)
    got = {r["cell"]: r["n_assigned"] for r in
           kmeans_step(df, "vec_id", "embedding", k=k).collect()}
    assert got == {c: len(ids) for c, ids in want.items()}


def test_tfidf_cosine_never_exceeds_one(spark):
    from hadoop_jobanalyzer_spark.operators.retrieval import tfidf_cosine_pairs

    docs = [
        (1, "a b c d"), (2, "a b c d"), (3, "a b x y"),
        (4, "p q r"), (5, "p q r s t"), (6, "zz"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = tfidf_cosine_pairs(df, "doc_id", "text", threshold=0.0).collect()
    assert rows, "share-a-term pairs must exist"
    for r in rows:
        assert 0.0 <= r["cos_sim"] <= 1.0
        assert r["id_a"] < r["id_b"]
    exact = {(r["id_a"], r["id_b"]): r["cos_sim"] for r in rows}
    assert exact[(1, 2)] == 1.0  # identical docs


def test_duplicated_spans_full_copy_is_fully_duplicated(spark):
    """Duplicating an entire document marks 100% of both copies' spans."""
    from hadoop_jobanalyzer_spark.operators.dedup import duplicated_span_fraction

    text = " ".join(f"w{i}" for i in range(10))
    other = " ".join(f"u{i}" for i in range(10))
    df = spark.createDataFrame(
        [(1, text), (2, text), (3, other)], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in
            duplicated_span_fraction(df, "doc_id", "text", span=4).collect()}
    assert rows[1]["dup_frac"] == 1.0 and rows[2]["dup_frac"] == 1.0
    assert rows[3]["dup_frac"] == 0.0


def test_sq8_exact_for_extreme_magnitudes(spark):
    """The histogram arithmetic never leaves 64-bit integer space (integral
    div, not a float floor), so inputs with |x| far beyond 2^34 — where a
    double quotient of (xi-mn)*256/scale would silently misround — still
    bucket exactly.  Oracle: the same integer pipeline in pure Python."""
    from hadoop_jobanalyzer_spark.operators.quantize import Q_GRID

    w = 8192
    vals = [0.0, 2.0**35, 2.0**35 + 1000.0, 2.0**40]
    vecs = [[v] for v in vals]
    got = {
        r["err_bucket"]: (r["n_vecs"], r["sum_err_fixed"])
        for r in sq8_error_histogram(
            spark.createDataFrame(
                [(i, v) for i, v in enumerate(vecs)], ["doc_id", "emb"]
            ),
            "doc_id",
            "emb",
            bucket_width=w,
        ).collect()
    }

    xis = [round(v * Q_GRID) for v in vals]
    mn, mx = min(xis), max(xis)
    scale = mx - mn
    want: dict[int, list[int]] = {}
    for xi in xis:
        code = min(255, ((xi - mn) * 256) // scale)
        err = abs((xi - mn) * 512 - (code * 2 + 1) * scale)
        b = err // w
        want.setdefault(b, [0, 0])
        want[b][0] += 1
        want[b][1] += err
    assert got == {b: tuple(v) for b, v in want.items()}
