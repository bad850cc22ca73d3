"""Property-based tests for the corpus-analytics algorithms (q194/q196/
q201/q202 and util.bucketed_global_rank).

The algorithms live in the SQL/plan layer, so the cheap way to
property-test them is through the DuckDB oracle text on tiny random
relations (the oracle==Spark equality is already pinned by the
differential suite; these tests pin the ALGORITHM itself against
independent pure-Python references). Spark appears only in the skewed
bucket-rank test, with a handful of deterministic shapes."""

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


# --- largest-remainder apportionment (q196's formula) -------------------------


def _hamilton_ref(budget: int, weights: list[int]) -> list[int]:
    """Independent pure-Python largest-remainder apportionment; ties on
    remainder broken by index ascending (matches source-name asc)."""
    total = sum(weights)
    base = [budget * w // total for w in weights]
    rem = [(budget * w) % total for w in weights]
    leftover = budget - sum(base)
    order = sorted(range(len(weights)), key=lambda i: (-rem[i], i))
    out = list(base)
    for i in order[:leftover]:
        out[i] += 1
    return out


@given(
    budget=st.integers(min_value=1, max_value=10_000),
    weights=st.lists(st.integers(min_value=1, max_value=10**9), min_size=1, max_size=20),
)
@settings(max_examples=200, deadline=None)
def test_hamilton_sql_matches_reference(budget, weights):
    con = duckdb.connect()
    rows = ", ".join(f"({i}, {w}::BIGINT)" for i, w in enumerate(weights))
    got = con.execute(
        f"""
WITH per_src(source, n_tokens) AS (VALUES {rows}),
calc AS (
  SELECT source, n_tokens,
         ({budget} * n_tokens) // SUM(n_tokens) OVER () AS base_alloc,
         ({budget} * n_tokens) % SUM(n_tokens) OVER () AS rem
  FROM per_src
),
ranked AS (
  SELECT *, {budget} - SUM(base_alloc) OVER () AS leftover,
         ROW_NUMBER() OVER (ORDER BY rem DESC, source ASC) AS rk
  FROM calc
)
SELECT source, base_alloc + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
FROM ranked ORDER BY source
"""
    ).fetchall()
    con.close()
    alloc = [int(a) for _, a in got]
    assert alloc == _hamilton_ref(budget, weights)
    assert sum(alloc) == budget
    # quota condition: every allocation within 1 of its exact share
    total = sum(weights)
    for w, a in zip(weights, alloc):
        assert budget * w / total - 1 < a < budget * w / total + 1


# --- total-variation distance (q194's split-sum identity) ---------------------


def _tv_ref(ca: dict, cb: dict) -> tuple[int, int, int]:
    """(tv_num, n_a, n_b) by the direct full-outer definition."""
    n_a, n_b = sum(ca.values()), sum(cb.values())
    toks = set(ca) | set(cb)
    num = sum(abs(ca.get(t, 0) * n_b - cb.get(t, 0) * n_a) for t in toks)
    return num, n_a, n_b


@given(
    ca=st.dictionaries(
        st.text(alphabet="abcdef", min_size=1, max_size=3),
        st.integers(min_value=1, max_value=50),
        min_size=1,
        max_size=12,
    ),
    cb=st.dictionaries(
        st.text(alphabet="abcdef", min_size=1, max_size=3),
        st.integers(min_value=1, max_value=50),
        min_size=1,
        max_size=12,
    ),
)
@settings(max_examples=200, deadline=None)
def test_tv_split_identity(ca, cb):
    """q194 computes TV from the inner join plus two exclusive-mass
    correction terms; that must equal the direct full-outer definition,
    and 0 <= TV <= 1 with equality-0 iff the distributions match."""
    num, n_a, n_b = _tv_ref(ca, cb)
    common = set(ca) & set(cb)
    common_num = sum(abs(ca[t] * n_b - cb[t] * n_a) for t in common)
    s_a = sum(ca[t] for t in common)
    s_b = sum(cb[t] for t in common)
    split = common_num + (n_a - s_a) * n_b + (n_b - s_b) * n_a
    assert split == num
    tv = num / (2.0 * n_a * n_b)
    assert 0.0 <= tv <= 1.0
    same_dist = all(ca.get(t, 0) * n_b == cb.get(t, 0) * n_a for t in set(ca) | set(cb))
    assert (tv == 0.0) == same_dist


# --- pairing checksums (q201's fold order-sensitivity) -------------------------


@given(
    perm=st.permutations(list(range(8))),
)
@settings(max_examples=100, deadline=None)
def test_pairing_folds_detect_nonidentity(perm):
    """For distinct doc_ids 0..7, sum(rk*id) is maximized ONLY by the
    rank-sorted pairing (rearrangement inequality), so any non-identity
    permutation moves the sum fold."""
    ids = list(range(8))
    identity = sum((i + 1) * d for i, d in enumerate(ids))
    folded = sum((i + 1) * d for i, d in enumerate(perm))
    if list(perm) != ids:
        assert folded < identity  # strict: ids are distinct
    else:
        assert folded == identity


# --- bucketed_global_rank under skew -------------------------------------------


@pytest.mark.parametrize(
    "bucket_of",
    [
        lambda i: 0,  # all rows one bucket (degenerate: one window)
        lambda i: i,  # every row its own bucket (offsets do all the work)
        lambda i: 0 if i < 90 else i,  # one giant bucket + singletons
        lambda i: i % 3,  # interleaved buckets
    ],
)
def test_bucketed_global_rank_skew_shapes(spark, bucket_of):
    from pyspark.sql import functions as F

    from hadoop_jobanalyzer_spark.util import bucketed_global_rank

    rows = [(i, bucket_of(i), (i * 37) % 100) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, bkt long, sub long")
    ranked = {
        r["id"]: r["rk"]
        for r in bucketed_global_rank(
            df, F.col("bkt"), [F.col("sub").asc(), F.col("id").asc()]
        ).collect()
    }
    want = {
        row[0]: i + 1
        for i, row in enumerate(sorted(rows, key=lambda r: (r[1], r[2], r[0])))
    }
    assert ranked == want
