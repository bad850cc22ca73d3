"""Pure-Python property tests for the planner queries' math claims —
no Spark session, so these pin the algebra at hypothesis speed.

- q228's rational score is RANK-EQUIVALENT to the smoothed log-odds it
  replaces (the no-libm claim).
- q227's two hop-aligned window starts are exactly the windows covering
  the event (the in-row explode replaces a range join losslessly).
- q217's streaming bin-pack rule yields contiguous, byte-conserving
  groups whose ids never decrease.
"""

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from hadoop_jobanalyzer_spark.plans.planner_queries import (
    _Q227_HOP_MS,
    _Q227_WIN_MS,
)


def _log_odds(c, ct, nl, n, v):
    """The textbook smoothed log-odds of a token for a class."""
    c_rest = ct - c
    n_rest = n - nl
    return math.log((c + 1) / (nl + v)) - math.log((c_rest + 1) / (n_rest + v))


def _rational(c, ct, nl, n, v):
    """q228's integer cross-product form, as (num, den)."""
    return (c + 1) * (n - nl + v), (ct - c + 1) * (nl + v)


@given(
    st.data(),
    st.integers(min_value=2, max_value=10_000),  # vocab size v
)
@settings(max_examples=200, deadline=None)
def test_rational_score_is_rank_equivalent_to_log_odds(data, v):
    """For any two tokens of one class, comparing num_a*den_b vs
    num_b*den_a orders identically to the log-odds difference."""
    nl = data.draw(st.integers(min_value=1, max_value=10**6))
    n = nl + data.draw(st.integers(min_value=1, max_value=10**6))

    def token(_):
        c = data.draw(st.integers(min_value=0, max_value=nl))
        ct = c + data.draw(st.integers(min_value=0, max_value=n - nl))
        return c, ct

    (ca, cta), (cb, ctb) = token(0), token(1)
    la = _log_odds(ca, cta, nl, n, v)
    lb = _log_odds(cb, ctb, nl, n, v)
    num_a, den_a = _rational(ca, cta, nl, n, v)
    num_b, den_b = _rational(cb, ctb, nl, n, v)
    # integer cross-comparison (exact) vs float log difference: agree
    # whenever the logs are not within float noise of equal
    if abs(la - lb) > 1e-9:
        assert (num_a * den_b > num_b * den_a) == (la > lb)
    else:
        assert num_a * den_b == num_b * den_a or abs(la - lb) <= 1e-9


@given(st.integers(min_value=0, max_value=2**52))
@settings(max_examples=500, deadline=None)
def test_hopping_explode_is_exactly_the_covering_windows(t_ms):
    """The q227 expression (floor(t/hop) - i) * hop for i in {0, 1}
    produces precisely the hop-aligned windows with w <= t < w + win."""
    hop, win = _Q227_HOP_MS, _Q227_WIN_MS
    produced = {(t_ms // hop - i) * hop for i in (0, 1)}
    covering = {
        w
        for w in range((t_ms // hop - 3) * hop, t_ms + hop, hop)
        if w <= t_ms < w + win
    }
    assert produced == covering


@given(
    st.lists(st.integers(min_value=1, max_value=5_000), min_size=1, max_size=60),
    st.integers(min_value=100, max_value=10_000),
)
@settings(max_examples=200, deadline=None)
def test_bin_pack_rule_groups_are_contiguous_and_conserve(sizes, target):
    """q217's rule grp = floor(cum_before / target): group ids are
    non-decreasing, skip at most when a file exceeds the target, and the
    per-group byte sums partition the total."""
    cum = 0
    grps = []
    for b in sizes:
        grps.append(cum // target)
        cum += b
    assert grps == sorted(grps)
    # conservation
    per_group: dict[int, int] = {}
    for g, b in zip(grps, sizes):
        per_group[g] = per_group.get(g, 0) + b
    assert sum(per_group.values()) == sum(sizes)
    # every group except possibly the last stays under target + max file
    mx = max(sizes)
    for g, total in per_group.items():
        assert total <= target + mx
