"""Hypothesis property tests: shrinking random counterexamples for the
kernel equivalences (fast paths == scalar oracle == metric axioms)."""

from hypothesis import given, settings, strategies as st

from triple_accel_ray.kernels import (
    LEVENSHTEIN_COSTS,
    RDAMERAU_COSTS,
    SEARCH_ALL,
    SEARCH_BEST,
)
from triple_accel_ray.kernels.batch import levenshtein_k_batch
from triple_accel_ray.kernels.myers import myers_distance
from triple_accel_ray.kernels.scalar import (
    hamming_dist,
    levenshtein_k_with_opts,
    levenshtein_search_with_opts,
    levenshtein_with_opts,
)
from triple_accel_ray.kernels.search_fast import levenshtein_search_myers

bytestr = st.binary(max_size=40)
small_k = st.integers(min_value=0, max_value=12)


@settings(max_examples=200, deadline=None)
@given(a=bytestr, b=bytestr)
def test_myers_equals_full_dp(a, b):
    assert myers_distance(a, b) == levenshtein_with_opts(a, b)[0]


@settings(max_examples=200, deadline=None)
@given(a=bytestr, b=bytestr, k=small_k)
def test_banded_boundary_equals_full_dp(a, b, k):
    d = levenshtein_with_opts(a, b)[0]
    res = levenshtein_k_with_opts(a, b, k)
    if d <= k:
        assert res is not None and res[0] == d
    else:
        assert res is None


@settings(max_examples=100, deadline=None)
@given(a=bytestr, b=bytestr, k=small_k)
def test_batch_kernel_equals_scalar(a, b, k):
    got = levenshtein_k_batch([a], [b], k)[0]
    want = levenshtein_k_with_opts(a, b, k)
    assert got == (-1 if want is None else want[0])


@settings(max_examples=150, deadline=None)
@given(
    needle=st.binary(min_size=1, max_size=8),
    hay=st.binary(max_size=30),
    k=st.integers(min_value=0, max_value=4),
    mode=st.sampled_from([SEARCH_ALL, SEARCH_BEST]),
)
def test_search_fast_equals_scalar(needle, hay, k, mode):
    want = levenshtein_search_with_opts(needle, hay, k, mode)
    got = levenshtein_search_myers(needle, hay, k, mode)
    assert got == want


@settings(max_examples=150, deadline=None)
@given(a=bytestr, b=bytestr)
def test_metric_axioms(a, b):
    d = levenshtein_with_opts(a, b)[0]
    assert d == levenshtein_with_opts(b, a)[0]  # symmetry
    assert (d == 0) == (a == b)  # identity
    assert d <= max(len(a), len(b))  # upper bound
    if len(a) == len(b):
        assert d <= hamming_dist(a, b)  # hamming dominates


@settings(max_examples=100, deadline=None)
@given(a=bytestr, b=bytestr)
def test_rdamerau_le_levenshtein(a, b):
    lev = levenshtein_with_opts(a, b, False, LEVENSHTEIN_COSTS)[0]
    rdam = levenshtein_with_opts(a, b, False, RDAMERAU_COSTS)[0]
    assert rdam <= lev
