"""FPR / sizing math vs hand-computed values (FIXTURES.md §5; the
role of the reference's `utils query-fpr` / `ref-info` invariants)."""

import math

from kmcp_spark.functions.stats import (
    band_collision_prob,
    calc_fpr,
    calc_signature_size,
    cov2simi,
    query_fpr,
    query_fpr_chernoff,
)


def test_signature_size_hand_computed():
    # h=1: m = ceil(-1/ln(1-fpr) * n)
    n, fpr = 1000, 0.3
    expect = math.ceil(-1 / math.log(1 - 0.3) * n)
    assert calc_signature_size(n, 1, fpr) == expect
    # round-trip: the sized filter achieves ~the target fpr
    m = calc_signature_size(n, 1, fpr)
    assert abs(calc_fpr(n, 1, m) - fpr) < 0.01


def test_signature_size_multi_hash_smaller_error():
    m1 = calc_signature_size(10_000, 1, 0.01)
    m3 = calc_signature_size(10_000, 3, 0.01)
    assert m3 < m1  # multiple hashes need fewer bits at low fpr


def test_query_fpr_exact_vs_brute_force():
    # small n: compare against direct binomial sum
    n, p = 20, 0.3
    for t in (1, 5, 10, 20):
        brute = sum(
            math.comb(n, k) * p**k * (1 - p) ** (n - k) for k in range(t, n + 1)
        )
        assert abs(query_fpr(n, t, p) - brute) < 1e-12


def test_query_fpr_edges():
    assert query_fpr(100, 0, 0.3) == 1.0
    assert query_fpr(100, 101, 0.3) == 0.0
    assert query_fpr(100, 1, 0.0) == 0.0


def test_chernoff_upper_bounds_exact():
    for n, t, p in [(100, 60, 0.3), (50, 40, 0.5), (200, 100, 0.2)]:
        assert query_fpr(n, t, p) <= query_fpr_chernoff(n, t, p) + 1e-15


def test_cov2simi_published_coefficients():
    # q=1 -> 87.456 + 26.410 - 22.008 + 7.325 = 99.183
    assert abs(cov2simi(1.0) - 99.183) < 1e-9
    assert abs(cov2simi(0.0) - 87.456) < 1e-9
    assert cov2simi(-5.0) == 0.0 or cov2simi(-5.0) >= 0.0  # clamped


def test_band_collision_prob_shape():
    assert band_collision_prob(1.0, 4, 32) == 1.0
    assert band_collision_prob(0.0, 4, 32) == 0.0
    assert band_collision_prob(0.8, 4, 32) > band_collision_prob(0.5, 4, 32)
