"""MinHash estimator + LSH band collision invariants (FIXTURES.md §5,
mirroring the reference's analytical utilities `utils query-fpr` /
`index-density`)."""

import numpy as np

from kmcp_spark.functions.minhash import (
    minhash_signatures,
    minimizer_sketch,
    scaled_sketch,
    syncmer_sketch,
)
from kmcp_spark.functions.stats import band_collision_prob, minhash_estimator_std


def _pair_with_jaccard(rng, n, s):
    """Two hash sets of ~n elements with exact Jaccard ~= s."""
    n_common = int(n * 2 * s / (1 + s))
    n_own = n - n_common
    common = rng.integers(0, 2**63, n_common).astype(np.uint64)
    a = np.unique(np.concatenate([common, rng.integers(0, 2**63, n_own).astype(np.uint64)]))
    b = np.unique(np.concatenate([common, rng.integers(0, 2**63, n_own).astype(np.uint64)]))
    inter = len(np.intersect1d(a, b))
    union = len(np.union1d(a, b))
    return a, b, inter / union


def test_minhash_estimate_within_3_sigma():
    rng = np.random.default_rng(7)
    for target in (0.2, 0.5, 0.8):
        a, b, s = _pair_with_jaccard(rng, 3000, target)
        sig = minhash_signatures([a, b], 256)
        est = float((sig[0] == sig[1]).mean())
        assert abs(est - s) <= 3 * minhash_estimator_std(s, 256) + 0.01


def test_band_collision_rate_matches_formula():
    rng = np.random.default_rng(11)
    r_rows, n_bands, num_perm = 4, 16, 64
    trials, hits, s_sum = 60, 0, 0.0
    for t in range(trials):
        a, b, s = _pair_with_jaccard(rng, 800, 0.5)
        sig = minhash_signatures([a, b], num_perm, master_seed=t)
        s_sum += s
        for band in range(n_bands):
            sl = slice(band * r_rows, (band + 1) * r_rows)
            if (sig[0, sl] == sig[1, sl]).all():
                hits += 1
                break
    expected = band_collision_prob(s_sum / trials, r_rows, n_bands)
    emp = hits / trials
    assert abs(emp - expected) < 0.15


def test_scaled_sketch_expected_fraction():
    rng = np.random.default_rng(3)
    h = rng.integers(0, 2**64, 200_000, dtype=np.uint64)
    kept = scaled_sketch(h, 100)
    assert abs(len(kept) / len(h) - 0.01) < 0.002
    # mergeable: scale(A ∪ B) == scale(A) ∪ scale(B)
    a, b = h[:100_000], h[100_000:]
    merged = np.union1d(scaled_sketch(a, 100), scaled_sketch(b, 100))
    assert (np.sort(kept) == np.sort(merged)).all()


def test_minimizer_density():
    rng = np.random.default_rng(5)
    h = rng.integers(0, 2**64, 50_000, dtype=np.uint64)  # positional, unsorted
    w = 10
    m = minimizer_sketch(h, w)
    density = len(m) / len(h)
    # classical expected density of distinct minimizers ~ 2/(w+1)
    assert abs(density - 2 / (w + 1)) < 0.05


def test_syncmer_fraction():
    rng = np.random.default_rng(9)
    h = rng.integers(0, 2**64, 50_000, dtype=np.uint64)
    s_window = 5
    kept = syncmer_sketch(h, s_window)
    frac = len(kept) / len(h)
    assert abs(frac - 2 / s_window) < 0.02


def test_empty_sets_sentinel():
    sig = minhash_signatures([np.empty(0, dtype=np.uint64)], 16)
    assert (sig == np.iinfo(np.uint64).max).all()
