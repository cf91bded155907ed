import numpy as np

from kmcp_spark.functions.simhash import hamming64, simhash64


def test_identical_sets_zero_distance():
    rng = np.random.default_rng(1)
    a = rng.integers(0, 2**64, 500, dtype=np.uint64)
    fp = simhash64([a, a.copy()])
    assert hamming64(fp[:1], fp[1:2])[0] == 0


def test_disjoint_sets_near_half_bits():
    rng = np.random.default_rng(2)
    a = rng.integers(0, 2**64, 2000, dtype=np.uint64)
    b = rng.integers(0, 2**64, 2000, dtype=np.uint64)
    fp = simhash64([a, b])
    d = hamming64(fp[:1], fp[1:2])[0]
    assert 20 <= d <= 44  # ~Binomial(64, 1/2)


def test_similarity_monotonic():
    rng = np.random.default_rng(3)
    base = rng.integers(0, 2**64, 1000, dtype=np.uint64)
    dists = []
    for frac in (0.9, 0.5, 0.1):
        n_keep = int(1000 * frac)
        other = np.concatenate(
            [base[:n_keep], rng.integers(0, 2**64, 1000 - n_keep, dtype=np.uint64)]
        )
        fp = simhash64([base, other])
        dists.append(int(hamming64(fp[:1], fp[1:2])[0]))
    assert dists[0] < dists[1] < dists[2]


def test_empty_set_zero_fingerprint():
    fp = simhash64([np.empty(0, dtype=np.uint64)])
    assert fp[0] == 0
