"""Analytical statistics gating candidate thresholds.

Re-derivations (from the published formulas, not the reference code) of:
  - Bloom signature sizing, ``m = ceil(-h / ln(1 - fpr^(1/h)) * n)``
    (COBS, Bingmann et al. 2019; role of `kmcp/cmd/util-hash.go:46-50`).
  - per-chunk actual FPR ``(1 - (1 - 1/m)^(h*n))^h``
    (role of `kmcp/cmd/util-hash.go:55-57`).
  - query FPR: binomial upper tail P[X >= t*n] with X~Binom(n, p)
    (Solomon & Kingsford 2016, Thm 2; role of
    `kmcp/cmd/util-fpr.go:32-50`) plus the Chernoff bound variant
    (role of `kmcp/cmd/util-fpr.go:275-281`).
  - qCov→similarity cubic model (`kmcp/cmd/cov2simi.go:55` publishes the
    fitted coefficients in its --help text; they are data, not code).
  - MinHash-LSH band collision probability 1 - (1 - s^r)^b
    (Leskovec/Rajaraman/Ullman, "Mining of Massive Datasets" ch.3).

No scipy in this environment: the binomial tail uses log-space exact
summation via lgamma (math.lgamma), vectorized with numpy where needed.
"""

from __future__ import annotations

import math

import numpy as np


def calc_signature_size(num_elements: int, num_hashes: int, fpr: float) -> int:
    """Bloom filter size m for n elements, h hash functions, target fpr."""
    if num_elements <= 0:
        return 64
    h = float(num_hashes)
    m = math.ceil(-h / math.log(1.0 - fpr ** (1.0 / h)) * num_elements)
    return max(int(m), 64)


def calc_fpr(num_elements: int, num_hashes: int, signature_size: int) -> float:
    """Actual false-positive rate of a Bloom filter of size m."""
    if signature_size <= 0:
        return 1.0
    h, n, m = float(num_hashes), float(num_elements), float(signature_size)
    return (1.0 - (1.0 - 1.0 / m) ** (h * n)) ** h


def _log_binom_pmf(k: int, n: int, p: float) -> float:
    if p <= 0.0:
        return 0.0 if k == 0 else -math.inf
    if p >= 1.0:
        return 0.0 if k == n else -math.inf
    return (
        math.lgamma(n + 1)
        - math.lgamma(k + 1)
        - math.lgamma(n - k + 1)
        + k * math.log(p)
        + (n - k) * math.log1p(-p)
    )

def query_fpr(num_kmers: int, threshold: int, fpr: float) -> float:
    """P[#false-positive k-mer hits >= threshold] for a query of n k-mers.

    Exact binomial upper tail (Solomon & Kingsford 2016 Thm 2): the
    probability a *non-matching* target reaches ``threshold`` of the
    query's ``num_kmers`` k-mers purely by Bloom false positives at
    per-probe rate ``fpr``.  Summed in log space for stability.
    """
    n, t = int(num_kmers), int(threshold)
    if t <= 0:
        return 1.0
    if t > n:
        return 0.0
    logs = [_log_binom_pmf(k, n, fpr) for k in range(t, n + 1)]
    mx = max(logs)
    if mx == -math.inf:
        return 0.0
    return float(math.exp(mx) * sum(math.exp(v - mx) for v in logs))


def query_fpr_chernoff(num_kmers: int, threshold: int, fpr: float) -> float:
    """Chernoff upper bound on the same tail: exp(-n*KL(t/n || p)).

    Cheaper than the exact tail; used to short-circuit obviously-safe
    thresholds (role of `kmcp/cmd/util-fpr.go:275-281`).
    """
    n = int(num_kmers)
    if n == 0:
        return 1.0
    a = threshold / n
    p = fpr
    if a <= p:
        return 1.0
    if a >= 1.0:
        a = 1.0 - 1e-12
    kl = a * math.log(a / p) + (1 - a) * math.log((1 - a) / (1 - p))
    return float(math.exp(-n * kl))


def cov2simi(qcov: "float | np.ndarray") -> "float | np.ndarray":
    """k-mer coverage -> sequence-similarity %, cubic model.

    Coefficients as published in the reference CLI's help/docs
    (`kmcp/cmd/cov2simi.go:55`, `kmcp/cmd/profile.go:3184-3187`):
    s = 87.456 + 26.410·q − 22.008·q² + 7.325·q³, clamped to [0, 100].
    """
    q = np.asarray(qcov, dtype=np.float64)
    s = 87.456 + 26.410 * q - 22.008 * q * q + 7.325 * q * q * q
    s = np.clip(s, 0.0, 100.0)
    return float(s) if np.isscalar(qcov) or s.ndim == 0 else s


def band_collision_prob(s: float, r: int, b: int) -> float:
    """P[>=1 LSH band collision] for true Jaccard s, r rows/band, b bands."""
    return 1.0 - (1.0 - s**r) ** b


def minhash_estimator_std(s: float, num_perm: int) -> float:
    """Std-dev of the MinHash Jaccard estimate: sqrt(s(1-s)/num_perm)."""
    return math.sqrt(max(s * (1.0 - s), 0.0) / num_perm)
