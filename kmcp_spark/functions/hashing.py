"""Deterministic 64-bit hashing, vectorized over numpy uint64 arrays.

Role parity with the reference (SURVEY.md §2.8): kmcp hashes k-mers with
ntHash and finalizes/derives hash values with a Thomas-Wang-style 64-bit
mixer (`kmcp/cmd/util-hash.go:144-155`) and multi-hash splitting
``a + b*i`` (`kmcp/cmd/index.go:1109-1111`).  We use the public-domain
splitmix64 finalizer (Steele, Lea & Flood, "Fast splittable pseudorandom
number generators", OOPSLA 2014) — same role, different (public) math.

All functions are pure, seed-parameterized, and wraparound-safe on
numpy uint64 (we silence numpy overflow warnings locally; modular 2^64
arithmetic is the point).
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64
# splitmix64 constants (public domain reference implementation).
_SM_GAMMA = _U64(0x9E3779B97F4A7C15)
_SM_M1 = _U64(0xBF58476D1CE4E5B9)
_SM_M2 = _U64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray | int, seed: int = 0) -> np.ndarray:
    """Vectorized splitmix64 finalizer: uint64 array -> uint64 array.

    ``seed`` derives an independent hash function (the analog of kmcp's
    ``a + b*i`` multi-hash derivation, `kmcp/cmd/index.go:1109-1111`).
    """
    z = np.asarray(x, dtype=_U64)
    with np.errstate(over="ignore"):
        z = (z + _U64(seed) * _SM_GAMMA + _SM_GAMMA)
        z = (z ^ (z >> _U64(30))) * _SM_M1
        z = (z ^ (z >> _U64(27))) * _SM_M2
        z = z ^ (z >> _U64(31))
    return z


def derive_seeds(num: int, master_seed: int = 42) -> np.ndarray:
    """``num`` independent uint64 seeds from one master seed (deterministic)."""
    return splitmix64(np.arange(num, dtype=_U64), seed=master_seed)


def hash_bytes_rolling(buf: np.ndarray, k: int, base: int = 1099511628211) -> np.ndarray:
    """Polynomial rolling hash of every length-``k`` window of ``buf``.

    ``buf`` is a uint8/uint64 array of symbols; returns a uint64 array of
    length ``len(buf) - k + 1`` where out[i] = poly-hash(buf[i:i+k]),
    finalized with splitmix64.  This is the role-equivalent of kmcp's
    ntHash rolling k-mer hash (`kmcp/cmd/compute.go:752` via
    shenwei356/bio/sketches): a streaming window hash over a symbol
    sequence.  Implementation is k vectorized passes (k is small).
    """
    arr = np.asarray(buf, dtype=_U64)
    n = arr.shape[0] - k + 1
    if n <= 0:
        return np.empty(0, dtype=_U64)
    b = _U64(base)
    h = np.zeros(n, dtype=_U64)
    with np.errstate(over="ignore"):
        for j in range(k):
            h = h * b + arr[j : j + n]
    return splitmix64(h)
