"""Sketch family: MinHash signatures, FracMinHash (scaled), minimizer,
closed syncmer — all vectorized over whole Arrow batches.

Role parity with kmcp's sketch iterators (SURVEY.md §2.8 X1–X4):
  - scaled sketch  = FracMinHash ``keep hash iff h <= 2^64/scale``
    (`kmcp/cmd/compute.go:316`, `:769-771`; Irber et al. 2022).
  - minimizer      = window-w argmin (`kmcp/cmd/compute.go:750`;
    Roberts et al. 2004).
  - closed syncmer = keep k-mer iff min s-mer sits at a window edge
    (`kmcp/cmd/compute.go:748`; Edgar 2021).
  - num_perm MinHash signature = classic Broder MinHash used for the
    LSH index that replaces kmcp's COBS bit-sliced Bloom matrix.

MinHash signatures are computed for an entire batch at once:
hash all shingles of all rows under each of ``num_perm`` derived hash
functions, then segment-min with ``np.minimum.reduceat`` over row
offsets — zero per-row Python in the O(num_perm × total_shingles) loop.
"""

from __future__ import annotations

import numpy as np

from kmcp_spark.functions.hashing import derive_seeds, splitmix64

_U64 = np.uint64
_MAX_U64 = np.iinfo(np.uint64).max


def minhash_signatures(
    shingle_sets: list[np.ndarray], num_perm: int, master_seed: int = 42
) -> np.ndarray:
    """(n_rows, num_perm) uint64 MinHash signature matrix.

    Empty shingle sets get an all-max sentinel signature (never collides
    with a real minimum except vs another empty set).
    """
    n_rows = len(shingle_sets)
    sig = np.full((n_rows, num_perm), _MAX_U64, dtype=_U64)
    if n_rows == 0:
        return sig
    counts = np.fromiter((len(s) for s in shingle_sets), dtype=np.int64, count=n_rows)
    nonempty = counts > 0
    if not nonempty.any():
        return sig
    flat = np.concatenate([s for s in shingle_sets if len(s)]).astype(_U64)
    offs = np.concatenate(([0], np.cumsum(counts[nonempty])))[:-1]
    seeds = derive_seeds(num_perm, master_seed)
    rows = np.flatnonzero(nonempty)
    for p in range(num_perm):
        hp = splitmix64(flat, seed=int(seeds[p]))
        sig[rows, p] = np.minimum.reduceat(hp, offs)
    return sig


def scaled_sketch(hashes: np.ndarray, scale: int) -> np.ndarray:
    """FracMinHash: keep hash values <= 2^64 / scale.

    Mirrors kmcp's ``maxHash = uint64(float64(^uint64(0)) / scale)``
    (`kmcp/cmd/compute.go:316`): a deterministic, mergeable down-sample
    whose expected size is |set| / scale.
    """
    if scale <= 1:
        return np.asarray(hashes, dtype=_U64)
    max_hash = _U64(_MAX_U64 // np.uint64(scale))
    h = np.asarray(hashes, dtype=_U64)
    return h[h <= max_hash]


def minimizer_sketch(hashes: np.ndarray, w: int) -> np.ndarray:
    """Window-w minimizers of a *positional* hash sequence (not a set).

    ``hashes`` must be in sequence order (distinct=False shingling).
    Returns the sorted distinct minimizer hash values: for each window of
    ``w`` consecutive k-mer hashes, the minimum is selected
    (`kmcp/cmd/compute.go:750`, Roberts et al. 2004).  Vectorized with a
    sliding-window view.
    """
    h = np.asarray(hashes, dtype=_U64)
    if h.shape[0] == 0:
        return h
    if h.shape[0] <= w:
        return np.unique(h.min(keepdims=True))
    win = np.lib.stride_tricks.sliding_window_view(h, w)
    return np.unique(win.min(axis=1))


def syncmer_sketch(hashes: np.ndarray, s_window: int) -> np.ndarray:
    """Closed-syncmer selection over a positional hash sequence.

    A k-mer is kept iff the minimum of its ``s_window`` constituent
    sub-hashes is at the first or last position of the window
    (`kmcp/cmd/compute.go:748`; Edgar 2021, "closed syncmers").  We model
    the s-mer decomposition by re-hashing positions: sub-hash j of k-mer
    i is splitmix64(h[i] xor j), giving the same selection statistics
    (fraction kept ≈ 2/s_window) with pure vector math.
    """
    h = np.asarray(hashes, dtype=_U64)
    n = h.shape[0]
    if n == 0 or s_window <= 1:
        return np.unique(h)
    sub = np.empty((n, s_window), dtype=_U64)
    for j in range(s_window):
        sub[:, j] = splitmix64(h ^ _U64(j + 1), seed=7)
    amin = sub.argmin(axis=1)
    keep = (amin == 0) | (amin == s_window - 1)
    return np.unique(h[keep])
