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

The flat shingle array is processed in L2-cache-sized chunks with the
permutation loop INSIDE the chunk loop: each chunk is read from DRAM
once and re-hashed num_perm times while cache-resident.  The naive
order (perm outer, full array inner) streams the whole array through
the memory bus num_perm times — measured on this host's shared bus it
made the sketch kernel bandwidth-bound (1→4-core scaling 0.49); the
chunked order makes it compute-bound.  Results are bit-identical:
row minima never cross chunk boundaries because chunks split on row
offsets.
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
    seeds = [int(s) for s in derive_seeds(num_perm, master_seed)]
    rows = np.flatnonzero(nonempty)
    # chunk on row boundaries so each ~48k-element (384 KB) slice of the
    # flat array stays cache-resident across all num_perm re-hashes
    chunk_elems = 48 * 1024
    ne_counts = counts[nonempty]
    n_seg = offs.shape[0]
    seg_lo = 0
    while seg_lo < n_seg:
        seg_hi = seg_lo + 1
        lo = offs[seg_lo]
        hi = offs[seg_hi] if seg_hi < n_seg else flat.shape[0]
        while seg_hi < n_seg and (offs[seg_hi] - lo) + ne_counts[seg_hi] <= chunk_elems:
            seg_hi += 1
            hi = offs[seg_hi] if seg_hi < n_seg else flat.shape[0]
        sub = flat[lo:hi]
        sub_offs = offs[seg_lo:seg_hi] - lo
        sub_rows = rows[seg_lo:seg_hi]
        for p in range(num_perm):
            hp = splitmix64(sub, seed=seeds[p])
            sig[sub_rows, p] = np.minimum.reduceat(hp, sub_offs)
        seg_lo = seg_hi
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
