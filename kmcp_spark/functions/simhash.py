"""64-bit SimHash over hashed shingle sets, batch-vectorized.

SimHash (Charikar 2002, "Similarity estimation techniques from rounding
algorithms") complements MinHash in the verification stage: small
Hamming distance between fingerprints ≈ high cosine similarity of the
shingle multisets.  kmcp has no SimHash (its Bloom index plays the
candidate-generation role); the north rule adds it as a second,
independent signature family.
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64


def simhash64(shingle_sets: list[np.ndarray]) -> np.ndarray:
    """One uint64 fingerprint per row.

    Bit b of the fingerprint is 1 iff more shingle hashes have bit b set
    than clear.  Computed for the whole batch at once: unpack all shingle
    hashes to a bit matrix, segment-sum with ``np.add.reduceat``.
    """
    n_rows = len(shingle_sets)
    out = np.zeros(n_rows, dtype=_U64)
    counts = np.fromiter((len(s) for s in shingle_sets), dtype=np.int64, count=n_rows)
    nonempty = counts > 0
    if not nonempty.any():
        return out
    flat = np.concatenate([s for s in shingle_sets if len(s)]).astype(_U64)
    # bits: (total_shingles, 64) with column c = bit c of the uint64
    # (little-endian byte order + little bitorder keeps c consistent).
    flat_le = flat.astype("<u8")
    bits = np.unpackbits(flat_le.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
    offs = np.concatenate(([0], np.cumsum(counts[nonempty])))[:-1]
    sums = np.add.reduceat(bits.astype(np.int64), offs, axis=0)  # (n_nonempty, 64)
    half = counts[nonempty][:, None] / 2.0
    fp_bits = (sums > half).astype(np.uint8)
    packed = np.packbits(fp_bits, axis=1, bitorder="little")  # (n, 8) bytes
    vals = packed.copy().view("<u8").ravel().astype(_U64)
    out[np.flatnonzero(nonempty)] = vals
    return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized Hamming distance between uint64 fingerprint arrays."""
    x = np.asarray(a, dtype=_U64) ^ np.asarray(b, dtype=_U64)
    return np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)
