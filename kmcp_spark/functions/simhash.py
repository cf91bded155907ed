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
    offs = np.concatenate(([0], np.cumsum(counts[nonempty])))[:-1]
    ne_counts = counts[nonempty]
    ne_rows = np.flatnonzero(nonempty)
    # process in row-aligned chunks so the (chunk, 64) uint8 bit matrix
    # stays cache-resident (the old whole-batch int64 matrix was 64+512
    # bytes of DRAM traffic per shingle); uint16 segment sums are exact
    # for sets < 65536 shingles, with an int64 fallback for larger rows
    chunk_elems = 32 * 1024
    n_seg = offs.shape[0]
    seg_lo = 0
    while seg_lo < n_seg:
        seg_hi = seg_lo + 1
        lo = offs[seg_lo]
        while seg_hi < n_seg and (offs[seg_hi] - lo) + ne_counts[seg_hi] <= chunk_elems:
            seg_hi += 1
        hi = offs[seg_hi] if seg_hi < n_seg else flat.shape[0]
        # bits: (chunk_shingles, 64) with column c = bit c of the uint64
        # (little-endian byte order + little bitorder keeps c consistent)
        sub_le = flat[lo:hi].astype("<u8")
        bits = np.unpackbits(sub_le.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
        sub_offs = offs[seg_lo:seg_hi] - lo
        sum_dtype = np.uint16 if int(ne_counts[seg_lo:seg_hi].max()) < 65536 else np.int64
        sums = np.add.reduceat(bits.astype(sum_dtype), sub_offs, axis=0)
        half = ne_counts[seg_lo:seg_hi, None] / 2.0
        fp_bits = (sums > half).astype(np.uint8)
        packed = np.packbits(fp_bits, axis=1, bitorder="little")  # (n, 8) bytes
        out[ne_rows[seg_lo:seg_hi]] = packed.copy().view("<u8").ravel().astype(_U64)
        seg_lo = seg_hi
    return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized Hamming distance between uint64 fingerprint arrays."""
    x = np.asarray(a, dtype=_U64) ^ np.asarray(b, dtype=_U64)
    return np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)
