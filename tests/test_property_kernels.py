"""Property-based tests (hypothesis) for the pure-numpy kernels: the
algebraic invariants every sketch family must hold regardless of input
shape.  These complement the statistical tests (3σ MinHash bound, FPR
vs brute force) with adversarial small cases hypothesis is good at
finding (empty sets, singletons, all-equal hashes, order permutations).
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from kmcp_spark.functions.hashing import splitmix64
from kmcp_spark.functions.minhash import (
    minhash_signatures,
    minimizer_sketch,
    scaled_sketch,
    syncmer_sketch,
)
from kmcp_spark.functions.simhash import simhash64

u64 = st.integers(min_value=0, max_value=2**64 - 1)
hash_sets = st.lists(u64, min_size=0, max_size=60, unique=True)


def _arr(xs):
    return np.array(xs, dtype=np.uint64)


@settings(max_examples=60, deadline=None)
@given(hash_sets, st.integers(min_value=1, max_value=7))
def test_minhash_order_invariant_and_monotone(xs, seed_mod):
    """Signatures ignore shingle order, and adding elements can only
    lower (never raise) each signature position — the defining property
    of a min-sketch."""
    a = _arr(xs)
    rng = np.random.default_rng(seed_mod)
    perm = rng.permutation(len(a))
    sig_a = minhash_signatures([a], 16)
    sig_p = minhash_signatures([a[perm]], 16)
    assert (sig_a == sig_p).all()
    extra = splitmix64(np.arange(5, dtype=np.uint64) + np.uint64(seed_mod), seed=99)
    sig_sup = minhash_signatures([np.union1d(a, extra)], 16)
    assert (sig_sup <= sig_a).all()


@settings(max_examples=60, deadline=None)
@given(hash_sets)
def test_simhash_order_invariant(xs):
    a = _arr(xs)
    rev = a[::-1].copy()
    assert simhash64([a])[0] == simhash64([rev])[0]


@settings(max_examples=60, deadline=None)
@given(hash_sets, st.integers(min_value=1, max_value=64))
def test_scaled_sketch_is_union_homomorphic(xs, scale):
    """FracMinHash's defining property (mergeable down-sample):
    scaled(A ∪ B) == scaled(A) ∪ scaled(B)."""
    a = _arr(xs)
    half = len(a) // 2
    left, right = a[:half], a[half:]
    merged = np.union1d(scaled_sketch(left, scale), scaled_sketch(right, scale))
    direct = np.sort(scaled_sketch(a, scale))
    assert (np.sort(merged) == direct).all()


@settings(max_examples=60, deadline=None)
@given(st.lists(u64, min_size=1, max_size=80), st.integers(min_value=1, max_value=12))
def test_minimizer_subset_and_coverage(xs, w):
    """Every minimizer is an input hash, and every window of w
    consecutive positions contains at least one selected value."""
    h = _arr(xs)
    m = minimizer_sketch(h, w)
    assert np.isin(m, h).all()
    if len(h) > w:
        sel = set(m.tolist())
        for i in range(len(h) - w + 1):
            assert set(h[i : i + w].tolist()) & sel


@settings(max_examples=60, deadline=None)
@given(st.lists(u64, min_size=0, max_size=80), st.integers(min_value=2, max_value=9))
def test_syncmer_subset_and_determinism(xs, s):
    h = _arr(xs)
    k1, k2 = syncmer_sketch(h, s), syncmer_sketch(h, s)
    assert (k1 == k2).all()
    assert np.isin(k1, h).all()


@settings(max_examples=40, deadline=None)
@given(st.lists(u64, min_size=1, max_size=500, unique=True), st.integers(1, 100))
def test_splitmix64_injective_on_distinct_inputs(xs, seed):
    """splitmix64 is a bijection on uint64 — distinct inputs never
    collide (the property the dedup hash tables rely on)."""
    h = splitmix64(_arr(xs), seed=seed)
    assert len(np.unique(h)) == len(xs)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.text(alphabet="ab \x00", min_size=0, max_size=12), min_size=1, max_size=8),
       st.integers(min_value=2, max_value=4))
def test_char_kgram_counts_match_python_oracle(texts, k):
    """Batched char k-gram hash counts equal a per-string python count,
    including NUL bytes in content (stripped, never a separator leak)."""
    import pandas as pd

    from kmcp_spark.functions.shingle import char_kgram_hashes_batch

    sets = char_kgram_hashes_batch(pd.Series(texts), k)
    for t, s in zip(texts, sets):
        clean = t.replace("\x00", "")
        want = {clean[i : i + k] for i in range(max(len(clean) - k + 1, 0))}
        assert len(s) == len(want), (t, k)


# --- r3 cache-resident chunking: bit-equivalence vs the naive form ---
# The chunked kernels (minhash: perm loop inside row-aligned chunks;
# simhash: uint16 segment sums per chunk) must return exactly what the
# straightforward whole-batch implementations return, for any mix of
# row sizes (including rows larger than the chunk bound and empty rows).

def _naive_minhash(sets, num_perm, master_seed=42):
    from kmcp_spark.functions.hashing import derive_seeds

    out = np.full((len(sets), num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    seeds = derive_seeds(num_perm, master_seed)
    for i, s in enumerate(sets):
        if len(s) == 0:
            continue
        for p in range(num_perm):
            out[i, p] = splitmix64(np.asarray(s, dtype=np.uint64), seed=int(seeds[p])).min()
    return out


def _naive_simhash(sets):
    out = np.zeros(len(sets), dtype=np.uint64)
    for i, s in enumerate(sets):
        if len(s) == 0:
            continue
        bits = np.unpackbits(
            np.asarray(s, dtype="<u8").view(np.uint8).reshape(-1, 8),
            axis=1, bitorder="little",
        ).astype(np.int64).sum(axis=0)
        fp = (bits > len(s) / 2.0).astype(np.uint8)
        out[i] = np.packbits(fp, bitorder="little").copy().view("<u8")[0]
    return out


row_sizes = st.lists(st.integers(min_value=0, max_value=400), min_size=1, max_size=12)


@settings(max_examples=30, deadline=None)
@given(row_sizes, st.integers(min_value=0, max_value=2**32))
def test_chunked_minhash_matches_naive(sizes, seed):
    sets = [
        splitmix64(np.arange(n, dtype=np.uint64) + np.uint64(i * 1_000_003), seed=seed)
        for i, n in enumerate(sizes)
    ]
    got = minhash_signatures(sets, 16, master_seed=7)
    assert (got == _naive_minhash(sets, 16, master_seed=7)).all()


@settings(max_examples=30, deadline=None)
@given(row_sizes, st.integers(min_value=0, max_value=2**32))
def test_chunked_simhash_matches_naive(sizes, seed):
    sets = [
        splitmix64(np.arange(n, dtype=np.uint64) + np.uint64(i * 999_983), seed=seed)
        for i, n in enumerate(sizes)
    ]
    assert (simhash64(sets) == _naive_simhash(sets)).all()


def test_chunked_minhash_row_larger_than_chunk():
    """A single row bigger than the 48k-element chunk bound is processed
    alone and still matches the naive signature."""
    big = splitmix64(np.arange(60_000, dtype=np.uint64), seed=3)
    small = splitmix64(np.arange(10, dtype=np.uint64), seed=4)
    sets = [small, big, np.empty(0, dtype=np.uint64)]
    got = minhash_signatures(sets, 8, master_seed=1)
    assert (got == _naive_minhash(sets, 8, master_seed=1)).all()


def test_chunked_simhash_row_larger_than_chunk():
    big = splitmix64(np.arange(40_000, dtype=np.uint64), seed=5)
    sets = [big, splitmix64(np.arange(3, dtype=np.uint64), seed=6)]
    assert (simhash64(sets) == _naive_simhash(sets)).all()
