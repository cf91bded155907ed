"""Batch shingling: text -> hashed k-gram / n-gram sets, fully vectorized.

Role parity: kmcp shingles DNA into k-mers with a rolling hash
(`kmcp/cmd/compute.go:746-803`); we shingle transcripts into character
k-grams and word n-grams.  The whole Arrow batch is concatenated into
one symbol buffer with a separator, the rolling hash runs once over the
buffer, windows that cross row boundaries are masked out, and per-row
slices are recovered from offsets — no per-row Python in the heavy loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from kmcp_spark.functions.hashing import hash_bytes_rolling, splitmix64

_U64 = np.uint64
_SEP = 0  # NUL separator byte; stripped from content below so a literal
# U+0000 in a transcript cannot mis-split that row's k-gram windows


def _concat_offsets(texts: "pd.Series | list[str]") -> tuple[np.ndarray, np.ndarray]:
    """Encode all texts into one uint8 buffer separated by NUL.

    Returns (buf, offsets) where row i's bytes live at
    buf[offsets[i] : offsets[i+1] - 1] (the -1 skips the separator).
    NUL is legal in a Python str, so content NULs are removed first —
    otherwise they would be indistinguishable from row separators.
    """
    if isinstance(texts, pd.Series):
        texts = texts.fillna("").tolist()
    joined = (
        "\x00".join(t.replace("\x00", "") if t is not None else "" for t in texts)
        + "\x00"
    )
    buf = np.frombuffer(joined.encode("utf-8", "surrogatepass"), dtype=np.uint8)
    # offsets in *byte* space: separator positions +1
    sep_pos = np.flatnonzero(buf == _SEP)
    offsets = np.concatenate(([0], sep_pos + 1))
    return buf, offsets


def char_kgram_hashes_batch(
    texts: "pd.Series | list[str]", k: int, distinct: bool = True
) -> list[np.ndarray]:
    """Hash every character k-gram of every text in the batch.

    Returns a list (one per row) of uint64 hash arrays, sorted and
    deduplicated when ``distinct`` (the analog of kmcp's sort-dedup of
    k-mers, `kmcp/cmd/compute.go:813-824`).  Rows shorter than k get an
    empty array.
    """
    buf, offsets = _concat_offsets(texts)
    n_rows = len(offsets) - 1
    if buf.shape[0] < k:
        return [np.empty(0, dtype=_U64) for _ in range(n_rows)]
    hashes = hash_bytes_rolling(buf, k)
    # a window starting at i is valid iff buf[i:i+k] has no separator:
    is_sep = (buf == _SEP).astype(np.int32)
    csum = np.concatenate(([0], np.cumsum(is_sep)))
    valid = (csum[k:] - csum[:-k]) == 0  # len == len(hashes)
    out: list[np.ndarray] = []
    for r in range(n_rows):
        start, end = offsets[r], offsets[r + 1] - 1  # text bytes [start,end)
        hi = min(end - k + 1, hashes.shape[0])
        if hi <= start:
            out.append(np.empty(0, dtype=_U64))
            continue
        h = hashes[start:hi][valid[start:hi]]
        out.append(np.unique(h) if distinct else h)
    return out


def word_symbols(texts: "pd.Series | list[str]") -> tuple[np.ndarray, np.ndarray]:
    """Tokenize + token-hash a whole batch ONCE: (sym, counts).

    ``sym`` is the concatenated uint64 token-hash sequence of all rows;
    ``counts[r]`` is row r's token count.  Shared by every n-gram width
    (see :func:`ngram_hashes_from_symbols`) so multi-k shingling splits
    the strings a single time — the analog of kmcp reusing one k-mer
    iterator family across its ks-descending search loop
    (`kmcp/cmd/util-db-search.go:1037-1107`).
    """
    if isinstance(texts, pd.Series):
        texts = texts.fillna("").tolist()
    # tokenize the whole batch at once via one split pass per row
    # (string split is unavoidable row-wise; hashing is batch-level).
    token_lists = [t.split() if t else [] for t in texts]
    counts = np.fromiter((len(tl) for tl in token_lists), dtype=np.int64, count=len(token_lists))
    all_tokens = [tok for tl in token_lists for tok in tl]
    # hash each distinct token once
    uniq, inv = np.unique(np.asarray(all_tokens, dtype=object), return_inverse=True) if all_tokens else (
        np.empty(0, dtype=object),
        np.empty(0, dtype=np.int64),
    )
    uniq_hashes = _hash_str_array(uniq)
    sym = uniq_hashes[inv] if all_tokens else np.empty(0, dtype=_U64)
    return sym, counts


def ngram_hashes_from_symbols(
    sym: np.ndarray, counts: np.ndarray, n: int, distinct: bool = True
) -> list[np.ndarray]:
    """Rolling n-window hashes over precomputed token symbols, per row."""
    out: list[np.ndarray] = []
    offs = np.concatenate(([0], np.cumsum(counts)))
    for r in range(counts.shape[0]):
        s = sym[offs[r] : offs[r + 1]]
        if s.shape[0] < n:
            out.append(np.empty(0, dtype=_U64))
            continue
        h = hash_bytes_rolling(s, n)
        out.append(np.unique(h) if distinct else h)
    return out


def word_ngram_hashes_batch(
    texts: "pd.Series | list[str]", n: int, distinct: bool = True
) -> list[np.ndarray]:
    """Hash every word n-gram (whitespace tokenization) per row.

    Tokens are first hashed to uint64 (so the n-gram rolling hash runs
    over token-hash symbols, not characters), then an n-window rolling
    hash produces the shingle hashes — the word-level analog of X1.
    """
    sym, counts = word_symbols(texts)
    return ngram_hashes_from_symbols(sym, counts, n, distinct)


def _hash_str_array(arr: np.ndarray) -> np.ndarray:
    """uint64 hash per string via per-string byte fold (small distinct sets)."""
    out = np.empty(arr.shape[0], dtype=_U64)
    for i, s in enumerate(arr):
        b = np.frombuffer(str(s).encode("utf-8", "surrogatepass"), dtype=np.uint8)
        if b.shape[0] == 0:
            out[i] = 0
            continue
        h = hash_bytes_rolling(b.astype(_U64), b.shape[0])
        out[i] = h[0]
    return splitmix64(out)
