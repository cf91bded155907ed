"""Vectorized numpy kernels used inside Arrow-batched pandas UDFs.

These are the Spark analog of kmcp's compile-time sketch libraries
(SURVEY.md §2.8 X1–X11): hashing, shingling, MinHash/SimHash, and the
FPR / sizing statistics. All kernels operate on whole Arrow batches —
no per-row Python in the hot path beyond cheap O(1) bookkeeping.
"""

from kmcp_spark.functions.hashing import splitmix64, hash_bytes_rolling
from kmcp_spark.functions.shingle import (
    char_kgram_hashes_batch,
    word_ngram_hashes_batch,
)
from kmcp_spark.functions.minhash import (
    minhash_signatures,
    scaled_sketch,
    minimizer_sketch,
    syncmer_sketch,
)
from kmcp_spark.functions.simhash import simhash64
from kmcp_spark.functions.stats import (
    calc_signature_size,
    calc_fpr,
    query_fpr,
    query_fpr_chernoff,
    cov2simi,
    band_collision_prob,
)

__all__ = [
    "splitmix64",
    "hash_bytes_rolling",
    "char_kgram_hashes_batch",
    "word_ngram_hashes_batch",
    "minhash_signatures",
    "scaled_sketch",
    "minimizer_sketch",
    "syncmer_sketch",
    "simhash64",
    "calc_signature_size",
    "calc_fpr",
    "query_fpr",
    "query_fpr_chernoff",
    "cov2simi",
    "band_collision_prob",
]
