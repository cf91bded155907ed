"""Document-dedup operator tests: short/empty-doc robustness, LSH
candidate pruning equivalence, and SimHash banding exactness."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from kmcp_spark.operators import dedup as D


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )


BASE = "the quick brown fox jumps over the lazy dog near the old river bank today"
NEAR = "the quick brown fox jumps over the lazy dog near the old river bank now"
OTHER = "completely different words compose this unrelated sentence about space travel and stars"


def test_short_docs_do_not_crash(spark):
    """Docs with fewer than n words must yield empty gram sets, not a
    runtime error (ADVICE r1: sequence(0, negative) -> slice(words, 0, n))."""
    docs = _docs(spark, ["", "one", "one two", BASE, BASE])
    out = D.ngram_jaccard_pairs(docs, n=3, threshold=0.4).collect()
    assert {(r.a, r.b) for r in out} == {(3, 4)}
    out = D.minhash_lsh_dup_pairs(docs, n=3, threshold=0.4).collect()
    assert {(r.a, r.b) for r in out} == {(3, 4)}


def test_empty_gram_docs_not_simhash_dups(spark):
    """Gram-less docs share the degenerate 0 fingerprint; they must not
    be reported as duplicates of each other (ADVICE r1)."""
    docs = _docs(spark, ["", "x", "a b", BASE, BASE])
    out = D.simhash_dup_pairs(docs, n=3, max_hamming=8).collect()
    assert {(r.a, r.b) for r in out} == {(3, 4)}


def test_minhash_lsh_equals_exact(spark):
    """r=1 banding + candidate-only verification must reproduce the exact
    all-pairs n-gram Jaccard result."""
    texts = [BASE, NEAR, OTHER, BASE + " extra words appended here", OTHER]
    docs = _docs(spark, texts)
    exact = {
        (r.a, r.b, round(r.jaccard, 9))
        for r in D.ngram_jaccard_pairs(docs, n=3, threshold=0.3).collect()
    }
    lsh = {
        (r.a, r.b, round(r.jaccard, 9))
        for r in D.minhash_lsh_dup_pairs(docs, n=3, threshold=0.3).collect()
    }
    assert exact == lsh and len(exact) >= 2


def test_minhash_lsh_plan_prunes(spark):
    """The verification join must be candidate-scoped: no all-pairs gram
    self-join (gram explode appears only in the leaf gram-set scan, and
    the plan contains no gram-keyed join)."""
    docs = _docs(spark, [BASE, NEAR, OTHER])
    plan = D.minhash_lsh_dup_pairs(docs, n=3)._jdf.queryExecution().optimizedPlan().toString()
    # the old shape joined the exploded gram relation with itself on a
    # `gram` column; the pruned shape joins only on doc ids (a/b)
    import re

    for m in re.finditer(r"Join.*?\((.*?)\)", plan):
        assert "gram#" not in m.group(1), f"gram-keyed join in plan: {m.group(1)}"
    assert "Join" in plan


def test_simhash_banding_is_exact(spark):
    """Band candidates + hamming filter == brute-force all-pairs hamming
    over the same signatures (pigeonhole: 9 bands cover hamming<=8)."""
    rng = np.random.default_rng(7)
    base = int(rng.integers(0, 2**63))
    sigs = []
    for i in range(40):
        flips = rng.choice(64, size=int(rng.integers(0, 16)), replace=False)
        v = base
        for f in flips:
            v ^= 1 << int(f)
        # map to signed 64-bit
        sigs.append((i, v - (1 << 64) if v >= 1 << 63 else v))
    df = spark.createDataFrame(sigs, "doc_id bigint, simhash bigint")
    got = {
        (r.a, r.b, r.hamming)
        for r in D.simhash_pairs_from_sigs(df, max_hamming=8, n_bands=9).collect()
    }
    want = set()
    for i, si in sigs:
        for j, sj in sigs:
            if i < j:
                h = bin((si ^ sj) & ((1 << 64) - 1)).count("1")
                if h <= 8:
                    want.add((i, j, h))
    assert got == want and len(want) > 5


def test_simhash_bands_reject_too_small():
    import pandas as pd  # noqa: F401

    with pytest.raises(ValueError):
        D.simhash_pairs_from_sigs(None, max_hamming=8, n_bands=8)


def test_multi_k_reports_largest_passing_gram(spark):
    """kmcp probes ks descending and keeps the largest k that matches;
    near-identical docs must surface at gram_n=5 while a pair whose
    overlap is too fragmented for 5-grams surfaces at a smaller n."""
    frag_a = "alpha beta gamma delta xx epsilon zeta eta theta yy iota kappa lam mu"
    frag_b = "alpha beta gamma delta zz epsilon zeta eta theta qq iota kappa lam mu"
    docs = _docs(spark, [BASE, BASE + " tail", frag_a, frag_b])
    out = {(r.a, r.b): r.gram_n for r in D.multi_k_dup_pairs(
        docs, ks=(5, 4, 3), threshold=0.3
    ).collect()}
    assert out[(0, 1)] == 5          # near-identical -> largest k wins
    assert out[(2, 3)] in (3, 4)     # fragmented overlap -> smaller k
    # each pair reported exactly once (dict construction would hide dups,
    # so check the raw count)
    rows = D.multi_k_dup_pairs(docs, ks=(5, 4, 3), threshold=0.3).collect()
    assert len(rows) == len({(r.a, r.b) for r in rows})


def test_nul_byte_does_not_split_shingles():
    """A literal U+0000 inside a transcript must not act as a row
    separator (ADVICE r1)."""
    from kmcp_spark.functions.shingle import char_kgram_hashes_batch

    clean = char_kgram_hashes_batch(["abcdefgh"], k=4)[0]
    dirty = char_kgram_hashes_batch(["abcd\x00efgh"], k=4)[0]
    assert np.array_equal(clean, dirty)
    # and neighboring rows stay isolated
    two = char_kgram_hashes_batch(["abcdefgh", "zzzzzzzz"], k=4)
    assert np.array_equal(two[0], clean)


def test_benchmark_contamination(spark):
    """A doc sharing a long phrase with a benchmark doc is flagged;
    unrelated docs and the benchmark docs themselves are not."""
    from kmcp_spark.operators.dedup import benchmark_contamination

    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog"),     # bench
            (1, "completely unrelated words here nothing shared"),  # bench
            (10, "he said the quick brown fox jumps far away"),     # leak of 0
            (11, "zebra yak xylophone walrus vulture turtle snail"),# clean
        ],
        "doc_id long, text string",
    )
    bench = docs.filter("doc_id < 10")
    out = benchmark_contamination(docs, bench, n=3, min_common=2).toPandas()
    assert set(out["doc_id"]) == {10}
    row = out.set_index("doc_id").loc[10]
    # shared 3-grams: "the quick brown","quick brown fox","brown fox jumps"
    assert row["n_contaminated_grams"] == 3 and row["n_bench_docs"] == 1


def test_internal_caches_released(spark):
    """Operator-internal persisted relations (gram tables, signature
    relations, multi-k levels) must not accumulate across queries in a
    long-lived session: each operator sweeps its predecessor's caches on
    entry, and release_deferred() drops the last query's (VERDICT r3
    'what's wrong' #2)."""
    from kmcp_spark.runtime import persistent_ids, release_deferred

    sc = spark.sparkContext
    release_deferred()
    spark.catalog.clearCache()
    base = persistent_ids(sc)
    texts = [BASE, NEAR, OTHER, BASE + " extra words appended here"]
    docs = _docs(spark, texts)

    for run in (
        lambda: D.ngram_jaccard_pairs(docs, n=3, threshold=0.3),
        lambda: D.minhash_lsh_dup_pairs(docs, n=3, threshold=0.3),
        lambda: D.multi_k_dup_pairs(docs, ks=(5, 3), threshold=0.3),
        lambda: D.ngram_containment_pairs(docs, n=3),
    ):
        run().collect()  # materialize -> internal persists are live
        assert persistent_ids(sc) - base, "expected live internal caches"
        # the NEXT operator call sweeps them ...
        run()
        # ... and an explicit release drops that call's own registrations
        release_deferred()
        assert persistent_ids(sc) - base == set(), (
            "internal caches leaked past release_deferred()"
        )
