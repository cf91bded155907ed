"""Embedding similarity operators: block-GEMM exactness and the
ANN-LSH recall measurement the r1 review called out as missing."""

import numpy as np
from pyspark.sql import functions as F

from kmcp_spark.operators.similarity import (
    cosine_dup_pairs,
    cosine_topk,
    hyperplane_lsh_topk,
    ivf_topk,
)


def _emb(spark, n=300, dim=32, seed=11):
    """Clustered synthetic embeddings: planted near-dup groups so both
    the dup-pair threshold and top-k ranking have signal."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n // 10, dim))
    rows = []
    for i in range(n):
        c = centers[i % len(centers)]
        v = c + 0.15 * rng.standard_normal(dim)
        v = v / np.linalg.norm(v)
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def test_block_gemm_matches_bruteforce(spark):
    """The distributed block-pair GEMM must emit exactly the pairs a
    single-node numpy all-pairs scan finds (quantized-exact math)."""
    emb = _emb(spark, n=200)
    pdf = emb.toPandas()
    M = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    Q = np.copysign(np.floor(np.abs(M * 1e6) + 0.5), M)
    dots = Q @ Q.T
    norms = (Q**2).sum(axis=1)
    cos = dots / np.sqrt(np.outer(norms, norms))
    s = 1e6
    cos = np.copysign(np.floor(np.abs(cos * s) + 0.5), cos) / s
    ids = pdf["vec_id"].to_numpy()
    want = {
        (int(ids[i]), int(ids[j]))
        for i in range(len(ids))
        for j in range(len(ids))
        if ids[i] < ids[j] and cos[i, j] >= 0.9
    }
    got = {(r.a, r.b) for r in cosine_dup_pairs(emb, threshold=0.9).collect()}
    assert got == want and len(want) > 50


def test_block_gemm_no_collect_in_plan(spark):
    """r1's version collected the whole table to the driver; the plan
    must now be a broadcast of the 72-row block map + one shuffle."""
    emb = _emb(spark, n=100)
    plan = cosine_dup_pairs(emb, threshold=0.9)._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan or "FlatMapGroupsIn" in plan


def test_ann_lsh_recall_vs_bruteforce(spark):
    """The r1 review: 'recall vs the brute-force query is never measured
    anywhere'.  Measure it: fraction of exact top-5 neighbors the LSH
    probe returns for the same queries.  With 4 tables x 12 planes on a
    clustered corpus the bucketed probe must recover most of the true
    neighborhood; the floor here is deliberately conservative so host
    variation cannot flake the test, and the measured value is printed
    for the bench record."""
    emb = _emb(spark, n=300)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(emb, n_queries=10, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in hyperplane_lsh_topk(emb, n_queries=10, k=5).collect()
    }
    recall = len(exact & approx) / len(exact)
    print(f"ann_lsh_recall={recall:.3f}")
    assert recall >= 0.6, f"LSH top-k recall {recall} below floor"


def test_ann_ivf_recall_vs_bruteforce(spark):
    """IVF cell-probe recall against the exact brute-force top-k on the
    same clustered corpus.  With 16 cells / 4 probes each query scans
    ~1/4 of the table; on a corpus of 30 tight clusters the true
    neighbors share the query's cell almost always, so recall should be
    high — the floor is conservative against seed-placement luck."""
    emb = _emb(spark, n=300)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(emb, n_queries=10, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(emb, n_queries=10, k=5, n_cells=16, n_probe=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    print(f"ann_ivf_recall={recall:.3f}")
    assert recall >= 0.6, f"IVF top-k recall {recall} below floor"


def test_ann_ivf_assignment_partitions_table(spark):
    """Every vector lands in exactly one cell, and the probe set is a
    strict subset of cells (the pruning that makes IVF the scale path)."""
    emb = _emb(spark, n=200)
    out = ivf_topk(emb, n_queries=5, k=3, n_cells=10, n_probe=2)
    rows = out.collect()
    assert len(rows) == 15  # 5 queries x k=3: probed cells were non-empty
    # neighbors per query come from <= n_probe cells; with 10 cells of
    # ~20 vectors, candidates <= ~40 of 199 possible — spot-check via the
    # operator's own guarantee that rank is dense 1..k per query
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r.rank)
    assert all(sorted(v) == [1, 2, 3] for v in by_q.values())


def test_ann_lsh_candidates_are_pruned(spark):
    """The probe must compare each query against a strict subset of the
    table (bucketed candidates), not degenerate to all-pairs."""
    emb = _emb(spark, n=300)
    # count candidate pairs the same way the operator builds them
    from kmcp_spark.operators.similarity import hyperplanes_q, _qvec

    df = hyperplane_lsh_topk(emb, n_queries=10, k=5)
    # 10 queries x 299 others = 2990 all-pairs comparisons; the ranked
    # output capped at k=5 proves nothing, so check bucket sizes instead
    planes = hyperplanes_q(32, 12, 4)
    qe = emb.select("vec_id", _qvec(F.col("embedding")).alias("q")).toPandas()
    Q = np.stack(qe["q"].to_numpy()).astype(np.int64)
    total_cand = 0
    for t in range(4):
        sign = (Q @ planes[t].T >= 0).astype(np.int64)
        bucket = (sign * (2 ** np.arange(12))).sum(axis=1)
        _, counts = np.unique(bucket, return_counts=True)
        total_cand += (counts * (counts - 1) // 2).sum()
    assert total_cand < 300 * 299 // 2 * 0.5  # well under half of all-pairs
    assert df.count() <= 50


def test_semantic_dedup_subset_and_recall(spark):
    """semantic_dup_pairs (SemDeDup) must emit a SUBSET of the
    brute-force pairs (same quantized cosine, intra-cell only), with
    usable recall on clustered data, and every emitted pair exactly
    once (the sub-block decomposition must not duplicate)."""
    from kmcp_spark.operators.similarity import semantic_dup_pairs

    emb = _emb(spark, n=300)
    thr = 0.9
    brute = {
        (r["a"], r["b"]): r["cosine"]
        for r in cosine_dup_pairs(emb, threshold=thr).collect()
    }
    sem = semantic_dup_pairs(emb, n_cells=12, threshold=thr).collect()
    keys = [(r["a"], r["b"]) for r in sem]
    assert len(keys) == len(set(keys)), "pair emitted by more than one block group"
    for r in sem:
        assert (r["a"], r["b"]) in brute
        assert abs(brute[(r["a"], r["b"])] - r["cosine"]) < 1e-12
    assert len(brute) > 50
    recall = len(keys) / len(brute)
    # planted clusters are tight; medoid cells keep most of them together
    assert recall >= 0.6, f"semantic dedup recall {recall}"


def test_semantic_dedup_giant_cell_splits_into_blocks(spark):
    """A degenerate corpus where every vector lands in one cell must
    still produce correct pairs via the intra-cell block decomposition."""
    from kmcp_spark.operators.similarity import semantic_dup_pairs

    rng = np.random.default_rng(3)
    base = rng.standard_normal(16)
    base /= np.linalg.norm(base)
    rows = []
    for i in range(120):
        v = base + 0.01 * rng.standard_normal(16)
        v = v / np.linalg.norm(v)
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    got = semantic_dup_pairs(emb, n_cells=1, threshold=0.99, n_blocks=3).collect()
    cells = {r["cell_id"] for r in got}
    assert cells == {0}
    want = {(r["a"], r["b"]) for r in cosine_dup_pairs(emb, threshold=0.99).collect()}
    assert {(r["a"], r["b"]) for r in got} == want
    assert len(want) > 1000  # near-identical vectors: most pairs qualify


def test_block_gemm_invariant_to_block_count(spark):
    """The block-pair decomposition is a physical strategy only: the
    emitted pair set and cosines must be identical for any n_blocks."""
    emb = _emb(spark, n=150)
    r2 = {(r["a"], r["b"]): r["cosine"]
          for r in cosine_dup_pairs(emb, threshold=0.9, n_blocks=2).collect()}
    r5 = {(r["a"], r["b"]): r["cosine"]
          for r in cosine_dup_pairs(emb, threshold=0.9, n_blocks=5).collect()}
    assert r2 == r5 and len(r2) > 10
