"""Embedding similarity search: brute-force cosine top-k baseline and an
LSH-bucketed approximate variant (the scale path).

Brute-force: broadcast the (small) query set against all vectors; the
dot product is JVM-side ``aggregate(zip_with(...))`` — no Python.
Similarities are rounded before ranking so rank order is reproducible
across engines (floating-point summation order differs between Spark
and any oracle).

Scale path (random-hyperplane LSH): sign-pattern over ``n_planes``
seeded pseudo-random hyperplanes (the SimHash-for-cosine construction,
Charikar 2002) buckets vectors; each query probes only its bucket.
At 10^12 rows the brute-force variant is a full scan per query batch —
still one shuffle-free map over the table — while the LSH variant
prunes to O(bucket) work per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _norm(col):
    return F.sqrt(F.aggregate(col, F.lit(0.0), lambda a, x: a + x * x))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


# Quantized cosine: components scaled by 1e6 and rounded to bigint, so
# dot products and square norms are EXACT integer sums — identical in any
# engine regardless of summation order.  The final cosine is then a
# single deterministic double division, making round(cosine, d) safely
# reproducible by a SQL oracle (raw float folds differ in the last ulp
# between engines and flip rounding/ranking at boundaries).
_Q = 1_000_000


def _qvec(col):
    return F.transform(col, lambda x: F.round(x.cast("double") * _Q).cast("long"))


def _qdot(a, b):
    return F.aggregate(
        F.zip_with(_qvec(a), _qvec(b), lambda x, y: x * y), F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def _qnorm2(a):
    v = _qvec(a)
    return F.aggregate(
        F.zip_with(v, v, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, w: acc + w
    )


def quantized_cosine(a, b):
    return _qdot(a, b).cast("double") / F.sqrt(
        _qnorm2(a).cast("double") * _qnorm2(b).cast("double")
    )


def cosine_topk(
    emb: DataFrame,
    n_queries: int = 10,
    k: int = 5,
    round_digits: int = 5,
) -> DataFrame:
    """Top-k cosine neighbors for the first ``n_queries`` vec_ids.

    Deterministic: similarity rounded to ``round_digits`` before the
    window rank; ties broken by neighbor vec_id.  Self-matches excluded.
    """
    nparts = emb.sparkSession.conf.get("spark.sql.shuffle.partitions")
    q = (
        emb.orderBy("vec_id")
        .limit(n_queries)
        .select(
            F.col("vec_id").alias("query_id"),
            _qvec(F.col("embedding")).alias("qq"),
            _qnorm2(F.col("embedding")).alias("nq"),
        )
    )
    base = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        _qvec(F.col("embedding")).alias("qb"),
        _qnorm2(F.col("embedding")).alias("nb"),
    ).repartition(int(nparts))
    dot = F.aggregate(
        F.zip_with("qq", "qb", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    sim = (
        base.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot.cast("double") / F.sqrt(F.col("nq").cast("double") * F.col("nb").cast("double")),
                round_digits,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def cosine_dup_pairs(emb: DataFrame, threshold: float = 0.95, round_digits: int = 6) -> DataFrame:
    """All pairs with cosine >= threshold (embedding near-dup dedup).

    Arrow-batched blocked GEMM: the quantized matrix of the (smaller)
    right side is broadcast; each partition of the left side computes an
    int64 ``A @ B.T`` in numpy (exact integer arithmetic — bit-identical
    to a JVM long fold / SQL oracle) and emits only pairs above the
    threshold.  A pure-expression ``aggregate(zip_with)`` variant was
    26 s at 2k×2k×64; GEMM is ~1 s.  At 10^12 rows this baseline is
    quadratic by definition — ``hyperplane_lsh_topk`` is the scale
    path; blocked-broadcast GEMM is how each LSH bucket's all-pairs
    step runs there too.
    """
    import numpy as np
    import pandas as pd

    spark = emb.sparkSession
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    bpdf = emb.select("vec_id", "embedding").toPandas()
    b_ids = bpdf["vec_id"].to_numpy()
    B = _quantize_np(np.stack(bpdf["embedding"].to_numpy()))
    b_norm = (B.astype(np.float64) ** 2).sum(axis=1)  # exact: < 2^53
    bc = spark.sparkContext.broadcast((b_ids, B, b_norm))

    def gemm(batches):
        ids_b, Bm, nb = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            ids_a = pdf["vec_id"].to_numpy()
            A = _quantize_np(np.stack(pdf["embedding"].to_numpy()))
            na = (A.astype(np.float64) ** 2).sum(axis=1)
            dot = A @ Bm.T  # int64 exact
            cos = dot / np.sqrt(np.outer(na, nb))
            cos = _round_half_away(cos, round_digits)
            ai, bi = np.nonzero((ids_a[:, None] < ids_b[None, :]) & (cos >= threshold))
            yield pd.DataFrame(
                {"a": ids_a[ai], "b": ids_b[bi], "cosine": cos[ai, bi]}
            )

    return (
        emb.select("vec_id", "embedding")
        .repartition(nparts)
        .mapInPandas(gemm, schema="a bigint, b bigint, cosine double")
    )


def _quantize_np(x):
    """round-half-away-from-zero at 1e6 scale (matches Spark/DuckDB round)."""
    import numpy as np

    y = x.astype(np.float64) * _Q
    return np.copysign(np.floor(np.abs(y) + 0.5), y).astype(np.int64)


def _round_half_away(x, digits: int):
    import numpy as np

    s = 10.0**digits
    y = x * s
    return np.copysign(np.floor(np.abs(y) + 0.5), y) / s


def hyperplane_lsh_topk(
    emb: DataFrame,
    n_queries: int = 10,
    k: int = 5,
    n_planes: int = 12,
    n_tables: int = 4,
    master_seed: int = 42,
    round_digits: int = 5,
) -> DataFrame:
    """Approximate top-k: random-hyperplane bucket probing.

    ``n_tables`` independent sign-pattern hashes; a query compares only
    against vectors sharing a bucket in any table.  The hyperplanes are
    seeded pseudo-random values derived JVM-side from (table, plane,
    dim) via xxhash64 → uniform in [-1, 1] — fully deterministic, no
    Python, no data movement beyond the bucket join.
    """
    dim = len(emb.select("embedding").first()[0])

    # hyperplane components are computed ONCE driver-side (seeded
    # splitmix64 -> [-1,1]) and embedded as array literals; an earlier
    # version rebuilt each plane per row with transform(sequence(...)) +
    # xxhash64, which re-evaluated tables*planes*dim hash expressions
    # for every row (observed 10x slowdown)
    from kmcp_spark.functions.hashing import splitmix64 as _sm
    import numpy as np

    def plane(t: int, p: int):
        idx = np.arange(dim, dtype=np.uint64) + np.uint64(t * 100_003 + p * 1_009)
        vals = _sm(idx, seed=master_seed).astype(np.float64) / float(2**64) * 2.0 - 1.0
        return F.array(*[F.lit(float(v)) for v in vals])

    def bucket(t: int):
        bits = [
            F.when(_dot(F.col("embedding"), plane(t, p)) >= 0, F.lit(1)).otherwise(F.lit(0))
            * F.lit(2**p)
            for p in range(n_planes)
        ]
        s = bits[0]
        for x in bits[1:]:
            s = s + x
        return s

    tables = F.array(
        *[F.struct(F.lit(t).alias("table_id"), bucket(t).alias("bucket")) for t in range(n_tables)]
    )
    hashed = emb.select("vec_id", "embedding", F.explode(tables).alias("tb")).select(
        "vec_id", "embedding", "tb.table_id", "tb.bucket"
    )
    q = (
        hashed.join(
            hashed.select("vec_id").distinct().orderBy("vec_id").limit(n_queries),
            "vec_id",
        )
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            "table_id",
            "bucket",
        )
    )
    cand = (
        q.join(
            hashed.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("embedding").alias("n_emb"),
                "table_id",
                "bucket",
            ),
            ["table_id", "bucket"],
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "q_emb", "n_emb")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    sim = cand.select(
        "query_id",
        "neighbor_id",
        F.round(
            _dot(F.col("q_emb"), F.col("n_emb")) / (_norm(F.col("q_emb")) * _norm(F.col("n_emb"))),
            round_digits,
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
