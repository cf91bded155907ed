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
    q = emb.orderBy("vec_id").limit(n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    base = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("n_emb"))
    sim = (
        F.broadcast(q)
        .crossJoin(base)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                quantized_cosine(F.col("q_emb"), F.col("n_emb")),
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

    All-pairs is the exactness baseline; the LSH variant below is the
    10^12-scale path.  The join is a self cross join pruned by vec_id
    ordering; AQE splits skew.
    """
    a = emb.select(F.col("vec_id").alias("a"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("b"), F.col("embedding").alias("eb"))
    return (
        a.crossJoin(b)
        .filter(F.col("a") < F.col("b"))
        .select(
            "a",
            "b",
            F.round(
                quantized_cosine(F.col("ea"), F.col("eb")),
                round_digits,
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


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

    def plane(t: int, p: int):
        # deterministic pseudo-random hyperplane as an array literal-free
        # column: component d = hash(t,p,d) scaled to [-1,1]
        return F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda d: (
                F.xxhash64(F.lit(master_seed), F.lit(t), F.lit(p), d).cast("double")
                / F.lit(float(2**63))
            ),
        )

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
