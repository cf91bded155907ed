"""LSH banding + candidate-pair generation (the `kmcp index`+`search`
probe analog).

kmcp packs k-mer sets into a COBS bit-sliced Bloom matrix and probes it
with vectorized popcount (`kmcp/cmd/index.go:923-1331`,
`kmcp/cmd/util-db-search.go:1434-7409`).  The Spark-native equivalent is
MinHash-LSH banding: the signature is cut into ``bands`` bands of
``rows_per_band`` values; each band hashes to a bucket; any two clips
sharing a bucket in any band become a candidate pair.  Candidate
generation is then ONE shuffle (groupBy band key) instead of an index
structure — Catalyst/AQE pick the physical join and split skewed
partitions.

Skew policy (the analog of kmcp's block-size escalation 256→8→1 for
oversized groups, `kmcp/cmd/index.go:787-894` / flags `:1453-1463`):
buckets whose membership exceeds ``max_bucket`` would pair-expand
quadratically in one task; we exclude them from direct expansion and
count them into the metrics table (callers see exactly what was
skipped — no silent caps).  Members of an oversized bucket still pair
through their other ``bands-1`` bands, which for near-duplicates almost
surely collide too (P[all bands oversized] is negligible unless the
corpus is one giant duplicate class — which the exact-hash short-circuit
upstream removes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def band_buckets(sketches: DataFrame, bands: int, rows_per_band: int) -> DataFrame:
    """sketches -> buckets(band_id int, band_hash bigint, clip_id string).

    The band hash is computed JVM-side: ``xxhash64(band_id, slice(sig))``
    — no Python in this stage at all.
    """
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.xxhash64(
                    F.lit(b), F.slice(F.col("minhash"), b * rows_per_band + 1, rows_per_band)
                ).alias("band_hash"),
            )
            for b in range(bands)
        ]
    )
    return (
        sketches.select("clip_id", F.explode(band_structs).alias("band"))
        .select("clip_id", F.col("band.band_id").alias("band_id"), F.col("band.band_hash").alias("band_hash"))
    )


def bucket_stats(buckets: DataFrame) -> DataFrame:
    """Bucket-size histogram (the `utils index-density` analog)."""
    return (
        buckets.groupBy("band_id", "band_hash")
        .agg(F.count("*").alias("bucket_size"))
        .groupBy("bucket_size")
        .agg(F.count("*").alias("n_buckets"))
        .orderBy("bucket_size")
    )


def candidate_pairs(
    buckets: DataFrame, max_bucket: int = 2000
) -> tuple[DataFrame, DataFrame]:
    """buckets -> (pairs(a, b, shared_bands), oversized_buckets).

    Pair expansion is a self-join on the band key restricted to buckets
    with 1 < size <= max_bucket.  ``shared_bands`` counts how many bands
    voted for the pair (the analog of kmcp's per-target match count A2).
    """
    # bucket sizes via ONE hash aggregation (a window over the full
    # bucket table would recompute per consumer); the sizes relation is
    # small (#distinct buckets) → broadcast back onto buckets
    sizes = buckets.groupBy("band_id", "band_hash").agg(F.count("*").alias("bucket_size"))
    ok_keys = sizes.filter((F.col("bucket_size") > 1) & (F.col("bucket_size") <= max_bucket))
    oversized = sizes.filter(F.col("bucket_size") > max_bucket)
    # no broadcast hint: AQE broadcasts when small; at 10^12-row scale the
    # dup-bucket key set can exceed driver memory, so the shuffle join on
    # the same key (no extra exchange for `pairs` below) must stay legal
    ok = buckets.join(ok_keys.select("band_id", "band_hash"), ["band_id", "band_hash"])
    pairs = (
        ok.alias("l")
        .join(ok.alias("r"), ["band_id", "band_hash"])
        .filter(F.col("l.clip_id") < F.col("r.clip_id"))
        .select(F.col("l.clip_id").alias("a"), F.col("r.clip_id").alias("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("shared_bands"))
    )
    return pairs, oversized
