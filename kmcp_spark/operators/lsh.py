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
quadratically in one task; they are ESCALATED instead — each member is
linked to the bucket's deterministic min/max anchors (O(size) edges),
so a giant *near*-dup class that floods every band still reconnects
through verified anchor edges in connected components.  Oversized
buckets are also counted into the metrics table (no silent caps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


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

    Oversized buckets are ESCALATED, not dropped (the analog of kmcp's
    block-size escalation 256→8→1 for oversized groups,
    `kmcp/cmd/index.go:787-894`): every member of an oversized bucket is
    linked to the bucket's two deterministic anchors (min and max
    clip_id).  That is O(size) edges instead of the O(size^2) expansion,
    and if the bucket really is one giant near-dup class the anchor
    edges pass exact verification and connected components restores the
    full cluster; members whose anchor edges fail verify were
    false-positive collisions and are correctly not clustered.  Anchors
    come from one hash aggregation (min/max), so no per-bucket sort —
    the escalation stays linear even for a 10^7-member bucket.
    """
    # bucket sizes via ONE hash aggregation (a window over the full
    # bucket table would recompute per consumer); the sizes relation is
    # small (#distinct buckets) → broadcast back onto buckets
    sizes = buckets.groupBy("band_id", "band_hash").agg(
        F.count("*").alias("bucket_size"),
        F.min("clip_id").alias("anchor_lo"),
        F.max("clip_id").alias("anchor_hi"),
    )
    ok_keys = sizes.filter((F.col("bucket_size") > 1) & (F.col("bucket_size") <= max_bucket))
    oversized = sizes.filter(F.col("bucket_size") > max_bucket)
    # no broadcast hint: AQE broadcasts when small; at 10^12-row scale the
    # dup-bucket key set can exceed driver memory, so the shuffle join on
    # the same key (no extra exchange for `pairs` below) must stay legal
    ok = buckets.join(ok_keys.select("band_id", "band_hash"), ["band_id", "band_hash"])
    expanded = (
        ok.alias("l")
        .join(ok.alias("r"), ["band_id", "band_hash"])
        .filter(F.col("l.clip_id") < F.col("r.clip_id"))
        .select(F.col("l.clip_id").alias("a"), F.col("r.clip_id").alias("b"))
    )
    # escalation edges: member -> {min, max} anchor of its oversized bucket
    over_members = buckets.join(
        oversized.select("band_id", "band_hash", "anchor_lo", "anchor_hi"),
        ["band_id", "band_hash"],
    )
    escalated = (
        over_members.select(
            "clip_id", F.explode(F.array("anchor_lo", "anchor_hi")).alias("anchor")
        )
        .filter(F.col("clip_id") != F.col("anchor"))
        .select(
            F.least("clip_id", "anchor").alias("a"),
            F.greatest("clip_id", "anchor").alias("b"),
        )
    )
    pairs = (
        expanded.union(escalated)
        .groupBy("a", "b")
        .agg(F.count("*").alias("shared_bands"))
    )
    return pairs, oversized.drop("anchor_lo", "anchor_hi")
