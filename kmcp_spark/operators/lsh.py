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

from pyspark.sql import DataFrame, Window, functions as F


def band_rows(src: DataFrame, bands: int, rows_per_band: int,
              id_col: str) -> DataFrame:
    """(id, band_id, band_hash) band relation from minhash signatures.

    THE banding kernel: one recipe serves the clip pipeline
    (``band_buckets``) and the document path (``dedup.doc_band_rows``)
    so the hash recipe can never desynchronize between them — both
    paths and the staged skew-oracle tables derive from this exact
    expression.  The band hash is computed JVM-side:
    ``xxhash64(band_id, slice(sig))`` — no Python in this stage at all.
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
        src.select(id_col, F.explode(band_structs).alias("band"))
        .select(id_col, F.col("band.band_id").alias("band_id"), F.col("band.band_hash").alias("band_hash"))
    )


def band_buckets(sketches: DataFrame, bands: int, rows_per_band: int) -> DataFrame:
    """sketches -> buckets(band_id int, band_hash bigint, clip_id string)."""
    return band_rows(sketches, bands, rows_per_band, "clip_id")


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
    # ONE shuffle of the bucket table: a whole-partition window over the
    # band key annotates every member with its bucket's size and min/max
    # anchors.  The earlier shape (separate sizes aggregation joined back
    # onto buckets, then a bucket-key self-join) re-derived the band
    # table 3x and built two broadcast tables per run — measured 2-3 s of
    # driver-serial work per leg that did not parallelize.  Here both
    # consumers branch off the SAME exchange (the second branch is a
    # ReusedExchange over the first's shuffle files).
    w = Window.partitionBy("band_id", "band_hash")
    ann = buckets.select(
        "band_id",
        "band_hash",
        "clip_id",
        F.count("*").over(w).alias("bucket_size"),
        F.min("clip_id").over(w).alias("anchor_lo"),
        F.max("clip_id").over(w).alias("anchor_hi"),
    )
    # pair expansion happens IN-ROW from a collected member array; the
    # size filter runs BEFORE collect_list so arrays are bounded by
    # max_bucket (a 10^7-member bucket flows through the window's
    # spillable sort, never into an in-memory array).  The groupBy keys
    # match the window partitioning, so no second exchange.
    grouped = (
        ann.filter((F.col("bucket_size") > 1) & (F.col("bucket_size") <= max_bucket))
        .groupBy("band_id", "band_hash")
        .agg(F.collect_list("clip_id").alias("members"))
    )
    expanded = (
        grouped.select("members", F.posexplode("members").alias("i", "ca"))
        .select(
            "ca",
            F.explode(F.slice("members", F.col("i") + 2, F.size("members"))).alias("cb"),
        )
        # a clip_id can appear twice in one bucket (e.g. streaming unions
        # bands_new with prior band tables and a clip is re-delivered);
        # the old self-join's strict l.clip_id < r.clip_id dropped the
        # resulting (a,a) rows, so the in-row expansion must too.
        .filter(F.col("ca") != F.col("cb"))
        .select(F.least("ca", "cb").alias("a"), F.greatest("ca", "cb").alias("b"))
    )
    # escalation edges: member -> {min, max} anchor of its oversized
    # bucket — a narrow select off the annotated rows, no join.  The
    # oversized member rows are persisted (deferred-release protocol,
    # runtime.py: the next candidate_pairs call or the pipeline's
    # end-of-run sweep releases them) so that the caller's follow-up
    # oversized count is a cache read instead of a second full band
    # derivation (measured ~1.4 s/leg).  Bounded by actual skew: only
    # members of >max_bucket buckets land here (none on a healthy
    # corpus), and MEMORY_AND_DISK spills if a pathological one floods.
    from pyspark import StorageLevel

    from kmcp_spark.runtime import defer_unpersist, release_deferred

    release_deferred(tag="lsh")
    over_rel = defer_unpersist(
        ann.filter(F.col("bucket_size") > max_bucket).persist(
            StorageLevel.MEMORY_AND_DISK
        ),
        tag="lsh",
    )
    escalated = (
        over_rel.select(
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
    oversized = (
        over_rel.select("band_id", "band_hash", "bucket_size").distinct()
    )
    return pairs, oversized
