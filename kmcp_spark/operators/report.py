"""Report writers: the `kmcp profile` output-format analog (S10).

kmcp emits one result in several formats (KMCP profile / CAMI /
MetaPhlAn / binning, `kmcp/cmd/profile.go:2882,3014,2955,2612`).  The
dedup analogs, one per reference format:

  - cluster_summary: one row per duplicate cluster (the profile table).
  - dedup_manifest: one row per clip with a keep/drop decision (the
    CAMI-style roster — every item, its assignment, survival).
  - cluster_sizes_histogram: distribution report (index-density analog).
  - binning_export: one row per MEMBER with its cluster lineage and
    per-member support score (the `profile.go:2612` binning table
    analog: read -> ref mapping with the match statistic).

All are plain DataFrames; ``write_reports`` materializes each under a
directory (parquet + a CSV copy for human eyes).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F


def cluster_summary(clusters: DataFrame, verified: DataFrame) -> DataFrame:
    """Per-cluster stats: size, canonical member, pair-score aggregates."""
    members = clusters.filter(F.col("cluster_size") > 1)
    canon = members.filter(F.col("is_canonical")).select(
        "cluster_id", F.col("clip_id").alias("canonical_clip")
    )
    edge_stats = (
        verified.join(
            members.select(F.col("clip_id").alias("a"), "cluster_id"), "a"
        )
        .groupBy("cluster_id")
        .agg(
            F.round(F.avg("jaccard"), 4).alias("mean_jaccard"),
            F.round(F.min("containment"), 4).alias("min_containment"),
            F.round(F.avg("similarity_pct"), 2).alias("mean_similarity_pct"),
            F.count("*").alias("n_verified_edges"),
        )
    )
    sizes = members.groupBy("cluster_id").agg(F.max("cluster_size").alias("cluster_size"))
    return (
        sizes.join(canon, "cluster_id")
        .join(edge_stats, "cluster_id", "left")
        .orderBy(F.desc("cluster_size"), "cluster_id")
    )


def dedup_manifest(clusters: DataFrame) -> DataFrame:
    """Keep/drop decision per clip: keep the canonical member of each
    cluster (singletons are their own canonical — kept)."""
    return clusters.select(
        "clip_id",
        "cluster_id",
        "cluster_size",
        F.col("is_canonical").alias("keep"),
    )


def cluster_sizes_histogram(clusters: DataFrame) -> DataFrame:
    return (
        clusters.groupBy("cluster_size")
        .agg(F.countDistinct("cluster_id").alias("n_clusters"))
        .orderBy("cluster_size")
    )


def binning_export(clusters: DataFrame, verified: DataFrame) -> DataFrame:
    """Per-member binning rows (the `kmcp/cmd/profile.go:2612` binning
    format analog): (clip_id, cluster_id, canonical_clip, is_canonical,
    member_score) for every member of a multi-member cluster, where
    member_score is the member's best verified-edge similarity into its
    cluster (the per-read match-statistic column of the reference's
    binning table; canonical members with no outgoing edge row still
    appear, scored by their incoming edges)."""
    members = clusters.filter(F.col("cluster_size") > 1)
    canon = members.filter(F.col("is_canonical")).select(
        "cluster_id", F.col("clip_id").alias("canonical_clip")
    )
    # undirected incident edges per member, restricted to edges whose
    # BOTH endpoints share the member's cluster: a strong verified edge
    # to another cluster (e.g. one dropped by weak-edge pruning before
    # CC) must not inflate the member's support for its own cluster —
    # the reference's binning statistic is per assigned target
    labels = clusters.select("clip_id", "cluster_id")
    la = labels.withColumnRenamed("clip_id", "a").withColumnRenamed("cluster_id", "_ca")
    lb = labels.withColumnRenamed("clip_id", "b").withColumnRenamed("cluster_id", "_cb")
    intra = (
        verified.join(la, "a")
        .join(lb, "b")
        .filter(F.col("_ca") == F.col("_cb"))
    )
    edges = intra.select(
        F.col("a").alias("clip_id"), F.col("similarity_pct").alias("_s")
    ).unionByName(
        intra.select(F.col("b").alias("clip_id"), F.col("similarity_pct").alias("_s"))
    )
    support = edges.groupBy("clip_id").agg(F.max("_s").alias("member_score"))
    return (
        members.join(canon, "cluster_id")
        .join(support, "clip_id", "left")
        .select(
            "clip_id",
            "cluster_id",
            "canonical_clip",
            "is_canonical",
            F.round(F.coalesce("member_score", F.lit(0.0)), 3).alias("member_score"),
        )
        .orderBy("cluster_id", "clip_id")
    )


def write_reports(out_dir: str, clusters: DataFrame, verified: DataFrame) -> dict:
    """Materialize every report format; returns row counts."""
    reports = {
        "cluster_summary": cluster_summary(clusters, verified),
        "dedup_manifest": dedup_manifest(clusters),
        "cluster_sizes_histogram": cluster_sizes_histogram(clusters),
        "binning_export": binning_export(clusters, verified),
    }
    counts = {}
    for name, df in reports.items():
        path = os.path.join(out_dir, "reports", name)
        df.write.mode("overwrite").parquet(path)
        df.coalesce(1).write.mode("overwrite").option("header", True).csv(path + "_csv")
        counts[name] = df.count()
    return counts
