"""Cluster resolution: hash-min connected components (the `kmcp profile`
analog — its 4-stage filter + EM loop resolves multi-mapped queries into
final assignments, `kmcp/cmd/profile.go:761-2568`; our analog resolves
verified dup pairs into duplicate clusters).

Algorithm: iterative label propagation over the undirected pair graph.
    label(v) <- min(label(v), min over neighbors label(u))
implemented as a DataFrame join loop with
  - convergence check per iteration (count of changed labels == 0; the
    analog of the EM Δ-threshold stop, `kmcp/cmd/profile.go:2552-2568`),
  - lineage truncation via ``localCheckpoint`` every
    ``cc_checkpoint_every`` iterations (the analog of kmcp's multi-pass
    file boundaries) so plans stay O(1) deep,
  - O(log n) round bound in practice: each round halves the diameter of
    every component because labels jump two hops (v takes the min over
    its neighbors' *current* labels, which already absorbed their own
    neighborhoods last round).

Output: clusters(clip_id string, cluster_id string, cluster_size bigint,
                  is_canonical boolean)
where cluster_id is the lexicographically-smallest member id and the
canonical member is that clip (deterministic representative pick).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def connected_components(
    pairs: DataFrame,
    all_nodes: DataFrame | None = None,
    max_iters: int = 50,
    checkpoint_every: int = 5,
) -> DataFrame:
    """pairs(a,b) -> labels(clip_id, cluster_id) via hash-min propagation.

    ``all_nodes`` (one column ``clip_id``) adds singleton clusters for
    nodes with no edges; if None, only nodes appearing in pairs get rows.
    """
    edges = (
        pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .union(pairs.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .distinct()
    )
    edges = edges.localCheckpoint(eager=True)

    labels = (
        edges.select(F.col("src").alias("clip_id"))
        .distinct()
        .withColumn("cluster_id", F.col("clip_id"))
    )
    for it in range(max_iters):
        # candidate new label per node: min over own label and neighbor labels
        nbr_min = (
            edges.join(labels.withColumnRenamed("clip_id", "dst"), "dst")
            .groupBy("src")
            .agg(F.min("cluster_id").alias("nbr_label"))
            .withColumnRenamed("src", "clip_id")
        )
        new_labels = (
            labels.join(nbr_min, "clip_id", "left")
            .select(
                "clip_id",
                F.least(
                    F.col("cluster_id"), F.coalesce("nbr_label", F.col("cluster_id"))
                ).alias("cluster_id"),
                (F.col("nbr_label") < F.col("cluster_id")).alias("changed"),
            )
        )
        # materialize each round: the convergence count would otherwise
        # recompute the whole lineage, and lineage must stay O(1) deep
        # (checkpoint_every kept for API compat; every-round is strictly
        # safer and labels are one small row per node)
        new_labels = new_labels.localCheckpoint(eager=True)
        n_changed = new_labels.filter(F.col("changed")).limit(1).count()
        labels = new_labels.drop("changed")
        if n_changed == 0:
            break
    if all_nodes is not None:
        labels = (
            all_nodes.select("clip_id")
            .join(labels, "clip_id", "left")
            .select("clip_id", F.coalesce("cluster_id", F.col("clip_id")).alias("cluster_id"))
        )
    return labels


def cluster_report(labels: DataFrame) -> DataFrame:
    """labels -> clusters with size + deterministic canonical member.

    The canonical pick is the analog of kmcp profile's per-target
    reporting (representative + member stats, `kmcp/cmd/profile.go:2882`).
    """
    w = Window.partitionBy("cluster_id")
    return labels.select(
        "clip_id",
        "cluster_id",
        F.count("*").over(w).alias("cluster_size"),
        (F.col("clip_id") == F.min("clip_id").over(w)).alias("is_canonical"),
    )
