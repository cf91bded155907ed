"""Parallelism invariance: the north rule requires the pipeline to run
at N and 4N executors — which is only meaningful if the OUTPUT does not
depend on the parallelism.  Every kernel is written to be
partition-invariant (row-aligned chunking, exact integer math,
deterministic tie-breaks); this test drives the property end-to-end:
the same corpus through the full pipeline at two different input
partitionings AND shuffle-partition counts must yield exactly the same
cluster assignments."""

import pytest
from pyspark.sql import functions as F

from kmcp_spark.config import PipelineConfig
from kmcp_spark.corpus import generate_clips
from kmcp_spark.plans.pipeline import DedupPipeline


def _memberships(clusters) -> set[frozenset]:
    """Cluster contents as a canonical set of member-sets (cluster ids
    themselves are representative-based and already deterministic, but
    comparing member-sets makes the assertion label-agnostic)."""
    rows = clusters.select("clip_id", "cluster_id").collect()
    by_cluster: dict[str, set] = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], set()).add(r["clip_id"])
    return {frozenset(v) for v in by_cluster.values()}


@pytest.mark.parametrize("parts,shuffle", [(2, 4), (16, 32)])
def test_pipeline_output_invariant_to_parallelism(
    spark, tmp_path_factory, parts, shuffle, _shared={}
):
    clips, _ = generate_clips(spark, 160, min_dur_s=0.4, max_dur_s=0.9)
    clips = clips.repartition(parts).localCheckpoint(eager=True)
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(shuffle))
    try:
        out = str(tmp_path_factory.mktemp(f"par_{parts}"))
        res = DedupPipeline(spark, PipelineConfig(), out).run(clips)
        got = _memberships(res.clusters)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    n_multi = sum(1 for m in got if len(m) > 1)
    assert n_multi > 0  # the planted corpus must actually cluster
    if "memberships" in _shared:
        assert got == _shared["memberships"], (
            "cluster assignments changed with parallelism"
        )
    _shared["memberships"] = got
