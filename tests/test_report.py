import os

import numpy as np
from pyspark.sql import functions as F

from kmcp_spark.config import PipelineConfig
from kmcp_spark.corpus import generate_clips
from kmcp_spark.operators.report import write_reports
from kmcp_spark.plans.pipeline import DedupPipeline


def test_reports(spark, tmp_out):
    clips, _ = generate_clips(spark, 120, min_dur_s=0.5, max_dur_s=1.0)
    clips = clips.localCheckpoint(eager=True)
    res = DedupPipeline(spark, PipelineConfig(), os.path.join(tmp_out, "pipe")).run(clips)
    counts = write_reports(tmp_out, res.clusters, res.verified)
    assert counts["dedup_manifest"] == 120
    assert counts["cluster_summary"] >= 1
    summary = spark.read.parquet(os.path.join(tmp_out, "reports", "cluster_summary"))
    assert summary.filter(F.col("canonical_clip").isNull()).count() == 0
    manifest = spark.read.parquet(os.path.join(tmp_out, "reports", "dedup_manifest"))
    # keep-set: exactly one keeper per cluster
    per = manifest.groupBy("cluster_id").agg(F.sum(F.col("keep").cast("int")).alias("k"))
    assert per.filter(F.col("k") != 1).count() == 0
    hist = spark.read.parquet(os.path.join(tmp_out, "reports", "cluster_sizes_histogram"))
    total = hist.select(F.sum(F.col("cluster_size") * F.col("n_clusters"))).first()[0]
    assert total == 120
    # binning export: every multi-member cluster member appears once,
    # with its cluster's canonical and a non-negative support score
    binning = spark.read.parquet(os.path.join(tmp_out, "reports", "binning_export"))
    n_members = res.clusters.filter(F.col("cluster_size") > 1).count()
    assert counts["binning_export"] == n_members
    assert binning.filter(F.col("canonical_clip").isNull()).count() == 0
    assert binning.filter(F.col("member_score") < 0).count() == 0
    one_canon = binning.groupBy("cluster_id").agg(
        F.sum(F.col("is_canonical").cast("int")).alias("k")
    )
    assert one_canon.filter(F.col("k") != 1).count() == 0
