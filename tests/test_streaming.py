import os

import numpy as np

from kmcp_spark.config import PipelineConfig
from kmcp_spark.corpus import make_rows
from kmcp_spark.streaming.ingest import incremental_sketch_stream


def test_incremental_sketch_stream(spark, tmp_out):
    in_dir = os.path.join(tmp_out, "in")
    out_dir = os.path.join(tmp_out, "out")
    ckpt = os.path.join(tmp_out, "ckpt")
    os.makedirs(in_dir)

    from kmcp_spark.corpus import CLIPS_SCHEMA

    def drop(ids):
        pdf = make_rows(np.array(ids), min_dur_s=0.5, max_dur_s=0.8)
        spark.createDataFrame(
            pdf.drop(columns=["cluster_id", "transform"]), schema=CLIPS_SCHEMA
        ).coalesce(1).write.mode("append").parquet(in_dir)

    drop(range(0, 10))
    incremental_sketch_stream(spark, in_dir, out_dir, ckpt, PipelineConfig())
    n1 = spark.read.parquet(out_dir).count()
    assert n1 == 10

    # second micro-batch: only the new files are processed (exactly-once
    # progress from the stream checkpoint)
    drop(range(10, 15))
    incremental_sketch_stream(spark, in_dir, out_dir, ckpt, PipelineConfig())
    out = spark.read.parquet(out_dir)
    assert out.count() == 15
    assert out.select("clip_id").distinct().count() == 15
