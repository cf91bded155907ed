"""Incremental sketch ingest via Structured Streaming.

``readStream`` over a parquet drop-directory → the same Arrow-batched
sketch kernel (`kmcp_spark.operators.sketch.sketch_clips` works on
streaming DataFrames unchanged — mapInPandas is a stateless narrow op)
→ ``writeStream`` appending to the sketches table with a checkpoint
location for exactly-once file progress.

``Trigger.AvailableNow`` drains everything currently present and stops
— the batch-friendly mode this repo's tests use; a real service runs
the same code with a processing-time trigger.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from kmcp_spark.config import PipelineConfig
from kmcp_spark.corpus import CLIPS_SCHEMA
from kmcp_spark.operators.sketch import sketch_clips


def incremental_sketch_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    cfg: PipelineConfig | None = None,
    available_now: bool = True,
):
    """Start (and with available_now=True, run to completion) the
    incremental sketch stream.  Returns the StreamingQuery."""
    cfg = cfg or PipelineConfig()
    stream = (
        spark.readStream.schema(CLIPS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )
    sketches = sketch_clips(stream, cfg)
    writer = (
        sketches.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.trigger(processingTime="10 seconds").start()
