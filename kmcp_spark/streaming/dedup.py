"""Streaming incremental dedup: flag each arriving micro-batch against
a persistent sketch index (the streaming mapping of kmcp's
search-against-prebuilt-index model, `kmcp search` probing `kmcp index`
output — here the index is a parquet sketch table that grows by one
append per batch).

Two operators:

- ``streaming_exact_dedup``: stateful first-writer-wins pass-through —
  only the first clip with a given content hash is emitted.  Uses
  Spark's streaming ``dropDuplicates`` state store (RocksDB/HDFS-backed
  on a real cluster).  State is one tiny row per distinct content hash;
  for bounded state in an unbounded stream a production deployment sets
  a watermark + ``dropDuplicatesWithinWatermark`` — the all-history
  variant here matches the batch pipeline's semantics.
- ``streaming_neardup_flags``: ``foreachBatch`` micro-batch loop —
  sketch the batch, band-join its signatures against batch ∪ index,
  keep candidate pairs touching the batch, score + verify with the SAME
  ``score_pairs``/``verify_pairs`` operators the batch pipeline uses
  (full parity: FPR band floor, domain gates, LCS verification), append
  flags, append the batch's sketches to the index.  All state is
  external parquet — restart-safe via the stream checkpoint, nothing
  accumulates in executor memory.

Scale notes: per batch, candidate generation shuffles batch ∪ index
bands once; the index side re-bands per batch, which is the simple
variant — a production refinement persists the band table instead
(identical result, one narrow map saved per batch).  The clip archive
is re-read only for the transcripts of PLAUSIBLE pairs (column-pruned
scan; at scale the archive is partitioned by ingest date so file
pruning applies).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from kmcp_spark.config import PipelineConfig
from kmcp_spark.corpus import CLIPS_SCHEMA
from kmcp_spark.operators.lsh import band_buckets, candidate_pairs
from kmcp_spark.operators.sketch import sketch_clips
from kmcp_spark.operators.verify import score_pairs, verify_pairs


def streaming_exact_dedup(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Emit only the first clip per content hash (dual-seeded xxhash64,
    the exact-dup short-circuit of the batch pipeline as a stream)."""
    stream = (
        spark.readStream.schema(CLIPS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )
    hashed = stream.withColumns(
        {
            "h1": F.xxhash64(F.lit(1), "bytes", "transcript"),
            "h2": F.xxhash64(F.lit(2), "bytes", "transcript"),
        }
    )
    deduped = hashed.dropDuplicates(["h1", "h2"]).drop("h1", "h2")
    writer = (
        deduped.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.trigger(processingTime="10 seconds").start()


def _flag_batch(
    batch: DataFrame, index_dir: str, flags_dir: str, archive_dir: str, cfg: PipelineConfig
) -> None:
    """One micro-batch: sketch, probe index, verify, append flags+index."""
    spark = batch.sparkSession
    sk_new = sketch_clips(batch, cfg).localCheckpoint(eager=True)
    if os.path.exists(os.path.join(index_dir, "_SUCCESS")):
        sk_all = sk_new.unionByName(spark.read.parquet(index_dir))
    else:
        sk_all = sk_new
    buckets = band_buckets(sk_all, cfg.lsh.bands, cfg.lsh.rows_per_band)
    pairs, _ = candidate_pairs(buckets, cfg.lsh.max_bucket)
    # only pairs that touch this batch are new information — pairs
    # entirely within the index were flagged when their batch arrived
    nid = sk_new.select("clip_id")
    pairs_new = (
        pairs.join(nid.withColumnRenamed("clip_id", "a"), "a", "leftsemi")
        .unionByName(pairs.join(nid.withColumnRenamed("clip_id", "b"), "b", "leftsemi"))
        .dropDuplicates(["a", "b"])
    )
    scored = score_pairs(pairs_new, sk_all, cfg)
    # transcripts for the LCS stage come from the archive (all files the
    # stream has ever seen, incl. this batch) — column-pruned scan
    clips_hist = spark.read.schema(CLIPS_SCHEMA).parquet(archive_dir)
    flags = verify_pairs(scored, clips_hist, cfg)
    flags.write.mode("append").parquet(flags_dir)
    sk_new.write.mode("append").parquet(index_dir)


def streaming_neardup_flags(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    flags_dir: str,
    checkpoint_dir: str,
    cfg: PipelineConfig | None = None,
    available_now: bool = True,
):
    """Start the incremental near-dup flagging stream.

    ``input_dir`` is both the drop directory and the clip archive;
    ``index_dir`` accumulates one sketch row per clip ever seen;
    ``flags_dir`` accumulates verified dup pairs, each appearing exactly
    once (in the batch where its second member arrived)."""
    cfg = cfg or PipelineConfig()
    stream = (
        spark.readStream.schema(CLIPS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )
    writer = stream.writeStream.foreachBatch(
        lambda b, _id: _flag_batch(b, index_dir, flags_dir, input_dir, cfg)
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.trigger(processingTime="10 seconds").start()
