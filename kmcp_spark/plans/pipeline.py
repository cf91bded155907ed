"""End-to-end dedup pipeline: clips -> sketches -> buckets -> candidates
-> verified pairs -> clusters, with per-stage checkpoints + metrics.

Stage layout mirrors the reference's subcommand DAG
(compute → index → search → profile, SURVEY.md §3) with each stage a
durable checkpoint table keyed by the config fingerprint, so any stage
is resumable (north rule).  Metrics rows (stage, rows_in, rows_out,
wall_ms, fingerprint) are appended per stage — the resumability /
lineage bookkeeping analog of kmcp's `_info.txt` cache and search-log
stats (`kmcp/cmd/compute.go:450-458`, `kmcp/cmd/search.go:1011-1025`).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from kmcp_spark.config import PipelineConfig
from kmcp_spark.operators.cluster import (
    cluster_report,
    connected_components,
    prune_weak_edges,
    reassign_by_support,
)
from kmcp_spark.operators.lsh import band_buckets, bucket_stats, candidate_pairs
from kmcp_spark.operators.sketch import sketch_clips
from kmcp_spark.operators.verify import score_pairs, verify_pairs
from kmcp_spark.sources.tables import (
    checkpoint_valid,
    partition_lineage,
    read_checkpoint,
    write_checkpoint_data,
    write_checkpoint_marker,
)


@dataclass
class StageMetric:
    stage: str
    rows_out: int
    wall_ms: int
    resumed: bool


@dataclass
class PipelineResult:
    """Handles to the stage checkpoint tables.

    NOTE: these DataFrames are lazy readers over the checkpoint paths —
    a subsequent ``run()`` into the same ``out_dir`` with a *different*
    config fingerprint overwrites those paths and invalidates earlier
    handles.  Materialize (``.toPandas()``/``.count()``/re-write) before
    re-running with a new config.
    """

    clusters: DataFrame
    verified: DataFrame
    metrics: list[StageMetric] = field(default_factory=list)


class DedupPipeline:
    """Runs the staged plan; every stage skips itself when its checkpoint
    carries the current config fingerprint (resume-from-checkpoint)."""

    def __init__(self, spark: SparkSession, cfg: PipelineConfig, out_dir: str):
        import uuid

        self.spark = spark
        self.cfg = cfg
        self.out_dir = out_dir
        self.fp = cfg.fingerprint()
        # lineage.jsonl spans runs (append mode); the run id lets an
        # audit separate this run's records from a superseded run's at
        # the same path without relying on record order alone
        self.run_id = uuid.uuid4().hex[:8]
        self.metrics: list[StageMetric] = []
        os.makedirs(out_dir, exist_ok=True)

    def _stage(
        self,
        name: str,
        build,
        partition_by: list[str] | None = None,
        force: bool = False,
    ) -> DataFrame:
        path = os.path.join(self.out_dir, name)
        t0 = time.time()
        if not force and checkpoint_valid(path, self.fp):
            df = read_checkpoint(self.spark, path)
            self.metrics.append(StageMetric(name, -1, int((time.time() - t0) * 1000), True))
            return df
        df = build()
        write_checkpoint_data(df, path, partition_by)
        out = read_checkpoint(self.spark, path)
        # rows_out from parquet footers: a count() here was one whole
        # extra Spark job per stage (5 jobs/run of pure fixed latency).
        # The same footer walk yields the per-partition lineage records
        # (north rule: checkpoints carry per-partition lineage + metrics).
        files = partition_lineage(path)
        # iceberg checkpoints keep no local parquet files (the table's
        # own snapshot manifests are the lineage); fall back to one
        # count() job so stage metrics stay truthful instead of
        # silently recording rows_out=0
        n = sum(e["rows"] for e in files) if files else out.count()
        with open(os.path.join(self.out_dir, "lineage.jsonl"), "a") as f:
            f.write(
                json.dumps(
                    {
                        "stage": name,
                        "run_id": self.run_id,
                        "fingerprint": self.fp,
                        "n_files": len(files),
                        "rows_out": n,
                        "files": files,
                        "ts": time.time(),
                    }
                )
                + "\n"
            )
            f.flush()
            os.fsync(f.fileno())
        # the marker lands only AFTER the lineage record is durable, so
        # checkpoint_valid() => this stage's files are lineage-recorded
        # (a crash in between re-runs the stage; overwrite is idempotent)
        write_checkpoint_marker(path, self.fp)
        self.metrics.append(StageMetric(name, n, int((time.time() - t0) * 1000), False))
        return out

    def run(
        self, clips: DataFrame, force: bool = False, diagnostics: bool = False
    ) -> PipelineResult:
        from kmcp_spark.runtime import persistent_ids, unpersist_ids

        cfg = self.cfg
        # every stage output is flushed to parquet, so ANY block persisted
        # during the run (virtual band relation, CC round checkpoints) is
        # releasable once the stages complete — swept at the end so a
        # long-lived session keeps a flat cache footprint across runs
        ids_at_entry = persistent_ids(self.spark.sparkContext)

        # F4 minimum-query-length gate (kmcp drops queries shorter than
        # the k-mer size, `kmcp/cmd/util-db-search.go:778-786`): clips too
        # short to form a single audio shingle are excluded from dedup.
        # The predicate is a pushed-down parquet filter (no extra stage);
        # the gated count is recorded in the metrics file.
        if cfg.sketch.min_dur_ms > 0:
            clips = clips.filter(F.col("dur_ms") >= cfg.sketch.min_dur_ms)

        # exact-duplicate short-circuit (T0 / byte-identical): one JVM
        # hash-agg groups identical (bytes, transcript) rows; only one
        # representative per group flows through decode/sketch/LSH.  At
        # web scale exact dups are the dominant class — this removes
        # their decode cost AND keeps LSH bucket sizes bounded (a class
        # of 10^6 identical clips would otherwise pair-expand
        # quadratically; this is the degenerate case the max_bucket cap
        # would otherwise have to drop).
        def build_exact():
            # two independently-seeded xxhash64 passes = 128 bits of
            # content hash (birthday-safe at 10^12 rows) at ~10x the
            # throughput of md5 on the JVM
            w = Window.partitionBy("h1", "h2")
            return (
                clips.select(
                    "clip_id",
                    F.xxhash64(F.lit(1), "bytes", "transcript").alias("h1"),
                    F.xxhash64(F.lit(2), "bytes", "transcript").alias("h2"),
                )
                .withColumn("rep_id", F.min("clip_id").over(w))
                .select("clip_id", "rep_id")
            )

        exact = self._stage("exact_groups", build_exact, force=force)
        reps = exact.filter(F.col("clip_id") == F.col("rep_id")).select("clip_id")
        rep_clips = clips.join(reps, "clip_id", "left_semi")

        sketches = self._stage(
            "sketches", lambda: sketch_clips(rep_clips, cfg), force=force
        )

        # buckets is a VIRTUAL stage: a narrow JVM map (slice + xxhash64)
        # derived 1:1 from the sketches checkpoint.  It is deliberately
        # NOT persisted and NOT written: r1 paid a parquet round-trip,
        # r2 paid a MEMORY_AND_DISK materialization (measured 4 s of the
        # candidates stage at local[4]/32k — serializing the bands-fold
        # 1M-row relation), and at 10^12 input rows a cached 32x-exploded
        # band relation cannot fit ANY cluster's memory.  Each consumer
        # (size agg, pair join, escalation, diagnostics) instead re-runs
        # the narrow map over the column-pruned sketches scan
        # (ReadSchema struct<clip_id,minhash>) — cheap, parallel, and
        # the only shape that survives at scale.  No partitionBy
        # ("band_id") either: a partitioned write multiplies file count
        # by the band fan-out (observed 12x slowdown at local[32]).
        buckets = band_buckets(sketches, cfg.lsh.bands, cfg.lsh.rows_per_band)

        def build_pairs():
            pairs, oversized = candidate_pairs(buckets, cfg.lsh.max_bucket)
            n_over = oversized.count()
            if n_over:
                # no silent caps: record exactly what was not expanded
                with open(os.path.join(self.out_dir, "oversized_buckets.json"), "w") as f:
                    json.dump({"n_oversized_buckets": n_over, "max_bucket": cfg.lsh.max_bucket}, f)
            return pairs

        candidates = self._stage("candidates", build_pairs, force=force)

        def build_verified():
            scored = score_pairs(candidates, sketches, cfg)
            return verify_pairs(scored, clips, cfg)

        verified = self._stage("verified", build_verified, force=force)

        def build_clusters():
            # stage-3/stage-4 split of the reference profiler: weak-edge
            # pruning (MegaPath rule, `kmcp/cmd/profile.go:1357-1388`)
            # decides graph CONNECTIVITY so one borderline bridge cannot
            # over-merge two dense clusters; EM-style reassignment over
            # the UNPRUNED edges (`profile.go:2075-2117`) then decides
            # final MEMBERSHIP by dominant accumulated support
            edges = prune_weak_edges(verified, alpha=cfg.cc_prune_alpha)
            labels_rep = connected_components(
                edges,
                all_nodes=sketches.select("clip_id"),
                max_iters=cfg.cc_max_iters,
                checkpoint_every=cfg.cc_checkpoint_every,
            )
            if cfg.em_reassign_iters > 0:
                labels_rep = reassign_by_support(
                    labels_rep, verified, iters=cfg.em_reassign_iters
                )
            # expand representative labels back over their exact groups
            full = exact.join(
                labels_rep.withColumnRenamed("clip_id", "rep_id"), "rep_id"
            ).select("clip_id", "cluster_id")
            return cluster_report(full)

        clusters = self._stage("clusters", build_clusters, force=force)

        if diagnostics:
            # bucket-size histogram = `utils index-density` analog
            self._stage("bucket_histogram", lambda: bucket_stats(buckets), force=force)

        # sweep any blocks persisted during this run (e.g. the CC loop's
        # final label snapshot — superseded by the clusters checkpoint).
        # The untagged release_deferred() is the registry-side mirror:
        # it drops the deferred-unpersist entries (candidate_pairs' lsh
        # over_rel cache) so the registry holds no stale references and
        # non-pipeline consumers see the documented end-of-run sweep.
        from kmcp_spark.runtime import release_deferred

        release_deferred()
        unpersist_ids(
            self.spark.sparkContext,
            persistent_ids(self.spark.sparkContext) - ids_at_entry,
        )
        self._write_metrics()
        return PipelineResult(clusters=clusters, verified=verified, metrics=self.metrics)

    def _write_metrics(self) -> None:
        rows = [
            {
                "stage": m.stage,
                "rows_out": m.rows_out,
                "wall_ms": m.wall_ms,
                "resumed": m.resumed,
                "fingerprint": self.fp,
                "ts": time.time(),
            }
            for m in self.metrics
        ]
        with open(os.path.join(self.out_dir, "metrics.jsonl"), "a") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")


def dup_pairs_from_clusters(clusters: DataFrame) -> DataFrame:
    """clusters -> all intra-cluster pairs (a<b), for recall scoring."""
    m = clusters.filter(F.col("cluster_size") > 1).select("clip_id", "cluster_id")
    a = m.alias("x")
    b = m.alias("y")
    return (
        a.join(b, "cluster_id")
        .filter(F.col("x.clip_id") < F.col("y.clip_id"))
        .select(F.col("x.clip_id").alias("a"), F.col("y.clip_id").alias("b"))
    )
