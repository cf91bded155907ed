"""Attribute the sketch stage's wall time: parquet scan (JVM) vs
Arrow JVM->python transfer vs python kernel, at a given core count.

Usage: python tools/sketch_probe.py CORES N_FILES
Reads the first N_FILES part files of _bench_corpus_16000 (500 rows each).
Prints one JSON line: {"cores": c, "rows": n, "scan_s": ..,
"arrow_s": .., "kernel_s": ..}.

Run once per core count in separate processes (fresh JVM each).
"""
from __future__ import annotations

import glob
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    cores = int(sys.argv[1])
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    files = sorted(glob.glob(os.path.join(REPO, "_bench_corpus_16000", "part-*.parquet")))[:n_files]
    # warm page cache so the scan term is bus/decompress, not disk
    for p in files:
        with open(p, "rb") as f:
            while f.read(1 << 24):
                pass

    from kmcp_spark.config import PipelineConfig, get_spark
    from kmcp_spark.operators.sketch import sketch_clips

    spark = get_spark(app=f"sketch_probe_{cores}", cores=cores, shuffle_partitions=max(cores, 8))
    clips = spark.read.parquet(*files)
    rows = clips.count()

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # warmup pass (spawn workers, JIT) on a slice
    sketch_clips(clips.sample(0.2, seed=1), PipelineConfig()).write.format("noop").mode("overwrite").save()

    t0 = time.time(); noop(clips.select("clip_id", "bytes", "sr_hz", "codec", "transcript")); scan_s = time.time() - t0

    import pandas as pd

    def passthrough(batches):
        for pdf in batches:
            yield pd.DataFrame({"n": [int(pdf["bytes"].str.len().sum())]})

    t0 = time.time()
    noop(clips.select("clip_id", "bytes", "sr_hz", "codec", "transcript")
         .mapInPandas(passthrough, schema="n bigint"))
    arrow_s = time.time() - t0

    t0 = time.time(); noop(sketch_clips(clips, PipelineConfig())); kernel_s = time.time() - t0

    print(json.dumps({"cores": cores, "rows": rows, "scan_s": round(scan_s, 2),
                      "arrow_s": round(arrow_s, 2), "kernel_s": round(kernel_s, 2)}))
    spark.stop()


if __name__ == "__main__":
    main()
