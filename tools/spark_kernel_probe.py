"""Spark-resident kernel scaling probe: the SAME mapInPandas sketch
kernel as the pipeline's hot stage, but over PCM synthesized inside the
tasks — no parquet scan, no Arrow input column, no shuffle.  Separates
"does the Spark job scale?" from "does the shared host's data plane
scale?": on a bus-saturated co-tenant host the end-to-end pipeline caps
at ~0.65 while this probe (and the no-Spark multiprocessing probe in
host_probe.py) stays near the CPU pair ceiling.

Usage: python tools/spark_kernel_probe.py [n_tasks] [cores ...]
Prints one JSON line with wall seconds per core count + efficiencies.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_leg(cores: int, n_tasks: int) -> float:
    from pyspark.sql import functions as F

    from kmcp_spark.config import get_spark

    spark = get_spark(app=f"kernel_probe_{cores}", cores=cores,
                      shuffle_partitions=max(cores, 8))

    def kernel(batches):
        import numpy as np
        import pandas as pd

        from kmcp_spark.functions.audio import spectral_tokens
        from kmcp_spark.functions.hashing import hash_bytes_rolling

        for pdf in batches:
            out = []
            for seed in pdf["id"].to_numpy():
                rng = np.random.default_rng(int(seed))
                pcm = rng.standard_normal(16000)
                tok = spectral_tokens(pcm, 16000)
                h = hash_bytes_rolling(tok, 4) if len(tok) >= 4 else np.empty(0, np.uint64)
                out.append(len(np.unique(h)))
            yield pd.DataFrame({"n": out})

    df = spark.range(n_tasks).repartition(max(cores * 4, 8)).mapInPandas(
        kernel, schema="n long"
    )
    df.agg(F.sum("n")).collect()  # warmup: workers + JIT + pages
    t0 = time.time()
    df.agg(F.sum("n")).collect()
    wall = time.time() - t0
    spark.stop()
    return wall


def main() -> None:
    n_tasks = int(sys.argv[1]) if len(sys.argv) > 1 else 768
    counts = [int(x) for x in sys.argv[2:]] or [1, 4]
    walls = {c: round(run_leg(c, n_tasks), 2) for c in counts}
    eff = {}
    for lo in counts:
        hi = lo * 4
        if hi in walls:
            eff[f"{lo}->{hi}"] = round(walls[lo] / walls[hi] / 4.0, 3)
    print(json.dumps({"n_tasks": n_tasks, "wall_sec": walls, "eff": eff}))


if __name__ == "__main__":
    main()
