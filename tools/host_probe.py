"""Host health / scaling-ceiling probe (no Spark).

Runs the same numpy kernel mix as the sketch stage (PCM synth -> framed
rfft -> band energies -> quantize -> rolling hash) under multiprocessing
at several process counts and reports tasks/s per count plus the N->4N
efficiencies.  Two uses:

  1. pick the honest scaling pair: this shared VM's memory bandwidth
     caps 8->32 at ~0.52 and 2->8 at ~0.83 (measured r1) — a pipeline
     cannot evidence >=0.8 on a pair whose HARDWARE ceiling is below it;
  2. health gate for bench runs: if the probe is slower than the known
     healthy range, the host is degraded and timing samples from that
     window are noise (documented 2-3x co-tenant swings).

Usage: python tools/host_probe.py [procs ...]   (default: 1 2 4 8)
Prints one JSON line: {"tasks_per_sec": {...}, "eff": {...}}.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

import numpy as np


def _task(seed: int) -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from kmcp_spark.functions.audio import spectral_tokens
    from kmcp_spark.functions.hashing import hash_bytes_rolling

    rng = np.random.default_rng(seed)
    pcm = rng.standard_normal(16000)
    tok = spectral_tokens(pcm, 16000)
    h = hash_bytes_rolling(tok, 4) if len(tok) >= 4 else np.empty(0, np.uint64)
    return int(len(np.unique(h)))


def measure(procs: int, n_tasks: int = 96) -> float:
    with mp.Pool(procs) as pool:
        pool.map(_task, range(8))  # warmup: pages + imports
        t0 = time.time()
        pool.map(_task, range(1000, 1000 + n_tasks))
        dt = time.time() - t0
    return n_tasks / dt


def stream_gbps(size_gb: float = 0.2, reps: int = 5) -> float:
    """Streaming-multiply bandwidth — the signal the FFT probe misses.
    A co-tenant saturating the memory bus leaves cache-resident compute
    (the tasks/s figure) intact while multi-GB pipeline stages crawl;
    observed here: 0.11 GB/s during such a window vs >2 GB/s otherwise."""
    n = int(size_gb * 1e9 / 8)
    b = np.ones(n)
    t0 = time.time()
    for _ in range(reps):
        b * 1.000001
    return reps * size_gb * 2 / (time.time() - t0)


def main() -> None:
    counts = [int(x) for x in sys.argv[1:]] or [1, 2, 4, 8]
    tps = {c: round(measure(c), 2) for c in counts}
    eff = {}
    for lo in counts:
        hi = lo * 4
        if hi in tps:
            eff[f"{lo}->{hi}"] = round(tps[hi] / tps[lo] / 4.0, 3)
    print(
        json.dumps(
            {
                "tasks_per_sec": tps,
                "eff": eff,
                "stream_gbps": round(stream_gbps(), 3),
            }
        )
    )


if __name__ == "__main__":
    main()
