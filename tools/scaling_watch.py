"""Watch for a healthy memory-bus window, then run the scaling bench.

This shared VM has hours-long windows where a co-tenant saturates the
memory bus (stream_gbps 0.1-0.3 vs >2 healthy); any pipeline timing
taken inside one is noise (see BENCH/BASELINE.md).  This watcher polls
the cheap bandwidth probe and launches the interleaved N-vs-4N scaling
bench (SPARK_GRAFT_ONLY_SCALING=1 bench.py) only when two consecutive
probes clear the bar.  Results append to _scaling_runs.jsonl; the
watcher exits once a run is window-valid with efficiency >= the target
(or after max attempts / iterations).

Usage: python tools/scaling_watch.py [target_eff] [max_bench_runs]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))
from host_probe import stream_gbps  # noqa: E402

OUT = os.path.join(REPO, "_scaling_runs.jsonl")
BAR_GBPS = 1.3


def log(*a):
    print(time.strftime("%H:%M:%S"), *a, flush=True)


def run_bench() -> dict | None:
    env = dict(os.environ, SPARK_GRAFT_ONLY_SCALING="1")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=4000, env=env, cwd=REPO,
    )
    if r.returncode != 0:
        log("bench failed:", r.stderr[-1000:])
        return None
    try:
        return json.loads(r.stdout.strip().splitlines()[-1])
    except Exception as ex:
        log("bench output unparseable:", ex, r.stdout[-500:])
        return None


def main() -> None:
    target = float(sys.argv[1]) if len(sys.argv) > 1 else 0.8
    max_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    runs = 0
    streak = 0
    for i in range(170):  # ~4h at 90s cadence
        g = round(stream_gbps(), 3)
        streak = streak + 1 if g >= BAR_GBPS else 0
        log(f"probe {i}: stream_gbps={g} streak={streak}")
        if streak >= 2:
            streak = 0
            runs += 1
            log(f"healthy window — launching scaling bench (run {runs}/{max_runs})")
            res = run_bench()
            if res is not None:
                with open(OUT, "a") as f:
                    f.write(json.dumps(res) + "\n")
                # bench.py diverts wall samples / per-round stage walls /
                # host probes to BENCH/bench_side.json and overwrites it
                # per run — archive each run's copy so the campaign
                # tables keep their per-round evidence
                side = os.path.join(REPO, "BENCH", "bench_side.json")
                if os.path.exists(side):
                    import shutil

                    shutil.copy(side, side.replace(".json", f"_{int(time.time())}.json"))
                eff = res.get("scaling_efficiency", -1)
                valid = res.get("scaling_window_valid", False)
                log(f"run {runs}: eff={eff} best_round="
                    f"{res.get('scaling_efficiency_best_round')} min_legs="
                    f"{res.get('scaling_efficiency_min_legs')} valid={valid}")
                if valid and eff >= target:
                    log("target met — done")
                    return
            if runs >= max_runs:
                log("max bench runs reached — done")
                return
        time.sleep(90)
    log("watch window exhausted — done")


if __name__ == "__main__":
    main()
