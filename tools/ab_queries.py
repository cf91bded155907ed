"""Interleaved A/B of the driver-query bench at two git revisions.

Round-4 verdict task #1: BENCH_r04's queries phase was ~1.4x slower in
aggregate than r3's artifact, with three outliers (dedup_minhash_lsh,
clips_recall_precision, dedup_semantic) at 1.7-1.9x.  The suspected cause
is the shared VM's co-tenant memory bus (the two artifacts were captured
in different windows), but r4 touched machinery those three share, so the
attribution must be measured, not inferred.  This tool runs the SAME
queries phase at both revisions, interleaved in a balanced A-B-B-A-B-A-A-B
order inside one window, with a host probe (sketch-kernel tasks/s +
streaming GB/s) between every leg.  Per-query medians per revision and
their ratios are written to BENCH/r5_ab_queries.json.

Usage: python tools/ab_queries.py [legs_per_rev] [sf_dir] [cores]
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
R3_ROOT = os.path.join(REPO, "_ab_r3")
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
CORES = int(sys.argv[3]) if len(sys.argv) > 3 else 32
LEGS_PER_REV = int(sys.argv[1]) if len(sys.argv) > 1 else 3

LEG_SNIPPET = (
    "import bench, json, sys\n"
    "out = bench.bench_queries({sf!r}, {cores})\n"
    "sys.stdout.write('ABRESULT ' + json.dumps(out) + '\\n')\n"
)


def log(*a):
    print(f"[ab {time.strftime('%H:%M:%S')}]", *a, file=sys.stderr, flush=True)


def probe() -> dict:
    try:
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "host_probe.py"), "8"],
            capture_output=True, text=True, timeout=300,
        )
        d = json.loads(r.stdout.strip().splitlines()[-1])
        return {"tasks_per_sec": d["tasks_per_sec"]["8"],
                "stream_gbps": d.get("stream_gbps", -1.0)}
    except Exception as ex:
        log("probe failed:", ex)
        return {"tasks_per_sec": -1.0, "stream_gbps": -1.0}


def leg(root: str, tag: str) -> dict:
    t0 = time.time()
    try:
        r = subprocess.run(
            [sys.executable, "-c", LEG_SNIPPET.format(sf=SF_DIR, cores=CORES)],
            cwd=root, capture_output=True, text=True, timeout=1800,
        )
    except (subprocess.TimeoutExpired, OSError) as ex:
        # a hung leg must not discard the completed ones
        log(f"{tag} leg ABORTED: {ex}")
        return {"tag": tag, "ok": False, "wall": round(time.time() - t0, 1),
                "error": str(ex)[:200]}
    wall = round(time.time() - t0, 1)
    qtimes = None
    for ln in r.stdout.splitlines():
        if ln.startswith("ABRESULT "):
            qtimes = json.loads(ln[len("ABRESULT "):])
    if qtimes is None:
        log(f"{tag} leg FAILED rc={r.returncode}; stderr tail:",
            r.stderr[-500:])
        return {"tag": tag, "ok": False, "wall": wall}
    total = round(sum(v for v in qtimes.values() if v > 0), 2)
    errs = [k for k, v in qtimes.items() if v < 0]
    log(f"{tag} leg done: total={total}s wall={wall}s errors={errs}")
    return {"tag": tag, "ok": True, "wall": wall, "total": total,
            "queries": qtimes, "errors": errs}


def median(xs):
    xs = sorted(xs)
    n = len(xs)
    if not n:
        return None
    return xs[n // 2] if n % 2 else round((xs[n // 2 - 1] + xs[n // 2]) / 2, 3)


def main() -> None:
    if not os.path.isdir(R3_ROOT):
        sys.exit(f"r3 worktree missing at {R3_ROOT}; "
                 "run: git worktree add _ab_r3 13d46e5")
    # balanced interleave: first-leg warmup effects and monotonic window
    # drift both cancel across the two revisions
    base = ["r3", "head", "head", "r3", "head", "r3", "r3", "head"]
    order, i = [], 0
    while sum(1 for t in order if t == "r3") < LEGS_PER_REV or \
            sum(1 for t in order if t == "head") < LEGS_PER_REV:
        order.append(base[i % len(base)])
        i += 1
    roots = {"r3": R3_ROOT, "head": REPO}

    record = {"sf_dir": SF_DIR, "cores": CORES, "order": order,
              "r3_rev": "13d46e5", "head_rev": subprocess.run(
                  ["git", "rev-parse", "--short", "HEAD"], cwd=REPO,
                  capture_output=True, text=True).stdout.strip(),
              "legs": [], "probes": [probe()]}
    out = os.path.join(REPO, "BENCH", "r5_ab_queries.json")
    log("start; probe:", record["probes"][0], "order:", order)
    for tag in order:
        record["legs"].append(leg(roots[tag], tag))
        record["probes"].append(probe())
        log("probe:", record["probes"][-1])
        with open(out, "w") as f:  # incremental: survive a later crash
            json.dump(record, f, indent=1)

    # per-query medians over OK legs, ratio head/r3 on the shared set
    per = {"r3": {}, "head": {}}
    for lg in record["legs"]:
        if lg.get("ok"):
            for q, v in lg["queries"].items():
                if v > 0:
                    per[lg["tag"]].setdefault(q, []).append(v)
    med = {tag: {q: median(v) for q, v in qs.items()} for tag, qs in per.items()}
    shared = sorted(set(med["r3"]) & set(med["head"]))
    ratios = {q: round(med["head"][q] / med["r3"][q], 3) for q in shared
              if med["r3"][q]}
    record["median_r3"] = med["r3"]
    record["median_head"] = med["head"]
    record["ratio_head_over_r3"] = ratios
    record["shared_total_r3"] = round(sum(med["r3"][q] for q in shared), 2)
    record["shared_total_head"] = round(sum(med["head"][q] for q in shared), 2)
    record["head_only_queries"] = sorted(set(med["head"]) - set(med["r3"]))
    with open(out, "w") as f:
        json.dump(record, f, indent=1)
    log("wrote", out)
    log("shared-set totals: r3", record["shared_total_r3"],
        "head", record["shared_total_head"])
    worst = sorted(ratios.items(), key=lambda kv: -kv[1])[:6]
    log("worst ratios:", worst)


if __name__ == "__main__":
    main()
