"""Zoo-wide full-resolution inference benchmark (VERDICT round-2 item #3).

Runs bench.py once per zoo model at 1224x1024 (the polarization resolution,
reference README.md:61-69), honest protocol, recording pairs/s per model.
Each model runs in a fresh subprocess (the relay pays a full remote compile
per model anyway — the persistent cache does not round-trip). On failure
(OOM at full res), retries with a smaller batch.

Output: one JSON line per model appended to docs/zoo_bench.jsonl and a
markdown table on stdout at the end.
"""

import json
import os
import subprocess
import sys
import time

MODELS = [
    # (name, batch ladder — first that succeeds wins)
    ("deepfuse", [16]),
    ("densefuse", [16]),
    ("vifnet", [16, 8]),
    ("ifcnn", [16, 8]),
    ("difnet", [16, 8]),
    ("pfnetv1", [16, 8]),
    ("pfnetv2", [16, 8]),
    ("dbnet", [16, 8]),
    ("pmgi", [16, 8]),
    ("sedrfuse", [8, 4]),
    ("nestfuse", [8, 4, 2]),
    ("rfnnest", [4, 2, 1]),
    ("unfusion", [4, 2, 1]),
    ("res2fusion", [2, 1]),
    ("mafusion", [8, 4, 2, 1]),
    ("myfusion", [8, 4, 2]),
]

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "docs", "zoo_bench.jsonl")


def run_one(name, batch):
    env = dict(os.environ, BENCH_MODEL=name, BENCH_BATCH=str(batch),
               BENCH_ITERS="10")
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py")],
        env=env, capture_output=True, text=True, timeout=1800)
    wall = time.time() - t0
    line = None
    for ln in proc.stdout.splitlines():
        ln = ln.strip()
        if ln.startswith("{") and "pairs_per_sec" in ln or \
                ln.startswith("{") and "fusion_throughput" in ln:
            line = ln
    if proc.returncode != 0 or line is None:
        err = (proc.stderr or proc.stdout).strip().splitlines()
        keep = [ln for ln in err if not ln.startswith("\x1b[2m")][-40:]
        return None, wall, "\n".join(keep)
    return json.loads(line), wall, None


def main():
    done = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            for ln in f:
                rec = json.loads(ln)
                done[rec["model"]] = rec

    only = sys.argv[1:]
    for name, batches in MODELS:
        if only and name not in only:
            continue
        if name in done and not only:
            print(f"[skip] {name}: already recorded "
                  f"{done[name]['pairs_per_sec']} pairs/s", flush=True)
            continue
        rec = None
        for batch in batches:
            print(f"[run] {name} b{batch} ...", flush=True)
            try:
                result, wall, err = run_one(name, batch)
            except subprocess.TimeoutExpired:
                result, wall, err = None, 1800.0, "timeout"
            if result is not None:
                rec = {"model": name, "batch": batch,
                       "pairs_per_sec": result["value"],
                       "vs_baseline": result.get("vs_baseline"),
                       "wall_s": round(wall, 1)}
                print(f"[ok]  {name} b{batch}: {result['value']} pairs/s "
                      f"(wall {wall:.0f}s)", flush=True)
                break
            print(f"[fail] {name} b{batch} (wall {wall:.0f}s):\n{err}",
                  flush=True)
        if rec is None:
            rec = {"model": name, "batch": None, "pairs_per_sec": None,
                   "error": True}
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        done[name] = rec

    print("\n| model | batch | pairs/s |")
    print("|---|---|---|")
    for name, _ in MODELS:
        r = done.get(name)
        if r and r.get("pairs_per_sec"):
            print(f"| {name} | {r['batch']} | {r['pairs_per_sec']} |")
        else:
            print(f"| {name} | — | FAILED |")


if __name__ == "__main__":
    main()
