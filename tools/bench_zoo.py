"""Zoo-wide full-resolution inference benchmark (VERDICT round-2 item #3;
round-4: height-tiling ladder + one-current-row-per-model output).

Runs bench.py once per zoo model at 1224x1024 (the polarization resolution,
reference README.md:61-69), honest protocol, recording pairs/s per model.
Each model runs in a fresh subprocess (the relay pays a full remote compile
per model anyway — the persistent cache does not round-trip). The ladder
per model tries (batch, tiles) configs in order; tiles > 1 routes through
parallel/tiling.py (the HBM-capacity-bound heavy tail trades halo
recompute for batch headroom).

Output: docs/zoo_bench.jsonl is REWRITTEN with exactly one current row per
model (the append-only log self-contradicted across reruns — VERDICT r3
weak #6); per-run history goes to stdout only.
"""

import json
import os
import subprocess
import sys
import time

MODELS = [
    # (name, ladder of (batch, tiles) — first that succeeds wins; a
    # trailing 0-tile config is the untiled fallback)
    ("deepfuse", [(16, 0)]),
    ("densefuse", [(16, 0)]),
    ("vifnet", [(16, 0), (8, 0)]),
    ("ifcnn", [(16, 0), (8, 0)]),
    ("difnet", [(16, 0), (8, 0)]),
    ("pfnetv1", [(16, 0), (8, 0)]),
    ("pfnetv2", [(16, 0), (8, 0)]),
    ("dbnet", [(16, 0), (8, 0)]),
    ("pmgi", [(16, 0), (8, 0)]),
    ("sedrfuse", [(8, 0), (4, 0)]),
    # multi-scale heavy tail: two-phase tiling frees the decoder concat
    # working set -> larger batches should fit
    ("nestfuse", [(16, 4), (16, 2), (8, 2), (8, 0), (4, 0), (2, 0)]),
    ("rfnnest", [(16, 4), (16, 2), (8, 2), (4, 2), (4, 0), (2, 0), (1, 0)]),
    ("unfusion", [(16, 4), (8, 4), (8, 2), (4, 2), (4, 0), (2, 0), (1, 0)]),
    ("res2fusion", [(8, 4), (4, 4), (4, 2), (2, 2), (2, 0), (1, 0)]),
    ("mafusion", [(16, 4), (8, 4), (8, 2), (4, 2), (2, 0), (1, 0)]),
    ("myfusion", [(8, 0), (4, 0), (2, 0)]),
]

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "docs", "zoo_bench.jsonl")


def run_one(name, batch, tiles):
    env = dict(os.environ, BENCH_MODEL=name, BENCH_BATCH=str(batch),
               BENCH_ITERS="10", BENCH_TILES=str(tiles))
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


def load_current():
    """Last non-error row per model from the existing file (success beats
    an earlier error; later rows beat earlier ones)."""
    done = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            for ln in f:
                ln = ln.strip()
                if not ln:
                    continue
                rec = json.loads(ln)
                prev = done.get(rec["model"])
                if rec.get("pairs_per_sec") or prev is None:
                    done[rec["model"]] = rec
    return done


def write_all(done):
    order = [name for name, _ in MODELS]
    with open(OUT, "w") as f:
        for name in order:
            if name in done:
                f.write(json.dumps(done[name]) + "\n")
        for name in sorted(set(done) - set(order)):
            f.write(json.dumps(done[name]) + "\n")


def main():
    done = load_current()
    write_all(done)          # normalize even if nothing new runs

    only = sys.argv[1:]
    for name, ladder in MODELS:
        if only and name not in only:
            continue
        if name in done and done[name].get("pairs_per_sec") and not only:
            print(f"[skip] {name}: already recorded "
                  f"{done[name]['pairs_per_sec']} pairs/s", flush=True)
            continue
        def attempt(batch, tiles):
            tag = f"b{batch}" + (f" t{tiles}" if tiles else "")
            print(f"[run] {name} {tag} ...", flush=True)
            try:
                result, wall, err = run_one(name, batch, tiles)
                if result is None and err and "HTTP 500" in err:
                    # the relay's remote-compile helper fails
                    # stochastically on long compiles (queue-4: 8 of 10
                    # tiled legs); one retry before burning the rung
                    print(f"[retry] {name} {tag} (remote-compile 500)",
                          flush=True)
                    result, wall, err = run_one(name, batch, tiles)
            except subprocess.TimeoutExpired:
                result, wall, err = None, 1800.0, "timeout"
            if result is None:
                print(f"[fail] {name} {tag} (wall {wall:.0f}s):\n{err}",
                      flush=True)
                return None
            print(f"[ok]  {name} {tag}: {result['value']} pairs/s "
                  f"(wall {wall:.0f}s)", flush=True)
            return {"model": name, "batch": batch, "tiles": tiles,
                    "pairs_per_sec": result["value"],
                    "vs_baseline": result.get("vs_baseline"),
                    "wall_s": round(wall, 1)}

        rec = None
        for batch, tiles in ladder:
            rec = attempt(batch, tiles)
            if rec is not None:
                break
        # a tiled success is NOT automatically a win (halo recompute can
        # lose to the smaller untiled batch — unfusion b16 t4 measured
        # 6.06 vs b4 untiled 8.47): also run the first untiled rung and
        # keep the better of the two
        if rec is not None and rec["tiles"]:
            for batch, tiles in ladder:
                if not tiles:
                    alt = attempt(batch, tiles)
                    if alt is not None and (alt["pairs_per_sec"]
                                            > rec["pairs_per_sec"]):
                        rec = alt
                    break
        if rec is None:
            rec = {"model": name, "batch": None, "pairs_per_sec": None,
                   "error": True}
        done[name] = rec
        write_all(done)

    print("\n| model | batch | tiles | pairs/s | vs north star |")
    print("|---|---|---|---|---|")
    for name, _ in MODELS:
        r = done.get(name)
        if r and r.get("pairs_per_sec"):
            print(f"| {name} | {r['batch']} | {r.get('tiles', 0)} | "
                  f"{r['pairs_per_sec']} | {r.get('vs_baseline')} |")
        else:
            print(f"| {name} | — | — | FAILED | — |")


if __name__ == "__main__":
    main()
