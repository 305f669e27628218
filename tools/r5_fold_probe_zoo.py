"""Fold probe_hiw_zoo ON-path timings into docs/zoo_bench.jsonl.

The heavy-tail probe times both paths with the same honest protocol
(fresh-data fori_loop, scalar fetch) at the same per-model batches as
the zoo bench (MODEL_B mirrors the zoo rows). When the gated H-major
path wins and beats the recorded row, rewrite the row with the probe
number and a provenance note — the canonical bench.py re-bench
(tools/r5_tpu_queue5c.sh) overwrites these when it gets TPU time.

Usage: python tools/r5_fold_probe_zoo.py [logpath]
"""

import json
import os
import subprocess
import sys

LOG = "docs/r5_queue_results.log"
OUT = "docs/zoo_bench.jsonl"
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from probe_hiw_zoo import MODEL_B  # noqa: E402
from r5_autoflip_multi import parse  # noqa: E402


def main():
    log = sys.argv[1] if len(sys.argv) > 1 else LOG
    recs = parse(log)

    rows, order = {}, []
    with open(OUT) as f:
        for ln in f:
            r = json.loads(ln)
            rows[r["model"]] = r
            order.append(r["model"])

    changed = []
    for name, d in recs.items():
        if (d.get("error") or not d.get("parity_ok")
                or "pairs_on" not in d or "pairs_off" not in d
                or d["pairs_on"] <= d["pairs_off"]):
            continue
        cur = rows.get(name)
        if cur and cur.get("pairs_per_sec") \
                and cur["pairs_per_sec"] >= d["pairs_on"]:
            continue
        rows[name] = {
            "model": name, "batch": MODEL_B.get(name, 16), "tiles": 0,
            "pairs_per_sec": d["pairs_on"],
            "vs_baseline": round(d["pairs_on"] / 2000.0, 4),
            "wall_s": None,
            "note": "probe_hiw_zoo ON-path timing (same protocol/batch; "
                    "bench.py re-bench pending, r5 queue 5c)"}
        if name not in order:
            order.append(name)
        changed.append(f"{name} {cur['pairs_per_sec'] if cur else '—'}"
                       f"->{d['pairs_on']}")

    if not changed:
        print("fold_probe_zoo: nothing to fold")
        return 0
    with open(OUT, "w") as f:
        for name in order:
            f.write(json.dumps(rows[name]) + "\n")
    print(f"fold_probe_zoo: {', '.join(changed)} pairs/s")
    subprocess.run(["git", "add", OUT], check=True)
    subprocess.run(["git", "commit", "-m",
                    "Fold probe_hiw_zoo H-major wins into the zoo table: "
                    + ", ".join(changed)])
    return 0


if __name__ == "__main__":
    sys.exit(main())
