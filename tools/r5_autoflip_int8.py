"""Flip the bench headline to int8 from the round-5 queue measurements,
unattended (tools/r4_autoflip_int8.py successor with skip-config choice).

The queue runs TWO acceptance legs (full hiw-q set, and the r4 fallback
with dec1 kept bf16 via MMIF_INT8_SKIP=dec1) plus int8 headline benches.
Decision, all from the log's LAST runs:
  - pick the accuracy config: full set if its acceptance line is OK,
    else skip-dec1 if OK, else no flip. If skip-dec1 wins, re-add dec1
    to DEFAULT_INT8_SKIP in ops/quant.py (the r5 default emptied it on
    CPU calibration-coverage evidence, tools/probe_int8_fold.py).
  - the resident-hop A/B: if the res=0 bench beats res=1 by > 2%, the
    MMIF_HIW_INT8_RES default flips off in ops/pallas/hiw_int8.py.
  - INT8_DEFAULT flips True in bench.py when the best int8 headline
    beats the last bf16 headline by > 2% AND the chosen acceptance is
    OK.
CPU int8 parity tests re-run; revert on failure.

Usage: python tools/r5_autoflip_int8.py [logpath]
"""

import json
import re
import subprocess
import sys

LOG = "docs/r5_queue_results.log"
BENCH = "bench.py"
QUANT = "multi_modal_image_fusion_tpu/ops/quant.py"
HIW_INT8 = "multi_modal_image_fusion_tpu/ops/pallas/hiw_int8.py"
PARITY_TESTS = ["tests/test_hiw_int8.py", "tests/test_int8.py"]


def parse(path):
    with open(path, errors="replace") as f:
        lines = f.read().splitlines()
    bf16 = None
    int8 = {}       # key ('res1'|'res0') -> pairs/s
    accept = {}     # key ('full'|'skipdec1') -> ok
    cur = None
    for line in lines:
        line = line.strip()
        if line.startswith("==="):
            cur = None
            if re.search(r"headline bench post|headline bench \(current"
                         r"|bf16 headline", line):
                cur = "bf16"
            elif "int8 headline bench" in line:
                cur = "res0" if "res=0" in line else "res1"
            elif "int8 acceptance" in line:
                cur = ("accept_skipdec1" if "skip-dec1" in line
                       else "accept_full")
            continue
        if cur and cur.startswith("accept") and line.startswith("deepfuse"):
            accept[cur.split("_", 1)[1]] = line.rstrip().endswith("OK")
        if cur in ("bf16", "res0", "res1") and line.startswith("{"):
            try:
                d = json.loads(line)
            except ValueError:
                continue
            if d.get("metric") and isinstance(d.get("value"), (int, float)) \
                    and d["value"] > 0:
                if cur == "bf16":
                    bf16 = float(d["value"])
                else:
                    int8[cur] = float(d["value"])
    return bf16, int8, accept


def edit(path, pattern, repl):
    with open(path) as f:
        src = f.read()
    new, n = re.subn(pattern, repl, src, count=1)
    if n != 1 or new == src:
        return False
    with open(path, "w") as f:
        f.write(new)
    return True


def main():
    log = sys.argv[1] if len(sys.argv) > 1 else LOG
    bf16, int8, accept = parse(log)
    print(f"r5 autoflip_int8: bf16={bf16} int8={int8} accept={accept}")

    changed = []
    if accept.get("full"):
        cfg = "full"
    elif accept.get("skipdec1"):
        cfg = "skipdec1"
        if edit(QUANT, r"DEFAULT_INT8_SKIP = \{\}",
                'DEFAULT_INT8_SKIP = {"deepfuse": ("dec1",)}'):
            changed.append(QUANT)
            print("r5 autoflip_int8: TPU acceptance chose skip-dec1, "
                  "re-added to DEFAULT_INT8_SKIP")
    else:
        print("r5 autoflip_int8: no acceptance-passing config, no flip")
        return 0

    # resident-hop A/B (both benches ran under the chosen accuracy cfg)
    r1, r0 = int8.get("res1"), int8.get("res0")
    if r1 and r0 and r0 > r1 * 1.02:
        if edit(HIW_INT8, r'MMIF_HIW_INT8_RES", "1"',
                'MMIF_HIW_INT8_RES", "0"'):
            changed.append(HIW_INT8)
            print(f"r5 autoflip_int8: res=0 faster ({r0} vs {r1}), "
                  "resident hop default off")
    best = max(v for v in (r1, r0) if v) if (r1 or r0) else None

    if best and bf16 and best > bf16 * 1.02:
        if edit(BENCH, r"INT8_DEFAULT = False", "INT8_DEFAULT = True"):
            changed.append(BENCH)
            print(f"r5 autoflip_int8: headline flips int8 "
                  f"({bf16} -> {best} pairs/s)")
    else:
        print(f"r5 autoflip_int8: margin not met (bf16={bf16} "
              f"best_int8={best}), headline stays bf16")
    if not changed:
        print("r5 autoflip_int8: nothing to change")
        return 0

    try:
        r = subprocess.run([sys.executable, "-m", "pytest", "-q", "-x",
                            "-m", ""] + PARITY_TESTS, timeout=3300)
        failed = r.returncode != 0
    except Exception as e:
        print(f"r5 autoflip_int8: parity run did not complete ({e!r})")
        failed = True
    if failed:
        print("r5 autoflip_int8: parity tests FAILED, reverting")
        subprocess.run(["git", "checkout", "--"] + changed, check=True)
        return 1

    msg = (f"int8 headline decision from the r5 TPU queue\n\n"
           f"acceptance cfg={cfg} (CALIB=8 calibration pairs), benches "
           f"res1={r1} res0={r0} vs bf16={bf16} pairs/s "
           f"(docs/r5_queue_results.log). CPU int8 parity suite green.")
    subprocess.run(["git", "add"] + changed, check=True)
    r = subprocess.run(["git", "commit", "-m", msg])
    print(f"r5 autoflip_int8: done (commit rc={r.returncode})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
