"""Flip the multi-leg H-major zoo default from the queued TPU
measurements, unattended (tools/r4_autoflip.py style).

Parses the LAST probe_hiw_zoo record per model from the queue log. Flip
rule: every measured model has parity_ok; models measured slower than
0.98x go into HIW_MULTI_BLOCKLIST; if at least one model wins by >2%,
HIW_MULTI_DEFAULT flips True. CPU parity tests re-run, commit, revert on
failure.

Usage: python tools/r4_autoflip_multi.py [logpath]
"""

import json
import re
import subprocess
import sys

LOG = "docs/r4_queue_results.log"
HIW = "multi_modal_image_fusion_tpu/ops/pallas/hiw_kernel.py"
PARITY_TESTS = ["tests/test_hiw.py"]


def parse(path):
    recs = {}
    with open(path, errors="replace") as f:
        for line in f:
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                d = json.loads(line)
            except ValueError:
                continue
            if d.get("probe") == "hiw_zoo" and d.get("model"):
                recs[d["model"]] = d  # last record wins
    return recs


def main():
    log = sys.argv[1] if len(sys.argv) > 1 else LOG
    recs = parse(log)
    print(f"r4 autoflip_multi: {len(recs)} model records")
    if not recs:
        return 0
    winners, losers = [], []
    for name, d in recs.items():
        if d.get("error") or not d.get("parity_ok") \
                or "ms_on" not in d or "ms_off" not in d:
            print(f"  {name}: incomplete/failed/parity-fail -> no flip")
            return 0
        speedup = d["ms_off"] / d["ms_on"]
        print(f"  {name}: {d['pairs_off']} -> {d['pairs_on']} pairs/s "
              f"({speedup:.2f}x)")
        (winners if speedup > 1.02 else losers if speedup < 0.98
         else winners).append(name)
    if not any(recs[n]["ms_off"] / recs[n]["ms_on"] > 1.02
               for n in winners):
        print("r4 autoflip_multi: no model wins by >2%, no flip")
        return 0

    with open(HIW) as f:
        src = f.read()
    new = src
    if "HIW_MULTI_DEFAULT = False" in new:
        new = new.replace("HIW_MULTI_DEFAULT = False",
                          "HIW_MULTI_DEFAULT = True", 1)
    lit = ("HIW_MULTI_BLOCKLIST = ("
           + "".join(f"\"{n}\", " for n in sorted(losers)) + ")")
    new, n = re.subn(r"HIW_MULTI_BLOCKLIST = \([^)]*\)", lit, new, count=1)
    assert n == 1
    if new == src:
        print("r4 autoflip_multi: already flipped")
        return 0
    with open(HIW, "w") as f:
        f.write(new)

    try:
        r = subprocess.run([sys.executable, "-m", "pytest", "-q", "-x", "-m", ""]
                           + PARITY_TESTS, timeout=3300)
        failed = r.returncode != 0
    except Exception as e:
        print(f"r4 autoflip_multi: parity run did not complete ({e!r})")
        failed = True
    if failed:
        print("r4 autoflip_multi: parity tests FAILED, reverting")
        subprocess.run(["git", "checkout", "--", HIW], check=True)
        return 1

    gains = ", ".join(
        f"{n} {recs[n]['pairs_off']}->{recs[n]['pairs_on']}"
        for n in sorted(recs))
    msg = ("Default the multi-leg H-major zoo paths: measured TPU wins\n\n"
           f"tools/probe_hiw_zoo.py (docs/r4_queue_results.log): {gains} "
           f"pairs/s at b16 1224x1024 bf16, parity proven per model. "
           f"Blocklist: {sorted(losers) or 'none'}. CPU hiw parity suite "
           f"green after the flip.")
    subprocess.run(["git", "add", HIW], check=True)
    r = subprocess.run(["git", "commit", "-m", msg])
    print(f"r4 autoflip_multi: done (commit rc={r.returncode})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
