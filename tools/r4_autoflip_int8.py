"""Flip the bench headline to int8 from the queued TPU measurements,
unattended (tools/r4_autoflip.py style).

Flip rule, all from the queue log's LAST runs:
  - the deepfuse acceptance line reports OK (SSIM/Qabf <= 1e-3 vs bf16
    on reference imagery — the BASELINE.json accuracy contract), and
  - the int8 headline leg ('hiw-q chain' step) beats the bf16 headline
    ('headline bench post g-table', falling back to any prior default
    headline) by > 2%.
Then INT8_DEFAULT flips True in bench.py, the CPU int8 parity tests
re-run, commit — revert on failure.

Usage: python tools/r4_autoflip_int8.py [logpath]
"""

import json
import re
import subprocess
import sys

LOG = "docs/r4_queue_results.log"
BENCH = "bench.py"
PARITY_TESTS = ["tests/test_hiw_int8.py"]


def parse(path):
    with open(path, errors="replace") as f:
        lines = f.read().splitlines()
    bf16 = int8 = None
    accept_ok = False
    cur = None
    for line in lines:
        line = line.strip()
        if line.startswith("==="):
            cur = None
            if "headline bench post g-table" in line \
                    or "headline bench post dec g-table" in line \
                    or "headline bench (current default" in line \
                    or "headline bench with hiw chain" in line:
                cur = "bf16"
            elif "int8 headline bench (hiw-q chain" in line:
                cur = "int8"
            elif "int8 acceptance" in line:
                cur = "accept"
            continue
        if cur == "accept" and line.startswith("deepfuse"):
            accept_ok = line.rstrip().endswith("OK")
        if cur in ("bf16", "int8") and line.startswith("{"):
            try:
                d = json.loads(line)
            except ValueError:
                continue
            if d.get("metric") and isinstance(d.get("value"), (int, float)) \
                    and d["value"] > 0:
                if cur == "bf16":
                    bf16 = float(d["value"])  # last one wins
                else:
                    int8 = float(d["value"])
    return bf16, int8, accept_ok


def main():
    log = sys.argv[1] if len(sys.argv) > 1 else LOG
    bf16, int8, accept_ok = parse(log)
    print(f"r4 autoflip_int8: bf16={bf16} int8={int8} accept={accept_ok}")
    if not accept_ok or bf16 is None or int8 is None \
            or int8 <= bf16 * 1.02:
        print("r4 autoflip_int8: no flip (acceptance or margin not met)")
        return 0

    with open(BENCH) as f:
        src = f.read()
    if "INT8_DEFAULT = True" in src:
        print("r4 autoflip_int8: already flipped")
        return 0
    new, n = re.subn(r"INT8_DEFAULT = False", "INT8_DEFAULT = True", src,
                     count=1)
    assert n == 1
    with open(BENCH, "w") as f:
        f.write(new)

    try:
        r = subprocess.run([sys.executable, "-m", "pytest", "-q", "-x", "-m", ""]
                           + PARITY_TESTS, timeout=3300)
        failed = r.returncode != 0
    except Exception as e:
        print(f"r4 autoflip_int8: parity run did not complete ({e!r})")
        failed = True
    if failed:
        print("r4 autoflip_int8: parity tests FAILED, reverting")
        subprocess.run(["git", "checkout", "--", BENCH], check=True)
        return 1

    msg = (f"Default the headline bench to int8: {bf16:.1f} -> "
           f"{int8:.1f} pairs/s measured\n\n"
           f"hiw-q chain (ops/pallas/hiw_int8.py) at b16 1224x1024; "
           f"acceptance harness OK (SSIM/Qabf <= 1e-3 vs bf16, the "
           f"BASELINE.json accuracy contract). Decision data in "
           f"docs/r4_queue_results.log; CPU int8 parity suite green "
           f"after the flip.")
    subprocess.run(["git", "add", BENCH], check=True)
    r = subprocess.run(["git", "commit", "-m", msg])
    print(f"r4 autoflip_int8: done (commit rc={r.returncode})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
