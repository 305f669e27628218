"""Apply the halo-in-weights (hiw) default flip from the queued TPU
measurements, in the unattended style of tools/r3_autoflip.py.

The round-4 queue (tools/r4_tpu_queue1.sh) benches the DeepFuse headline
with the C-major chain (current default) and the H-major halo-in-weights
chain (MMIF_CHAIN_HIW=1), and runs the TPU parity smoke
(tools/probe_hiw_e2e.py, 'hiw TPU parity OK' marker). The driver records
BENCH_r04 with a DEFAULT environment, so if hiw wins it must become the
default before round end even if nobody is at the keyboard: parse the
log, flip HIW_DEFAULT, re-run the CPU parity tests, commit — reverting
on any failure.

Usage: python tools/r4_autoflip.py [logpath]
"""

import json
import subprocess
import sys

LOG = "docs/r4_queue_results.log"
HIW = "multi_modal_image_fusion_tpu/ops/pallas/hiw_kernel.py"
STEPS = {
    "base": "headline bench (current default",
    "hiw": "headline bench with hiw chain",
}
PARITY_TESTS = ["tests/test_hiw.py"]


def parse(path):
    """Last-run bench value (pairs/s) per step + TPU parity marker."""
    with open(path, errors="replace") as f:
        lines = f.read().splitlines()
    start = 0
    for i, line in enumerate(lines):
        if line.startswith("===") and "health check" in line:
            start = i
    vals = {}
    cur = None
    parity_ok = False
    for line in lines[start:]:
        line = line.strip()
        if line.startswith("==="):
            cur = None
            for key, marker in STEPS.items():
                if marker in line:
                    cur = key
            continue
        if "hiw TPU parity OK" in line:
            parity_ok = True
        if cur and cur not in vals and line.startswith("{"):
            try:
                d = json.loads(line)
            except ValueError:
                continue
            if d.get("metric") and not d.get("error") \
                    and isinstance(d.get("value"), (int, float)) \
                    and d["value"] > 0:
                vals[cur] = float(d["value"])
    return vals, parity_ok


def main():
    log = sys.argv[1] if len(sys.argv) > 1 else LOG
    vals, parity_ok = parse(log)
    print(f"r4 autoflip: measured {vals}, parity_ok={parity_ok}")
    base, hiw = vals.get("base"), vals.get("hiw")
    if not parity_ok or base is None or hiw is None \
            or hiw <= base * 1.02:
        print("r4 autoflip: no flip (missing measurements, parity not "
              "proven, or below the 2% margin)")
        return 0

    with open(HIW) as f:
        src = f.read()
    if "HIW_DEFAULT = True" in src:
        print("r4 autoflip: already flipped")
        return 0
    assert src.count("HIW_DEFAULT = False") == 1
    with open(HIW, "w") as f:
        f.write(src.replace("HIW_DEFAULT = False", "HIW_DEFAULT = True"))

    try:
        r = subprocess.run([sys.executable, "-m", "pytest", "-q", "-x"]
                           + PARITY_TESTS, timeout=3300)
        failed = r.returncode != 0
    except Exception as e:
        print(f"r4 autoflip: parity run did not complete ({e!r})")
        failed = True
    if failed:
        print("r4 autoflip: parity tests FAILED, reverting")
        subprocess.run(["git", "checkout", "--", HIW], check=True)
        return 1

    gain = 100.0 * (hiw / base - 1.0)
    msg = (f"Default the halo-in-weights DeepFuse chain: "
           f"{base:.1f} -> {hiw:.1f} pairs/s measured\n\n"
           f"+{gain:.1f}% over the C-major chain at b16 1224x1024 bf16 "
           f"(decision data in docs/r4_queue_results.log: probe_hiw "
           f"per-shape rates, TPU parity smoke, both headline benches). "
           f"CPU parity suite re-run green after the flip.")
    subprocess.run(["git", "add", HIW], check=True)
    r = subprocess.run(["git", "commit", "-m", msg])
    print(f"r4 autoflip: done (commit rc={r.returncode})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
