"""Apply the s2d default flip from the queued TPU measurements.

The round-3 measurement queue (tools/r3_tpu_queue.sh) benches the
DeepFuse headline in four configurations: current default, packed s2d
chain (MMIF_S2D=1), s2d with a raised chain-vmem budget, and s2d with
the packed enter/exit strip kernels (MMIF_S2D_IO=1). The driver records
BENCH_r03 by running `python bench.py` with a DEFAULT environment, so if
a measured variant wins, the default constants in ops/s2d.py must flip
before round end. This script makes that flip unattended: parse the
queue log, pick the winner (>2% over base, to stay clear of run-to-run
noise), rewrite the constants, re-run the CPU parity tests for the
flipped path, and commit — reverting the edit if parity fails.

Usage: python tools/r3_autoflip.py [logpath]   (default: the queue log)
"""

import json
import re
import subprocess
import sys

LOG = "docs/r3_queue_results.log"
S2D = "multi_modal_image_fusion_tpu/ops/s2d.py"
STEPS = {
    "base": "headline deepfuse b16 (current default",
    "s2d": "headline deepfuse b16 with s2d packed chain",
    "budget": "s2d with raised vmem budget",
    "io": "s2d with packed enter/exit kernels",
}
PARITY_TESTS = [
    "tests/test_s2d.py",
    "tests/test_s2d_io.py",
    "tests/test_pallas.py::test_deepfuse_s2d_chain_parity",
]


def parse(path):
    """First healthy bench value (pairs/s) per queue step, + io parity.

    The queue log is appended (`tee -a`) across re-runs, so only the
    LAST run — everything after the final "health check" step header —
    is parsed: mixing a stale base from a degraded earlier run with a
    fresh s2d number would make an apples-to-oranges flip decision."""
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
        if "s2d_io TPU parity OK" in line:
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


def edit(old, new):
    with open(S2D) as f:
        src = f.read()
    if new in src:
        return  # already applied (idempotent re-run)
    assert src.count(old) == 1, f"cannot locate {old!r} in {S2D}"
    with open(S2D, "w") as f:
        f.write(src.replace(old, new))


def decide(vals, parity_ok, margin=1.02):
    """Winning s2d variant name, or None when the default should stay.

    A variant must beat the measured base by `margin` (headline re-runs
    in round 3 repeated within ~1%, so 2% clears run-to-run noise); the
    packed-IO variant is only eligible once its TPU parity smoke passed
    (the u32 bit-pun has an endianness assumption verified on hardware).
    """
    base = vals.get("base")
    cands = {k: v for k, v in vals.items() if k != "base"}
    if not parity_ok:
        cands.pop("io", None)
    if base is None or not cands:
        return None
    winner = max(cands, key=cands.get)
    return winner if cands[winner] > base * margin else None


def main():
    log = sys.argv[1] if len(sys.argv) > 1 else LOG
    vals, parity_ok = parse(log)
    print(f"autoflip: measured {vals}, io parity_ok={parity_ok}")
    winner = decide(vals, parity_ok)
    if winner is None:
        print("autoflip: no winning variant (incomplete measurements or "
              "below the 2% margin) — default stays off")
        return 0
    base, best = vals["base"], vals[winner]

    print(f"autoflip: {winner}={best:.1f} beats base {base:.1f}, flipping")
    edit("S2D_DEFAULT = False", "S2D_DEFAULT = True")
    if winner == "budget":
        edit("S2D_VMEM_BUDGET = 55 * 1024 * 1024",
             "S2D_VMEM_BUDGET = 64 * 1024 * 1024")
    if winner == "io":
        edit("S2D_IO_DEFAULT = False", "S2D_IO_DEFAULT = True")

    # CPU parity gate before the new default can reach the driver's
    # bench. ANY failure mode — nonzero exit, pytest hang past the inner
    # timeout, or an unexpected exception — must revert the edit: the
    # queue is unattended and the driver commits stray files, so a
    # flipped-but-unverified default would otherwise ship. (The queue's
    # outer timeout is longer than the inner one so this revert path,
    # not a SIGTERM, fires first.)
    try:
        r = subprocess.run([sys.executable, "-m", "pytest", "-q", "-x"]
                           + PARITY_TESTS, timeout=3300)
        failed = r.returncode != 0
    except Exception as e:
        print(f"autoflip: parity run did not complete ({e!r})")
        failed = True
    if failed:
        print("autoflip: parity tests FAILED, reverting")
        subprocess.run(["git", "checkout", "--", S2D], check=True)
        return 1

    gain = 100.0 * (best / base - 1.0)
    msg = (f"Default the packed s2d DeepFuse chain: "
           f"{base:.1f} -> {best:.1f} pairs/s measured\n\n"
           f"Winning queue variant: {winner} "
           f"(all four configs in docs/r3_queue_results.log); "
           f"+{gain:.1f}% over the unpacked chain at b16 1224x1024 bf16. "
           f"CPU parity suite re-run green after the flip.")
    subprocess.run(["git", "add", S2D], check=True)
    r = subprocess.run(["git", "commit", "-m", msg])
    print(f"autoflip: done (commit rc={r.returncode})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
