"""Fold the measured per-shape g sweep (tools/probe_hiw_g.py) into
HIW_G_TABLE, unattended (tools/r4_autoflip.py style).

Parses the LAST probe_hiw_g sweep in the queue log, keeps per shape the
fastest g when it beats the current pick by >2%, rewrites the
HIW_G_TABLE literal in hiw_kernel.py, re-runs the CPU hiw parity tests,
commits — reverting on any failure.

Usage: python tools/r4_autoflip_g.py [logpath]
"""

import json
import re
import subprocess
import sys

LOG = "docs/r4_queue_results.log"
HIW = "multi_modal_image_fusion_tpu/ops/pallas/hiw_kernel.py"
PARITY_TESTS = ["tests/test_hiw.py"]


def parse(path):
    """{shape key: {g: ms}, ...} plus the picked-g ms per shape."""
    with open(path, errors="replace") as f:
        lines = f.read().splitlines()
    runs = {}
    picked = {}
    for line in lines:
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            d = json.loads(line)
        except ValueError:
            continue
        if d.get("probe") != "hiw_g" or "ms" not in d \
                or d.get("rows", 16) != 16:
            continue  # HIW_G_TABLE is the rows=16 pick; rows legs are
            # diagnostics for a (future) rows table
        runs.setdefault(d["shape"], {})[d["g"]] = d["ms"]
        if d.get("picked"):
            picked[d["shape"]] = d["ms"]
    return runs, picked


def main():
    log = sys.argv[1] if len(sys.argv) > 1 else LOG
    runs, picked = parse(log)
    if not runs:
        print("r4 autoflip_g: no sweep data in the log")
        return 0
    with open(HIW) as f:
        src = f.read()
    m = re.search(r"HIW_G_TABLE = (\{[^}]*\})", src)
    table = dict(eval(m.group(1)))  # current entries survive unmeasured
    changed = {}
    for shape, by_g in runs.items():
        best_g = min(by_g, key=by_g.get)
        base = picked.get(shape)
        if base is None or by_g[best_g] < base * 0.98:
            cin, cout, k = map(int, shape.split("-"))
            if table.get((cin, cout, k)) != best_g:
                table[(cin, cout, k)] = changed[(cin, cout, k)] = best_g
    print(f"r4 autoflip_g: sweep {runs}, changes {changed}")
    if not changed:
        print("r4 autoflip_g: picks already optimal, no flip")
        return 0
    lit = "HIW_G_TABLE = {\n" + "".join(
        f"    {k!r}: {g},\n" for k, g in sorted(table.items())) + "}"
    new, n = re.subn(r"HIW_G_TABLE = \{[^}]*\}", lit, src, count=1)
    assert n == 1
    if new == src:
        print("r4 autoflip_g: table already current")
        return 0
    with open(HIW, "w") as f:
        f.write(new)

    try:
        r = subprocess.run([sys.executable, "-m", "pytest", "-q", "-x", "-m", ""]
                           + PARITY_TESTS, timeout=3300)
        failed = r.returncode != 0
    except Exception as e:
        print(f"r4 autoflip_g: parity run did not complete ({e!r})")
        failed = True
    if failed:
        print("r4 autoflip_g: parity tests FAILED, reverting")
        subprocess.run(["git", "checkout", "--", HIW], check=True)
        return 1

    msg = ("Fold the measured per-shape hiw g sweep into HIW_G_TABLE\n\n"
           f"tools/probe_hiw_g.py sweep (docs/r4_queue_results.log): "
           f"{len(changed)} shape(s) beat the current pick by >2%: "
           + ", ".join(f"{k}->g{g}" for k, g in sorted(changed.items()))
           + ". CPU hiw parity suite green after the rewrite.")
    subprocess.run(["git", "add", HIW], check=True)
    r = subprocess.run(["git", "commit", "-m", msg])
    print(f"r4 autoflip_g: done (commit rc={r.returncode})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
