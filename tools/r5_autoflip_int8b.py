"""Grid-aware int8 flip (queue 4c): pick the fastest ACCEPTED
(skip x residency) combo from all int8 legs in the round-5 queue log.

Queue 4 only ran acceptance under the r5 residency default
(MMIF_HIW_INT8_RES=1) and its full-set leg failed on TPU at dQabf
5.37e-3 — the resident inter-layer requantization was never isolated.
Queue 4c adds the res=0 acceptance legs and the skip-dec1 benches; this
script re-decides from the FULL grid, superseding (and if needed
reverting) tools/r5_autoflip_int8.py's residency-blind choice:

  - acceptance per (skip, res) combo: last `deepfuse ... OK` line under
    that section header wins.
  - bench per combo (pairs/s) where measured; bf16 headline for margin.
  - chosen = accepted combo with the highest measured bench.
    DEFAULT_INT8_SKIP / MMIF_HIW_INT8_RES default / bench.py
    INT8_DEFAULT are all set to match (INT8_DEFAULT only when the combo
    beats bf16 by > 2%).
CPU int8 parity tests re-run; revert on failure.

Usage: python tools/r5_autoflip_int8b.py [logpath]
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

SECTIONS = [
    # (regex on the === header line, kind, key)
    (r"int8 acceptance: deepfuse full hiw-q set", "accept", ("full", "res1")),
    (r"int8 acceptance: deepfuse skip-dec1 fallback", "accept",
     ("skipdec1", "res1")),
    (r"int8 acceptance grid: full set res=0", "accept", ("full", "res0")),
    (r"int8 acceptance grid: skip-dec1 res=0", "accept",
     ("skipdec1", "res0")),
    (r"int8 headline bench \(hiw-q chain, res=1\)", "bench",
     ("full", "res1")),
    (r"int8 headline bench \(hiw-q chain, res=0\)", "bench",
     ("full", "res0")),
    (r"int8 bench grid: skip-dec1 res=1", "bench", ("skipdec1", "res1")),
    (r"int8 bench grid: skip-dec1 res=0", "bench", ("skipdec1", "res0")),
    (r"headline bench post|headline bench \(current|bf16 headline", "bench",
     "bf16"),
]


def parse(path):
    accept, bench = {}, {}
    cur = None
    with open(path, errors="replace") as f:
        for line in f:
            line = line.strip()
            if line.startswith("==="):
                cur = None
                for pat, kind, key in SECTIONS:
                    if re.search(pat, line):
                        cur = (kind, key)
                        break
                continue
            if cur is None:
                continue
            kind, key = cur
            if kind == "accept" and line.startswith("deepfuse"):
                accept[key] = line.rstrip().endswith("OK")
            elif kind == "bench" and line.startswith("{"):
                try:
                    d = json.loads(line)
                except ValueError:
                    continue
                if isinstance(d.get("value"), (int, float)) and d["value"] > 0:
                    bench[key] = float(d["value"])
    return accept, bench


def ensure(path, want_pat, other_pat, repl):
    """Set the file to the `repl` state: no-op if want_pat already
    present, else rewrite other_pat -> repl. Returns True on change."""
    with open(path) as f:
        src = f.read()
    if re.search(want_pat, src):
        return False
    new, n = re.subn(other_pat, repl, src, count=1)
    if n != 1:
        raise RuntimeError(f"{path}: neither state matched")
    with open(path, "w") as f:
        f.write(new)
    return True


def main():
    log = sys.argv[1] if len(sys.argv) > 1 else LOG
    accept, bench = parse(log)
    print(f"r5 autoflip_int8b: accept={accept}")
    print(f"r5 autoflip_int8b: bench={bench}")

    bf16 = bench.get("bf16")
    # margin proxy: a combo without its own bench leg (the skip-dec1
    # benches were dropped for queue time) borrows the full-set bench at
    # MATCHING residency — skip-dec1 only moves one of six legs to bf16,
    # and the driver re-measures bench.py at round end so the recorded
    # headline is the real number either way.
    def bench_of(k):
        if k in bench:
            return bench[k]
        proxy = ("full", k[1])
        return bench.get(proxy)

    cands = [(bench_of(k), k) for k, ok in accept.items()
             if ok and bench_of(k) is not None]
    if not cands:
        ok_only = [k for k, ok in accept.items() if ok]
        print(f"r5 autoflip_int8b: no accepted+benched combo "
              f"(accepted: {ok_only}) — ensuring headline stays bf16")
        changed = []
        if ensure(BENCH, r"INT8_DEFAULT = False", r"INT8_DEFAULT = True",
                  "INT8_DEFAULT = False"):
            changed.append(BENCH)
        if changed:
            subprocess.run(["git", "add"] + changed, check=True)
            subprocess.run(["git", "commit", "-m",
                            "int8 headline stays bf16: no combo passed "
                            "TPU acceptance (queue 4/4c grid)"])
        return 0

    # tie-break toward the full set (faster, no bf16 leg) when the
    # proxy gives equal numbers
    best, _, (skip, res) = max(
        (v, 1 if k[0] == "full" else 0, k) for v, k in cands)
    print(f"r5 autoflip_int8b: best accepted combo ({skip}, {res}) "
          f"at {best} pairs/s (bf16={bf16})")

    changed = []
    # skip config
    if skip == "skipdec1":
        if ensure(QUANT,
                  r'DEFAULT_INT8_SKIP = \{"deepfuse": \("dec1",\)\}',
                  r"DEFAULT_INT8_SKIP = \{\}",
                  'DEFAULT_INT8_SKIP = {"deepfuse": ("dec1",)}'):
            changed.append(QUANT)
    else:
        if ensure(QUANT, r"DEFAULT_INT8_SKIP = \{\}",
                  r'DEFAULT_INT8_SKIP = \{"deepfuse": \("dec1",\)\}',
                  "DEFAULT_INT8_SKIP = {}"):
            changed.append(QUANT)
    # residency default
    if res == "res0":
        if ensure(HIW_INT8, r'MMIF_HIW_INT8_RES", "0"',
                  r'MMIF_HIW_INT8_RES", "1"', 'MMIF_HIW_INT8_RES", "0"'):
            changed.append(HIW_INT8)
    else:
        if ensure(HIW_INT8, r'MMIF_HIW_INT8_RES", "1"',
                  r'MMIF_HIW_INT8_RES", "0"', 'MMIF_HIW_INT8_RES", "1"'):
            changed.append(HIW_INT8)
    # headline
    if bf16 and best > bf16 * 1.02:
        if ensure(BENCH, r"INT8_DEFAULT = True", r"INT8_DEFAULT = False",
                  "INT8_DEFAULT = True"):
            changed.append(BENCH)
            print(f"r5 autoflip_int8b: headline flips int8 "
                  f"({bf16} -> {best} pairs/s)")
    else:
        if ensure(BENCH, r"INT8_DEFAULT = False", r"INT8_DEFAULT = True",
                  "INT8_DEFAULT = False"):
            changed.append(BENCH)
        print(f"r5 autoflip_int8b: margin not met (bf16={bf16} "
              f"best={best}), headline stays bf16")
    if not changed:
        print("r5 autoflip_int8b: state already matches the grid verdict")
        return 0

    try:
        r = subprocess.run([sys.executable, "-m", "pytest", "-q", "-x",
                            "-m", ""] + PARITY_TESTS, timeout=3300)
        failed = r.returncode != 0
    except Exception as e:
        print(f"r5 autoflip_int8b: parity run did not complete ({e!r})")
        failed = True
    if failed:
        print("r5 autoflip_int8b: parity tests FAILED, reverting")
        subprocess.run(["git", "checkout", "--"] + changed, check=True)
        return 1

    msg = (f"int8 grid decision: ({skip}, {res}) from the queue-4/4c "
           f"acceptance x residency sweep\n\n"
           f"accept={ {k: v for k, v in accept.items()} } "
           f"bench={ {k: v for k, v in bench.items()} } "
           f"(docs/r5_queue_results.log). CPU int8 parity suite green.")
    subprocess.run(["git", "add"] + changed, check=True)
    r = subprocess.run(["git", "commit", "-m", msg])
    print(f"r5 autoflip_int8b: done (commit rc={r.returncode})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
