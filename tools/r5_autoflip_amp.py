"""Flip the training default to --amp bf16 from the queued convergence
leg (round 5, VERDICT #7), unattended.

Parses the LAST amp_convergence record from the queue log. Flip rule:
ok (test dSSIM <= 1e-3 after the full 12-epoch reference recipe) AND
bf16's final valid loss within 5% of f32's. Changes the argparse
default in cli/common.py, re-runs the train CLI tests, commits, reverts
on failure.

Usage: python tools/r5_autoflip_amp.py [logpath]
"""

import json
import subprocess
import sys

LOG = "docs/r5_queue_results.log"
COMMON = "multi_modal_image_fusion_tpu/cli/common.py"
GUARD_TESTS = ["tests/test_train.py", "tests/test_cli.py"]


def main():
    log = sys.argv[1] if len(sys.argv) > 1 else LOG
    rec = None
    with open(log, errors="replace") as f:
        for line in f:
            line = line.strip()
            if line.startswith("{"):
                try:
                    d = json.loads(line)
                except ValueError:
                    continue
                if d.get("probe") == "amp_convergence":
                    rec = d
    if not rec:
        print("r5 autoflip_amp: no record")
        return 0
    print(f"r5 autoflip_amp: {rec}")
    if not rec.get("ok"):
        print("r5 autoflip_amp: convergence gate failed, no flip")
        return 0
    vf, vb = rec.get("valid_loss_f32"), rec.get("valid_loss_bf16")
    if vf and vb and abs(vb - vf) > 0.05 * vf:
        print("r5 autoflip_amp: valid loss moved >5%, no flip")
        return 0

    with open(COMMON) as f:
        src = f.read()
    old = 'p.add_argument("--amp", default=None, choices=["bf16", "f32"],'
    new_line = ('p.add_argument("--amp", default="bf16", '
                'choices=["bf16", "f32"],')
    if old not in src:
        print("r5 autoflip_amp: already flipped or pattern missing")
        return 0
    new = src.replace(old, new_line, 1)
    with open(COMMON, "w") as f:
        f.write(new)

    try:
        r = subprocess.run([sys.executable, "-m", "pytest", "-q", "-x"]
                           + GUARD_TESTS, timeout=3300)
        failed = r.returncode != 0
    except Exception as e:
        print(f"r5 autoflip_amp: guard run did not complete ({e!r})")
        failed = True
    if failed:
        print("r5 autoflip_amp: guard tests FAILED, reverting")
        subprocess.run(["git", "checkout", "--", COMMON], check=True)
        return 1

    msg = ("Default training AMP to bf16 compute (measured +23% steps/s)\n\n"
           f"Convergence leg (tools/probe_amp_convergence.py, 12-epoch "
           f"reference recipe on roadscene samples): test dSSIM "
           f"{rec.get('d_ssim')}, valid-loss delta {rec.get('d_valid_loss')} "
           f"— within the 1e-3 budget. Throughput: 296.28 vs 240.35 "
           f"steps/s (docs/r4_queue_results.log queue 13). Master params, "
           f"loss and Adam stay f32 (train/trainer.py).")
    subprocess.run(["git", "add", COMMON], check=True)
    r = subprocess.run(["git", "commit", "-m", msg])
    print(f"r5 autoflip_amp: done (commit rc={r.returncode})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
