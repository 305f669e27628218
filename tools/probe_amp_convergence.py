"""bf16-AMP convergence leg (round 5, VERDICT #7).

Queue-13 measured --amp bf16 at +23% train throughput (296.3 vs 240.4
steps/s); the guard test (test_amp_bf16_trains) proves it learns, but
the default flip needs convergence evidence at the reference recipe:
one full 12-epoch train on the bundled roadscene samples, f32 vs bf16,
comparing final valid loss and test SSIM (budget 1e-3 on SSIM).

Runs both trains + test CLI in-process, prints one JSON line for
tools/r5_autoflip_amp.py. Reference recipe: train.py:302-324 (losses,
Adam, MultiStepLR); the sample fallback stands in for the full
roadscene set (BASELINE.md parity protocol).

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
           python tools/probe_amp_convergence.py
env: EPOCHS (12), BS (16), CKPT_ROOT (/tmp/r5_amp)
"""

import json
import os
import re
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    from multi_modal_image_fusion_tpu.cli import test as test_cli
    from multi_modal_image_fusion_tpu.cli import train as train_cli

    epochs = os.environ.get("EPOCHS", "12")
    bs = os.environ.get("BS", "16")
    root = os.environ.get("CKPT_ROOT", "/tmp/r5_amp")
    shutil.rmtree(root, ignore_errors=True)

    rec = {"probe": "amp_convergence", "epochs": int(epochs)}
    for mode in ("f32", "bf16"):
        args = ["--data", "roadscene", "--ckpt_root", root,
                "--model", "deepfuse", "--bs", bs, "--epoch", epochs]
        if mode == "bf16":
            args += ["--amp", "bf16"]
        ckpt_dir = train_cli.main(args)
        log = open(os.path.join(ckpt_dir, "train.log")).read()
        valid = re.findall(r"valid loss: ([0-9.]+)", log)
        rec[f"valid_loss_{mode}"] = float(valid[-1]) if valid else None

        ssim, avg_t = test_cli.main([
            "--data", "roadscene", "--ckpt_root", root,
            "--ckpt", os.path.basename(ckpt_dir)])
        rec[f"test_ssim_{mode}"] = round(float(ssim), 6)
        rec[f"test_ms_{mode}"] = round(float(avg_t) * 1e3, 2)

    if rec.get("test_ssim_f32") is not None \
            and rec.get("test_ssim_bf16") is not None:
        rec["d_ssim"] = round(abs(rec["test_ssim_bf16"]
                                  - rec["test_ssim_f32"]), 6)
        rec["d_valid_loss"] = (
            None if None in (rec["valid_loss_f32"], rec["valid_loss_bf16"])
            else round(abs(rec["valid_loss_bf16"] - rec["valid_loss_f32"]),
                       6))
        rec["ok"] = rec["d_ssim"] <= 1e-3
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
