"""Shared CLI plumbing (reference common.py:23-81): argument parsers,
dataset-layout mapping, and result-image assembly.

The reference's `type=bool` flags are always-true when passed (a known
argparse footgun, SURVEY.md §5); here booleans are proper on/off flag
pairs with the same defaults.
"""

import argparse
import os

import numpy as np

from ..data.transform import denorm
from ..models import MODEL_ZOO

# Platform override that actually works on hosts whose sitecustomize
# force-registers a TPU plugin and resets JAX_PLATFORMS (the axon relay
# does): the env var is ignored there, but jax.config.update before first
# backend use is honored. MMIF_PLATFORM=cpu -> run this CLI on CPU.
if os.environ.get("MMIF_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["MMIF_PLATFORM"])


def _bool_flag(parser, name, default, help_on):
    dest = name.replace("-", "_")
    parser.add_argument(f"--{name}", dest=dest, action="store_true",
                        help=help_on)
    parser.add_argument(f"--no-{name}", dest=dest, action="store_false")
    parser.set_defaults(**{dest: default})


def get_train_parser():
    p = argparse.ArgumentParser(description="Training")
    p.add_argument("--lr", default=1e-4, type=float, help="learning rate")
    p.add_argument("--bs", default=16, type=int, help="global batch size")
    p.add_argument("--epoch", default=12, type=int, help="num of epochs")
    _bool_flag(p, "use_patches", True, "train with 64x64 patches")
    _bool_flag(p, "fix_size", True,
               "with --no-use_patches: crop/resize pairs to 256 "
               "(reference train.py:192-201 behavior). "
               "--no-use_patches --no-fix_size trains on FULL-RESOLUTION "
               "pairs (e.g. 1224x1024 polarization, BASELINE config #4 — "
               "a config the reference itself cannot run)")
    _bool_flag(p, "warmup", False, "first-epoch lr warmup")
    p.add_argument("--warmup_method", default="linear",
                   choices=["linear", "constant"],
                   help="warmup shape (reference common.py:155-163)")
    _bool_flag(p, "clip_grad", True, "clip grad global-norm at 5")
    p.add_argument("--data", default="roadscene", type=str,
                   help="dataset folder name")
    p.add_argument("--data_root", default=None, type=str,
                   help="datasets root dir (default <repo>/../datasets; "
                        "falls back to the bundled reference samples)")
    p.add_argument("--model", default="deepfuse", type=str,
                   choices=sorted(MODEL_ZOO), help="zoo model name")
    p.add_argument("--ssim_mode", default="ssim",
                   choices=["ssim", "w-ssim", "ms-ssim", "msw-ssim"])
    p.add_argument("--ssim_weight", default=1.0, type=float)
    p.add_argument("--pixel_mode", default="l1", choices=["l1", "l2"])
    p.add_argument("--pixel_weight", default=0.01, type=float)
    p.add_argument("--grad_mode", default="l1", choices=["l1", "l2"])
    p.add_argument("--grad_weight", default=0.1, type=float)
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--ckpt_root", default=None, type=str,
                   help="checkpoints root (default <repo>/../checkpoints)")
    _bool_flag(p, "ae", False,
               "autoencoder-reconstruction pretraining (two-stage training, "
               "single-image batches)")
    p.add_argument("--resume", default=None, type=str,
                   help="checkpoint folder name to resume from "
                        "(loads epoch_last.ckpt; the reference cannot "
                        "resume at all)")
    p.add_argument("--init_from", default=None, type=str,
                   help="checkpoint folder name to initialize params from "
                        "(params/batch_stats only, fresh optimizer — "
                        "stage 2 of two-stage training after --ae "
                        "pretraining)")
    _bool_flag(p, "profile", False,
               "capture a jax.profiler trace of the first training epoch")
    p.add_argument("--workers", default=0, type=int,
                   help="feeder item-loading threads per batch (reference "
                        "DataLoader num_workers, train.py:209). 0 "
                        "[default] = single producer, bit-reproducible "
                        "augmentation stream; N>0 parallelizes imread+"
                        "augment (augmentation rng draw ORDER then depends "
                        "on thread timing)")
    _bool_flag(p, "fast_train", False,
               "route eligible convs through the differentiable Pallas "
               "kernel (custom-VJP shifted-GEMM; grad parity 1e-3, "
               "tests/test_conv_vjp.py); TPU only, no-op elsewhere")
    _bool_flag(p, "multihost", False,
               "initialize jax.distributed before building the mesh "
               "(multi-host training: the same data-parallel code then "
               "spans hosts, with XLA routing collectives over ICI/DCN; "
               "replaces the reference's single-node NCCL limitation, "
               "common.py:96-102)")
    p.add_argument("--spatial", default=0, type=int,
                   help="height-shard each image over N devices for the "
                        "train step instead of sharding the batch "
                        "(parallel/spatial.py): full-resolution training "
                        "without the reference's 256-crop (train.py:"
                        "192-201) when one image's activations exceed a "
                        "chip — pair with --no-use_patches --no-fix_size. "
                        "Norm-free stride-1 models only; 0/1 = off")
    p.add_argument("--amp", default=None, choices=["bf16", "f32"],
                   help="mixed-precision train compute: f32 master params "
                        "cast to bf16 at the model boundary (MXU-native); "
                        "loss stack and Adam moments stay f32 "
                        "(train/trainer.py). Validation stays f32.")
    p.add_argument("--steps_per_dispatch", default=1, type=int,
                   help="chain K train steps into one device dispatch "
                        "(lax.scan over K stacked batches): amortizes "
                        "per-call runtime overhead at the reference's "
                        "small 64x64-patch config (Trainer.train_steps)")
    p.add_argument("--model_cfg", action="append", default=[],
                   metavar="KEY=VALUE",
                   help="model constructor overrides, repeatable — e.g. "
                        "--model_cfg fusion_mode=l1, or for myfusion: "
                        "--model_cfg encoder=transformer "
                        "--model_cfg decoder=fs "
                        "--model_cfg share_weight_levels=2")
    return p


def parse_model_cfg(pairs):
    """['k=v', ...] -> kwargs dict with literal-eval'd values."""
    import ast

    out = {}
    for item in pairs:
        key, _, value = item.partition("=")
        try:
            out[key] = ast.literal_eval(value)
        except (ValueError, SyntaxError):
            out[key] = value
    return out


def get_test_parser():
    p = argparse.ArgumentParser(description="Inference")
    p.add_argument("--data", default="roadscene", type=str,
                   help="dataset folder name")
    p.add_argument("--ckpt", required=True, type=str,
                   help="checkpoint folder name (timestamp dir)")
    p.add_argument("--data_root", default=None, type=str)
    p.add_argument("--ckpt_root", default=None, type=str)
    p.add_argument("--model", default=None, type=str,
                   help="zoo model name (default: from checkpoint meta)")
    p.add_argument("--pad_bucket", default=-1, type=int,
                   help="pad inputs to multiples of N and crop outputs: "
                        "one XLA compile per bucket instead of per image "
                        "shape (tiny border deviation within the model's "
                        "receptive field of the pad seam; 0 = exact "
                        "per-shape compiles; -1 [default] = auto: 128 on "
                        "TPU, where each fresh shape costs a 60-100s "
                        "remote compile on variable-size sets like TNO, "
                        "0 elsewhere; measured SSIM deviation at bucket "
                        "128 is <1e-3 — tests/test_cli.py)")
    _bool_flag(p, "fast", True,
               "route eligible convs through the DMA-fed shifted-GEMM "
               "Pallas kernel (fast_inference mode; ~6x the XLA conv "
               "rate on TPU, no-op elsewhere) — on by default, disable "
               "with --no-fast")
    p.add_argument("--spatial", default=0, type=int,
                   help="shard each image's HEIGHT over N devices for "
                        "the fused forward (parallel/spatial.py: one "
                        "ppermute halo exchange; exact parity with the "
                        "single-device result at N-divisible heights — "
                        "indivisible heights are reflect-padded to a "
                        "multiple, a pad_bucket-class seam deviation, "
                        "noted at runtime). For single-pair latency or "
                        "beyond-HBM resolutions; stride-1 local-fusion "
                        "models only. 0/1 = off")
    _bool_flag(p, "int8", False,
               "post-training int8 inference (ops/quant.py): calibrate "
               "per-layer activation scales on a few test images, then "
               "run eligible convs as int8 MXU dots with f32 dequant "
               "epilogues. Accuracy contract: SSIM/Qabf within 1e-3 of "
               "the bf16 path (tools/int8_acceptance.py)")
    p.add_argument("--tiles", default=0, type=int,
                   help="single-chip height tiling: run the forward in N "
                        "sequential height slabs (parallel/tiling.py), "
                        "dropping peak activation HBM ~N-fold for the "
                        "memory-bound multi-scale decoders at the cost "
                        "of halo recompute. Exact output parity "
                        "(two-phase encode/fuse/decode keeps global "
                        "fusion statistics global). Heights pad to a "
                        "slab-aligned multiple like --spatial. 0/1 = off")
    return p


def dataset_layout(data):
    """dataset name -> (set_name_train, set_name_test, img_type)
    (reference train.py:181-184, test.py:104-107, eval.py:127-135)."""
    if data == "tno":
        return None, None, "ir"
    if data in ("roadscene", "msrs"):
        return "train", "test", "ir"
    if data == "polar":
        return "train", "test", "po"
    # custom datasets default to the roadscene layout
    return "train", "test", "ir"


def resolve_data_dir(args):
    base = args.data_root
    if base is None:
        cand = os.path.join(os.path.dirname(__file__), "..", "..", "..",
                            "datasets")
        base = cand
    path = os.path.join(base, args.data)
    if not os.path.isdir(path):
        # fall back to bundled sample data for smoke runs: an explicit
        # env var, or well-known checkout locations
        candidates = [os.environ.get("MMIF_SAMPLES_DIR"),
                      os.path.join(os.path.dirname(__file__), "..", "..",
                                   "data", "samples"),
                      "/root/reference/data/samples"]
        alt = {"roadscene": "infrared", "polar": "polar"}.get(args.data)
        for samples in candidates:
            if not (samples and alt):
                continue
            if os.path.isdir(os.path.join(samples, alt)):
                return os.path.join(samples, alt), True
    return path, False


def save_result(pred, img1=None, img2=None):
    """Assemble [img1 | img2 | fused] side-by-side uint8 image
    (reference common.py:74-81). Inputs are HWC [0,1] floats."""
    if img1 is not None and img2 is not None:
        return np.concatenate(tuple(map(denorm, (img1, img2, pred))),
                              axis=1)
    return denorm(pred)
