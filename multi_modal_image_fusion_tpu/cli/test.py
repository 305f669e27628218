"""Inference + benchmark CLI (reference test.py re-built for TPU):
runs the trained model over the test split (batch 1, full resolution),
reports per-image SSIM (data_range 1.0) and latency/fps with the first
iteration excluded as compile warmup (reference test.py:41-48), dumps fused
images as NN.bmp into checkpoints/<ckpt>/<data>/, and appends results to
train.log.

Usage: python -m multi_modal_image_fusion_tpu.cli.test --data roadscene \
           --ckpt <timestamp-dir>
"""

import math
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..data.dataset import FusionDataset
from ..data.io import imwrite
from ..models import create_model
from ..ops.metrics import calc_ssim
from ..train.checkpoint import load_checkpoint_meta
from ..utils.meters import AverageMeter
from .common import dataset_layout, get_test_parser, resolve_data_dir, \
    save_result


def make_infer_fn(model, variables, spatial=0, tiles=0):
    if tiles and tiles > 1:
        # sequential height slabs on one chip (parallel/tiling.py): exact
        # output, ~tiles-fold lower peak activation HBM for the
        # memory-bound multi-scale decoders
        from ..parallel.tiling import tiled_forward

        @jax.jit
        def fuse(img1, img2):
            return tiled_forward(model, variables, img1, img2, tiles)
    elif spatial and spatial > 1:
        # height-sharded fused forward: one pair across `spatial` chips
        # (parallel/spatial.py — exact parity with the single-device
        # forward; latency axis the reference's batch-DP cannot touch).
        # Multi-scale models route through the two-phase sharded path.
        from ..parallel.mesh import make_mesh
        from ..parallel.spatial import (spatial_forward,
                                        spatial_forward_multiscale)
        from ..parallel.tiling import TILED_MULTISCALE

        mesh = make_mesh(jax.devices()[:spatial])
        multiscale = type(model).__name__.lower() in TILED_MULTISCALE

        @jax.jit
        def fuse(img1, img2):
            if multiscale:
                return spatial_forward_multiscale(model, variables, img1,
                                                  img2, mesh=mesh)
            return spatial_forward(model, variables, img1, img2,
                                   mesh=mesh)
    else:
        @jax.jit
        def fuse(img1, img2):
            return model.apply(variables, img1, img2, train=False)

    @jax.jit
    def ssim_of(img1, img2, imgf):
        s1 = calc_ssim(img1, imgf, data_range=1.0)
        s2 = calc_ssim(img2, imgf, data_range=1.0)
        return (s1 + s2) * 0.5

    return fuse, ssim_of


def test_model(model, variables, dataset, save_dir=None, log_file=None,
               pad_bucket=0, fast=False, spatial=0, tiles=0):
    from ..ops.layers import fast_inference

    timer = AverageMeter()
    ssim_meter = AverageMeter()
    fuse, ssim_of = make_infer_fn(model, variables, spatial=spatial,
                                  tiles=tiles)
    # height must split evenly over the spatial mesh / tile grid (slabs
    # additionally 8-row aligned); fold that into the pad-and-crop bucket
    # machinery (reflect pad, crop after)
    h_mult = spatial if spatial and spatial > 1 else 1
    if h_mult > 1:
        from ..parallel.tiling import TILED_MULTISCALE
        if type(model).__name__.lower() in TILED_MULTISCALE:
            h_mult *= 8          # multi-scale slabs are 8-row aligned
    if tiles and tiles > 1:
        h_mult = 8 * tiles
    noted_heights = set()

    for i in range(len(dataset)):
        img1, img2 = dataset[i]
        x1 = jnp.asarray(img1)[None, ..., None]
        x2 = jnp.asarray(img2)[None, ..., None]
        h, w = x1.shape[1:3]
        xp1, xp2 = x1, x2
        if pad_bucket or h_mult > 1:
            bh = math.lcm(pad_bucket or 1, h_mult)
            ph = -h % bh
            pw = -w % pad_bucket if pad_bucket else 0
            if ph and not pad_bucket and h not in noted_heights:
                noted_heights.add(h)
                # sharded parity is exact only at divisible heights;
                # an indivisible H takes the pad_bucket-class seam
                # deviation (<1e-3 SSIM) — say so rather than silently
                # weakening the --spatial exactness contract
                which = ("--tiles slab grid" if tiles and tiles > 1
                         else "--spatial mesh")
                print(f"note: H={h} not divisible by the {which} "
                      f"multiple {h_mult}; reflect-padding to {h + ph} "
                      f"(output deviates within the receptive field of "
                      f"the pad seam, as with --pad_bucket)")
            cfg = ((0, 0), (0, ph), (0, pw), (0, 0))
            xp1 = jnp.pad(x1, cfg, mode="reflect")
            xp2 = jnp.pad(x2, cfg, mode="reflect")

        start = time.time()
        with fast_inference(fast):
            imgf = fuse(xp1, xp2)
        jax.block_until_ready(imgf)
        elapsed = time.time() - start
        if imgf.shape[1] != h or imgf.shape[2] != w:
            imgf = imgf[:, :h, :w]
        ssim = ssim_of(x1, x2, imgf)
        if i > 0:                     # first iter = compile warmup
            timer.update(elapsed)

        ssim_meter.update(float(ssim))
        line = (f"iter: {i + 1:0>2}, ssim: {ssim_meter.val:.4f}, "
                f"time: {elapsed * 1000:.3f}ms")
        print(line)
        if log_file is not None:
            log_file.write("\n" + line)

        if save_dir is not None:
            result = save_result(np.asarray(imgf)[0])
            imwrite(os.path.join(save_dir, f"{i + 1:0>2}.bmp"), result)

    return ssim_meter.avg, timer.avg if timer.count else float("nan")


def main(argv=None):
    from ..utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    args = get_test_parser().parse_args(argv)

    ckpt_root = args.ckpt_root or os.path.join(
        os.path.dirname(__file__), "..", "..", "..", "checkpoints")
    ckpt_dir = os.path.join(ckpt_root, args.ckpt)
    ckpt_path = os.path.join(ckpt_dir, "epoch_best.ckpt")
    if not os.path.isfile(ckpt_path):
        ckpt_path = os.path.join(ckpt_dir, "epoch_last.ckpt")
    assert os.path.isfile(ckpt_path), f"no checkpoint under {ckpt_dir}"

    meta = load_checkpoint_meta(ckpt_path)
    model_name = args.model or meta.get("model", "deepfuse")
    model_cfg = meta.get("model_cfg", {}) if args.model is None else {}
    model = create_model(model_name, **model_cfg)
    print(f"model: {model_name}")

    data_dir, is_sample = resolve_data_dir(args)
    _, set_name_test, img_type = dataset_layout(args.data)
    dataset = FusionDataset(data_dir, set_name=set_name_test,
                            set_type="test", img_type=img_type)

    # checkpoints store a full TrainState; pull params/batch_stats
    import flax

    with open(ckpt_path, "rb") as f:
        blob = f.read()
    restored = flax.serialization.msgpack_restore(blob)
    variables = {"params": restored["params"]}
    if restored.get("batch_stats"):
        variables["batch_stats"] = restored["batch_stats"]

    # strict=False restore (reference test.py:176): a stage-1 AE
    # checkpoint lacks the fusion params of the full model — fill
    # missing leaves from a fresh init instead of failing. Structure is
    # compared via eval_shape first so the common full-checkpoint path
    # pays no init forward.
    dummy = jnp.zeros((1, 64, 64, 1), jnp.float32)
    init_struct = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), dummy, dummy,
                           train=False))
    struct_paths = {"/".join(str(k.key) for k in p)
                    for p, _ in jax.tree_util.tree_flatten_with_path(
                        init_struct)[0]}
    have_paths = {"/".join(str(k.key) for k in p)
                  for p, _ in jax.tree_util.tree_flatten_with_path(
                      variables)[0]}
    if struct_paths - have_paths:
        from ..train.checkpoint import merge_variables
        init_vars = model.init(jax.random.PRNGKey(0), dummy, dummy,
                               train=False)
        variables, miss, unexp = merge_variables(
            flax.core.unfreeze(init_vars), variables)
        print(f"partial checkpoint: {len(miss)} leaves kept at init "
              f"(e.g. {miss[0] if miss else ''}), "
              f"{len(unexp)} checkpoint-only leaves dropped")

    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree.leaves(variables["params"]))
    print(f"params: {n_params / 1e6:.3f}M")

    save_dir = os.path.join(ckpt_dir, args.data)
    os.makedirs(save_dir, exist_ok=True)

    log_path = os.path.join(ckpt_dir, "train.log")
    log_file = open(log_path, "a") if os.path.isfile(log_path) else None
    pad_bucket = args.pad_bucket
    if pad_bucket < 0:   # auto: bucket on TPU (per-shape compiles are
        # 60-100s remote compiles there), exact elsewhere
        pad_bucket = 128 if jax.default_backend() == "tpu" else 0
    if args.spatial and args.spatial > 1:
        from ..parallel.spatial import check_spatial_eligible
        from ..parallel.tiling import TILED_MULTISCALE
        if model_name.lower() not in TILED_MULTISCALE:
            check_spatial_eligible(model_name,
                                   getattr(model, "fusion_mode", None))
        if len(jax.devices()) < args.spatial:
            raise ValueError(
                f"--spatial {args.spatial} needs that many devices, "
                f"have {len(jax.devices())}")
    import contextlib
    qctx = contextlib.nullcontext()
    if getattr(args, "int8", False):
        from ..ops.quant import calibrate, default_skip, \
            quantized_inference

        cal = []
        for i in range(min(4, len(dataset))):
            a, b = dataset[i]
            cal.append((jnp.asarray(a)[None, ..., None],
                        jnp.asarray(b)[None, ..., None]))
        amax = calibrate(model, variables, cal)
        skip = default_skip(model_name)
        print(f"int8: calibrated {len(amax)} conv layers on {len(cal)} "
              f"image pairs"
              + (f"; bf16-skip {','.join(skip)}" if skip else ""))
        qctx = quantized_inference(amax, skip=skip)
    try:
        with qctx:
            ssim, avg_time = test_model(model, variables, dataset,
                                        save_dir, log_file,
                                        pad_bucket=pad_bucket,
                                        fast=args.fast,
                                        spatial=args.spatial,
                                        tiles=args.tiles)
        line = (f"ssim: {ssim:.4f}, time: {avg_time * 1000:.3f}ms, "
                f"fps: {1.0 / avg_time:.3f}")
        print(line)
        if log_file is not None:
            log_file.write("\n" + line)
    finally:
        if log_file is not None:
            log_file.close()
    return ssim, avg_time


if __name__ == "__main__":
    main()
