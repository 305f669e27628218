"""Training CLI (reference train.py re-built for TPU).

Single-chip or multi-chip: the train step is jit-compiled over a 1-D `data`
mesh; batches are sharded, params replicated, gradient all-reduce inserted
by XLA (see parallel/mesh.py). Output tree matches the reference:

    checkpoints/<YYYY-MM-DD_HH-MM>/
        train.log  scalars.jsonl  (tensorboard events if available)
        train/NN.png  valid/NN.png          per-epoch [img1|img2|fused]
        epoch_best.ckpt  epoch_last.ckpt    (+ .json metadata)

Usage: python -m multi_modal_image_fusion_tpu.cli.train --data roadscene \
           --model densefuse --bs 16 --epoch 12
"""

import os
import time

import jax
import numpy as np

from ..data.dataset import FusionDataset, FusionPatches
from ..data.io import imwrite
from ..data.pipeline import Feeder
from ..models import create_model
from ..parallel.mesh import batch_sharding, make_mesh
from ..train.checkpoint import save_checkpoint
from ..train.schedules import make_lr_schedule
from ..train.trainer import Trainer, make_loss_bundle
from ..utils.logger import make_logger
from ..utils.meters import AverageMeter
from ..utils.scalars import ScalarWriter
from ..utils.seed import setup_seed
from .common import (dataset_layout, get_train_parser, parse_model_cfg,
                     resolve_data_dir, save_result)


def _scan_chunks(feeder, k):
    """Group consecutive same-shape train batches into stacked (K, B, ...)
    super-batches for Trainer.train_steps; odd-shaped stragglers (the last
    partial batch) flush as singleton chunks."""
    import numpy as np

    def shape_of(item):
        parts = item if isinstance(item, (tuple, list)) else (item,)
        return tuple(getattr(p, "shape", None) for p in parts)

    buf = []
    for item in feeder:
        if buf and shape_of(item) != shape_of(buf[0]):
            yield buf
            buf = []
        buf.append(item)
        if len(buf) == k:
            yield buf
            buf = []
    if buf:
        yield buf


def _stack_batches(items):
    import numpy as np
    if isinstance(items[0], (tuple, list)):
        return tuple(np.stack([np.asarray(it[i]) for it in items])
                     for i in range(len(items[0])))
    return np.stack([np.asarray(it) for it in items])


def run_epoch(trainer, state, feeder, epoch, mode, logger, writer,
              save_dir=None, log_interval=10, schedule=None,
              steps_per_dispatch=1):
    """One train/valid epoch. Loss scalars stay on device between log
    points (a host fetch costs a full dispatch round-trip; the reference's
    per-iter `.item()` syncs, train.py:98, are the same trap on GPU) — the
    epoch average is accumulated on device and fetched once, so it is
    exact, while per-iter scalar logging samples every `log_interval`."""
    loss_meter = AverageMeter()
    num_iters = len(feeder)
    start_time = time.time()
    last = None
    loss_sum = None
    n_total = 0

    def _n_of(batch):
        return (batch[0] if isinstance(batch, (tuple, list))
                else batch).shape[0]

    def iter_steps():
        nonlocal state
        if mode == "train" and steps_per_dispatch > 1 \
                and not getattr(feeder, "with_mask", False):
            # K chained steps per dispatch (Trainer.train_steps): per-step
            # loss parts come back stacked (K,), so logging/accounting
            # below is per logical step, exactly as unchained
            for items in _scan_chunks(feeder, steps_per_dispatch):
                if len(items) == 1:
                    batch = items[0]
                    state, parts, imgf = trainer.train_step(state, batch)
                    yield batch, _n_of(batch), parts, imgf
                    continue
                stacked = _stack_batches(items)
                state, parts, imgf = trainer.train_steps(state, stacked)
                for i, batch in enumerate(items):
                    yield (batch, _n_of(batch),
                           jax.tree.map(lambda p, i=i: p[i], parts),
                           imgf if i == len(items) - 1 else None)
            return
        for item in feeder:
            if getattr(feeder, "with_mask", False):
                # masked valid batches: wrap-padded samples are excluded
                # from the loss, n counts only true samples — exact
                # partial-batch averaging (reference train.py:82-90)
                batch, mask, n = item
                parts, imgf = trainer.valid_step(state, batch, mask)
            elif mode == "train":
                batch = item
                n = _n_of(batch)
                state, parts, imgf = trainer.train_step(state, batch)
            else:
                batch = item
                n = _n_of(batch)
                parts, imgf = trainer.valid_step(state, batch)
            yield batch, n, parts, imgf

    for it, (batch, n, parts, imgf) in enumerate(iter_steps()):
        if imgf is not None:
            last = (batch, imgf)

        contrib = parts["loss"] * n       # lazy, stays on device
        loss_sum = contrib if loss_sum is None else loss_sum + contrib
        n_total += n

        if mode == "train" and schedule is not None:
            # per-iteration lr, like reference train.py:108-110 — the
            # .host twin is pure numpy, so this costs no device dispatch
            writer.add_scalar("lr_iter", schedule.host(
                num_iters * epoch + it), num_iters * epoch + it)

        if (it + 1) % log_interval == 0 or it + 1 == num_iters:
            global_step = num_iters * epoch + it
            writer.add_scalar(f"{mode}_loss_iter", float(parts["loss"]),
                              global_step)
            for k in ("loss1", "loss2", "loss3"):
                writer.add_scalar(f"{mode}_{k}_iter", float(parts[k]),
                                  global_step)
            loss_meter.sum = float(loss_sum)
            loss_meter.count = n_total
            loss_meter.avg = loss_meter.sum / max(n_total, 1)
            logger.info(f"epoch: {epoch + 1:0>2}, iter: {it + 1:0>3}, "
                        f"{mode} loss: {loss_meter.avg:.4f}")

    jax.block_until_ready(state.params)
    logger.info(f"cost time: {time.time() - start_time:.3f}s\n")

    if save_dir is not None and last is not None:
        batch, imgf = last

        def local0(x):
            # first sample of this process's shard: a batch-sharded global
            # array can't be fetched whole under multi-host
            if hasattr(x, "addressable_shards"):
                return np.asarray(x.addressable_shards[0].data)[0]
            return np.asarray(x)[0]

        if isinstance(batch, (tuple, list)):
            result = save_result(local0(imgf), local0(batch[0]),
                                 local0(batch[1]))
        else:  # AE mode: [input | reconstruction]
            result = save_result(local0(imgf), local0(batch), local0(imgf))
        imwrite(os.path.join(save_dir, f"{epoch + 1:0>2}.png"), result)

    return state, loss_meter.avg


def main(argv=None):
    args = get_train_parser().parse_args(argv)
    if args.multihost:
        # must run before ANYTHING that can initialize the XLA backend
        # (enable_compilation_cache and setup_seed both can)
        from ..parallel.mesh import init_multihost
        init_multihost()
    from ..utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    setup_seed(args.seed)
    # rank-0-only persistent outputs (reference train.py:100, 121, 167,
    # 354): non-main processes run the same compute (SPMD requires it) but
    # write logs/checkpoints/scalars into a throwaway tempdir
    main_proc = jax.process_index() == 0

    ckpt_root = args.ckpt_root or os.path.join(
        os.path.dirname(__file__), "..", "..", "..", "checkpoints")
    if not main_proc:
        import tempfile
        ckpt_root = tempfile.mkdtemp(prefix="mmif_rank_scratch_")
    from datetime import datetime

    time_str = datetime.strftime(datetime.now(), "%Y-%m-%d_%H-%M")
    ckpt_dir = os.path.join(ckpt_root, time_str)
    n = 1
    while os.path.isdir(ckpt_dir):     # same-minute runs get a suffix
        ckpt_dir = os.path.join(ckpt_root, f"{time_str}_{n}")
        n += 1
    os.makedirs(ckpt_dir, exist_ok=True)
    from ..utils.logger import Logger

    logger = Logger(os.path.join(ckpt_dir, "train.log")).init_logger()
    writer = ScalarWriter(ckpt_dir)

    if args.spatial and args.spatial > 1:
        # height sharding spans the mesh, so the mesh is exactly the
        # requested N devices
        if len(jax.devices()) < args.spatial:
            raise ValueError(
                f"--spatial {args.spatial} needs that many devices, "
                f"have {len(jax.devices())}")
        mesh = make_mesh(jax.devices()[:args.spatial])
    else:
        mesh = make_mesh()
    n_dev = len(mesh.devices.ravel())
    logger.info(f"devices: {n_dev} x {jax.devices()[0].platform}")
    logger.info(f"model: {args.model}")

    data_dir, is_sample = resolve_data_dir(args)
    set_name_train, _, img_type = dataset_layout(args.data)
    if is_sample:
        set_name_train = "test"   # bundled samples only ship a test split
        logger.info(f"using bundled sample data at {data_dir}")

    rng = np.random.RandomState(args.seed)
    if args.ae:
        from ..data.dataset import AEDataset

        train_set = AEDataset(data_dir, set_name=set_name_train,
                              img_type=img_type, transform=True,
                              fix_size=True, rng=rng)
        valid_set = AEDataset(data_dir, set_name=set_name_train,
                              img_type=img_type, fix_size=True, rng=rng)
    elif args.use_patches:
        train_set = FusionPatches(data_dir, set_name=set_name_train,
                                  set_type="train", img_type=img_type,
                                  transform=True, rng=rng)
        valid_set = FusionPatches(data_dir, set_name=set_name_train,
                                  set_type="valid", img_type=img_type)
    else:
        train_set = FusionDataset(data_dir, set_name=set_name_train,
                                  set_type="train", img_type=img_type,
                                  transform=True, fix_size=args.fix_size,
                                  rng=rng)
        valid_set = FusionDataset(data_dir, set_name=set_name_train,
                                  set_type="valid", img_type=img_type,
                                  fix_size=args.fix_size, rng=rng)

    if args.spatial and args.spatial > 1:
        # feeders place images height-sharded (the batch axis stays
        # whole — no wrap-padding to a device multiple); masks and other
        # low-rank leaves replicate (Feeder._leaf_sharding)
        from jax.sharding import NamedSharding, PartitionSpec
        sharding = NamedSharding(mesh, PartitionSpec(None, "data"))
    else:
        sharding = batch_sharding(mesh)
    train_feeder = Feeder(train_set, args.bs, shuffle=True, drop_last=True,
                          sharding=sharding, seed=args.seed,
                          workers=args.workers)
    # valid keeps the final partial batch (reference DataLoader default);
    # train drops it so the jit'd step keeps one static shape. with_mask
    # excludes wrap-padded duplicates from the valid loss average.
    valid_feeder = Feeder(valid_set, args.bs, shuffle=False,
                          drop_last=False, sharding=sharding,
                          with_mask=True, workers=args.workers)
    logger.info(f"train iters/epoch: {len(train_feeder)}, "
                f"valid iters/epoch: {len(valid_feeder)}")

    model_cfg = parse_model_cfg(args.model_cfg)
    model = create_model(args.model, **model_cfg)
    schedule = make_lr_schedule(args.lr, len(train_feeder), args.epoch,
                                warmup=args.warmup,
                                warmup_method=args.warmup_method)
    bundle = make_loss_bundle(args.ssim_mode, args.ssim_weight,
                              args.pixel_mode, args.pixel_weight,
                              args.grad_mode, args.grad_weight)
    logger.info(f"ssim mode: {args.ssim_mode}, weight: {args.ssim_weight}")
    logger.info(f"pixel mode: {args.pixel_mode}, weight: "
                f"{args.pixel_weight}")
    logger.info(f"grad mode: {args.grad_mode}, weight: {args.grad_weight}")

    trainer = Trainer(model, schedule, bundle,
                      clip_grad=5.0 if args.clip_grad else None, mesh=mesh,
                      ae=args.ae, fast=args.fast_train,
                      spatial=args.spatial, amp=args.amp)

    sample = next(iter(valid_feeder))[0]
    state = trainer.init_state(jax.random.PRNGKey(args.seed), sample)

    start_epoch = 0
    if args.init_from:
        # stage-2 init: params (+ batch stats) from an AE-pretrained
        # checkpoint, optimizer state fresh
        import flax

        from ..parallel.mesh import replicate

        init_path = os.path.join(ckpt_root, args.init_from,
                                 "epoch_best.ckpt")
        if not os.path.isfile(init_path):
            init_path = os.path.join(ckpt_root, args.init_from,
                                     "epoch_last.ckpt")
        with open(init_path, "rb") as f:
            restored = flax.serialization.msgpack_restore(f.read())
        host_state = jax.device_get(state)
        loaded = flax.serialization.from_state_dict(
            host_state.params, restored["params"])
        state = state.replace(params=replicate(loaded, mesh))
        if restored.get("batch_stats"):
            bs = flax.serialization.from_state_dict(
                jax.device_get(state.batch_stats),
                restored["batch_stats"])
            state = state.replace(batch_stats=replicate(bs, mesh))
        logger.info(f"initialized params from {init_path}")
    if args.resume:
        from ..train.checkpoint import load_checkpoint, load_checkpoint_meta

        resume_path = os.path.join(ckpt_root, args.resume,
                                   "epoch_last.ckpt")
        state = load_checkpoint(resume_path, jax.device_get(state))
        from ..parallel.mesh import replicate

        state = replicate(state, mesh)
        start_epoch = int(load_checkpoint_meta(resume_path).get("epoch", 0))
        logger.info(f"resumed from {resume_path} at epoch {start_epoch}")
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree.leaves(state.params))
    logger.info(f"params: {n_params / 1e6:.3f}M")

    train_dir = os.path.join(ckpt_dir, "train")
    valid_dir = os.path.join(ckpt_dir, "valid")
    os.makedirs(train_dir, exist_ok=True)
    os.makedirs(valid_dir, exist_ok=True)

    meta = {"model": args.model, "data": args.data,
            "model_cfg": model_cfg}
    best_epoch, best_loss = 0, 0.0
    # epochs actually finished — the finally block stamps this (NOT
    # args.epoch) into epoch_last.ckpt so that --resume after a crash or
    # interrupt restarts from the right place instead of silently no-oping
    last_completed_epoch = start_epoch
    # donation-proof snapshot for the crash save: train_step donates its
    # input state, so an interrupt mid-step leaves `state` pointing at
    # deleted device buffers — keep a host copy from the last epoch
    # boundary to fall back on
    last_good_state = None
    try:
        for epoch in range(start_epoch, args.epoch):
            if args.profile and epoch == start_epoch:
                jax.profiler.start_trace(os.path.join(ckpt_dir, "profile"))
            lr_now = float(schedule(int(state.step)))
            logger.info(f"Epoch: [{epoch + 1:0>2}/{args.epoch:0>2}], "
                        f"lr: {lr_now:.2e}")
            logger.info("-" * 16)
            train_feeder.set_epoch(epoch)

            spd = args.steps_per_dispatch
            if spd > 1 and jax.devices()[0].platform == "cpu":
                # XLA:CPU executes while-loop (scan) bodies without the
                # top-level intra-op thread pool — a chained step runs
                # ~2 orders slower than dispatched steps on CPU
                if epoch == start_epoch:
                    logger.info("steps_per_dispatch>1 is a TPU "
                                "optimization; forcing 1 on CPU")
                spd = 1
            state, train_loss = run_epoch(
                trainer, state, train_feeder, epoch, "train", logger,
                writer, train_dir, schedule=schedule,
                steps_per_dispatch=spd)
            state, valid_loss = run_epoch(trainer, state, valid_feeder,
                                          epoch, "valid", logger, writer,
                                          valid_dir)
            if args.profile and epoch == start_epoch:
                jax.profiler.stop_trace()
                logger.info("profiler trace written to "
                            f"{os.path.join(ckpt_dir, 'profile')}")

            writer.add_scalar("train_loss_epoch", train_loss, epoch)
            writer.add_scalar("valid_loss_epoch", valid_loss, epoch)
            writer.add_scalar("lr", lr_now, epoch)
            logger.info(f"epoch: {epoch + 1:0>2}, train loss: "
                        f"{train_loss:.4f}, valid loss: {valid_loss:.4f}\n")
            last_completed_epoch = epoch + 1
            last_good_state = jax.device_get(state)

            # best-checkpoint gate: reference train.py:362-371
            if epoch < args.epoch // 2:
                continue
            if valid_loss < best_loss or epoch == args.epoch // 2:
                best_epoch, best_loss = epoch + 1, valid_loss
                save_checkpoint(os.path.join(ckpt_dir, "epoch_best.ckpt"),
                                state,
                                {**meta, "epoch": best_epoch,
                                 "valid_loss": best_loss})
    finally:
        last_meta = {**meta, "epoch": last_completed_epoch}
        last_path = os.path.join(ckpt_dir, "epoch_last.ckpt")
        try:
            save_checkpoint(last_path, state, last_meta)
        except RuntimeError:
            # state buffers were donated into an interrupted train_step —
            # save the last epoch-boundary snapshot instead
            if last_good_state is not None:
                save_checkpoint(last_path, last_good_state, last_meta)
            else:
                logger.info("interrupted before the first epoch finished; "
                            "no epoch_last.ckpt written")
        writer.close()
        logger.info(f"training model done, best loss: {best_loss:.4f} "
                    f"in epoch: {best_epoch}")
    return ckpt_dir


if __name__ == "__main__":
    main()
