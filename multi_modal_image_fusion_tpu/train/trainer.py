"""Trainer: jit-compiled train/valid steps with optax, mesh data
parallelism, and the reference's optimization recipe (reference
train.py:302-324):

    Adam(lr=1e-4, betas=(0.9, 0.999)) + MultiStepLR(2/3E, 8/9E; x0.1)
    + optional first-epoch warmup + global-norm grad clip at 5
    loss = SSIMLoss('ssim', w=1) + PixelLoss('l1','max', w=0.01)
         + GradLoss('l1','max', w=0.1)

The whole step (forward, loss, backward, clip, update, batch-stat update) is
one XLA computation; under a sharded batch the gradient/batch-stat
reductions become ICI collectives inserted by the SPMD partitioner.
"""

import inspect
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from ..ops.losses import GradLoss, PixelLoss, SSIMLoss
from ..parallel.mesh import make_mesh, replicate, shard_batch


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def make_loss_bundle(ssim_mode="ssim", ssim_weight=1.0,
                     pixel_mode="l1", pixel_weight=0.01,
                     grad_mode="l1", grad_weight=0.1,
                     pixel_grad_mode="max"):
    """The reference's 3-loss bundle; returns f(img1, img2, imgf) ->
    (total, dict of components)."""
    loss_fn1 = SSIMLoss(ssim_mode, weight=ssim_weight)
    loss_fn2 = PixelLoss(pixel_mode, weight=pixel_weight)
    loss_fn3 = GradLoss(grad_mode, weight=grad_weight)

    def bundle(img1, img2, imgf, mask=None):
        l1 = loss_fn1(img1, img2, imgf, mask=mask)
        l2 = loss_fn2(img1, img2, imgf, mode=pixel_grad_mode, mask=mask)
        l3 = loss_fn3(img1, img2, imgf, mode=pixel_grad_mode, mask=mask)
        total = l1 + l2 + l3
        return total, {"loss": total, "loss1": l1, "loss2": l2, "loss3": l3}

    return bundle


class Trainer:
    """Owns model/optimizer/mesh and exposes jit'd step functions.

    `ae=True` switches to autoencoder-reconstruction mode for two-stage
    pretraining (reference model.py:43-51 one-input path + AEDataset):
    batches are single images, the model runs with img2=None, and the loss
    bundle compares the reconstruction against the input.
    """

    def __init__(self, model, lr_schedule, loss_bundle=None, clip_grad=5.0,
                 betas=(0.9, 0.999), mesh=None, ae=False, fast=False,
                 spatial=0, amp=None):
        self.model = model
        self.ae = ae
        # amp='bf16': mixed-precision train compute — f32 master params
        # cast to bf16 at the model boundary (MXU-native), loss stack and
        # Adam moments stay f32. Valid steps stay f32 end to end.
        assert amp in (None, "f32", "bf16"), amp
        self.amp = None if amp == "f32" else amp
        # spatial>1: height-shard each image over the mesh instead of
        # sharding the batch — full-resolution training without the
        # reference's 256-crop escape hatch (train.py:192-201), exact
        # for norm-free stride-1 models (parallel/spatial.py). The loss
        # runs on the logically-global arrays, so the SSIM/grad window
        # convs are partitioned (with their own halo comms) by GSPMD.
        self.spatial = int(spatial or 0)
        if self.spatial > 1:
            from ..parallel.spatial import check_spatial_eligible
            if ae:
                raise ValueError("spatial sharding needs an image pair "
                                 "(AE mode has no img2)")
            check_spatial_eligible(type(model).__name__,
                                   getattr(model, "fusion_mode", None))
        # fast=True routes eligible convs through the differentiable Pallas
        # kernel (ops/pallas/conv_vjp) — the scope must be active when the
        # step is TRACED, so the step wrappers re-enter it on every call
        self.fast = fast
        self.loss_bundle = loss_bundle or make_loss_bundle()
        # decide mask support once from the signature: catching TypeError
        # per step would swallow genuine TypeErrors raised *inside* a
        # custom bundle and silently drop exact partial-batch averaging
        try:
            sig = inspect.signature(self.loss_bundle)
            self._bundle_takes_mask = ("mask" in sig.parameters or any(
                p.kind is inspect.Parameter.VAR_KEYWORD
                for p in sig.parameters.values()))
        except (TypeError, ValueError):   # builtins/partials w/o signature
            self._bundle_takes_mask = True
        self.mesh = mesh if mesh is not None else make_mesh()

        txs = []
        if clip_grad:
            txs.append(optax.clip_by_global_norm(clip_grad))
        txs.append(optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=1e-8))
        txs.append(optax.scale_by_learning_rate(lr_schedule))
        self.tx = optax.chain(*txs)

        self._train_step = jax.jit(self._train_step_impl, donate_argnums=0)
        self._train_multi = jax.jit(self._train_multi_impl,
                                    donate_argnums=0)
        self._valid_step = jax.jit(self._valid_step_impl)

    # -- state ------------------------------------------------------------
    def init_state(self, rng, sample_batch):
        img1, img2 = self._unpack(sample_batch)
        variables = self.model.init(rng, img1, img2, train=True)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", FrozenDict())
        opt_state = self.tx.init(params)
        state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                           batch_stats=batch_stats, opt_state=opt_state)
        return replicate(state, self.mesh)

    def shard(self, batch):
        if self.spatial > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.mesh import place_sharded
            h_shard = NamedSharding(self.mesh, P(None, "data"))
            repl = NamedSharding(self.mesh, P())
            return jax.tree.map(
                lambda x: place_sharded(
                    x, h_shard if getattr(x, "ndim", 0) == 4 else repl),
                batch)
        return shard_batch(batch, self.mesh)

    def _unpack(self, batch):
        if self.ae:
            img = batch[0] if isinstance(batch, (tuple, list)) else batch
            return img, None
        img1, img2 = batch
        return img1, img2

    # -- steps ------------------------------------------------------------
    def _apply(self, params, batch_stats, img1, img2, train):
        if train and self.amp == "bf16":
            bf = lambda t: jax.tree.map(  # noqa: E731
                lambda p: p.astype(jnp.bfloat16)
                if getattr(p, "dtype", None) == jnp.float32 else p, t)
            out, new_stats = self._apply_raw(
                bf(params), batch_stats, bf(img1),
                None if img2 is None else bf(img2), train)
            # mutated BN stats come back bf16; restore the state dtypes
            # so the donated TrainState keeps a stable layout
            new_stats = jax.tree.map(
                lambda n, o: n.astype(o.dtype), new_stats, batch_stats)
            return out.astype(jnp.float32), new_stats
        return self._apply_raw(params, batch_stats, img1, img2, train)

    def _apply_raw(self, params, batch_stats, img1, img2, train):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        if self.spatial > 1:
            from ..parallel.spatial import spatial_forward
            out = spatial_forward(self.model, variables, img1, img2,
                                  mesh=self.mesh, train=train)
            return out, batch_stats
        if train and batch_stats:
            out, mut = self.model.apply(variables, img1, img2, train=True,
                                        mutable=["batch_stats"])
            return out, mut["batch_stats"]
        out = self.model.apply(variables, img1, img2, train=train)
        return out, batch_stats

    def _train_step_impl(self, state, img1, img2):
        tgt2 = img1 if img2 is None else img2

        def loss_fn(params):
            imgf, new_stats = self._apply(params, state.batch_stats, img1,
                                          img2, train=True)
            total, parts = self.loss_bundle(img1, tgt2, imgf)
            return total, (parts, new_stats, imgf)

        grads, (parts, new_stats, imgf) = jax.grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.params)
        params = optax.apply_updates(state.params, updates)
        state = state.replace(step=state.step + 1, params=params,
                              batch_stats=new_stats, opt_state=opt_state)
        return state, parts, imgf

    def _valid_step_impl(self, state, img1, img2, mask):
        tgt2 = img1 if img2 is None else img2
        imgf, _ = self._apply(state.params, state.batch_stats, img1, img2,
                              train=False)
        if self._bundle_takes_mask:
            _, parts = self.loss_bundle(img1, tgt2, imgf, mask=mask)
        else:               # custom bundle without mask support
            _, parts = self.loss_bundle(img1, tgt2, imgf)
        return parts, imgf

    def _fast_scope(self):
        from ..ops.layers import fast_training
        return fast_training(self.fast)

    def train_step(self, state, batch):
        img1, img2 = self._unpack(batch)
        with self._fast_scope():
            return self._train_step(state, img1, img2)

    def _train_multi_impl(self, state, imgs1, imgs2):
        imgf0 = jnp.zeros(imgs1.shape[1:], jnp.float32)

        def body(carry, xs):
            st, _ = carry
            a = xs[0]
            b = xs[1] if imgs2 is not None else None
            st, parts, imgf = self._train_step_impl(st, a, b)
            return (st, imgf), parts

        xs = (imgs1,) if imgs2 is None else (imgs1, imgs2)
        (state, imgf), parts = jax.lax.scan(body, (state, imgf0), xs)
        return state, parts, imgf

    def train_steps(self, state, batches):
        """K chained steps in ONE dispatch (lax.scan over stacked
        (K, B, ...) batches): the reference hot-loop config (bs16 64x64
        patches, train.py:37-133) is dispatch-overhead-bound on TPU —
        each step is ~tens of us of real work behind ~ms of per-call
        runtime. Returns (state, per-step loss parts stacked (K,),
        last step's fused output)."""
        img1, img2 = self._unpack(batches)
        with self._fast_scope():
            return self._train_multi(state, img1, img2)

    def valid_step(self, state, batch, mask=None):
        """mask: optional (N,) 0/1 array excluding wrap-padded samples from
        the loss average (exact partial-batch semantics, reference
        train.py:82-90)."""
        img1, img2 = self._unpack(batch)
        with self._fast_scope():
            return self._valid_step(state, img1, img2, mask)
