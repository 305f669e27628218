"""Configurable conv layer — the innermost building block of every model.

TPU-native re-design of the reference's `ConvLayer` (reference
core/block.py:26-118): NHWC layout (channels-last is the TPU/XLA-friendly
layout — the C dim maps to vector lanes / MXU columns), explicit reflect
padding + VALID conv (XLA convs have no reflect mode), and initializers
matching the reference's activation-keyed scheme:

- ReLU/ReLU6/Hardswish/SiLU/GELU -> Kaiming normal (fan_in, gain^2 = 2)
- LeakyReLU(0.2)                 -> Kaiming normal (gain^2 = 2/(1+0.2^2))
- Tanh                           -> Xavier normal (gain = 5/3)
- other/None                     -> torch Conv2d default
                                    (kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in)))
- bias -> zeros (block.py:113-114)
"""

import contextlib
import contextvars
import math
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

# Opt-in fast inference: routes eligible convs (stride 1, groups 1, odd k,
# C_in >= 8) through the shifted-GEMM Pallas kernel (ops/pallas/
# conv_kernel.py). Forward-only — the kernel has no VJP — so it is enabled
# per-scope by the serving/bench paths, never during training.
_FAST_INFERENCE = contextvars.ContextVar("mmif_fast_inference",
                                         default=False)

# Opt-in fast training: routes eligible convs through the differentiable
# kernel wrapper (ops/pallas/conv_vjp.conv_valid_fast — custom VJP with a
# Pallas dx conv and big-K einsum dw). Enabled by the train CLI/bench.
_FAST_TRAINING = contextvars.ContextVar("mmif_fast_training",
                                        default=False)


@contextlib.contextmanager
def fast_inference(enable=True):
    token = _FAST_INFERENCE.set(enable)
    try:
        yield
    finally:
        _FAST_INFERENCE.reset(token)


@contextlib.contextmanager
def fast_training(enable=True):
    token = _FAST_TRAINING.set(enable)
    try:
        yield
    finally:
        _FAST_TRAINING.reset(token)


def chain_ready(allow_quant=False):
    """True when the NCHW-resident conv chain (guard layout,
    ops/pallas/conv_kernel.conv_tlane_chain) is usable: fast-inference
    scope on a TPU backend. Models with elementwise/concat fusion use it
    to run their whole forward without per-layer pads/transposes.

    MMIF_CHAIN_INTERPRET=1 forces the chain on any backend with the
    kernels in interpret mode — CPU model-level parity tests only."""
    from .quant import quant_ctx
    if quant_ctx() is not None and not allow_quant:
        # int8 inference replaces convs at the NHWC dispatch point
        # (ops/quant.py); the bf16 chain fast paths must step aside so
        # every conv reaches it — EXCEPT for models that run the int8
        # H-major chain themselves (allow_quant=True; DeepFuse +
        # ops/pallas/hiw_int8.py)
        return False
    if os.environ.get("MMIF_CHAIN_INTERPRET"):
        return _FAST_INFERENCE.get()
    return (_FAST_INFERENCE.get()
            and not os.environ.get("MMIF_NO_PALLAS")
            and jax.default_backend() == "tpu")


def _dma_scratch_est(c_in, c_out, k, rows, wp_raw):
    """Nominal VMEM bytes conv_tlane_dma will ask for (scratch_shapes +
    resident weights + the kw-chunk dot temp), mirroring the kernel's
    geometry (ops/pallas/conv_kernel.py:216-223). Wide layers (UNFusion's
    1280-ch decode convs under height tiling) reach ~99 MiB against the
    kernel's 100 MiB scoped limit and fail to compile — those must take
    the XLA conv instead (respectable at c>=128, ~20 TF)."""
    w_out128 = -(-(wp_raw - (k - 1)) // 128) * 128
    wp = -(-(w_out128 + k - 1) // 128) * 128
    tdma = -(-(rows + k - 1) // 8) * 8
    t = 2 * c_in * tdma * wp * 2
    a = k * c_in * rows * wp * 2
    acc = c_out * rows * w_out128 * 4
    stage = 2 * c_out * rows * w_out128 * 2
    wm = (k * c_in) * (k * c_out) * 2
    p = min(7, k) * c_out * rows * wp * 4
    return t + a + acc + stage + wm + p


_DMA_SCRATCH_BUDGET = 88 * 1024 * 1024


def depthwise_conv_shifted(x, kernel, stride=1, dilation=1):
    """Multiplier-1 depthwise conv as k^2 shifted multiply-accumulates.

    XLA's grouped-conv lowering on TPU effectively densifies the
    block-diagonal kernel, inflating the dw conv's work by ~C — the
    MetaFormer-family blocks (reference core/block.py:154-352, dw convs
    in SepConv/MixConv/Res2Conv) are why MyFusion ran at ~1% of its
    FLOP roofline. As shifted MACs the op is k^2 fused VPU passes over
    the map: same taps, same math (fp reassociation only).

    x: (B, Hp, Wp, C) already padded; kernel: (k, k, 1, C) HWIO with
    in_ch//groups == 1. Differentiable (slices + multiplies)."""
    k = kernel.shape[0]
    b, hp, wp, c = x.shape
    eff = (k - 1) * dilation + 1
    ho = (hp - eff) // stride + 1
    wo = (wp - eff) // stride + 1
    y = None
    for th in range(k):
        for tw in range(k):
            xs = jax.lax.slice(
                x, (0, th * dilation, tw * dilation, 0),
                (b, th * dilation + (ho - 1) * stride + 1,
                 tw * dilation + (wo - 1) * stride + 1, c),
                (1, stride, stride, 1))
            t = xs * kernel[th, tw, 0][None, None, None, :].astype(x.dtype)
            y = t if y is None else y + t
    return y


def transpose_conv_s2(x, w):
    """ConvTranspose2d(ksize=3, stride=2, padding=1, output_padding=1)
    — torch semantics, out = 2*in — as four subpixel phase dots plus an
    interleave (reference core/block.py:58-66 constructs it via
    nn.ConvTranspose2d; SEDRFuse is the only user, core/model.py:260-263).

    With the flipped kernel wf, the lhs-dilated formulation reads a
    zero-stuffed input whose nonzeros sit at even offsets, so an output
    pixel at subpixel parity (di, dj) only ever meets the wf taps of
    that same parity: even->wf[1], odd->wf[0], wf[2] per axis. Each
    phase is then a sum of shifted 1x1 dots over the ORIGINAL (dense)
    input — MXU matmuls with no dilation scatter — interleaved back
    2x2 subpixel-style. Exact same math as the lhs-dilated conv
    (tests/test_layers.py parity), differentiable, any backend."""
    b, h, wd, c = x.shape
    wf = jnp.flip(w, axis=(0, 1)).astype(x.dtype)
    xp = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))

    def dot(a, m):
        return jnp.einsum("bhwc,cd->bhwd", a, m)

    ee = dot(x, wf[1, 1])
    eo = dot(x, wf[1, 0]) + dot(xp[:, :h, 1:], wf[1, 2])
    oe = dot(x, wf[0, 1]) + dot(xp[:, 1:, :wd], wf[2, 1])
    oo = (dot(x, wf[0, 0]) + dot(xp[:, :h, 1:], wf[0, 2])
          + dot(xp[:, 1:, :wd], wf[2, 0]) + dot(xp[:, 1:, 1:], wf[2, 2]))
    row_e = jnp.stack([ee, eo], axis=3).reshape(b, h, 2 * wd, -1)
    row_o = jnp.stack([oe, oo], axis=3).reshape(b, h, 2 * wd, -1)
    return jnp.stack([row_e, row_o], axis=2).reshape(b, 2 * h, 2 * wd, -1)


def _pallas_conv_eligible(in_ch, ksize, stride, groups, dilation,
                          transpose):
    if not (_FAST_INFERENCE.get() or _FAST_TRAINING.get()) \
            or os.environ.get("MMIF_NO_PALLAS"):
        return False
    if jax.default_backend() != "tpu":
        return False
    # in_ch >= 1: even the 1-channel stem conv measured faster through the
    # kernel (10.6 vs 16.4 ms at b16 full-res) — both are latency-bound,
    # but XLA's c_in=1 lowering is worse (docs/PERFORMANCE.md round 2)
    return (not transpose and stride == 1 and groups == 1 and dilation == 1
            and ksize in (3, 5, 7))

# ---------------------------------------------------------------------------
# activations
# ---------------------------------------------------------------------------


def relu6(x):
    return jnp.minimum(jnp.maximum(x, 0.0), 6.0)


def hardswish(x):
    return x * jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


# activations the Pallas conv kernel can apply in its staging epilogue
# (ops/pallas/conv_kernel._apply_act)
_FUSABLE_ACTS = ("relu", "relu6", "lrelu", "tanh")

ACTS = {
    "relu": jax.nn.relu,
    "relu6": relu6,
    "lrelu": lambda x: jax.nn.leaky_relu(x, 0.2),
    "tanh": jnp.tanh,
    "hswish": hardswish,
    "silu": jax.nn.silu,
    "gelu": jax.nn.gelu,
    None: lambda x: x,
}

_KAIMING_FAMILY = ("relu", "relu6", "hswish", "silu", "gelu")


def get_act(name):
    if callable(name):
        return name
    if name not in ACTS:
        raise ValueError(f"unknown activation {name!r}")
    return ACTS[name]


def kernel_init_for(act):
    """Activation-keyed initializer (reference core/block.py:101-111)."""
    if act in _KAIMING_FAMILY:
        return nn.initializers.variance_scaling(2.0, "fan_in", "normal")
    if act == "lrelu":
        return nn.initializers.variance_scaling(2.0 / (1.0 + 0.2 ** 2),
                                                "fan_in", "normal")
    if act == "tanh":
        gain = 5.0 / 3.0
        return nn.initializers.variance_scaling(gain ** 2, "fan_avg",
                                                "normal")
    # torch default: kaiming_uniform(a=sqrt(5)) -> U(+-1/sqrt(fan_in))
    return nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


# ---------------------------------------------------------------------------
# padding helpers
# ---------------------------------------------------------------------------


def pad2d(x, pad, mode="reflect"):
    """Pad H and W of an NHWC array. `pad` is (lo, hi) for both dims or a
    4-tuple (w_lo, w_hi, h_lo, h_hi) in the torch F.pad order."""
    if isinstance(pad, int):
        pw = ph = (pad, pad)
    elif len(pad) == 2:
        pw = ph = tuple(pad)
    else:
        pw = (pad[0], pad[1])
        ph = (pad[2], pad[3])
    if max(ph) == 0 and max(pw) == 0:
        return x
    cfg = [(0, 0), ph, pw, (0, 0)]
    if mode == "zeros":
        return jnp.pad(x, cfg)
    return jnp.pad(x, cfg, mode=mode)


# ---------------------------------------------------------------------------
# norm layers
# ---------------------------------------------------------------------------


class ChannelLayerNorm(nn.Module):
    """LayerNorm over the channel axis only, per spatial position (reference
    core/block.py:472-500: normalized_dim=(1,) in NCHW == axis -1 in NHWC).
    Scale on, bias off by default, eps 1e-6 — matching the reference."""

    features: int
    use_scale: bool = True
    use_bias: bool = False
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x, train=False):
        c = x - x.mean(axis=-1, keepdims=True)
        s = jnp.mean(c * c, axis=-1, keepdims=True)
        y = c * jax.lax.rsqrt(s + self.eps)
        if self.use_scale:
            w = self.param("scale", nn.initializers.ones, (self.features,))
            y = y * w
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b
        return y


def make_norm(kind, features, name=None):
    """norm factory: kind in {None, 'batch', 'group', 'layer'}.

    'batch' == torch BatchNorm2d (eps 1e-5, momentum 0.1); under pjit the
    batch statistics reduce over the *global* (sharded) batch, so multi-chip
    training gets SyncBatchNorm semantics for free (reference train.py:296).
    'group' == torch GroupNorm(C, C) as used by SEDRFuse — per-channel
    instance norm.
    """
    if kind is None:
        return None
    if kind == "batch":
        return nn.BatchNorm(use_running_average=None,
                            momentum=0.9,
                            epsilon=1e-5,
                            name=name)
    if kind == "group":
        return nn.GroupNorm(num_groups=features, epsilon=1e-5, name=name)
    if kind == "layer":
        return ChannelLayerNorm(features, name=name)
    raise ValueError(f"unknown norm {kind!r}")


def apply_norm(norm, x, train):
    if norm is None:
        return x
    if isinstance(norm, nn.BatchNorm):
        return norm(x, use_running_average=not train)
    return norm(x)


# ---------------------------------------------------------------------------
# ConvLayer
# ---------------------------------------------------------------------------


class _BNParams(nn.Module):
    """Declares a BatchNorm's parameter/stat tree (same names and paths as
    nn.BatchNorm: params scale/bias, batch_stats mean/var) WITHOUT applying
    it — used to fold eval-mode BN into the preceding conv's weights on
    the fast inference paths."""

    features: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones, (self.features,))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((self.features,)))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((self.features,)))
        return s, b, mean.value, var.value


class ConvLayer(nn.Module):
    """conv( + pre/post norm + act) with reflect 'SAME' padding by default.

    Mirrors the reference ConvLayer contract (core/block.py:26-99):
    `padding=None` -> ksize//2 on each side; `bias=None` -> bias unless both
    norm and pre_norm are batch norm; transpose conv (SEDRFuse) uses
    k=3,s=2,p=1,output_padding=1 arithmetic (exactly 2x upsampling) with
    zero padding.
    """

    out_ch: int
    ksize: int = 3
    stride: int = 1
    padding: Optional[int] = None
    dilation: int = 1
    groups: int = 1
    use_bias: Optional[bool] = None
    norm: Optional[str] = None
    pre_norm: Optional[str] = None
    transpose: bool = False
    act: Optional[str] = "relu"
    pad_mode: str = "reflect"

    @nn.compact
    def __call__(self, x, train=False, chain_hw=None, chain_fuse_n=0,
                 chain_defer_in_ch=None, chain_s2d=0):
        pad = self.ksize // 2 if self.padding is None else self.padding
        bias = self.use_bias
        if bias is None:
            bias = not (self.norm == "batch" and self.pre_norm == "batch")

        if chain_hw is not None:
            # x is a guard-layout (B, C, HG, Wp) chain tensor (see
            # conv_kernel.conv_tlane_chain) — or a tuple of them: a conv is
            # linear in input channels, so conv(concat(parts)) is computed
            # as a sum of per-part convs without ever materializing the
            # concat (the nest/FS decoders' full-res concats reach
            # multi-GB; MAFusion's scale-0 DB concat alone is 2.7 GB).
            # Reflect-SAME convs (k1 runs as a channel matmul, no halo);
            # eval-mode BatchNorm folds into the conv weights (y*g + t
            # with g = scale/sqrt(var+eps))
            parts = x if isinstance(x, (tuple, list)) else None
            # depthwise layers may DEFER through here (the H-major kernel
            # runs them as diagonal banded dots, hiw_kernel); only the
            # eager chain path requires ungrouped convs
            dw_defer = (self.groups > 1 and chain_defer_in_ch is not None
                        and self.groups == chain_defer_in_ch == self.out_ch)
            # strided dw (ksize == stride, padding 0: the TransitionBlock
            # down) may also DEFER — the caller runs it as a weighted
            # stride-pool on the valid view (hiw_scale.hiw_stride_dw)
            sdw_defer = (dw_defer and self.stride == self.ksize
                         and self.padding == 0)
            assert (self.pre_norm is None and not self.transpose
                    and (self.stride == 1 or sdw_defer)
                    and (self.groups == 1 or dw_defer)
                    and self.dilation == 1 and not train
                    and (self.ksize == 1 or sdw_defer
                         or pad == self.ksize // 2)
                    and self.norm in (None, "batch")
                    # chain halos are reflect-mirrored (chain_refresh_halo);
                    # a zero/constant-pad layer must not take this path
                    and (self.ksize == 1 or sdw_defer
                         or self.pad_mode == "reflect"))
            assert parts is None or (chain_defer_in_ch is None
                                     and not chain_fuse_n)
            from .pallas.conv_kernel import conv_tlane_chain

            in_ch = ((sum(p.shape[1] for p in parts) if parts is not None
                      else x.shape[1]) if chain_defer_in_ch is None
                     else chain_defer_in_ch)
            # space-to-depth packed chain (ops/s2d.py): x carries f^2
            # phase channels per original channel and chain_hw is the
            # PACKED (h/f, w/f); params keep the ORIGINAL shape and the
            # kernel/bias are packed at trace time
            f = chain_s2d if chain_s2d and chain_s2d > 1 else 1
            if f > 1:
                assert f == 2 and parts is None \
                    and chain_defer_in_ch is None and not self.norm
                in_ch //= f * f
            kernel = self.param(
                "kernel", kernel_init_for(self.act),
                (self.ksize, self.ksize, in_ch // self.groups,
                 self.out_ch))
            b = self.param("bias", nn.initializers.zeros,
                           (self.out_ch,)) if bias else None
            if self.norm == "batch":
                s, bn_b, mu, var = _BNParams(self.out_ch, name="norm")()
                g = s * jax.lax.rsqrt(var + 1e-5)
                kernel = kernel * g
                eff_bias = ((b if b is not None else 0.0) - mu) * g + bn_b
            else:
                eff_bias = b
            if f > 1:
                from .s2d import (s2d_pack_bias, s2d_pack_weights,
                                  s2d_span)
                k_run = s2d_span(self.ksize, f)
                kernel = s2d_pack_weights(kernel, f)
                if eff_bias is not None:
                    eff_bias = s2d_pack_bias(eff_bias, f)
                c_out_run = self.out_ch * f * f
            else:
                k_run, c_out_run = self.ksize, self.out_ch
            h, w = chain_hw

            if chain_defer_in_ch is not None:
                # fused-pair mode (conv_tlane_chain_pair): hand the folded
                # kernel/bias back to the model, which feeds two adjacent
                # layers through one strip kernel. Depthwise layers hand
                # back (k, k, C) for the diagonal-band hiw path.
                if dw_defer:
                    return kernel[:, :, 0, :], eff_bias, self.ksize, \
                        self.act
                return kernel, eff_bias, self.ksize, self.act

            if self.ksize == 1:
                if parts is not None:
                    y, ofs = None, 0
                    for p_ in parts:
                        c = p_.shape[1]
                        yi = jnp.einsum(
                            "bchw,cd->bdhw", p_,
                            kernel[0, 0, ofs:ofs + c].astype(p_.dtype))
                        y = yi if y is None else y + yi
                        ofs += c
                else:
                    if chain_fuse_n:
                        x = x[:chain_fuse_n] + x[chain_fuse_n:]
                    y = jnp.einsum("bchw,cd->bdhw", x,
                                   kernel[0, 0].astype(x.dtype))
                if eff_bias is not None:
                    y = y + eff_bias[None, :, None, None].astype(y.dtype)
                return get_act(self.act)(y)

            fuse_ba = self.act is None or self.act in _FUSABLE_ACTS

            wp_l = (parts[0] if parts is not None else x).shape[3]
            esz = 2  # bf16

            # kw_chunk sizes the f32 partial-product temp (kw_chunk *
            # c_out * rows * wp * 4 — 23.6M at UNFusion's c_out=640 k3
            # scale-2 layer, the term the round-3 vmem OOMs traced to).
            # Chunking kw shrinks the dot's M to kw_chunk*c_out, which only
            # starves the MXU when c_out is small — big-c_out layers take
            # kw_chunk=1 with the acc epilogue; everything else takes the
            # 'ssa' roll-sum epilogue (measured +1..8% over acc, never
            # worse — tools/probe_epilogue.py round 3).
            big_out = c_out_run >= 128 and f == 1
            kwc = 1 if big_out else k_run
            epi = "acc" if big_out else "ssa"
            # packed chains may default to a raised budget (packed dec0
            # c128 k5 needs 60.8M for rows=16+ssa; constant set by the
            # measured winner, see ops/s2d.py)
            from .s2d import S2D_VMEM_BUDGET
            budget = int(os.environ.get(
                "MMIF_CHAIN_VMEM_BUDGET",
                55 * 1024 * 1024 if f == 1 else S2D_VMEM_BUDGET))
            interp = bool(os.environ.get("MMIF_CHAIN_INTERPRET"))

            def _scratch_est(rows, c, fuse_n):
                # VMEM-aware strip height: rows=16 is the measured optimum
                # for the fat full-res layers, but wide layers blow the
                # scoped-vmem budget at rows=16 (Mosaic's accounting runs
                # ~1.6x the nominal bytes) — estimate t + a + acc + stage
                tdma = -(-(8 + rows + k_run // 2) // 8) * 8
                n_slots = 4 if fuse_n else 2
                t = n_slots * c * tdma * wp_l * esz
                a = k_run * c * rows * wp_l * esz
                stage = 2 * c_out_run * rows * wp_l * esz
                if epi == "ssa":
                    # full-k dot temp + ~2 roll temps; no acc buffer
                    p = (k_run + 2) * c_out_run * rows * wp_l * 4
                    acc = 0
                else:
                    p = min(kwc, k_run) * c_out_run * rows * wp_l * 4
                    acc = c_out_run * rows * wp_l * 4
                return t + a + acc + stage + p

            def _conv_one(xp, kp, bias_, act_, fuse_n):
                # One chain conv (no concat semantics), picking per-input
                # strip height and fallbacks by the vmem estimate.
                c_in = xp.shape[1]
                rows = 16 if _scratch_est(16, c_in, fuse_n) <= budget else 8
                if _scratch_est(rows, c_in, fuse_n) <= budget:
                    # halo=True mirrors the reflect halo in-kernel: the
                    # XLA chain_refresh_halo costs ~15 ms/layer at full
                    # res (docs/PERFORMANCE.md round-3 profile). fuse_n
                    # folds a preceding elementwise-sum siamese fusion
                    # into this conv's input DMA.
                    return conv_tlane_chain(
                        xp, kp.astype(xp.dtype), k_run, h=h,
                        w_valid=w, bias=bias_, act=act_, rows=rows,
                        halo=True, kw_chunk=kwc, fuse_n=fuse_n,
                        epilogue=epi, s2d_f=f, interpret=interp)
                # the chunked/XLA fallbacks below are unpacked-only
                # (channel chunks would split phase blocks; the XLA
                # refresh mirrors without phase geometry)
                assert f == 1, ("s2d chain conv exceeds the vmem budget; "
                                "disable MMIF_S2D for this model")
                if bias_ is not None or act_ is not None:
                    y = _conv_one(xp, kp, None, None, fuse_n)
                    if bias_ is not None:
                        y = y + bias_[None, :, None, None].astype(y.dtype)
                    return get_act(act_)(y)
                # Wide layer (nest decoders reach c_in=304+ at full-res
                # lane width): even rows=8 blows the scoped-vmem budget.
                # Two fallbacks:
                # - 2-way c_in chunking (partial convs summed before
                #   bias/act — the conv is linear in input channels) when
                #   that fits;
                # - otherwise XLA's native conv on the (halo-refreshed)
                #   guard tensor: many-chunk splits materialize n full-res
                #   partial outputs (MAFusion's 320->480 scale-0 layer
                #   OOM'd HBM with 12 x 5.4 GB partials), and XLA's conv
                #   lowering is respectable at c>=128 anyway (~20 TF).
                if _scratch_est(8, -(-c_in // 2), fuse_n) <= budget:
                    csz = -(-c_in // 2)
                    y = None
                    for i0 in range(0, c_in, csz):
                        yi = conv_tlane_chain(
                            xp[:, i0:i0 + csz],
                            kp[:, :, i0:i0 + csz].astype(xp.dtype),
                            self.ksize, h=h, w_valid=w, rows=8, halo=True,
                            kw_chunk=kwc, fuse_n=fuse_n, epilogue=epi,
                            interpret=interp)
                        y = yi if y is None else y + yi
                    return y
                from .pallas.chain_ops import chain_place
                from .pallas.conv_kernel import (CHAIN_GUARD, CHAIN_WG,
                                                 chain_refresh_halo)
                if fuse_n:
                    xp = xp[:fuse_n] + xp[fuse_n:]
                p = self.ksize // 2
                xh = chain_refresh_halo(xp, h, w, p)
                v = xh[:, :, CHAIN_GUARD - p:CHAIN_GUARD + h + p,
                       CHAIN_WG - p:CHAIN_WG + w + p]
                y = jax.lax.conv_general_dilated(
                    v, kp.astype(v.dtype), (1, 1), "VALID",
                    dimension_numbers=("NCHW", "HWIO", "NCHW"))
                return chain_place(y)

            if parts is not None:
                # decomposed concat->conv: per-part convs summed, bias/act
                # applied once on the sum
                y, ofs = None, 0
                for p_ in parts:
                    c = p_.shape[1]
                    yi = _conv_one(p_, kernel[:, :, ofs:ofs + c], None,
                                   None, 0)
                    y = yi if y is None else y + yi
                    ofs += c
                if eff_bias is not None:
                    y = y + eff_bias[None, :, None, None].astype(y.dtype)
                return get_act(self.act)(y)

            y = _conv_one(x, kernel,
                          eff_bias if fuse_ba else None,
                          self.act if fuse_ba else None, chain_fuse_n)
            if not fuse_ba:
                if eff_bias is not None:
                    y = y + eff_bias[None, :, None, None].astype(y.dtype)
                y = get_act(self.act)(y)
            return y

        if self.pre_norm is not None:
            pre = make_norm(self.pre_norm, x.shape[-1], name="pre_norm")
            x = apply_norm(pre, x, train)

        if self.is_mutable_collection("quant_stats"):
            # int8 calibration pass (ops/quant.py): record this layer's
            # per-input-channel max-abs, max-reduced across batches (the
            # scales are folded into the weights at inference —
            # conv_int8.fold_input_scales)
            c = x.shape[-1]
            self.sow("quant_stats", "in_amax",
                     jnp.max(jnp.abs(x), axis=(0, 1, 2)),
                     init_fn=lambda: jnp.zeros((c,), jnp.float32),
                     reduce_fn=jnp.maximum)

        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", kernel_init_for(self.act),
            (self.ksize, self.ksize, in_ch // self.groups, self.out_ch))
        b = self.param("bias", nn.initializers.zeros,
                       (self.out_ch,)) if bias else None

        from .quant import quant_ctx, quant_skipped
        qc = quant_ctx()
        if qc is not None and quant_skipped(self.path):
            qc = None  # MMIF_INT8_SKIP: this layer stays bf16/f32
        if (qc is not None and not train and not self.transpose
                and self.stride == 1 and self.groups == 1
                and self.dilation == 1 and pad == self.ksize // 2
                and not os.environ.get("MMIF_NO_PALLAS")
                and (jax.default_backend() == "tpu"
                     or os.environ.get("MMIF_CHAIN_INTERPRET")
                     or os.environ.get("MMIF_INT8_FAKE"))):
            # int8 inference (ops/quant.py): symmetric max-abs weights
            # per-output-channel, activations per-tensor with the
            # calibrated static amax (dynamic-max fallback when this
            # layer wasn't calibrated); int8 x int8 -> int32 MXU dot with
            # an f32 dequant + bias + act epilogue
            from .pallas.conv_int8 import (choose_fold, conv_tlane_dma_q,
                                           fold_weights,
                                           quantize_input_scaled,
                                           quantize_weights)

            if pad:
                x = pad2d(x, pad, self.pad_mode)
            a_in = qc.get("/".join(self.path))
            if a_in is None:            # uncalibrated: dynamic per-channel
                a_in = jnp.max(jnp.abs(x), axis=(0, 1, 2))
            f = choose_fold(a_in, kernel,
                            mode=os.environ.get("MMIF_INT8_FOLD",
                                                "smooth"))
            qx = quantize_input_scaled(x, f)
            qw, sw = quantize_weights(fold_weights(kernel, f))
            if os.environ.get("MMIF_INT8_FAKE"):
                # Fake-quant emulation of the int8 kernel's exact scheme
                # (same quantizers, float conv of the dequantized values;
                # the int32 dot is exact, so this matches the kernel up
                # to f32 conv rounding). CPU-runnable: acceptance
                # experiments + numerics tests without TPU.
                x_dq = qx.astype(jnp.float32) \
                    * f.reshape(1, 1, 1, -1).astype(jnp.float32)
                w_dq = qw.astype(jnp.float32) \
                    * sw.reshape(1, 1, 1, -1).astype(jnp.float32) \
                    / f.reshape(1, 1, -1, 1).astype(jnp.float32)
                y = jax.lax.conv_general_dilated(
                    x_dq, w_dq, (1, 1), "VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                # mirror the kernel epilogue order: bias/norm in f32,
                # output cast LAST (ADVICE r4 — casting before the bias
                # was a small emulation mismatch in bf16 runs)
                if b is not None:
                    y = y + b.astype(jnp.float32)
                if self.norm is not None:
                    post = make_norm(self.norm, self.out_ch, name="norm")
                    y = apply_norm(post, y, train)
                return get_act(self.act)(y).astype(x.dtype)
            fuse_q = self.norm is None and \
                (self.act is None or self.act in _FUSABLE_ACTS)
            y = conv_tlane_dma_q(
                qx, qw, sw, self.ksize,
                bias=b if fuse_q else None,
                act=self.act if fuse_q else None,
                out_dtype=x.dtype,
                interpret=bool(os.environ.get("MMIF_CHAIN_INTERPRET")))
            if fuse_q:
                return y
            if b is not None:
                y = y + b.astype(y.dtype)
            if self.norm is not None:
                post = make_norm(self.norm, self.out_ch, name="norm")
                y = apply_norm(post, y, train)
            return get_act(self.act)(y)

        if not self.transpose:
            use_pallas = (_pallas_conv_eligible(in_ch, self.ksize,
                                                self.stride, self.groups,
                                                self.dilation, self.transpose)
                          and pad == self.ksize // 2)
            if pad:
                x = pad2d(x, pad, self.pad_mode)
            dma_rows = 16 if in_ch <= 32 else 8
            if use_pallas and _dma_scratch_est(
                    in_ch, self.out_ch, self.ksize, dma_rows,
                    x.shape[2]) > _DMA_SCRATCH_BUDGET:
                use_pallas = False
            # bias + act fuse into the kernel epilogue when no post-norm
            # sits between them (saves one elementwise HBM round trip)
            fuse_ba = (use_pallas and self.norm is None
                       and (self.act is None or self.act in _FUSABLE_ACTS))
            fast_route = use_pallas and _FAST_TRAINING.get() and train
            if fast_route:
                # differentiable kernel route: bias/norm/act stay as XLA
                # ops below (autodiff handles them; the conv dominates).
                # Over-budget layers (UNFusion's 1280-ch full-res decode,
                # config #4) register-spill in Mosaic — those stay on the
                # XLA conv in the else branch, which is differentiable.
                from .pallas.conv_vjp import conv_fast_fits, conv_valid_fast

                fast_route = conv_fast_fits(in_ch, self.out_ch, x.shape[2],
                                            self.ksize, x.dtype.itemsize)
            if fast_route:
                y = conv_valid_fast(x, kernel.astype(x.dtype), self.ksize)
            elif use_pallas and not (_FAST_TRAINING.get() and train):
                from .pallas.conv_kernel import conv_tlane_dma

                # rows=16 is the measured sweet spot at c<=32; larger
                # channel counts get rows=8 to stay inside VMEM
                y = conv_tlane_dma(x, kernel.astype(x.dtype), self.ksize,
                                   bias=b if fuse_ba else None,
                                   act=self.act if fuse_ba else None,
                                   rows=dma_rows)
                if fuse_ba:
                    return y
            elif self.groups > 1 and self.groups == in_ch \
                    and self.out_ch == in_ch \
                    and os.environ.get("MMIF_DW_SHIFTED", "0") != "0":
                # default OFF: the round-4 queue-12 A/B measured the
                # shifted form LOSING end to end (myfusion b8 10.62 vs
                # 16.10 pairs/s with XLA's grouped conv,
                # docs/r4_queue_results.log) — the per-op win didn't
                # survive XLA's fusion decisions around it.
                # MMIF_DW_SHIFTED=1 re-enables for probes.
                y = depthwise_conv_shifted(x, kernel, stride=self.stride,
                                           dilation=self.dilation)
            else:
                y = jax.lax.conv_general_dilated(
                    x,
                    kernel.astype(x.dtype),
                    window_strides=(self.stride, self.stride),
                    padding="VALID",
                    rhs_dilation=(self.dilation, self.dilation),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    feature_group_count=self.groups,
                )
        elif self.ksize == 3 and self.stride == 2 and pad == 1 \
                and self.groups == 1 \
                and os.environ.get("MMIF_SUBPIXEL_DECONV", "0") != "0":
            # default OFF: the round-4 queue-12 A/B measured subpixel
            # phases LOSING end to end (sedrfuse b8 28.82 vs 37.81
            # pairs/s with the lhs-dilated XLA conv,
            # docs/r4_queue_results.log). MMIF_SUBPIXEL_DECONV=1
            # re-enables for probes. The formulation: the zoo's only
            # transpose config (SEDRFuse dec0/dec1, reference
            # core/model.py:260-263) as four shifted 1x1-dot phases
            # interleaved back subpixel-style — all MXU matmuls, no
            # dilation scatter (per-op 1.8-3.2x, tools/probe_sedr.py).
            y = transpose_conv_s2(x, kernel)
        else:
            # torch ConvTranspose2d(k, s, p, output_padding=1): out = in * s
            # == lhs-dilated conv with spatially flipped kernel and
            # padding (k-1-p, k-1-p+op) on each spatial dim.
            k, s, op = self.ksize, self.stride, 1
            lo = k - 1 - pad
            hi = k - 1 - pad + op
            y = jax.lax.conv_general_dilated(
                x,
                jnp.flip(kernel, axis=(0, 1)).astype(x.dtype),
                window_strides=(1, 1),
                padding=((lo, hi), (lo, hi)),
                lhs_dilation=(s, s),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if b is not None:
            y = y + b

        if self.norm is not None:
            post = make_norm(self.norm, self.out_ch, name="norm")
            y = apply_norm(post, y, train)

        return get_act(self.act)(y)


# ---------------------------------------------------------------------------
# pooling / resize primitives (NHWC)
# ---------------------------------------------------------------------------


def max_pool(x, window, stride=None):
    stride = stride or window
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        (1, window, window, 1), (1, stride, stride, 1), "VALID")


def avg_pool(x, window, stride=None):
    stride = stride or window
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add,
        (1, window, window, 1), (1, stride, stride, 1), "VALID")
    return s / float(window * window)


# Height-tile context (parallel/tiling.py): while a decoder runs on a
# height slab, bilinear align_corners weights must come from the FULL
# image geometry (the (H_in-1)/(H_out-1) ratio and the absolute row
# position are global), or the slab output drifts from the whole-image
# forward. The tiling driver sets this to (abs_start_rows, slab_h, full_h)
# — all in full-resolution rows; every slab tensor of height h is then at
# scale s = slab_h // h with absolute start abs_start // s.
_TILE_ROWS_CTX = None


class tile_rows_ctx:
    """Context manager used by parallel.tiling during slab decode tracing."""

    def __init__(self, abs_start, slab_h, full_h):
        self.val = (abs_start, int(slab_h), int(full_h))

    def __enter__(self):
        global _TILE_ROWS_CTX
        self._prev = _TILE_ROWS_CTX
        _TILE_ROWS_CTX = self.val
        return self

    def __exit__(self, *exc):
        global _TILE_ROWS_CTX
        _TILE_ROWS_CTX = self._prev
        return False


def interpolate(x, scale_factor, mode="nearest"):
    """torch nn.Upsample semantics on NHWC: 'nearest' (floor mapping) or
    'bilinear' with align_corners=True (reference core/block.py:965-973)."""
    n, h, w, c = x.shape
    oh, ow = h * scale_factor, w * scale_factor
    if mode == "nearest":
        return jnp.repeat(jnp.repeat(x, scale_factor, axis=1),
                          scale_factor, axis=2)
    if mode == "bilinear":
        def axis_weights(insize, outsize):
            if outsize == 1 or insize == 1:
                lo = jnp.zeros((outsize,), jnp.int32)
                return lo, lo, jnp.zeros((outsize,), x.dtype)
            src = jnp.arange(outsize, dtype=jnp.float32) * (
                (insize - 1) / (outsize - 1))
            lo = jnp.floor(src).astype(jnp.int32)
            lo = jnp.clip(lo, 0, insize - 2)
            t = (src - lo).astype(x.dtype)
            return lo, lo + 1, t

        if _TILE_ROWS_CTX is not None:
            # slab-local H weights from the full-image geometry; bit-equal
            # to slicing the whole-image interpolate (tests/test_tiling.py)
            abs_start, slab_h, full_h = _TILE_ROWS_CTX
            if slab_h % h:
                raise ValueError(
                    f"tiled bilinear: slab height {slab_h} not a multiple "
                    f"of feature height {h}")
            s_in = slab_h // h
            if s_in % scale_factor:
                raise ValueError(
                    f"tiled bilinear: input scale {s_in} not divisible by "
                    f"scale_factor {scale_factor}")
            s_out = s_in // scale_factor
            h_in_full, h_out_full = full_h // s_in, full_h // s_out
            a_in = abs_start // s_in
            a_out = abs_start // s_out
            # same f32 arithmetic as the whole-image path: exact-int f32
            # row index times the same weak-typed ratio
            src = (a_out + jnp.arange(oh, dtype=jnp.float32)) * (
                (h_in_full - 1) / (h_out_full - 1))
            lo_abs = jnp.clip(jnp.floor(src).astype(jnp.int32), 0,
                              h_in_full - 2)
            ht = (src - lo_abs).astype(x.dtype)
            # local clamp only protects halo rows that are discarded anyway
            hlo = jnp.clip(lo_abs - a_in, 0, h - 2)
            hhi = hlo + 1
            wlo, whi, wt = axis_weights(w, ow)
        else:
            hlo, hhi, ht = axis_weights(h, oh)
            wlo, whi, wt = axis_weights(w, ow)
        top = x[:, hlo][:, :, wlo] * (1 - wt)[None, None, :, None] + \
            x[:, hlo][:, :, whi] * wt[None, None, :, None]
        bot = x[:, hhi][:, :, wlo] * (1 - wt)[None, None, :, None] + \
            x[:, hhi][:, :, whi] * wt[None, None, :, None]
        return top * (1 - ht)[None, :, None, None] + \
            bot * ht[None, :, None, None]
    raise ValueError(f"unknown interpolate mode {mode!r}")
