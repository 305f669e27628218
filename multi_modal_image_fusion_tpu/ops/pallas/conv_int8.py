"""int8 shifted-GEMM conv: the quantized variant of conv_tlane_dma.

The Mosaic int8 probe (docs/PERFORMANCE.md round 3) measured int8 x int8
-> int32 at ~2x bf16 through Pallas blocked matmuls — unlike the XLA dot
lowering (+8% only). This kernel runs the production strip pipeline
(ops/pallas/conv_kernel._conv_kernel_tlane_dma) with:

    x    int8 (pre-padded NHWC, symmetric per-tensor scale sx)
    w    int8 (HWIO, symmetric per-output-channel scales sw[c])
    dot  int8 x int8 -> int32 on the MXU
    epilogue (f32): y = acc * (sx*sw)[c] + bias; activation; cast to
    bf16/f32 out — or requantize to int8 (round/clip by 1/so) for
    full-int8 chains.

int8 geometry differences vs bf16: VMEM tiles are (32, 128), so strip
rows and HBM DMA starts/sizes on the sublane dim are 32-aligned
(rows=32), vs 8 for bf16.

Quantization helpers (`quantize_weights`, `quantize_input`) implement the
symmetric max-abs scheme; accuracy is measured against the bf16 path in
tests/test_int8.py and the model-level budget is reported in
docs/PERFORMANCE.md (reference accuracy contract: BASELINE.json SSIM/Qabf
within 1e-3).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .conv_kernel import _apply_act


def quantize_weights(w):
    """HWIO f32 -> (int8 HWIO, per-output-channel scale (C_out,) f32)."""
    amax = jnp.max(jnp.abs(w), axis=(0, 1, 2))
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def quantize_input(x, amax=None):
    """NHWC float -> (int8, scale). amax: optional calibrated max-abs —
    a scalar (per-tensor) or a (C_in,) vector (per-channel). Defaults to
    the dynamic per-channel max of x. A vector scale means per-channel
    quantization: combine with `smooth_scales` so the weight side stays
    scale-consistent."""
    if amax is None:
        amax = jnp.max(jnp.abs(x), axis=(0, 1, 2))
    amax = jnp.asarray(amax, jnp.float32)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale),
                 -127, 127).astype(jnp.int8)
    return q, scale


def choose_fold(amax, w, mode="smooth", alpha=None, clip=None):
    """Per-input-channel quantization scale f_c for x, consistent with a
    weight fold by the SAME f_c (the int dot's per-channel scales must
    cancel: qx=x/f_c, w_fold=w*f_c, then the per-output-channel weight
    quantizer absorbs the rest and the combined dequant scale is just
    sw[c_out]).

    The choice of f_c trades activation precision against folded-weight
    channel spread. Post-relu feature channels span 100-1000x in range;
    wherever that spread lands, that side's small channels quantize
    poorly — and WEIGHT error is the dangerous kind, because it is
    constant per tap and post-relu activations are non-negative, so it
    adds coherently over the k*k*C_in taps (measured 30% layer error on
    DeepFuse enc1 with a naive full fold). Activation rounding error is
    data-dependent and averages out across taps.

      mode='channel'  f_c = amax_c/127          max x precision, worst w
      mode='tensor'   f_c = max_c amax_c/127    per-tensor x, exact w
      mode='smooth'   f_c = beta*sqrt(amax_c/wmax_c)  (SmoothQuant-style
                      alpha=0.5): folded weight channel max becomes
                      beta*sqrt(amax_c*wmax_c) — both sides carry the
                      square root of the spread. beta is the smallest
                      value keeping every channel clip-free
                      (f_c >= amax_c/127).

    amax: (C_in,) calibrated activation max-abs. w: HWIO float weights.
    Returns f (C_in,) f32; dead channels (amax==0 or wmax==0) get 1.0.

    alpha generalizes the smooth fold, f_c = beta*(amax_c/wmax_c)^alpha
    (0.5 = the SmoothQuant sqrt; ->0 leans precision toward weights,
    ->1 toward activations). clip scales the calibrated amax by a ratio
    <1 BEFORE the fold — the classic outlier-clipping PTQ lever: the
    rare tail values saturate at ±127 while every in-range value gains
    quantizer resolution. Defaults come from MMIF_INT8_ALPHA /
    MMIF_INT8_CLIP (trace-time), else 0.5 / 1.0 (exact prior behavior).
    """
    import os
    if alpha is None:
        alpha = float(os.environ.get("MMIF_INT8_ALPHA", "0.5"))
    if clip is None:
        clip = float(os.environ.get("MMIF_INT8_CLIP", "1.0"))
    amax = jnp.asarray(amax, jnp.float32) * clip
    wmax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=(0, 1, 3))
    live = (amax > 0) & (wmax > 0)
    # dead channels (never-activating post-relu features are common, and
    # amax==0 also happens when a channel is missing from calibration
    # coverage) MUST fall back to the per-tensor scale, not 1.0: a large
    # out-of-family fold factor would dominate the per-output-channel
    # folded-weight max and crush every other channel's weight precision
    # (measured: exactly this turned a 1.2% layer error into 34%).
    g = jnp.max(amax) / 127.0
    g = jnp.where(g > 0, g, 1.0)
    if mode == "channel":
        return jnp.where(amax > 0, amax / 127.0, g)
    if mode == "tensor":
        return jnp.full_like(amax, g)
    ratio = (amax / jnp.where(live, wmax, 1.0)) ** alpha
    # no-clip (relative to the possibly clipped amax):
    # f_c >= amax_c/127  =>  beta >= amax_c^(1-alpha) * wmax_c^alpha /127
    beta = jnp.max(jnp.where(
        live, amax ** (1.0 - alpha) * wmax ** alpha, 0.0)) / 127.0
    f = beta * ratio
    return jnp.where(live, f, g)


def fold_weights(w, f):
    """Fold the per-input-channel x-quant scales into the HWIO weights
    (see choose_fold): returns w*f_c as f32, ready for quantize_weights."""
    return w.astype(jnp.float32) * jnp.asarray(
        f, jnp.float32).reshape(1, 1, -1, 1)


def quantize_input_scaled(x, f):
    """NHWC float -> int8 with an explicit per-channel scale f (C_in,)."""
    q = jnp.clip(jnp.round(x.astype(jnp.float32)
                           / jnp.asarray(f, jnp.float32)),
                 -127, 127).astype(jnp.int8)
    return q


def _conv_kernel_q(*refs, k, rows, hsub, w_out, wp, tdma, c_in, c_out,
                   out_dtype, kw_chunk, has_bias, act, out_scale_inv):
    """int8 strip loop: same structure as _conv_kernel_tlane_dma with an
    int32 accumulator and an f32 dequant epilogue."""
    if has_bias:
        (x_ref, w_ref, s_ref, b_ref, out_ref, t_ref, a_ref, acc_ref,
         stage_ref, in_sems, out_sems) = refs
    else:
        (x_ref, w_ref, s_ref, out_ref, t_ref, a_ref, acc_ref, stage_ref,
         in_sems, out_sems) = refs
        b_ref = None
    b = pl.program_id(0)
    g = pl.program_id(1)
    h0 = g * rows * hsub

    def in_dma(slot, j):
        return pltpu.make_async_copy(
            x_ref.at[b, :, pl.ds(h0 + j * rows, tdma), :],
            t_ref.at[slot], in_sems.at[slot])

    def out_dma(slot, j):
        return pltpu.make_async_copy(
            stage_ref.at[slot],
            out_ref.at[b, :, pl.ds(h0 + j * rows, rows), :],
            out_sems.at[slot])

    in_dma(0, 0).start()

    def strip(j, carry):
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < hsub)
        def _():
            in_dma(1 - slot, j + 1).start()

        in_dma(slot, j).wait()

        for kh in range(k):
            a_ref[kh * c_in:(kh + 1) * c_in, :, :] = \
                t_ref[slot, :, pl.ds(kh, rows), :]
        a = a_ref[:, :, :]
        for kw0 in range(0, k, kw_chunk):
            g_ = min(kw_chunk, k - kw0)
            p = jax.lax.dot_general(
                w_ref[:, kw0 * c_out:(kw0 + g_) * c_out], a,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            for jj in range(g_):
                kw = kw0 + jj
                term = p[jj * c_out:(jj + 1) * c_out, :, kw:kw + w_out]
                if kw == 0:
                    acc_ref[:, :, :] = term
                else:
                    acc_ref[:, :, :] += term

        @pl.when(j >= 2)
        def _():
            out_dma(slot, j - 2).wait()

        y = acc_ref[:, :, :].astype(jnp.float32) * s_ref[:, :, :]
        if has_bias:
            y = y + b_ref[:, :, :]
        y = _apply_act(y, act)
        if out_dtype == jnp.int8:
            y = jnp.clip(jnp.round(y * out_scale_inv), -127, 127)
        stage_ref[slot] = y.astype(out_dtype)
        out_dma(slot, j).start()
        return carry

    jax.lax.fori_loop(0, hsub, strip, 0)
    for tail in (hsub - 2, hsub - 1):
        if tail >= 0:
            out_dma(tail % 2, tail).wait()


@functools.partial(jax.jit,
                   static_argnames=("k", "interpret", "hsub", "kw_chunk",
                                    "rows", "act", "out_dtype",
                                    "out_scale_inv"))
def conv_tlane_dma_q(x, w, scale, k, bias=None, act=None, hsub=None,
                     kw_chunk=7, rows=32, out_dtype=jnp.bfloat16,
                     out_scale_inv=None, interpret=False):
    """Quantized DMA-fed conv. x (B, H+k-1, W+k-1, C_in) int8 pre-padded
    NHWC; w (k, k, C_in, C_out) int8 HWIO; scale (C_out,) f32 — the
    COMBINED dequant scale sx*sw[c]. bias (C_out,) f32 applied after
    dequant; act as in conv_tlane_dma. out_dtype bf16/f32, or int8 with
    `out_scale_inv` = 1/s_out (static float) for requantized chains.
    rows must be a multiple of 32 (int8 sublane tiling)."""
    b, hp, wp_raw, c_in = x.shape
    assert x.dtype == jnp.int8 and w.dtype == jnp.int8
    c_out = w.shape[-1]
    h = hp - (k - 1)
    w_out_final = wp_raw - (k - 1)
    assert rows % 32 == 0, "int8 strips are 32-row aligned"
    if out_dtype == jnp.int8:
        assert out_scale_inv is not None

    w_out128 = -(-w_out_final // 128) * 128
    wp = -(-(w_out128 + k - 1) // 128) * 128
    if hsub is None:
        hsub = -(-h // rows)
    strip = rows * hsub
    grid_h = -(-h // strip)
    tdma = -(-(rows + k - 1) // 32) * 32
    hpad = (grid_h - 1) * strip + (hsub - 1) * rows + tdma - hp
    x = jnp.pad(x, ((0, 0), (0, max(hpad, 0)), (0, wp - wp_raw), (0, 0)))
    xt = jnp.transpose(x, (0, 3, 1, 2))       # (B, C, Hp, wp) int8

    wm = jnp.transpose(w, (0, 2, 1, 3)).reshape(k * c_in, k * c_out)

    kern = functools.partial(
        _conv_kernel_q, k=k, rows=rows, hsub=hsub, w_out=w_out128,
        wp=wp, tdma=tdma, c_in=c_in, c_out=c_out, out_dtype=out_dtype,
        kw_chunk=kw_chunk, has_bias=bias is not None, act=act,
        out_scale_inv=out_scale_inv)
    operands = [xt, wm,
                jnp.asarray(scale, jnp.float32).reshape(c_out, 1, 1)]
    in_specs = [pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM)]
    if bias is not None:
        operands.append(jnp.asarray(bias, jnp.float32).reshape(c_out, 1, 1))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(
            (b, c_out, grid_h * strip, w_out128), out_dtype),
        grid=(b, grid_h),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((2, c_in, tdma, wp), jnp.int8),
            pltpu.VMEM((k * c_in, rows, wp), jnp.int8),
            pltpu.VMEM((c_out, rows, w_out128), jnp.int32),
            pltpu.VMEM((2, c_out, rows, w_out128), out_dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*operands)

    return jnp.transpose(out, (0, 2, 3, 1))[:, :h, :w_out_final, :]
