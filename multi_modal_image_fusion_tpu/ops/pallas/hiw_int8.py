"""int8 halo-in-weights chain conv (round 4).

With the H-major formulation the fat DeepFuse layers are MXU-bound
*including the band zeros* (enc1 at g8 runs ~101 TF of real MXU work;
docs/PERFORMANCE.md round-4 sweep) — exactly the regime where the int8
MXU mode's ~2x rate (tools/probe_int8.py, round 3) finally moves the
end-to-end number. This kernel runs the production H-major strip
pipeline (hiw_kernel._conv_kernel_hiw) with:

    chain tensor   bf16 in / bf16 out (the thin entry/exit layers stay
                   bf16, so the chain dtype contract is unchanged)
    quantize       in-kernel, once per strip: the staged (+fuse-added,
                   halo-mirrored) bf16 window is rounded/clipped to an
                   int8 staging buffer at a 32-aligned base (int8 VMEM
                   tiles are (32, 128); window offsets i0*c_in stay
                   32-aligned by the (g*c_in) % 32 == 0 constraint)
    dot            int8 x int8 -> int32 banded LHS per group
    epilogue       int32 kw roll-sums (no overflow: |acc| <
                   127^2 * gk * c_in < 2^28), one f32 dequant by the
                   per-column (sx * sw[co]) vector, bias, act, bf16 cast

Scales: the NHWC int8 path's SmoothQuant-style scheme
(conv_int8.choose_fold, alpha=0.5): per-INPUT-channel activation scales
f_c from the CALIBRATED amax (ops/quant.py), the same f_c folded into
the weights before per-output-channel weight quantization — the int
dot's channel scales cancel and the dequant stays a per-column sw[co]
vector. In-kernel the strip quantize is one multiply by the tiled
1/f_c row vector (channels interleave along rows in H-major). Per-
tensor activation scales measured ~3%/layer on DeepFuse; smooth fold
is the scheme the NHWC path shipped with (naive fold measured 30%,
conv_int8.choose_fold docstring). Accuracy gate: the acceptance
harness (tools/int8_acceptance.py, SSIM/Qabf <= 1e-3 vs bf16).

Reference hot op: ConvLayer, core/block.py:26-118.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .conv_int8 import choose_fold, fold_weights, quantize_weights
from .conv_kernel import CHAIN_GUARD, CHAIN_WG, _apply_act
from .hiw_kernel import _hiw_band_weights, hiw_pick_g

__all__ = ["conv_hiw_chain_q", "hiw_q_ok", "hiw_q_res_ok",
           "hiw_fold_scale", "hiw_res_enabled"]


def hiw_q_ok(c_in, c_out, k, g=None, rows=16):
    """int8 eligibility: 32-aligned window steps and band-LHS rows."""
    if g is None:
        g = hiw_pick_g(c_in, c_out, k, rows)
    gk = g + k - 1
    return (c_in % 8 == 0 and (g * c_in) % 32 == 0
            and (gk * c_in) % 32 == 0 and (g * c_out) % 8 == 0)


def hiw_q_res_in_ok(c_in, k, rows=16):
    """Consumer side of an int8-RESIDENT hop: every HBM slice of the
    int8 chain tensor the in-DMA takes must land on (32, 128)-tile row
    boundaries — offsets (CHAIN_GUARD - k//2 + j*rows) * c_in, extent
    (rows + k - 1) * c_in. Holds for the DeepFuse enc1->dec0 hop (c=32,
    k7); c_in=16 with odd k//2 cannot (CHAIN_GUARD - 3 is odd) and stays
    on the bf16-strip in-kernel-quantize path."""
    p_half = k // 2
    tdma = rows + k - 1
    return (((CHAIN_GUARD - p_half) * c_in) % 32 == 0
            and (rows * c_in) % 32 == 0 and (tdma * c_in) % 32 == 0)


def hiw_q_res_out_ok(c_out, g, rows=16):
    """Producer side of an int8-RESIDENT hop: out-DMA offsets
    (CHAIN_GUARD + j*rows) * c_out and the int8 stage slices i0 * c_out
    (i0 a multiple of g) must be 32-row aligned."""
    return ((CHAIN_GUARD * c_out) % 32 == 0
            and (rows * c_out) % 32 == 0 and (g * c_out) % 32 == 0)


def hiw_q_res_ok(c, k_consumer, g_producer, g_consumer=None, rows=16):
    """Full hop eligibility for a chain tensor of channel width `c`
    (producer c_out == consumer c_in)."""
    if g_consumer is not None and (g_consumer * c) % 32 != 0:
        return False
    return (hiw_q_res_in_ok(c, k_consumer, rows)
            and hiw_q_res_out_ok(c, g_producer, rows))


def hiw_fold_scale(amax, w):
    """The per-input-channel fold scale f the consumer kernel will apply
    (choose_fold 'smooth'). A producer emitting an int8-resident chain
    tensor must requantize its output by EXACTLY this vector (passed as
    its `out_scale`), so the consumer's folded-weight dot sees the same
    integer grid the in-kernel quantize would have produced."""
    return choose_fold(amax, w, "smooth")


def hiw_res_enabled():
    """MMIF_HIW_INT8_RES: int8-resident inter-layer strips (default on;
    only reachable under quantized_inference, which is acceptance-gated
    by tools/acceptance.py)."""
    import os
    return os.environ.get("MMIF_HIW_INT8_RES", "1") != "0"


def _conv_kernel_hiw_q(*refs, k, rows, hsub, wp, c_in, c_out, g,
                       out_dtype, has_bias, act, p_half, halo_hw,
                       bot_strips, fuse_n, ext, in_q, out_q):
    refs = list(refs)
    x_ref, w_ref = refs[0], refs[1]
    refs = refs[2:]
    invf_ref = None if in_q else refs.pop(0)
    dq_ref = refs.pop(0)
    b_ref = refs.pop(0) if has_bias else None
    out_ref, t_ref = refs.pop(0), refs.pop(0)
    # int8-resident input: the strip arrives already quantized — the dot
    # reads the DMA slot directly, no staging quantize pass
    tq_ref = t_ref if in_q else refs.pop(0)
    stage_ref, in_sems, out_sems = refs
    b = pl.program_id(0)
    gh = pl.program_id(1)
    h0 = gh * rows * hsub
    gk = g + k - 1
    tdma_s = t_ref.shape[1]
    tdma = rows + k - 1

    def in_dma(slot, j, b_off=0):
        start = pl.multiple_of(
            (CHAIN_GUARD - p_half + h0 + j * rows) * c_in - ext,
            32 if in_q else 8)
        return pltpu.make_async_copy(
            x_ref.at[b + b_off, pl.ds(start, tdma_s), :],
            t_ref.at[slot], in_sems.at[slot])

    def out_dma(slot, j):
        start = pl.multiple_of((CHAIN_GUARD + h0 + j * rows) * c_out,
                               32 if out_q else 8)
        return pltpu.make_async_copy(
            stage_ref.at[slot],
            out_ref.at[b, pl.ds(start, rows * c_out), :],
            out_sems.at[slot])

    in_dma(0, 0).start()
    if fuse_n:
        in_dma(2, 0, fuse_n).start()

    kw_order = [p_half] + [kw for kw in range(k) if kw != p_half]

    def _mirror(slot, j):
        wv = halo_hw[1]
        sgj = gh * hsub + j

        @pl.when(sgj == 0)
        def _():
            for m in range(1, p_half + 1):
                dst = ext + (p_half - m) * c_in
                src = ext + (p_half + m) * c_in
                t_ref[slot, dst:dst + c_in, :] = \
                    t_ref[slot, src:src + c_in, :]
        for s, th in bot_strips:
            @pl.when(sgj == s)
            def _(th=th):
                for m in range(p_half):
                    if th + m >= tdma:
                        continue
                    dst = ext + (th + m) * c_in
                    src = ext + (th - 2 - m) * c_in
                    t_ref[slot, dst:dst + c_in, :] = \
                        t_ref[slot, src:src + c_in, :]
                z0 = ext + min(th + p_half, tdma) * c_in
                if z0 < t_ref.shape[1]:
                    t_ref[slot, z0:, :] = jnp.zeros_like(
                        t_ref[slot, z0:, :])
        for jj in range(p_half):
            la = CHAIN_WG - 1 - jj
            t_ref[slot, :, la:la + 1] = \
                t_ref[slot, :, CHAIN_WG + 1 + jj:CHAIN_WG + 2 + jj]
            ra = CHAIN_WG + wv + jj
            t_ref[slot, :, ra:ra + 1] = \
                t_ref[slot, :, CHAIN_WG + wv - 2 - jj:CHAIN_WG + wv - 1 - jj]

    def strip(j, carry):
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < hsub)
        def _():
            in_dma(1 - slot, j + 1).start()
            if fuse_n:
                in_dma(2 + (1 - slot), j + 1, fuse_n).start()

        in_dma(slot, j).wait()
        if fuse_n:
            in_dma(2 + slot, j, fuse_n).wait()
            if in_q:
                # siamese sum on the int8 grid: both halves are quantized
                # at the SAME scale (the calibrated amax of the sum), so
                # the integer add is the quantized sum; i32 accumulate +
                # saturate mirrors the post-sum clip of the in-kernel
                # quantize path
                t_ref[slot] = jnp.clip(
                    t_ref[slot].astype(jnp.int32)
                    + t_ref[2 + slot].astype(jnp.int32),
                    -127, 127).astype(jnp.int8)
            else:
                t_ref[slot] = t_ref[slot] + t_ref[2 + slot]
        if halo_hw is not None:
            _mirror(slot, j)

        if not in_q:
            # strip quantization: one VPU pass, windows land 32-aligned
            # at base 0 of the int8 staging buffer (mirrors are already
            # in); per-channel scales ride a (tdma*c_in, 1) row broadcast
            v = t_ref[slot, ext:ext + tdma * c_in, :].astype(jnp.float32)
            tq_ref[slot, :tdma * c_in, :] = jnp.clip(
                jnp.round(v * invf_ref[:, :]), -127, 127).astype(jnp.int8)

        @pl.when(j >= 2)
        def _():
            out_dma(slot, j - 2).wait()

        for i0 in range(0, rows, g):
            a = tq_ref[slot, pl.ds(i0 * c_in, gk * c_in), :]
            p = jax.lax.dot_general(
                w_ref[:, :], a, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            y = p[:g * c_out, :]
            for jj in range(1, k):
                sh = kw_order[jj] - p_half
                y = y + jnp.roll(p[jj * g * c_out:(jj + 1) * g * c_out, :],
                                 -sh, axis=-1)
            yf = y.astype(jnp.float32) * dq_ref[:, :]
            if b_ref is not None:
                yf = yf + b_ref[:, :]
            yf = _apply_act(yf, act)
            if out_q:
                # int8-resident output: the consumer's fold scale f_next
                # is pre-divided into dq/bias (valid for None/relu acts),
                # so the requant is just round + clip on the epilogue —
                # replacing the bf16 cast, and from f32 (no bf16
                # round-trip before the consumer's grid)
                yf = jnp.clip(jnp.round(yf), -127, 127)
            stage_ref[slot, pl.ds(i0 * c_out, g * c_out)] = \
                yf.astype(out_dtype)

        out_dma(slot, j).start()
        return carry

    jax.lax.fori_loop(0, hsub, strip, 0)
    for tail in (hsub - 2, hsub - 1):
        if tail >= 0:
            out_dma(tail % 2, tail).wait()


@functools.partial(jax.jit,
                   static_argnames=("k", "h", "w_valid", "c_in", "act",
                                    "g", "rows", "hsub", "fuse_n",
                                    "out_dtype", "interpret"))
def conv_hiw_chain_q(xt, w, k, h, w_valid, c_in, amax, bias=None,
                     act=None, g=None, rows=16, hsub=None, fuse_n=0,
                     out_scale=None, out_dtype=None, interpret=False):
    """int8 H-major chain conv. xt: bf16/f32 chain tensor
    (B, HG*C_in, Wp) — or an int8-RESIDENT chain tensor (already on the
    fold grid of `amax`, as emitted by a producer leg's `out_scale`), in
    which case the in-kernel quantize pass is skipped and the strip DMA
    moves half the bytes. w: BN-folded f32 HWIO; amax: (C_in,)
    calibrated input max-abs (of the sibling-summed input for fuse_n).

    out_scale: the NEXT leg's fold vector (hiw_fold_scale(amax_next,
    w_next), (C_out,)) — output becomes an int8-resident chain tensor
    requantized in the epilogue (acts: None/relu only; relu commutes
    with the positive per-channel 1/f fold). Otherwise the output dtype
    is out_dtype (default: xt.dtype; required for int8 inputs)."""
    b, hgc, wp = xt.shape
    c_out = w.shape[-1]
    hg = hgc // c_in
    p_half = k // 2
    in_q = xt.dtype == jnp.int8
    out_q = out_scale is not None
    assert p_half <= CHAIN_WG and p_half <= CHAIN_GUARD
    assert rows % 8 == 0
    if g is None:
        g = hiw_pick_g(c_in, c_out, k, rows)
    assert rows % g == 0 and hiw_q_ok(c_in, c_out, k, g, rows), \
        (rows, g, c_in, c_out, k)
    if in_q:
        assert hiw_q_res_in_ok(c_in, k, rows), (c_in, k, rows)
        assert out_q or out_dtype is not None, \
            "int8 chain input needs out_scale or an explicit out_dtype"
    if out_q:
        assert act in (None, "relu"), act
        assert hiw_q_res_out_ok(c_out, g, rows), (c_out, g, rows)
        out_dtype = jnp.int8
    elif out_dtype is None:
        out_dtype = xt.dtype
    if fuse_n:
        assert b == 2 * fuse_n
    b_out = fuse_n if fuse_n else b
    h8 = -(-h // 8) * 8
    if hsub is None:
        hsub = -(-h8 // rows)
    strip = rows * hsub
    grid_h = -(-h8 // strip)
    tdma = rows + k - 1
    ext = 0  # c_in % 8 == 0 by hiw_q_ok
    tdma_s = tdma * c_in
    assert CHAIN_GUARD + grid_h * strip + p_half <= hg

    bot_strips = tuple(
        (s, h - s * rows + p_half)
        for s in range(grid_h * hsub)
        if s * rows < h and s * rows - p_half + tdma > h)

    f = choose_fold(amax, w, "smooth")
    wq, sw = quantize_weights(fold_weights(w, f))
    wb = _hiw_band_weights(wq, k, c_in, c_out, g, jnp.int8)
    # the f_c fold cancels in the dot; per-M-row dequant is sw alone,
    # rows grouped (i, co) after the roll-sum. An int8-resident output
    # folds the consumer's 1/f_next into dq and bias (see docstring).
    dqv = sw / jnp.asarray(out_scale, jnp.float32) if out_q else sw
    dq = jnp.tile(dqv, g).reshape(g * c_out, 1)

    n_slots = 4 if fuse_n else 2
    kern = functools.partial(
        _conv_kernel_hiw_q, k=k, rows=rows, hsub=hsub, wp=wp, c_in=c_in,
        c_out=c_out, g=g, out_dtype=out_dtype, has_bias=bias is not None,
        act=act, p_half=p_half, halo_hw=(h, w_valid),
        bot_strips=bot_strips, fuse_n=fuse_n, ext=ext, in_q=in_q,
        out_q=out_q)
    operands = [xt, wb]
    in_specs = [pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.VMEM)]
    if not in_q:
        invf = jnp.tile(1.0 / f, tdma).reshape(tdma * c_in, 1)
        operands.append(invf)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    operands.append(dq)
    in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    if bias is not None:
        bv = jnp.asarray(bias, jnp.float32)
        if out_q:
            bv = bv / jnp.asarray(out_scale, jnp.float32)
        bt = jnp.tile(bv, g).reshape(g * c_out, 1)
        operands.append(bt)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    scratch = [pltpu.VMEM((n_slots, tdma_s, wp), xt.dtype)]
    if not in_q:
        tq_rows = -(-tdma_s // 32) * 32
        scratch.append(pltpu.VMEM((2, tq_rows, wp), jnp.int8))
    scratch += [pltpu.VMEM((2, rows * c_out, wp), out_dtype),
                pltpu.SemaphoreType.DMA((n_slots,)),
                pltpu.SemaphoreType.DMA((2,))]
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b_out, hg * c_out, wp), out_dtype),
        grid=(b_out, grid_h),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*operands)
