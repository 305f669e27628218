"""Shifted-GEMM convolution: the production Pallas TPU conv kernels.

The zoo's convs have 16-64 channels; XLA's conv lowering leaves the MXU
mostly idle there (output channels map to the 128-wide lane dim: N=32 ->
<=25% utilization; measured ~5.8 TFLOPS vs ~121 TFLOPS for dense matmul on
this chip). These kernels reshape a k x k conv into ONE dense matmul whose
K and N dims are both multiplied by the kernel width, computed in a
transposed (C, H, W) layout with W on the vector lanes:

    A[(kh, c), r, w]         sublane-shifted stack of the input strip
    Wm[(kh, c), (kw, n)]     = W[kh, kw, c, n]  (dense, no zero padding)
    P = Wm^T A               (k*C_out, k*C_in) x (k*C_in, rows*W) on MXU
    out[n, r, w] = sum_kw P[(kw, n), r, w + kw]  (static lane-slice epilogue)

The matmul's MAC count equals the conv's exactly (k*C_in x k*C_out contains
every weight once); M = k*C_out (224 for k7/c32, MXU-shaped), every VMEM
buffer is lane-dense, and the w+kw indexing is a static lane slice of the
partial products. The input stays in HBM; each strip (+halo) is DMA'd
in-kernel into a double-buffered slot, and outputs leave through a
double-buffered staging DMA with bias+activation fused into the epilogue.

Two entry points:
- `conv_tlane_dma`: standalone NHWC conv (pre-padded input, VALID);
  35 TFLOPS at k7/c32 full-res vs XLA's 5.8 (docs/PERFORMANCE.md).
- `conv_tlane_chain` (+ the guard-layout helpers below): chained convs on
  an NCHW-resident guard layout — reflect halos live in guard bands, so
  a whole model forward pays no per-layer pad/transpose.

Contract: stride 1, groups 1, odd k, input pre-padded (any mode) so the
kernel computes VALID. Superseded intermediate designs (rounds 1-2) live
in tools/pallas_archive.py with their measured numbers.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _apply_act(y, act):
    """Static activation epilogue (f32, before the output cast) — names
    match ops/layers.ACTS for the ConvLayer fusion path."""
    if act is None:
        return y
    if act == "relu":
        return jnp.maximum(y, 0.0)
    if act == "relu6":
        return jnp.clip(y, 0.0, 6.0)
    if act == "lrelu":
        return jnp.where(y >= 0.0, y, 0.2 * y)
    if act == "tanh":
        return jnp.tanh(y)
    raise ValueError(f"unfusable activation {act!r}")


def _conv_kernel_tlane_dma(*refs, k, rows, hsub, w_out, wp, tdma, c_in,
                           c_out, out_dtype, kw_chunk, has_bias, act):
    """tlane2 + in-kernel halo DMA + inner strip loop.

    The tlane2 host-side halo gather costs 45 ms/call at 8x1224x1024x32
    (measured) — 2.5x input duplication through an XLA gather. Here the
    input stays in HBM and each rows-strip (with its k-1 halo, rounded to
    the 8-sublane DMA granularity) is DMA'd into a double-buffered VMEM
    slot, which (a) removes the gather entirely and (b) lets one program
    own `hsub` strips, amortizing program-launch overhead. Outputs leave
    per-strip through a double-buffered staging DMA, so VMEM never holds
    more than two strips of activations in either direction.

    x_ref:     (B, c_in, Hp, wp) HBM — whole array
    w_ref:     (k*c_in, k*c_out) VMEM
    b_ref:     (c_out, 1, 1) VMEM bias (only when has_bias)
    out_ref:   (B, c_out, Hout, w_out) HBM — whole array
    t_ref:     (2, c_in, tdma, wp) VMEM (input double buffer)
    a_ref:     (k*c_in, rows, wp)
    acc_ref:   (c_out, rows, w_out) f32
    stage_ref: (2, c_out, rows, w_out) VMEM (output double buffer)

    bias + activation are fused into the staging epilogue (f32, before the
    output cast) — saves one full elementwise HBM round trip per layer vs
    applying them as a separate XLA op after the kernel.
    """
    if has_bias:
        (x_ref, w_ref, b_ref, out_ref, t_ref, a_ref, acc_ref, stage_ref,
         in_sems, out_sems) = refs
    else:
        (x_ref, w_ref, out_ref, t_ref, a_ref, acc_ref, stage_ref,
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
                preferred_element_type=jnp.float32)
            # in-place accumulation: an SSA value chain was measured at
            # 31.9 vs 35.3 TFLOPS for the ref accumulator (and 7x the
            # compile time) — Mosaic spills the big f32 chain anyway
            for jj in range(g_):
                kw = kw0 + jj
                term = p[jj * c_out:(jj + 1) * c_out, :, kw:kw + w_out]
                if kw == 0:
                    acc_ref[:, :, :] = term
                else:
                    acc_ref[:, :, :] += term

        # drain the staging slot used two strips ago before overwriting
        @pl.when(j >= 2)
        def _():
            out_dma(slot, j - 2).wait()

        y = acc_ref[:, :, :]
        if has_bias:
            y = y + b_ref[:, :, :]
        stage_ref[slot] = _apply_act(y, act).astype(out_dtype)
        out_dma(slot, j).start()
        return carry

    jax.lax.fori_loop(0, hsub, strip, 0)
    # drain the last two output DMAs
    for tail in (hsub - 2, hsub - 1):
        if tail >= 0:
            out_dma(tail % 2, tail).wait()


@functools.partial(jax.jit,
                   static_argnames=("k", "interpret", "hsub", "kw_chunk",
                                    "rows", "act"))
def conv_tlane_dma(x, w, k, bias=None, act=None, hsub=None, kw_chunk=7,
                   rows=8, interpret=False):
    """DMA-fed big-M transposed-layout conv (the production round-2 kernel).

    Same contract as conv_shifted_gemm: x (B, H+k-1, W+k-1, C_in)
    pre-padded NHWC, w (k, k, C_in, C_out) HWIO -> (B, H, W, C_out).
    bias (C_out,) and act (name from ops/layers.ACTS: relu/relu6/lrelu/tanh)
    are fused into the kernel's staging epilogue when given.
    hsub = strips per program (None: all of H in one program per batch);
    rows = strip height, must be a multiple of 8 (HBM slice offsets/sizes
    are 8-sublane aligned)."""
    b, hp, wp_raw, c_in = x.shape
    c_out = w.shape[-1]
    h = hp - (k - 1)
    w_out_final = wp_raw - (k - 1)
    assert rows % 8 == 0

    # lane dims must be 128-multiples (both the in-kernel flatten and the
    # DMA'd blocks); compute on w_out128 columns, crop the valid w_out after
    w_out128 = -(-w_out_final // 128) * 128
    wp = -(-(w_out128 + k - 1) // 128) * 128
    if hsub is None:
        hsub = -(-h // rows)
    strip = rows * hsub
    grid_h = -(-h // strip)
    tdma = -(-(rows + k - 1) // 8) * 8
    hpad = (grid_h - 1) * strip + (hsub - 1) * rows + tdma - hp
    x = jnp.pad(x, ((0, 0), (0, max(hpad, 0)), (0, wp - wp_raw), (0, 0)))
    xt = jnp.transpose(x, (0, 3, 1, 2))       # (B, C, Hp, wp)

    wm = jnp.transpose(w, (0, 2, 1, 3)).reshape(k * c_in, k * c_out)
    wm = wm.astype(x.dtype)

    kern = functools.partial(
        _conv_kernel_tlane_dma, k=k, rows=rows, hsub=hsub, w_out=w_out128,
        wp=wp, tdma=tdma, c_in=c_in, c_out=c_out, out_dtype=x.dtype,
        kw_chunk=kw_chunk, has_bias=bias is not None, act=act)
    operands = [xt, wm]
    in_specs = [
        # whole input stays in HBM: strips are DMA'd in-kernel
        pl.BlockSpec(memory_space=pltpu.HBM),
        # weights: whole array resident in VMEM (unblocked — a blocked
        # spec makes the pipeline stage the HBM output through VMEM)
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    if bias is not None:
        operands.append(jnp.asarray(bias, jnp.float32).reshape(c_out, 1, 1))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(
            (b, c_out, grid_h * strip, w_out128), x.dtype),
        grid=(b, grid_h),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((2, c_in, tdma, wp), x.dtype),
            pltpu.VMEM((k * c_in, rows, wp), x.dtype),
            pltpu.VMEM((c_out, rows, w_out128), jnp.float32),
            pltpu.VMEM((2, c_out, rows, w_out128), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        # Mosaic's scoped-vmem accounting charges every unrolled SSA temp
        # concurrently; the default 16M limit rejects configs that run fine
        # (physical VMEM headroom exists on v5e) — raise it.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*operands)

    # (B, c_out, H', W') -> NHWC, crop padding
    return jnp.transpose(out, (0, 2, 3, 1))[:, :h, :w_out_final, :]


# ---------------------------------------------------------------------------
# Chain layout: NCHW-resident conv pipeline (round-2 transpose elimination)
# ---------------------------------------------------------------------------
#
# Per-layer profile (docs/PERFORMANCE.md round 2): the NHWC wrapper around
# conv_tlane_dma pays an XLA reflect-pad (60 GB/s effective) plus two big
# transposes per call. Chained convs instead keep activations in a fixed
# "guard layout":
#
#     (B, C, HG, Wp)   HG = GUARD + ceil(H/8)*8 + GUARD, 8-aligned strips
#                      Wp = 128-aligned >= WG + W + guard lanes
#     valid region     rows [GUARD, GUARD+H), lanes [WG, WG+W)
#
# `chain_refresh_halo` mirrors <=k//2 rows/lanes into the guard bands (4
# tiny in-place dynamic-update-slices through XLA) and the kernel reads its
# reflect halo straight out of the bands — no pad, no transpose, no
# alignment copy. Entry/exit transposes happen ONCE per chain at the
# 1-channel model boundary instead of per layer.

CHAIN_GUARD = 8    # rows above/below the valid region (>= max k//2, 8-align)
CHAIN_WG = 4       # lanes left of the valid region  (>= max k//2)


CHAIN_MAX_ROWS = 64   # largest strip height any chain conv may use


def chain_shape(h, w):
    """(HG, Wp) of the guard layout for a valid h x w image. The bottom
    band is GUARD + CHAIN_MAX_ROWS + 8 rows: strips round h up to a
    multiple of `rows` (<= CHAIN_MAX_ROWS — 64 for the latency-bound thin
    layers, 16 for the fat ones), and the last strip's DMA reads one
    extra block."""
    hg = CHAIN_GUARD + (-(-h // 8) * 8) + CHAIN_GUARD + CHAIN_MAX_ROWS + 8
    wp = -(-(CHAIN_WG + w + CHAIN_WG) // 128) * 128
    return hg, wp


def _enter_kernel(x_ref, out_ref, t_ref, s_ref, in_sems, out_sems, *,
                  rchunk, nch, tail, w, hg, wp):
    """Grayscale placer: (B, H, W) -> (B, 1, HG, Wp) valid region at
    (GUARD, WG). DMA strips in, VPU-shift +WG lanes, DMA out. Guard
    rows/lanes are left UNINITIALIZED — the chain invariant (every consumer
    either mirrors halos in-kernel before reading or reads the valid region
    only) makes zero-filling them a waste of 2x the bandwidth, which is
    exactly why the XLA zeros+dynamic-update-slice version of this op
    measured 3.4 ms at b32 full res (~50 GB/s effective)."""
    b = pl.program_id(0)

    def in_dma(slot, j, sz):
        return pltpu.make_async_copy(
            x_ref.at[b, pl.ds(j * rchunk, sz), :],
            t_ref.at[slot, pl.ds(0, sz)], in_sems.at[slot])

    def out_dma(slot, j, sz):
        return pltpu.make_async_copy(
            s_ref.at[slot, pl.ds(0, sz)],
            out_ref.at[b, 0, pl.ds(CHAIN_GUARD + j * rchunk, sz), :],
            out_sems.at[slot])

    def size_of(j):
        return tail if j == nch - 1 else rchunk

    in_dma(0, 0, size_of(0)).start()

    for j in range(nch):           # static loop: sizes differ at the tail
        slot = j % 2
        if j + 1 < nch:
            in_dma(1 - slot, j + 1, size_of(j + 1)).start()
        in_dma(slot, j, size_of(j)).wait()
        if j >= 2:
            out_dma(slot, j - 2, size_of(j - 2)).wait()
        s_ref[slot, :, CHAIN_WG:CHAIN_WG + w] = t_ref[slot, :, :]
        out_dma(slot, j, size_of(j)).start()
    for t in (nch - 2, nch - 1):
        if t >= 0:
            out_dma(t % 2, t, size_of(t)).wait()


def _exit_kernel(x_ref, out_ref, t_ref, s_ref, in_sems, out_sems, *,
                 rchunk, nch, tail, w, wp):
    """Reverse of _enter_kernel: (B, 1, HG, Wp) valid region -> (B, H, W)."""
    b = pl.program_id(0)

    def in_dma(slot, j, sz):
        return pltpu.make_async_copy(
            x_ref.at[b, 0, pl.ds(CHAIN_GUARD + j * rchunk, sz), :],
            t_ref.at[slot, pl.ds(0, sz)], in_sems.at[slot])

    def out_dma(slot, j, sz):
        return pltpu.make_async_copy(
            s_ref.at[slot, pl.ds(0, sz)],
            out_ref.at[b, pl.ds(j * rchunk, sz), :], out_sems.at[slot])

    def size_of(j):
        return tail if j == nch - 1 else rchunk

    in_dma(0, 0, size_of(0)).start()
    for j in range(nch):
        slot = j % 2
        if j + 1 < nch:
            in_dma(1 - slot, j + 1, size_of(j + 1)).start()
        in_dma(slot, j, size_of(j)).wait()
        if j >= 2:
            out_dma(slot, j - 2, size_of(j - 2)).wait()
        s_ref[slot, :, :] = t_ref[slot, :, CHAIN_WG:CHAIN_WG + w]
        out_dma(slot, j, size_of(j)).start()
    for t in (nch - 2, nch - 1):
        if t >= 0:
            out_dma(t % 2, t, size_of(t)).wait()


_ENTER_RCHUNK = 128


def _grayscale_fast_ok(h, w):
    """DMA fast-path eligibility: 8-aligned rows (HBM sublane slices) and
    128-multiple W (whole-minor-dim lane blocks)."""
    return h % 8 == 0 and w % 128 == 0 and h >= 16


@functools.partial(jax.jit, static_argnames="interpret")
def _chain_enter_gray(x, interpret=False):
    b, h, w, _ = x.shape
    hg, wp = chain_shape(h, w)
    nch = -(-h // _ENTER_RCHUNK)
    tail = h - (nch - 1) * _ENTER_RCHUNK
    kern = functools.partial(_enter_kernel, rchunk=_ENTER_RCHUNK, nch=nch,
                             tail=tail, w=w, hg=hg, wp=wp)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, 1, hg, wp), x.dtype),
        grid=(b,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((2, _ENTER_RCHUNK, w), x.dtype),
            pltpu.VMEM((2, _ENTER_RCHUNK, wp), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x.reshape(b, h, w))


@functools.partial(jax.jit, static_argnames=("h", "w", "interpret"))
def _chain_exit_gray(xt, h, w, interpret=False):
    b = xt.shape[0]
    nch = -(-h // _ENTER_RCHUNK)
    tail = h - (nch - 1) * _ENTER_RCHUNK
    kern = functools.partial(_exit_kernel, rchunk=_ENTER_RCHUNK, nch=nch,
                             tail=tail, w=w, wp=xt.shape[3])
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, h, w), xt.dtype),
        grid=(b,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((2, _ENTER_RCHUNK, xt.shape[3]), xt.dtype),
            pltpu.VMEM((2, _ENTER_RCHUNK, w), xt.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xt)
    return out[..., None]


def _chain_dma_ok():
    import os
    if os.environ.get("MMIF_CHAIN_INTERPRET"):
        return True
    return (not os.environ.get("MMIF_NO_PALLAS")
            and jax.default_backend() == "tpu")


def chain_enter(x):
    """NHWC (B, H, W, C) -> guard layout (B, C, HG, Wp).

    Grayscale inputs at DMA-aligned sizes take a Pallas strip-copy kernel
    (the XLA zeros + transpose + dynamic-update-slice lowering runs at
    ~50 GB/s — docs/PERFORMANCE.md); other shapes keep the XLA path, which
    also zero-fills the guards. The kernel leaves guards uninitialized —
    valid under the chain invariant (consumers mirror halos in-kernel
    before reading guard rows/lanes, or read the valid region only)."""
    b, h, w, c = x.shape
    if c == 1 and _grayscale_fast_ok(h, w) and _chain_dma_ok():
        import os
        return _chain_enter_gray(
            x, interpret=bool(os.environ.get("MMIF_CHAIN_INTERPRET")))
    hg, wp = chain_shape(h, w)
    xt = jnp.transpose(x, (0, 3, 1, 2))
    out = jnp.zeros((b, c, hg, wp), x.dtype)
    return jax.lax.dynamic_update_slice(out, xt, (0, 0, CHAIN_GUARD,
                                                  CHAIN_WG))


def chain_exit(xt, h, w):
    """Guard layout -> NHWC (B, H, W, C)."""
    if xt.shape[1] == 1 and _grayscale_fast_ok(h, w) and _chain_dma_ok():
        import os
        return _chain_exit_gray(
            xt, h, w, interpret=bool(os.environ.get("MMIF_CHAIN_INTERPRET")))
    sl = xt[:, :, CHAIN_GUARD:CHAIN_GUARD + h, CHAIN_WG:CHAIN_WG + w]
    return jnp.transpose(sl, (0, 2, 3, 1))


def chain_refresh_halo(xt, h, w, p):
    """Mirror p rows/lanes of the valid region into the guard bands
    (torch ReflectionPad2d semantics: row -i mirrors row i). Four small
    dynamic-update-slices; XLA applies them in place when the buffer is
    dead afterwards."""
    if p == 0:
        return xt
    g, wg = CHAIN_GUARD, CHAIN_WG
    top = jnp.flip(xt[:, :, g + 1:g + 1 + p, :], axis=2)
    xt = jax.lax.dynamic_update_slice(xt, top, (0, 0, g - p, 0))
    bot = jnp.flip(xt[:, :, g + h - 1 - p:g + h - 1, :], axis=2)
    xt = jax.lax.dynamic_update_slice(xt, bot, (0, 0, g + h, 0))
    left = jnp.flip(xt[:, :, :, wg + 1:wg + 1 + p], axis=3)
    xt = jax.lax.dynamic_update_slice(xt, left, (0, 0, 0, wg - p))
    right = jnp.flip(xt[:, :, :, wg + w - 1 - p:wg + w - 1], axis=3)
    xt = jax.lax.dynamic_update_slice(xt, right, (0, 0, 0, wg + w))
    return xt


def _conv_kernel_chain(*refs, k, rows, hsub, wp, tdma, c_in, c_out,
                       out_dtype, kw_chunk, has_bias, act, p_half,
                       halo_hw, bot_strips, fuse_n, epilogue, s2d_f):
    """conv_tlane_dma's strip loop on the guard layout: the input's
    reflect halo is already in the guard bands and the output lands at the
    same (GUARD, WG) offset, so there is no pad, no transpose, and no crop
    anywhere in the chain.

    Output lane L = sum_kw P[kw][L + kw - p_half]; each kw contributes on
    the lane range where that index is in [0, wp) — the shrunken edges only
    ever touch guard lanes (|kw - p_half| <= p_half <= CHAIN_WG). kw ==
    p_half covers the full width and goes first as the accumulator init.

    halo_hw: when set to the valid (h, w), the reflect halo is mirrored
    IN-KERNEL on each DMA'd strip (rows at the two H-boundary strips via
    static copies under pl.when on the global strip index, lanes on every
    strip) — the XLA chain_refresh_halo's four dynamic-update-slices cost
    ~15 ms/layer at full res (docs/PERFORMANCE.md round-3 profile) because
    XLA materializes full-buffer copies; here the mirrors are sub-
    microsecond VMEM row/column copies. bot_strips: static [(global strip
    index, t-row of valid row h)] list for the bottom boundary.

    fuse_n: when >0, the kernel also reads the strip at batch b + fuse_n
    and ADDS it during staging — elementwise-sum siamese fusion folded
    into the consumer conv's prologue (kills the separate XLA round trip).

    epilogue: 'acc' keeps the f32 acc_ref scratch (init + k-1 in-place
    RMW slice-adds, ~31 MB/strip of VPU traffic at k7/c32/rows16).
    'ssa' instead sums the k lane-shifted partial-product slices as one
    SSA expression (f32 lane rolls — Mosaic supports those, unlike bf16)
    fused straight into the bias+act+cast staging write, with no
    accumulator buffer at all. Roll wrap-around lanes land strictly in
    the guard/never-read lane zones (|shift| <= p_half <= CHAIN_WG, and
    the next layer's in-kernel halo mirrors overwrite the guard lanes
    before any read), so the wrapped garbage never reaches valid output.
    """
    if epilogue in ("ssa", "ssai"):
        if has_bias:
            (x_ref, w_ref, b_ref, out_ref, t_ref, a_ref, stage_ref,
             in_sems, out_sems) = refs
        else:
            (x_ref, w_ref, out_ref, t_ref, a_ref, stage_ref,
             in_sems, out_sems) = refs
            b_ref = None
        acc_ref = None
    elif has_bias:
        (x_ref, w_ref, b_ref, out_ref, t_ref, a_ref, acc_ref, stage_ref,
         in_sems, out_sems) = refs
    else:
        (x_ref, w_ref, out_ref, t_ref, a_ref, acc_ref, stage_ref,
         in_sems, out_sems) = refs
        b_ref = None
    b = pl.program_id(0)
    g = pl.program_id(1)
    h0 = g * rows * hsub
    n_slots = 4 if fuse_n else 2

    def in_dma(slot, j, b_off=0):
        # input rows [GUARD + h0 + j*rows - 8, +tdma): the lead-8 block
        # covers the p_half-row top halo and keeps every start 8-aligned
        start = CHAIN_GUARD - 8 + h0 + j * rows
        return pltpu.make_async_copy(
            x_ref.at[b + b_off, :, pl.ds(start, tdma), :],
            t_ref.at[slot], in_sems.at[slot])

    def out_dma(slot, j):
        return pltpu.make_async_copy(
            stage_ref.at[slot],
            out_ref.at[b, :, pl.ds(CHAIN_GUARD + h0 + j * rows, rows), :],
            out_sems.at[slot])

    in_dma(0, 0).start()
    if fuse_n:
        in_dma(2, 0, fuse_n).start()

    # kw order: p_half first (full-width assignment), then the rest
    kw_order = [p_half] + [kw for kw in range(k) if kw != p_half]

    def _mirror(slot):
        """Reflect halo on the staged strip: rows at the H boundaries
        (static copies, boundary strips only), then lanes every strip.
        Row mirrors run full-width and lane mirrors full-height, so the
        corners compose exactly like chain_refresh_halo.

        s2d_f == 2 (space-to-depth packed tensor, ops/s2d.py phase-major
        channels): the halo must be the PACKED reflect extension of the
        ORIGINAL image. For f=2 no cross-phase copies are needed — phase
        0 mirrors exclusively (halo row -m <- valid row +m, like the
        unpacked case) and phase 1 inclusively (halo -m <- valid m-1),
        swapping roles at the bottom/right boundary. Row phase py owns
        channel block [py*2C, (py+1)*2C); lane phase px owns [pxC, pxC+C)
        inside each py block (phase-major layout), so each patch is 1
        (rows) or 2 (lanes) static channel-block copies."""
        wv = halo_hw[1]
        cb = c_in // (s2d_f * s2d_f) if s2d_f > 1 else c_in

        def _row_blocks():
            # (channel_lo, channel_hi, top_inclusive) per row-phase block
            if s2d_f == 1:
                return [(0, c_in, False)]
            return [(0, 2 * cb, False), (2 * cb, 4 * cb, True)]

        def _lane_blocks():
            # (channel_lo, channel_hi, left_inclusive) per lane-phase block
            if s2d_f == 1:
                return [(0, c_in, False)]
            out = []
            for py in range(2):
                base = py * 2 * cb
                out.append((base, base + cb, False))
                out.append((base + cb, base + 2 * cb, True))
            return out

        def row_patches(j):
            sgj = g * hsub + j

            @pl.when(sgj == 0)
            def _():
                for lo, hi, inc in _row_blocks():
                    for ii in range(p_half):
                        # dst t-row 8-(ii+1); src 8+(ii+1) excl / 8+ii incl
                        src = 8 + ii if inc else 9 + ii
                        t_ref[slot, lo:hi, 7 - ii:8 - ii, :] = \
                            t_ref[slot, lo:hi, src:src + 1, :]
            for s, th in bot_strips:
                @pl.when(sgj == s)
                def _(th=th):
                    for lo, hi, inc in _row_blocks():
                        for ii in range(p_half):
                            # dst th+ii; src th-1-ii incl(=top-excl block's
                            # bottom role swaps) / th-2-ii excl
                            src = th - 2 - ii if inc else th - 1 - ii
                            if s2d_f == 1:
                                src = th - 2 - ii
                            t_ref[slot, lo:hi, th + ii:th + ii + 1, :] = \
                                t_ref[slot, lo:hi, src:src + 1, :]

        def lane_patches():
            for lo, hi, inc in _lane_blocks():
                for jj in range(p_half):
                    lsrc = CHAIN_WG + jj if inc else CHAIN_WG + 1 + jj
                    rsrc = (CHAIN_WG + wv - 2 - jj if inc
                            else CHAIN_WG + wv - 1 - jj)
                    if s2d_f == 1:
                        lsrc = CHAIN_WG + 1 + jj
                        rsrc = CHAIN_WG + wv - 2 - jj
                    t_ref[slot, lo:hi, :, CHAIN_WG - 1 - jj:CHAIN_WG - jj] \
                        = t_ref[slot, lo:hi, :, lsrc:lsrc + 1]
                    t_ref[slot, lo:hi, :,
                          CHAIN_WG + wv + jj:CHAIN_WG + wv + jj + 1] = \
                        t_ref[slot, lo:hi, :, rsrc:rsrc + 1]
        return row_patches, lane_patches

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
            t_ref[slot] = t_ref[slot] + t_ref[2 + slot]
        if halo_hw is not None:
            row_patches, lane_patches = _mirror(slot)
            row_patches(j)
            lane_patches()

        for kh in range(k):
            a_ref[kh * c_in:(kh + 1) * c_in, :, :] = \
                t_ref[slot, :, pl.ds(8 - p_half + kh, rows), :]
        a = a_ref[:, :, :]
        if epilogue == "ssai":
            # interior-slice SSA sum: every partial-product slice is read
            # at the SAME width wp-2p with a per-kw lane offset (out lane
            # L needs P lane L+sh, so slice start = p_half-sh in [0, 2p]),
            # summed without rolls or an accumulator, and only the
            # interior lanes [p, wp-p) are staged. The skipped edge lanes
            # are strictly guard zone: valid output lanes live in
            # [WG, WG+w) with p <= WG, and the mirror-destination lanes
            # the next layer refreshes are inside [WG-p, WG+w+p). Chain
            # layout only — conv_tlane_dma's crop treats lane 0 as a real
            # output column.
            wi = wp - 2 * p_half
            p = jax.lax.dot_general(
                w_ref[:, :], a, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            y = None
            for jj, kw in enumerate(kw_order):
                # out lane L = p_half + i needs P lane L + (kw - p_half),
                # so the uniform-width slice starts at lane kw
                term = p[jj * c_out:(jj + 1) * c_out, :, kw:kw + wi]
                y = term if y is None else y + term
        elif epilogue == "ssa":
            # one full dot, then an SSA roll-sum: out lane L needs P lane
            # L + sh, i.e. roll(P, -sh) — no accumulator buffer RMW
            p = jax.lax.dot_general(
                w_ref[:, :], a, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            y = p[:c_out, :, :]             # kw_order[0] == p_half: sh == 0
            for jj in range(1, k):
                sh = kw_order[jj] - p_half
                y = y + jnp.roll(p[jj * c_out:(jj + 1) * c_out, :, :],
                                 -sh, axis=2)
        else:
            for i0 in range(0, k, kw_chunk):
                kws = kw_order[i0:i0 + kw_chunk]
                # w_ref columns are pre-permuted into kw_order, so each
                # chunk's column block is contiguous
                p = jax.lax.dot_general(
                    w_ref[:, i0 * c_out:(i0 + len(kws)) * c_out], a,
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                for jj, kw in enumerate(kws):
                    sh = kw - p_half        # P lane L+sh feeds out lane L
                    a0 = max(0, -sh)        # acc lane start
                    b0 = max(0, sh)         # P lane start
                    ln = wp - abs(sh)
                    term = p[jj * c_out:(jj + 1) * c_out, :, b0:b0 + ln]
                    if kw == p_half:        # sh == 0: full width, inits acc
                        acc_ref[:, :, :] = term
                    else:
                        acc_ref[:, :, a0:a0 + ln] += term

        @pl.when(j >= 2)
        def _():
            out_dma(slot, j - 2).wait()

        if epilogue not in ("ssa", "ssai"):
            y = acc_ref[:, :, :]
        if has_bias:
            y = y + b_ref[:, :, :]
        if epilogue == "ssai":
            stage_ref[slot, :, :, p_half:wp - p_half] = \
                _apply_act(y, act).astype(out_dtype)
        else:
            stage_ref[slot] = _apply_act(y, act).astype(out_dtype)
        out_dma(slot, j).start()
        return carry

    jax.lax.fori_loop(0, hsub, strip, 0)
    for tail in (hsub - 2, hsub - 1):
        if tail >= 0:
            out_dma(tail % 2, tail).wait()


@functools.partial(jax.jit,
                   static_argnames=("k", "h", "w_valid", "interpret",
                                    "hsub", "kw_chunk", "rows", "act",
                                    "halo", "fuse_n", "epilogue", "s2d_f"))
def conv_tlane_chain(xt, w, k, h, w_valid=None, bias=None, act=None,
                     hsub=None, kw_chunk=7, rows=16, halo=False, fuse_n=0,
                     epilogue="acc", s2d_f=1, interpret=False):
    """Guard-layout conv: xt (B, C_in, HG, Wp) with valid region
    (h, w_valid) at (CHAIN_GUARD, CHAIN_WG) -> (B, C_out, HG, Wp), same
    geometry. w is HWIO (k, k, C_in, C_out); bias/act as in conv_tlane_dma.

    halo=True: the reflect halo is mirrored in-kernel on each DMA'd strip
    (requires w_valid) — no prior chain_refresh_halo needed. halo=False
    keeps the legacy contract (halos already in the bands).

    fuse_n>0: xt carries 2*fuse_n batch entries; the kernel computes
    conv(xt[i] + xt[i + fuse_n]) for i < fuse_n — elementwise-sum siamese
    fusion folded into this conv's input DMA ('mean' fusion: pre-scale w
    by 0.5).

    s2d_f=2: xt is a space-to-depth packed tensor (ops/s2d.py phase-major
    channels, w already packed with s2d_pack_weights and k the PACKED
    span) — the in-kernel halo mirrors use the per-phase geometry so the
    guard bands hold the packed reflect extension of the original image.
    Requires halo=True (the XLA chain_refresh_halo is unpacked-only)."""
    w_arg = w
    b, c_in, hg, wp = xt.shape
    c_out = w_arg.shape[-1]
    p_half = k // 2
    assert p_half <= CHAIN_WG and p_half <= CHAIN_GUARD
    assert rows % 8 == 0
    if s2d_f > 1:
        assert s2d_f == 2 and c_in % 4 == 0 and halo, (s2d_f, c_in, halo)
    if fuse_n:
        assert b == 2 * fuse_n
    b_out = fuse_n if fuse_n else b
    h8 = -(-h // 8) * 8
    if hsub is None:
        hsub = -(-h8 // rows)
    strip = rows * hsub
    grid_h = -(-h8 // strip)
    tdma = -(-(8 + rows + p_half) // 8) * 8
    # strips overrun into the bottom guard (output writes up to
    # grid_h*strip rows; the last in-DMA reads tdma - rows - 8 further)
    assert CHAIN_GUARD + grid_h * strip + (tdma - rows - 8) <= hg, \
        (grid_h, strip, tdma, hg)

    bot_strips = ()
    if halo:
        assert w_valid is not None
        # global strips whose staged read-window [s*rows - 8, +tdma)
        # touches valid-row h AND that produce output rows < h; th is the
        # (static) t-slot row of valid-coordinate h
        bot_strips = tuple(
            (s, h - s * rows + 8)
            for s in range(grid_h * hsub)
            if s * rows < h and s * rows - 8 + tdma > h)

    # weights -> [(kh, c), (kw', n)] with kw' in kw_order (p_half first)
    kw_order = [p_half] + [kw for kw in range(k) if kw != p_half]
    wm = jnp.transpose(w_arg, (0, 2, 1, 3)).reshape(k * c_in, k, c_out)
    wm = jnp.concatenate([wm[:, kw] for kw in kw_order], axis=-1)
    wm = wm.astype(xt.dtype)

    n_slots = 4 if fuse_n else 2
    kern = functools.partial(
        _conv_kernel_chain, k=k, rows=rows, hsub=hsub, wp=wp, tdma=tdma,
        c_in=c_in, c_out=c_out, out_dtype=xt.dtype, kw_chunk=kw_chunk,
        has_bias=bias is not None, act=act, p_half=p_half,
        halo_hw=(h, w_valid) if halo else None, bot_strips=bot_strips,
        fuse_n=fuse_n, epilogue=epilogue, s2d_f=s2d_f)
    operands = [xt, wm]
    in_specs = [pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.VMEM)]
    if bias is not None:
        operands.append(jnp.asarray(bias, jnp.float32).reshape(c_out, 1, 1))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    scratch = [pltpu.VMEM((n_slots, c_in, tdma, wp), xt.dtype),
               pltpu.VMEM((k * c_in, rows, wp), xt.dtype)]
    if epilogue not in ("ssa", "ssai"):
        scratch.append(pltpu.VMEM((c_out, rows, wp), jnp.float32))
    scratch += [pltpu.VMEM((2, c_out, rows, wp), xt.dtype),
                pltpu.SemaphoreType.DMA((n_slots,)),
                pltpu.SemaphoreType.DMA((2,))]
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b_out, c_out, hg, wp), xt.dtype),
        grid=(b_out, grid_h),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*operands)
    return out


def _conv_kernel_chain_pair(*refs, ka, kb, rows, hsub, wp, wv, hv, tdma,
                            c_in, c_mid, c_out, out_dtype, has_bias_a,
                            act_a, has_bias_b, act_b, pa, pb, bot_in,
                            bot_mid):
    """Fused two-conv strip pipeline on the guard layout (round-3 rewrite):
    conv_a (ka, c_in->c_mid) then conv_b (kb, c_mid->c_out) per strip with
    the intermediate VMEM-resident — conv_a's output never touches HBM and
    conv_b pays no input re-read (the round-3 breakdown probe measured the
    c_out=1 tail conv as ~15 ms of pure input-DMA overhead at b16 full
    res).

    vs the round-2 version (measured slower than two singles):
    - BOTH halos in-kernel: the input's pa-row/lane reflect mirror (same
      static pl.when patches as the single kernel) and the mid tile's
      pb mirror — no chain_refresh_halo prepass, and the old full-tile
      where-shift bottom mirror (two extra mid-tile copies per strip) is
      now a static row copy on the listed boundary strips only;
    - ssai interior-slice epilogues for both convs: uniform-width
      partial-product slices summed as SSA, no f32 accumulator RMW.

    Top-boundary garbage analysis: the input mirror covers t rows
    [8-pa, 8); conv_a reads down to t row 8-pa-pb, so mid rows m < pb are
    garbage-fed — exactly the rows the mid top mirror overwrites before
    conv_b reads them. Bottom symmetric: mid out-rows in [hv, hv+pb) are
    patched from valid mid rows; rows beyond feed only cropped outputs.
    bot_in:  static [(strip, t-row of valid row hv)] for the input mirror.
    bot_mid: static [(strip, (mid rows to fix...))] for the mid mirror.
    """
    i = 0
    x_ref = refs[i]; i += 1
    wa_ref = refs[i]; i += 1
    ba_ref = None
    if has_bias_a:
        ba_ref = refs[i]; i += 1
    wb_ref = refs[i]; i += 1
    bb_ref = None
    if has_bias_b:
        bb_ref = refs[i]; i += 1
    out_ref = refs[i]; i += 1
    t_ref, a_ref, mid_ref, amid_ref, stage_ref, in_sems, out_sems = \
        refs[i:i + 7]

    b = pl.program_id(0)
    g = pl.program_id(1)
    h0 = g * rows * hsub
    mrows = rows + 2 * pb
    kw_a = [pa] + [kw for kw in range(ka) if kw != pa]
    kw_b = [pb] + [kw for kw in range(kb) if kw != pb]

    def in_dma(slot, j):
        start = CHAIN_GUARD - 8 + h0 + j * rows
        return pltpu.make_async_copy(
            x_ref.at[b, :, pl.ds(start, tdma), :],
            t_ref.at[slot], in_sems.at[slot])

    def out_dma(slot, j):
        return pltpu.make_async_copy(
            stage_ref.at[slot],
            out_ref.at[b, :, pl.ds(CHAIN_GUARD + h0 + j * rows, rows), :],
            out_sems.at[slot])

    in_dma(0, 0).start()

    def strip(j, carry):
        slot = jax.lax.rem(j, 2)
        sgj = g * hsub + j

        @pl.when(j + 1 < hsub)
        def _():
            in_dma(1 - slot, j + 1).start()
        in_dma(slot, j).wait()

        # ---- input reflect halo (pa): rows at the H boundaries, lanes
        # every strip — identical mirror geometry to the single kernel
        @pl.when(sgj == 0)
        def _():
            for ii in range(pa):
                t_ref[slot, :, 7 - ii:8 - ii, :] = \
                    t_ref[slot, :, 9 + ii:10 + ii, :]
        for s, th in bot_in:
            @pl.when(sgj == s)
            def _(th=th):
                for ii in range(pa):
                    t_ref[slot, :, th + ii:th + ii + 1, :] = \
                        t_ref[slot, :, th - 2 - ii:th - 1 - ii, :]
        for jj in range(pa):
            t_ref[slot, :, :, CHAIN_WG - 1 - jj:CHAIN_WG - jj] = \
                t_ref[slot, :, :, CHAIN_WG + 1 + jj:CHAIN_WG + 2 + jj]
            t_ref[slot, :, :, CHAIN_WG + wv + jj:CHAIN_WG + wv + jj + 1] = \
                t_ref[slot, :, :, CHAIN_WG + wv - 2 - jj:CHAIN_WG + wv - 1 - jj]

        # ---- conv_a over mrows mid rows, ssai epilogue into mid interior
        for kh in range(ka):
            a_ref[kh * c_in:(kh + 1) * c_in, :, :] = \
                t_ref[slot, :, pl.ds(8 - pb - pa + kh, mrows), :]
        p = jax.lax.dot_general(
            wa_ref[:, :], a_ref[:, :, :], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        wia = wp - 2 * pa
        y = None
        for jj, kw in enumerate(kw_a):
            term = p[jj * c_mid:(jj + 1) * c_mid, :, kw:kw + wia]
            y = term if y is None else y + term
        if has_bias_a:
            y = y + ba_ref[:, :, :]
        mid_ref[:, :, pa:wp - pa] = _apply_act(y, act_a).astype(x_ref.dtype)

        # ---- mid reflect halo (pb): rows at boundaries, lanes every strip
        @pl.when(sgj == 0)
        def _():
            for ii in range(pb):
                mid_ref[:, pb - 1 - ii:pb - ii, :] = \
                    mid_ref[:, pb + 1 + ii:pb + 2 + ii, :]
        for s, rws in bot_mid:
            @pl.when(sgj == s)
            def _(rws=rws):
                for i2, mr in enumerate(rws):
                    src = mr - 2 * (i2 + 1)
                    mid_ref[:, mr:mr + 1, :] = mid_ref[:, src:src + 1, :]
        for jj in range(pb):
            mid_ref[:, :, CHAIN_WG - 1 - jj:CHAIN_WG - jj] = \
                mid_ref[:, :, CHAIN_WG + 1 + jj:CHAIN_WG + 2 + jj]
            mid_ref[:, :, CHAIN_WG + wv + jj:CHAIN_WG + wv + jj + 1] = \
                mid_ref[:, :, CHAIN_WG + wv - 2 - jj:CHAIN_WG + wv - 1 - jj]

        # ---- conv_b on the mid tile, ssai epilogue into the stage
        for kh in range(kb):
            amid_ref[kh * c_mid:(kh + 1) * c_mid, :, :] = \
                mid_ref[:, pl.ds(kh, rows), :]
        p2 = jax.lax.dot_general(
            wb_ref[:, :], amid_ref[:, :, :], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        wib = wp - 2 * pb
        y2 = None
        for jj, kw in enumerate(kw_b):
            term = p2[jj * c_out:(jj + 1) * c_out, :, kw:kw + wib]
            y2 = term if y2 is None else y2 + term
        if has_bias_b:
            y2 = y2 + bb_ref[:, :, :]

        @pl.when(j >= 2)
        def _():
            out_dma(slot, j - 2).wait()
        stage_ref[slot, :, :, pb:wp - pb] = \
            _apply_act(y2, act_b).astype(out_dtype)
        out_dma(slot, j).start()
        return carry

    jax.lax.fori_loop(0, hsub, strip, 0)
    for tail in (hsub - 2, hsub - 1):
        if tail >= 0:
            out_dma(tail % 2, tail).wait()


@functools.partial(jax.jit,
                   static_argnames=("ka", "kb", "h", "w_valid", "act_a",
                                    "act_b", "rows", "hsub", "interpret"))
def conv_tlane_chain_pair(xt, wa, wb, ka, kb, h, w_valid, bias_a=None,
                          act_a=None, bias_b=None, act_b=None, rows=16,
                          hsub=None, interpret=False):
    """Fused two-conv guard-layout pipeline: conv_a (ka, C_in->C_mid,
    bias_a/act_a) then conv_b (kb, C_mid->C_out, bias_b/act_b), both
    reflect-SAME, intermediate VMEM-resident. ALL halos are mirrored
    in-kernel (round-3 contract — no chain_refresh_halo prepass)."""
    b, c_in, hg, wp = xt.shape
    c_mid = wa.shape[-1]
    c_out = wb.shape[-1]
    pa, pb = ka // 2, kb // 2
    assert pa + pb <= 8 and pb <= CHAIN_WG and pa <= CHAIN_WG
    assert rows % 8 == 0
    h8 = -(-h // 8) * 8
    if hsub is None:
        hsub = -(-h8 // rows)
    strip = rows * hsub
    grid_h = -(-h8 // strip)
    tdma = -(-(8 + rows + pa + pb) // 8) * 8
    assert CHAIN_GUARD + grid_h * strip + (tdma - rows - 8) <= hg

    n_strips = grid_h * hsub
    # input bottom mirror: strips whose read window reaches valid row h
    bot_in = tuple(
        (s, h - s * rows + 8)
        for s in range(n_strips)
        if s * rows < h and s * rows - 8 + tdma > h)
    # mid bottom mirror: strips whose mid rows reach valid out-row h;
    # mid row index of out-row (h + i) in strip s is h + i - s*rows + pb
    bot_mid = []
    for s in range(n_strips):
        rws = tuple(h + i - s * rows + pb for i in range(pb)
                    if 0 <= h + i - s * rows + pb < rows + 2 * pb)
        if rws and s * rows < h:
            bot_mid.append((s, rws))
    bot_mid = tuple(bot_mid)

    def wmat(w, k, c_i, c_o):
        p = k // 2
        order = [p] + [kw for kw in range(k) if kw != p]
        m = jnp.transpose(w, (0, 2, 1, 3)).reshape(k * c_i, k, c_o)
        return jnp.concatenate([m[:, kw] for kw in order],
                               axis=-1).astype(xt.dtype)

    kern = functools.partial(
        _conv_kernel_chain_pair, ka=ka, kb=kb, rows=rows, hsub=hsub,
        wp=wp, wv=w_valid, hv=h, tdma=tdma, c_in=c_in, c_mid=c_mid,
        c_out=c_out, out_dtype=xt.dtype, has_bias_a=bias_a is not None,
        act_a=act_a, has_bias_b=bias_b is not None, act_b=act_b, pa=pa,
        pb=pb, bot_in=bot_in, bot_mid=bot_mid)

    operands = [xt, wmat(wa, ka, c_in, c_mid)]
    in_specs = [pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.VMEM)]
    if bias_a is not None:
        operands.append(jnp.asarray(bias_a, jnp.float32
                                    ).reshape(c_mid, 1, 1))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    operands.append(wmat(wb, kb, c_mid, c_out))
    in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    if bias_b is not None:
        operands.append(jnp.asarray(bias_b, jnp.float32
                                    ).reshape(c_out, 1, 1))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))

    mrows = rows + 2 * pb
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, c_out, hg, wp), xt.dtype),
        grid=(b, grid_h),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((2, c_in, tdma, wp), xt.dtype),
            pltpu.VMEM((ka * c_in, mrows, wp), xt.dtype),
            pltpu.VMEM((c_mid, mrows, wp), xt.dtype),
            pltpu.VMEM((kb * c_mid, rows, wp), xt.dtype),
            pltpu.VMEM((2, c_out, rows, wp), xt.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*operands)
    return out
