"""Superseded shifted-GEMM conv kernel variants (rounds 1-2 journey).

These are the measured intermediate designs that led to the production
`conv_tlane_dma` / `conv_tlane_chain` kernels (ops/pallas/conv_kernel.py);
each hit a specific Mosaic/VMEM wall documented in docs/PERFORMANCE.md:

- `conv_shifted_gemm` (+ `ashift` variant): NHWC tiles — every c=32 VMEM
  buffer pays a 4x 128-lane padding tax; full-res tiles exceed the VMEM
  budget except at launch-overhead-dominated strips (6-10 TFLOPS).
- `conv_shifted_gemm_tlane`: W-on-lanes, kw via pltpu.roll — lane-dense but
  each kw pays a full f32 roll copy (Mosaic rejects bf16 rotates); matmul
  M = c_out = 32 is M-starved (8.2 TFLOPS).
- `conv_tlane_gemm` ("tlane2"): big-M fix (M = k*c_out) + static lane-slice
  epilogue — 9.5 TFLOPS, bounded by the 45 ms host-side halo gather that
  conv_tlane_dma's in-kernel DMA removed.
- `conv_shifted_gemm_ilane`: (w, c) interleaved on lanes — blocked by
  Mosaic's unsupported lane-to-sublane unfold reshape.

They are kept runnable (regression-tested in tests/test_pallas.py) so the
measured numbers in docs/PERFORMANCE.md stay reproducible, but nothing in
the package imports them.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv_kernel(x_ref, w_ref, out_ref, a_ref, acc_ref, *, k, rows, w_out,
                 c_in, c_out, out_dtype, p_dtype, kw_chunk):
    """x_ref: (1,1,1, rows+k-1, wtile+k-1, c_in);
    w_ref: (k*c_in, k*c_out); out_ref: (1,1,1, rows, wtile, c_out);
    a_ref: (rows*(wtile+k-1), k*c_in) — flattened M (a 3-D batched dot
    makes Mosaic materialize far larger stack temporaries).

    kw_chunk: how many kw positions each matmul covers. kw_chunk == k is a
    single full matmul (biggest N, biggest partial-product buffer);
    smaller chunks trade MXU lane utilization (N = kw_chunk*c_out) for a
    k/kw_chunk-times smaller live set, buying larger tiles under the VMEM
    ceiling."""
    wp = x_ref.shape[4]
    for kh in range(k):
        a_ref[:, kh * c_in:(kh + 1) * c_in] = \
            x_ref[0, 0, 0, pl.ds(kh, rows), :, :].reshape(rows * wp, c_in)

    # accumulate in-place into a scratch ref: an SSA value chain makes
    # Mosaic keep every partial term live on the kernel stack
    for kw0 in range(0, k, kw_chunk):
        g = min(kw_chunk, k - kw0)
        p = jnp.dot(a_ref[:, :],
                    w_ref[:, kw0 * c_out:(kw0 + g) * c_out],
                    preferred_element_type=p_dtype)
        p = p.reshape(rows, wp, g * c_out)
        for j in range(g):
            kw = kw0 + j
            term = p[:, kw:kw + w_out, j * c_out:(j + 1) * c_out]
            if kw == 0:
                acc_ref[:, :, :] = term
            else:
                acc_ref[:, :, :] += term
    out_ref[0, 0, 0] = acc_ref[:, :, :].astype(out_dtype)


def _conv_kernel_ashift(x_ref, w_ref, out_ref, a_ref, acc_ref, *, k, rows,
                        w_out, c_in, c_out, out_dtype, p_dtype, kw_chunk):
    """Epilogue-free variant: instead of slicing the partial-product
    buffer's output columns, slice the A stack's input columns per kw —
    each kw is then an (M, k*c_in) x (k*c_in, c_out) matmul whose result
    adds straight into the accumulator with no strided-slice epilogue.
    Trades one extra A-slice copy per kw for never materializing the
    (k*c_out)-wide partial products."""
    wp = x_ref.shape[4]
    for kh in range(k):
        a_ref[:, :, kh * c_in:(kh + 1) * c_in] = \
            x_ref[0, 0, 0, pl.ds(kh, rows), :, :]

    for kw in range(k):
        a_kw = a_ref[:, pl.ds(kw, w_out), :].reshape(rows * w_out,
                                                     k * c_in)
        p = jnp.dot(a_kw, w_ref[:, kw * c_out:(kw + 1) * c_out],
                    preferred_element_type=p_dtype)
        p = p.reshape(rows, w_out, c_out)
        if kw == 0:
            acc_ref[:, :, :] = p
        else:
            acc_ref[:, :, :] += p
    out_ref[0, 0, 0] = acc_ref[:, :, :].astype(out_dtype)


@functools.partial(jax.jit,
                   static_argnames=("k", "interpret", "rows", "wtile",
                                    "kw_chunk", "ashift"))
def conv_shifted_gemm(x, w, k, rows=16, wtile=512, kw_chunk=None,
                      ashift=False, interpret=False):
    """x: (B, H + k - 1, W + k - 1, C_in) pre-padded NHWC;
    w: (k, k, C_in, C_out) HWIO. Returns (B, H, W, C_out).

    2-D tiling: strips of `rows` output rows x `wtile` output columns, each
    with a (k-1) halo in both dims. Tall-and-narrow tiles keep the matmul M
    large (few program launches) while the f32 partial-product buffer fits
    the 16MB VMEM budget.
    """
    b, hp, wp_raw, c_in = x.shape
    c_out = w.shape[-1]
    h = hp - (k - 1)
    w_out_final = wp_raw - (k - 1)
    p_dtype = jnp.float32   # Mosaic requires 32-bit matmul accumulators

    grid_h = pl.cdiv(h, rows)
    grid_w = pl.cdiv(w_out_final, wtile)
    hp_pad = grid_h * rows + (k - 1) - hp
    wp_pad = grid_w * wtile + (k - 1) - wp_raw
    x = jnp.pad(x, ((0, 0), (0, hp_pad), (0, wp_pad), (0, 0)))

    # weights: (k, k, C_in, C_out) -> [(kh, c), (kw, n)]
    wm = jnp.transpose(w, (0, 2, 1, 3)).reshape(k * c_in, k * c_out)
    wm = wm.astype(x.dtype)

    # overlapping halo tiles, materialized host-side: duplication is
    # (rows+k-1)/rows * (wtile+k-1)/wtile (~1.4x at 16x512 for k7)
    idx_h = (np.arange(grid_h)[:, None] * rows +
             np.arange(rows + k - 1)[None, :])
    idx_w = (np.arange(grid_w)[:, None] * wtile +
             np.arange(wtile + k - 1)[None, :])
    tiles = x[:, idx_h, :, :][:, :, :, idx_w, :]
    # (b, grid_h, rows+k-1, grid_w, wtile+k-1, c_in) -> move grid_w fwd
    tiles = jnp.moveaxis(tiles, 3, 2)

    if kw_chunk is None:
        kw_chunk = k
    kern_fn = _conv_kernel_ashift if ashift else _conv_kernel
    kern = functools.partial(kern_fn, k=k, rows=rows, w_out=wtile,
                             c_in=c_in, c_out=c_out, out_dtype=x.dtype,
                             p_dtype=p_dtype, kw_chunk=kw_chunk)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(
            (b, grid_h, grid_w, rows, wtile, c_out), x.dtype),
        grid=(b, grid_h, grid_w),
        in_specs=[
            pl.BlockSpec((1, 1, 1, rows + k - 1, wtile + k - 1, c_in),
                         lambda bi, i, j: (bi, i, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k * c_in, k * c_out), lambda bi, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, rows, wtile, c_out),
                               lambda bi, i, j: (bi, i, j, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            (pltpu.VMEM((rows, wtile + k - 1, k * c_in), x.dtype)
             if ashift else
             pltpu.VMEM((rows * (wtile + k - 1), k * c_in), x.dtype)),
            pltpu.VMEM((rows, wtile, c_out), jnp.float32),
        ],
        interpret=interpret,
    )(tiles, wm)

    # (b, grid_h, grid_w, rows, wtile, c_out) -> (b, H, W, c_out)
    out = jnp.moveaxis(out, 2, 3).reshape(b, grid_h * rows, grid_w * wtile,
                                          c_out)
    return out[:, :h, :w_out_final, :]

def _conv_kernel_tlane(t_ref, w_ref, out_ref, a_ref, acc_ref, *, k, rows,
                       w_out, c_in, c_out, out_dtype):
    """Transposed-layout kernel: W on lanes, channels on sublane-major dims
    — every buffer is lane-dense (no 4x 128-lane padding tax on c=32).

    t_ref:   (1,1,1, c_in, rows+k-1, Wp)   input tile, NCHW-ish
    w_ref:   (k*c_in, k*c_out)             [(kh,c), (kw,n)]
    out_ref: (1,1,1, c_out, rows, w_out)
    a_ref:   (k*c_in, rows, Wp)            A[(kh,c), r, w] = t[c, r+kh, w]
    acc_ref: (c_out, rows, Wp)             f32 accumulator

    For each kw: roll A left by kw lanes (w+kw indexing) and contract over
    (kh,c) on the MXU: P_kw[n, r, w] = sum_K wm[K, (kw,n)] * A_kw[K, r, w].
    Accumulation is dense; wrap garbage lives beyond w_out and is never
    written out.
    """
    wp = t_ref.shape[5]
    for kh in range(k):
        a_ref[kh * c_in:(kh + 1) * c_in, :, :] = \
            t_ref[0, 0, 0, :, pl.ds(kh, rows), :]

    for kw in range(k):
        a = a_ref[:, :, :]
        if kw:
            # pltpu.roll rejects non-32-bit data; roll in f32 when needed
            if a.dtype == jnp.float32:
                a = pltpu.roll(a, wp - kw, 2)   # left-shift by kw lanes
            else:
                a = pltpu.roll(a.astype(jnp.float32), wp - kw,
                               2).astype(a.dtype)
        p = jax.lax.dot_general(
            w_ref[:, kw * c_out:(kw + 1) * c_out], a,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (c_out, rows, Wp)
        if kw == 0:
            acc_ref[:, :, :] = p
        else:
            acc_ref[:, :, :] += p
    out_ref[0, 0, 0] = acc_ref[:, :, pl.ds(0, w_out)].astype(out_dtype)


@functools.partial(jax.jit,
                   static_argnames=("k", "interpret", "rows", "wtile"))
def conv_shifted_gemm_tlane(x, w, k, rows=16, wtile=506, interpret=False):
    """Transposed-layout shifted-GEMM conv. Same contract as
    conv_shifted_gemm (pre-padded NHWC in, NHWC out); internally runs in
    (C, H, W) tiles with W on the lane dim. Best when wtile + k - 1 is a
    multiple of 128 (wtile=506 for k=7)."""
    b, hp, wp_raw, c_in = x.shape
    c_out = w.shape[-1]
    h = hp - (k - 1)
    w_out_final = wp_raw - (k - 1)

    grid_h = pl.cdiv(h, rows)
    grid_w = pl.cdiv(w_out_final, wtile)
    hp_pad = grid_h * rows + (k - 1) - hp
    wp_pad = grid_w * wtile + (k - 1) - wp_raw
    x = jnp.pad(x, ((0, 0), (0, hp_pad), (0, wp_pad), (0, 0)))

    xt = jnp.transpose(x, (0, 3, 1, 2))       # (B, C, Hp, Wp)

    wm = jnp.transpose(w, (0, 2, 1, 3)).reshape(k * c_in, k * c_out)
    wm = wm.astype(x.dtype)

    idx_h = (np.arange(grid_h)[:, None] * rows +
             np.arange(rows + k - 1)[None, :])
    idx_w = (np.arange(grid_w)[:, None] * wtile +
             np.arange(wtile + k - 1)[None, :])
    tiles = xt[:, :, idx_h, :][..., idx_w]
    # (B, C, grid_h, rows+k-1, grid_w, wtile+k-1) -> (B, gh, gw, C, r, w)
    tiles = jnp.transpose(tiles, (0, 2, 4, 1, 3, 5))

    wp = wtile + k - 1
    kern = functools.partial(_conv_kernel_tlane, k=k, rows=rows,
                             w_out=wtile, c_in=c_in, c_out=c_out,
                             out_dtype=x.dtype)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(
            (b, grid_h, grid_w, c_out, rows, wtile), x.dtype),
        grid=(b, grid_h, grid_w),
        in_specs=[
            pl.BlockSpec((1, 1, 1, c_in, rows + k - 1, wp),
                         lambda bi, i, j: (bi, i, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k * c_in, k * c_out), lambda bi, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, c_out, rows, wtile),
                               lambda bi, i, j: (bi, i, j, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((k * c_in, rows, wp), x.dtype),
            pltpu.VMEM((c_out, rows, wp), jnp.float32),
        ],
        interpret=interpret,
    )(tiles, wm)

    # (B, gh, gw, C, rows, wtile) -> NHWC
    out = jnp.transpose(out, (0, 1, 4, 2, 5, 3)).reshape(
        b, grid_h * rows, grid_w * wtile, c_out)
    return out[:, :h, :w_out_final, :]

def _conv_kernel_tlane2(t_ref, w_ref, out_ref, a_ref, acc_ref, *, k, rows,
                        w_out, c_in, c_out, out_dtype, kw_chunk):
    """Big-M transposed-layout kernel — the round-2 fix for the three
    round-1 Mosaic blockers (docs/PERFORMANCE.md):

      (a) NHWC lane-padding tax   -> W on lanes: every buffer lane-dense
      (b) per-kw f32 roll copies  -> static lane-slice epilogue, no rolls
      (c) unsupported unfold      -> A built from k sublane-shift copies

    The matmul contracts (kh,c) with an (kh,c) x (kw,n) weight matrix, so
    M = kw_chunk*c_out (224 for k7/c32, MXU-shaped) instead of the old
    tlane's starved M = c_out = 32; the w+kw indexing that the old variant
    paid for with rolls is a *static lane slice* of the partial products.

    t_ref:   (1,1,1, c_in, rows+k-1, wp)   input tile, W on lanes
    w_ref:   (k*c_in, k*c_out)             [(kh,c), (kw,n)]
    out_ref: (1,1,1, c_out, rows, w_out)
    a_ref:   (k*c_in, rows, wp)            A[(kh,c), r, w] = t[c, r+kh, w]
    acc_ref: (c_out, rows, w_out)          f32

    out[n,r,w] = sum_kw P[(kw,n), r, w+kw],
    P[(kw,n), r, w'] = sum_{kh,c} W[kh,kw,c,n] * t[c, r+kh, w'].
    """
    for kh in range(k):
        a_ref[kh * c_in:(kh + 1) * c_in, :, :] = \
            t_ref[0, 0, 0, :, pl.ds(kh, rows), :]

    for kw0 in range(0, k, kw_chunk):
        g = min(kw_chunk, k - kw0)
        p = jax.lax.dot_general(
            w_ref[:, kw0 * c_out:(kw0 + g) * c_out], a_ref[:, :, :],
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)   # (g*c_out, rows, wp)
        for j in range(g):
            kw = kw0 + j
            term = p[j * c_out:(j + 1) * c_out, :, kw:kw + w_out]
            if kw == 0:
                acc_ref[:, :, :] = term
            else:
                acc_ref[:, :, :] += term
    out_ref[0, 0, 0] = acc_ref[:, :, :].astype(out_dtype)


@functools.partial(jax.jit,
                   static_argnames=("k", "interpret", "rows", "wtile",
                                    "kw_chunk"))
def conv_tlane_gemm(x, w, k, rows=8, wtile=None, kw_chunk=4,
                    interpret=False):
    """Big-M transposed-layout shifted-GEMM conv (the round-2 kernel).

    Same contract as conv_shifted_gemm: x (B, H+k-1, W+k-1, C_in)
    pre-padded NHWC, w (k, k, C_in, C_out) HWIO -> (B, H, W, C_out).
    wtile=None processes full-width strips (one w tile)."""
    b, hp, wp_raw, c_in = x.shape
    c_out = w.shape[-1]
    h = hp - (k - 1)
    w_out_final = wp_raw - (k - 1)
    if wtile is None:
        wtile = w_out_final

    grid_h = pl.cdiv(h, rows)
    grid_w = pl.cdiv(w_out_final, wtile)
    # the A/P trailing dims get flattened as (rows, wp) -> (rows*wp) inside
    # the kernel's dot_general — Mosaic only supports that shape cast when
    # the lane dim is a multiple of 128, so round the halo'd tile width up
    # (the extra columns are computed and discarded; 12% FLOPs at W=1024)
    wp = -(-(wtile + k - 1) // 128) * 128
    hp_pad = grid_h * rows + (k - 1) - hp
    wpad = (grid_w - 1) * wtile + wp - wp_raw
    x = jnp.pad(x, ((0, 0), (0, hp_pad), (0, max(wpad, 0)), (0, 0)))

    xt = jnp.transpose(x, (0, 3, 1, 2))       # (B, C, Hp, Wp)

    wm = jnp.transpose(w, (0, 2, 1, 3)).reshape(k * c_in, k * c_out)
    wm = wm.astype(x.dtype)

    idx_h = (np.arange(grid_h)[:, None] * rows +
             np.arange(rows + k - 1)[None, :])
    idx_w = (np.arange(grid_w)[:, None] * wtile +
             np.arange(wp)[None, :])
    tiles = xt[:, :, idx_h, :][..., idx_w]
    # (B, C, grid_h, rows+k-1, grid_w, wp) -> (B, gh, gw, C, r, w)
    tiles = jnp.transpose(tiles, (0, 2, 4, 1, 3, 5))
    kern = functools.partial(_conv_kernel_tlane2, k=k, rows=rows,
                             w_out=wtile, c_in=c_in, c_out=c_out,
                             out_dtype=x.dtype, kw_chunk=kw_chunk)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(
            (b, grid_h, grid_w, c_out, rows, wtile), x.dtype),
        grid=(b, grid_h, grid_w),
        in_specs=[
            pl.BlockSpec((1, 1, 1, c_in, rows + k - 1, wp),
                         lambda bi, i, j: (bi, i, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k * c_in, k * c_out), lambda bi, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, c_out, rows, wtile),
                               lambda bi, i, j: (bi, i, j, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((k * c_in, rows, wp), x.dtype),
            pltpu.VMEM((c_out, rows, wtile), jnp.float32),
        ],
        interpret=interpret,
    )(tiles, wm)

    # (B, gh, gw, C, rows, wtile) -> NHWC
    out = jnp.transpose(out, (0, 1, 4, 2, 5, 3)).reshape(
        b, grid_h * rows, grid_w * wtile, c_out)
    return out[:, :h, :w_out_final, :]

def _conv_kernel_ilane(t_ref, w_ref, out_ref, a_ref, acc_ref, *, k, rows,
                       w_out, c_in, c_out, out_dtype, kw_chunk):
    """Interleaved-lane kernel: input/output lanes carry (w, c) interleaved,
    so every buffer is lane-dense (no 4x 128-lane padding on c=32) while
    the matmul keeps the MXU-shaped K=k*c_in x N=kw_chunk*c_out form.

    t_ref:   (1,1,1, rows+k-1, (wtile+k-1)*c_in)
    w_ref:   (k*c_in, k*c_out)
    out_ref: (1,1,1, rows, wtile*c_out)
    a_ref:   (rows*(wtile+k-1), k*c_in)
    acc_ref: (rows, wtile*c_out) f32
    """
    wp = t_ref.shape[4] // c_in
    for kh in range(k):
        a_ref[:, kh * c_in:(kh + 1) * c_in] = \
            t_ref[0, 0, 0, pl.ds(kh, rows), :].reshape(rows * wp, c_in)

    for kw0 in range(0, k, kw_chunk):
        g = min(kw_chunk, k - kw0)
        p = jnp.dot(a_ref[:, :],
                    w_ref[:, kw0 * c_out:(kw0 + g) * c_out],
                    preferred_element_type=jnp.float32)
        p = p.reshape(rows, wp, g * c_out)
        for j in range(g):
            kw = kw0 + j
            term = p[:, kw:kw + w_out,
                     j * c_out:(j + 1) * c_out].reshape(rows,
                                                        w_out * c_out)
            if kw == 0:
                acc_ref[:, :] = term
            else:
                acc_ref[:, :] += term
    out_ref[0, 0, 0] = acc_ref[:, :].astype(out_dtype)


@functools.partial(jax.jit,
                   static_argnames=("k", "interpret", "rows", "wtile",
                                    "kw_chunk"))
def conv_shifted_gemm_ilane(x, w, k, rows=16, wtile=506, kw_chunk=4,
                            interpret=False):
    """Interleaved-lane shifted-GEMM conv (same contract as
    conv_shifted_gemm)."""
    b, hp, wp_raw, c_in = x.shape
    c_out = w.shape[-1]
    h = hp - (k - 1)
    w_out_final = wp_raw - (k - 1)

    grid_h = pl.cdiv(h, rows)
    grid_w = pl.cdiv(w_out_final, wtile)
    hp_pad = grid_h * rows + (k - 1) - hp
    wp_pad = grid_w * wtile + (k - 1) - wp_raw
    x = jnp.pad(x, ((0, 0), (0, hp_pad), (0, wp_pad), (0, 0)))

    wm = jnp.transpose(w, (0, 2, 1, 3)).reshape(k * c_in, k * c_out)
    wm = wm.astype(x.dtype)

    idx_h = (np.arange(grid_h)[:, None] * rows +
             np.arange(rows + k - 1)[None, :])
    idx_w = (np.arange(grid_w)[:, None] * wtile +
             np.arange(wtile + k - 1)[None, :])
    tiles = x[:, idx_h, :, :][:, :, :, idx_w, :]
    tiles = jnp.moveaxis(tiles, 3, 2)
    # interleave (w, c) on lanes
    wp = wtile + k - 1
    tiles = tiles.reshape(b, grid_h, grid_w, rows + k - 1, wp * c_in)

    kern = functools.partial(_conv_kernel_ilane, k=k, rows=rows,
                             w_out=wtile, c_in=c_in, c_out=c_out,
                             out_dtype=x.dtype, kw_chunk=kw_chunk)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(
            (b, grid_h, grid_w, rows, wtile * c_out), x.dtype),
        grid=(b, grid_h, grid_w),
        in_specs=[
            pl.BlockSpec((1, 1, 1, rows + k - 1, wp * c_in),
                         lambda bi, i, j: (bi, i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k * c_in, k * c_out), lambda bi, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, rows, wtile * c_out),
                               lambda bi, i, j: (bi, i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((rows * wp, k * c_in), x.dtype),
            pltpu.VMEM((rows, wtile * c_out), jnp.float32),
        ],
        interpret=interpret,
    )(tiles, wm)

    out = out.reshape(b, grid_h, grid_w, rows, wtile, c_out)
    out = jnp.moveaxis(out, 2, 3).reshape(b, grid_h * rows,
                                          grid_w * wtile, c_out)
    return out[:, :h, :w_out_final, :]
