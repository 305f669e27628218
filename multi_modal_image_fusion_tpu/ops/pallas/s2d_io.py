"""Packed space-to-depth chain enter/exit strip kernels.

The s2d packed chain (ops/s2d.py, MMIF_S2D=1) enters the guard layout
via `chain_enter(s2d_pack(x))` and exits via
`s2d_unpack(chain_exit(t))`; at c=4 packed channels both take the XLA
fallback (transpose + zeros + dynamic-update-slice at ~50 GB/s — the
same path the grayscale Pallas kernels replaced for c=1,
docs/PERFORMANCE.md). These kernels do pack+place (and crop+unpack) in
ONE bandwidth-bound pass each.

The two stride-2 phase splits that make this hard on TPU are solved
without any strided vector ops:

- ROW phases ride the LANE dim: the input is viewed as
  (B, H/2, 2*(W/2)) — a free row-major reshape that concatenates each
  even/odd original-row pair into ONE double-width packed row, phase 0
  in lanes [0, W/2), phase 1 in lanes [W/2, 2*W/2). Strips of whole
  packed rows DMA with 8-aligned sublane starts/sizes and full lane
  extent (no slicing of any size-2 phase dim — Mosaic requires slices
  along a tiled dim to be tile-aligned, and a (..., 2, W/2) view gets
  the phase dim tiled at 2, rejecting the size-1 per-phase slice at
  exactly the headline shape). Phases then separate in VMEM as
  unit-stride lane slices at W/2-multiples. The one misaligned tail
  (H/2 % 8 == 4 when H % 16 == 8) is read through the UNSPLIT flat view
  (always 8-aligned for H % 8 == 0) and deinterleaved in-VMEM on a
  single 8-sublane tile.
- LANE phases use a bit-pun: a bf16 (even, odd) lane pair IS one u32
  lane. The kernel DMAs u32 (half the lanes), then
      even = bf16(bitcast_f32(u << 16))
      odd  = bf16(bitcast_f32(u & 0xffff0000))
  — a bf16 value v equals the f32 whose top 16 bits are v's pattern, so
  both are exact, pure per-lane VPU ops. The exit inverts:
      u = (bitcast_u32(f32(even)) >> 16) | (bitcast_u32(f32(odd)) & 0xffff0000).

Eligibility: bf16, H % 8 == 0, W % 256 == 0 (u32 lanes W/2 must be a
128-multiple). The headline 1224x1024 qualifies. Everything else keeps
the XLA path.

Phase convention matches ops/s2d.py (phase-major): channel (py*2+px)
holds original pixel (2y+py, 2x+px). Reference conv contract being
served: core/block.py:26-99 via the packed chain (zoo.py DeepFuse).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .conv_kernel import CHAIN_GUARD, CHAIN_WG, chain_shape

_RCHUNK = 128   # packed rows per strip


def s2d_io_ok(h, w, dtype):
    return (dtype == jnp.bfloat16 and h % 8 == 0 and w % 256 == 0
            and h >= 32)


def _chunks(n):
    """Aligned (start, size) strips covering [0, floor8(n)); n % 8 is
    handled by the caller's tail path (only 0 or 4 can occur for
    h % 8 == 0 inputs)."""
    full = (n // 8) * 8
    out = []
    pos = 0
    while pos < full:
        out.append((pos, min(_RCHUNK, full - pos)))
        pos += min(_RCHUNK, full - pos)
    return out, n - full


def _split_lanes(u):
    """u32 lanes -> (even, odd) bf16 lanes (exact, see module doc)."""
    f_even = jax.lax.bitcast_convert_type(u << 16, jnp.float32)
    f_odd = jax.lax.bitcast_convert_type(u & jnp.uint32(0xffff0000),
                                         jnp.float32)
    return f_even.astype(jnp.bfloat16), f_odd.astype(jnp.bfloat16)


def _merge_lanes(even, odd):
    """(even, odd) bf16 lanes -> u32 lanes (inverse of _split_lanes)."""
    pe = jax.lax.bitcast_convert_type(even.astype(jnp.float32),
                                      jnp.uint32)
    po = jax.lax.bitcast_convert_type(odd.astype(jnp.float32),
                                      jnp.uint32)
    return (pe >> 16) | (po & jnp.uint32(0xffff0000))


def _enter_kernel(xv_ref, xt_ref, out_ref, t_ref, tt_ref, s_ref, st_ref,
                  in_sems, int_sem, out_sems, outt_sem, *,
                  chunks, tail, w2, wp):
    b = pl.program_id(0)

    def in_dma(slot, start, size):
        return pltpu.make_async_copy(
            xv_ref.at[b, pl.ds(start, size), :],
            t_ref.at[slot, pl.ds(0, size)], in_sems.at[slot])

    def out_dma(slot, start, size):
        return pltpu.make_async_copy(
            s_ref.at[slot, :, pl.ds(0, size), :],
            out_ref.at[b, :, pl.ds(CHAIN_GUARD + start, size), :],
            out_sems.at[slot])

    n = len(chunks)
    in_dma(0, *chunks[0]).start()
    for j, (start, size) in enumerate(chunks):
        slot = j % 2
        if j + 1 < n:
            in_dma(1 - slot, *chunks[j + 1]).start()
        in_dma(slot, start, size).wait()
        if j >= 2:
            out_dma(slot, *chunks[j - 2]).wait()
        for py in (0, 1):
            # phase py = lanes [py*w2, (py+1)*w2) of the merged row
            even, odd = _split_lanes(t_ref[slot, :, py * w2:(py + 1) * w2])
            s_ref[slot, 2 * py, :, CHAIN_WG:CHAIN_WG + w2] = even
            s_ref[slot, 2 * py + 1, :, CHAIN_WG:CHAIN_WG + w2] = odd
        out_dma(slot, start, size).start()
    for t in (n - 2, n - 1):
        if t >= 0:
            out_dma(t % 2, *chunks[t]).wait()

    if tail:
        # last `tail` (=4) packed rows: read the flat view's final 8
        # original rows (8-aligned), deinterleave one tiny tile in-VMEM
        c = pltpu.make_async_copy(xt_ref.at[b], tt_ref, int_sem)
        c.start()
        c.wait()
        tt = tt_ref[:, :]
        full = chunks[-1][0] + chunks[-1][1] if chunks else 0
        for py in (0, 1):
            # phase rows py, py+2, ... as unit-stride slices + concat —
            # Mosaic rejects strided vector slices (strides must be 1)
            rows = jnp.concatenate(
                [tt[py + 2 * i:py + 2 * i + 1, :] for i in range(tail)],
                axis=0)
            even, odd = _split_lanes(rows)
            st_ref[2 * py, :tail, CHAIN_WG:CHAIN_WG + w2] = even
            st_ref[2 * py + 1, :tail, CHAIN_WG:CHAIN_WG + w2] = odd
        # 8-row out DMA: rows [full, full+2*tail) — the upper half lands
        # in guard zone (uninitialized staging rows), allowed by the
        # chain invariant
        c = pltpu.make_async_copy(
            st_ref,
            out_ref.at[b, :, pl.ds(CHAIN_GUARD + full, 2 * tail), :],
            outt_sem)
        c.start()
        c.wait()


@functools.partial(jax.jit, static_argnames="interpret")
def s2d_chain_enter(x, interpret=False):
    """NHWC grayscale (B, H, W, 1) bf16 -> packed guard layout
    (B, 4, HG, Wp) for the (H/2, W/2) image, phase-major channels.
    Equals `chain_enter(s2d_pack(x))` on the valid region; guards are
    uninitialized (consumers mirror halos in-kernel)."""
    b, h, w, _ = x.shape
    assert s2d_io_ok(h, w, x.dtype), (h, w, x.dtype)
    h2, w2 = h // 2, w // 2
    hg, wp = chain_shape(h2, w2)
    xu = jax.lax.bitcast_convert_type(x.reshape(b, h, w2, 2), jnp.uint32)
    xv = xu.reshape(b, h2, 2 * w2)   # row pair -> one double-width row
    chunks, tail = _chunks(h2)
    xt = xu[:, h - 8:, :] if tail else jnp.zeros((b, 8, w2), jnp.uint32)

    kern = functools.partial(_enter_kernel, chunks=tuple(chunks), tail=tail,
                             w2=w2, wp=wp)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, 4, hg, wp), x.dtype),
        grid=(b,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                  pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((2, _RCHUNK, 2 * w2), jnp.uint32),
            pltpu.VMEM((8, w2), jnp.uint32),
            pltpu.VMEM((2, 4, _RCHUNK, wp), x.dtype),
            pltpu.VMEM((4, 8, wp), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xv, xt)


def _exit_kernel(xt_ref, out_ref, outt_ref, t_ref, s_ref, st_ref,
                 in_sems, out_sems, outt_sem, *, chunks, tail, w2, wp):
    b = pl.program_id(0)

    def in_dma(slot, start, size):
        # reads may run past the valid packed rows into guard garbage
        # (hg has >= 80 rows of slack); garbage rows are never written out
        return pltpu.make_async_copy(
            xt_ref.at[b, :, pl.ds(CHAIN_GUARD + start, size), :],
            t_ref.at[slot, :, pl.ds(0, size)], in_sems.at[slot])

    def out_dma(slot, start, size):
        return pltpu.make_async_copy(
            s_ref.at[slot, pl.ds(0, size)],
            out_ref.at[b, pl.ds(start, size), :], out_sems.at[slot])

    n = len(chunks)
    in_dma(0, *chunks[0]).start()
    for j, (start, size) in enumerate(chunks):
        slot = j % 2
        if j + 1 < n:
            in_dma(1 - slot, *chunks[j + 1]).start()
        in_dma(slot, start, size).wait()
        if j >= 2:
            out_dma(slot, *chunks[j - 2]).wait()
        for py in (0, 1):
            # phase py -> lanes [py*w2, (py+1)*w2) of the merged row
            s_ref[slot, :, py * w2:(py + 1) * w2] = _merge_lanes(
                t_ref[slot, 2 * py, :, CHAIN_WG:CHAIN_WG + w2],
                t_ref[slot, 2 * py + 1, :, CHAIN_WG:CHAIN_WG + w2])
        out_dma(slot, start, size).start()
    for t in (n - 2, n - 1):
        if t >= 0:
            out_dma(t % 2, *chunks[t]).wait()

    if tail:
        full = chunks[-1][0] + chunks[-1][1] if chunks else 0
        c = pltpu.make_async_copy(
            xt_ref.at[b, :, pl.ds(CHAIN_GUARD + full, 8), :],
            t_ref.at[0, :, pl.ds(0, 8)], in_sems.at[0])
        c.start()
        c.wait()
        rows = []
        for i in range(tail):
            for py in (0, 1):
                rows.append(_merge_lanes(
                    t_ref[0, 2 * py, i:i + 1, CHAIN_WG:CHAIN_WG + w2],
                    t_ref[0, 2 * py + 1, i:i + 1, CHAIN_WG:CHAIN_WG + w2]))
        st_ref[:, :] = jnp.concatenate(rows, axis=0)
        c = pltpu.make_async_copy(st_ref, outt_ref.at[b], outt_sem)
        c.start()
        c.wait()


@functools.partial(jax.jit, static_argnames=("h", "w", "interpret"))
def s2d_chain_exit(xt, h, w, interpret=False):
    """Packed guard layout (B, 4, HG, Wp) bf16 -> NHWC (B, H, W, 1).
    Inverse of `s2d_chain_enter` on the valid region; equals
    `s2d_unpack(chain_exit(xt, h//2, w//2))`. h, w are ORIGINAL dims."""
    b = xt.shape[0]
    assert s2d_io_ok(h, w, xt.dtype), (h, w, xt.dtype)
    h2, w2 = h // 2, w // 2
    chunks, tail = _chunks(h2)

    kern = functools.partial(_exit_kernel, chunks=tuple(chunks), tail=tail,
                             w2=w2, wp=xt.shape[3])
    out, outt = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((b, h2, 2 * w2), jnp.uint32),
                   jax.ShapeDtypeStruct((b, 2 * tail if tail else 8, w2),
                                        jnp.uint32)),
        grid=(b,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.HBM),
                   pl.BlockSpec(memory_space=pltpu.HBM)),
        scratch_shapes=[
            pltpu.VMEM((2, 4, _RCHUNK, xt.shape[3]), xt.dtype),
            pltpu.VMEM((2, _RCHUNK, 2 * w2), jnp.uint32),
            pltpu.VMEM((8, w2), jnp.uint32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xt)
    u = out.reshape(b, h2 * 2, w2)
    if tail:
        full = (h2 // 8) * 8
        u = jax.lax.dynamic_update_slice(u, outt, (0, 2 * full, 0))
    y = jax.lax.bitcast_convert_type(u, jnp.bfloat16)   # (B, H, W2, 2)
    return y.reshape(b, h, w, 1)
