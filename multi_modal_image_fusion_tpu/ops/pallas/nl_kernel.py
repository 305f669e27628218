"""Flash-style non-local spatial attention kernel.

The 'nl' spatial-attention fusion (reference core/fusion.py:84-117) forms
an energy matrix ``e = q @ k^T`` of shape (HW, HW/64) — ~98 GB at the
1224x1024 polarization resolution — min-max normalizes it globally,
row-softmaxes, and applies it to the pooled values. The XLA streaming path
(`fusion._nl_spatial_blocked`) already avoids materializing the full
matrix, but every scanned block still round-trips its energy tile through
HBM three times (dot out, softmax chain, weight read for the second dot):
measured ~1.1 s/pair on Res2Fusion, HBM-bound, not FLOP-bound.

This kernel keeps each energy tile in VMEM:

  pass 1  (`_nl_minmax_kernel`)  global min/max of the masked energy —
          a dot + reduce per (q block x k tile), accumulated across the
          whole grid into one (8, 128) block (constant output index map).
  pass 2  (`_nl_apply_kernel`)   out = softmax((e - lo)/(hi - lo)) @ k.
          KEY SIMPLIFICATION: after global min-max normalization every
          energy is in [0, 1], so exp() cannot overflow and no
          flash-attention online max-rescaling is needed — plain
          ``acc += exp(s) @ k ; l += rowsum(exp(s))`` tiles, one divide
          at the end.

Math is identical to `_nl_spatial_blocked` (softmax is shift-invariant, so
subtracting the row max — which jax.nn.softmax does — changes nothing);
the only numeric difference is tile-order summation and the bf16 cast of
*unnormalized* weights before the value dot (the XLA path casts the
normalized weights), both O(eps) relative.

Total HBM traffic: q twice + out once (~1 GB/pair at full res) instead of
the energy matrix three times (~300 GB/pair).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -3.0e38
_POS = 3.0e38


def _dot_f32(a, b_t):
    """a [M, C] @ b_t [N, C]^T -> [M, N] with an f32 accumulator."""
    return jax.lax.dot_general(
        a, b_t, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def _col_mask(t, mt, m):
    """[1, mt] bool: which lanes of k tile t are real (col < m)."""
    col = jax.lax.broadcasted_iota(jnp.int32, (1, mt), 1) + t * mt
    return col < m


def _nl_minmax_kernel(q_ref, k_ref, lo_ref, hi_ref, *, bn, mt, n, m):
    # Mosaic-safe by construction: the loop carries are (bn, 1) lane
    # reductions (no scalar f32 carries), and the cross-grid accumulator
    # is an elementwise min/max on a resident (bn, 128) block fed by a
    # LANE-ONLY broadcast of the (bn, 1) carry. No (1, 1) vector exists
    # anywhere in the kernel: Mosaic rejects (1,1)->block broadcasts
    # ("Broadcast in both sublanes and lanes"), and splitting one into
    # two single-axis broadcasts does not survive the canonicalizer —
    # it re-fuses them into the rejected form (measured, queue2). The
    # scalar reduction happens OUTSIDE the kernel on the (bn, 128) block.
    bi = pl.program_id(0)
    qi = pl.program_id(1)

    @pl.when((bi == 0) & (qi == 0))
    def _init():
        lo_ref[...] = jnp.full_like(lo_ref, _POS)
        hi_ref[...] = jnp.full_like(hi_ref, _NEG)

    q = q_ref[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (bn, 1), 0) + qi * bn
    row_ok = row < n

    def tile(t, carry):
        lo, hi = carry
        e = _dot_f32(q, k_ref[0, pl.ds(t * mt, mt), :])
        ok = row_ok & _col_mask(t, mt, m)
        lo = jnp.minimum(
            lo, jnp.min(jnp.where(ok, e, _POS), axis=1, keepdims=True))
        hi = jnp.maximum(
            hi, jnp.max(jnp.where(ok, e, _NEG), axis=1, keepdims=True))
        return lo, hi

    lo, hi = jax.lax.fori_loop(
        0, k_ref.shape[1] // mt, tile,
        (jnp.full((bn, 1), _POS, jnp.float32),
         jnp.full((bn, 1), _NEG, jnp.float32)))
    # lane-only broadcasts of the (bn, 1) carries; the sublane (row)
    # reduction to a scalar happens on the host side
    lo_ref[...] = jnp.minimum(
        lo_ref[...], jnp.broadcast_to(lo, lo_ref.shape))
    hi_ref[...] = jnp.maximum(
        hi_ref[...], jnp.broadcast_to(hi, hi_ref.shape))


def _nl_apply_kernel(lo_ref, inv_ref, q_ref, k_ref, out_ref, *, bn, mt, m):
    # scale operands arrive as (bn, 128) VMEM splat tiles; slicing one
    # lane gives a (bn, 1) column directly, so the energy expression
    # below only LANE-broadcasts. No (1, 1) vector is ever formed — a
    # (1,1)-sourced broadcast (even split per-axis) re-fuses in the
    # canonicalizer into the both-axes form Mosaic rejects (queue2).
    lo = lo_ref[:, 0:1]
    inv = inv_ref[:, 0:1]
    q = q_ref[0]

    def tile(t, carry):
        acc, l = carry
        kt = k_ref[0, pl.ds(t * mt, mt), :]
        e = _dot_f32(q, kt)
        p = jnp.exp((e - lo) * inv)
        p = jnp.where(_col_mask(t, mt, m), p, 0.0)
        l = l + jnp.sum(p, axis=1, keepdims=True)
        acc = acc + jax.lax.dot_general(
            p.astype(k_ref.dtype), kt, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc, l

    acc = jnp.zeros((bn, q.shape[1]), jnp.float32)
    l = jnp.zeros((bn, 1), jnp.float32)
    acc, l = jax.lax.fori_loop(0, k_ref.shape[1] // mt, tile, (acc, l))
    out_ref[0] = (acc / l).astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("bn", "mt", "interpret"))
def nl_spatial_flash(q, k, bn=512, mt=2048, interpret=False):
    """Streaming non-local spatial attention, energy tiles VMEM-resident.

    q: (B, N, C) queries (flattened pixels), k: (B, M, C) pooled values.
    Returns (B, N, C) in q.dtype — the attention output WITHOUT the +q
    residual (added by the caller, same as `_nl_spatial_blocked`).
    """
    b, n, c = q.shape
    m = k.shape[1]
    cp = -c % 128
    np_ = -n % bn
    mp = -m % mt
    if cp:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, cp)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, cp)))
    if np_:
        q = jnp.pad(q, ((0, 0), (0, np_), (0, 0)))
    if mp:
        k = jnp.pad(k, ((0, 0), (0, mp), (0, 0)))
    cpad = c + cp
    nblk = q.shape[1] // bn

    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    k_spec = pl.BlockSpec((1, k.shape[1], cpad), lambda bi, qi: (bi, 0, 0),
                          memory_space=pltpu.VMEM)
    q_spec = pl.BlockSpec((1, bn, cpad), lambda bi, qi: (bi, qi, 0),
                          memory_space=pltpu.VMEM)

    lo, hi = pl.pallas_call(
        functools.partial(_nl_minmax_kernel, bn=bn, mt=mt, n=n, m=m),
        out_shape=(jax.ShapeDtypeStruct((bn, 128), jnp.float32),
                   jax.ShapeDtypeStruct((bn, 128), jnp.float32)),
        grid=(b, nblk),
        in_specs=[q_spec, k_spec],
        out_specs=(pl.BlockSpec((bn, 128), lambda bi, qi: (0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((bn, 128), lambda bi, qi: (0, 0),
                                memory_space=pltpu.VMEM)),
        compiler_params=params,
        interpret=interpret,
    )(q, k)
    # scalar reduction outside the kernel (tiny XLA op); the scale
    # operands return as (bn, 128) splat tiles the apply kernel can
    # column-slice without forming a (1, 1) vector
    lo_s = jnp.min(lo)
    inv_s = 1.0 / (jnp.max(hi) - lo_s)
    lo_t = jnp.broadcast_to(lo_s, (bn, 128))
    inv_t = jnp.broadcast_to(inv_s, (bn, 128))

    scale_spec = pl.BlockSpec((bn, 128), lambda bi, qi: (0, 0),
                              memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_nl_apply_kernel, bn=bn, mt=mt, m=m),
        out_shape=jax.ShapeDtypeStruct((b, nblk * bn, cpad), q.dtype),
        grid=(b, nblk),
        in_specs=[scale_spec, scale_spec, q_spec, k_spec],
        out_specs=pl.BlockSpec((1, bn, cpad), lambda bi, qi: (bi, qi, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=params,
        interpret=interpret,
    )(lo_t, inv_t, q, k)
    return out[:, :n, :c]
