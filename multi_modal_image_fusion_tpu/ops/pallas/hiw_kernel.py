"""Halo-in-weights chain conv: the round-4 conv formulation.

The production chain kernel (conv_kernel.py) is VPU-bound: its kh A-build
(k staged strip copies per strip) plus kw roll-sums sit on the critical
path around a dot that is ~10% of it; measured ceiling ~125 pairs/s vs a
~420 pairs/s bf16 FLOP roofline (docs/PERFORMANCE.md, round 3;
tools/probe_breakdown.py). This module deletes the A-build entirely:

- **Layout**: H-major row-channel interleaved. A chain tensor is
  (B, HG * C, Wp) where image row r, channel c lives at tensor row
  (GUARD + r) * C + c (valid lanes at [WG, WG + w)). Strip DMAs slice
  whole row-groups — offsets are multiples of C, which keeps every
  HBM-side sublane slice 8-aligned for C % 8 == 0 — and the dot's RHS
  for an output row group is a CONTIGUOUS sublane window of the strip:
  rows [i0*C, (i0 + g + k - 1)*C). Zero staging copies.
- **Weights**: block-banded LHS
  W_band[(i + kh)*C_in + ci, (kw, i, co)] = w[kh, kw, ci, co], shape
  ((g + k - 1) * C_in, k * g * C_out). The MXU eats the band zeros:
  FLOP inflation is (g + k - 1)/k (1.43x at k7 g4) — cheap against the
  ~10x idle MXU headroom of the staged formulation. kh rides the
  contraction; kw cannot (lane shifts), so it stays in the SSA roll-sum
  epilogue, whose dot output layout (kw, i, co) reshapes freely into the
  H-major output stage.
- Same production features as conv_tlane_chain: double-buffered strip
  DMA pipeline, in-kernel reflect halo mirrors (row mirrors at the two
  H-boundary strips, lane mirrors every strip), fuse_n siamese-sum
  prologue, bias + act + cast staging epilogue.

The hot op this replaces is every model's ConvLayer (reference
core/block.py:26-118). Probe/decision data: tools/probe_hiw.py.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .conv_kernel import (CHAIN_GUARD, CHAIN_WG, _apply_act, _chain_dma_ok,
                          _chain_enter_gray, _chain_exit_gray, chain_shape,
                          _grayscale_fast_ok)

__all__ = ["hiw_enter", "hiw_exit", "conv_hiw_chain",
           "conv_hiw_chain_multi", "hiw_pick_g", "hiw_enabled",
           "hiw_identity_weights"]

# Default for the H-major halo-in-weights chain (flipped by the measured
# TPU decision data, tools/r4_tpu_queue*.sh + tools/r3_autoflip.py style).
HIW_DEFAULT = True


def hiw_enabled():
    """MMIF_CHAIN_HIW: '1'/'0' force; unset/'auto' -> HIW_DEFAULT."""
    import os
    v = os.environ.get("MMIF_CHAIN_HIW", "auto")
    if v in ("0", "1"):
        return v == "1"
    return HIW_DEFAULT


# Default for the multi-leg H-major zoo paths (DenseFuse/VIFNet/PFNetv1/
# IFCNN/DIFNet/PMGI). Flipped per measured TPU parity + timing
# (tools/probe_hiw_zoo.py + tools/r4_autoflip_multi.py), r4_autoflip style.
HIW_MULTI_DEFAULT = True
# Models the TPU sweep measured SLOWER on the multi-leg path (autoflip
# writes losers here; MMIF_CHAIN_HIW_MULTI=1 still force-enables them).
# NOTE: the autoflip rewrites the tuple below with a regex that stops at
# the first ')' — keep it on one line with no parentheses in between.
# nestfuse/rfnnest start blocklisted: C-major default until queue 5
# measures + gates their new hiw paths.
HIW_MULTI_BLOCKLIST = ("dbnet", "mafusion", "myfusion", "unfusion", )


def hiw_multi_enabled(model=None):
    """MMIF_CHAIN_HIW_MULTI: '1'/'0' force; unset/'auto' ->
    HIW_MULTI_DEFAULT minus the measured blocklist."""
    import os
    v = os.environ.get("MMIF_CHAIN_HIW_MULTI", "auto")
    if v in ("0", "1"):
        return v == "1"
    if model is not None and model in HIW_MULTI_BLOCKLIST:
        return False
    return HIW_MULTI_DEFAULT


def hiw_enter(x):
    """NHWC grayscale (B, H, W, 1) -> H-major chain tensor (B, HG, Wp).

    For C == 1 the H-major layout is byte-identical to the C-major guard
    layout, so this reuses chain_enter's strip-copy kernel / XLA path."""
    b, h, w, c = x.shape
    assert c == 1, "chain tensors enter grayscale"
    hg, wp = chain_shape(h, w)
    if _grayscale_fast_ok(h, w) and _chain_dma_ok():
        import os
        xt = _chain_enter_gray(
            x, interpret=bool(os.environ.get("MMIF_CHAIN_INTERPRET")))
        return xt.reshape(b, hg, wp)
    out = jnp.zeros((b, hg, wp), x.dtype)
    return jax.lax.dynamic_update_slice(
        out, x[..., 0], (0, CHAIN_GUARD, CHAIN_WG))


def hiw_exit(xt, h, w):
    """H-major chain tensor (B, HG * 1, Wp) -> NHWC (B, H, W, 1)."""
    b, hgc, wp = xt.shape
    if _grayscale_fast_ok(h, w) and _chain_dma_ok():
        import os
        return _chain_exit_gray(
            xt.reshape(b, 1, hgc, wp), h, w,
            interpret=bool(os.environ.get("MMIF_CHAIN_INTERPRET")))
    return xt[:, CHAIN_GUARD:CHAIN_GUARD + h,
              CHAIN_WG:CHAIN_WG + w][..., None]


# TPU-measured g per conv shape (tools/probe_hiw_g.py sweep; flipped by
# tools/r4_autoflip_g.py). probe_hiw round-4 data already showed the
# heuristic's g=4 losing to g=2 at the fattest DeepFuse layer
# (dec0 32->32 k7: 74.5 vs 66.3 TF) — band FLOP inflation (g+k-1)/k
# dominates the group-launch amortization once c_out is wide enough.
HIW_G_TABLE = {
    (1, 16, 5): 16,
    (16, 1, 5): 16,
    (16, 32, 7): 2,
    (32, 32, 7): 4,
    (64, 32, 3): 2,
}


def _hiw_g_ok(g, c_in, c_out, rows):
    return (rows % g == 0 and (g * c_in) % 8 == 0
            and (g * c_out) % 8 == 0)


def hiw_pick_g(c_in, c_out, k, rows=16):
    """Output-row group size: g rows of C_out channels per dot. Bigger g
    amortizes the per-group dot launch but inflates band FLOPs by
    (g+k-1)/k and the dot N dim by g. Constraints: rows % g == 0 and the
    group sublane offsets (g*C_in, g*C_out) land on 8-aligned rows.
    MMIF_HIW_G forces one g globally (probe sweeps); measured shapes come
    from HIW_G_TABLE; the heuristic covers the rest."""
    import os
    force = os.environ.get("MMIF_HIW_G")
    if force and _hiw_g_ok(int(force), c_in, c_out, rows):
        return int(force)
    g = HIW_G_TABLE.get((c_in, c_out, k))
    if g is not None and _hiw_g_ok(g, c_in, c_out, rows):
        return g
    for g in (4, 8, 16):
        if _hiw_g_ok(g, c_in, c_out, rows):
            if g * max(c_out, c_in) >= 64:
                return g
    return rows


def _hiw_band_weights(w, k, c_in, c_out, g, dtype):
    """HWIO (k, k, c_in, c_out) -> block-banded LHS
    ((g+k-1)*c_in, k*g*c_out), columns grouped (kw_order, i, co).

    DEPTHWISE weights (k, k, C): the per-channel taps embed as DIAGONAL
    c blocks — the MXU eats the off-diagonal zeros at full rate, so a dw
    conv costs the same as a dense C->C conv through this kernel. At the
    zoo's 16-128 dw widths that dense-equivalent cost is tiny, and the
    strip pipeline beats XLA's grouped-conv lowering (which densifies
    anyway, docs/PERFORMANCE.md round-4 myfusion notes)."""
    p_half = k // 2
    kw_order = [p_half] + [kw for kw in range(k) if kw != p_half]
    gk = g + k - 1
    wb = jnp.zeros((gk * c_in, k * g * c_out), dtype)
    if w.ndim == 3:
        assert c_in == c_out == w.shape[-1]
        eye = jnp.eye(c_in, dtype=jnp.float32)
        # [kw, kh, ci, co] = w[kh, kw, ci] * delta(ci, co)
        col = (jnp.transpose(w, (1, 0, 2)).astype(jnp.float32)[..., None]
               * eye[None, None]).reshape(k, k * c_in, c_out)
    else:
        # col[kw] is (k*c_in, c_out), rows ordered (kh, ci)
        col = jnp.transpose(w, (1, 0, 2, 3)).reshape(k, k * c_in, c_out)
    for kw_i, kw in enumerate(kw_order):
        for i in range(g):
            wb = jax.lax.dynamic_update_slice(
                wb, col[kw].astype(dtype),
                (i * c_in, (kw_i * g + i) * c_out))
    return wb


def _conv_kernel_hiw(*refs, k, rows, hsub, wp, c_in, c_out, g, out_dtype,
                     has_bias, act, p_half, halo_hw, bot_strips, fuse_n,
                     ext):
    """Strip loop. The strip buffer t_ref is (tdma_s, wp) 2D: row-channel
    flattened input rows [strip_start - p_half, strip_start + rows +
    p_half) x c_in (+ `ext` lead sublanes when c_in is not 8-aligned —
    only the 1-channel entry layer). Each output group's dot RHS is the
    contiguous sublane window [ext + i0*c_in, + (g+k-1)*c_in)."""
    if has_bias:
        (x_ref, w_ref, b_ref, out_ref, t_ref, stage_ref, in_sems,
         out_sems) = refs
    else:
        (x_ref, w_ref, out_ref, t_ref, stage_ref, in_sems, out_sems) = refs
        b_ref = None
    b = pl.program_id(0)
    gh = pl.program_id(1)
    h0 = gh * rows * hsub
    gk = g + k - 1
    tdma_s = t_ref.shape[1]
    n_slots = 4 if fuse_n else 2

    def in_dma(slot, j, b_off=0):
        # 8-divisible by construction (`ext` absorbs the static residue;
        # rows % 8 == 0 makes the dynamic part a multiple of 8 for ANY
        # c_in) — Mosaic's divisibility analysis cannot prove it through
        # the multiply-subtract, so assert it (the c_in==1 entry layer
        # hit "tile index in dimension 1 is divisible by 8" without this)
        start = pl.multiple_of(
            (CHAIN_GUARD - p_half + h0 + j * rows) * c_in - ext, 8)
        return pltpu.make_async_copy(
            x_ref.at[b + b_off, pl.ds(start, tdma_s), :],
            t_ref.at[slot], in_sems.at[slot])

    def out_dma(slot, j):
        # CHAIN_GUARD % 8 == 0 and (h0 + j*rows) % 8 == 0 => 8-divisible
        start = pl.multiple_of((CHAIN_GUARD + h0 + j * rows) * c_out, 8)
        return pltpu.make_async_copy(
            stage_ref.at[slot],
            out_ref.at[b, pl.ds(start, rows * c_out), :],
            out_sems.at[slot])

    in_dma(0, 0).start()
    if fuse_n:
        in_dma(2, 0, fuse_n).start()

    kw_order = [p_half] + [kw for kw in range(k) if kw != p_half]

    def _mirror(slot, j):
        """Reflect halo on the staged strip. Row mirrors touch the two
        H-boundary strips only (static copies under pl.when on the global
        strip index); lane mirrors run every strip across the full
        buffer. Rows: valid row r is the c_in-sublane block at
        ext + (r - (h0 + j*rows - p_half)) * c_in."""
        wv = halo_hw[1]
        sgj = gh * hsub + j

        @pl.when(sgj == 0)
        def _():
            # window rows [-p_half, ...): t-row of valid row m is
            # ext + (p_half + m)*c_in; mirror row -m <- row +m
            for m in range(1, p_half + 1):
                dst = ext + (p_half - m) * c_in
                src = ext + (p_half + m) * c_in
                t_ref[slot, dst:dst + c_in, :] = \
                    t_ref[slot, src:src + c_in, :]
        tdma = rows + k - 1
        for s, th in bot_strips:
            @pl.when(sgj == s)
            def _(th=th):
                # th: t-row-block index of valid row h; mirror h-1+m+1 <-
                # h-1-(m+1) i.e. block th+m <- th-2-m. Rows past the DMA
                # window (th+m >= tdma) are never read by this strip's
                # output rows (all < h) — skip them (static bound)
                for m in range(p_half):
                    if th + m >= tdma:
                        continue
                    dst = ext + (th + m) * c_in
                    src = ext + (th - 2 - m) * c_in
                    t_ref[slot, dst:dst + c_in, :] = \
                        t_ref[slot, src:src + c_in, :]
                # rows past the mirrors feed ONLY >= h (garbage) output
                # rows — but they still ride the contraction under the
                # band ZEROS, and 0 * NaN/Inf = NaN poisons the last
                # valid group's dot when uninitialized HBM decodes to a
                # non-finite. Zero-fill them (one static vector store).
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
            t_ref[slot] = t_ref[slot] + t_ref[2 + slot]
        if halo_hw is not None:
            _mirror(slot, j)

        # out DMA 2-back must drain BEFORE stage_ref[slot] is rewritten
        @pl.when(j >= 2)
        def _():
            out_dma(slot, j - 2).wait()

        for i0 in range(0, rows, g):
            a = t_ref[slot, pl.ds(ext + i0 * c_in, gk * c_in), :]
            p = jax.lax.dot_general(
                w_ref[:, :], a, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            # p rows grouped (kw, i, co); kw slice jj is (g*c_out, wp) in
            # exactly the H-major output order
            y = p[:g * c_out, :]
            for jj in range(1, k):
                sh = kw_order[jj] - p_half
                y = y + jnp.roll(p[jj * g * c_out:(jj + 1) * g * c_out, :],
                                 -sh, axis=-1)
            if b_ref is not None:
                y = y + b_ref[:, :]
            stage_ref[slot, pl.ds(i0 * c_out, g * c_out)] = \
                _apply_act(y, act).astype(out_dtype)

        out_dma(slot, j).start()
        return carry

    jax.lax.fori_loop(0, hsub, strip, 0)
    for tail in (hsub - 2, hsub - 1):
        if tail >= 0:
            out_dma(tail % 2, tail).wait()


@functools.partial(jax.jit,
                   static_argnames=("k", "h", "w_valid", "c_in", "act", "g",
                                    "rows", "hsub", "fuse_n", "interpret"))
def conv_hiw_chain(xt, w, k, h, w_valid, c_in, bias=None, act=None, g=None,
                   rows=16, hsub=None, fuse_n=0, interpret=False):
    """H-major chain conv: xt (B, HG*C_in, Wp) with valid region (h,
    w_valid) at (CHAIN_GUARD, CHAIN_WG) -> (B, HG*C_out, Wp), same
    geometry. w is HWIO (k, k, C_in, C_out). Reflect halos are always
    mirrored in-kernel (the H-major layout has no XLA refresh helper).

    fuse_n > 0: xt carries 2*fuse_n batch entries; computes
    conv(xt[i] + xt[i + fuse_n]) for i < fuse_n ('sum' siamese fusion in
    the input DMA; 'mean': pre-scale w by 0.5)."""
    b, hgc, wp = xt.shape
    c_out = w.shape[-1]
    assert hgc % c_in == 0
    hg = hgc // c_in
    p_half = k // 2
    assert p_half <= CHAIN_WG and p_half <= CHAIN_GUARD
    assert rows % 8 == 0
    if g is None:
        g = hiw_pick_g(c_in, c_out, k, rows)
    assert rows % g == 0 and (g * c_in) % 8 == 0 and (g * c_out) % 8 == 0, \
        (rows, g, c_in, c_out)
    if fuse_n:
        assert b == 2 * fuse_n
    b_out = fuse_n if fuse_n else b
    h8 = -(-h // 8) * 8
    if hsub is None:
        hsub = -(-h8 // rows)
    strip = rows * hsub
    grid_h = -(-h8 // strip)
    # strip DMA window in flattened rows; `ext` lead sublanes 8-align the
    # HBM slice when c_in is not a multiple of 8 (the 1-channel entry)
    tdma = rows + k - 1
    if c_in % 8:
        start0 = (CHAIN_GUARD - p_half) * c_in
        ext = start0 - (start0 // 8) * 8
    else:
        ext = 0
    tdma_s = -(-(tdma * c_in + ext) // 8) * 8
    # the last strip reads p_half rows past its output rows; the bottom
    # guard band (CHAIN_MAX_ROWS + 8 rows) covers it, like the C-major
    # kernel's overrun
    assert CHAIN_GUARD + grid_h * strip + p_half <= hg, \
        (grid_h, strip, hg)

    # bottom-mirror strips: staged window [s*rows - p_half, +tdma) crosses
    # valid row h while still producing output rows < h; th is the
    # (static) t-row-block of valid row h inside that window
    bot_strips = tuple(
        (s, h - s * rows + p_half)
        for s in range(grid_h * hsub)
        if s * rows < h and s * rows - p_half + tdma > h)

    wb = _hiw_band_weights(w, k, c_in, c_out, g, xt.dtype)

    n_slots = 4 if fuse_n else 2
    kern = functools.partial(
        _conv_kernel_hiw, k=k, rows=rows, hsub=hsub, wp=wp, c_in=c_in,
        c_out=c_out, g=g, out_dtype=xt.dtype, has_bias=bias is not None,
        act=act, p_half=p_half, halo_hw=(h, w_valid),
        bot_strips=bot_strips, fuse_n=fuse_n, ext=ext)
    operands = [xt, wb]
    in_specs = [pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.VMEM)]
    if bias is not None:
        # bias tiled over the g rows of each group: (g*c_out, 1)
        bt = jnp.tile(jnp.asarray(bias, jnp.float32), g).reshape(
            g * c_out, 1)
        operands.append(bt)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    scratch = [pltpu.VMEM((n_slots, tdma_s, wp), xt.dtype),
               pltpu.VMEM((2, rows * c_out, wp), xt.dtype),
               pltpu.SemaphoreType.DMA((n_slots,)),
               pltpu.SemaphoreType.DMA((2,))]
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b_out, hg * c_out, wp), xt.dtype),
        grid=(b_out, grid_h),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*operands)


# ---------------------------------------------------------------------------
# Multi-leg H-major chain conv: concat-consuming convs without the concat
# ---------------------------------------------------------------------------
#
# The H-major layout interleaves channels per row, so a channel concat of
# two chain tensors is a strided shuffle — exactly the materialization the
# layout was built to avoid. But a conv is linear in input channels:
#   conv(concat(x_0..x_{n-1}), W) = sum_l conv(x_l, W[:, :, ofs_l:ofs_l+c_l])
# so a conv whose input is a concat runs as one kernel with n input "legs",
# each leg DMA-ing strips of its own (whole) tensor and contributing one
# banded dot to the shared accumulator. The dense-growth families
# (DenseFuse/VIFNet/PFNetv1, reference core/model.py:165-206, 69-111;
# DenseBlock core/block.py:137-151), PMGI's cross-path concats
# (model.py:555-624) and DIFNet's concat fusion (model.py:531-552) all
# become leg lists over never-concatenated 16-ch tensors. Two bonus
# identities ride the same mechanism:
#  - residual add:  act(conv(z) + x) = act(conv2legs([z, x], [W, I_k]))
#    with I_k the center-tap identity kernel (hiw_identity_weights) — the
#    ResBlock add costs band-dot FLOPs instead of an XLA elementwise pass
#    over three full-res tensors (DIFNet's 6 ResBlocks, model.py:531-552).
#  - duplicated-input concat: PMGI's concat((i1, i1, i2)) entry folds to
#    legs [i1, i2] with W[:, :, 0] + W[:, :, 1] on the first leg.


def hiw_identity_weights(k, c, dtype=jnp.float32):
    """HWIO (k, k, c, c) center-tap identity: conv(x, I) == x."""
    eye = jnp.eye(c, dtype=dtype)
    w = jnp.zeros((k, k, c, c), dtype)
    return w.at[k // 2, k // 2].set(eye)


def _conv_kernel_hiw_multi(*refs, k, rows, hsub, wp, c_ins, exts, b_offs,
                           c_out, g, out_dtype, has_bias, act, p_half,
                           halo_hw, bot_strips, fuse_n):
    """Strip loop over `nl` input legs. Per leg l, t_refs[l] is the
    (n_slots, tdma_s_l, wp) double-buffered strip window of xs[l] at batch
    b + b_offs[l] (+ the fuse_n sibling pre-added); the group dot
    accumulates one banded product per leg."""
    nl = len(c_ins)
    x_refs = refs[:nl]
    wb_refs = refs[nl:2 * nl]
    pos = 2 * nl
    b_ref = refs[pos] if has_bias else None
    pos += 1 if has_bias else 0
    out_ref = refs[pos]
    t_refs = refs[pos + 1:pos + 1 + nl]
    stage_ref = refs[pos + 1 + nl]
    in_sems = refs[pos + 2 + nl:pos + 2 + 2 * nl]
    out_sems = refs[pos + 2 + 2 * nl]

    b = pl.program_id(0)
    gh = pl.program_id(1)
    h0 = gh * rows * hsub
    gk = g + k - 1

    def in_dma(l, slot, j, b_extra=0):
        c_in, ext = c_ins[l], exts[l]
        start = pl.multiple_of(
            (CHAIN_GUARD - p_half + h0 + j * rows) * c_in - ext, 8)
        return pltpu.make_async_copy(
            x_refs[l].at[b + b_offs[l] + b_extra,
                         pl.ds(start, t_refs[l].shape[1]), :],
            t_refs[l].at[slot], in_sems[l].at[slot])

    def out_dma(slot, j):
        start = pl.multiple_of((CHAIN_GUARD + h0 + j * rows) * c_out, 8)
        return pltpu.make_async_copy(
            stage_ref.at[slot],
            out_ref.at[b, pl.ds(start, rows * c_out), :],
            out_sems.at[slot])

    for l in range(nl):
        in_dma(l, 0, 0).start()
        if fuse_n:
            in_dma(l, 2, 0, fuse_n).start()

    kw_order = [p_half] + [kw for kw in range(k) if kw != p_half]

    def _mirror(l, slot, j):
        """Reflect halo on leg l's staged strip (same geometry as the
        single-leg kernel: row mirrors at the two H-boundary strips, lane
        mirrors every strip)."""
        c_in, ext = c_ins[l], exts[l]
        t_ref = t_refs[l]
        wv = halo_hw[1]
        sgj = gh * hsub + j

        @pl.when(sgj == 0)
        def _():
            for m in range(1, p_half + 1):
                dst = ext + (p_half - m) * c_in
                src = ext + (p_half + m) * c_in
                t_ref[slot, dst:dst + c_in, :] = \
                    t_ref[slot, src:src + c_in, :]
        tdma = rows + k - 1
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
                # zero-fill past the mirrors: those rows feed only >= h
                # (garbage) outputs but still ride the contraction under
                # the band zeros, and 0 * NaN/Inf = NaN poisons the last
                # valid group when uninitialized HBM is non-finite
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
            for l in range(nl):
                in_dma(l, 1 - slot, j + 1).start()
                if fuse_n:
                    in_dma(l, 2 + (1 - slot), j + 1, fuse_n).start()

        for l in range(nl):
            in_dma(l, slot, j).wait()
            if fuse_n:
                in_dma(l, 2 + slot, j, fuse_n).wait()
                t_refs[l][slot] = t_refs[l][slot] + t_refs[l][2 + slot]
            if halo_hw is not None:
                # k == 1 has no halos to mirror, but _mirror's bot-strip
                # zero-fill must still run: a k1 group spanning past h
                # contracts zero-weighted uninitialized rows (0 * NaN)
                _mirror(l, slot, j)

        @pl.when(j >= 2)
        def _():
            out_dma(slot, j - 2).wait()

        for i0 in range(0, rows, g):
            p = None
            for l in range(nl):
                a = t_refs[l][slot,
                              pl.ds(exts[l] + i0 * c_ins[l],
                                    gk * c_ins[l]), :]
                pi = jax.lax.dot_general(
                    wb_refs[l][:, :], a, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                p = pi if p is None else p + pi
            y = p[:g * c_out, :]
            for jj in range(1, k):
                sh = kw_order[jj] - p_half
                y = y + jnp.roll(p[jj * g * c_out:(jj + 1) * g * c_out, :],
                                 -sh, axis=-1)
            if b_ref is not None:
                y = y + b_ref[:, :]
            stage_ref[slot, pl.ds(i0 * c_out, g * c_out)] = \
                _apply_act(y, act).astype(out_dtype)

        out_dma(slot, j).start()
        return carry

    jax.lax.fori_loop(0, hsub, strip, 0)
    for tail in (hsub - 2, hsub - 1):
        if tail >= 0:
            out_dma(tail % 2, tail).wait()


def hiw_multi_scratch_bytes(c_ins, c_out, k, h, w_valid, g=None, rows=16,
                            fuse_n=0, esz=2):
    """Nominal VMEM bytes of a conv_hiw_chain_multi call (t strips +
    stage + f32 dot temps + bands), for integration-side gating."""
    from .conv_kernel import chain_shape
    _, wp = chain_shape(h, w_valid)
    if g is None:
        g = hiw_pick_g(sum(c_ins), c_out, k, rows)
    gk = g + k - 1
    tdma = rows + k - 1
    n_slots = 4 if fuse_n else 2
    t = sum(n_slots * (-(-(tdma * c + 7 if c % 8 else tdma * c) // 8) * 8)
            * wp * esz for c in c_ins)
    stage = 2 * rows * c_out * wp * esz
    p = (k * g * c_out + 2 * g * c_out) * wp * 4
    wb = sum(gk * c * k * g * c_out * esz for c in c_ins)
    return t + stage + p + wb


@functools.partial(jax.jit,
                   static_argnames=("k", "h", "w_valid", "c_ins", "b_offs",
                                    "n_out", "act", "g", "rows", "hsub",
                                    "fuse_n", "interpret"))
def conv_hiw_chain_multi(xts, w, k, h, w_valid, c_ins, b_offs, n_out,
                         bias=None, act=None, g=None, rows=16, hsub=None,
                         fuse_n=0, interpret=False):
    """Concat-consuming H-major chain conv over input legs.

    xts: tuple of H-major chain tensors (B_l, HG * c_ins[l], Wp), same
    (HG, Wp) geometry; leg l reads batch entry `b + b_offs[l]`. w is HWIO
    (k, k, sum(c_ins), c_out) with input channels in leg-concat order.
    Output: (n_out, HG * c_out, Wp). fuse_n: every leg pre-adds its
    sibling at b_offs[l] + fuse_n (siamese 'sum' fusion in the DMA)."""
    nl = len(xts)
    assert nl == len(c_ins) == len(b_offs)
    hgc0, wp = xts[0].shape[1], xts[0].shape[2]
    hg = hgc0 // c_ins[0]
    for xt, c in zip(xts, c_ins):
        assert xt.shape[1] == hg * c and xt.shape[2] == wp, \
            (xt.shape, c, hg, wp)
    c_out = w.shape[-1]
    assert w.shape[2] == sum(c_ins)
    p_half = k // 2
    assert p_half <= CHAIN_WG and p_half <= CHAIN_GUARD
    assert rows % 8 == 0
    if g is None:
        g = hiw_pick_g(sum(c_ins), c_out, k, rows)
    assert rows % g == 0 and (g * c_out) % 8 == 0, (rows, g, c_out)
    h8 = -(-h // 8) * 8
    if hsub is None:
        hsub = -(-h8 // rows)
    strip = rows * hsub
    grid_h = -(-h8 // strip)
    tdma = rows + k - 1
    exts = []
    for c in c_ins:
        if c % 8:
            start0 = (CHAIN_GUARD - p_half) * c
            exts.append(start0 - (start0 // 8) * 8)
        else:
            exts.append(0)
    assert CHAIN_GUARD + grid_h * strip + p_half <= hg, (grid_h, strip, hg)

    bot_strips = tuple(
        (s, h - s * rows + p_half)
        for s in range(grid_h * hsub)
        if s * rows < h and s * rows - p_half + tdma > h)

    dtype = xts[0].dtype
    wbs, ofs = [], 0
    for c in c_ins:
        wbs.append(_hiw_band_weights(w[:, :, ofs:ofs + c], k, c, c_out, g,
                                     dtype))
        ofs += c

    n_slots = 4 if fuse_n else 2
    kern = functools.partial(
        _conv_kernel_hiw_multi, k=k, rows=rows, hsub=hsub, wp=wp,
        c_ins=tuple(c_ins), exts=tuple(exts), b_offs=tuple(b_offs),
        c_out=c_out, g=g, out_dtype=dtype, has_bias=bias is not None,
        act=act, p_half=p_half, halo_hw=(h, w_valid),
        bot_strips=bot_strips, fuse_n=fuse_n)
    operands = list(xts) + wbs
    in_specs = ([pl.BlockSpec(memory_space=pltpu.HBM)] * nl
                + [pl.BlockSpec(memory_space=pltpu.VMEM)] * nl)
    if bias is not None:
        bt = jnp.tile(jnp.asarray(bias, jnp.float32), g).reshape(
            g * c_out, 1)
        operands.append(bt)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    scratch = [pltpu.VMEM(
        (n_slots, -(-(tdma * c + e) // 8) * 8, wp), dtype)
        for c, e in zip(c_ins, exts)]
    scratch += [pltpu.VMEM((2, rows * c_out, wp), dtype)]
    scratch += [pltpu.SemaphoreType.DMA((n_slots,)) for _ in range(nl)]
    scratch += [pltpu.SemaphoreType.DMA((2,))]
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n_out, hg * c_out, wp), dtype),
        grid=(n_out, grid_h),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*operands)
