"""Probe: upgraded fused two-conv strip kernel vs two single chain convs.

The round-2 `conv_tlane_chain_pair` lost end-to-end (78.3 vs 80.5 pairs/s)
with acc-RMW epilogues and a full-tile where-shift bottom mirror. The
round-3 breakdown probe showed dec2 (16->1 k5) is ~15 ms of pure
input-DMA overhead at b16 — exactly what pairing removes. This probe
measures an upgraded pair kernel:

  - ssai interior-slice epilogues for both convs (no acc buffer),
  - static pl.when bottom-boundary mid mirrors (no full-tile selects),
  - rows 16 and 32 (overlap recompute is 2*pb/rows).

against the sum of the two production single convs, for the DeepFuse
tails: (dec1 32->16 k5) + (dec2 16->1 k5), and (enc0 1->16 k5) +
(enc1 16->32 k7).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_pair.py
env: B (16), H (1224), W (1024), ITERS (10)
"""

import functools
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from multi_modal_image_fusion_tpu.ops.pallas.conv_kernel import (
        CHAIN_GUARD, CHAIN_WG, chain_shape, conv_tlane_chain)

    B = int(os.environ.get("B", "16"))
    H = int(os.environ.get("H", "1224"))
    W = int(os.environ.get("W", "1024"))
    iters = int(os.environ.get("ITERS", "10"))
    hg, wp = chain_shape(H, W)

    def make_pair(ka, kb, c_in, c_mid, c_out, rows):
        pa, pb = ka // 2, kb // 2
        kw_a = [pa] + [kw for kw in range(ka) if kw != pa]
        kw_b = [pb] + [kw for kw in range(kb) if kw != pb]
        wv, hv = W, H

        def kernel(x_ref, wa_ref, wb_ref, out_ref, t_ref, a_ref, mid_ref,
                   amid_ref, stage_ref, in_sems, out_sems, *, hsub, tdma):
            b = pl.program_id(0)
            g = pl.program_id(1)
            h0 = g * rows * hsub
            mrows = rows + 2 * pb

            def in_dma(slot, j):
                start = CHAIN_GUARD - 8 + h0 + j * rows
                return pltpu.make_async_copy(
                    x_ref.at[b, :, pl.ds(start, tdma), :],
                    t_ref.at[slot], in_sems.at[slot])

            def out_dma(slot, j):
                return pltpu.make_async_copy(
                    stage_ref.at[slot],
                    out_ref.at[b, :,
                               pl.ds(CHAIN_GUARD + h0 + j * rows, rows), :],
                    out_sems.at[slot])

            in_dma(0, 0).start()

            # bottom-boundary strips: mid row (pb + r) is output row
            # h0+j*rows+r; mid rows at valid-coordinate >= hv need the
            # mirror m[hv + i] = m[hv - 2 - i]; static per-strip rows
            n_strips = -(-(-(-H // 8) * 8) // rows)
            bot = []
            for s in range(n_strips):
                out0 = s * rows
                # mid rows cover out rows [out0 - pb, out0 + rows + pb)
                if out0 + rows + pb > hv and out0 - pb < hv + pb:
                    rows_to_fix = [(hv + i) - (out0 - pb) for i in
                                   range(pb)
                                   if 0 <= (hv + i) - (out0 - pb) < mrows]
                    if rows_to_fix:
                        bot.append((s, tuple(rows_to_fix)))

            def strip(j, carry):
                slot = jax.lax.rem(j, 2)

                @pl.when(j + 1 < hsub)
                def _():
                    in_dma(1 - slot, j + 1).start()
                in_dma(slot, j).wait()

                # conv_a over mrows, ssai epilogue into mid_ref interior
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
                mid_ref[:, :, pa:wp - pa] = \
                    jnp.maximum(y, 0.0).astype(x_ref.dtype)

                # mid reflect halos: lanes every strip; rows at boundaries
                for jj in range(pb):
                    mid_ref[:, :, CHAIN_WG - 1 - jj:CHAIN_WG - jj] = \
                        mid_ref[:, :, CHAIN_WG + 1 + jj:CHAIN_WG + 2 + jj]
                    mid_ref[:, :,
                            CHAIN_WG + wv + jj:CHAIN_WG + wv + jj + 1] = \
                        mid_ref[:, :,
                                CHAIN_WG + wv - 2 - jj:CHAIN_WG + wv - 1 - jj]

                sgj = g * hsub + j

                @pl.when(sgj == 0)
                def _():
                    for ii in range(pb):
                        mid_ref[:, pb - 1 - ii:pb - ii, :] = \
                            mid_ref[:, pb + 1 + ii:pb + 2 + ii, :]
                for s, rws in bot:
                    @pl.when(sgj == s)
                    def _(rws=rws):
                        for i, mr in enumerate(rws):
                            src = mr - 2 * (i + 1)
                            mid_ref[:, mr:mr + 1, :] = \
                                mid_ref[:, src:src + 1, :]

                # conv_b on the mid tile, ssai epilogue into stage interior
                for kh in range(kb):
                    amid_ref[kh * c_mid:(kh + 1) * c_mid, :, :] = \
                        mid_ref[:, pl.ds(kh, rows), :]
                p2 = jax.lax.dot_general(
                    wb_ref[:, :], amid_ref[:, :, :],
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                wib = wp - 2 * pb
                y2 = None
                for jj, kw in enumerate(kw_b):
                    term = p2[jj * c_out:(jj + 1) * c_out, :, kw:kw + wib]
                    y2 = term if y2 is None else y2 + term

                @pl.when(j >= 2)
                def _():
                    out_dma(slot, j - 2).wait()
                stage_ref[slot, :, :, pb:wp - pb] = \
                    jnp.maximum(y2, 0.0).astype(out_ref.dtype)
                out_dma(slot, j).start()
                return carry

            jax.lax.fori_loop(0, hsub, strip, 0)
            for tail in (hsub - 2, hsub - 1):
                if tail >= 0:
                    out_dma(tail % 2, tail).wait()

        def wmat(w, k, c_i, c_o, order, dtype):
            m = jnp.transpose(w, (0, 2, 1, 3)).reshape(k * c_i, k, c_o)
            return jnp.concatenate([m[:, kw] for kw in order],
                                   axis=-1).astype(dtype)

        @jax.jit
        def conv(xt, wa, wb):
            b = xt.shape[0]
            h8 = -(-H // 8) * 8
            hsub = -(-h8 // rows)
            tdma = -(-(8 + rows + pa + pb) // 8) * 8
            mrows = rows + 2 * pb
            return pl.pallas_call(
                functools.partial(kernel, hsub=hsub, tdma=tdma),
                out_shape=jax.ShapeDtypeStruct((b, c_out, hg, wp), xt.dtype),
                grid=(b, 1),
                in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                          pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
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
            )(xt, wmat(wa, ka, c_in, c_mid, kw_a, xt.dtype),
              wmat(wb, kb, c_mid, c_out, kw_b, xt.dtype))

        return conv

    r = np.random.RandomState(0)
    cases = [("dec1+dec2", 5, 5, 32, 16, 1, B),
             ("enc0+enc1", 5, 7, 1, 16, 32, 2 * B)]
    for name, ka, kb, cin, cmid, cout, b in cases:
        x = jnp.asarray(r.rand(b, cin, hg, wp) - 0.5, jnp.bfloat16)
        wa = jnp.asarray(r.rand(ka, ka, cin, cmid) - 0.5, jnp.bfloat16)
        wb = jnp.asarray(r.rand(kb, kb, cmid, cout) - 0.5, jnp.bfloat16)

        # baseline: two production single convs
        def two(x, wa=wa, wb=wb, ka=ka, kb=kb):
            t = conv_tlane_chain(x, wa, ka, h=H, w_valid=W, act="relu",
                                 halo=True, epilogue="ssa")
            return conv_tlane_chain(t, wb, kb, h=H, w_valid=W, act="relu",
                                    halo=True, epilogue="ssa")

        variants = [("singles", two, None)]
        for rows in (16, 32):
            fn = make_pair(ka, kb, cin, cmid, cout, rows)
            variants.append((f"pair r{rows}",
                             lambda x, fn=fn, wa=wa, wb=wb: fn(x, wa, wb),
                             rows))

        for vname, fn, _ in variants:
            @functools.partial(jax.jit, static_argnames="n")
            def loop(x, n, fn=fn):
                def body(i, carry):
                    x, s = carry
                    m = fn(x).astype(jnp.float32).mean()
                    bump = jnp.where(m > 1e30, 1, 0).astype(x.dtype)
                    return x + bump, s + m
                return jax.lax.fori_loop(0, n, body, (x, jnp.float32(0.0)))

            try:
                t0 = time.perf_counter()
                out = loop(x, iters)
                float(out[1])
                cs = time.perf_counter() - t0
                x2 = x + jnp.asarray(1e-3, x.dtype)
                t0 = time.perf_counter()
                out = loop(x2, iters)
                float(out[1])
                dt = (time.perf_counter() - t0) / iters
                print(f"{name:10s} {vname:9s} {dt*1e3:8.2f} ms "
                      f"(compile {cs:.0f}s)", flush=True)
            except Exception as e:
                print(f"{name:10s} {vname:9s} FAILED: "
                      f"{str(e).splitlines()[0][:140]}", flush=True)


if __name__ == "__main__":
    main()
