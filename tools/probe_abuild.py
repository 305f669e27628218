"""Probe: build the conv kernel's A stack with VMEM->VMEM async copies
(DMA engines) instead of VPU sublane-shift copies.

The chain conv's strip loop spends ~4K vector ops per strip (k7/c32/rows16)
copying t_ref -> a_ref with per-kh sublane offsets (the offsets are NOT
8-aligned, so HBM DMA can't source them — but VMEM->VMEM copies may).
Two variants:
  serial  — start k copies after the input wait, wait all, then dot
  pipe    — double-buffered a_ref: strip j's A-build runs on the DMA
            engines while strip j-1's dot+epilogue runs on MXU/VPU

Standalone kernel copy (does not touch the production conv_kernel module);
if legal + faster, the design merges into conv_tlane_chain.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_abuild.py
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
        CHAIN_GUARD, chain_shape, conv_tlane_chain)

    B = int(os.environ.get("B", "16"))
    H = int(os.environ.get("H", "1224"))
    W = int(os.environ.get("W", "1024"))
    iters = int(os.environ.get("ITERS", "10"))
    hg, wp = chain_shape(H, W)

    def make_conv(k, c_in, c_out, rows, abuild, epilogue):
        p_half = k // 2
        kw_order = [p_half] + [kw for kw in range(k) if kw != p_half]

        def kernel(x_ref, w_ref, out_ref, t_ref, a_ref, stage_ref,
                   in_sems, a_sems, out_sems, *, hsub, tdma):
            b = pl.program_id(0)
            g = pl.program_id(1)
            h0 = g * rows * hsub
            two_a = a_ref.shape[0] == 2

            def in_dma(slot, j):
                start = CHAIN_GUARD - 8 + h0 + j * rows
                return pltpu.make_async_copy(
                    x_ref.at[b, :, pl.ds(start, tdma), :],
                    t_ref.at[slot], in_sems.at[slot])

            def a_dma(aslot, tslot, kh):
                return pltpu.make_async_copy(
                    t_ref.at[tslot, :, pl.ds(8 - p_half + kh, rows), :],
                    a_ref.at[aslot, pl.ds(kh * c_in, c_in)],
                    a_sems.at[aslot, kh])

            def out_dma(slot, j):
                return pltpu.make_async_copy(
                    stage_ref.at[slot],
                    out_ref.at[b, :,
                               pl.ds(CHAIN_GUARD + h0 + j * rows, rows), :],
                    out_sems.at[slot])

            in_dma(0, 0).start()
            if abuild == "pipe":
                # strip 0's A-build must wait for its input
                in_dma(0, 0).wait()
                for kh in range(k):
                    a_dma(0, 0, kh).start()
                in_dma(1, 1).start()

            def strip(j, carry):
                slot = jax.lax.rem(j, 2)
                aslot = slot if two_a else 0

                if abuild == "serial":
                    @pl.when(j + 1 < hsub)
                    def _():
                        in_dma(1 - slot, j + 1).start()
                    in_dma(slot, j).wait()
                    for kh in range(k):
                        a_dma(0, slot, kh).start()
                    for kh in range(k):
                        a_dma(0, slot, kh).wait()
                elif abuild == "pipe":
                    # A[j] was started by strip j-1 (or the prologue);
                    # in[j+1] already started. Kick off A[j+1] as soon as
                    # its input is in, then let it run during our dot.
                    for kh in range(k):
                        a_dma(aslot, slot, kh).wait()

                    @pl.when(j + 1 < hsub)
                    def _():
                        in_dma(1 - slot, j + 1).wait()
                        for kh in range(k):
                            a_dma(1 - aslot if two_a else 0,
                                  1 - slot, kh).start()

                    @pl.when(j + 2 < hsub)
                    def _():
                        in_dma(slot, j + 2).start()
                else:   # vpu
                    @pl.when(j + 1 < hsub)
                    def _():
                        in_dma(1 - slot, j + 1).start()
                    in_dma(slot, j).wait()
                    for kh in range(k):
                        a_ref[0, kh * c_in:(kh + 1) * c_in, :, :] = \
                            t_ref[slot, :, pl.ds(8 - p_half + kh, rows), :]

                a = a_ref[aslot if abuild == "pipe" else 0]
                p = jax.lax.dot_general(
                    w_ref[:, :], a, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                y = p[:c_out, :, :]
                for jj in range(1, k):
                    sh = kw_order[jj] - p_half
                    y = y + jnp.roll(p[jj * c_out:(jj + 1) * c_out, :, :],
                                     -sh, axis=2)

                @pl.when(j >= 2)
                def _():
                    out_dma(slot, j - 2).wait()
                stage_ref[slot] = jnp.maximum(y, 0.0).astype(out_ref.dtype)
                out_dma(slot, j).start()
                return carry

            jax.lax.fori_loop(0, hsub, strip, 0)
            for tail in (hsub - 2, hsub - 1):
                if tail >= 0:
                    out_dma(tail % 2, tail).wait()

        @jax.jit
        def conv(xt, w):
            b = xt.shape[0]
            h8 = -(-H // 8) * 8
            hsub = -(-h8 // rows)
            tdma = -(-(8 + rows + p_half) // 8) * 8
            wm = jnp.transpose(w, (0, 2, 1, 3)).reshape(k * c_in, k, c_out)
            wm = jnp.concatenate([wm[:, kw] for kw in kw_order],
                                 axis=-1).astype(xt.dtype)
            n_a = 2 if abuild == "pipe" else 1
            return pl.pallas_call(
                functools.partial(kernel, hsub=hsub, tdma=tdma),
                out_shape=jax.ShapeDtypeStruct((b, c_out, hg, wp), xt.dtype),
                grid=(b, 1),
                in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
                scratch_shapes=[
                    pltpu.VMEM((2, c_in, tdma, wp), xt.dtype),
                    pltpu.VMEM((n_a, k * c_in, rows, wp), xt.dtype),
                    pltpu.VMEM((2, c_out, rows, wp), xt.dtype),
                    pltpu.SemaphoreType.DMA((2,)),
                    pltpu.SemaphoreType.DMA((n_a, k)),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(xt, wm)

        return conv

    r = np.random.RandomState(0)
    shapes = [("enc1 16->32 k7", 16, 32, 7, 2 * B),
              ("dec0 32->32 k7", 32, 32, 7, B)]
    for name, cin, cout, k, b in shapes:
        x = jnp.asarray(r.rand(b, cin, hg, wp) - 0.5, jnp.bfloat16)
        w = jnp.asarray(r.rand(k, k, cin, cout) - 0.5, jnp.bfloat16)
        base = None
        for abuild in ("vpu", "serial", "pipe"):
            for rows in (16, 32):
                fn = make_conv(k, cin, cout, rows, abuild, "ssa")

                @functools.partial(jax.jit, static_argnames="n")
                def loop(x, w, n, fn=fn):
                    def body(i, carry):
                        x, s = carry
                        m = fn(x, w).astype(jnp.float32).mean()
                        bump = jnp.where(m > 1e30, 1, 0).astype(x.dtype)
                        return x + bump, s + m
                    return jax.lax.fori_loop(0, n, body,
                                             (x, jnp.float32(0.0)))

                try:
                    t0 = time.perf_counter()
                    out = loop(x, w, iters)
                    float(out[1])
                    cs = time.perf_counter() - t0
                    x2 = x + jnp.asarray(1e-3, x.dtype)
                    t0 = time.perf_counter()
                    out = loop(x2, w, iters)
                    m = float(out[1])
                    dt = (time.perf_counter() - t0) / iters
                    flops = 2.0 * b * H * W * k * k * cin * cout
                    print(f"{name:16s} {abuild:6s} rows={rows:3d} "
                          f"{dt*1e3:8.2f} ms {flops/dt/1e12:6.2f} TF "
                          f"sum={m:.4f} (compile {cs:.0f}s)", flush=True)
                except Exception as e:
                    print(f"{name:16s} {abuild:6s} rows={rows:3d} FAILED: "
                          f"{str(e).splitlines()[0][:140]}", flush=True)


if __name__ == "__main__":
    main()
