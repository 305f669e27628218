"""Strip-loop time breakdown for the chain conv kernel.

Measures variants of the kernel with pieces REMOVED (results are wrong for
the ablated variants — this is a timing probe, not a correctness path):

  full       — production ssa kernel (A-build + dot + roll-sum + stage)
  noabuild   — A built once per program, strips reuse it (removes the
               per-strip kh sublane-shift staging copies)
  noepilogue — stage the first c_out rows of p (removes the roll-sum)
  dotonly    — noabuild + noepilogue
  nodma      — full compute on one resident strip (removes in/out DMA waits)

The deltas attribute the strip critical path to staging / epilogue / DMA.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_breakdown.py
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
        CHAIN_GUARD, chain_shape)

    B = int(os.environ.get("B", "16"))
    H = int(os.environ.get("H", "1224"))
    W = int(os.environ.get("W", "1024"))
    iters = int(os.environ.get("ITERS", "10"))
    hg, wp = chain_shape(H, W)
    rows = 16

    def make_conv(k, c_in, c_out, variant):
        p_half = k // 2
        kw_order = [p_half] + [kw for kw in range(k) if kw != p_half]
        do_abuild = variant not in ("noabuild", "dotonly")
        do_epi = variant not in ("noepilogue", "dotonly")
        do_dma = variant != "nodma"

        def kernel(x_ref, w_ref, out_ref, t_ref, a_ref, stage_ref,
                   in_sems, out_sems, *, hsub, tdma):
            b = pl.program_id(0)
            g = pl.program_id(1)
            h0 = g * rows * hsub

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

            if do_dma:
                in_dma(0, 0).start()
            if not do_abuild:
                # one A per program: strips reuse stale data (timing only)
                if do_dma:
                    in_dma(0, 0).wait()
                    in_dma(0, 0).start()
                for kh in range(k):
                    a_ref[kh * c_in:(kh + 1) * c_in, :, :] = \
                        t_ref[0, :, pl.ds(8 - p_half + kh, rows), :]

            def strip(j, carry):
                slot = jax.lax.rem(j, 2)
                if do_dma:
                    @pl.when(j + 1 < hsub)
                    def _():
                        in_dma(1 - slot, j + 1).start()
                    in_dma(slot, j).wait()
                if do_abuild:
                    for kh in range(k):
                        a_ref[kh * c_in:(kh + 1) * c_in, :, :] = \
                            t_ref[slot if do_dma else 0, :,
                                  pl.ds(8 - p_half + kh, rows), :]
                a = a_ref[:, :, :]
                p = jax.lax.dot_general(
                    w_ref[:, :], a, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                if do_epi:
                    y = p[:c_out, :, :]
                    for jj in range(1, k):
                        sh = kw_order[jj] - p_half
                        y = y + jnp.roll(
                            p[jj * c_out:(jj + 1) * c_out, :, :], -sh,
                            axis=2)
                else:
                    y = p[:c_out, :, :]
                if do_dma:
                    @pl.when(j >= 2)
                    def _():
                        out_dma(slot, j - 2).wait()
                stage_ref[slot] = jnp.maximum(y, 0.0).astype(out_ref.dtype)
                if do_dma:
                    out_dma(slot, j).start()
                return carry + p[0, 0, 0]

            s = jax.lax.fori_loop(0, hsub, strip, jnp.float32(0.0))
            if do_dma:
                for tail in (hsub - 2, hsub - 1):
                    if tail >= 0:
                        out_dma(tail % 2, tail).wait()
            else:
                # keep the loop's compute live without per-strip DMA:
                # fold the scalar into the staged strip and write it once
                stage_ref[0, 0, 0, 0] = s.astype(out_ref.dtype)
                out_dma(0, 0).start()
                out_dma(0, 0).wait()

        @jax.jit
        def conv(xt, w):
            b = xt.shape[0]
            h8 = -(-H // 8) * 8
            hsub = -(-h8 // rows)
            tdma = -(-(8 + rows + p_half) // 8) * 8
            wm = jnp.transpose(w, (0, 2, 1, 3)).reshape(k * c_in, k, c_out)
            wm = jnp.concatenate([wm[:, kw] for kw in kw_order],
                                 axis=-1).astype(xt.dtype)
            return pl.pallas_call(
                functools.partial(kernel, hsub=hsub, tdma=tdma),
                out_shape=jax.ShapeDtypeStruct((b, c_out, hg, wp), xt.dtype),
                grid=(b, 1),
                in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
                scratch_shapes=[
                    pltpu.VMEM((2, c_in, tdma, wp), xt.dtype),
                    pltpu.VMEM((k * c_in, rows, wp), xt.dtype),
                    pltpu.VMEM((2, c_out, rows, wp), xt.dtype),
                    pltpu.SemaphoreType.DMA((2,)),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(xt, wm)

        return conv

    r = np.random.RandomState(0)
    shapes = [("dec0 32->32 k7", 32, 32, 7, B),
              ("enc1 16->32 k7", 16, 32, 7, 2 * B),
              ("dec1 32->16 k5", 32, 16, 5, B),
              ("dec2 16->1 k5", 16, 1, 5, B)]
    for name, cin, cout, k, b in shapes:
        x = jnp.asarray(r.rand(b, cin, hg, wp) - 0.5, jnp.bfloat16)
        w = jnp.asarray(r.rand(k, k, cin, cout) - 0.5, jnp.bfloat16)
        for variant in ("full", "noabuild", "noepilogue", "dotonly",
                        "nodma"):
            fn = make_conv(k, cin, cout, variant)

            @functools.partial(jax.jit, static_argnames="n")
            def loop(x, w, n, fn=fn):
                def body(i, carry):
                    x, s = carry
                    m = fn(x, w).astype(jnp.float32).mean()
                    bump = jnp.where(m > 1e30, 1, 0).astype(x.dtype)
                    return x + bump, s + m
                return jax.lax.fori_loop(0, n, body, (x, jnp.float32(0.0)))

            try:
                t0 = time.perf_counter()
                out = loop(x, w, iters)
                float(out[1])
                cs = time.perf_counter() - t0
                x2 = x + jnp.asarray(1e-3, x.dtype)
                t0 = time.perf_counter()
                out = loop(x2, w, iters)
                float(out[1])
                dt = (time.perf_counter() - t0) / iters
                flops = 2.0 * b * H * W * k * k * cin * cout
                print(f"{name:16s} {variant:10s} {dt*1e3:8.2f} ms "
                      f"{flops/dt/1e12:6.2f} TF (compile {cs:.0f}s)",
                      flush=True)
            except Exception as e:
                print(f"{name:16s} {variant:10s} FAILED: "
                      f"{str(e).splitlines()[0][:140]}", flush=True)


if __name__ == "__main__":
    main()
