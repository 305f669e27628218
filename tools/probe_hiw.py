"""Halo-in-weights conv probe (round-4 direction item #1).

The production chain kernel is VPU-bound: the kh A-build staging copies
(k misaligned-sublane strip copies per strip) sit on the critical path
around a dot that is ~10% of it (tools/probe_breakdown.py, round 3).
This probe measures the reformulation that deletes the A-build entirely:

- layout: H-major channel-interleaved, (B, Hp, C, Wp). Strip DMAs slice
  a MAJOR dim (any offset/size — no 8-sublane alignment games), and the
  dot's RHS for a g-row output group is a CONTIGUOUS sublane slice of
  the strip buffer viewed 2D: rows [i0*C, (i0+g+k-1)*C) of (tdma*C, Wp).
  Zero staging copies.
- weights: block-banded LHS  W_band[(i+kh)*C_in + ci, (kw, i, co)] =
  w[kh, kw, ci, co]  of shape ((g+k-1)*C_in, k*g*C_out). The MXU eats
  the band zeros: FLOP inflation is (g+k-1)/k (1.43x at k7 g4, vs the
  rejected whole-strip banding at tdma/k ~ 4.6x). kw stays in the
  roll-sum epilogue (lane shifts cannot ride the contraction).
- epilogue: unchanged ssa roll-sum over the k kw slices of the dot
  output (M layout (kw, i, co) so each kw slice reshapes freely to
  (g, C_out, Wp) and lands in the H-major output stage).

Parity is checked against jax.lax.conv (VALID) — run INTERPRET=1 on CPU
first; on TPU each shape also self-checks before timing. Timing follows
the honest protocol of probe_breakdown.py (fori_loop-chained iters, DCE
guard, warm second call).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_hiw.py
env: B (16), H (1224), W (1024), ITERS (10), INTERPRET (0), SMALL (0)
"""

import functools
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = bool(int(os.environ.get("INTERPRET", "0")))
    small = bool(int(os.environ.get("SMALL", "0"))) or interpret
    B = int(os.environ.get("B", "2" if small else "16"))
    H = int(os.environ.get("H", "48" if small else "1224"))
    W = int(os.environ.get("W", "96" if small else "1024"))
    iters = int(os.environ.get("ITERS", "10"))
    rows = 16

    wp = -(-W // 128) * 128 + 128  # room for the k-1 valid-window margin

    def make_hiw(k, c_in, c_out, g):
        """Returns conv(xt, w): xt (B, Hp, c_in, wp) H-major pre-padded
        VALID input, w (k, k, c_in, c_out) HWIO -> (B, Hout, c_out, wp)
        H-major (valid lanes [0, wp-(k-1))')."""
        assert rows % g == 0 and (g * c_out) % 8 == 0
        assert (g * c_in) % 8 == 0  # group slice offsets hit tile rows
        p_half = k // 2
        kw_order = [p_half] + [kw for kw in range(k) if kw != p_half]
        tdma = rows + k - 1
        gk = g + k - 1

        def kernel(x_ref, w_ref, out_ref, t_ref, stage_ref, in_sems,
                   out_sems, *, hsub):
            b = pl.program_id(0)

            def in_dma(slot, j):
                return pltpu.make_async_copy(
                    x_ref.at[b, pl.ds(j * rows, tdma), :, :],
                    t_ref.at[slot], in_sems.at[slot])

            def out_dma(slot, j):
                return pltpu.make_async_copy(
                    stage_ref.at[slot],
                    out_ref.at[b, pl.ds(j * rows, rows), :, :],
                    out_sems.at[slot])

            in_dma(0, 0).start()

            def strip(j, carry):
                slot = jax.lax.rem(j, 2)

                @pl.when(j + 1 < hsub)
                def _():
                    in_dma(1 - slot, j + 1).start()

                in_dma(slot, j).wait()

                # wait for the 2-back out DMA BEFORE writing stage_ref[slot]
                # (write-after-read race otherwise; matches the ref kernel's
                # wait-then-write order so timings compare fairly)
                @pl.when(j >= 2)
                def _():
                    out_dma(slot, j - 2).wait()

                for i0 in range(0, rows, g):
                    # contiguous K-window: rows [i0*c_in, (i0+gk)*c_in)
                    # of the (tdma*c_in, wp) strip view — no staging
                    a = t_ref[slot, pl.ds(i0, gk), :, :].reshape(
                        gk * c_in, wp)
                    p = jax.lax.dot_general(
                        w_ref[:, :], a, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    pv = p.reshape(k, g * c_out, wp)
                    y = pv[0]
                    for jj in range(1, k):
                        sh = kw_order[jj] - p_half
                        y = y + jnp.roll(pv[jj], -sh, axis=-1)
                    stage_ref[slot, pl.ds(i0, g)] = jnp.maximum(
                        y, 0.0).astype(out_ref.dtype).reshape(
                            g, c_out, wp)

                out_dma(slot, j).start()
                return carry

            jax.lax.fori_loop(0, hsub, strip, 0)
            for tail in (hsub - 2, hsub - 1):
                if tail >= 0:
                    out_dma(tail % 2, tail).wait()

        @jax.jit
        def conv(xt, w):
            # hp = hsub*rows + 16 by convention (slack covers the rounded
            # last-strip DMA window in both kernels)
            b, hp = xt.shape[0], xt.shape[1]
            hsub = (hp - 16) // rows
            # banded LHS: rows (i+kh)*c_in+ci, cols (kw_i, i, co)
            wb = jnp.zeros((gk * c_in, k * g * c_out), xt.dtype)
            for kw_i, kw in enumerate(kw_order):
                for i in range(g):
                    wb = jax.lax.dynamic_update_slice(
                        wb,
                        jnp.concatenate(
                            [w[kh, kw].astype(xt.dtype)
                             for kh in range(k)], axis=0),
                        (i * c_in, (kw_i * g + i) * c_out))
            return pl.pallas_call(
                functools.partial(kernel, hsub=hsub),
                out_shape=jax.ShapeDtypeStruct(
                    (b, hsub * rows, c_out, wp), xt.dtype),
                grid=(b,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
                scratch_shapes=[
                    pltpu.VMEM((2, tdma, c_in, wp), xt.dtype),
                    pltpu.VMEM((2, rows, c_out, wp), xt.dtype),
                    pltpu.SemaphoreType.DMA((2,)),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
                interpret=interpret,
            )(xt, wb)

        return conv

    def make_ref(k, c_in, c_out):
        """probe_breakdown's 'full' production-formulation kernel (C-major
        chain layout, kh A-build + dot + ssa roll-sum), same protocol."""
        p_half = k // 2
        kw_order = [p_half] + [kw for kw in range(k) if kw != p_half]
        tdma = -(-(rows + k - 1) // 8) * 8

        def kernel(x_ref, w_ref, out_ref, t_ref, a_ref, stage_ref,
                   in_sems, out_sems, *, hsub):
            b = pl.program_id(0)

            def in_dma(slot, j):
                return pltpu.make_async_copy(
                    x_ref.at[b, :, pl.ds(j * rows, tdma), :],
                    t_ref.at[slot], in_sems.at[slot])

            def out_dma(slot, j):
                return pltpu.make_async_copy(
                    stage_ref.at[slot],
                    out_ref.at[b, :, pl.ds(j * rows, rows), :],
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
                p = jax.lax.dot_general(
                    w_ref[:, :], a_ref[:, :, :],
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                y = p[:c_out, :, :]
                for jj in range(1, k):
                    sh = kw_order[jj] - p_half
                    y = y + jnp.roll(
                        p[jj * c_out:(jj + 1) * c_out, :, :], -sh, axis=2)

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
        def conv(xc, w):
            # xc (B, c_in, Hp, wp) C-major pre-padded VALID
            b, _, hp = xc.shape[:3]
            hsub = (hp - 16) // rows
            wm = jnp.transpose(w, (0, 2, 1, 3)).reshape(k * c_in, k, c_out)
            wm = jnp.concatenate([wm[:, kw] for kw in kw_order],
                                 axis=-1).astype(xc.dtype)
            return pl.pallas_call(
                functools.partial(kernel, hsub=hsub),
                out_shape=jax.ShapeDtypeStruct(
                    (b, c_out, hsub * rows, wp), xc.dtype),
                grid=(b,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
                scratch_shapes=[
                    pltpu.VMEM((2, c_in, tdma, wp), xc.dtype),
                    pltpu.VMEM((k * c_in, rows, wp), xc.dtype),
                    pltpu.VMEM((2, c_out, rows, wp), xc.dtype),
                    pltpu.SemaphoreType.DMA((2,)),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
                interpret=interpret,
            )(xc, wm)

        return conv

    def parity(fn, k, c_in, c_out, hmajor, hsub=4):
        # hsub >= 4 exercises the double-buffered out-stage reuse (the
        # j >= 2 wait path) that an hsub=2 check never reaches
        r = np.random.RandomState(1)
        hrows = hsub * rows
        hp = hrows + 16
        x = jnp.asarray(r.rand(1, hp, 40 + k - 1, c_in) - 0.5, jnp.float32)
        w = jnp.asarray(r.rand(k, k, c_in, c_out) - 0.5, jnp.float32)
        ref = jax.nn.relu(lax.conv_general_dilated(
            x, w, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC")))[:, :hrows]
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, wp - x.shape[2]), (0, 0)))
        if hmajor:
            got = fn(jnp.transpose(xp, (0, 1, 3, 2)), w)
            got = jnp.transpose(got, (0, 1, 3, 2))
        else:
            got = fn(jnp.transpose(xp, (0, 3, 1, 2)), w)
            got = jnp.transpose(got, (0, 2, 3, 1))
        # lanes: the kernels center-shift kw taps (valid window starts at
        # p_half); rows are VALID-aligned
        p_half = k // 2
        got = got[:, :ref.shape[1], p_half:p_half + ref.shape[2], :]
        err = float(jnp.abs(got - ref).max())
        scale = float(jnp.abs(ref).max()) + 1e-8
        return err / scale

    r = np.random.RandomState(0)
    h8 = -(-H // rows) * rows
    shapes = [("dec0 32->32 k7", 32, 32, 7, [2, 4, 8], B),
              ("enc1 16->32 k7", 16, 32, 7, [4, 8], 2 * B),
              ("dec1 32->16 k5", 32, 16, 5, [4, 8], B),
              ("dec2 16->8 k5", 16, 8, 5, [8, 16], B)]
    for name, cin, cout, k, gs, b in shapes:
        legs = [("ref", make_ref(k, cin, cout), False)]
        for g in gs:
            if rows % g or (g * cout) % 8 or (g * cin) % 8:
                continue
            legs.append((f"hiw g{g}", make_hiw(k, cin, cout, g), True))
        for lname, fn, hmajor in legs:
            try:
                pe = parity(fn, k, cin, cout, hmajor)
                if pe > 1e-4:
                    print(f"{name:16s} {lname:8s} PARITY FAIL {pe:.2e}",
                          flush=True)
                    continue
                if interpret:
                    print(f"{name:16s} {lname:8s} parity ok ({pe:.2e})",
                          flush=True)
                    continue
                hp = h8 + 16
                if hmajor:
                    x = jnp.asarray(
                        r.rand(b, hp, cin, wp) - 0.5, jnp.bfloat16)
                else:
                    x = jnp.asarray(
                        r.rand(b, cin, hp, wp) - 0.5, jnp.bfloat16)
                w = jnp.asarray(r.rand(k, k, cin, cout) - 0.5, jnp.bfloat16)

                @functools.partial(jax.jit, static_argnames="n")
                def loop(x, w, n, fn=fn):
                    def body(i, carry):
                        x, s = carry
                        m = fn(x, w).astype(jnp.float32).mean()
                        bump = jnp.where(m > 1e30, 1, 0).astype(x.dtype)
                        return x + bump, s + m
                    return jax.lax.fori_loop(0, n, body,
                                             (x, jnp.float32(0.0)))

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
                print(f"{name:16s} {lname:8s} {dt*1e3:8.2f} ms "
                      f"{flops/dt/1e12:6.2f} TF (parity {pe:.1e}, "
                      f"compile {cs:.0f}s)", flush=True)
            except Exception as e:
                print(f"{name:16s} {lname:8s} FAILED: "
                      f"{str(e).splitlines()[0][:140]}", flush=True)


if __name__ == "__main__":
    main()
