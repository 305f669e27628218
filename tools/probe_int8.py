"""Mosaic-level int8 matmul probe (VERDICT round-2 item #2).

Round 2 measured XLA's int8 x int8 -> int32 dot at 108 TOPS vs bf16's 100
at 8192^3 (+8% only) — far from the 394-TOPS v5e int8 spec. The open
question was whether the int8 MXU mode is reachable from INSIDE a Pallas
kernel (Mosaic emitting the dot directly, bypassing XLA's lowering).

This probe runs a blocked 8192^3 matmul as a Pallas kernel at three
precision configs and times them with the honest protocol (on-device
fori_loop chaining + scalar-fetch fence, docs/PERFORMANCE.md):

    bf16 x bf16 -> f32   (the baseline the conv kernels run at)
    int8 x int8 -> int32 (the candidate 2x-beyond-bf16 mode)
    f32  x f32  -> f32   (sanity anchor: should be ~half of bf16)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_int8.py
env: N (matrix dim, default 8192), BM/BN (block sizes), ITERS
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

    n = int(os.environ.get("N", "8192"))
    bm = int(os.environ.get("BM", "512"))
    bn = int(os.environ.get("BN", "512"))
    bk = int(os.environ.get("BK", "2048"))
    iters = int(os.environ.get("ITERS", "10"))

    def mm_kernel(a_ref, b_ref, o_ref, acc_ref, *, acc_dtype, nk):
        kk = pl.program_id(2)
        p = jnp.dot(a_ref[...], b_ref[...],
                    preferred_element_type=acc_dtype)

        @pl.when(kk == 0)
        def _():
            acc_ref[...] = p

        @pl.when(kk != 0)
        def _():
            acc_ref[...] += p

        @pl.when(kk == nk - 1)
        def _():
            o_ref[...] = acc_ref[...]

    def make_mm(in_dtype, acc_dtype):
        nk = n // bk

        @jax.jit
        def mm(a, b):
            return pl.pallas_call(
                functools.partial(mm_kernel, acc_dtype=acc_dtype, nk=nk),
                out_shape=jax.ShapeDtypeStruct((n, n), acc_dtype),
                grid=(n // bm, n // bn, nk),
                in_specs=[
                    pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((bm, bn), acc_dtype)],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=64 * 1024 * 1024),
            )(a, b)
        return mm

    # --- pure-MXU mode: one program, T serially-dependent in-VMEM dots ---
    # No grid steps, no DMA inside the timed region: the only work is the
    # MXU issue rate, so the int8/bf16 RATIO is clean even if this
    # platform's launch overhead pollutes absolute numbers elsewhere.
    # The loop-carried dependency (x feeds the next dot) prevents hoisting.
    # Shape mimics the production conv kernel's dot EXACTLY (conv_kernel.py
    # _conv_kernel_chain: w (k*c_in, k*c_out) x a (k*c_in, rows*wp) with
    # k=7, c=32, rows=16, wp=1152 -> M=K=224, N=18432), which is measured
    # at 35 TFLOPS in bf16 — so the int8/bf16 ratio HERE is the number that
    # decides whether a quantized conv kernel is worth building.
    m_pure = int(os.environ.get("PM", "224"))    # M == K (square weights)
    n_pure = int(os.environ.get("PN", "18432"))  # N (rows*wp)
    t_pure = int(os.environ.get("PT", "100"))

    def pure_kernel(w_ref, a_ref, o_ref, acc_ref, *, T, acc_dtype):
        # T INDEPENDENT dots (rotating input slice: i-dependent pl.ds, so
        # neither hoisting nor algebraic collapse is possible), accumulated
        # into the output so no iteration can be dead-code-eliminated. An
        # earlier design chained the dots through an elementwise feedback
        # op — the serial dependency drained the MXU pipeline every
        # iteration and anchored bf16 at 6.6 TF (vs 35 TF in the production
        # conv kernel with the same dot shape); independent dots let Mosaic
        # pipeline like the conv kernel's strip loop does.
        def body(i, carry):
            s = jax.lax.rem(i, 2) * m_pure   # 224-row starts: 32-aligned,
            a = a_ref[pl.ds(s, m_pure), :]   # legal for int8 (32, 128) tiles
            p = jnp.dot(w_ref[...], a, preferred_element_type=acc_dtype)

            @pl.when(i == 0)
            def _():
                acc_ref[...] = p

            @pl.when(i != 0)
            def _():
                acc_ref[...] += p
            return carry
        jax.lax.fori_loop(0, T, body, 0)
        o_ref[...] = acc_ref[...]

    def make_pure(in_dtype, acc_dtype):
        @jax.jit
        def f(w, a):
            return pl.pallas_call(
                functools.partial(pure_kernel, T=t_pure,
                                  acc_dtype=acc_dtype),
                out_shape=jax.ShapeDtypeStruct((m_pure, n_pure), acc_dtype),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((m_pure, n_pure), acc_dtype)],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(w, a)
        return f

    r = np.random.RandomState(0)
    a_f = r.randint(-4, 5, size=(n, n)).astype(np.float32)
    b_f = r.randint(-4, 5, size=(n, n)).astype(np.float32)
    flops = 2.0 * n * n * n
    flops_pure = 2.0 * m_pure * m_pure * n_pure * t_pure

    configs = [
        ("bf16->f32", jnp.bfloat16, jnp.float32),
        ("int8->int32", jnp.int8, jnp.int32),
        ("f32->f32", jnp.float32, jnp.float32),
    ]

    if os.environ.get("SKIP_PURE"):
        configs_pure = []
    else:
        configs_pure = configs
        print(f"--- pure-MXU chained dots: ({m_pure}x{m_pure})@({m_pure}x"
              f"{n_pure}) x {t_pure} ---", flush=True)
    for name, in_dtype, acc_dtype in configs_pure:
        wp_ = jnp.asarray(b_f[:m_pure, :m_pure], in_dtype)
        ap = jnp.asarray(np.tile(a_f[:2 * m_pure], (1, 3))[:, :n_pure],
                         in_dtype)
        f = make_pure(in_dtype, acc_dtype)
        try:
            t0 = time.perf_counter()
            out = f(wp_, ap)
            float(out.astype(jnp.float32).sum())
            compile_s = time.perf_counter() - t0
            ap2 = ap + jnp.asarray(1, in_dtype)
            t0 = time.perf_counter()
            out = f(wp_, ap2)
            float(out.astype(jnp.float32).sum())
            dt = time.perf_counter() - t0
            print(f"{name:12s} {dt*1e3:8.2f} ms  "
                  f"{flops_pure/dt/1e12:7.1f} T(FL)OPS  "
                  f"(compile {compile_s:.0f}s)", flush=True)
        except Exception as e:
            msg = str(e).split("\n")[0][:200]
            print(f"{name:12s} FAILED: {msg}", flush=True)

    if not os.environ.get("BLOCKED_MM"):
        return

    print(f"--- HBM blocked matmul: {n}^3, blocks "
          f"{bm}x{bn}x{bk} ---", flush=True)
    for name, in_dtype, acc_dtype in configs:
        a = jnp.asarray(a_f, in_dtype)
        b = jnp.asarray(b_f, in_dtype)
        mm = make_mm(in_dtype, acc_dtype)

        @functools.partial(jax.jit, static_argnames="k")
        def loop(a, b, k, mm=mm, in_dtype=in_dtype):
            def body(i, carry):
                a, s = carry
                out = mm(a, b)
                # full-output dependency (no DCE); perturb the input each
                # iteration so the relay result cache can't serve repeats
                m = out.sum(dtype=jnp.float32) if out.dtype != jnp.int32 \
                    else out.astype(jnp.float32).sum()
                bump = (m * 0).astype(in_dtype) if in_dtype != jnp.int8 \
                    else (m.astype(jnp.int32) % 1).astype(jnp.int8)
                a = a + bump
                return a, s + m
            return jax.lax.fori_loop(0, k, body, (a, jnp.float32(0.0)))

        try:
            t0 = time.perf_counter()
            out = loop(a, b, iters)
            float(out[1])
            compile_s = time.perf_counter() - t0
            a2 = jnp.asarray(a_f + (1 if in_dtype == jnp.int8 else 0.0),
                             in_dtype)
            t0 = time.perf_counter()
            out = loop(a2, b, iters)
            float(out[1])
            dt = (time.perf_counter() - t0) / iters
            print(f"{name:12s} {dt*1e3:8.2f} ms/iter  "
                  f"{flops/dt/1e12:7.1f} T(FL)OPS  (compile {compile_s:.0f}s)",
                  flush=True)
        except Exception as e:
            msg = str(e).split("\n")[0][:200]
            print(f"{name:12s} FAILED: {msg}", flush=True)


if __name__ == "__main__":
    main()
