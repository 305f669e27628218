"""Model profiling: params / FLOPs / latency (replaces the reference's thop
self-test, reference core/model.py:903-932).

FLOPs come from XLA's own cost analysis of the compiled executable
(`jit(...).lower().compile().cost_analysis()`) — the compiler's count of the
graph it actually runs, rather than thop's per-module estimate.

Run as a module for the zoo table:
    python -m multi_modal_image_fusion_tpu.models.profile [model ...]
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from . import MODEL_ZOO, create_model


def param_count(variables):
    return sum(int(np.prod(p.shape))
               for p in jax.tree.leaves(variables["params"]))


def profile_model(name, size=256, batch=1, runs=50, **kwargs):
    """Returns dict(params, flops, latency_ms) for a zoo model at
    batch x size x size x 1 (the reference profiles at 1x1x256x256)."""
    model = create_model(name, **kwargs)
    x1 = jnp.zeros((batch, size, size, 1), jnp.float32)
    x2 = jnp.zeros((batch, size, size, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x1, x2, train=False)

    fn = jax.jit(lambda a, b: model.apply(variables, a, b, train=False))
    lowered = fn.lower(x1, x2)
    compiled = lowered.compile()
    cost = compiled.cost_analysis() or {}
    flops = cost.get("flops", float("nan"))

    y = fn(x1, x2)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(runs):
        y = fn(x1, x2)
    jax.block_until_ready(y)
    latency = (time.perf_counter() - t0) / runs

    return {
        "params": param_count(variables),
        "flops": flops,
        "latency_ms": latency * 1000.0,
    }


def main(argv=None):
    import sys

    names = (argv or sys.argv[1:]) or sorted(MODEL_ZOO)
    print(f"{'model':<12} {'params':>10} {'flops':>14} {'latency':>10}")
    for name in names:
        try:
            p = profile_model(name, runs=10)
            print(f"{name:<12} {p['params'] / 1e6:>9.3f}M "
                  f"{p['flops'] / 1e9:>13.3f}G {p['latency_ms']:>8.3f}ms")
        except Exception as e:  # keep the table going
            print(f"{name:<12} ERROR {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
