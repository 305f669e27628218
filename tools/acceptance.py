"""Unified flip-acceptance gate (round 5, VERDICT #6).

Every performance-path flip (hiw single/multi-leg, int8, subpixel/dw
formulations) routes through ONE criterion, anchored to the BASELINE
contract ("SSIM and Qabf within 1e-3 of the reference"):

  golden   = f32 forward, all Pallas paths off (MMIF_NO_PALLAS=1), under
             jax.default_matmul_precision('float32')  — exact-f32 XLA,
             the parity-tested surrogate for the PyTorch reference
             (docs/PARITY.md: model forward parity 1e-4 vs reference).
  candidate = the flagged path at production dtype (bf16 on TPU).
  gate      = |SSIM(cand) - SSIM(golden)| <= 1e-3 AND
              |Qabf(cand) - Qabf(golden)| <= 1e-3, max over sample pairs
              (SSIM convention of test.py: mean of SSIM vs both inputs).
  tripwire  = candidate at f32 vs golden, relative maxdiff <= 1e-2.
              Round-4 lesson (tools/probe_precision.py): TPU MXU default
              precision multiplies f32 operands in bf16, so ~2e-3 PER
              CONV of "f32" noise is expected and accumulates — raw
              rel-maxdiff is NOT a correctness criterion. The loose
              envelope only catches O(1) indexing/layout bugs; exact
              kernel correctness is proven by the CPU interpret tests
              (tests/test_hiw.py).

Round-5 refinement: both criteria are FLOOR-AWARE. Queue-1 measured the
shipping (candidate-off) paths against the same golden and found the
budgets are depth-dependent, not absolute: difnet's candidate passed
dSSIM at 9e-9 yet tripped the f32 envelope at 6.3e-2 purely from MXU
default-precision accumulation over its depth (the plain-XLA no-Pallas
f32 forward shows the same envelope), and vifnet's shipping bf16 path
already sits ~2e-3 dSSIM from the f32 golden. So the gate measures the
model's own floors and requires the candidate to add nothing beyond
budget on top of them:
  d_ssim/d_qabf <= floor(off-path bf16 vs golden) + budget
  trip          <= max(tripwire, 3x floor(no-Pallas f32-default vs golden))
The absolute BASELINE contract is preserved where it is achievable (tiny
floors reduce to the absolute budgets); where bf16-on-TPU itself exceeds
it, the contract becomes "no regression beyond budget over the shipping
path", which is what a flip can honestly promise.

This kills the round-4 inconsistency (single-leg accepted at 5.8e-3 rel,
multi-leg rejected at 2.9e-3 rel — VERDICT weak #6): both were MXU
default-precision noise, neither was a quality regression.

Reference behavior being guarded: core/model.py forwards + test.py:51-54
SSIM convention; metric Qabf constants metric.py:209-256.
"""

import contextlib
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

BUDGET = 1e-3
TRIPWIRE = 1e-2


def load_pairs(limit=4, sample_root=None):
    import jax.numpy as jnp
    from multi_modal_image_fusion_tpu.data.dataset import FusionDataset

    sample_root = sample_root or os.environ.get(
        "MMIF_SAMPLES", "/root/reference/data/samples/infrared")
    ds = FusionDataset(sample_root, set_name="test", set_type="test",
                       img_type="ir")
    pairs = []
    for i in range(min(limit, len(ds))):
        a, b = ds[i]
        pairs.append((jnp.asarray(a)[None, ..., None],
                      jnp.asarray(b)[None, ..., None]))
    return pairs


@contextlib.contextmanager
def _env(overrides):
    old = {}
    try:
        for k, v in (overrides or {}).items():
            old[k] = os.environ.get(k)
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = str(v)
        yield
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def run_model(model, variables, pairs, dtype, env=None, precise=False,
              quant_amax=None, quant_skip=None):
    """Forward all pairs under env overrides; returns list of f32 outputs.

    Fresh jit per call: the chain/int8 paths read their env flags at
    trace time, so each config needs its own trace."""
    import jax
    import jax.numpy as jnp
    from multi_modal_image_fusion_tpu.ops.layers import fast_inference
    from multi_modal_image_fusion_tpu.ops.quant import quantized_inference

    vars_d = jax.tree.map(lambda p: p.astype(dtype), variables)
    outs = []
    with _env(env):
        ctx = (jax.default_matmul_precision("float32") if precise
               else contextlib.nullcontext())
        with ctx:
            @jax.jit
            def f(a, b):
                with fast_inference():
                    if quant_amax is not None:
                        with quantized_inference(quant_amax,
                                                 skip=quant_skip):
                            return vars_apply(a, b)
                    return vars_apply(a, b)

            def vars_apply(a, b):
                return model.apply(vars_d, a.astype(dtype), b.astype(dtype),
                                   train=False)

            for a, b in pairs:
                outs.append(np.asarray(
                    jnp.clip(f(a, b).astype(jnp.float32), 0, 1)))
    return outs


def scores(a, b, out):
    import jax.numpy as jnp
    from multi_modal_image_fusion_tpu.ops.metrics import calc_Qabf, calc_ssim

    out = jnp.asarray(out)
    s = 0.5 * (calc_ssim(a, out, data_range=1.0)
               + calc_ssim(b, out, data_range=1.0))
    qa = calc_Qabf(a * 255, b * 255, out * 255)
    return float(s), float(qa)


def golden_outputs(model, variables, pairs):
    import jax.numpy as jnp
    return run_model(model, variables, pairs, jnp.float32,
                     env={"MMIF_NO_PALLAS": "1"}, precise=True)


def flip_gate(name, cand_env, pairs=None, limit=4, budget=BUDGET,
              tripwire=TRIPWIRE, quant_amax=None, quant_skip=None,
              golden=None, model=None, variables=None, base_env=None):
    """The one gate. Returns a record dict with d_ssim/d_qabf (candidate
    bf16-vs-golden, max over pairs), trip (f32 candidate rel maxdiff),
    the off-path floors, and ok.

    base_env: the shipping (candidate-off) config used for the floors;
    defaults to every cand_env key forced to "0"."""
    import jax
    import jax.numpy as jnp
    from multi_modal_image_fusion_tpu.models import create_model

    backend = jax.default_backend()
    if backend != "tpu" and not os.environ.get("MMIF_ACCEPT_CPU"):
        # On CPU the candidate path falls back to the same XLA forward as
        # the golden (chain_ready needs a TPU backend) and the gate
        # trivially passes with all-zero deltas — a silent relay fallback
        # must not look like an acceptance (round-5 lesson).
        raise RuntimeError(
            f"flip_gate needs a TPU backend (got {backend}); "
            "set MMIF_ACCEPT_CPU=1 to override for interpret-mode tests")

    pairs = pairs or load_pairs(limit)
    if model is None:
        model = create_model(name)
        variables = model.init(jax.random.PRNGKey(0), *pairs[0],
                               train=False)
    if golden is None:
        golden = golden_outputs(model, variables, pairs)

    if base_env is None:
        base_env = {k: "0" for k in (cand_env or {})}

    def deltas(outs):
        ds = dq = 0.0
        for (a, b), g, c in zip(pairs, golden, outs):
            s0, q0 = scores(a, b, g)
            s1, q1 = scores(a, b, c)
            ds = max(ds, abs(s1 - s0))
            dq = max(dq, abs(q1 - q0))
        return ds, dq

    def envelope(outs):
        t = 0.0
        for g, c in zip(golden, outs):
            sc = float(np.abs(g).max()) + 1e-8
            t = max(t, float(np.abs(c - g).max()) / sc)
        return t

    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    cand = run_model(model, variables, pairs, dtype, env=cand_env,
                     quant_amax=quant_amax, quant_skip=quant_skip)
    d_ssim, d_qabf = deltas(cand)

    # floors: the shipping path's own distance from the golden
    base = run_model(model, variables, pairs, dtype, env=base_env)
    floor_ssim, floor_qabf = deltas(base)

    # f32 tripwire (loose: catches O(1) bugs, not MXU noise); its floor
    # is the plain-XLA no-Pallas f32 forward at DEFAULT precision — pure
    # MXU accumulation for this model's depth
    candf = run_model(model, variables, pairs, jnp.float32, env=cand_env,
                      quant_amax=quant_amax, quant_skip=quant_skip)
    trip = envelope(candf)
    basef = run_model(model, variables, pairs, jnp.float32,
                      env={"MMIF_NO_PALLAS": "1"})
    floor_trip = envelope(basef)

    ok = (d_ssim <= floor_ssim + budget and d_qabf <= floor_qabf + budget
          and trip <= max(tripwire, 3.0 * floor_trip))
    return {"model": name, "backend": backend, "d_ssim": d_ssim,
            "d_qabf": d_qabf, "trip_rel_f32": trip,
            "floor_ssim": floor_ssim, "floor_qabf": floor_qabf,
            "floor_trip_f32": floor_trip, "budget": budget,
            "tripwire": tripwire, "ok": bool(ok)}


def main():
    import json
    name = sys.argv[1]
    env = {}
    for kv in sys.argv[2:]:
        k, _, v = kv.partition("=")
        env[k] = v
    rec = flip_gate(name, env, limit=int(os.environ.get("LIMIT", "4")))
    print(json.dumps(rec), flush=True)
    return 0 if rec["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
